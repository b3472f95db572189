"""Sharded compact tier on the 8-virtual-CPU-device mesh: the global
set certificate composed from per-shard scans must be sound (certified
sets exactly equal the true top-k sets) and fail closed on planted
boundary ties. No fp32 matrix exists on any device in this path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from trueno_rag_tpu.ops.dense_tiered import prepare_residual, prepare_tiered
from trueno_rag_tpu.parallel.compact import ShardedCompactIndex, sharded_compact_topk
from trueno_rag_tpu.parallel.mesh import create_mesh


def _oracle_sets(queries, matrix, valid, k, metric="cosine"):
    """True-score (float64) top-k row sets + scores, (desc, row-asc)."""
    q = np.asarray(queries, dtype=np.float64)
    if metric == "cosine":
        norms = np.linalg.norm(q, axis=1, keepdims=True)
        q = q / np.where(norms == 0.0, 1.0, norms)
    scores = q @ np.asarray(matrix, dtype=np.float64).T
    scores[:, ~valid] = -np.inf
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return order


def _sharded_parts(matrix, valid, mesh):
    mb, el, al = prepare_tiered(jnp.asarray(matrix))
    ri, rs, e2 = prepare_residual(jnp.asarray(matrix))
    row = NamedSharding(mesh, P("data", None))
    vec = NamedSharding(mesh, P("data"))
    return (
        jax.device_put(mb, row), jax.device_put(el, vec),
        jax.device_put(al, vec), jax.device_put(ri, row),
        jax.device_put(rs, vec), jax.device_put(e2, vec),
        jax.device_put(jnp.asarray(valid), vec),
    )


@pytest.mark.parametrize("metric", ["cosine", "dot"])
def test_sharded_compact_certified_sets_exact(metric):
    rng = np.random.default_rng(0)
    # 1024 rows/shard = 8 tiles of 128 -> 32 candidate slots per shard
    # (t_top=4) for k=10; a one-tile shard would truncate and fail closed
    n, d, b, k = 8192, 64, 16, 10
    matrix = rng.standard_normal((n, d)).astype(np.float32)
    if metric == "cosine":
        matrix /= np.linalg.norm(matrix, axis=1, keepdims=True)
    queries = rng.standard_normal((b, d)).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    valid[50:80] = False

    mesh = create_mesh(data=8, model=1)
    parts = _sharded_parts(matrix, valid, mesh)
    s, r, ok = sharded_compact_topk(
        jnp.asarray(queries), *parts, k, mesh, metric=metric,
        tile_n=128, interpret=True,
    )
    s, r, ok = np.asarray(s), np.asarray(r), np.asarray(ok).astype(bool)
    # at d=64 random (large gaps) the certificate should mostly fire
    assert ok.sum() >= b // 2, f"only {ok.sum()}/{b} certified"
    oracle = _oracle_sets(queries, matrix, valid, k, metric)
    for i in np.flatnonzero(ok):
        assert set(r[i].tolist()) == set(oracle[i].tolist()), f"query {i}"
        assert (r[i] >= 0).all() and (r[i] < n).all()
        # scores within the corrected-rescore interval of truth
        # (loose sanity bound; the certificate itself is the proof)
        assert np.all(np.diff(s[i]) <= 1e-6)


def test_sharded_compact_fails_closed_on_boundary_tie():
    """Plant an exact duplicate row pair straddling the k boundary in
    DIFFERENT shards: the true rank-k/k+1 scores tie exactly, so no
    interval certificate can separate them — those queries must not
    certify (soundness would otherwise be violated arbitrarily)."""
    rng = np.random.default_rng(1)
    n, d, k = 512, 32, 3
    matrix = rng.standard_normal((n, d)).astype(np.float32)
    matrix /= np.linalg.norm(matrix, axis=1, keepdims=True)
    q = rng.standard_normal((1, d)).astype(np.float32)
    qn = q / np.linalg.norm(q)
    # craft rows: top-3 distinct, rank 3 and 4 identical (shards 0 and 7)
    base = qn[0]
    matrix[0] = base  # score 1.0
    matrix[1] = 0.99 * base + 0.01 * matrix[1]; matrix[1] /= np.linalg.norm(matrix[1])
    tie = 0.95 * base + 0.05 * matrix[2]; tie /= np.linalg.norm(tie)
    matrix[2] = tie
    matrix[448] = tie  # same vector, different shard (448 // 64 == 7)
    valid = np.ones(n, dtype=bool)

    mesh = create_mesh(data=8, model=1)
    parts = _sharded_parts(matrix, valid, mesh)
    s, r, ok = sharded_compact_topk(
        jnp.asarray(q), *parts, k, mesh, tile_n=64, interpret=True,
    )
    assert not bool(np.asarray(ok)[0]), "tie at the k boundary must fail closed"


def test_sharded_compact_index_host_patch_and_counters():
    rng = np.random.default_rng(2)
    n, d, b, k = 700, 48, 8, 7  # n % 8 != 0: padding rows must not surface
    matrix = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((b, d)).astype(np.float32)

    mesh = create_mesh(data=8, model=1)
    idx = ShardedCompactIndex(matrix, mesh, tile_n=64)
    s, r, ok = idx.search(queries, k)
    s, r, ok = np.asarray(s), np.asarray(r), np.asarray(ok).astype(bool)
    assert ok.all()  # host patch covers any certificate miss
    assert (r >= 0).all() and (r < n).all()
    oracle = _oracle_sets(queries, matrix / np.linalg.norm(matrix, axis=1, keepdims=True),
                          np.ones(n, bool), k)
    for i in range(b):
        assert set(r[i].tolist()) == set(oracle[i].tolist()), f"query {i}"

    # without the host matrix: flags surface, counter still counts
    idx2 = ShardedCompactIndex(matrix, mesh, tile_n=64, keep_host=False)
    s2, r2, ok2 = idx2.search(queries, k)
    ok2 = np.asarray(ok2).astype(bool)
    for i in np.flatnonzero(ok2):
        assert set(np.asarray(r2)[i].tolist()) == set(oracle[i].tolist())
    assert idx2.uncertified == int((~ok2).sum())


def test_sharded_containment_patch_resolves_near_ties_without_gemm():
    """r4 sharded containment: near-tie rank-k gaps below the residual
    interval defeat the composed certificate, but the union of every
    shard's candidate rows + the max shard threshold prove containment
    — the exact patch must resolve them from ~s·W rows, never the
    global GEMM."""
    rng = np.random.default_rng(4)
    n, d, b, k = 8192, 32, 4, 10
    matrix = rng.standard_normal((n, d)).astype(np.float32)
    matrix /= np.linalg.norm(matrix, axis=1, keepdims=True)
    base = matrix[0].astype(np.float64)
    base /= np.linalg.norm(base)
    # 14 near-duplicates (f32-rounding-level gaps) spread across shards
    # and tiles: base + 14 > k straddles the boundary
    for j in range(1, 15):
        row = (base + rng.standard_normal(d) * 2e-5)
        matrix[j * 550] = (row / np.linalg.norm(row)).astype(np.float32)
    queries = np.stack([base.astype(np.float32)] * b)

    mesh = create_mesh(data=8, model=1)
    idx = ShardedCompactIndex(matrix, mesh, tile_n=128,
                              rows_normalized=True)
    s, r, ok = idx.search(queries, k)
    r = np.asarray(r)
    assert np.asarray(ok).astype(bool).all()  # patched → reported exact
    assert idx.uncertified >= 1, "near ties must defeat the certificate"
    assert idx.candidate_patched >= 1
    assert idx.gemm_patched == 0, "containment must resolve without the GEMM"
    # exact f64 oracle ORDER for the patched queries (the patch computes
    # true scores; certified queries would only guarantee the SET)
    oracle = _oracle_sets(queries, matrix, np.ones(n, bool), k)
    for i in range(b):
        assert r[i].tolist() == oracle[i].tolist(), i


def test_sharded_compact_memory_is_3_bytes_per_element():
    """The contract that justifies the tier: per-shard bytes ≈ 3·(N/s)·d
    (bf16 + int8) plus O(N/s) vectors — no fp32 [N,d] anywhere."""
    rng = np.random.default_rng(3)
    n, d = 1024, 64
    matrix = rng.standard_normal((n, d)).astype(np.float32)
    mesh = create_mesh(data=8, model=1)
    idx = ShardedCompactIndex(matrix, mesh, keep_host=False)
    big = [a for a in (idx.m_bf16, idx.r_i8)]
    assert sum(a.nbytes for a in big) == 3 * n * d
    aux = sum(a.nbytes for a in (idx.e_l2, idx.a_l2, idx.r_scale, idx.e2_l2,
                                 idx.valid))
    assert aux <= n * 4 * 5


def test_sharded_hybrid_compact_dense_matches_single_host():
    """ShardedHybridIndex(dense_mode='compact') — compact dense shards
    + document-sharded BM25 + fusion — must rank like the single-host
    HybridRetriever (the host patch makes uncertified dense queries
    exact; certified sets are exact by proof). Dense embeddings are
    MockEmbedder hash vectors — continuous scores, no exact-zero tie
    groups: sparse TfIdf vectors give many docs dense score exactly 0.0
    and the corrected rescore breaks those mathematical ties in a
    different (equally valid) order, which rank-based RRF then amplifies
    — the documented certified-SET-not-order contract."""
    rng = np.random.default_rng(7)
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.embed import MockEmbedder
    from trueno_rag_tpu.parallel.hybrid import ShardedHybridIndex
    from trueno_rag_tpu.retrieve import HybridRetriever, TagFilter

    words = [f"term{i:03d}" for i in range(200)]
    corpus = [
        " ".join(rng.choice(words, size=10, replace=False)) for _ in range(96)
    ]
    emb = MockEmbedder(dimension=32)
    retr = HybridRetriever(emb)
    retr.config.candidates_per_source = 12
    chunks = []
    for i, t in enumerate(corpus):
        c = Chunk(document_id="d", content=t, start_offset=0, end_offset=len(t),
                  metadata=ChunkMetadata(), id=chunk_id_from_int(i))
        c.set_embedding(emb.embed_document(t))
        chunks.append(c)
    retr.index_batch(chunks)

    mesh = create_mesh(data=8, model=1)
    # sparse_mode="replicated" for BIT-parity: the document-sharded
    # sparse layout permutes mathematically tied BM25 scores (summation
    # order), which is asserted separately by
    # test_parallel.test_sharded_sparse_hybrid_rank_parity
    sharded = ShardedHybridIndex(retr, mesh, candidates_per_source=12,
                                 dense_mode="compact",
                                 sparse_mode="replicated")
    for q in [corpus[5][:40], "term003 term077 term150"]:
        single = [r.chunk.id for r in retr.retrieve(q, 5)]
        multi = [r.chunk.id for r in sharded.search(q, 5)]
        assert multi == single, q
    # refresh path: mutate a chunk, rebuild, parity again
    new = Chunk(document_id="d", content="term001 term002 term005 fresh words",
                start_offset=0, end_offset=35, metadata=ChunkMetadata(),
                id=chunk_id_from_int(500))
    new.set_embedding(emb.embed_document(new.content))
    retr.index(new)
    sharded.refresh(rows=[retr.registry.row_of(new.id)])
    q = "term001 term002 term005"
    single = [r.chunk.id for r in retr.retrieve(q, 5)]
    multi = [r.chunk.id for r in sharded.search(q, 5)]
    assert multi == single


def test_sharded_compact_tag_filters_match_single_host():
    """Tag filters on compact dense shards: the predicate evaluates
    shard-locally inside each scan kernel, the composed certificate
    proves exact filtered sets, and the filter-aware host patch covers
    the rest — full hybrid results must equal the single-host tagged
    path. Also exercises the short-result rule (a filter allowing fewer
    than k rows corpus-wide) and tag refresh via version key."""
    rng = np.random.default_rng(9)
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.embed import MockEmbedder
    from trueno_rag_tpu.parallel.hybrid import ShardedHybridIndex
    from trueno_rag_tpu.retrieve import HybridRetriever, TagFilter

    words = [f"term{i:03d}" for i in range(200)]
    emb = MockEmbedder(dimension=32)
    retr = HybridRetriever(emb)
    retr.config.candidates_per_source = 12
    for i in range(120):
        t = " ".join(rng.choice(words, size=10, replace=False))
        c = Chunk(document_id="d", content=t, start_offset=0,
                  end_offset=len(t), metadata=ChunkMetadata(),
                  id=chunk_id_from_int(i))
        c.set_embedding(emb.embed_document(t))
        retr.index(c, tags=["en" if i % 2 else "fr", f"tenant{i % 3}"])

    mesh = create_mesh(data=8, model=1)
    sharded = ShardedHybridIndex(retr, mesh, candidates_per_source=12,
                                 dense_mode="compact",
                                 sparse_mode="replicated")
    filters = [TagFilter(all=["en"]), TagFilter(none=["fr"]),
               TagFilter(any=["tenant0", "tenant2"]),
               TagFilter(all=["en"], none=["tenant1"])]
    for f in filters:
        for q in ["term001 term050 term099", "term120 term007"]:
            single = [r.chunk.id for r in retr.retrieve(q, 5, tag_filter=f)]
            multi = [r.chunk.id for r in sharded.search(q, 5, tag_filter=f)]
            assert multi == single, (f, q)

    # tag-only mutation picked up by the version key (no refresh(rows))
    retr.registry.set_tags(chunk_id_from_int(7), ["rare"])
    before = sharded.dense.uncertified
    f = TagFilter(all=["rare"])
    single = [r.chunk.id for r in retr.retrieve("term001", 5, tag_filter=f)]
    multi = [r.chunk.id for r in sharded.search("term001", 5, tag_filter=f)]
    assert multi == single and len(multi) == 1
    # allowed set {1 row} < k certifies via the short-result rule: the
    # single allowed row's shard emits it, every other shard's bound is
    # -inf — no host patch needed
    assert sharded.dense.uncertified == before


# -- bf16rr sharded: the certification-ceiling layout on the mesh (r5) -------
# 10.5M×384 at 4 B/elem (16.1 GB) does not fit ONE chip, so the mesh is
# where bf16rr actually deploys; these pin the composed certificate.


def test_sharded_bf16rr_resolves_gaps_bf16r_cannot():
    """Plant rank-boundary gaps of 6e-6 spread across shards — inside
    bf16r's ~2.2e-5 composed interval (fails closed) but above bf16rr's
    ~1.5e-6 (certifies on-device, no host patch), certified sets equal
    the f64 oracle."""
    rng = np.random.default_rng(41)
    n, d, bq, k = 8192, 384, 4, 8
    m = rng.standard_normal((n, d)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    q = rng.standard_normal((bq, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    gap = 6e-6
    used = set()
    for b in range(bq):
        for i in range(k + 4):
            row = (31 + b * 97 + i * 661) % n  # scatters over all 8 shards
            assert row not in used
            used.add(row)
            target = 0.9 - gap * i
            u = rng.standard_normal(d).astype(np.float32)
            u -= (u @ q[b]) * q[b]
            u /= np.linalg.norm(u)
            m[row] = target * q[b] + np.sqrt(1.0 - target * target) * u

    mesh = create_mesh(data=8, model=1)
    idx_r = ShardedCompactIndex(m, mesh, rows_normalized=True,
                                tile_n=256, keep_host=False)
    idx_rr = ShardedCompactIndex(m, mesh, rows_normalized=True,
                                 tile_n=256, keep_host=False,
                                 layout="bf16rr")
    _, _, ok_r = idx_r.search(q, k)
    s2, r2, ok_rr = idx_rr.search(q, k)
    assert not bool(np.asarray(ok_r).any()), "bf16r must fail closed at 6e-6"
    assert bool(np.asarray(ok_rr).all()), "bf16rr must certify 6e-6 gaps"
    oracle = _oracle_sets(q, m, np.ones(n, bool), k)
    for b in range(bq):
        assert set(np.asarray(r2)[b].tolist()) == set(oracle[b].tolist()), b


def test_sharded_bf16rr_memory_and_validation():
    """Per-shard bytes = 4·(N/s)·d (bf16 + two int8 levels); unknown
    layouts raise the config taxonomy error."""
    rng = np.random.default_rng(42)
    n, d = 1024, 64
    matrix = rng.standard_normal((n, d)).astype(np.float32)
    mesh = create_mesh(data=8, model=1)
    idx = ShardedCompactIndex(matrix, mesh, keep_host=False,
                              layout="bf16rr")
    assert sum(a.nbytes for a in (idx.m_bf16, idx.r_i8, idx.r2_i8)) == 4 * n * d
    s, r, ok = idx.search(rng.standard_normal((4, d)).astype(np.float32), 5)
    assert np.asarray(r).shape == (4, 5)
    assert ((np.asarray(r) >= 0) & (np.asarray(r) < n)).all()

    from trueno_rag_tpu.errors import InvalidConfigError
    with pytest.raises(InvalidConfigError):
        ShardedCompactIndex(matrix, mesh, layout="int8")


def test_sharded_hybrid_follows_store_bf16rr_layout():
    """ShardedHybridIndex(dense_mode='compact') adopts the store's
    configured compact_scan layout: bf16rr stores shard the two-level
    replicas; results still match the single-host retriever."""
    rng = np.random.default_rng(43)
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.embed import MockEmbedder
    from trueno_rag_tpu.parallel.hybrid import ShardedHybridIndex
    from trueno_rag_tpu.retrieve import HybridRetriever

    words = [f"term{i:03d}" for i in range(200)]
    emb = MockEmbedder(dimension=32)
    retr = HybridRetriever(emb)
    retr.config.candidates_per_source = 12
    retr.vector_store.config.compact_scan = "bf16rr"
    chunks = []
    for i in range(96):
        t = " ".join(rng.choice(words, size=10, replace=False))
        c = Chunk(document_id="d", content=t, start_offset=0,
                  end_offset=len(t), metadata=ChunkMetadata(),
                  id=chunk_id_from_int(i))
        c.set_embedding(emb.embed_document(t))
        chunks.append(c)
    retr.index_batch(chunks)

    mesh = create_mesh(data=8, model=1)
    sharded = ShardedHybridIndex(retr, mesh, candidates_per_source=12,
                                 dense_mode="compact",
                                 sparse_mode="replicated")
    assert sharded.dense.layout == "bf16rr"
    for q in ["term003 term077 term150", chunks[5].content[:40]]:
        single = [r.chunk.id for r in retr.retrieve(q, 5)]
        multi = [r.chunk.id for r in sharded.search(q, 5)]
        assert multi == single, q
