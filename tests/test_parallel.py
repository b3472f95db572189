"""Multi-chip tests on the 8-virtual-CPU-device mesh: sharded retrieval
parity vs the single-device oracle, dp x tp training step execution."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trueno_rag_tpu.models.encoder import EncoderConfig
from trueno_rag_tpu.ops.dense import dense_topk_oracle
from trueno_rag_tpu.parallel.mesh import create_mesh, encoder_param_specs, shard_batch, shard_params
from trueno_rag_tpu.parallel.sharded import ShardedVectorIndex, sharded_dense_topk
from trueno_rag_tpu.train.contrastive import TrainState, create_train_state, train_step


def test_create_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh = create_mesh(data=4, model=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    with pytest.raises(ValueError):
        create_mesh(data=3, model=2)


@pytest.mark.parametrize("metric", ["cosine", "dot"])
def test_sharded_topk_matches_oracle(metric):
    rng = np.random.default_rng(0)
    n, d, b, k = 512, 32, 4, 10
    matrix = rng.standard_normal((n, d)).astype(np.float32)
    if metric == "cosine":
        matrix /= np.linalg.norm(matrix, axis=1, keepdims=True)
    queries = rng.standard_normal((b, d)).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    valid[100:140] = False

    mesh = create_mesh(data=8, model=1)
    from jax.sharding import NamedSharding, PartitionSpec as P

    m_sh = jax.device_put(jnp.asarray(matrix), NamedSharding(mesh, P("data", None)))
    v_sh = jax.device_put(jnp.asarray(valid), NamedSharding(mesh, P("data")))
    s_dev, r_dev = sharded_dense_topk(jnp.asarray(queries), m_sh, v_sh, k, mesh, metric)

    s_ora, r_ora = dense_topk_oracle(queries, matrix, valid, k, metric)
    np.testing.assert_array_equal(np.asarray(r_dev), r_ora)
    np.testing.assert_allclose(np.asarray(s_dev), s_ora, rtol=1e-4, atol=1e-5)


def test_sharded_vector_index_unpadded_n():
    """N not divisible by shard count: padding rows must never surface."""
    rng = np.random.default_rng(1)
    n, d, k = 101, 16, 8  # 101 % 8 != 0
    matrix = rng.standard_normal((n, d)).astype(np.float32)
    mesh = create_mesh(data=8, model=1)
    idx = ShardedVectorIndex(matrix, mesh, metric="cosine")
    queries = matrix[:3]
    scores, rows = idx.search(queries, k)
    rows = np.asarray(rows)
    assert rows.max() < n
    assert list(rows[:, 0]) == [0, 1, 2]  # self-match first


def test_sharded_index_k_larger_than_shard():
    rng = np.random.default_rng(2)
    matrix = rng.standard_normal((16, 8)).astype(np.float32)
    mesh = create_mesh(data=8, model=1)
    idx = ShardedVectorIndex(matrix, mesh)
    scores, rows = idx.search(matrix[:2], k=10)
    rows = np.asarray(rows)
    assert rows.shape == (2, 10)
    for qrow in rows:
        valid_rows = qrow[qrow >= 0]
        assert len(set(valid_rows.tolist())) == len(valid_rows)  # no dupes per query


def test_param_specs_cover_all():
    import jax as _jax

    cfg = EncoderConfig.tiny()
    from trueno_rag_tpu.models.encoder import init_encoder_params

    params = init_encoder_params(_jax.random.PRNGKey(0), cfg)
    specs = encoder_param_specs(params)
    assert set(specs) == set(params)


def test_sharded_train_step_runs():
    cfg = EncoderConfig(vocab_size=128, hidden_dim=32, num_layers=2, num_heads=4, mlp_dim=64, max_len=16)
    mesh = create_mesh(data=4, model=2)
    state, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    state = TrainState(shard_params(state.params, mesh), jax.device_put(state.opt_state), state.step)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(3, 128, (8, 16), dtype=np.int32))
    d = jnp.asarray(rng.integers(3, 128, (8, 16), dtype=np.int32))
    q, d = shard_batch((q, d), mesh)
    step = jax.jit(functools.partial(train_step, tx=tx, config=cfg))
    with mesh:
        new_state, metrics = step(state, q, d)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # params actually moved
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), new_state.params, state.params),
    )
    assert delta > 0.0


def test_dp_matches_single_device_loss():
    """The sharded loss must equal the unsharded loss (same math, just
    distributed)."""
    cfg = EncoderConfig(vocab_size=64, hidden_dim=16, num_layers=1, num_heads=2, mlp_dim=32, max_len=8)
    from trueno_rag_tpu.train.contrastive import contrastive_loss

    state, _ = create_train_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(3, 64, (8, 8), dtype=np.int32))
    d = jnp.asarray(rng.integers(3, 64, (8, 8), dtype=np.int32))
    loss_single, _ = jax.jit(functools.partial(contrastive_loss, config=cfg))(state.params, q, d)

    mesh = create_mesh(data=8, model=1)
    qs, ds = shard_batch((q, d), mesh)
    ps = shard_params(state.params, mesh)
    with mesh:
        loss_shard, _ = jax.jit(functools.partial(contrastive_loss, config=cfg))(ps, qs, ds)
    np.testing.assert_allclose(float(loss_single), float(loss_shard), rtol=2e-3)


def test_sharded_hybrid_matches_single_host():
    """ShardedHybridIndex over 8 shards must return the same ranking as
    the single-host HybridRetriever for every fusion strategy.

    Uses sparse_mode="replicated": the replicated sparse arrays are the
    single-host arrays, so rankings are BIT-identical even on this
    deliberately tie-heavy template corpus. The sharded sparse layout
    changes f32 summation order (~1 ulp), which permutes mathematically
    tied scores — its contract is asserted by
    test_sharded_sparse_hybrid_rank_parity."""
    from trueno_rag_tpu.embed import TfIdfEmbedder
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.fusion import FusionStrategy
    from trueno_rag_tpu.parallel.hybrid import ShardedHybridIndex
    from trueno_rag_tpu.retrieve import HybridRetriever

    corpus = [
        f"document number {i} about {'foxes' if i % 3 == 0 else 'data'} "
        f"and {'retrieval' if i % 2 == 0 else 'ranking'} systems"
        for i in range(40)
    ]
    emb = TfIdfEmbedder(32).fit(corpus)
    retr = HybridRetriever(emb)
    chunks = []
    for i, t in enumerate(corpus):
        c = Chunk(document_id="d", content=t, start_offset=0, end_offset=len(t),
                  metadata=ChunkMetadata(), id=chunk_id_from_int(i))
        c.set_embedding(emb.embed_document(t))
        chunks.append(c)
    retr.index_batch(chunks)

    mesh = create_mesh(data=8, model=1)
    for fusion in [FusionStrategy.rrf(), FusionStrategy.linear(0.5), FusionStrategy.dbsf()]:
        retr.config.fusion = fusion
        sharded = ShardedHybridIndex(retr, mesh, fusion=fusion, candidates_per_source=20,
                                     sparse_mode="replicated")
        retr.config.candidates_per_source = 20
        for q in ["foxes retrieval", "data ranking", "document systems"]:
            single = retr.retrieve(q, 8)
            multi = sharded.search(q, 8)
            assert [r.chunk.id for r in multi] == [r.chunk.id for r in single], (fusion.kind, q)
            for a, b in zip(multi, single):
                assert abs(a.fused_score - b.fused_score) < 1e-5


def test_sharded_hybrid_incremental_refresh():
    """refresh(rows) must propagate mutations to the sharded replicas:
    post-refresh rankings equal a from-scratch rebuild AND the mutated
    single-host retriever."""
    from trueno_rag_tpu.embed import TfIdfEmbedder
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.parallel.hybrid import ShardedHybridIndex
    from trueno_rag_tpu.retrieve import HybridRetriever

    corpus = [
        f"entry {i} covering {'lions' if i % 4 == 0 else 'graphs'} and "
        f"{'indexing' if i % 2 == 0 else 'search'} topics"
        for i in range(32)
    ]
    emb = TfIdfEmbedder(32).fit(corpus + ["updated lions document indexing search"])

    def mk(i, text):
        c = Chunk(document_id="d", content=text, start_offset=0, end_offset=len(text),
                  metadata=ChunkMetadata(), id=chunk_id_from_int(i))
        c.set_embedding(emb.embed_document(text))
        return c

    retr = HybridRetriever(emb)
    retr.index_batch([mk(i, t) for i, t in enumerate(corpus)])
    mesh = create_mesh(data=8, model=1)
    # replicated sparse: this test pins BIT-exact parity with the
    # single host on a template-tied corpus (the sharded layout permutes
    # summation-jitter ties; its contract has its own tests below)
    sharded = ShardedHybridIndex(retr, mesh, candidates_per_source=16,
                                 sparse_mode="replicated")
    retr.config.candidates_per_source = 16

    # mutate: replace row 4's content, add a new chunk, remove chunk 7
    changed = []
    new4 = mk(4, "updated lions document indexing search")
    retr.index(new4)
    changed.append(retr.registry.row_of(new4.id))
    extra = mk(100, "brand new lions entry about indexing")
    retr.index(extra)
    changed.append(retr.registry.row_of(extra.id))
    row7 = retr.registry.row_of(chunk_id_from_int(7))
    retr.remove(chunk_id_from_int(7))
    changed.append(row7)

    sharded.refresh(rows=changed)
    rebuilt = ShardedHybridIndex(retr, mesh, candidates_per_source=16,
                                 sparse_mode="replicated")
    for q in ["lions indexing", "graphs search", "updated document"]:
        inc = sharded.search(q, 6)
        scratch = rebuilt.search(q, 6)
        single = retr.retrieve(q, 6)
        assert [r.chunk.id for r in inc] == [r.chunk.id for r in scratch], q
        assert [r.chunk.id for r in inc] == [r.chunk.id for r in single], q

    # capacity overflow falls back to a rebuild transparently
    big = mk(200, "overflow chunk lions " + "pad " * 40)
    retr.index(big)
    sharded.refresh(rows=[retr.registry.row_of(big.id)])
    got = [r.chunk.id for r in sharded.search("overflow lions", 4)]
    assert big.id in got


def _bm25_corpus(n, emb_dim=32):
    from trueno_rag_tpu.embed import TfIdfEmbedder
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.retrieve import HybridRetriever

    corpus = [
        f"item {i} about {'whales' if i % 5 == 0 else 'tensors'} plus "
        f"{'storage' if i % 2 == 0 else 'compute'} details number{i % 7}"
        for i in range(n)
    ]
    emb = TfIdfEmbedder(emb_dim).fit(corpus)
    retr = HybridRetriever(emb)
    chunks = []
    for i, t in enumerate(corpus):
        c = Chunk(document_id="d", content=t, start_offset=0, end_offset=len(t),
                  metadata=ChunkMetadata(), id=chunk_id_from_int(i))
        c.set_embedding(emb.embed_document(t))
        chunks.append(c)
    retr.index_batch(chunks)
    return retr


def assert_rank_parity(rows_a, scores_a, rows_b, scores_b, tol=1e-5):
    """Ranking equivalence modulo f32 summation-order jitter: scores
    positionally allclose, and rows may permute only WITHIN groups of
    scores tied to within ``tol`` (different gather layouts sum a doc's
    term contributions in different tree shapes — ~1 ulp — which is the
    same noise class as the device-vs-host-oracle gap). The trailing
    group is skipped when it touches the k cut (a tie straddling the
    boundary legitimately truncates differently)."""
    a, b = np.asarray(rows_a), np.asarray(rows_b)
    sa, sb = np.asarray(scores_a), np.asarray(scores_b)
    assert ((a >= 0) == (b >= 0)).all()
    np.testing.assert_allclose(
        np.where(np.isneginf(sa), 0, sa), np.where(np.isneginf(sb), 0, sb),
        rtol=tol, atol=tol,
    )
    k = int((a >= 0).sum())
    lo = 0
    while lo < k:
        hi = lo + 1
        while hi < k and abs(sa[hi] - sa[hi - 1]) <= tol * max(1.0, abs(sa[lo])):
            hi += 1
        if hi >= k and lo > 0:
            break  # tie group truncated by the k cut — membership may differ
        assert set(a[lo:hi]) == set(b[lo:hi]), (lo, hi, a[lo:hi], b[lo:hi])
        lo = hi


@pytest.mark.parametrize("n", [40, 5, 130])
def test_sharded_bm25_matches_single_host(n):
    """Document-sharded BM25 matches the single-host block path: global
    df/avgdl bake into the per-posting contributions at build, every
    document's postings live on one shard, and the k*s ICI merge keeps
    (score desc, row asc) — up to permutations within summation-jitter
    tie groups (see assert_rank_parity). n=5 exercises empty shards
    (fewer docs than chips)."""
    from trueno_rag_tpu.parallel.sparse import ShardedBM25

    retr = _bm25_corpus(n)
    mesh = create_mesh(data=8, model=1)
    sb = ShardedBM25(retr.sparse_index, mesh)
    for q in ["whales storage", "tensors compute details", "number3 item", "zzz absent"]:
        s1, r1 = retr.sparse_index.search_arrays([q], min(10, n))
        s2, r2 = sb.search_arrays([q], min(10, n))
        assert_rank_parity(r1[0], s1[0], r2[0], s2[0])


def test_sharded_sparse_hybrid_rank_parity():
    """Hybrid serving with the sharded sparse layout matches the
    single-host retriever exactly on a corpus whose scores are distinct
    beyond the jitter band (each doc carries unique low-df terms)."""
    from trueno_rag_tpu.embed import TfIdfEmbedder
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.parallel.hybrid import ShardedHybridIndex
    from trueno_rag_tpu.retrieve import HybridRetriever

    rng = np.random.default_rng(9)
    vocab = [f"tok{j}" for j in range(120)]
    # every doc: a unique token-set sample with a distinct-ish length, so
    # matched BM25 scores differ by far more than the ~1 ulp summation
    # jitter — rankings must then be exactly equal
    corpus = [
        " ".join(rng.choice(vocab, size=5 + (i * 3) % 29, replace=False))
        for i in range(48)
    ]
    emb = TfIdfEmbedder(32).fit(corpus)
    retr = HybridRetriever(emb)
    chunks = []
    for i, t in enumerate(corpus):
        c = Chunk(document_id="d", content=t, start_offset=0, end_offset=len(t),
                  metadata=ChunkMetadata(), id=chunk_id_from_int(i))
        c.set_embedding(emb.embed_document(t))
        chunks.append(c)
    retr.index_batch(chunks)
    mesh = create_mesh(data=8, model=1)
    retr.config.candidates_per_source = 16
    sh = ShardedHybridIndex(retr, mesh, candidates_per_source=16, sparse_mode="sharded")
    for q in ["tok3 tok40 tok77", "tok10 tok11 tok95", "tok50 tok1 tok62"]:
        single = retr.retrieve(q, 6)
        multi = sh.search(q, 6)
        assert [r.chunk.id for r in multi] == [r.chunk.id for r in single], q


def test_sharded_bm25_memory_is_sharded():
    """The per-shard block tables must hold ~total/s postings (the 10M
    north-star budget depends on it), not a replicated copy."""
    from trueno_rag_tpu.parallel.sparse import ShardedBM25

    retr = _bm25_corpus(128)
    mesh = create_mesh(data=8, model=1)
    sb = ShardedBM25(retr.sparse_index, mesh)
    assert sb.total_postings > 0
    # max shard holds far less than the whole corpus' postings
    assert sb.max_shard_postings <= sb.total_postings / 2
    # device layout: leading axis sharded over the mesh
    assert sb.blocks.shape[0] == 8
