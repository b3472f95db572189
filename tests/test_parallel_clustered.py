"""Sharded cluster-pruned tier: per-shard pruned scans composing a
GLOBAL exact-set certificate on the virtual mesh — certified queries
must match the fp32 oracle over the full corpus; host patch covers the
rest; pruning misses fail closed, never drop rows."""

import numpy as np
import pytest

from trueno_rag_tpu.parallel.clustered import ShardedClusteredIndex
from trueno_rag_tpu.parallel.mesh import create_mesh

S = 4
TILE = 1024


def _corpus(n=16_000, d=96, blobs=16, seed=0, planted=5):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((blobs, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    which = np.repeat(np.arange(blobs), -(-n // blobs))[:n]
    m = centers[which] + 0.05 * rng.standard_normal((n, d)).astype(np.float32)
    for bi in range(blobs):
        rows = np.flatnonzero(which == bi)[:planted]
        m[rows] = centers[bi] + 0.01 * rng.standard_normal(
            (len(rows), d)
        ).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return m.astype(np.float32), centers


def _oracle(m, queries, k, allowed=None):
    q = np.asarray(queries, np.float64)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    s = q @ m.astype(np.float64).T
    if allowed is not None:
        s[:, ~allowed] = -np.inf
    return np.argsort(-s, axis=1, kind="stable")[:, :k]


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(data=S, model=2)


def test_sharded_clustered_certified_sets_exact(mesh):
    m, centers = _corpus()
    idx = ShardedClusteredIndex(
        m, mesh, tile_n=TILE, probe_tiles=2, keep_host=False,
    )
    queries = centers[:4].astype(np.float32)
    k = 5
    s, r, ok = idx.search(queries, k)
    ok = np.asarray(ok).astype(bool)
    r = np.asarray(r)
    assert ok.any(), "nothing certified on planted blob data"
    rx = _oracle(m, queries, k)
    for i in np.flatnonzero(ok):
        assert set(r[i].tolist()) == set(rx[i].tolist()), f"query {i}"


def test_sharded_clustered_host_patch_makes_all_exact(mesh):
    m, centers = _corpus(seed=2)
    idx = ShardedClusteredIndex(m, mesh, tile_n=TILE, probe_tiles=1)
    rng = np.random.default_rng(3)
    # adversarial off-center queries: some will fail the certificate
    queries = (centers[:3] + 0.3 * rng.standard_normal(
        (3, m.shape[1])
    )).astype(np.float32)
    s, r, ok = idx.search(queries, 5)
    assert bool(np.asarray(ok).all())  # host patch covers misses
    r = np.asarray(r)
    rx = _oracle(m, queries, 5)
    for i in range(3):
        assert set(r[i].tolist()) == set(rx[i].tolist()), f"query {i}"


def test_sharded_clustered_tags(mesh):
    m, centers = _corpus(seed=5)
    n = m.shape[0]
    rng = np.random.default_rng(6)
    tag_bits = rng.integers(0, 4, size=n).astype(np.int32)
    idx = ShardedClusteredIndex(
        m, mesh, tile_n=TILE, probe_tiles=3, tags=tag_bits,
    )
    b = 3
    queries = centers[:b].astype(np.float32)
    masks = (np.full(b, 1, np.int32), np.zeros(b, np.int32),
             np.zeros(b, np.int32))
    s, r, ok = idx.search(queries, 5, tag_masks=masks)
    assert bool(np.asarray(ok).all())  # patched where uncertified
    r = np.asarray(r)
    allowed = (tag_bits & 1) != 0
    rx = _oracle(m, queries, 5, allowed=allowed)
    for i in range(b):
        rows = [x for x in r[i].tolist() if x >= 0]
        assert all(allowed[x] for x in rows), "filter leaked"
        assert set(r[i].tolist()) == set(rx[i].tolist()), f"query {i}"


def test_sharded_clustered_matches_sharded_compact(mesh):
    """Same corpus, same mesh: the pruned tier's certified results must
    agree with the full-stream sharded compact tier (both prove the
    same global set)."""
    from trueno_rag_tpu.parallel.compact import ShardedCompactIndex

    m, centers = _corpus(seed=8, n=8192, blobs=8)
    # globally shuffle rows: the compact tier keeps ROW order, and
    # blob-adjacent planted rows would all share one 128-block (top-2
    # per block) — the clustered tier's build interleaves, the compact
    # tier needs the data to (documented adjacency limit)
    m = m[np.random.default_rng(9).permutation(m.shape[0])]
    clustered = ShardedClusteredIndex(
        m, mesh, tile_n=TILE, probe_tiles=2, keep_host=False,
    )
    compact = ShardedCompactIndex(m, mesh, tile_n=TILE, keep_host=False)
    queries = centers[:3].astype(np.float32)
    s1, r1, ok1 = clustered.search(queries, 5)
    s2, r2, ok2 = compact.search(queries, 5)
    both = np.asarray(ok1).astype(bool) & np.asarray(ok2).astype(bool)
    r1n, r2n = np.asarray(r1), np.asarray(r2)
    assert both.any()
    for i in np.flatnonzero(both):
        assert set(r1n[i].tolist()) == set(r2n[i].tolist())


def test_hybrid_dense_mode_clustered(mesh):
    """ShardedHybridIndex(dense_mode='clustered'): pruned dense shards +
    BM25 + fusion must match the single-host retriever (host patch
    keeps the dense candidates exact)."""
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.embed import MockEmbedder
    from trueno_rag_tpu.index.vector_store import VectorStoreConfig
    from trueno_rag_tpu.parallel.hybrid import ShardedHybridIndex
    from trueno_rag_tpu.retrieve import HybridRetriever, TagFilter

    rng = np.random.default_rng(12)
    n, dim, blobs = 8192, 48, 8
    centers = rng.standard_normal((blobs, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    which = np.repeat(np.arange(blobs), n // blobs)
    m = centers[which] + 0.05 * rng.standard_normal((n, dim)).astype(np.float32)

    emb = MockEmbedder(dimension=dim)
    retr = HybridRetriever(
        emb,
        vector_config=VectorStoreConfig(
            dimension=dim, scan_tile_n=1024, cluster_probe_tiles=2,
        ),
    )
    retr.config.candidates_per_source = 12
    chunks = []
    for i in range(n):
        c = Chunk(document_id="d", content=f"topic{which[i]} item {i} data",
                  start_offset=0, end_offset=5, metadata=ChunkMetadata(),
                  id=chunk_id_from_int(i))
        c.set_embedding(m[i])
        chunks.append(c)
    retr.index_batch(chunks)
    for i in range(0, n, 2):
        retr.registry.set_tags(chunks[i].id, ["even"])

    hybrid = ShardedHybridIndex(
        retr, mesh, candidates_per_source=12,
        dense_mode="clustered", sparse_mode="replicated",
    )
    q = "topic3 item data"
    want = [r.chunk.id for r in retr.retrieve(q, 5)]
    got = [r.chunk.id for r in hybrid.search(q, 5)]
    assert got == want
    wf = [r.chunk.id for r in retr.retrieve(q, 5, tag_filter=TagFilter(all=["even"]))]
    gf = [r.chunk.id for r in hybrid.search(q, 5, tag_filter=TagFilter(all=["even"]))]
    assert gf == wf


def test_sharded_clustered_concentrated_runners_up_certify(mesh):
    """Regression (mirrors the VectorStore single-chip test): with
    t_top sized to exactly k, a scanned tile's exclusion threshold is
    its t_top-th emitted candidate's bf16 upper bound (~±1.7e-3) — for
    a corpus whose top-k concentrates in one tile that bound sits ABOVE
    the k-th fp32 score, so NO query certified and (keep_host=False)
    none could be patched. The +4 runner-up slack makes the threshold a
    pack row instead; the same corpus certifies end-to-end on the mesh."""
    rng = np.random.default_rng(41)
    d, k = 64, 10
    n = 16 * TILE  # 4 tiles per shard, one natural blob per tile
    blobs = n // TILE
    centers = rng.standard_normal((blobs, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    per = n // blobs
    which = np.repeat(np.arange(blobs), per)
    sig = np.where(np.arange(n) % per < k, 0.005, 0.04)
    m = (centers[which] + sig[:, None] * rng.standard_normal((n, d))
         ).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)  # raw-dot oracle below
    idx = ShardedClusteredIndex(
        m, mesh, tile_n=TILE, probe_tiles=2, keep_host=False,
    )
    queries = centers[rng.choice(blobs, size=6, replace=False)]
    s, r, ok = idx.search(queries.astype(np.float32), k)
    assert bool(np.asarray(ok).all()), (
        f"only {int(np.asarray(ok).sum())}/6 certified"
    )
    rx = _oracle(m, queries, k)
    r = np.asarray(r)
    for i in range(len(queries)):
        assert set(r[i].tolist()) == set(rx[i].tolist()), f"query {i}"
