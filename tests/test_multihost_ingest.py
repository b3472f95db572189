"""Multi-host ingest parity: shard-local builds merged into the sharded
indexes must match a single-host build of the same corpus exactly —
BM25 scores bit-identical (global df/avgdl/idf recomputed from shard
sums), dense results identical (per-shard placement, no full-host
matrix)."""

import numpy as np
import pytest

from trueno_rag_tpu.chunking import Chunk
from trueno_rag_tpu.index.bm25 import BM25Index
from trueno_rag_tpu.parallel.ingest import (
    ShardBuild,
    assemble_row_sharded,
    build_shard,
    merge_shard_stats,
)
from trueno_rag_tpu.parallel.mesh import create_mesh
from trueno_rag_tpu.parallel.sharded import ShardedVectorIndex
from trueno_rag_tpu.parallel.sparse import ShardedBM25
from trueno_rag_tpu.persist import deserialize_compressed, serialize_compressed

S = 4  # shards


def _corpus(n=220, seed=0):
    """Zipf-ish synthetic docs over a small vocabulary (repeat terms so
    tf > 1 and df varies)."""
    rng = np.random.default_rng(seed)
    words = [f"term{i:03d}" for i in range(150)]
    docs = []
    for _ in range(n):
        ln = int(rng.integers(5, 40))
        ids = rng.zipf(1.5, size=ln) % len(words)
        docs.append(" ".join(words[i] for i in ids))
    return docs


def _single_host_sharded(texts, mesh):
    idx = BM25Index(use_native=False)
    for t in texts:
        # registry assigns rows 0..n-1 in insertion order — the same
        # global row space as contiguous shard splits of `texts`
        idx.add(Chunk(document_id="d", content=t, start_offset=0, end_offset=len(t)))
    return ShardedBM25(idx, mesh)


def _multi_host_sharded(texts, mesh, rps, use_native=False, via_payload=False):
    builds = [
        build_shard(texts[i * rps : (i + 1) * rps], n_rows=rps, use_native=use_native)
        for i in range(S)
    ]
    if via_payload:  # the DCN/disk wire form
        builds = [
            deserialize_compressed(serialize_compressed(b.to_payload()))
            for b in builds
        ]
    return ShardedBM25.from_shard_builds(builds, mesh, rows_per_shard=rps)


QUERIES = [
    "term001 term002 term003",
    "term000",  # most frequent
    "term120 term140",  # rare
    "nosuchterm whatsoever",  # OOV
    "term005 term005 term007 term050 term099",
]


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(data=S, model=2)


def test_sparse_multihost_parity(mesh):
    texts = _corpus()
    rps = -(-len(texts) // S)
    single = _single_host_sharded(texts, mesh)
    multi = _multi_host_sharded(texts, mesh, rps)

    assert multi.total_postings == single.total_postings
    assert multi.rows_per_shard == single.rows_per_shard == rps
    for k in (1, 10, 37):
        s1, r1 = single.search_arrays(QUERIES, k)
        s2, r2 = multi.search_arrays(QUERIES, k)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        # bit-identical: same f32 contributions, same accumulation order
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_sparse_multihost_parity_via_payload(mesh):
    texts = _corpus(n=97, seed=3)  # ragged: last shard short
    rps = -(-len(texts) // S)
    single = _single_host_sharded(texts, mesh)
    multi = _multi_host_sharded(texts, mesh, rps, via_payload=True)
    s1, r1 = single.search_arrays(QUERIES, 10)
    s2, r2 = multi.search_arrays(QUERIES, 10)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_native_and_python_builds_agree(mesh):
    from trueno_rag_tpu.native import native_available

    if not native_available():
        pytest.skip("native builder unavailable")
    texts = _corpus(n=120, seed=7)
    rps = -(-len(texts) // S)
    py = _multi_host_sharded(texts, mesh, rps, use_native=False)
    nat = _multi_host_sharded(texts, mesh, rps, use_native=True)
    s1, r1 = py.search_arrays(QUERIES, 10)
    s2, r2 = nat.search_arrays(QUERIES, 10)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_empty_shard(mesh):
    texts = _corpus(n=30, seed=11)
    rps = 16  # shard 0 full, shard 1 partial, shards 2-3 EMPTY
    builds = [
        build_shard(texts[i * rps : (i + 1) * rps], n_rows=rps) for i in range(S)
    ]
    assert builds[2].n_docs == 0 and builds[3].n_docs == 0
    multi = ShardedBM25.from_shard_builds(builds, mesh, rows_per_shard=rps)
    single = _single_host_sharded(texts, mesh)
    s1, r1 = single.search_arrays(QUERIES, 10)
    s2, r2 = multi.search_arrays(QUERIES, 10)
    # the single-host split uses rps=8 here vs the multi-host 16, so
    # slot-axis padding differs and XLA's f32 reduction tree regroups
    # at the last bit: same row SETS, scores equal to ~1 ulp (matched
    # partitions — the other tests — stay bit-identical)
    s1n, s2n = np.asarray(s1), np.asarray(s2)
    np.testing.assert_allclose(s1n, s2n, rtol=3e-6, atol=0)
    r1n, r2n = np.asarray(r1), np.asarray(r2)
    for q in range(r1n.shape[0]):
        assert set(r1n[q].tolist()) == set(r2n[q].tolist())


def test_merge_stats_match_single_host():
    texts = _corpus(n=64, seed=5)
    rps = 16
    builds = [
        build_shard(texts[i * rps : (i + 1) * rps], n_rows=rps) for i in range(S)
    ]
    terms, vocab, idf, n_docs, avgdl = merge_shard_stats(builds)
    idx = BM25Index(use_native=False)
    for t in texts:
        idx.add(Chunk(document_id="d", content=t, start_offset=0, end_offset=len(t)))
    assert n_docs == 64
    assert avgdl == pytest.approx(idx.avg_doc_length, rel=0, abs=0)
    idx._refresh_snapshot()
    # single-host python snapshot sorts terms too — same order, same idf
    assert terms == sorted(idx._snap["vocab"].keys())
    np.testing.assert_array_equal(idf, np.asarray(idx._snap["idf"]))


def test_shard_build_payload_roundtrip():
    b = build_shard(["alpha beta beta", "gamma alpha"], n_rows=4)
    p = deserialize_compressed(serialize_compressed(b.to_payload()))
    b2 = ShardBuild.from_payload(p)
    assert b2.terms == b.terms and b2.n_docs == 2 and b2.n_rows == 4
    np.testing.assert_array_equal(b2.rows, b.rows)
    np.testing.assert_array_equal(b2.tfs, b.tfs)
    np.testing.assert_array_equal(b2.indptr, b.indptr)
    np.testing.assert_array_equal(b2.doc_len, b.doc_len)


def test_dense_from_shard_matrices(mesh):
    rng = np.random.default_rng(2)
    n, d, k = 210, 32, 9
    rps = -(-n // S)
    full = rng.standard_normal((n, d)).astype(np.float32)
    blocks = [full[i * rps : (i + 1) * rps] for i in range(S)]
    tags = (rng.integers(0, 8, size=n)).astype(np.int32)
    tag_blocks = [tags[i * rps : (i + 1) * rps] for i in range(S)]

    ref = ShardedVectorIndex(full, mesh, metric="cosine", tags=tags)
    multi = ShardedVectorIndex.from_shard_matrices(
        blocks, mesh, metric="cosine", tags=tag_blocks
    )
    assert multi.n == n

    queries = rng.standard_normal((5, d)).astype(np.float32)
    s1, r1 = ref.search(queries, k)
    s2, r2 = multi.search(queries, k)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))

    # tag-filtered parity (require bit0)
    b = queries.shape[0]
    masks = (
        np.full(b, 1, np.int32), np.zeros(b, np.int32), np.zeros(b, np.int32)
    )
    s1, r1 = ref.search(queries, k, tag_masks=masks)
    s2, r2 = multi.search(queries, k, tag_masks=masks)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_hybrid_from_shard_builds_parity(mesh):
    """End-to-end: per-shard (chunks, embeddings, BM25 builds) assemble
    into a ShardedHybridIndex whose fused results match the single-host
    retriever -> sharded path."""
    from trueno_rag_tpu.embed import MockEmbedder
    from trueno_rag_tpu.parallel.hybrid import ShardedHybridIndex
    from trueno_rag_tpu.retrieve import HybridRetriever

    texts = _corpus(n=120, seed=9)
    rps = -(-len(texts) // S)
    embedder = MockEmbedder(dimension=48)

    def make_chunks():
        return [
            Chunk(document_id=f"doc{i}", content=t, start_offset=0,
                  end_offset=len(t), id=f"c{i}")
            for i, t in enumerate(texts)
        ]

    # single-host path (VectorStore normalizes at insert)
    retr = HybridRetriever(embedder)
    single_chunks = make_chunks()
    embedder.embed_chunks(single_chunks)
    embs = np.asarray([c.embedding for c in single_chunks], np.float32)
    retr.index_batch(single_chunks)
    single = ShardedHybridIndex(retr, mesh)

    # multi-host path: contiguous shard splits of the same artifacts
    multi_chunks = make_chunks()
    blocks = [np.asarray(embs[i * rps : (i + 1) * rps], np.float32) for i in range(S)]
    builds = [
        build_shard(texts[i * rps : (i + 1) * rps], n_rows=min(rps, len(texts) - i * rps))
        for i in range(S)
    ]
    multi = ShardedHybridIndex.from_shard_builds(
        embedder, blocks, builds, mesh,
        chunks_per_shard=[multi_chunks[i * rps : (i + 1) * rps] for i in range(S)],
    )

    for q in QUERIES[:3]:
        r1 = single.search(q, 10)
        r2 = multi.search(q, 10)
        assert [x.chunk.id for x in r1] == [x.chunk.id for x in r2]
        np.testing.assert_allclose(
            [x.fused_score for x in r1], [x.fused_score for x in r2],
            rtol=1e-6,
        )

    # immutability contract
    from trueno_rag_tpu.errors import InvalidConfigError

    with pytest.raises(InvalidConfigError):
        multi.refresh()


def test_assemble_row_sharded_layout(mesh):
    blocks = [np.full((3, 2), i, np.float32) for i in range(S)]
    arr = assemble_row_sharded(blocks, mesh, "data")
    assert arr.shape == (12, 2)
    np.testing.assert_array_equal(
        np.asarray(arr), np.concatenate(blocks, axis=0)
    )


def test_shard_count_mismatch_raises(mesh):
    from trueno_rag_tpu.errors import InvalidConfigError

    with pytest.raises(InvalidConfigError):
        ShardedBM25.from_shard_builds(
            [build_shard(["a b c"])], mesh, rows_per_shard=4
        )
    with pytest.raises(InvalidConfigError):
        assemble_row_sharded([np.zeros((2, 2), np.float32)], mesh, "data")


# -- property: random corpora, random shard splits, exact parity -----------

from hypothesis import example, given, settings, strategies as st

_WORD = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "fox", "data", "index", "rank",
     "query", "model", "tpu", "chip", "shard", "merge", "vocab"]
)
_DOC = st.lists(_WORD, min_size=1, max_size=15).map(" ".join)


@settings(max_examples=10, deadline=None)
@example(docs=["alpha"] * 9, q="alpha", k=3)  # all-identical: full ties
@example(docs=["alpha beta", "gamma"], q="delta", k=5)  # OOV query
@given(
    docs=st.lists(_DOC, min_size=1, max_size=40),
    q=st.lists(_WORD, min_size=1, max_size=4).map(" ".join),
    k=st.integers(1, 12),
)
def test_property_multihost_merge_parity(mesh, docs, q, k):
    """Any corpus, any contiguous equal-capacity split: the merged
    shard-local builds score bit-identically to the single-host build
    over the same partition (statistics are sums; idf recipe shared)."""
    rps = -(-len(docs) // S)
    single = _single_host_sharded(docs, mesh)
    builds = [build_shard(docs[i * rps : (i + 1) * rps], n_rows=rps)
              for i in range(S)]
    multi = ShardedBM25.from_shard_builds(builds, mesh, rows_per_shard=rps)
    s1, r1 = single.search_arrays([q], k)
    s2, r2 = multi.search_arrays([q], k)
    s1n, s2n = np.asarray(s1), np.asarray(s2)
    np.testing.assert_array_equal(s1n, s2n)
    # rows may only differ among EXACTLY tied scores
    r1n, r2n = np.asarray(r1)[0], np.asarray(r2)[0]
    for j in range(k):
        if r1n[j] != r2n[j]:
            assert s1n[0][j] == s2n[0][j]
            tied = s1n[0] == s1n[0][j]
            assert tied.sum() > 1
