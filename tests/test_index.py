"""Index tests: device dense/BM25 paths pinned to scalar oracles, store
invariants (dimension validation, tombstones, growth), reference BM25
ranking semantics (index.rs unit tests: ranking sanity, idf math)."""

import numpy as np
import pytest

from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
from trueno_rag_tpu.errors import DimensionMismatchError, VectorStoreError
from trueno_rag_tpu.index import BM25Index, ChunkRegistry, VectorStore, VectorStoreConfig
from trueno_rag_tpu.ops.dense import dense_topk, dense_topk_oracle


def mk_chunk(i: int, content: str, dim=None) -> Chunk:
    c = Chunk(
        document_id="doc",
        content=content,
        start_offset=0,
        end_offset=len(content),
        metadata=ChunkMetadata(),
        id=chunk_id_from_int(i),
    )
    if dim is not None:
        rng = np.random.Generator(np.random.PCG64(i))
        c.set_embedding(rng.standard_normal(dim).astype(np.float32))
    return c


# ---------------------------------------------------------------- dense ----


@pytest.mark.parametrize("metric", ["cosine", "dot", "euclidean"])
def test_dense_topk_matches_oracle(metric):
    rng = np.random.Generator(np.random.PCG64(0))
    n, d, b, k = 200, 32, 4, 10
    matrix = rng.standard_normal((n, d)).astype(np.float32)
    if metric == "cosine":
        # store normalized rows like VectorStore does
        norms = np.linalg.norm(matrix, axis=1, keepdims=True)
        matrix = matrix / np.where(norms == 0, 1, norms)
    queries = rng.standard_normal((b, d)).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    valid[50:60] = False  # tombstones
    s_dev, r_dev = dense_topk(queries, matrix, valid, k, metric)
    s_ora, r_ora = dense_topk_oracle(queries, matrix, valid, k, metric)
    np.testing.assert_array_equal(np.asarray(r_dev), r_ora)
    np.testing.assert_allclose(np.asarray(s_dev), s_ora, rtol=1e-4, atol=1e-5)


def test_dense_topk_tie_break_row_asc():
    # identical rows -> equal scores; lower row must win
    matrix = np.tile(np.array([[1.0, 0.0]], dtype=np.float32), (8, 1))
    valid = np.ones(8, dtype=bool)
    q = np.array([[1.0, 0.0]], dtype=np.float32)
    _, rows = dense_topk(q, matrix, valid, 4, "cosine")
    np.testing.assert_array_equal(np.asarray(rows[0]), [0, 1, 2, 3])


def test_vector_store_roundtrip_and_validation():
    store = VectorStore(VectorStoreConfig(dimension=16, initial_capacity=4))
    with pytest.raises(VectorStoreError):
        store.insert(mk_chunk(1, "no embedding"))
    bad = mk_chunk(2, "bad dim", dim=8)
    with pytest.raises(DimensionMismatchError):
        store.insert(bad)

    chunks = [mk_chunk(i, f"chunk {i}", dim=16) for i in range(10)]
    store.insert_many(chunks)  # forces capacity growth 4 -> 16
    assert len(store) == 10
    res = store.search(chunks[3].embedding, k=3)
    assert res[0][0] == chunks[3].id  # self-similarity wins
    assert res[0][1] == pytest.approx(1.0, abs=1e-5)
    assert store.get(chunks[3].id).content == "chunk 3"


def test_vector_store_remove_tombstone():
    store = VectorStore(VectorStoreConfig(dimension=8))
    chunks = [mk_chunk(i, f"c{i}", dim=8) for i in range(5)]
    store.insert_many(chunks)
    assert store.remove(chunks[0].id)
    assert not store.remove(chunks[0].id)
    assert len(store) == 4
    res = store.search(chunks[0].embedding, k=5)
    assert chunks[0].id not in [cid for cid, _ in res]
    # freed row gets recycled
    store.insert(mk_chunk(99, "recycled", dim=8))
    assert len(store) == 5


def test_vector_store_euclidean_and_dot():
    for metric in ("euclidean", "dot"):
        store = VectorStore(VectorStoreConfig(dimension=4, metric=metric))
        a, b = mk_chunk(1, "a"), mk_chunk(2, "b")
        a.set_embedding([1, 0, 0, 0])
        b.set_embedding([5, 0, 0, 0])
        store.insert_many([a, b])
        res = store.search([1.1, 0, 0, 0], k=2)
        if metric == "euclidean":
            assert res[0][0] == a.id
            assert res[0][1] == pytest.approx(-0.1, abs=1e-5)
        else:
            assert res[0][0] == b.id


# ---------------------------------------------------------------- BM25 ----

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "machine learning models process data quickly",
    "the fox is a wild animal found in forests",
    "deep learning requires large amounts of data",
    "foxes hunt small animals during the night",
    "data processing pipelines transform information",
]


def build_bm25():
    idx = BM25Index()
    for i, text in enumerate(CORPUS):
        idx.add(mk_chunk(i, text))
    return idx


def test_bm25_device_matches_host_oracle():
    idx = build_bm25()
    for q in ["fox", "data learning", "quick brown fox", "nonexistent term", "the"]:
        host = idx.search_host(q, 10)
        dev = idx.search(q, 10)
        assert [cid for cid, _ in dev] == [cid for cid, _ in host], q
        for (c1, s1), (c2, s2) in zip(dev, host):
            assert s1 == pytest.approx(s2, rel=1e-5), q


def test_bm25_ranking_sanity():
    idx = build_bm25()
    res = idx.search("fox", 10)
    hits = [cid for cid, _ in res]
    assert chunk_id_from_int(0) in hits and chunk_id_from_int(2) in hits
    # stopword-only query: "the" and "is" are stopwords -> no results
    assert idx.search("the is", 10) == []


def test_bm25_rare_term_beats_common():
    idx = BM25Index()
    docs = ["common words appear everywhere"] * 5 + ["zyzzyva rare specimen"]
    for i, t in enumerate(docs):
        idx.add(mk_chunk(i, t))
    res = idx.search("zyzzyva common", 6)
    assert res[0][0] == chunk_id_from_int(5)


def test_bm25_remove_and_gc():
    idx = build_bm25()
    assert idx.remove(chunk_id_from_int(0))
    assert not idx.remove(chunk_id_from_int(0))
    assert len(idx) == 5
    res = idx.search("quick brown", 10)
    assert chunk_id_from_int(0) not in [cid for cid, _ in res]
    # posting list for 'jumps' should be gone entirely
    assert "jumps" not in idx._postings


def test_bm25_avgdl_incremental():
    idx = build_bm25()
    lens = [len(idx._tokenize(t)) for t in CORPUS]
    assert idx.avg_doc_length == pytest.approx(sum(lens) / len(lens))
    idx.remove(chunk_id_from_int(1))
    lens.pop(1)
    assert idx.avg_doc_length == pytest.approx(sum(lens) / len(lens))


def test_bm25_batch_queries():
    idx = build_bm25()
    scores, rows = idx.search_arrays(["fox", "data"], k=4)
    assert scores.shape == (2, 4) and rows.shape == (2, 4)
    host_fox = idx.search_host("fox", 4)
    assert idx.registry.id_of(int(rows[0, 0])) == host_fox[0][0]


def test_bm25_empty_and_unknown():
    idx = BM25Index()
    assert idx.search("anything", 5) == []
    idx.add(mk_chunk(1, "hello world example"))
    assert idx.search("zzz qqq", 5) == []


def test_bm25_state_dict_roundtrip():
    idx = build_bm25()
    state = idx.state_dict()
    reg = idx.registry
    idx2 = BM25Index(registry=reg)
    idx2.load_state_dict(state)
    assert [c for c, _ in idx2.search("fox data", 10)] == [
        c for c, _ in idx.search("fox data", 10)
    ]


def test_shared_registry_rows_align():
    reg = ChunkRegistry()
    store = VectorStore(VectorStoreConfig(dimension=8), registry=reg)
    idx = BM25Index(registry=reg)
    chunks = [mk_chunk(i, f"shared text number {i}", dim=8) for i in range(4)]
    for c in chunks:
        store.insert(c)
        idx.add(c)
    assert reg.capacity_rows == 4
    _, rows_d = store.search_arrays(chunks[2].embedding[None, :], k=1)
    assert int(rows_d[0, 0]) == reg.row_of(chunks[2].id)


def test_bm25_candidates_matches_scatter():
    """The corpus-size-independent candidate path must agree with the
    dense scatter oracle on randomized postings."""
    import jax.numpy as jnp
    import numpy as np

    from trueno_rag_tpu.ops.bm25 import bm25_topk_candidates, bm25_topk_scatter

    rng = np.random.default_rng(7)
    n, v, p, bsz, L, k = 500, 40, 2000, 3, 256, 20
    term_sorted = np.sort(rng.integers(0, v, p))
    rows = rng.integers(0, n, p).astype(np.int32)
    tfs = rng.integers(1, 6, p).astype(np.float32)
    indptr = np.searchsorted(term_sorted, np.arange(v + 1))
    idf = rng.random(v).astype(np.float32) + 0.1
    doc_len = rng.integers(5, 50, n).astype(np.float32)
    avgdl = jnp.asarray(np.float32(doc_len.mean()))

    positions = np.zeros((bsz, L), np.int32)
    terms = np.zeros((bsz, L), np.int32)
    mask = np.zeros((bsz, L), bool)
    for i in range(bsz):
        parts_p, parts_t = [], []
        for t in rng.choice(v, 4, replace=False):
            lo, hi = int(indptr[t]), int(indptr[t + 1])
            parts_p.append(np.arange(lo, hi, dtype=np.int32))
            parts_t.append(np.full(hi - lo, t, np.int32))
        pos = np.concatenate(parts_p)[:L]
        trm = np.concatenate(parts_t)[:L]
        positions[i, : len(pos)] = pos
        terms[i, : len(trm)] = trm
        mask[i, : len(pos)] = True

    args = (jnp.asarray(positions), jnp.asarray(terms), jnp.asarray(mask),
            jnp.asarray(rows), jnp.asarray(tfs), jnp.asarray(idf),
            jnp.asarray(doc_len), avgdl)
    s_c, r_c = bm25_topk_candidates(*args, k=k)
    s_s, r_s = bm25_topk_scatter(*args, k=k, n_rows=n)
    r_c, r_s = np.asarray(r_c), np.asarray(r_s)
    # same candidate sets; adjacent ranks may swap when two true scores
    # differ by <1 ulp (cumsum-difference vs scatter-add fp association)
    for qi in range(bsz):
        assert set(r_c[qi].tolist()) == set(r_s[qi].tolist()), qi
    np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_s), rtol=1e-4, atol=1e-5)


def test_vector_store_bf16_storage_mode():
    """bfloat16 storage: same top results on well-separated data, half
    the device bytes; scores within ~1e-2 of the fp32 store."""
    cfg32 = VectorStoreConfig(dimension=32, storage_dtype="float32")
    cfg16 = VectorStoreConfig(dimension=32, storage_dtype="bfloat16")
    s32, s16 = VectorStore(cfg32), VectorStore(cfg16)
    chunks = [mk_chunk(i, f"c{i}", dim=32) for i in range(50)]
    s32.insert_many([mk_chunk(i, f"c{i}", dim=32) for i in range(50)])
    s16.insert_many(chunks)
    import jax.numpy as jnp

    assert s16.device_matrix.dtype == jnp.bfloat16
    q = chunks[7].embedding
    r32 = s32.search(q, 3)
    r16 = s16.search(q, 3)
    assert r16[0][0] == r32[0][0]  # clear winner identical
    assert r16[0][1] == pytest.approx(r32[0][1], abs=1e-2)

    with pytest.raises(Exception):
        VectorStoreConfig(dimension=8, storage_dtype="fp8")


def test_incremental_device_update_matches_full_upload():
    """After small mutations the incremental scatter refresh must give
    the same device state as a from-scratch upload."""
    import jax.numpy as jnp

    store = VectorStore(VectorStoreConfig(dimension=8, initial_capacity=64))
    chunks = [mk_chunk(i, f"c{i}", dim=8) for i in range(40)]
    store.insert_many(chunks)
    _ = store.device_matrix  # full upload happens here

    # small mutation set -> incremental path
    store.remove(chunks[3].id)
    repl = mk_chunk(3, "replaced", dim=8)
    store.insert(repl)
    extra = mk_chunk(99, "extra", dim=8)
    store.insert(extra)
    assert store._dirty_rows  # bounded set pending
    incr_matrix = np.asarray(store.device_matrix)
    incr_valid = np.asarray(store.device_valid)

    np.testing.assert_array_equal(incr_matrix, store._host)
    np.testing.assert_array_equal(incr_valid, store._valid)

    # search still correct after incremental refresh
    res = store.search(extra.embedding, k=1)
    assert res[0][0] == extra.id


def test_bulk_mutation_falls_back_to_full_upload():
    store = VectorStore(VectorStoreConfig(dimension=8, initial_capacity=64))
    store.insert_many([mk_chunk(i, f"c{i}", dim=8) for i in range(10)])
    _ = store.device_matrix
    # mutate more than the max(64, 5%) threshold (also grows capacity)
    store.insert_many([mk_chunk(100 + i, f"n{i}", dim=8) for i in range(70)])
    assert store._dirty_rows is None  # unbounded -> full re-upload
    np.testing.assert_array_equal(np.asarray(store.device_matrix), store._host)


def test_bm25_blocks_matches_segments_and_host():
    """The block-gather fast path must rank identically to the segment
    path and the host oracle (scores to fp32 associativity)."""
    import jax.numpy as jnp

    from trueno_rag_tpu.ops.bm25 import bm25_topk_segments

    rng = np.random.default_rng(11)
    words = [f"t{i}" for i in range(80)]
    idx = BM25Index(use_native=False)
    for i in range(300):
        text = " ".join(rng.choice(words, size=rng.integers(4, 50)))
        idx.add(mk_chunk(i, text))
    queries = [" ".join(rng.choice(words, size=rng.integers(1, 5))) for _ in range(6)]
    queries.append("unknownterm onlyhere")
    k = 12
    s_blk, r_blk = idx.search_arrays(queries, k)  # blocks path (default)
    idx._refresh_snapshot()
    starts, lens = idx._gather_segments(queries)
    s_seg, r_seg = bm25_topk_segments(
        jnp.asarray(starts), jnp.asarray(lens), idx._get_packed(),
        idx._snap["avgdl"], k=k, k1=idx.k1, b=idx.b,
    )
    # Scores agree to fp32 tolerance; rows agree except where two rows'
    # scores tie within that tolerance (XLA's f32 division can differ
    # from numpy's in the last ulp, swapping exact near-ties).
    s_blk_np, s_seg_np = np.asarray(s_blk), np.asarray(s_seg)
    r_blk_np, r_seg_np = np.asarray(r_blk), np.asarray(r_seg)
    np.testing.assert_allclose(
        np.where(np.isneginf(s_blk_np), 0, s_blk_np),
        np.where(np.isneginf(s_seg_np), 0, s_seg_np),
        atol=1e-4, rtol=1e-4,
    )
    for qi in range(len(queries)):
        for j in np.nonzero(r_blk_np[qi] != r_seg_np[qi])[0]:
            # a displaced row must sit in a near-tie band
            assert abs(s_blk_np[qi, j] - s_seg_np[qi, j]) < 1e-4, (qi, j)
            assert r_blk_np[qi, j] in r_seg_np[qi], (qi, j)
    # host-oracle ranking agreement for the first real query
    host = idx.search_host(queries[0], k)
    dev = idx.search(queries[0], k)
    assert [h[0] for h in host] == [d[0] for d in dev]


def test_bm25_blocks_fallback_past_f32_rows(monkeypatch):
    """Past the f32-exact row range the snapshot must fall back to the
    segment layout and still search correctly."""
    import trueno_rag_tpu.ops.bm25 as ops_bm25

    monkeypatch.setattr(ops_bm25, "MAX_BLOCK_ROWS", 4)  # force fallback
    idx = BM25Index(use_native=False)
    for i in range(6):
        # distinct doc lengths → distinct scores (exact ties have no
        # guaranteed order — reference behavior)
        filler = " ".join(f"pad{j}" for j in range(i))
        idx.add(mk_chunk(i, f"alpha beta gamma{i} delta {filler}"))
    res = idx.search("alpha beta", 3)
    assert idx._snap["blocks"] is None and idx._snap["packed"] is not None
    host = idx.search_host("alpha beta", 3)
    assert [r[0] for r in res] == [h[0] for h in host]


def test_custom_stopwords_survive_persistence_roundtrip():
    """Regression (review r3): the stopword set is part of the
    tokenization contract — a reloaded index must strip the SAME terms
    it indexed, or scores silently diverge."""
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.index import BM25Index

    idx = BM25Index(stopwords=frozenset(), use_native=False)  # index 'the'
    idx.add(Chunk(document_id="d", content="the the quick fox", start_offset=0,
                  end_offset=17, metadata=ChunkMetadata(), id=chunk_id_from_int(1)))
    before = idx.search("the", 3)
    assert before, "'the' must be searchable with empty stopwords"

    blob = idx.to_compressed_bytes()
    loaded = BM25Index.from_compressed_bytes(blob, registry=idx.registry)
    assert loaded.search("the", 3) == before
    assert loaded.stopwords == frozenset()


def test_use_native_true_raises_when_unavailable(monkeypatch):
    """Regression (review r3): an explicit use_native=True must not
    silently degrade to the Python ingest path."""
    import trueno_rag_tpu.native as native
    from trueno_rag_tpu.errors import InvalidConfigError
    from trueno_rag_tpu.index import BM25Index

    monkeypatch.setattr(native, "native_available", lambda: False)
    monkeypatch.setattr(native, "native_build_error", lambda: "simulated")
    with pytest.raises(InvalidConfigError):
        BM25Index(use_native=True)
    # auto-detect still degrades gracefully
    idx = BM25Index()
    assert idx._native_builder is None
