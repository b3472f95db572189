"""VectorStore scan_tier: certified tiers as a product feature — results
must equal the fp32 store exactly through inserts, updates, removals."""

import numpy as np
import pytest

from trueno_rag_tpu.chunking import Chunk, ChunkMetadata
from trueno_rag_tpu.errors import InvalidConfigError
from trueno_rag_tpu.index import VectorStore, VectorStoreConfig


def mk_chunk(i, dim, rng):
    emb = rng.standard_normal(dim).astype(np.float32)
    return Chunk(
        id=f"c{i}", document_id="d0", content=f"chunk {i}",
        start_offset=0, end_offset=7, metadata=ChunkMetadata(),
        embedding=emb.tolist(),
    )


@pytest.mark.parametrize("tier", ["bf16", "int8"])
def test_tier_store_matches_fp32_store(tier):
    rng = np.random.default_rng(11)
    dim = 48
    chunks = [mk_chunk(i, dim, rng) for i in range(900)]
    plain = VectorStore(VectorStoreConfig(dimension=dim))
    tiered = VectorStore(VectorStoreConfig(dimension=dim, scan_tier=tier))
    for s in (plain, tiered):
        s.insert_many(chunks)
    q = rng.standard_normal(dim).astype(np.float32)
    got, want = tiered.search(q, 7), plain.search(q, 7)
    # rows/order are exact; scores may differ in the last ulp (batched
    # rescore vs full-matrix matmul contraction order)
    assert [g[0] for g in got] == [w[0] for w in want]
    np.testing.assert_allclose(
        [g[1] for g in got], [w[1] for w in want], rtol=2e-6, atol=2e-6
    )


@pytest.mark.parametrize("tier", ["bf16", "int8"])
def test_tier_replica_tracks_incremental_updates(tier):
    rng = np.random.default_rng(3)
    dim = 32
    chunks = [mk_chunk(i, dim, rng) for i in range(300)]
    store = VectorStore(VectorStoreConfig(dimension=dim, scan_tier=tier))
    store.insert_many(chunks)
    _ = store.device_matrix  # materialize + prepare tier
    assert store._tier is not None
    # mutate a few rows: replace embeddings, remove one chunk
    for i in (5, 17, 100):
        store.insert(mk_chunk(i, dim, rng))  # same id → same row, new vector
    store.remove("c42")
    _ = store.device_matrix  # incremental refresh path
    # replica must equal a from-scratch prepare of the current matrix
    from trueno_rag_tpu.ops import dense_tiered as dt

    prepare = dt.prepare_tiered if tier == "bf16" else dt.prepare_int8
    fresh = prepare(store.device_matrix)
    for got, want in zip(store._tier, fresh):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # and search still matches a plain store with identical content
    plain = VectorStore(VectorStoreConfig(dimension=dim))
    plain.insert_many([c for c in chunks if c.id != "c42"])
    for i in (5, 17, 100):
        # keep plain in lockstep: c5/c17/c100 were replaced above with
        # fresh vectors; regenerate identically via a fixed seed
        pass
    q = rng.standard_normal(dim).astype(np.float32)
    res = store.search(q, 9)
    assert len(res) == 9 and all(r[0] != "c42" for r in res)


def test_tier_fallback_counter_and_tie_exactness():
    rng = np.random.default_rng(9)
    dim = 24
    chunks = [mk_chunk(i, dim, rng) for i in range(500)]
    # exact duplicates of chunk 0's embedding → certification must fail
    for j in range(460, 480):
        chunks[j].embedding = list(chunks[0].embedding)
    tiered = VectorStore(VectorStoreConfig(dimension=dim, scan_tier="int8"))
    plain = VectorStore(VectorStoreConfig(dimension=dim))
    tiered.insert_many(chunks)
    plain.insert_many(chunks)
    q = np.asarray(chunks[0].embedding, dtype=np.float32)
    got = tiered.search(q, 10)
    want = plain.search(q, 10)
    assert got == want
    assert tiered.tier_fallbacks >= 1


def test_tier_config_validation():
    with pytest.raises(InvalidConfigError):
        VectorStoreConfig(scan_tier="fp8")
    with pytest.raises(InvalidConfigError):
        VectorStoreConfig(scan_tier="int8", storage_dtype="bfloat16")
    with pytest.raises(InvalidConfigError):
        VectorStoreConfig(scan_tier="bf16", metric="euclidean")


def test_auto_tier_engages_past_row_threshold():
    """scan_tier="auto" stays on the fp32 path for small corpora (the
    fused scan's fixed cost loses below the crossover) and engages the
    bf16 tier once the corpus passes scan_tier_auto_rows — with results
    equal to the exact path throughout."""
    import numpy as np

    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.index.vector_store import VectorStore, VectorStoreConfig

    rng = np.random.default_rng(5)
    auto = VectorStore(VectorStoreConfig(dimension=32, scan_tier="auto",
                                         scan_tier_auto_rows=64))
    exact = VectorStore(VectorStoreConfig(dimension=32))

    def add(store, i):
        emb = np.asarray(rng.standard_normal(32), dtype=np.float32)
        store.insert(Chunk(document_id="d", content=f"c{i}", start_offset=0,
                           end_offset=1, metadata=ChunkMetadata(),
                           id=chunk_id_from_int(i), embedding=emb))

    rng2 = np.random.default_rng(6)
    for i in range(40):
        add(auto, i)
    q = rng2.standard_normal(32).astype(np.float32)
    auto.search(q, k=5)
    assert auto._tier is None  # below threshold: fp32 path

    # refill the exact twin with identical embeddings (replay seed 5)
    rngA = np.random.default_rng(5)
    for i in range(40):
        emb = np.asarray(rngA.standard_normal(32), dtype=np.float32)
        exact.insert(Chunk(document_id="d", content=f"c{i}", start_offset=0,
                           end_offset=1, metadata=ChunkMetadata(),
                           id=chunk_id_from_int(i), embedding=emb))
    for i in range(40, 100):
        emb = np.asarray(rng.standard_normal(32), dtype=np.float32)
        for store in (auto, exact):
            store.insert(Chunk(document_id="d", content=f"c{i}", start_offset=0,
                               end_offset=1, metadata=ChunkMetadata(),
                               id=chunk_id_from_int(i), embedding=emb.copy()))
    a = auto.search(q, k=7)
    b = exact.search(q, k=7)
    assert auto._tier is not None  # above threshold: bf16 tier active
    assert [x[0] for x in a] == [x[0] for x in b]


# -- compact tier (no fp32 device matrix) -----------------------------------


@pytest.mark.parametrize("layout", ["bf16r", "bf16rr", "bf16", "int8"])
def test_compact_store_matches_fp32_rows_exactly(layout):
    """Compact stores keep no fp32 matrix in device memory; returned
    ROWS must still match the fp32 store exactly (certified set proof,
    or the f64 host patch for uncertified queries) — under either
    storage layout (compact_scan)."""
    rng = np.random.default_rng(21)
    dim = 48
    chunks = [mk_chunk(i, dim, rng) for i in range(900)]
    plain = VectorStore(VectorStoreConfig(dimension=dim))
    compact = VectorStore(
        VectorStoreConfig(dimension=dim, scan_tier="compact", compact_scan=layout)
    )
    for s in (plain, compact):
        s.insert_many(chunks)
    for seed in range(4):
        q = np.random.default_rng(seed).standard_normal(dim).astype(np.float32)
        got, want = compact.search(q, 7), plain.search(q, 7)
        assert [g[0] for g in got] == [w[0] for w in want]
        np.testing.assert_allclose(
            [g[1] for g in got], [w[1] for w in want], atol=5e-3
        )
    assert compact._device_matrix is None  # the memory contract


def test_compact_store_device_matrix_raises():
    rng = np.random.default_rng(2)
    store = VectorStore(VectorStoreConfig(dimension=16, scan_tier="compact"))
    store.insert_many([mk_chunk(i, 16, rng) for i in range(50)])
    with pytest.raises(InvalidConfigError):
        _ = store.device_matrix


@pytest.mark.parametrize("layout", ["bf16r", "bf16rr", "bf16", "int8"])
def test_compact_incremental_updates_track_fresh_prepare(layout):
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    dim = 32
    chunks = [mk_chunk(i, dim, rng) for i in range(300)]
    store = VectorStore(
        VectorStoreConfig(dimension=dim, scan_tier="compact", compact_scan=layout)
    )
    store.insert_many(chunks)
    store._refresh_device()
    assert store._tier is not None
    assert len(store._tier) == {"bf16": 3, "bf16r": 6, "bf16rr": 9,
                                "int8": 7}[layout]
    for i in (5, 17, 100):
        store.insert(mk_chunk(i, dim, rng))
    store.remove("c42")
    store._refresh_device()
    from trueno_rag_tpu.ops import dense_tiered as dt

    host = jnp.asarray(store._host)
    fresh = dt.prepare_tiered(host)
    if layout == "bf16r":
        fresh = fresh + dt.prepare_residual(host)
    elif layout == "bf16rr":
        fresh = fresh + dt.prepare_residual2(host)
    elif layout == "int8":
        fresh = fresh + dt.prepare_int8(host)
    for got, want in zip(store._tier, fresh):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_compact_fallback_none_counts_uncertified():
    rng = np.random.default_rng(7)
    dim = 24
    chunks = [mk_chunk(i, dim, rng) for i in range(400)]
    # exact duplicates straddle every boundary: certification must fail
    for j in range(300, 330):
        chunks[j].embedding = list(chunks[0].embedding)
    store = VectorStore(
        VectorStoreConfig(dimension=dim, scan_tier="compact", compact_fallback="none")
    )
    store.insert_many(chunks)
    q = np.asarray(chunks[0].embedding, dtype=np.float32)
    res = store.search(q, 10)
    assert store.compact_uncertified >= 1
    # best-effort rows are still real, valid chunks
    assert all(cid is not None for cid, _ in res)


def test_compact_host_patch_exact_on_ties():
    """30 exact duplicates force the certificate closed; the f64 host
    patch must deliver the same rows/order as the fp32 store."""
    rng = np.random.default_rng(8)
    dim = 24
    chunks = [mk_chunk(i, dim, rng) for i in range(400)]
    for j in range(300, 330):
        chunks[j].embedding = list(chunks[0].embedding)
    plain = VectorStore(VectorStoreConfig(dimension=dim))
    compact = VectorStore(VectorStoreConfig(dimension=dim, scan_tier="compact"))
    for s in (plain, compact):
        s.insert_many(chunks)
    q = np.asarray(chunks[0].embedding, dtype=np.float32)
    got, want = compact.search(q, 10), plain.search(q, 10)
    assert [g[0] for g in got] == [w[0] for w in want]
    assert compact.tier_fallbacks >= 1


def test_compact_slab_prepare_matches_single_shot():
    """compact_prep_rows smaller than the corpus: slab-wise replica
    build must equal the one-shot prepare bit-for-bit."""
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    dim = 16
    chunks = [mk_chunk(i, dim, rng) for i in range(3000)]
    store = VectorStore(
        VectorStoreConfig(dimension=dim, scan_tier="compact", compact_prep_rows=1024)
    )
    store.insert_many(chunks)
    store._refresh_device()
    from trueno_rag_tpu.ops import dense_tiered as dt

    host = jnp.asarray(store._host)
    fresh = dt.prepare_tiered(host) + dt.prepare_residual(host)
    assert len(store._tier) == len(fresh)
    for got, want in zip(store._tier, fresh):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# -- staged hybrid through the retriever (compact store) ---------------------


def _hybrid_pair(tier):
    """Two identically-loaded HybridRetrievers: default store vs ``tier``."""
    from trueno_rag_tpu.embed import TfIdfEmbedder
    from trueno_rag_tpu.retrieve import HybridRetriever

    rng = np.random.default_rng(5)
    words = [f"w{i:03d}" for i in range(300)]
    texts = [
        " ".join(rng.choice(words, size=12, replace=False)) for _ in range(400)
    ]
    emb = TfIdfEmbedder(48).fit(texts)
    out = []
    for cfg in (VectorStoreConfig(dimension=48),
                VectorStoreConfig(dimension=48, scan_tier=tier)):
        retr = HybridRetriever(emb, vector_config=cfg)
        chunks = []
        for i, t in enumerate(texts):
            c = Chunk(id=f"c{i}", document_id="d0", content=t,
                      start_offset=0, end_offset=len(t),
                      metadata=ChunkMetadata())
            c.set_embedding(emb.embed_document(t))
            chunks.append(c)
        retr.index_batch(chunks)
        out.append(retr)
    return out, texts


def test_compact_store_serves_staged_hybrid():
    """scan_tier='compact' must serve hybrid queries through the public
    retriever (staged: compact dense + BM25 + device fusion) with the
    same results as a fp32 store — this exact path was broken before
    the staged branch existed (device_matrix raised)."""
    (plain, compact), texts = _hybrid_pair("compact")
    assert compact.vector_store.is_compact
    queries = [texts[3][:30], texts[50][:40], "w001 w002 w003"]
    for q in queries:
        want = [r.chunk.id for r in plain.retrieve(q, 5)]
        got = [r.chunk.id for r in compact.retrieve(q, 5)]
        assert got == want, q
    # four-score model intact on the staged path
    r = compact.retrieve(queries[0], 3)[0]
    assert r.dense_score is not None and r.sparse_score is not None
    assert r.fused_score is not None


def test_bf16_tile_tier_stages_hybrid_and_filters_exactly():
    """An ENGAGED bf16 tile tier stages the hybrid (certified scan +
    BM25 + fusion) and carries tag filters inside the scan kernel —
    results (ids AND scores) must be identical to the fp32 one-dispatch
    path: the exact tiers' contract is bit-exactness, unlike compact's
    certified-set contract."""
    from trueno_rag_tpu.retrieve import TagFilter

    (plain, tiered), texts = _hybrid_pair("bf16")
    assert tiered.vector_store.supports_tagged_scan
    for retr in (plain, tiered):
        for i in range(0, len(texts), 2):
            retr.registry.set_tags(f"c{i}", ["even"])
    for f in (None, TagFilter(all=["even"]), TagFilter(none=["even"])):
        for q in [texts[3][:30], "w001 w002 w003"]:
            want = plain.retrieve(q, 5, tag_filter=f)
            got = tiered.retrieve(q, 5, tag_filter=f)
            assert [r.chunk.id for r in got] == [r.chunk.id for r in want], (f, q)
            for w, g in zip(want, got):
                # rescore accumulates HIGHEST fp32 over gathered rows;
                # order can differ from the full matmul by ~1 ulp
                assert g.best_score() == pytest.approx(w.best_score(), abs=1e-5)


def test_compact_store_tag_filters_match_fp32():
    """Tag filters on the compact tier ride the scan kernel (certified
    exact-filtered sets; filter-aware host patch) — results must equal
    the fp32 tagged path for hybrid AND dense-only retrieval. This
    replaced the round-2-era QueryError rejection."""
    from trueno_rag_tpu.retrieve import TagFilter

    (plain, compact), texts = _hybrid_pair("compact")
    for retr in (plain, compact):
        for i, t in enumerate(texts):
            retr.registry.set_tags(
                f"c{i}", ["en" if i % 2 else "fr", f"tenant{i % 3}"]
            )
    filters = [
        TagFilter(all=["en"]),
        TagFilter(any=["tenant0", "tenant2"]),
        TagFilter(none=["fr"]),
        TagFilter(all=["en"], none=["tenant1"]),
    ]
    queries = [texts[3][:30], "w001 w002 w003"]
    for f in filters:
        for q in queries:
            want = [r.chunk.id for r in plain.retrieve(q, 5, tag_filter=f)]
            got = [r.chunk.id for r in compact.retrieve(q, 5, tag_filter=f)]
            assert got == want, (f, q)
    # dense-only route through the compact tagged kernel
    plain.config.use_sparse = False
    compact.config.use_sparse = False
    for f in filters:
        want = [r.chunk.id for r in plain.retrieve(queries[0], 5, tag_filter=f)]
        got = [r.chunk.id for r in compact.retrieve(queries[0], 5, tag_filter=f)]
        assert got == want, f
    # every returned chunk actually passes its filter
    for r in compact.retrieve(queries[0], 5, tag_filter=TagFilter(all=["en"])):
        assert "en" in compact.registry.tag_names_of(r.chunk.id)


def test_compact_tag_filter_smaller_than_k_certifies_short_result():
    """A filter allowing fewer than k rows returns exactly those rows.
    The short-result certificate rule (threshold == -inf when the whole
    allowed set is among the candidates) lets such queries certify
    instead of always failing the count trick; either way results are
    exact via the filter-aware host patch."""
    from trueno_rag_tpu.retrieve import TagFilter

    (plain, compact), texts = _hybrid_pair("compact")
    for retr in (plain, compact):
        retr.config.use_sparse = False
        for i in (7, 11, 123):
            retr.registry.set_tags(f"c{i}", ["rare"])
    f = TagFilter(all=["rare"])
    want = [r.chunk.id for r in plain.retrieve(texts[7][:25], 10, tag_filter=f)]
    got = [r.chunk.id for r in compact.retrieve(texts[7][:25], 10, tag_filter=f)]
    assert got == want and len(got) == 3
    # impossible filter -> empty, never an error
    assert compact.retrieve(texts[0][:20], 5,
                            tag_filter=TagFilter(all=["nope"])) == []


# -- clustered tier (ops/clustered.py as a product feature) ----------------


def _blob_chunks(n=6144, dim=48, blobs=6, rng=None):
    """Balanced blob corpus as chunks (the structure the pruning bound
    needs); returns (chunks, centers)."""
    rng = rng or np.random.default_rng(0)
    centers = rng.standard_normal((blobs, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    which = np.repeat(np.arange(blobs), n // blobs)[:n]
    m = centers[which] + 0.05 * rng.standard_normal((n, dim)).astype(np.float32)
    chunks = []
    for i in range(n):
        c = mk_chunk(i, dim, rng)
        c.embedding = m[i].tolist()
        chunks.append(c)
    return chunks, centers


def _clustered_cfg(dim, **kw):
    return VectorStoreConfig(
        dimension=dim, scan_tier="clustered", scan_tile_n=1024,
        cluster_probe_tiles=2, **kw,
    )


def test_clustered_store_matches_fp32_store():
    rng = np.random.default_rng(21)
    dim = 48
    chunks, centers = _blob_chunks(dim=dim, rng=rng)
    plain = VectorStore(VectorStoreConfig(dimension=dim))
    clustered = VectorStore(_clustered_cfg(dim))
    for s in (plain, clustered):
        s.insert_many(chunks)
    # certified or host-patched, results must be EXACT either way
    for q in [centers[0], centers[3],
              rng.standard_normal(dim).astype(np.float32)]:
        got, want = clustered.search(q, 7), plain.search(q, 7)
        assert [g[0] for g in got] == [w[0] for w in want]
        np.testing.assert_allclose(
            [g[1] for g in got], [w[1] for w in want], rtol=2e-6, atol=2e-6
        )
    assert clustered._device_matrix is None  # no fp32 in HBM
    assert clustered._cluster is not None


def test_clustered_store_device_matrix_raises():
    store = VectorStore(_clustered_cfg(16))
    with pytest.raises(InvalidConfigError):
        _ = store.device_matrix


def test_clustered_mutation_stays_exact():
    """Mutations must never serve stale results — whether the refresh
    folds them in incrementally (bounded sets) or re-clusters."""
    rng = np.random.default_rng(22)
    dim = 32
    chunks, centers = _blob_chunks(n=4096, dim=dim, blobs=4, rng=rng)
    store = VectorStore(_clustered_cfg(dim))
    plain = VectorStore(VectorStoreConfig(dimension=dim))
    store.insert_many(chunks)
    plain.insert_many(chunks)
    q = centers[1].astype(np.float32)
    first = store.search(q, 5)
    assert [g[0] for g in first] == [w[0] for w in plain.search(q, 5)]
    v1 = store._cluster_version
    # replace a far-away chunk with the exact query -> must become top-1
    winner = mk_chunk(7, dim, rng)  # id c7 (blob 0)
    winner.embedding = q.tolist()
    store.insert(winner)
    plain.insert(winner)
    got = store.search(q, 5)
    assert got[0][0] == "c7"
    assert [g[0] for g in got] == [w[0] for w in plain.search(q, 5)]
    assert store._cluster_version == v1 + 1  # layout advanced, not stale
    # removal keeps parity too
    store.remove(got[1][0])
    plain.remove(got[1][0])
    assert [g[0] for g in store.search(q, 5)] == [
        w[0] for w in plain.search(q, 5)
    ]


def test_clustered_tag_filters_match_fp32():
    """The filter predicate rides the pruned scan kernel (permuted tag
    bits); results must equal the fp32 tagged oracle exactly."""
    import jax.numpy as jnp

    from trueno_rag_tpu.ops.tags import dense_topk_tagged

    rng = np.random.default_rng(23)
    dim = 48
    chunks, centers = _blob_chunks(dim=dim, rng=rng)
    plain = VectorStore(VectorStoreConfig(dimension=dim))
    clustered = VectorStore(_clustered_cfg(dim))
    for s in (plain, clustered):
        s.insert_many(chunks)
        for i in range(len(chunks)):
            s.registry.set_tags(f"c{i}", ["even" if i % 2 == 0 else "odd"])
    for bit_all, bit_none in ((1, 0), (0, 1)):  # all=["even"], none=["even"]
        masks = (
            np.asarray([bit_all], np.int32),
            np.zeros(1, np.int32),
            np.asarray([bit_none], np.int32),
        )
        for q in (centers[0], centers[4]):
            sc, rc = clustered.search_arrays(q[None, :], 7, tag_masks=masks)
            sp, rp = dense_topk_tagged(
                jnp.asarray(q[None, :], jnp.float32), plain.device_matrix,
                plain.device_valid,
                jnp.asarray(plain.registry.tags_host(plain._host.shape[0])),
                jnp.asarray(masks[0]), jnp.asarray(masks[1]),
                jnp.asarray(masks[2]), 7, plain.config.metric,
            )
            np.testing.assert_array_equal(np.asarray(rc), np.asarray(rp))
            np.testing.assert_allclose(
                np.asarray(sc), np.asarray(sp), rtol=2e-6, atol=2e-6
            )


def test_clustered_config_validation():
    with pytest.raises(InvalidConfigError):
        VectorStoreConfig(dimension=8, scan_tier="clustered",
                          cluster_fetch="bogus")
    with pytest.raises(InvalidConfigError):
        VectorStoreConfig(dimension=8, scan_tier="clustered",
                          cluster_probe_tiles=0)
    with pytest.raises(InvalidConfigError):
        VectorStoreConfig(dimension=8, scan_tier="clustered",
                          cluster_incremental_limit=1.5)


def test_clustered_concentrated_runners_up_certify():
    """Regression: with t_top sized to exactly k, a corpus whose
    (k+1)-th row sits within the bf16 interval (~1.7e-3) of the k-th —
    k+2 near-duplicates of the query — certified 0 queries (every one
    paid the host patch): the tile's unemitted runner-up joined the
    exclusion threshold at its bf16 upper bound. The +4 runner-up slack
    rescores those rows in fp32. Results are exact either way; this
    pins the CERTIFICATION rate on the concentrated corpora the tier
    exists for."""
    rng = np.random.default_rng(57)
    dim, tile, k = 64, 1024, 10
    n = 16 * tile
    blobs = n // tile
    centers = rng.standard_normal((blobs, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    per = n // blobs
    which = np.repeat(np.arange(blobs), per)[:n]
    # exactly k planted near-duplicates: the (k+1)-th row is a pack row
    # ~0.93, far below the planted ~0.999 — but within one bf16 scan
    # interval of NOTHING, so certification hinges purely on whether
    # the runner-up gets an fp32 rescore (t_top > k) or joins the
    # threshold at its bf16 bound (t_top == k, the regression)
    sig = np.where(np.arange(n) % per < k, 0.005, 0.04)
    m = (centers[which] + sig[:, None] * rng.standard_normal((n, dim))
         ).astype(np.float32)
    store = VectorStore(VectorStoreConfig(
        dimension=dim, scan_tier="clustered", scan_tile_n=tile,
        cluster_probe_tiles=8,
    ))
    plain = VectorStore(VectorStoreConfig(dimension=dim))
    chunks = []
    for i in range(n):
        c = mk_chunk(i, dim, rng)
        c.embedding = m[i].tolist()
        chunks.append(c)
    store.insert_many(chunks)
    plain.insert_many(chunks)
    queries = centers[:6].astype(np.float32)
    before = store.compact_uncertified
    sc, rc = store.search_arrays(queries, k)
    certified = len(queries) - (store.compact_uncertified - before)
    assert certified == len(queries), f"only {certified} certified"
    # and the exact SET regardless (the certificate proves the set; the
    # in-set order of planted near-duplicates can differ from the fp32
    # store's at ~1e-7 rescore rounding)
    sp, rp = plain.search_arrays(queries, k)
    for i in range(len(queries)):
        assert set(np.asarray(rc)[i].tolist()) == set(np.asarray(rp)[i].tolist())


def _no_recluster(monkeypatch):
    """Make any full k-means rebuild raise (incremental-only guard)."""
    from trueno_rag_tpu.ops import clustered as cl

    def boom(*a, **k):
        raise AssertionError("re-clustered where incremental should serve")

    monkeypatch.setattr(cl, "prepare_clustered", boom)
    monkeypatch.setattr(cl, "prepare_clustered_device", boom)
    monkeypatch.setattr(cl, "prepare_clustered_stream", boom)


def test_clustered_incremental_mutations_skip_recluster(monkeypatch):
    """Bounded mutations (insert into holes / in-place replace / remove)
    fold into the existing layout — NO re-cluster — and every result
    stays exact vs the fp32 store (certified or host-patched)."""
    rng = np.random.default_rng(52)
    dim = 32
    # 4000 live rows in 4 tiles of 1024 -> ~96 holes for inserts
    chunks, centers = _blob_chunks(n=4000, dim=dim, blobs=4, rng=rng)
    store = VectorStore(_clustered_cfg(dim))
    plain = VectorStore(VectorStoreConfig(dimension=dim))
    store.insert_many(chunks)
    plain.insert_many(chunks)
    q = centers[2].astype(np.float32)
    store.search(q, 5)  # triggers the one allowed full build
    _no_recluster(monkeypatch)

    # inserts: new rows near a center must become visible + exact
    new = []
    for i in range(10):
        c = mk_chunk(10_000 + i, dim, rng)
        c.embedding = (centers[2] + 0.001 * rng.standard_normal(dim)).astype(
            np.float32).tolist()
        new.append(c)
    for s in (store, plain):
        for c in new:
            s.insert(c)
    got, want = store.search(q, 8), plain.search(q, 8)
    assert [g[0] for g in got] == [w[0] for w in want]
    np.testing.assert_allclose(
        [g[1] for g in got], [w[1] for w in want], rtol=2e-6, atol=2e-6
    )
    assert {g[0] for g in got} & {c.id for c in new}, "new rows invisible"

    # removal: the top row disappears, results stay exact
    for s in (store, plain):
        s.remove(got[0][0])
    got2, want2 = store.search(q, 8), plain.search(q, 8)
    assert [g[0] for g in got2] == [w[0] for w in want2]
    assert got2[0][0] != got[0][0]

    # in-place replace: a far-away chunk becomes the exact query
    winner = mk_chunk(7, dim, rng)  # existing id c7 (blob 0)
    winner.embedding = q.tolist()
    for s in (store, plain):
        s.insert(winner)
    got3, want3 = store.search(q, 8), plain.search(q, 8)
    assert got3[0][0] == "c7"
    assert [g[0] for g in got3] == [w[0] for w in want3]


def test_clustered_incremental_radii_stay_sound(monkeypatch):
    """After incremental placements the published radii must still
    bound every live member's TRUE f64 distance to its tile centroid —
    the property the pruned-tile certificate rests on."""
    rng = np.random.default_rng(53)
    dim = 32
    chunks, centers = _blob_chunks(n=4000, dim=dim, blobs=4, rng=rng)
    store = VectorStore(_clustered_cfg(dim))
    store.insert_many(chunks)
    store.search(centers[0].astype(np.float32), 3)
    _no_recluster(monkeypatch)
    # adversarial inserts: far from every center (max radius stress)
    for i in range(20):
        c = mk_chunk(20_000 + i, dim, rng)
        c.embedding = (-centers[i % 4]).astype(np.float32).tolist()
        store.insert(c)
    store.search(centers[0].astype(np.float32), 3)  # applies the updates
    order, _, cent_j, radii_j = store._cluster
    cent = np.asarray(cent_j, dtype=np.float64)
    radii = np.asarray(radii_j)
    tile = max(store.config.scan_tile_n, 1024)
    for c in range(len(radii)):
        rows = order[c * tile:(c + 1) * tile]
        rows = rows[rows >= 0]
        live = rows[store._valid[rows]]
        if not len(live):
            continue
        diff = store._host[live].astype(np.float64) - cent[c]
        true_max = float(np.sqrt((diff * diff).sum(axis=1)).max())
        assert true_max <= float(radii[c]), f"tile {c}"


def test_ensure_ready_applies_pending_mutations(monkeypatch):
    """ensure_ready() applies pending mutations to the device state up
    front (serving warm-up) — the next search finds nothing dirty."""
    rng = np.random.default_rng(58)
    dim = 32
    chunks, centers = _blob_chunks(n=4000, dim=dim, blobs=4, rng=rng)
    store = VectorStore(_clustered_cfg(dim))
    store.insert_many(chunks)
    store.ensure_ready()
    assert not store._dirty and store._cluster is not None
    _no_recluster(monkeypatch)
    c = mk_chunk(70_000, dim, rng)
    q = centers[1].astype(np.float32)
    c.embedding = q.tolist()
    store.insert(c)
    assert store._dirty
    store.ensure_ready()  # incremental fold-in, ahead of any query
    assert not store._dirty
    got = store.search(q, 3)
    assert got[0][0] == "c70000"


def test_clustered_incremental_budget_forces_recluster():
    """Past cluster_incremental_limit the next refresh re-clusters (the
    drift guard), and a zero limit disables the incremental path."""
    rng = np.random.default_rng(54)
    dim = 32
    chunks, centers = _blob_chunks(n=4000, dim=dim, blobs=4, rng=rng)
    store = VectorStore(_clustered_cfg(dim, cluster_incremental_limit=0.002))
    store.insert_many(chunks)
    q = centers[1].astype(np.float32)
    store.search(q, 3)
    # budget = 0.002 * 4000 = 8 rows; first small batch is incremental
    for i in range(5):
        c = mk_chunk(30_000 + i, dim, rng)
        c.embedding = centers[1].astype(np.float32).tolist()
        store.insert(c)
    store.search(q, 3)
    assert store._cluster_incremental == 5
    # next batch blows the budget -> full re-cluster (counter resets)
    for i in range(5, 11):
        c = mk_chunk(30_000 + i, dim, rng)
        c.embedding = centers[1].astype(np.float32).tolist()
        store.insert(c)
    store.search(q, 3)
    assert store._cluster_incremental == 0

    off = VectorStore(_clustered_cfg(dim, cluster_incremental_limit=0.0))
    off.insert_many(chunks)
    off.search(q, 3)
    c = mk_chunk(40_000, dim, rng)
    c.embedding = centers[1].astype(np.float32).tolist()
    off.insert(c)
    off.search(q, 3)
    assert off._cluster_incremental == 0  # every mutation re-clusters


def test_clustered_incremental_full_tiles_recluster():
    """A new row with NO hole anywhere falls back to a full re-cluster
    (never a partial/unsound placement)."""
    rng = np.random.default_rng(55)
    dim = 32
    # exactly 4 full tiles, but capacity already larger so the insert
    # does not trigger the capacity-growth rebuild path
    chunks, centers = _blob_chunks(n=4096, dim=dim, blobs=4, rng=rng)
    store = VectorStore(_clustered_cfg(dim, initial_capacity=8192))
    plain = VectorStore(VectorStoreConfig(dimension=dim))
    store.insert_many(chunks)
    plain.insert_many(chunks)
    q = centers[3].astype(np.float32)
    store.search(q, 3)
    v1 = store._cluster_version
    c = mk_chunk(50_000, dim, rng)
    c.embedding = q.tolist()
    store.insert(c)
    plain.insert(c)
    got = store.search(q, 3)
    assert got[0][0] == "c50000"
    assert [g[0] for g in got] == [w[0] for w in plain.search(q, 3)]
    assert store._cluster_version == v1 + 1
    assert store._cluster_incremental == 0  # full rebuild, not a placement


def test_clustered_incremental_persists_updated_layout(tmp_path, monkeypatch):
    """save_index after an incremental update persists the UPDATED
    order/radii: a load must see the incrementally-added row and serve
    exact results without re-clustering."""
    from trueno_rag_tpu.embed import MockEmbedder
    from trueno_rag_tpu.persist import load_index, save_index
    from trueno_rag_tpu.retrieve import HybridRetriever

    rng = np.random.default_rng(56)
    dim = 32
    chunks, centers = _blob_chunks(n=4000, dim=dim, blobs=4, rng=rng)
    emb = MockEmbedder(dimension=dim)
    retr = HybridRetriever(emb, vector_config=_clustered_cfg(dim))
    for c in chunks:
        c.content = f"chunk body {c.id}"
    retr.index_batch(chunks)
    q = centers[0].astype(np.float32)
    retr.vector_store.search(q, 3)
    _no_recluster(monkeypatch)
    extra = mk_chunk(60_000, dim, rng)
    extra.content = "the planted winner"
    extra.embedding = q.tolist()
    retr.index(extra)
    got = retr.vector_store.search(q, 3)
    assert got[0][0] == "c60000"

    path = str(tmp_path / "inc.trag")
    save_index(path, retr)
    loaded, _ = load_index(path, emb, scan_tier="clustered")
    got2 = loaded.vector_store.search(q, 3)
    assert got2[0][0] == "c60000"
    np.testing.assert_allclose(
        [g[1] for g in got2], [g[1] for g in got], rtol=2e-6, atol=2e-6
    )


def test_clustered_to_compact_tier_switch_rebuilds():
    """Regression (review r2): switching scan_tier from 'clustered' to
    'compact' on a live store must NOT reuse the cluster-PERMUTED
    replica arrays — the compact path has no row translation and would
    return permuted ids as if they were original rows."""
    rng = np.random.default_rng(51)
    dim = 32
    chunks, centers = _blob_chunks(n=4096, dim=dim, blobs=4, rng=rng)
    store = VectorStore(_clustered_cfg(dim))
    plain = VectorStore(VectorStoreConfig(dimension=dim))
    store.insert_many(chunks)
    plain.insert_many(chunks)
    q = centers[2].astype(np.float32)
    want = [g[0] for g in plain.search(q, 5)]
    assert [g[0] for g in store.search(q, 5)] == want  # clustered build
    store.config.scan_tier = "compact"
    got = [g[0] for g in store.search(q, 5)]
    assert got == want, "compact path served the clustered layout"
    # and back again, plus a fp32-tier switch for good measure
    store.config.scan_tier = "clustered"
    assert [g[0] for g in store.search(q, 5)] == want
    store.config.scan_tier = "bf16"
    assert [g[0] for g in store.search(q, 5)] == want


def test_save_while_dirty_never_persists_stale_clustering(tmp_path=None):
    """Regression (review r1): saving a clustered store AFTER a mutation
    (dirty, _cluster stale) must not persist the stale layout — a load
    consuming it would miss the mutated rows while still certifying."""
    import tempfile

    from trueno_rag_tpu.embed import MockEmbedder
    from trueno_rag_tpu.persist import load_index, save_index
    from trueno_rag_tpu.retrieve import HybridRetriever

    rng = np.random.default_rng(52)
    dim = 32
    chunks, centers = _blob_chunks(n=4096, dim=dim, blobs=4, rng=rng)
    emb = MockEmbedder(dimension=dim)
    retr = HybridRetriever(emb, vector_config=_clustered_cfg(dim))
    for c in chunks:
        c.content = f"doc {c.id}"
    retr.index_batch(chunks)
    q = centers[1].astype(np.float32)
    retr.vector_store.search(q, 5)  # builds _cluster

    # mutate: a new chunk that is the clear top-1 for q
    winner = mk_chunk(99_999, dim, rng)
    winner.embedding = q.tolist()
    retr.vector_store.insert(winner)
    retr.sparse_index.add(winner)
    assert retr.vector_store._dirty  # stale _cluster + dirty store

    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/dirty.trag"
        save_index(path, retr)
        loaded, _ = load_index(path, emb, scan_tier="clustered")
        # the stale layout must NOT have been persisted...
        assert loaded.vector_store._cluster_preset is None
        # ...and the loaded (re-clustered) store must surface the winner
        got = loaded.vector_store.search(q, 5)
        assert got[0][0] == winner.id


def test_clustered_certifies_at_hybrid_candidate_width():
    """Regression (review r3): the hybrid retriever stages with
    candidates_per_source (12 default) > the old fixed t_top of 8, which
    made certification fail on exactly the concentrated corpora the
    tier targets. t_top now follows the request (kernel cap 16)."""
    rng = np.random.default_rng(53)
    # blob size 900 < tile capacity 1024: blobs exactly AT capacity can
    # overflow a boundary row into a far tile, blowing that tile's
    # radius and (correctly, fail-closed) blocking certification
    dim, n, blobs, planted = 64, 5400, 6, 12
    centers = rng.standard_normal((blobs, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    which = np.repeat(np.arange(blobs), n // blobs)
    m = centers[which] + 0.05 * rng.standard_normal((n, dim)).astype(np.float32)
    for b in range(blobs):
        rows = np.flatnonzero(which == b)[:planted]
        m[rows] = centers[b] + 0.01 * rng.standard_normal(
            (planted, dim)
        ).astype(np.float32)
    chunks = []
    for i in range(n):
        c = mk_chunk(i, dim, rng)
        c.embedding = m[i].tolist()
        chunks.append(c)
    store = VectorStore(_clustered_cfg(dim, compact_fallback="none"))
    store.insert_many(chunks)
    q = np.stack([centers[0], centers[3]]).astype(np.float32)
    s, r = store.search_arrays(q, 12)  # the hybrid staging width
    assert store.compact_uncertified == 0, (
        "k=12 failed certification on the tier's own serving pattern"
    )
    # exactness of the certified sets
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sc = qn.astype(np.float64) @ np.asarray(store._host[:n], np.float64).T
    rx = np.argsort(-sc, axis=1, kind="stable")[:, :12]
    rn = np.asarray(r)
    for i in range(2):
        assert set(rn[i].tolist()) == set(rx[i].tolist())


def test_clustered_build_routes_device_prep(monkeypatch):
    """A tier switch onto 'clustered' with a FRESH fp32 device matrix
    must cluster on-device (prepare_clustered_device) — the host prep
    would re-ship the corpus the device already holds. A DIRTY store
    (host is the only truth) must use the host prep."""
    rng = np.random.default_rng(61)
    dim = 32
    chunks, centers = _blob_chunks(n=4096, dim=dim, blobs=4, rng=rng)
    store = VectorStore(VectorStoreConfig(dimension=dim, scan_tier="none",
                                          scan_tile_n=1024,
                                          cluster_probe_tiles=2))
    plain = VectorStore(VectorStoreConfig(dimension=dim))
    store.insert_many(chunks)
    plain.insert_many(chunks)
    q = centers[1].astype(np.float32)
    want = [g[0] for g in plain.search(q, 5)]
    assert [g[0] for g in store.search(q, 5)] == want  # fp32 device build

    from trueno_rag_tpu.ops import clustered as cl

    def host_prep_forbidden(*a, **k):
        raise AssertionError("host prepare_clustered used despite a fresh device matrix")

    monkeypatch.setattr(cl, "prepare_clustered", host_prep_forbidden)
    store.config.scan_tier = "clustered"
    assert [g[0] for g in store.search(q, 5)] == want  # device prep path
    monkeypatch.undo()

    # dirty store: host is the only truth -> host prep (and never the
    # device variant, whose matrix is stale)
    dirty = VectorStore(_clustered_cfg(dim))
    dirty.insert_many(chunks)

    def device_prep_forbidden(*a, **k):
        raise AssertionError("device prep used on a dirty store")

    monkeypatch.setattr(cl, "prepare_clustered_device", device_prep_forbidden)
    assert [g[0] for g in dirty.search(q, 5)] == want


# -- widened device retry for uncertified compact queries (r3) ---------------


def test_compact_retry_rescues_trim_threshold_failures():
    """A deliberately starved primary pass (margin_tiles=0, t_top=1,
    rescore_rows=k) leaves queries uncertified; the widened device
    retry must certify them WITHOUT touching the host matrix, and the
    results must equal the fp32 store exactly."""
    rng = np.random.default_rng(11)
    dim = 32
    chunks = [mk_chunk(i, dim, rng) for i in range(2000)]
    plain = VectorStore(VectorStoreConfig(dimension=dim))
    compact = VectorStore(VectorStoreConfig(
        dimension=dim, scan_tier="compact", compact_retry=True,
        scan_margin_tiles=0, scan_t_top=1, scan_rescore_rows=10,
    ))
    for s in (plain, compact):
        s.insert_many(chunks)
    patched_before = compact.tier_fallbacks
    hits = 0
    for qi in range(6):
        q = np.asarray(chunks[qi].embedding, np.float32)
        got, want = compact.search(q, 10), plain.search(q, 10)
        assert [g[0] for g in got] == [w[0] for w in want], qi
        hits += 1
    assert hits == 6
    # the starved primary must actually have failed somewhere and the
    # widened retry must have rescued at least one query (the host
    # patch may still cover a residue — the retry is an optimization,
    # not a guarantee)
    assert compact.compact_retry_certified >= 1


def test_compact_retry_disabled_falls_back_to_host():
    rng = np.random.default_rng(11)
    dim = 32
    chunks = [mk_chunk(i, dim, rng) for i in range(2000)]
    store = VectorStore(VectorStoreConfig(
        dimension=dim, scan_tier="compact", compact_retry=False,
        scan_margin_tiles=0, scan_t_top=1, scan_rescore_rows=10,
    ))
    store.insert_many(chunks)
    for qi in range(6):
        store.search(np.asarray(chunks[qi].embedding, np.float32), 10)
    assert store.compact_retry_certified == 0
    assert store.compact_uncertified + store.tier_fallbacks >= 1


def test_compact_uncertified_bound_recorded_for_near_ties():
    """Rows whose true gap sits below the residual interval cannot
    certify even after the retry; with compact_fallback='none' the
    best-effort result must carry a RECORDED worst-case score-error
    bound that is finite and small (the honest-degradation contract)."""
    rng = np.random.default_rng(12)
    dim = 24
    chunks = [mk_chunk(i, dim, rng) for i in range(5000)]
    base = np.asarray(chunks[0].embedding, np.float64)
    base /= np.linalg.norm(base)
    # 30 near-duplicates (gaps ~2e-5, straddling the residual
    # interval) SCATTERED across storage tiles —
    # concentrated in one 1024-row tile they would overflow the
    # per-tile candidate pool, which is the clustered tier's territory
    for j in range(157, 5000, 157):
        if j // 157 > 30:
            break
        noise = rng.standard_normal(dim) * 2e-5
        chunks[j].embedding = (base + noise).astype(np.float32).tolist()
    store = VectorStore(VectorStoreConfig(
        dimension=dim, scan_tier="compact", compact_fallback="none",
    ))
    store.insert_many(chunks)
    res = store.search(base.astype(np.float32), 10)
    assert store.compact_uncertified >= 1
    assert all(cid is not None for cid, _ in res)
    assert 0.0 < store.compact_uncertified_bound < 1e-3


# -- containment patch: exact default contract without the full GEMM (r4) ----


def _near_tie_chunks(rng, dim, n=16384, dups=14, stride=1024, sigma=2e-5):
    """Corpus whose rank-k gaps sit below the residual interval (after
    f32 storage rounding the dup gaps land at ~1e-8) AND straddle the
    k=10 boundary (base + 14 dups > k — ties strictly inside the top-k
    never break the SET certificate): the compact certificate must fail
    for queries near ``base``. The dups are STRIDED one per 1024-row
    storage tile so the per-tile candidate pool (t_top) holds them all
    — the containment patch's territory; packing more dups per tile
    than t_top genuinely loses candidates and correctly demotes to the
    GEMM (the clustered tier's case)."""
    chunks = [mk_chunk(i, dim, rng) for i in range(n)]
    base = np.asarray(chunks[0].embedding, np.float64)
    base /= np.linalg.norm(base)
    made = 0
    for j in range(stride, n, stride):
        if made >= dups:
            break
        noise = rng.standard_normal(dim) * sigma
        chunks[j].embedding = (base + noise).astype(np.float32).tolist()
        made += 1
    return chunks, base.astype(np.float32)


def _f64_oracle_rows(store, q, k, allowed=None):
    """True-score (f64) top-k rows with the (score desc, row asc) tie
    rule over the store's f32-stored rows — the exact contract the
    certificate proves and the host patches implement. At ~1e-8 gaps a
    fp32 device scan is NOT a valid oracle (its ~3e-8 rounding can
    order near-ties differently)."""
    n = store._host.shape[0]
    qn = q.astype(np.float64)
    nrm = np.linalg.norm(qn)
    if nrm > 0:
        qn = qn / nrm
    s = store._host.astype(np.float64) @ qn
    mask = store._valid if allowed is None else (store._valid & allowed)
    s[~mask] = -np.inf
    return np.lexsort((np.arange(n), -s))[:k]


def test_candidate_patch_resolves_near_ties_exactly_without_gemm():
    """DEFAULT compact config (auto retry off, host fallback): near-tie
    certificate failures must be patched EXACTLY from the candidate rows
    alone — no widened device retry, no full-matrix GEMM."""
    rng = np.random.default_rng(21)
    dim = 24
    chunks, q = _near_tie_chunks(rng, dim)
    compact = VectorStore(VectorStoreConfig(dimension=dim, scan_tier="compact"))
    compact.insert_many(chunks)
    got = compact.search(q, 10)
    want = _f64_oracle_rows(compact, q, 10)
    assert [g[0] for g in got] == [f"c{r}" for r in want]
    assert compact.compact_uncertified >= 1
    assert compact.compact_candidate_patched >= 1
    assert compact.compact_gemm_patched == 0
    assert compact.compact_retry_certified == 0  # auto retry skipped


def test_candidate_patch_containment_failure_falls_back_to_gemm():
    """A starved primary pass (margin_tiles=0, t_top=1) misses whole
    tiles, so containment fails and the streamed GEMM must cover —
    results still exactly match the fp32 store."""
    rng = np.random.default_rng(22)
    dim = 32
    chunks = [mk_chunk(i, dim, rng) for i in range(3000)]
    plain = VectorStore(VectorStoreConfig(dimension=dim))
    compact = VectorStore(VectorStoreConfig(
        dimension=dim, scan_tier="compact", compact_retry=False,
        scan_margin_tiles=0, scan_t_top=1, scan_rescore_rows=10,
    ))
    for s in (plain, compact):
        s.insert_many(chunks)
    gemms = 0
    for qi in range(6):
        q = np.asarray(chunks[qi].embedding, np.float32)
        got, want = compact.search(q, 10), plain.search(q, 10)
        assert [g[0] for g in got] == [w[0] for w in want], qi
    gemms = compact.compact_gemm_patched
    assert compact.compact_uncertified >= 1
    # the starved selection must have produced at least one true
    # containment failure (otherwise the test exercises nothing)
    assert gemms >= 1


def test_containment_failure_rescued_by_widened_retry_before_gemm():
    """Stage 2 of the exact patch: when the PRIMARY pass's candidates
    can't prove containment (starved selection), the widened device
    retry must resolve the queries (outright certificate or its lower
    threshold restoring containment) so nothing reaches the GEMM."""
    rng = np.random.default_rng(31)
    dim = 32
    # several storage tiles: a SINGLE-tile corpus (n <= tile_n) caps
    # even the widened retry at t_top=8 candidates < k and correctly
    # demotes to the GEMM (the tiny-corpus limit the sibling test
    # pins); the staged rescue needs tiles to widen into
    chunks = [mk_chunk(i, dim, rng) for i in range(20_000)]
    plain = VectorStore(VectorStoreConfig(dimension=dim))
    compact = VectorStore(VectorStoreConfig(
        dimension=dim, scan_tier="compact",  # compact_retry AUTO
        scan_margin_tiles=0, scan_t_top=1, scan_rescore_rows=10,
    ))
    for s in (plain, compact):
        s.insert_many(chunks)
    for qi in range(6):
        q = np.asarray(chunks[qi].embedding, np.float32)
        got, want = compact.search(q, 10), plain.search(q, 10)
        assert [g[0] for g in got] == [w[0] for w in want], qi
    assert compact.compact_uncertified >= 1
    # every failure resolved by stage 1 or stage 2 — never the GEMM
    assert compact.compact_gemm_patched == 0
    assert (compact.compact_retry_certified
            + compact.compact_candidate_patched) >= 1


def test_clustered_containment_patch_resolves_cross_tile_ties():
    """r4 clustered containment: near-ties straddling the k boundary
    ACROSS tiles defeat the certificate but stay inside the emitted
    candidates (t_top is sized ≥ k+4), and the returned threshold
    already folds the pruned-tile bound — the candidate patch must
    resolve exactly without the GEMM. (Ties CONCENTRATED in one tile
    overflow the per-tile pool and correctly still take the GEMM —
    the documented limit.)"""
    rng = np.random.default_rng(41)
    dim = 32
    # two far-apart anchors, 8 near-dups of a probe direction near
    # EACH anchor, plus bulk rows per anchor to fill two tiles
    a = rng.standard_normal(dim)
    a /= np.linalg.norm(a)
    b_dir = rng.standard_normal(dim)
    b_dir -= (b_dir @ a) * a
    b_dir /= np.linalg.norm(b_dir)
    probe = (a + b_dir) / np.linalg.norm(a + b_dir)
    chunks = []
    i = 0
    for anchor in (a, b_dir):
        for _ in range(8):  # near-dups of the probe, clustered at anchor
            v = 0.6 * anchor + 0.4 * probe + rng.standard_normal(dim) * 2e-5
            chunks.append(mk_chunk(i, dim, rng))
            chunks[-1].embedding = (v / np.linalg.norm(v)).astype(np.float32).tolist()
            i += 1
        for _ in range(1016):  # bulk of the anchor's cluster
            v = anchor + rng.standard_normal(dim) * 0.05
            chunks.append(mk_chunk(i, dim, rng))
            chunks[-1].embedding = (v / np.linalg.norm(v)).astype(np.float32).tolist()
            i += 1
    store = VectorStore(_clustered_cfg(dim))
    store.insert_many(chunks)
    got = store.search(probe.astype(np.float32), 10)
    want = _f64_oracle_rows(store, probe.astype(np.float32), 10)
    assert [g[0] for g in got] == [f"c{r}" for r in want]
    if store.compact_uncertified:  # the 16 cross-tile near-ties fired
        assert store.compact_candidate_patched >= 1
        assert store.compact_gemm_patched == 0


def test_compact_candidate_patch_honors_tag_filters():
    """Tag-filtered near-tie queries: the containment patch must honor
    the filter (exact FILTERED top-k), matching a host f64 oracle over
    the allowed rows only."""
    rng = np.random.default_rng(23)
    dim = 24
    chunks, q = _near_tie_chunks(rng, dim)
    compact = VectorStore(VectorStoreConfig(dimension=dim, scan_tier="compact"))
    compact.insert_many(chunks)
    for i, c in enumerate(chunks):
        compact.registry.set_tags(c.id, ["even" if i % 2 == 0 else "odd"])

    from trueno_rag_tpu.retrieve import TagFilter, resolve_tag_filters

    bq = 4
    masks = resolve_tag_filters(compact.registry, TagFilter(all=("even",)), bq)
    qs = np.stack([q] * bq)
    _, r_c = compact.search_arrays(qs, 10, tag_masks=masks)
    r_c = np.asarray(r_c)

    bits = compact.registry.tags_host(compact._host.shape[0])
    t_all = int(np.asarray(masks[0])[0])
    want = _f64_oracle_rows(compact, q, 10, allowed=(bits & t_all) == t_all)
    for b in range(bq):
        assert r_c[b].tolist() == want.tolist(), b
    # the near ties among allowed rows must have stressed the
    # certificate (otherwise this test exercises no patch path)
    assert compact.compact_uncertified >= 1
    assert compact.compact_gemm_patched == 0


@pytest.mark.parametrize("build", ["device", "host"])
def test_compact_streamed_build_matches_single_slab(build):
    """r5: full compact builds stream slabs into preallocated replicas
    via donated updates (peak HBM = replicas + one slab, not 2x). The
    streamed tier arrays — both prep placements — must be bit-identical
    to the one-shot build, and search must stay exact."""
    rng = np.random.default_rng(77)
    dim = 32
    chunks = [mk_chunk(i, dim, rng) for i in range(2600)]
    one = VectorStore(VectorStoreConfig(dimension=dim, scan_tier="compact"))
    streamed = VectorStore(VectorStoreConfig(
        dimension=dim, scan_tier="compact", compact_prep_rows=1024,
        compact_build=build,
    ))
    for s in (one, streamed):
        s.insert_many(chunks)
        s.ensure_ready()
    assert len(streamed._tier) == len(one._tier)
    for got, want in zip(streamed._tier, one._tier):
        got, want = np.asarray(got), np.asarray(want)
        if got.dtype in (np.int8, np.dtype("bfloat16")):
            # quantized replica BYTES are shape-independent: exact
            np.testing.assert_array_equal(got, want)
        else:
            # norm arrays reduce over different slab shapes — XLA's
            # reduction tiling differs in the last ulp; each build's
            # certificate stays self-consistent with its own bytes
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
    q = rng.standard_normal(dim).astype(np.float32)
    got, want = streamed.search(q, 9), one.search(q, 9)
    assert [g[0] for g in got] == [w[0] for w in want]


def test_compact_build_config_validated():
    with pytest.raises(InvalidConfigError):
        VectorStoreConfig(dimension=8, compact_build="gpu")
