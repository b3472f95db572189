"""Tri-hybrid retrieval: dense + BM25 + learned-sparse fused N-way.

The learned source has no reference counterpart (the reference's only
sparse path is BM25, index.rs:30-280); semantics are pinned against the
framework's own host oracles: per-source host candidate lists composed
with FusionStrategy.fuse_many must reproduce the device tri-fusion
ranking exactly.
"""

import numpy as np
import pytest

import trueno_rag_tpu as rag
from trueno_rag_tpu.chunking import Chunk
from trueno_rag_tpu.embed import cosine_similarity
from trueno_rag_tpu.errors import QueryError
from trueno_rag_tpu.fusion import FusionStrategy
from trueno_rag_tpu.models.splade import SpladeEncoder
from trueno_rag_tpu.retrieve import HybridRetriever, HybridRetrieverConfig, TagFilter


def _corpus(emb, n=10):
    texts = [
        "TPU pods scale with ICI collectives and sharded meshes",
        "BM25 ranks documents by term frequency and inverse document frequency",
        "SPLADE expands queries into weighted vocabulary terms",
        "dense retrieval embeds chunks into a vector space",
        "rank fusion merges candidate lists from many sources",
        "pallas kernels stream blocks through VMEM scratch",
        "context assembly budgets tokens and tracks citations",
        "the chunker splits documents recursively on separators",
        "cross encoders rescore candidate pairs jointly",
        "learned sparse retrieval bridges lexical and semantic search",
    ][:n]
    chunks = [
        Chunk(document_id="d", content=t, start_offset=0, end_offset=len(t))
        for t in texts
    ]
    emb.embed_chunks(chunks)
    return chunks


def _tri_retriever(cand=8, seed=0, config=None):
    emb = rag.MockEmbedder(dimension=48)
    cfg = config or HybridRetrieverConfig(candidates_per_source=cand)
    retr = HybridRetriever(emb, config=cfg)
    chunks = _corpus(emb)
    retr.index_batch(chunks)
    retr.attach_learned_sparse(SpladeEncoder(seed=seed, max_len=32))
    return retr, chunks


def _host_tri_lists(retr, chunks, query, cand):
    """Per-source host candidate lists over shared rows, each with the
    (score desc, row asc) ordering the device ops emit."""
    row_of = {c.id: retr.registry.row_of(c.id) for c in chunks}
    qv = np.asarray(retr.embedder.embed_query(query), np.float32)
    dense = sorted(
        ((row_of[c.id], float(cosine_similarity(qv, np.asarray(c.embedding))))
         for c in chunks),
        key=lambda kv: (-kv[1], kv[0]),
    )[:cand]
    sparse = [
        (row_of[cid], s)
        for cid, s in retr.sparse_index.search_host(query, cand)
    ]
    q_terms, q_w = retr.learned_encoder.expand_queries([query])
    learned = retr.learned_index.search_host(q_terms[0], q_w[0], cand)
    return dense, sparse, learned


@pytest.mark.parametrize("strat", [
    FusionStrategy.rrf(60.0),
    FusionStrategy.linear(0.5),
    FusionStrategy.dbsf(),
    FusionStrategy.union(),
    FusionStrategy.intersection(),
], ids=lambda s: s.kind)
def test_tri_hybrid_matches_host_oracle(strat):
    cand = 8
    retr, chunks = _tri_retriever(cand=cand)
    retr.config.fusion = strat
    for query in ["weighted vocabulary terms", "dense vector retrieval",
                  "term frequency ranking"]:
        dense, sparse, learned = _host_tri_lists(retr, chunks, query, cand)
        expected_rows = [r for r, _ in strat.fuse_many([dense, sparse, learned])]
        got = retr.retrieve(query, 10)
        got_rows = [retr.registry.row_of(r.chunk.id) for r in got]
        assert got_rows == expected_rows[:len(got_rows)], (strat.kind, query)


def test_tri_hybrid_scores_populated_and_priority():
    retr, chunks = _tri_retriever()
    res = retr.retrieve("vocabulary term expansion", 5)
    assert res, "expected hits"
    top = res[0]
    assert top.fused_score is not None
    assert top.learned_score is not None or top.dense_score is not None
    # learned_score ranks last in best_score priority
    r = rag.RetrievalResult(chunk=chunks[0], learned_score=2.0)
    assert r.best_score() == 2.0
    r.sparse_score = 1.0
    assert r.best_score() == 1.0


def test_learned_only_retrieval():
    cfg = HybridRetrieverConfig(use_dense=False, use_sparse=False)
    retr, chunks = _tri_retriever(config=cfg)
    res = retr.retrieve("weighted vocabulary terms", 3)
    assert res
    assert all(r.fused_score is None for r in res)
    assert all(r.learned_score is not None for r in res)
    # oracle parity for the learned-only ranking
    q_terms, q_w = retr.learned_encoder.expand_queries(
        ["weighted vocabulary terms"])
    expected = [r for r, _ in retr.learned_index.search_host(
        q_terms[0], q_w[0], retr.config.candidates_per_source)]
    got_rows = [retr.registry.row_of(r.chunk.id) for r in res]
    assert got_rows == expected[:len(got_rows)]


def test_dense_plus_learned_without_bm25():
    cfg = HybridRetrieverConfig(use_sparse=False, candidates_per_source=8)
    retr, chunks = _tri_retriever(config=cfg)
    res = retr.retrieve("dense vector retrieval", 5)
    assert res
    assert res[0].fused_score is not None  # two sources -> real fusion
    assert all(r.sparse_score is None for r in res)
    dense, _, learned = _host_tri_lists(
        retr, chunks, "dense vector retrieval", 8)
    expected = [r for r, _ in retr.config.fusion.fuse_many([dense, learned])]
    got_rows = [retr.registry.row_of(r.chunk.id) for r in res]
    assert got_rows == expected[:len(got_rows)]


def test_fused_true_with_learned_raises():
    cfg = HybridRetrieverConfig(fused=True)
    retr, _ = _tri_retriever(config=cfg)
    with pytest.raises(QueryError):
        retr.retrieve("anything", 3)
    # disabling the learned source restores the fused contract
    retr.config.use_learned = False
    with pytest.raises(QueryError):  # mock embedder is not a JAX encoder
        retr.retrieve("anything", 3)


def test_all_sources_disabled_raises():
    cfg = HybridRetrieverConfig(use_dense=False, use_sparse=False,
                                use_learned=False)
    retr, _ = _tri_retriever(config=cfg)
    with pytest.raises(QueryError):
        retr.retrieve("anything", 3)


def test_attach_backfills_existing_chunks():
    retr, chunks = _tri_retriever()
    assert len(retr.learned_index) == len(chunks)
    # post-attach ingest feeds the learned store too
    emb = retr.embedder
    extra = Chunk(document_id="d", content="a brand new chunk about fusion",
                  start_offset=0, end_offset=10)
    emb.embed_chunks([extra])
    retr.index(extra)
    assert len(retr.learned_index) == len(chunks) + 1


def test_remove_clears_learned_postings():
    retr, chunks = _tri_retriever()
    victim = chunks[2]  # the SPLADE sentence
    assert retr.remove(victim.id)
    assert len(retr.learned_index) == len(chunks) - 1
    res = retr.retrieve("weighted vocabulary terms", 10)
    assert victim.id not in [r.chunk.id for r in res]


def test_tri_tag_filter_exact():
    retr, chunks = _tri_retriever()
    for i, c in enumerate(chunks):
        retr.registry.set_tags(c.id, ["even" if i % 2 == 0 else "odd"])
    res = retr.retrieve("vocabulary retrieval fusion", 8,
                        tag_filter=TagFilter(all=("even",)))
    assert res
    rows = [retr.registry.row_of(r.chunk.id) for r in res]
    assert all(r % 2 == 0 for r in rows)


def test_tri_batch_matches_single():
    retr, _ = _tri_retriever()
    queries = ["weighted vocabulary terms", "dense vector retrieval",
               "term frequency ranking"]
    batched = retr.retrieve_batch(queries, 5)
    for q, batch_res in zip(queries, batched):
        single = retr.retrieve(q, 5)
        assert [r.chunk.id for r in batch_res] == [r.chunk.id for r in single]


def test_tri_empty_learned_index_falls_back_to_two_way():
    """An attached encoder with zero expansions must not break retrieval
    (use_learned auto-disables on an empty learned store)."""
    emb = rag.MockEmbedder(dimension=48)
    retr = HybridRetriever(emb)
    retr.attach_learned_sparse(SpladeEncoder(seed=0, max_len=32))
    chunks = _corpus(emb, n=4)
    # bypass retriever ingest: dense+sparse only, learned store left empty
    retr.sparse_index.add_batch(chunks)
    retr.vector_store.insert_many(chunks)
    res = retr.retrieve("term frequency", 3)
    assert res
    assert all(r.learned_score is None for r in res)


# -------------------------------------------------------- persistence ----


def _assert_same_results(a, b):
    assert [r.chunk.id for r in a] == [r.chunk.id for r in b]
    for x, y in zip(a, b):
        for f in ("dense_score", "sparse_score", "fused_score", "learned_score"):
            xv, yv = getattr(x, f), getattr(y, f)
            assert (xv is None) == (yv is None), f
            if xv is not None:
                assert xv == pytest.approx(yv, rel=1e-6), f


@pytest.mark.parametrize("streaming", [False, True], ids=["v1", "v2"])
def test_tri_hybrid_save_load_round_trip(tmp_path, streaming):
    from trueno_rag_tpu.persist import (
        load_index, read_index_info, save_index, save_index_streaming)

    retr, chunks = _tri_retriever(seed=3)
    query = "weighted vocabulary terms"
    before = retr.retrieve(query, 6)
    path = str(tmp_path / "idx.trag")
    if streaming:
        save_index_streaming(path, retr, frame_rows=4)
    else:
        save_index(path, retr)

    info = read_index_info(path)
    assert info["learned"]["max_len"] == 32
    assert info["learned"]["doc_top"] == 128
    assert info["learned"]["query_top"] == 32
    assert info["learned"]["seed"] == 3
    assert info["learned"]["params_fingerprint"] == \
        retr.learned_encoder.params_fingerprint()

    enc = SpladeEncoder(seed=3, max_len=int(info["learned"]["max_len"]),
                        doc_top=int(info["learned"]["doc_top"]),
                        query_top=int(info["learned"]["query_top"]))
    emb2 = rag.MockEmbedder(dimension=48)
    loaded, _ = load_index(path, emb2, learned_encoder=enc)
    assert len(loaded.learned_index) == len(chunks)
    after = loaded.retrieve(query, 6)
    _assert_same_results(before, after)

    # without an encoder the artifact loads as a plain two-source hybrid
    plain, _ = load_index(path, rag.MockEmbedder(dimension=48))
    assert plain.learned_index is None
    res = plain.retrieve(query, 4)
    assert res and all(r.learned_score is None for r in res)


def test_pipeline_builder_with_learned_sparse():
    from trueno_rag_tpu.pipeline import RagPipelineBuilder
    from trueno_rag_tpu.rerank import NoOpReranker

    pipe = (
        RagPipelineBuilder()
        .with_embedder(rag.MockEmbedder(dimension=48))
        .with_reranker(NoOpReranker())
        .with_learned_sparse(SpladeEncoder(seed=0, max_len=32))
        .build()
    )
    pipe.index_document(rag.Document(
        "SPLADE expands queries into weighted vocabulary terms. "
        "Dense retrieval embeds chunks. BM25 ranks by term frequency.",
        title="t"))
    assert len(pipe.retriever.learned_index) > 0
    out = pipe.query("weighted vocabulary expansion", 3)
    assert out
    assert any(r.learned_score is not None for r in out)


# ------------------------------------------------------ sharded tri ----


def test_sharded_tri_hybrid_matches_single_host():
    """ShardedHybridIndex picks up the retriever's learned source and
    must reproduce the single-host tri-hybrid ranking over the 8-shard
    mesh (replicated BM25 for bit-identical sparse arrays; the learned
    and dense sides shard by document/row)."""
    from trueno_rag_tpu.parallel.hybrid import ShardedHybridIndex
    from trueno_rag_tpu.parallel.mesh import create_mesh

    cfg = HybridRetrieverConfig(candidates_per_source=12)
    retr, chunks = _tri_retriever(cand=12, config=cfg)
    mesh = create_mesh(data=8, model=1)
    for strat in [FusionStrategy.rrf(), FusionStrategy.linear(0.5)]:
        retr.config.fusion = strat
        sharded = ShardedHybridIndex(
            retr, mesh, fusion=strat, candidates_per_source=12,
            sparse_mode="replicated",
        )
        assert sharded.learned is not None
        for q in ["weighted vocabulary terms", "dense vector retrieval",
                  "term frequency ranking"]:
            single = retr.retrieve(q, 6)
            multi = sharded.search(q, 6)
            assert [r.chunk.id for r in multi] == \
                [r.chunk.id for r in single], (strat.kind, q)


def test_sharded_tri_refresh_rebuilds_learned():
    from trueno_rag_tpu.parallel.hybrid import ShardedHybridIndex
    from trueno_rag_tpu.parallel.mesh import create_mesh

    retr, chunks = _tri_retriever(cand=12)
    mesh = create_mesh(data=8, model=1)
    sharded = ShardedHybridIndex(retr, mesh, candidates_per_source=12,
                                 sparse_mode="replicated")
    q = "weighted vocabulary terms"
    before_ids = [r.chunk.id for r in sharded.search(q, 6)]
    victim = next(c for c in chunks if c.id in before_ids)
    retr.remove(victim.id)
    sharded.refresh(rows=[retr.registry.capacity_rows])  # force rebuild path
    sharded.refresh()  # full rebuild: learned shards re-derive
    after = sharded.search(q, 6)
    assert victim.id not in [r.chunk.id for r in after]
    single = retr.retrieve(q, 6)
    assert [r.chunk.id for r in after] == [r.chunk.id for r in single]


def test_tri_one_dispatch_matches_staged():
    """The one-program tri path (ops.hybrid.tri_query_arrays) must give
    exactly the staged per-source results."""
    retr, chunks = _tri_retriever(cand=8)
    queries = ["weighted vocabulary terms", "dense vector retrieval"]
    fast = retr.retrieve_batch(queries, 6)
    retr._tri_fused_dispatch = False
    staged = retr.retrieve_batch(queries, 6)
    for a_list, b_list in zip(fast, staged):
        assert [r.chunk.id for r in a_list] == [r.chunk.id for r in b_list]
        for a, b in zip(a_list, b_list):
            for f in ("dense_score", "sparse_score", "fused_score",
                      "learned_score"):
                av, bv = getattr(a, f), getattr(b, f)
                assert (av is None) == (bv is None), f
                if av is not None:
                    assert av == pytest.approx(bv, rel=1e-5), f


def test_tri_fused_false_honored_by_one_dispatch(monkeypatch):
    """config.fused=False is the documented switch forcing the staged
    path; the one-program tri dispatch must honor it (ADVICE r2)."""
    retr, _ = _tri_retriever(cand=8)
    retr.config.fused = False
    called = []
    import trueno_rag_tpu.ops.hybrid as hybrid_ops

    def boom(*a, **kw):  # pragma: no cover - failure path
        called.append(1)
        raise AssertionError("one-dispatch ran despite fused=False")

    monkeypatch.setattr(hybrid_ops, "tri_query_arrays", boom)
    res = retr.retrieve_batch(["weighted vocabulary terms"], 4)[0]
    assert res and not called


def test_load_rejects_mismatched_learned_encoder(tmp_path):
    """An artifact's learned postings are the SAVED encoder's document
    expansions — re-attaching a different-weights query encoder must
    raise, not silently score noise (ADVICE r2, medium)."""
    from trueno_rag_tpu.errors import InvalidConfigError
    from trueno_rag_tpu.persist import load_index, save_index

    retr, _ = _tri_retriever(seed=3)
    path = str(tmp_path / "idx.trag")
    save_index(path, retr)
    wrong = SpladeEncoder(seed=4, max_len=32)
    with pytest.raises(InvalidConfigError, match="fingerprint"):
        load_index(path, rag.MockEmbedder(dimension=48), learned_encoder=wrong)
    right = SpladeEncoder(seed=3, max_len=32)
    loaded, _ = load_index(path, rag.MockEmbedder(dimension=48),
                           learned_encoder=right)
    assert loaded.learned_index is not None


def test_sharded_honors_use_learned_flag():
    """ShardedHybridIndex must gate the learned source on
    config.use_learned like single-host retrieve_batch — otherwise the
    mesh tri-fuses while the host path is two-source (ADVICE r2)."""
    from trueno_rag_tpu.parallel.hybrid import ShardedHybridIndex
    from trueno_rag_tpu.parallel.mesh import create_mesh

    retr, _ = _tri_retriever(cand=12)
    retr.config.use_learned = False
    mesh = create_mesh(data=8, model=1)
    sharded = ShardedHybridIndex(retr, mesh, candidates_per_source=12,
                                 sparse_mode="replicated")
    assert sharded.learned is None
    q = "weighted vocabulary terms"
    single = retr.retrieve(q, 6)
    assert all(r.learned_score is None for r in single)
    multi = sharded.search(q, 6)
    assert [r.chunk.id for r in multi] == [r.chunk.id for r in single]
