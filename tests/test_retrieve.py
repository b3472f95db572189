"""Retriever + reranker tests (reference: retrieve.rs / rerank.rs inline
tests — best_score priority retrieve.rs:383-401, hybrid round-trip,
lexical/cross-encoder/composite scoring)."""

import numpy as np
import pytest

from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
from trueno_rag_tpu.embed import MockEmbedder, TfIdfEmbedder
from trueno_rag_tpu.errors import QueryError
from trueno_rag_tpu.fusion import FusionStrategy
from trueno_rag_tpu.retrieve import (
    DenseRetriever,
    HybridRetriever,
    HybridRetrieverConfig,
    RetrievalResult,
    SparseRetriever,
)
from trueno_rag_tpu.rerank import (
    CompositeReranker,
    LexicalReranker,
    MockCrossEncoderReranker,
    NoOpReranker,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "machine learning models process large data sets",
    "foxes are clever wild animals living in forests",
    "deep neural networks learn hierarchical features",
    "a lazy afternoon nap under the summer sun",
    "data pipelines move information between systems",
]


def mk_chunk(i: int, content: str) -> Chunk:
    return Chunk(
        document_id=f"doc{i % 2}",
        content=content,
        start_offset=0,
        end_offset=len(content),
        metadata=ChunkMetadata(title=f"t{i}"),
        id=chunk_id_from_int(i),
    )


def build_hybrid(embedder=None, config=None):
    emb = embedder or TfIdfEmbedder(64).fit(CORPUS)
    retr = HybridRetriever(emb, config=config)
    chunks = [mk_chunk(i, t) for i, t in enumerate(CORPUS)]
    emb.embed_chunks(chunks)
    retr.index_batch(chunks)
    return retr, chunks


def test_best_score_priority():
    c = mk_chunk(0, "x")
    r = RetrievalResult(chunk=c)
    assert r.best_score() == 0.0
    r.sparse_score = 1.0
    assert r.best_score() == 1.0
    r.dense_score = 2.0
    assert r.best_score() == 2.0
    r.fused_score = 3.0
    assert r.best_score() == 3.0
    r.rerank_score = 4.0
    assert r.best_score() == 4.0


def test_hybrid_retrieve_relevance():
    retr, chunks = build_hybrid()
    results = retr.retrieve("fox", k=3)
    assert results
    top_contents = [r.chunk.content for r in results[:2]]
    assert any("fox" in c for c in top_contents)
    # hybrid results carry fused scores and per-source scores where present
    assert all(r.fused_score is not None for r in results)


def test_hybrid_scores_populated():
    retr, chunks = build_hybrid()
    results = retr.retrieve("machine learning data", k=6)
    got_dense = any(r.dense_score is not None for r in results)
    got_sparse = any(r.sparse_score is not None for r in results)
    assert got_dense and got_sparse


def test_hybrid_dense_only_and_sparse_only_toggles():
    cfg = HybridRetrieverConfig(use_sparse=False)
    retr, chunks = build_hybrid(config=cfg)
    res = retr.retrieve("fox", 3)
    assert all(r.fused_score is None for r in res)
    assert all(r.dense_score is not None for r in res)

    cfg2 = HybridRetrieverConfig(use_dense=False)
    retr2, _ = build_hybrid(config=cfg2)
    res2 = retr2.retrieve("fox", 3)
    assert all(r.sparse_score is not None for r in res2)

    cfg3 = HybridRetrieverConfig(use_dense=False, use_sparse=False)
    retr3, _ = build_hybrid(config=cfg3)
    with pytest.raises(QueryError):
        retr3.retrieve("fox", 3)


def test_hybrid_empty_query_raises():
    retr, _ = build_hybrid()
    with pytest.raises(QueryError):
        retr.retrieve("   ", 3)


def test_hybrid_empty_index_returns_empty():
    retr = HybridRetriever(MockEmbedder(16))
    assert retr.retrieve("anything", 5) == []


def test_hybrid_batch_matches_single():
    retr, _ = build_hybrid()
    single_a = retr.retrieve("fox", 4)
    single_b = retr.retrieve("data pipelines", 4)
    batch = retr.retrieve_batch(["fox", "data pipelines"], 4)
    assert [r.chunk.id for r in batch[0]] == [r.chunk.id for r in single_a]
    assert [r.chunk.id for r in batch[1]] == [r.chunk.id for r in single_b]


def test_hybrid_remove():
    retr, chunks = build_hybrid()
    target = chunks[0]
    assert retr.remove(target.id)
    assert not retr.remove(target.id)
    res = retr.retrieve("quick brown fox", 6)
    assert target.id not in [r.chunk.id for r in res]
    assert len(retr) == 5


def test_hybrid_fusion_strategies_all_work():
    for strat in [
        FusionStrategy.rrf(),
        FusionStrategy.linear(0.5),
        FusionStrategy.convex(0.3),
        FusionStrategy.dbsf(),
        FusionStrategy.union(),
        FusionStrategy.intersection(),
    ]:
        cfg = HybridRetrieverConfig(fusion=strat, candidates_per_source=6)
        retr, _ = build_hybrid(config=cfg)
        res = retr.retrieve("fox forests", 4)
        assert isinstance(res, list)  # intersection may legitimately be empty


def test_hybrid_sparse_only_hit_still_hydrates():
    # A chunk found only by BM25 must still hydrate (the reference requires
    # it to exist in the dense store; our shared registry guarantees it).
    retr, chunks = build_hybrid()
    res = retr.retrieve("zzz hierarchical", 6)
    assert any(r.chunk.id == chunks[3].id for r in res)


def test_dense_and_sparse_retrievers():
    emb = TfIdfEmbedder(64).fit(CORPUS)
    chunks = [mk_chunk(i, t) for i, t in enumerate(CORPUS)]
    emb.embed_chunks(chunks)

    dr = DenseRetriever(emb)
    dr.index_batch(chunks)
    res = dr.retrieve("fox", 2)
    assert len(res) == 2 and res[0].dense_score is not None

    sr = SparseRetriever()
    sr.index_batch(chunks)
    res = sr.retrieve("fox", 2)
    assert res and res[0].sparse_score is not None
    assert "fox" in res[0].chunk.content


# ----------------------------------------------------------- rerankers ----


def _candidates():
    texts = [
        "the fox jumps high over fences",
        "completely unrelated text about cooking pasta",
        "fox fox fox everywhere a fox",
    ]
    return [RetrievalResult(chunk=mk_chunk(i, t), fused_score=1.0 - 0.1 * i) for i, t in enumerate(texts)]


def test_noop_reranker_preserves_order():
    cands = _candidates()
    out = NoOpReranker().rerank("fox", cands, 2)
    assert [r.chunk.id for r in out] == [c.chunk.id for c in cands[:2]]


def test_lexical_reranker_prefers_matches():
    out = LexicalReranker().rerank("fox", _candidates(), 3)
    assert "fox" in out[0].chunk.content
    assert out[-1].chunk.content.startswith("completely unrelated")
    assert all(r.rerank_score is not None for r in out)


def test_lexical_exact_substring_component():
    rr = LexicalReranker(exact_match_weight=1.0, coverage_weight=0.0, position_weight=0.0)
    assert rr.score("fox jumps", "the fox jumps high") == pytest.approx(1.0)
    assert rr.score("fox jumps", "no match") == pytest.approx(0.0)


def test_lexical_case_sensitivity():
    ci = LexicalReranker()
    cs = LexicalReranker(case_sensitive=True)
    assert ci.score("FOX", "the fox runs") > 0.0
    assert cs.score("FOX", "the fox runs") == 0.0


def test_cross_encoder_overlap():
    rr = MockCrossEncoderReranker()
    assert rr.score("fox jumps", "fox jumps high") == pytest.approx(1.0)
    assert rr.score("fox jumps", "fox sleeps") == pytest.approx(0.5)
    assert rr.score("", "anything") == 0.0


def test_composite_weighted_sum():
    lex = LexicalReranker()
    ce = MockCrossEncoderReranker()
    comp = CompositeReranker([lex, ce], weights=[0.25, 0.75])
    cands = _candidates()
    out = comp.rerank("fox", cands, 3)
    expected_top = max(
        cands,
        key=lambda r: 0.25 * lex.score("fox", r.chunk.content) + 0.75 * ce.score("fox", r.chunk.content),
    )
    assert out[0].chunk.id == expected_top.chunk.id


def test_composite_validation():
    from trueno_rag_tpu.errors import InvalidConfigError

    with pytest.raises(InvalidConfigError):
        CompositeReranker([])
    with pytest.raises(InvalidConfigError):
        CompositeReranker([NoOpReranker()], weights=[1.0, 2.0])


def test_fused_query_program_matches_staged_path():
    """The one-XLA-program path (encoder+dense+bm25+fusion fused) must
    rank identically to the staged retrieve_batch."""
    from trueno_rag_tpu.models.encoder import EncoderConfig, JaxEncoderEmbedder

    emb = JaxEncoderEmbedder(config=EncoderConfig.tiny())
    # fused=False forces the staged path so the comparison is real
    # (JAX encoders auto-route through the fused program by default)
    retr = HybridRetriever(
        emb, config=HybridRetrieverConfig(candidates_per_source=10, fused=False)
    )
    chunks = [mk_chunk(i, t) for i, t in enumerate(CORPUS)]
    emb.embed_chunks(chunks)
    retr.index_batch(chunks)

    queries = ["fox forests", "neural networks data"]
    staged = retr.retrieve_batch(queries, 4)
    fused = retr.retrieve_batch_fused(queries, 4)
    for s_list, f_list in zip(staged, fused):
        assert [r.chunk.id for r in f_list] == [r.chunk.id for r in s_list]
        for s, f in zip(s_list, f_list):
            assert f.fused_score == pytest.approx(s.fused_score, rel=1e-4, abs=1e-6)


def test_fused_compact_program_matches_staged_compact_path():
    """r4: fused=True now serves COMPACT stores through the one-program
    compact scan (encoder + certified scan + BM25 + fusion in one
    dispatch, no fp32 matrix on device) — results must rank identically
    to the staged compact path, including queries the certificate
    fails (their dense candidates resolve through the exact patch and
    re-fuse with the host oracle)."""
    from trueno_rag_tpu.index import VectorStoreConfig
    from trueno_rag_tpu.models.encoder import EncoderConfig, JaxEncoderEmbedder

    emb = JaxEncoderEmbedder(config=EncoderConfig.tiny())
    cfg = HybridRetrieverConfig(candidates_per_source=10, fused=False)
    store_cfg = VectorStoreConfig(
        dimension=emb.dimension, scan_tier="compact", scan_tile_n=1024,
    )
    staged_r = HybridRetriever(emb, config=cfg,
                               vector_config=store_cfg)
    texts = CORPUS * 8  # enough rows for several scan tiles
    chunks = [mk_chunk(i, t + f" variant {i}") for i, t in enumerate(texts)]
    emb.embed_chunks(chunks)
    staged_r.index_batch(chunks)

    queries = ["fox forests", "neural networks data", "tensor units"]
    staged = staged_r.retrieve_batch(queries, 4)
    fused = staged_r.retrieve_batch_fused(queries, 4)
    for s_list, f_list in zip(staged, fused):
        assert [r.chunk.id for r in f_list] == [r.chunk.id for r in s_list]
        for s, f in zip(s_list, f_list):
            assert f.fused_score == pytest.approx(s.fused_score, rel=1e-4, abs=1e-6)

    # explicit fused=True routes compact stores through the program
    fused_cfg = HybridRetrieverConfig(candidates_per_source=10, fused=True)
    fr = HybridRetriever(emb, config=fused_cfg, vector_config=store_cfg)
    fr.index_batch(chunks)
    via_route = fr.retrieve_batch(queries, 4)
    for s_list, f_list in zip(staged, via_route):
        assert [r.chunk.id for r in f_list] == [r.chunk.id for r in s_list]


def test_fused_path_requires_jax_encoder():
    from trueno_rag_tpu.errors import QueryError

    retr, _ = build_hybrid()  # TF-IDF embedder
    with pytest.raises(QueryError):
        retr.retrieve_batch_fused(["q"], 2)


def test_fused_compact_requires_bf16r_layout():
    """Advisor r4: fused=True over a compact store with a non-bf16r
    scan layout must raise the taxonomy's QueryError, not misalign
    fused_hybrid_query_compact's positional tier arguments."""
    from trueno_rag_tpu.errors import QueryError
    from trueno_rag_tpu.index import VectorStoreConfig
    from trueno_rag_tpu.models.encoder import EncoderConfig, JaxEncoderEmbedder

    emb = JaxEncoderEmbedder(config=EncoderConfig.tiny())
    retr = HybridRetriever(
        emb,
        config=HybridRetrieverConfig(candidates_per_source=5, fused=True),
        vector_config=VectorStoreConfig(
            dimension=emb.dimension, scan_tier="compact",
            compact_scan="bf16", scan_tile_n=1024,
        ),
    )
    chunks = [mk_chunk(i, t + f" v{i}") for i, t in enumerate(CORPUS * 4)]
    emb.embed_chunks(chunks)
    retr.index_batch(chunks)
    with pytest.raises(QueryError, match="bf16r"):
        retr.retrieve_batch_fused(["fox forests"], 3)
    # the staged path still serves the bf16 layout
    retr.config.fused = False
    assert retr.retrieve_batch(["fox forests"], 3)[0]


def test_hybrid_reindex_same_id_clears_old_postings():
    """Regression (code review): re-indexing an existing chunk id must
    clear the OLD content's BM25 postings — the registry swap order
    used to leave 'zebra' retrievable after replacement."""
    emb = TfIdfEmbedder(32).fit(["zebra quantum falafel", "gorilla neutrino pancake"])
    retr = HybridRetriever(emb)
    c1 = mk_chunk(1, "zebra quantum falafel")
    c1.set_embedding(emb.embed_document(c1.content))
    retr.index(c1)
    c2 = mk_chunk(1, "gorilla neutrino pancake")  # same id -> replacement
    c2.set_embedding(emb.embed_document(c2.content))
    retr.index(c2)
    assert retr.sparse_index.search("zebra", 5) == []
    hits = retr.sparse_index.search("gorilla", 5)
    assert [c for c, _ in hits] == [c2.id]
    assert len(retr) == 1


def test_bm25_add_batch_replacement_and_duplicates():
    """Regression (code review): native add_batch must fall back to the
    safe path for replacements across batches and duplicate ids within
    one batch (no stale postings, no double-counted doc lengths)."""
    from trueno_rag_tpu.index import BM25Index

    idx = BM25Index()
    idx.add_batch([mk_chunk(1, "zebra quantum falafel")])
    idx.add_batch([mk_chunk(1, "gorilla neutrino pancake")])  # replacement
    assert idx.search("zebra", 5) == []
    assert idx.search("gorilla", 5)
    assert len(idx) == 1

    idx2 = BM25Index()
    idx2.add_batch([mk_chunk(7, "apple banana"), mk_chunk(7, "cherry durian")])
    assert len(idx2) == 1
    assert idx2.search("apple", 5) == []  # last write wins
    assert idx2.search("cherry", 5)
    # doc length counted once (2 tokens), not accumulated
    assert idx2.avg_doc_length == 2.0


def test_auto_fused_routing():
    from trueno_rag_tpu.models.encoder import EncoderConfig, JaxEncoderEmbedder

    emb = JaxEncoderEmbedder(config=EncoderConfig.tiny())
    retr = HybridRetriever(emb, config=HybridRetrieverConfig(candidates_per_source=8))
    chunks = [mk_chunk(i, t) for i, t in enumerate(CORPUS)]
    emb.embed_chunks(chunks)
    retr.index_batch(chunks)
    # auto (fused=None) routes JAX encoders through the fused program and
    # must agree with the explicitly fused call
    auto = retr.retrieve_batch(["fox forests"], 3)
    explicit = retr.retrieve_batch_fused(["fox forests"], 3)
    assert [r.chunk.id for r in auto[0]] == [r.chunk.id for r in explicit[0]]
    # fused=True with a host embedder is a config error
    bad = HybridRetriever(
        TfIdfEmbedder(16).fit(CORPUS),
        config=HybridRetrieverConfig(fused=True),
    )
    bad_chunks = [mk_chunk(i, t) for i, t in enumerate(CORPUS)]
    bad.embedder.embed_chunks(bad_chunks)
    bad.index_batch(bad_chunks)
    with pytest.raises(QueryError):
        bad.retrieve("fox", 2)


def test_auto_routing_prefers_staged_tier_over_fused_program():
    """fused=None + an ENGAGED scan tier: the one-program fused path
    would scan the fp32 matrix, which the tier exists to avoid — auto
    must take the staged tiered hybrid, with results identical to the
    explicit fused program (the tier's exactness contract)."""
    from trueno_rag_tpu.index.vector_store import VectorStoreConfig
    from trueno_rag_tpu.models.encoder import EncoderConfig, JaxEncoderEmbedder

    emb = JaxEncoderEmbedder(config=EncoderConfig.tiny())
    retr = HybridRetriever(
        emb,
        config=HybridRetrieverConfig(candidates_per_source=8),
        vector_config=VectorStoreConfig(
            dimension=emb.dimension, scan_tier="bf16", scan_kernel="tile"
        ),
    )
    chunks = [mk_chunk(i, t) for i, t in enumerate(CORPUS)]
    emb.embed_chunks(chunks)
    retr.index_batch(chunks)
    auto = retr.retrieve_batch(["fox forests"], 3)
    explicit = retr.retrieve_batch_fused(["fox forests"], 3)
    assert [r.chunk.id for r in auto[0]] == [r.chunk.id for r in explicit[0]]
    # explicit fused=True still honors the request on a tiered store
    retr.config.fused = True
    forced = retr.retrieve_batch(["fox forests"], 3)
    assert [r.chunk.id for r in forced[0]] == [r.chunk.id for r in explicit[0]]


def test_mmr_reranker_diversifies_and_respects_lambda():
    """MMR must demote near-duplicate candidates below a less-relevant
    but diverse one; lambda_=1.0 reduces to pure relevance order."""
    import numpy as np

    from trueno_rag_tpu import MMRReranker
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.errors import InvalidConfigError
    from trueno_rag_tpu.retrieve import RetrievalResult

    def cand(i, emb, score):
        c = Chunk(document_id="d", content=f"c{i}", start_offset=0, end_offset=2,
                  metadata=ChunkMetadata(), id=chunk_id_from_int(i),
                  embedding=np.asarray(emb, dtype=np.float32))
        return RetrievalResult(chunk=c, fused_score=score)

    # candidates 0 and 1 are near-identical; 2 is orthogonal, lower score
    a = [1.0, 0.0, 0.0]
    a2 = [0.999, 0.04, 0.0]
    b = [0.0, 1.0, 0.0]
    cands = [cand(0, a, 1.0), cand(1, a2, 0.95), cand(2, b, 0.5)]

    out = MMRReranker(lambda_=0.5).rerank("q", cands, top_k=3)
    ids = [r.chunk.id for r in out]
    assert ids[0] == chunk_id_from_int(0)  # most relevant first
    assert ids[1] == chunk_id_from_int(2)  # diverse beats the near-dup
    assert ids[2] == chunk_id_from_int(1)

    out_rel = MMRReranker(lambda_=1.0).rerank("q", cands, top_k=3)
    assert [r.chunk.id for r in out_rel] == [chunk_id_from_int(i) for i in (0, 1, 2)]

    assert MMRReranker().rerank("q", [], top_k=3) == []
    with pytest.raises(InvalidConfigError):
        MMRReranker(lambda_=1.5)

    # missing embeddings degrade gracefully (zero redundancy)
    no_emb = [RetrievalResult(chunk=Chunk(
        document_id="d", content="x", start_offset=0, end_offset=1,
        metadata=ChunkMetadata(), id=chunk_id_from_int(9)), fused_score=0.3)]
    assert MMRReranker(lambda_=0.5).rerank("q", no_emb, top_k=1)


def test_mmr_in_pipeline():
    from trueno_rag_tpu import Document, MMRReranker, MockEmbedder, RagPipelineBuilder

    pipe = (RagPipelineBuilder().with_embedder(MockEmbedder(64))
            .with_reranker(MMRReranker(lambda_=0.7)).build())
    pipe.index_document(Document("the quick brown fox jumps over the dog"))
    pipe.index_document(Document("the quick brown fox jumps over a dog"))
    pipe.index_document(Document("tensor units multiply matrices quickly"))
    res = pipe.query("quick fox matrices", k=3)
    assert len(res) == 3
    assert all(r.rerank_score is not None for r in res)


def test_index_is_atomic_on_bad_embedding():
    """Regression (review r3): a chunk that fails dense validation must
    not leave BM25 postings behind (a half-indexed ghost that sparse
    retrieval serves)."""
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.embed import MockEmbedder
    from trueno_rag_tpu.errors import VectorStoreError
    from trueno_rag_tpu.retrieve import HybridRetriever

    retr = HybridRetriever(MockEmbedder(dimension=8))
    bad = Chunk(document_id="d", content="ghost entry terms", start_offset=0,
                end_offset=5, metadata=ChunkMetadata(), id=chunk_id_from_int(7))
    with pytest.raises(VectorStoreError):
        retr.index(bad)  # no embedding
    assert len(retr) == 0
    assert retr.sparse_index.search("ghost", 3) == []
    with pytest.raises(VectorStoreError):
        retr.index_batch([bad])
    assert retr.sparse_index.search("ghost", 3) == []


def test_fused_true_with_disabled_source_raises():
    """Regression (review r3): the explicit-fused contract raises
    loudly everywhere; a disabled source must not silently degrade it
    to the staged path."""
    from trueno_rag_tpu.embed import MockEmbedder
    from trueno_rag_tpu.errors import QueryError
    from trueno_rag_tpu.retrieve import HybridRetriever, HybridRetrieverConfig

    retr = HybridRetriever(
        MockEmbedder(dimension=8),
        config=HybridRetrieverConfig(fused=True, use_sparse=False),
    )
    with pytest.raises(QueryError):
        retr.retrieve_batch(["q"], 3)


def test_retriever_ensure_ready_warms_device_state():
    """ensure_ready() builds the device state up front (serving warm-up
    after an ingest/reload window): both stores come out clean and the
    next retrieval finds nothing dirty."""
    retr, _ = build_hybrid()
    assert retr.vector_store._dirty  # fresh ingest: device state pending
    retr.ensure_ready()
    assert not retr.vector_store._dirty
    assert retr.sparse_index._snap is not None
    # and it's idempotent + consistent with the query path
    retr.ensure_ready()
    got = retr.retrieve("lazy fox", 3)
    assert got and not retr.vector_store._dirty
