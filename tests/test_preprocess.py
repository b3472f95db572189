"""Preprocessing tests (reference: preprocess.rs inline tests — but here
the subsystem is alive and wired into the pipeline)."""

import pytest

from trueno_rag_tpu.errors import QueryError
from trueno_rag_tpu.preprocess import (
    ChainedPreprocessor,
    HydePreprocessor,
    KeywordExpander,
    MultiQueryPreprocessor,
    PassthroughPreprocessor,
    QueryAnalyzer,
    QueryIntent,
    SynonymExpander,
)


def test_passthrough():
    assert PassthroughPreprocessor().preprocess("hello world") == ["hello world"]
    with pytest.raises(QueryError):
        PassthroughPreprocessor().preprocess("  ")


def test_hyde_replace_and_augment():
    h = HydePreprocessor()
    out = h.preprocess("what is BM25")
    assert out == ["The answer is: what is BM25"]
    h2 = HydePreprocessor(augment=True)
    out2 = h2.preprocess("what is BM25")
    assert out2[0] == "what is BM25" and "The answer is" in out2[1]


def test_hyde_custom_generator():
    class Gen:
        def generate(self, q):
            return f"hypothetical doc about {q}"

    out = HydePreprocessor(Gen()).preprocess("foxes")
    assert out == ["hypothetical doc about foxes"]


def test_keyword_expander():
    out = KeywordExpander().expand("how to fix the broken index")
    assert out[0] == "fix broken index"  # stopwords removed ('how','to','the')
    assert any(v.startswith("how to fix the broken index ") for v in out[1:])
    assert KeywordExpander().expand("the of a") == []


def test_synonym_expander():
    out = SynonymExpander().expand("fix the error")
    assert "repair the error" in out
    assert "fix the failure" in out
    assert SynonymExpander({}).expand("fix the error") == []


def test_multi_query_caps_and_dedupes():
    class Dup:
        def expand(self, q):
            return [q, "v1", "v1", "v2", "v3", "v4", "v5"]

    mq = MultiQueryPreprocessor(Dup(), max_queries=4)
    out = mq.preprocess("orig")
    assert out[0] == "orig"
    assert len(out) == 4
    assert len(set(out)) == 4


def test_chained_dedupes_and_caps():
    chain = ChainedPreprocessor(
        [PassthroughPreprocessor(), HydePreprocessor(augment=True)], max_total=2
    )
    out = chain.preprocess("q")
    assert out[0] == "q" and len(out) == 2


@pytest.mark.parametrize(
    "query,intent",
    [
        ("how to install the package", QueryIntent.HOW_TO),
        ("what is a systolic array", QueryIntent.DEFINITION),
        ("fix crash error on startup", QueryIntent.TROUBLESHOOTING),
        ("rust vs python comparison", QueryIntent.COMPARISON),
        ("why when where overview", QueryIntent.INFORMATIONAL),
        ("zebra quantum paddle", QueryIntent.UNKNOWN),
    ],
)
def test_analyzer_intents(query, intent):
    a = QueryAnalyzer().analyze(query)
    assert a.intent == intent
    assert 0.3 <= a.confidence <= 1.0


def test_analyzer_keywords_filtered():
    a = QueryAnalyzer().analyze("how to fix the broken index quickly")
    assert "broken" in a.keywords and "index" in a.keywords
    assert "the" not in a.keywords


def test_pipeline_with_preprocessor():
    from trueno_rag_tpu import (
        Document,
        LexicalReranker,
        RagPipelineBuilder,
        RecursiveChunker,
        TfIdfEmbedder,
    )

    docs = [
        Document("BM25 failure modes and how to repair the ranking error.", title="A"),
        Document("Cooking pasta requires boiling water and salt.", title="B"),
        Document("Dense embeddings capture semantic similarity.", title="C"),
    ]
    emb = TfIdfEmbedder(64).fit([d.content for d in docs])
    p = (
        RagPipelineBuilder()
        .with_embedder(emb)
        .with_reranker(LexicalReranker())
        .with_chunker(RecursiveChunker(chunk_size=200, overlap=20))
        .with_preprocessor(MultiQueryPreprocessor(SynonymExpander()))
        .build()
    )
    p.index_documents(docs)
    # 'fix' expands to 'repair' via synonyms; doc A says 'repair'
    res = p.query("fix the ranking", k=2)
    assert res
    assert res[0].chunk.metadata.title == "A"


def test_adaptive_preprocessor_routes_by_intent():
    from trueno_rag_tpu.preprocess_adaptive import AdaptivePreprocessor

    ap = AdaptivePreprocessor()
    # troubleshooting -> synonym variants ('fix' -> 'repair' etc.)
    out = ap.preprocess("fix the error")
    assert out[0] == "fix the error" and len(out) > 1
    assert any("repair" in v or "failure" in v for v in out[1:])
    # definition -> HyDE augmented
    out = ap.preprocess("what is a systolic array")
    assert out[0] == "what is a systolic array"
    assert any("The answer is" in v for v in out)
    # unknown intent -> passthrough
    assert ap.preprocess("zebra quantum paddle") == ["zebra quantum paddle"]


def test_adaptive_in_pipeline():
    from trueno_rag_tpu import Document, LexicalReranker, RagPipelineBuilder, TfIdfEmbedder
    from trueno_rag_tpu.preprocess_adaptive import AdaptivePreprocessor

    docs = [
        Document("To repair a broken build, clear the cache and rerun.", title="Fix"),
        Document("A systolic array is a grid of multiply-accumulate units.", title="Def"),
    ]
    emb = TfIdfEmbedder(32).fit([d.content for d in docs])
    p = (
        RagPipelineBuilder()
        .with_embedder(emb)
        .with_reranker(LexicalReranker())
        .with_preprocessor(AdaptivePreprocessor())
        .build()
    )
    p.index_documents(docs)
    res = p.query("fix the broken build", k=1)
    assert res[0].chunk.metadata.title == "Fix"


def test_adaptive_fusion_routing():
    from trueno_rag_tpu.fusion import FusionStrategy
    from trueno_rag_tpu.preprocess_adaptive import (
        DEFAULT_FUSION_ROUTES,
        AdaptivePreprocessor,
    )
    from trueno_rag_tpu.preprocess import QueryIntent

    ap = AdaptivePreprocessor()
    # troubleshooting → sparse-leaning linear
    f = ap.fusion_for("fix the crash error")
    assert f is not None and f.kind == "linear" and f.params["dense_weight"] < 0.5
    # definition → dense-leaning linear
    f = ap.fusion_for("what is a systolic array")
    assert f is not None and f.kind == "linear" and f.params["dense_weight"] > 0.5
    # unknown intent / low confidence → None (keep configured strategy)
    assert ap.fusion_for("zebra quantum paddle") is None
    # custom routes are honored
    ap2 = AdaptivePreprocessor(
        fusion_routes={QueryIntent.TROUBLESHOOTING: FusionStrategy.dbsf()}
    )
    assert ap2.fusion_for("fix the crash error").kind == "dbsf"
    assert ap2.fusion_for("what is a systolic array") is None
    assert DEFAULT_FUSION_ROUTES[QueryIntent.HOW_TO].kind == "rrf"


def test_retrieve_batch_fusion_override_matches_reconfigured():
    """A per-dispatch fusion override must return exactly what a
    retriever permanently configured with that strategy returns."""
    from trueno_rag_tpu import Document, MockEmbedder
    from trueno_rag_tpu.chunking import RecursiveChunker
    from trueno_rag_tpu.fusion import FusionStrategy
    from trueno_rag_tpu.retrieve import HybridRetriever, HybridRetrieverConfig

    docs = [
        Document("dense vectors capture semantic similarity for retrieval", title="A"),
        Document("BM25 scores exact keyword matches with idf weighting", title="B"),
        Document("hybrid search fuses dense and sparse result lists", title="C"),
    ]
    emb = MockEmbedder(dimension=32)
    chunker = RecursiveChunker(chunk_size=64, overlap=8)
    all_chunks = []
    for d in docs:
        cs = chunker.chunk(d)
        emb.embed_chunks(cs)
        all_chunks.extend(cs)

    def build(cfg=None):
        # index the SAME chunk objects so ids line up across retrievers
        r = HybridRetriever(emb, config=cfg)
        r.index_batch(all_chunks)
        return r

    base = build()
    linear = build(HybridRetrieverConfig(fusion=FusionStrategy.linear(0.3)))
    qs = ["exact keyword matches", "semantic similarity search"]
    got = base.retrieve_batch(qs, 3, fusion=FusionStrategy.linear(0.3))
    want = linear.retrieve_batch(qs, 3)
    for g_list, w_list in zip(got, want):
        assert [r.chunk.id for r in g_list] == [r.chunk.id for r in w_list]
        assert [r.fused_score for r in g_list] == [r.fused_score for r in w_list]
    # and the override does NOT stick: base still fuses with RRF
    rrf_again = base.retrieve_batch(qs, 3)
    rrf_fresh = build().retrieve_batch(qs, 3)
    for a_list, b_list in zip(rrf_again, rrf_fresh):
        assert [r.chunk.id for r in a_list] == [r.chunk.id for r in b_list]


def test_pipeline_applies_intent_fusion(monkeypatch):
    """The pipeline must hand the preprocessor's fusion choice to the
    retriever (spied), and fall back to the configured strategy when
    fusion_for returns None."""
    from trueno_rag_tpu import Document, LexicalReranker, RagPipelineBuilder, TfIdfEmbedder
    from trueno_rag_tpu.preprocess_adaptive import AdaptivePreprocessor

    docs = [
        Document("To repair a broken build, clear the cache and rerun.", title="Fix"),
        Document("A systolic array is a grid of multiply-accumulate units.", title="Def"),
    ]
    emb = TfIdfEmbedder(32).fit([d.content for d in docs])
    p = (
        RagPipelineBuilder()
        .with_embedder(emb)
        .with_reranker(LexicalReranker())
        .with_preprocessor(AdaptivePreprocessor())
        .build()
    )
    p.index_documents(docs)
    seen = []
    real = p.retriever.retrieve_batch

    def spy(queries, k, fusion=None, **kw):
        seen.append(fusion)
        return real(queries, k, fusion=fusion, **kw)

    monkeypatch.setattr(p.retriever, "retrieve_batch", spy)
    res = p.query("fix the broken build", k=1)  # troubleshooting intent
    assert res[0].chunk.metadata.title == "Fix"
    assert seen[-1] is not None and seen[-1].kind == "linear"
    assert seen[-1].params["dense_weight"] < 0.5
    p.query("zebra quantum paddle", k=1)  # unknown → configured default
    assert seen[-1] is None


def test_multi_query_cap_honored_exactly():
    """Regression (review r3): max_queries caps BEFORE appending
    (reference preprocess.rs:163-167) — max_queries=1 returns only the
    original."""
    from trueno_rag_tpu.preprocess import KeywordExpander, MultiQueryPreprocessor

    p = MultiQueryPreprocessor(KeywordExpander(), max_queries=1)
    assert p.preprocess("how to fix broken index") == ["how to fix broken index"]


def test_chained_empty_passes_original_through():
    """Regression (review r3): an empty chain returns [query]
    (preprocess.rs:366-368), never [] — [] silently retrieved zero
    variants for every query."""
    from trueno_rag_tpu.preprocess import ChainedPreprocessor

    assert ChainedPreprocessor([]).preprocess("hello") == ["hello"]


def test_synonym_expander_custom_keys_and_take2():
    """Regression (review r3): custom map keys lowercase at
    construction (they silently never matched), and at most two
    synonyms substitute per word (reference take(2))."""
    from trueno_rag_tpu.preprocess import SynonymExpander

    e = SynonymExpander({"Error": ["failure", "fault", "exception"]})
    out = e.expand("error here")
    assert out == ["failure here", "fault here"]  # lowercased key, take(2)
