"""Pipeline + context assembly tests (reference: pipeline.rs inline tests
— full index+query+context round-trip pipeline.rs:769-803, builder
validation pipeline.rs:494-501, token budgeting, citation formatting)."""

import pytest

from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, RecursiveChunker, chunk_id_from_int
from trueno_rag_tpu.document import Document
from trueno_rag_tpu.embed import MockEmbedder, TfIdfEmbedder
from trueno_rag_tpu.errors import InvalidConfigError
from trueno_rag_tpu.fusion import FusionStrategy
from trueno_rag_tpu.pipeline import (
    AssemblyStrategy,
    ContextAssembler,
    ContextAssemblerConfig,
    RagPipelineBuilder,
    pipeline_builder,
)
from trueno_rag_tpu.rerank import LexicalReranker, NoOpReranker
from trueno_rag_tpu.retrieve import RetrievalResult

DOCS = [
    Document(
        "Rust is a systems programming language focused on safety and speed. "
        "It has a strong type system. Memory safety without garbage collection.",
        title="Rust",
    ),
    Document(
        "TPUs are custom accelerators for machine learning workloads. "
        "They excel at large matrix multiplication. The MXU is a systolic array.",
        title="TPU",
    ),
    Document(
        "Retrieval augmented generation grounds language models in documents. "
        "It retrieves relevant chunks and assembles them into context.",
        title="RAG",
    ),
]


def build_pipeline(**kw):
    emb = TfIdfEmbedder(64).fit([d.content for d in DOCS])
    p = (
        RagPipelineBuilder()
        .with_embedder(emb)
        .with_reranker(kw.get("reranker", LexicalReranker()))
        .with_chunker(RecursiveChunker(chunk_size=160, overlap=20))
        .build()
    )
    p.index_documents(DOCS)
    return p


def test_builder_requires_embedder_and_reranker():
    with pytest.raises(InvalidConfigError):
        RagPipelineBuilder().build()
    with pytest.raises(InvalidConfigError):
        RagPipelineBuilder().with_embedder(MockEmbedder(8)).build()
    with pytest.raises(InvalidConfigError):
        RagPipelineBuilder().with_reranker(NoOpReranker()).build()


def test_pipeline_builder_convenience():
    p = pipeline_builder().build()
    p.index_document(Document("hello world content for the mock pipeline"))
    assert p.document_count == 1
    assert p.query("hello", 2) is not None


def test_full_round_trip():
    p = build_pipeline()
    assert p.document_count == 3 and p.chunk_count >= 3
    results = p.query("matrix multiplication accelerator", k=3)
    assert results
    assert results[0].chunk.metadata.title == "TPU"
    assert results[0].rerank_score is not None


def test_query_retrieves_2k_then_reranks_to_k():
    p = build_pipeline()
    results = p.query("language", k=2)
    assert len(results) <= 2


def test_query_batch():
    p = build_pipeline()
    outs = p.query_batch(["rust memory safety", "systolic array"], k=2)
    assert len(outs) == 2
    assert outs[0][0].chunk.metadata.title == "Rust"
    assert outs[1][0].chunk.metadata.title == "TPU"


def test_query_with_context_citations():
    p = build_pipeline()
    ctx = p.query_with_context("retrieval augmented generation", k=3)
    assert ctx.chunks and ctx.citations
    assert ctx.total_tokens > 0
    formatted = ctx.format_with_citations()
    assert "[1]" in formatted
    listing = ctx.citation_list()
    assert listing.startswith("[1] ")
    assert ctx.format_plain()
    assert "[1]" not in ctx.format_plain()


# ---------------------------------------------------------- assembler ----


def _results(n, doc_ids=None, content_len=100):
    out = []
    for i in range(n):
        c = Chunk(
            document_id=(doc_ids[i] if doc_ids else f"d{i}"),
            content="x" * content_len,
            start_offset=0,
            end_offset=content_len,
            metadata=ChunkMetadata(title=f"T{i}"),
            id=chunk_id_from_int(i),
        )
        out.append(RetrievalResult(chunk=c, fused_score=1.0 - i * 0.1))
    return out


def test_budget_stops_at_first_overflow():
    # each chunk ~25 tokens (100 chars / 4); budget of 60 fits 2
    asm = ContextAssembler(ContextAssemblerConfig(max_tokens=60))
    ctx = asm.assemble(_results(5))
    assert len(ctx.chunks) == 2
    assert ctx.total_tokens == 50


def test_citations_disabled_gives_zero_ids():
    asm = ContextAssembler(ContextAssemblerConfig(include_citations=False))
    ctx = asm.assemble(_results(3))
    assert all(c.citation_id == 0 for c in ctx.chunks)
    assert ctx.citations == []
    assert "[1]" not in ctx.format_with_citations()


def test_document_grouped_first_appearance_order():
    asm = ContextAssembler(ContextAssemblerConfig(strategy=AssemblyStrategy.DOCUMENT_GROUPED))
    res = _results(4, doc_ids=["A", "B", "A", "B"])
    ctx = asm.assemble(res)
    assert [c.document_id for c in ctx.chunks] == ["A", "A", "B", "B"]


def test_interleaved_round_robin():
    asm = ContextAssembler(ContextAssemblerConfig(strategy=AssemblyStrategy.INTERLEAVED))
    res = _results(5, doc_ids=["A", "A", "A", "B", "B"])
    ctx = asm.assemble(res)
    assert [c.document_id for c in ctx.chunks] == ["A", "B", "A", "B", "A"]


def test_assembler_config_validation():
    with pytest.raises(InvalidConfigError):
        ContextAssemblerConfig(max_tokens=0)
    with pytest.raises(InvalidConfigError):
        ContextAssemblerConfig(strategy="bogus")


def test_fusion_override_through_builder():
    emb = TfIdfEmbedder(32).fit([d.content for d in DOCS])
    p = (
        RagPipelineBuilder()
        .with_embedder(emb)
        .with_reranker(NoOpReranker())
        .with_fusion(FusionStrategy.linear(0.9))
        .build()
    )
    assert p.retriever.config.fusion.kind == "linear"
    p.index_documents(DOCS)
    assert p.query("rust", 2)


def test_query_with_context_batch():
    p = build_pipeline()
    ctxs = p.query_with_context_batch(["rust memory safety", "systolic array"], k=2)
    assert len(ctxs) == 2
    assert all(c.chunks for c in ctxs)
    assert "Rust" in ctxs[0].citation_list()


def test_citation_snippets_pick_best_matching_sentence():
    """query_with_context attaches the sentence sharing the most query
    terms to each citation; assembly without a query leaves it None."""
    from trueno_rag_tpu import Document, pipeline_builder

    pipe = pipeline_builder().build()
    pipe.index_document(Document(
        "Irrelevant opening sentence here. Systolic arrays multiply "
        "matrices efficiently. A closing remark follows.", title="doc"))
    ctx = pipe.query_with_context("systolic arrays multiply", k=1)
    assert ctx.citations
    snip = ctx.citations[0].snippet
    assert snip is not None and "Systolic arrays multiply" in snip
    assert "Irrelevant opening" not in snip
    # direct assembly without a query → no snippet
    results = pipe.query("systolic arrays", k=1)
    ctx2 = pipe.assembler.assemble(results)
    assert ctx2.citations and ctx2.citations[0].snippet is None


def test_snippet_clips_long_sentences():
    from trueno_rag_tpu.pipeline import _best_snippet

    long_sent = "word " * 100 + "needle appears here finally."
    out = _best_snippet("needle", long_sent + " Short other sentence.", max_chars=60)
    assert out is not None and len(out) <= 60
    assert _best_snippet("", "content here.") is None
    assert _best_snippet("zzz", "no match at all.") is None


TEXTS = [
    "retrieval search over dense and sparse indexes",
    "token budget context assembly for language models",
    "tensor processing units multiply large matrices",
    "document chunking with exact offsets",
]


def test_query_batch_matches_single_with_preprocessor():
    """Regression (review r3): the batch path must run the SAME
    preprocessing as the single path — switching to query_batch for
    throughput must never change rankings."""
    from trueno_rag_tpu.preprocess import KeywordExpander, MultiQueryPreprocessor

    emb = TfIdfEmbedder(32).fit(TEXTS)
    pipe = (RagPipelineBuilder().with_embedder(emb)
            .with_reranker(NoOpReranker())
            .with_preprocessor(MultiQueryPreprocessor(KeywordExpander()))
            .build())
    pipe.index_documents([Document(t) for t in TEXTS])
    qs = ["retrieval search", "token budget"]
    single = [[r.chunk.id for r in pipe.query(q, 3)] for q in qs]
    batch = [[r.chunk.id for r in b] for b in pipe.query_batch(qs, 3)]
    assert batch == single


def test_index_documents_rejects_flat_tag_strings():
    """Regression (review r3): ['news', 'sports'] must fail closed —
    iterating the string would register per-CHARACTER tags."""
    from trueno_rag_tpu.errors import InvalidConfigError

    emb = TfIdfEmbedder(16).fit(TEXTS)
    pipe = (RagPipelineBuilder().with_embedder(emb)
            .with_reranker(NoOpReranker()).build())
    with pytest.raises(InvalidConfigError):
        pipe.index_documents([Document(TEXTS[0]), Document(TEXTS[1])],
                             tags=["news", "sports"])
    assert pipe.chunk_count == 0  # nothing half-ingested


def test_builder_does_not_mutate_caller_config():
    """Regression (review r3): with_fusion must not rewrite the fusion
    of a HybridRetrieverConfig the caller still holds."""
    from trueno_rag_tpu.fusion import FusionStrategy
    from trueno_rag_tpu.retrieve import HybridRetrieverConfig

    cfg = HybridRetrieverConfig(fusion=FusionStrategy.linear(0.5))
    emb = TfIdfEmbedder(16).fit(TEXTS)
    (RagPipelineBuilder().with_embedder(emb).with_reranker(NoOpReranker())
     .with_retriever_config(cfg).with_fusion(FusionStrategy.rrf()).build())
    assert cfg.fusion.kind == "linear"


def test_chunk_ids_differ_across_fork():
    """Regression (review r3): the pre-drawn randomness buffer must
    reset in forked children or parallel ingest workers emit identical
    'random' chunk ids."""
    import os as _os

    if not hasattr(_os, "fork"):
        pytest.skip("no fork on this platform")
    from trueno_rag_tpu.chunking import new_chunk_id

    new_chunk_id()  # fill the parent's buffer
    r, w = _os.pipe()
    pid = _os.fork()
    if pid == 0:  # child
        _os.write(w, new_chunk_id().encode())
        _os._exit(0)
    _os.waitpid(pid, 0)
    child_id = _os.read(r, 64).decode()
    _os.close(r); _os.close(w)
    parent_id = new_chunk_id()
    assert child_id != parent_id
