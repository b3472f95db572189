"""End-to-end integration tier (reference: tests/integration.rs —
build→index→query→context with relevance assertions integration.rs:12-60,
all-fusion smoke :89-117, citation formatting :119-143, large-doc
chunking bounds :154-176) plus the device fleet-metrics evaluator
pinned to the host oracle."""

import numpy as np
import pytest

from trueno_rag_tpu import (
    AssemblyStrategy,
    ContextAssemblerConfig,
    Document,
    FusionStrategy,
    LexicalReranker,
    MockCrossEncoderReranker,
    RagPipelineBuilder,
    RecursiveChunker,
    TfIdfEmbedder,
)

LIBRARY = [
    Document(
        "Photosynthesis converts light energy into chemical energy in plants. "
        "Chlorophyll absorbs photons and drives the Calvin cycle.",
        title="Photosynthesis",
    ),
    Document(
        "The French Revolution began in 1789 and reshaped European politics. "
        "The storming of the Bastille became its enduring symbol.",
        title="French Revolution",
    ),
    Document(
        "Gradient descent minimizes a loss function by stepping against the "
        "gradient. Learning rates control the step size.",
        title="Gradient Descent",
    ),
    Document(
        "Plate tectonics explains earthquakes and mountain formation through "
        "the slow movement of lithospheric plates.",
        title="Plate Tectonics",
    ),
]


def build(fusion=None, reranker=None):
    emb = TfIdfEmbedder(96).fit([d.content for d in LIBRARY])
    builder = (
        RagPipelineBuilder()
        .with_embedder(emb)
        .with_reranker(reranker or LexicalReranker())
        .with_chunker(RecursiveChunker(chunk_size=200, overlap=24))
    )
    if fusion:
        builder = builder.with_fusion(fusion)
    p = builder.build()
    p.index_documents(LIBRARY)
    return p


def test_end_to_end_relevance():
    p = build()
    cases = [
        ("how do plants capture light", "Photosynthesis"),
        ("storming of the Bastille in 1789", "French Revolution"),
        ("minimizing a loss with steps", "Gradient Descent"),
        ("why do earthquakes happen", "Plate Tectonics"),
    ]
    for query, expected_title in cases:
        results = p.query(query, k=2)
        assert results, query
        assert results[0].chunk.metadata.title == expected_title, query


def test_all_fusion_strategies_end_to_end():
    for fusion in [
        FusionStrategy.rrf(),
        FusionStrategy.linear(0.7),
        FusionStrategy.convex(0.4),
        FusionStrategy.dbsf(),
        FusionStrategy.union(),
        FusionStrategy.intersection(),
    ]:
        p = build(fusion=fusion)
        results = p.query("plants light energy", k=3)
        assert isinstance(results, list), fusion.kind
        if fusion.kind != "intersection":
            assert results, fusion.kind


def test_citation_formatting_end_to_end():
    p = build()
    ctx = p.query_with_context("chlorophyll and the Calvin cycle", k=2)
    text = ctx.format_with_citations()
    listing = ctx.citation_list()
    assert "[1]" in text
    assert listing.splitlines()[0].startswith("[1] ")
    assert "Photosynthesis" in listing
    # citation ids are sequential starting at 1
    assert [c.id for c in ctx.citations] == list(range(1, len(ctx.citations) + 1))
    # every context chunk's citation id refers to a real citation
    ids = {c.id for c in ctx.citations}
    assert all(cc.citation_id in ids for cc in ctx.chunks)


def test_large_document_chunking_bounds():
    big = Document(("sentence number %d. " * 50 + "\n\n") % tuple(range(50)) * 20, title="Big")
    emb = TfIdfEmbedder(64).fit([big.content])
    p = (
        RagPipelineBuilder()
        .with_embedder(emb)
        .with_reranker(MockCrossEncoderReranker())
        .with_chunker(RecursiveChunker(chunk_size=256, overlap=32))
        .build()
    )
    n = p.index_document(big)
    assert n > 10
    for cid in p.retriever.registry.ids():
        chunk = p.retriever.registry.get_chunk(cid)
        assert len(chunk.content) <= 256 + 32
    results = p.query("sentence number", k=5)
    assert len(results) == 5


def test_assembly_strategies_end_to_end():
    p = build()
    for strategy in AssemblyStrategy.ALL:
        p.assembler.config = ContextAssemblerConfig(strategy=strategy, max_tokens=4096)
        ctx = p.query_with_context("energy movement politics", k=4)
        assert ctx.chunks


def test_device_metrics_match_host_oracle():
    from trueno_rag_tpu.metrics import RetrievalMetrics
    from trueno_rag_tpu.ops.metrics import batched_metrics, pad_ids

    rng = np.random.default_rng(3)
    queries = []
    for _ in range(32):
        retrieved = rng.choice(50, size=rng.integers(0, 12), replace=False).tolist()
        relevant = rng.choice(50, size=rng.integers(0, 6), replace=False).tolist()
        queries.append((retrieved, relevant))

    dev = batched_metrics(
        pad_ids([r for r, _ in queries], 12),
        pad_ids([rel for _, rel in queries], 6),
        k_values=(1, 5, 10),
    )
    for qi, (retrieved, relevant) in enumerate(queries):
        host = RetrievalMetrics.compute(
            [str(x) for x in retrieved], [str(x) for x in relevant], k_values=[1, 5, 10]
        )
        for k in (1, 5, 10):
            assert float(dev[f"recall@{k}"][qi]) == pytest.approx(host.recall[k], abs=1e-6), (qi, k)
            assert float(dev[f"precision@{k}"][qi]) == pytest.approx(host.precision[k], abs=1e-6)
            assert float(dev[f"ndcg@{k}"][qi]) == pytest.approx(host.ndcg[k], abs=1e-5)
        assert float(dev["mrr"][qi]) == pytest.approx(host.mrr, abs=1e-6)
        assert float(dev["map"][qi]) == pytest.approx(host.map, abs=1e-6)
