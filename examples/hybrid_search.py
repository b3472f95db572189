"""Hybrid dense+BM25 retrieval — the BASELINE.json `hybrid_search` config.

Mirrors the reference's examples/hybrid_search.rs: BM25 + dense
retrieval fused with RRF(k=60), per-source score inspection, and a
comparison across fusion strategies.

Run: PYTHONPATH=. python examples/hybrid_search.py
"""

from trueno_rag_tpu import (
    Document,
    FusionStrategy,
    LexicalReranker,
    RagPipelineBuilder,
    RecursiveChunker,
    TfIdfEmbedder,
)

DOCS = [
    Document(
        "Okapi BM25 ranks documents using term frequency saturation and "
        "inverse document frequency over an inverted index.",
        title="BM25",
    ),
    Document(
        "Dense retrieval embeds queries and passages into a shared vector "
        "space and ranks by cosine similarity.",
        title="Dense",
    ),
    Document(
        "Reciprocal rank fusion combines multiple rankings by summing "
        "1/(k + rank) across lists, rewarding agreement.",
        title="RRF",
    ),
    Document(
        "Exact keyword match matters for rare identifiers like ZX81 or "
        "error codes, where embeddings often fail.",
        title="Keywords",
    ),
]


def main() -> None:
    embedder = TfIdfEmbedder(128).fit([d.content for d in DOCS])

    for fusion in [
        FusionStrategy.rrf(60.0),
        FusionStrategy.linear(0.5),
        FusionStrategy.dbsf(),
        FusionStrategy.union(),
        FusionStrategy.intersection(),
    ]:
        pipeline = (
            RagPipelineBuilder()
            .with_embedder(embedder)
            .with_reranker(LexicalReranker())
            .with_chunker(RecursiveChunker(chunk_size=256, overlap=32))
            .with_fusion(fusion)
            .build()
        )
        pipeline.index_documents(DOCS)
        results = pipeline.query("how does rank fusion combine lists", k=3)
        top = ", ".join(r.chunk.metadata.title or "?" for r in results)
        print(f"{fusion.kind:<13s} -> {top}")

    # per-source scores on the hybrid path
    pipeline = (
        RagPipelineBuilder()
        .with_embedder(embedder)
        .with_reranker(LexicalReranker())
        .build()
    )
    pipeline.index_documents(DOCS)
    print("\nper-source scores for 'rare keyword ZX81':")
    for r in pipeline.query("rare keyword ZX81", k=3):
        print(
            f"  {r.chunk.metadata.title:<9s} dense={r.dense_score} "
            f"sparse={r.sparse_score} fused={r.fused_score} rerank={r.rerank_score:.3f}"
        )


if __name__ == "__main__":
    main()
