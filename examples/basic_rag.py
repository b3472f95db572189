"""Basic RAG pipeline — the BASELINE.json `basic_rag` config.

Mirrors the reference's examples/basic_rag.rs: RecursiveChunker(512,50),
MockEmbedder(384), brute-force cosine top-5, context assembly with
citations.

Run: PYTHONPATH=. python examples/basic_rag.py
"""

from trueno_rag_tpu import (
    Document,
    MockEmbedder,
    NoOpReranker,
    RagPipelineBuilder,
    RecursiveChunker,
)

DOCS = [
    Document(
        "JAX is a Python library for accelerator-oriented array computation. "
        "It provides composable transformations: grad, jit, vmap and pmap. "
        "XLA compiles JAX programs for TPUs and GPUs.",
        title="JAX",
    ),
    Document(
        "A retrieval pipeline chunks documents, embeds the chunks, and builds "
        "dense and sparse indexes. Queries retrieve the most relevant chunks.",
        title="Retrieval",
    ),
    Document(
        "Tensor processing units contain matrix multiply units fed from high "
        "bandwidth memory. Large batched matmuls reach peak utilization.",
        title="TPU",
    ),
]


def main() -> None:
    pipeline = (
        RagPipelineBuilder()
        .with_embedder(MockEmbedder(384))
        .with_reranker(NoOpReranker())
        .with_chunker(RecursiveChunker(chunk_size=512, overlap=50))
        .build()
    )
    n = pipeline.index_documents(DOCS)
    print(f"indexed {len(DOCS)} documents -> {n} chunks")

    query = "how are documents retrieved"
    results = pipeline.query(query, k=5)
    print(f"\ntop results for {query!r}:")
    for i, r in enumerate(results, 1):
        print(f"  {i}. [{r.best_score():.4f}] {r.chunk.metadata.title}")

    ctx = pipeline.query_with_context(query, k=3)
    print("\ncontext:\n" + ctx.format_with_citations())
    print("\ncitations:\n" + ctx.citation_list())


if __name__ == "__main__":
    main()
