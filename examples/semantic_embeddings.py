"""Neural query encoding on device — the BASELINE.json
`semantic_embeddings` config: MiniLM-class 384-d encoder + LexicalReranker.

Mirrors the reference's examples/semantic_embeddings.rs (fastembed ONNX
models there; a real JAX forward pass here — no model download needed,
weights initialize deterministically; load a checkpoint for production
quality).

Run: PYTHONPATH=. python examples/semantic_embeddings.py
"""

from trueno_rag_tpu import Document, LexicalReranker, RagPipelineBuilder, RecursiveChunker
from trueno_rag_tpu.models import EncoderConfig, JaxEncoderEmbedder

DOCS = [
    Document(
        "The borrow checker in Rust prevents data races at compile time.",
        title="Rust",
    ),
    Document(
        "JAX traces Python functions and compiles them with XLA for TPUs.",
        title="JAX",
    ),
    Document(
        "BM25 is a bag-of-words ranking function for sparse retrieval.",
        title="BM25",
    ),
]


def main() -> None:
    embedder = JaxEncoderEmbedder(config=EncoderConfig.minilm_l6())
    print(f"encoder: {embedder.model_id}, {embedder.dimension}-d")

    pipeline = (
        RagPipelineBuilder()
        .with_embedder(embedder)
        .with_reranker(LexicalReranker())
        .with_chunker(RecursiveChunker(chunk_size=256, overlap=32))
        .build()
    )
    pipeline.index_documents(DOCS)
    for query in ["compile python for accelerators", "sparse ranking function"]:
        results = pipeline.query(query, k=2)
        print(f"\n{query!r}:")
        for r in results:
            print(f"  [{r.best_score():.4f}] {r.chunk.metadata.title}: {r.chunk.content[:60]}")


if __name__ == "__main__":
    main()
