"""All six chunking strategies side by side.

Mirrors the reference's examples/chunking_strategies.rs.

Run: PYTHONPATH=. python examples/chunking_strategies.py
"""

from trueno_rag_tpu import (
    Document,
    FixedSizeChunker,
    MockEmbedder,
    ParagraphChunker,
    RecursiveChunker,
    SemanticChunker,
    SentenceChunker,
    StructuralChunker,
)

TEXT = """# Retrieval Systems

Retrieval systems find relevant documents. They index text ahead of time.
Queries are matched against the index.

## Dense Retrieval

Dense retrieval uses embeddings. Similar meanings land near each other.
Cosine similarity ranks the matches.

## Sparse Retrieval

Sparse retrieval uses keywords. BM25 is the classic scoring function.
It rewards rare terms and saturates term frequency."""


def main() -> None:
    doc = Document(TEXT, title="Retrieval Systems")
    chunkers = [
        ("recursive", RecursiveChunker(chunk_size=160, overlap=20)),
        ("fixed-size", FixedSizeChunker(chunk_size=160, overlap=20)),
        ("sentence", SentenceChunker(max_sentences=2, overlap=1)),
        ("paragraph", ParagraphChunker(max_paragraphs=1)),
        ("structural", StructuralChunker(max_section_size=200)),
        ("semantic", SemanticChunker(MockEmbedder(64), similarity_threshold=0.9)),
    ]
    for name, chunker in chunkers:
        chunks = chunker.chunk(doc)
        print(f"\n=== {name}: {len(chunks)} chunks (est {chunker.estimate_chunks(doc)}) ===")
        for c in chunks[:3]:
            headers = f" headers={c.metadata.headers}" if c.metadata.headers else ""
            print(f"  [{c.start_offset:4d}:{c.end_offset:4d}]{headers} {c.content[:60]!r}")
        if len(chunks) > 3:
            print(f"  ... {len(chunks) - 3} more")


if __name__ == "__main__":
    main()
