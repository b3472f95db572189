"""Compressed index persistence round-trip.

Mirrors the reference's examples/compressed_index.rs (bincode+LZ4/ZSTD
there; msgpack+zstd/lz4/zlib here, and the dense matrix persists too —
the reference defers VectorStore persistence, compressed.rs:9-10).

Run: PYTHONPATH=. python examples/compressed_index.py
"""

import os
import tempfile

from trueno_rag_tpu import Document, HybridRetriever, RecursiveChunker, TfIdfEmbedder
from trueno_rag_tpu.persist import Compression, load_index, save_index

DOCS = [
    Document("BM25 ranks by term frequency and inverse document frequency.", title="BM25"),
    Document("Dense vectors capture semantics beyond exact keyword overlap.", title="Dense"),
    Document("Compression shrinks persisted indexes for faster cold starts.", title="Zstd"),
] * 5  # repeat so compression has something to chew on


def main() -> None:
    embedder = TfIdfEmbedder(64).fit([d.content for d in DOCS])
    retriever = HybridRetriever(embedder)
    chunker = RecursiveChunker(chunk_size=256, overlap=16)
    for doc in DOCS:
        chunks = chunker.chunk(doc)
        embedder.embed_chunks(chunks)
        retriever.index_batch(chunks)

    with tempfile.TemporaryDirectory() as tmp:
        codecs = [Compression.ZSTD, Compression.ZLIB]
        if Compression.LZ4.is_available:
            codecs.append(Compression.LZ4)
        for codec in codecs:
            path = os.path.join(tmp, f"index-{codec.value}.trag")
            stats = save_index(path, retriever, codec=codec)
            ratio = stats["raw_bytes_estimate"] / max(stats["compressed_bytes"], 1)
            print(
                f"{codec.value}: {stats['chunks']} chunks, "
                f"{stats['compressed_bytes']} bytes (~{ratio:.1f}x vs raw estimate)"
            )

        path = os.path.join(tmp, "index-zstd.trag")
        restored, _ = load_index(path, embedder)
        before = retriever.retrieve("term frequency ranking", 3)
        after = restored.retrieve("term frequency ranking", 3)
        assert [r.chunk.content for r in before] == [r.chunk.content for r in after]
        assert abs(before[0].best_score() - after[0].best_score()) < 1e-5
        print("round-trip scores preserved ✓")


if __name__ == "__main__":
    main()
