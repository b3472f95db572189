"""Micro-benchmarks mirroring the reference's criterion suite
(reference: benches/retrieval.rs:18-133 — bm25 indexing 1000 chunks,
bm25 search top-10/100, vector search top-10/100 at N=1000 d=128,
recursive chunking of a ~28 KB doc, mock-embedding 100 texts).

Run: PYTHONPATH=. python benches/micro.py  [--json]
Device benches use dependency-chained scan timing (see bench.py).
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def timed(fn, repeats=5):
    fn()  # warmup
    t0 = time.perf_counter()
    for _ in range(repeats):
        fn()
    return (time.perf_counter() - t0) / repeats


def chain_timed(body, iters=20):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(n):
        def step(c, _):
            return body(c), None
        c, _ = jax.lax.scan(step, 0.0, None, length=n)
        return c

    float(chain(n=1))
    float(chain(n=iters))
    t0 = time.perf_counter()
    float(chain(n=iters))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", action="store_true")
    args = parser.parse_args()

    import jax.numpy as jnp

    from trueno_rag_tpu import Document, MockEmbedder, RecursiveChunker
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.index import BM25Index
    from trueno_rag_tpu.ops.dense import dense_topk

    results = {}
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(800)] + ["the", "and", "fox", "data"]
    texts = [" ".join(rng.choice(words, size=60)) for _ in range(1000)]
    chunks = [
        Chunk(document_id="d", content=t, start_offset=0, end_offset=len(t),
              metadata=ChunkMetadata(), id=chunk_id_from_int(i))
        for i, t in enumerate(texts)
    ]

    # bm25 indexing, 1000 chunks (reference: ~46 ms book figure)
    def build():
        idx = BM25Index()
        idx.add_batch(chunks)
        idx._refresh_snapshot()
        return idx

    results["bm25_index_1000_chunks_ms"] = timed(build) * 1e3
    idx = build()

    # bm25 search top-10 / top-100 (batch of 1 — reference semantics)
    for k in (10, 100):
        results[f"bm25_search_top{k}_ms"] = timed(
            lambda k=k: idx.search("fox data w1 w2", k)
        ) * 1e3

    # vector search top-10/100, N=1000, d=128 (device, chained)
    matrix = jnp.asarray(rng.standard_normal((1000, 128)).astype(np.float32))
    matrix = matrix / jnp.linalg.norm(matrix, axis=1, keepdims=True)
    valid = jnp.ones((1000,), bool)
    q = jnp.asarray(rng.standard_normal((1, 128)).astype(np.float32))
    for k in (10, 100):
        results[f"vector_search_top{k}_ms"] = chain_timed(
            lambda c, k=k: jnp.max(dense_topk(q + c, matrix, valid, k)[0]) * 1e-9
        ) * 1e3

    # recursive chunking of a ~28 KB document
    big = Document(("lorem ipsum dolor sit amet. " * 40 + "\n\n") * 25)
    chunker = RecursiveChunker(chunk_size=512, overlap=50)
    results["chunk_28kb_doc_ms"] = timed(lambda: chunker.chunk(big)) * 1e3
    results["chunk_28kb_doc_bytes"] = len(big.content)

    # mock-embedding 100 texts
    emb = MockEmbedder(384)
    results["mock_embed_100_texts_ms"] = timed(lambda: emb.embed_batch(texts[:100])) * 1e3

    if args.json:
        print(json.dumps({k: round(v, 3) for k, v in results.items()}))
    else:
        for k, v in results.items():
            print(f"{k:32s} {v:10.3f}")


if __name__ == "__main__":
    main()
