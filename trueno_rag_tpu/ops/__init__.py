"""Device-side numeric ops: the XLA/Pallas compute path.

Everything in this package is shape-static, jittable and batched:

- :mod:`trueno_rag_tpu.ops.dense` — dense similarity scoring + top-k over
  an HBM-resident ``[N, d]`` embedding matrix (the reference's
  brute-force ``VectorStore::search``, index.rs:386-412, recast as one
  MXU matmul per query batch).
- :mod:`trueno_rag_tpu.ops.bm25` — BM25 scoring over a device-resident
  CSR postings store (the reference's HashMap inverted index,
  index.rs:30-280, recast as gather + scatter-add).
- :mod:`trueno_rag_tpu.ops.fusion` — the six rank-fusion strategies over
  padded top-k candidate arrays (fusion.rs:39-224).
- :mod:`trueno_rag_tpu.ops.rerank` — on-device rerank scoring over fused
  candidates.
- :mod:`trueno_rag_tpu.ops.pallas` — hand-written TPU kernels for the
  hot paths, with the jnp implementations kept as correctness oracles.

Conventions: candidate lists are fixed-width arrays ``(rows, scores)``
where ``rows`` is int32 (``-1`` = invalid slot) and invalid slots carry
``-inf`` scores; ties sort deterministically (score desc, then row asc).
"""

from trueno_rag_tpu.ops.dense import dense_topk, similarity_scores

__all__ = ["dense_topk", "similarity_scores"]
