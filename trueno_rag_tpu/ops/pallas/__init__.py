"""Hand-written Pallas TPU kernels for the hot retrieval ops.

Each kernel has a jnp twin in :mod:`trueno_rag_tpu.ops` that serves as
its correctness oracle (tests assert exact agreement) and as the
fallback on platforms without Mosaic.
"""

from trueno_rag_tpu.ops.pallas.dense_score import pallas_available, pallas_dense_topk

__all__ = ["pallas_dense_topk", "pallas_available"]
