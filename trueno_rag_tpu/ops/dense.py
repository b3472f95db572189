"""Dense retrieval ops: batched similarity scoring + exact top-k.

TPU-native replacement for the reference's brute-force scan over a
``HashMap<ChunkId, Vec<f32>>`` (reference: index.rs:386-412, scalar loop
per stored vector). Here the corpus is one HBM-resident ``[N, d]``
matrix; a query batch ``[B, d]`` scores in a single MXU matmul and
``lax.top_k`` extracts candidates. Exactness is preserved — recall@k is
identical to the brute-force oracle by construction.

Determinism: scores accumulate in float32 (``preferred_element_type``)
and ``lax.top_k`` breaks score ties by preferring the lower row index,
giving the (score desc, row asc) total order the framework guarantees.

Padding/tombstones: callers pass a boolean ``valid_mask`` over rows;
invalid rows (capacity padding, removed chunks) are masked to ``-inf``
and reported as row ``-1``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


# Matmul precision for scoring. HIGHEST keeps fp32 MXU passes so scores —
# and therefore recall@k — match the scalar fp32 oracle; "default" lets the
# TPU use bf16 multiplicands for ~2-3x more matmul throughput at ~1e-3
# relative score error (rank-stable for well-separated corpora). The
# framework default is exactness (BASELINE.json: recall parity is the bar).
_PRECISION = jax.lax.Precision.HIGHEST


def similarity_scores(queries: jax.Array, matrix: jax.Array, metric: str = "cosine") -> jax.Array:
    """Score a query batch ``[B, d]`` against a corpus ``[N, d]`` → ``[B, N]``.

    Metrics (reference: index.rs:282-319 ``DistanceMetric``):

    - ``cosine``: assumes *stored* rows are L2-normalized by the index
      (done once at insert); queries are normalized here, so the score
      reduces to one MXU matmul.
    - ``dot``: raw inner product.
    - ``euclidean``: the *negated* L2 distance, so higher is better
      (the reference negates distances the same way, index.rs:399).
    """
    if metric == "cosine":
        qn = jnp.linalg.norm(queries, axis=-1, keepdims=True)
        q = queries / jnp.where(qn == 0.0, 1.0, qn)
        return jnp.dot(q, matrix.T, preferred_element_type=jnp.float32, precision=_PRECISION)
    if metric == "dot":
        return jnp.dot(queries, matrix.T, preferred_element_type=jnp.float32, precision=_PRECISION)
    if metric == "euclidean":
        # -sqrt(|x|^2 + |q|^2 - 2 q.x), clamped for fp error.
        sq_m = jnp.sum(matrix * matrix, axis=-1)  # [N]
        sq_q = jnp.sum(queries * queries, axis=-1, keepdims=True)  # [B,1]
        cross = jnp.dot(queries, matrix.T, preferred_element_type=jnp.float32, precision=_PRECISION)
        d2 = jnp.maximum(sq_q + sq_m[None, :] - 2.0 * cross, 0.0)
        return -jnp.sqrt(d2)
    raise ValueError(f"unknown metric: {metric!r}")


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def dense_topk(
    queries: jax.Array,
    matrix: jax.Array,
    valid_mask: jax.Array,
    k: int,
    metric: str = "cosine",
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k dense retrieval.

    Args:
      queries: ``[B, d]`` float32 query batch.
      matrix: ``[N, d]`` corpus (capacity-padded; invalid rows are zeros).
      valid_mask: ``[N]`` bool — False for padding/tombstoned rows.
      k: static candidate count (``k <= N``).
      metric: ``cosine`` | ``dot`` | ``euclidean``.

    Returns:
      ``(scores [B, k], rows [B, k])`` sorted score-desc with row-asc
      tie-break; invalid slots are ``(-inf, -1)``.
    """
    scores = similarity_scores(queries, matrix, metric)  # [B, N]
    masked = jnp.where(valid_mask[None, :], scores, NEG_INF)
    top_scores, top_rows = jax.lax.top_k(masked, k)
    top_rows = jnp.where(jnp.isneginf(top_scores), -1, top_rows).astype(jnp.int32)
    return top_scores, top_rows


def dense_topk_oracle(queries, matrix, valid_mask, k, metric="cosine"):
    """NumPy reference implementation (scalar semantics identical to the
    Rust brute-force scan, incl. cosine zero-norm → 0.0) used to assert
    device-path exactness in tests."""
    import numpy as np

    queries = np.asarray(queries, dtype=np.float32)
    matrix = np.asarray(matrix, dtype=np.float32)
    valid = np.asarray(valid_mask, dtype=bool)
    out_scores = np.full((queries.shape[0], k), NEG_INF, dtype=np.float32)
    out_rows = np.full((queries.shape[0], k), -1, dtype=np.int32)
    for bq, q in enumerate(queries):
        if metric == "cosine":
            qn = np.linalg.norm(q)
            mn = np.linalg.norm(matrix, axis=1)
            denom = np.where((qn == 0.0) | (mn == 0.0), 1.0, qn * mn)
            s = np.where((qn == 0.0) | (mn == 0.0), 0.0, matrix @ q / denom)
        elif metric == "dot":
            s = matrix @ q
        elif metric == "euclidean":
            s = -np.linalg.norm(matrix - q[None, :], axis=1)
        else:
            raise ValueError(metric)
        s = np.where(valid, s, NEG_INF)
        order = np.lexsort((np.arange(len(s)), -s))[:k]
        picked = s[order]
        keep = ~np.isneginf(picked)
        out_scores[bq, : len(order)] = picked
        out_rows[bq, : len(order)] = np.where(keep, order, -1)
    return out_scores, out_rows
