"""Batched IR metrics on device.

The host :mod:`trueno_rag_tpu.metrics` is the per-query oracle; this
module evaluates a whole query fleet in one jitted program — the shape
you want when sweeping fusion strategies over thousands of eval queries
(the `metrics_evaluation` benchmark config).

Inputs are padded integer id matrices: ``retrieved [Q, K]`` (row ids,
-1 = empty slot, already deduplicated by the retriever contract) and
``relevant [Q, R]`` (-1 padded). Outputs are per-query metric vectors;
means over axis 0 give the aggregate.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k_values",))
def batched_metrics(
    retrieved: jax.Array,  # [Q, K] int32, -1 padded
    relevant: jax.Array,  # [Q, R] int32, -1 padded
    k_values: Sequence[int] = (1, 5, 10),
) -> Dict[str, jax.Array]:
    """recall@k / precision@k / NDCG@k / MRR / MAP for every query."""
    q, kk = retrieved.shape

    valid_ret = retrieved >= 0  # [Q, K]
    valid_rel = relevant >= 0  # [Q, R]
    n_rel = jnp.sum(valid_rel, axis=1)  # [Q]

    # hit[i, j] = retrieved[i, j] ∈ relevant[i]
    match = (retrieved[:, :, None] == relevant[:, None, :]) & valid_rel[:, None, :]
    hit = jnp.any(match, axis=2) & valid_ret  # [Q, K]

    ranks = jnp.arange(kk)[None, :]
    hits_cum = jnp.cumsum(hit, axis=1)  # hits within top-(j+1)

    out: Dict[str, jax.Array] = {}
    safe_rel = jnp.maximum(n_rel, 1)
    for k in k_values:
        k_idx = min(k, kk) - 1
        hits_at_k = hits_cum[:, k_idx] if k > 0 else jnp.zeros((q,), hits_cum.dtype)
        out[f"recall@{k}"] = jnp.where(n_rel > 0, hits_at_k / safe_rel, 0.0)
        out[f"precision@{k}"] = hits_at_k / k if k > 0 else jnp.zeros((q,))
        # binary NDCG@k
        in_k = ranks < k
        dcg = jnp.sum(jnp.where(hit & in_k, 1.0 / jnp.log2(ranks + 2.0), 0.0), axis=1)
        ideal_hits = jnp.minimum(n_rel, k)
        ideal_mask = ranks < ideal_hits[:, None]
        idcg = jnp.sum(jnp.where(ideal_mask, 1.0 / jnp.log2(ranks + 2.0), 0.0), axis=1)
        out[f"ndcg@{k}"] = jnp.where(idcg > 0, dcg / idcg, 0.0)
        out[f"hit_rate@{k}"] = jnp.where(
            n_rel > 0, (hits_at_k > 0).astype(jnp.float32), 0.0
        )
        p = out[f"precision@{k}"]
        r = out[f"recall@{k}"]
        out[f"f1@{k}"] = jnp.where(p + r > 0, 2 * p * r / jnp.maximum(p + r, 1e-9), 0.0)

    # MRR: 1 / (first hit rank + 1)
    first_hit = jnp.argmax(hit, axis=1)
    any_hit = jnp.any(hit, axis=1)
    out["mrr"] = jnp.where(any_hit, 1.0 / (first_hit + 1.0), 0.0)
    # MAP: mean of precision-at-hit over relevant count
    prec_at = hits_cum / (ranks + 1.0)
    ap = jnp.sum(jnp.where(hit, prec_at, 0.0), axis=1) / safe_rel
    out["map"] = jnp.where(n_rel > 0, ap, 0.0)
    return out


def pad_ids(id_lists, width: int, mapper=None) -> jnp.ndarray:
    """Host helper: list of id lists → padded int32 matrix (-1 fill).
    ``mapper`` converts external ids (e.g. chunk id strings) to rows."""
    import numpy as np

    out = np.full((len(id_lists), width), -1, dtype=np.int32)
    for i, ids in enumerate(id_lists):
        vals = [mapper(x) if mapper else x for x in ids][:width]
        out[i, : len(vals)] = vals
    return jnp.asarray(out)
