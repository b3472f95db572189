"""Tag-filtered retrieval ops: metadata filters as device bit tests.

Production RAG needs metadata filtering (tenant, language, source,
time-bucket…) inside retrieval, not as a post-hoc result trim — the
reference has no analog (SURVEY §2: no filtering anywhere). TPU-native
design: every chunk row carries a 32-bit tag mask (string tags map to
bits in :class:`trueno_rag_tpu.index.base.ChunkRegistry`'s vocabulary);
a filter is three per-query int32 masks

- ``t_all``: rows must have ALL these bits,
- ``t_any``: rows must have at least one (0 = no constraint),
- ``t_none``: rows must have NONE,

and the predicate is three VPU bit-ops fused into the score masking —
the dense scan already materializes ``[B, N]`` scores, so filtering is
effectively free, and "top-k among allowed rows" stays exact (same
contract as the unfiltered path). BM25 candidates filter after their
top-k (gather ~50 tag words per query) and before fusion, so fused
ranks are computed over the filtered list.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from trueno_rag_tpu.ops.dense import NEG_INF, blockwise_topk, similarity_scores
from trueno_rag_tpu.ops.fusion import _sort_desc, fuse_topk


def tag_pred(tag_bits: jax.Array, t_all: jax.Array, t_any: jax.Array,
             t_none: jax.Array) -> jax.Array:
    """Elementwise predicate; shapes broadcast (typically ``[N]`` bits
    vs ``[B, 1]`` masks → ``[B, N]``)."""
    ok = (tag_bits & t_all) == t_all
    ok = ok & ((t_any == 0) | ((tag_bits & t_any) != 0))
    return ok & ((tag_bits & t_none) == 0)


def tag_pred_oracle(bits: int, t_all: int, t_any: int, t_none: int) -> bool:
    """Scalar host oracle for :func:`tag_pred`."""
    if (bits & t_all) != t_all:
        return False
    if t_any != 0 and (bits & t_any) == 0:
        return False
    return (bits & t_none) == 0


@functools.partial(jax.jit, static_argnames=("k", "metric", "algorithm"))
def dense_topk_tagged(
    queries: jax.Array,  # [B, d]
    matrix: jax.Array,  # [N, d]
    valid_mask: jax.Array,  # [N] bool
    tag_bits: jax.Array,  # [N] int32
    t_all: jax.Array,  # [B] int32
    t_any: jax.Array,  # [B] int32
    t_none: jax.Array,  # [B] int32
    k: int,
    metric: str = "cosine",
    algorithm: str = "blockwise",
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k among rows passing each query's tag filter."""
    scores = similarity_scores(queries, matrix, metric)
    allowed = valid_mask[None, :] & tag_pred(
        tag_bits[None, :], t_all[:, None], t_any[:, None], t_none[:, None]
    )
    masked = jnp.where(allowed, scores, NEG_INF)
    if algorithm == "blockwise":
        top_scores, top_rows = blockwise_topk(masked, k)
    else:
        top_scores, top_rows = jax.lax.top_k(masked, k)
    top_rows = jnp.where(jnp.isneginf(top_scores), -1, top_rows).astype(jnp.int32)
    return top_scores, top_rows


@jax.jit
def filter_candidates_by_tags(
    rows: jax.Array,  # [B, K] int32, -1 padded
    scores: jax.Array,  # [B, K] f32, -inf padded
    tag_bits: jax.Array,  # [N] int32
    t_all: jax.Array,  # [B]
    t_any: jax.Array,  # [B]
    t_none: jax.Array,  # [B]
) -> Tuple[jax.Array, jax.Array]:
    """Drop candidates failing the filter, re-packed to the canonical
    (score desc, row asc, invalid-last) order so downstream rank-based
    fusion sees correct filtered ranks."""
    safe = jnp.maximum(rows, 0)
    bits = jnp.take(tag_bits, safe, axis=0)  # [B, K]
    keep = (rows >= 0) & tag_pred(bits, t_all[:, None], t_any[:, None], t_none[:, None])
    scores = jnp.where(keep, scores, NEG_INF)
    rows = jnp.where(keep, rows, -1)
    rows, scores = jax.vmap(_sort_desc)(rows, scores)
    return rows, scores


@functools.partial(
    jax.jit,
    static_argnames=("encoder_config", "cand", "k", "metric", "fusion_kind", "fusion_param"),
)
def fused_hybrid_query_tagged(
    encoder_params,
    token_ids: jax.Array,  # [B, T]
    matrix: jax.Array,
    valid_mask: jax.Array,
    tag_bits: jax.Array,
    t_all: jax.Array,
    t_any: jax.Array,
    t_none: jax.Array,
    block_ids: jax.Array,
    block_lo: jax.Array,
    block_hi: jax.Array,
    blocks: jax.Array,
    encoder_config,
    cand: int = 50,
    k: int = 10,
    metric: str = "cosine",
    fusion_kind: str = "rrf",
    fusion_param: float = 60.0,
):
    """Tag-filtered sibling of
    :func:`trueno_rag_tpu.ops.hybrid.fused_hybrid_query`: encoder
    forward + filtered dense top-c + BM25 top-c (post-filtered) +
    fusion + final top-k in ONE XLA program."""
    from trueno_rag_tpu.models.encoder import encoder_forward

    q = encoder_forward(encoder_params, token_ids, encoder_config)
    f_rows, f_scores, d_rows, d_scores, s_rows, s_scores = (
        hybrid_query_arrays_tagged(
            q, matrix, valid_mask, tag_bits, t_all, t_any, t_none,
            block_ids, block_lo, block_hi, blocks,
            cand=cand, metric=metric, fusion_kind=fusion_kind,
            fusion_param=fusion_param,
        )
    )
    return f_rows[:, :k], f_scores[:, :k], d_rows, d_scores, s_rows, s_scores


@functools.partial(
    jax.jit, static_argnames=("cand", "metric", "fusion_kind", "fusion_param")
)
def hybrid_query_arrays_tagged(
    qvecs: jax.Array,  # [B, d]
    matrix: jax.Array,
    valid_mask: jax.Array,
    tag_bits: jax.Array,  # [N] int32
    t_all: jax.Array,  # [B]
    t_any: jax.Array,  # [B]
    t_none: jax.Array,  # [B]
    block_ids: jax.Array,
    block_lo: jax.Array,
    block_hi: jax.Array,
    blocks: jax.Array,
    cand: int = 50,
    metric: str = "cosine",
    fusion_kind: str = "rrf",
    fusion_param: float = 60.0,
):
    """Tag-filtered sibling of
    :func:`trueno_rag_tpu.ops.hybrid.hybrid_query_arrays`: dense scoring
    masks disallowed rows before its top-k (exact filtered top-k); BM25
    candidates filter after theirs (candidate slots spent on disallowed
    rows are not refilled — raise ``candidates_per_source`` for heavily
    filtered corpora); fusion runs on the filtered lists."""
    from trueno_rag_tpu.ops.bm25 import bm25_topk_blocks

    d_scores, d_rows = dense_topk_tagged(
        qvecs, matrix, valid_mask, tag_bits, t_all, t_any, t_none, cand, metric
    )
    s_scores, s_rows = bm25_topk_blocks(block_ids, block_lo, block_hi, blocks, k=cand)
    s_rows, s_scores = filter_candidates_by_tags(
        s_rows, s_scores, tag_bits, t_all, t_any, t_none
    )
    f_rows, f_scores = fuse_topk(
        d_rows, d_scores, s_rows, s_scores, kind=fusion_kind, param=fusion_param
    )
    return f_rows, f_scores, d_rows, d_scores, s_rows, s_scores
