"""The fused hybrid query program: encode → score → fuse in one jit.

BASELINE.json's north star is "embed→retrieve→fuse→rerank as one jitted
XLA program". :class:`~trueno_rag_tpu.retrieve.HybridRetriever` composes
its stages as separate jitted calls (fine for host embedders like
TF-IDF, whose query vectors are born on the host); this module provides
the fully fused program for JAX encoders: query *token ids* go in,
fused candidate ``(rows, scores)`` come out, with no host round-trips
in between — XLA schedules the encoder matmuls, corpus scan, BM25
block gather + segment-sum and fusion sort as one executable.

The lexical rerankers are host string code by nature; the neural
cross-encoder reranker is itself a single jitted program over the fused
candidates, so a neural end-to-end query costs exactly two device
dispatches.

BM25 rides the block-gather layout (``ops.bm25.bm25_topk_blocks``,
precomputed contributions fetched with one wide row-gather); the
``*_segments`` variants keep the dynamic-slice path for corpora past
the f32-exact row range (>= 2**24 rows).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from trueno_rag_tpu.models.encoder import EncoderConfig, encoder_forward
from trueno_rag_tpu.ops.bm25 import bm25_topk_blocks, bm25_topk_segments
from trueno_rag_tpu.ops.dense import blockwise_topk, similarity_scores, NEG_INF
from trueno_rag_tpu.ops.fusion import fuse_topk


@functools.partial(
    jax.jit,
    static_argnames=("cand", "metric", "fusion_kind", "fusion_param"),
)
def hybrid_query_arrays(
    qvecs: jax.Array,  # [B, d] query vectors (any embedder)
    matrix: jax.Array,
    valid_mask: jax.Array,
    block_ids: jax.Array,  # [B, S] BM25 block slots
    block_lo: jax.Array,  # [B, S]
    block_hi: jax.Array,  # [B, S]
    blocks: jax.Array,  # [NB, 2, BLOCK_LEN] precomputed-contribution table
    cand: int = 50,
    metric: str = "cosine",
    fusion_kind: str = "rrf",
    fusion_param: float = 60.0,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Single-dispatch hybrid candidates for host-embedded queries:
    dense top-c + BM25 top-c + fusion in ONE jitted program (three
    separate dispatches otherwise each pay the device round-trip).
    Returns (f_rows, f_scores, d_rows, d_scores, s_rows, s_scores) so
    the caller can attach per-source scores."""
    scores = similarity_scores(qvecs, matrix, metric)
    masked = jnp.where(valid_mask[None, :], scores, NEG_INF)
    d_scores, d_rows = blockwise_topk(masked, cand)
    d_rows = jnp.where(jnp.isneginf(d_scores), -1, d_rows)
    s_scores, s_rows = bm25_topk_blocks(block_ids, block_lo, block_hi, blocks, k=cand)
    f_rows, f_scores = fuse_topk(
        d_rows, d_scores, s_rows, s_scores, kind=fusion_kind, param=fusion_param
    )
    return f_rows, f_scores, d_rows, d_scores, s_rows, s_scores


@functools.partial(
    jax.jit,
    static_argnames=("cand", "metric", "fusion_kind", "fusion_param",
                     "fusion_weights"),
)
def tri_query_arrays(
    qvecs: jax.Array,  # [B, d] query vectors (any embedder)
    matrix: jax.Array,
    valid_mask: jax.Array,
    block_ids: jax.Array,  # [B, S] BM25 block slots
    block_lo: jax.Array,  # [B, S]
    block_hi: jax.Array,  # [B, S]
    blocks: jax.Array,  # [NB, 2, BLOCK_LEN] BM25 contribution table
    l_block_ids: jax.Array,  # [B, Sl] learned-sparse block slots
    l_lo: jax.Array,  # [B, Sl]
    l_hi: jax.Array,  # [B, Sl]
    l_qw: jax.Array,  # [B, Sl] per-slot query expansion weights
    l_blocks: jax.Array,  # [NBl, 2, BLOCK_LEN] learned weight table
    cand: int = 50,
    metric: str = "cosine",
    fusion_kind: str = "rrf",
    fusion_param: float = 60.0,
    fusion_weights: Tuple[float, ...] = (),
) -> Tuple[jax.Array, ...]:
    """Single-dispatch TRI-hybrid candidates: dense top-c + BM25 top-c
    + learned-sparse top-c + one N-way fusion in ONE jitted program —
    the tri extension of :func:`hybrid_query_arrays` (three staged
    dispatches otherwise each pay the device round-trip; over the
    tunneled dev chip that's milliseconds per stage). Returns
    ``(f_rows, f_scores, d_rows, d_scores, s_rows, s_scores, l_rows,
    l_scores)`` so the caller can attach per-source scores."""
    from trueno_rag_tpu.ops.bm25 import weighted_topk_blocks
    from trueno_rag_tpu.ops.fusion import fuse_topk_many

    scores = similarity_scores(qvecs, matrix, metric)
    masked = jnp.where(valid_mask[None, :], scores, NEG_INF)
    d_scores, d_rows = blockwise_topk(masked, cand)
    d_rows = jnp.where(jnp.isneginf(d_scores), -1, d_rows)
    s_scores, s_rows = bm25_topk_blocks(block_ids, block_lo, block_hi, blocks, k=cand)
    l_scores, l_rows = weighted_topk_blocks(
        l_block_ids, l_lo, l_hi, l_qw, l_blocks, k=cand
    )
    f_rows, f_scores = fuse_topk_many(
        (d_rows, s_rows, l_rows), (d_scores, s_scores, l_scores),
        kind=fusion_kind, param=fusion_param, weights=fusion_weights,
    )
    return (f_rows, f_scores, d_rows, d_scores, s_rows, s_scores,
            l_rows, l_scores)


@functools.partial(
    jax.jit,
    static_argnames=("cand", "metric", "fusion_kind", "fusion_param", "k1", "b"),
)
def hybrid_query_arrays_segments(
    qvecs: jax.Array,  # [B, d] query vectors (any embedder)
    matrix: jax.Array,
    valid_mask: jax.Array,
    seg_starts: jax.Array,
    seg_lens: jax.Array,
    packed: jax.Array,
    avgdl: jax.Array,
    cand: int = 50,
    metric: str = "cosine",
    fusion_kind: str = "rrf",
    fusion_param: float = 60.0,
    k1: float = 1.2,
    b: float = 0.75,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Segment-path variant of :func:`hybrid_query_arrays` for corpora
    whose row ids exceed the f32-exact block-table range."""
    scores = similarity_scores(qvecs, matrix, metric)
    masked = jnp.where(valid_mask[None, :], scores, NEG_INF)
    d_scores, d_rows = blockwise_topk(masked, cand)
    d_rows = jnp.where(jnp.isneginf(d_scores), -1, d_rows)
    s_scores, s_rows = bm25_topk_segments(
        seg_starts, seg_lens, packed, avgdl, k=cand, k1=k1, b=b
    )
    f_rows, f_scores = fuse_topk(
        d_rows, d_scores, s_rows, s_scores, kind=fusion_kind, param=fusion_param
    )
    return f_rows, f_scores, d_rows, d_scores, s_rows, s_scores


@functools.partial(
    jax.jit,
    static_argnames=("encoder_config", "cand", "k", "metric", "fusion_kind", "fusion_param"),
)
def fused_hybrid_query(
    encoder_params,
    token_ids: jax.Array,  # [B, T] query token ids
    matrix: jax.Array,  # [N, d] corpus (cosine rows pre-normalized)
    valid_mask: jax.Array,  # [N]
    block_ids: jax.Array,  # [B, S] BM25 block slots
    block_lo: jax.Array,  # [B, S]
    block_hi: jax.Array,  # [B, S]
    blocks: jax.Array,  # [NB, 2, BLOCK_LEN] precomputed-contribution table
    encoder_config: EncoderConfig,
    cand: int = 50,
    k: int = 10,
    metric: str = "cosine",
    fusion_kind: str = "rrf",
    fusion_param: float = 60.0,
):
    """One XLA program: encoder forward + dense top-c + BM25 top-c +
    fusion + final top-k. Returns ``(f_rows [B,k], f_scores [B,k],
    d_rows, d_scores, s_rows, s_scores)`` so callers can attach
    per-source scores like the staged path."""
    q = encoder_forward(encoder_params, token_ids, encoder_config)  # [B, d] f32
    f_rows, f_scores, d_rows, d_scores, s_rows, s_scores = hybrid_query_arrays(
        q, matrix, valid_mask, block_ids, block_lo, block_hi, blocks,
        cand=cand, metric=metric, fusion_kind=fusion_kind,
        fusion_param=fusion_param,
    )
    return f_rows[:, :k], f_scores[:, :k], d_rows, d_scores, s_rows, s_scores


@functools.partial(
    jax.jit,
    static_argnames=("encoder_config", "cand", "k", "metric", "fusion_kind",
                     "fusion_param", "tile_n", "interpret"),
)
def fused_hybrid_query_compact(
    encoder_params,
    token_ids: jax.Array,  # [B, T] query token ids
    m_bf16: jax.Array,  # [N, d] bf16 compact replica (prepare_tiered)
    e_l2: jax.Array,  # [N] f32
    a_l2: jax.Array,  # [N] f32
    r_i8: jax.Array,  # [N, d] int8 residual (prepare_residual)
    r_scale: jax.Array,  # [N] f32
    e2_l2: jax.Array,  # [N] f32
    valid_mask: jax.Array,  # [N]
    block_ids: jax.Array,  # [B, S] BM25 block slots
    block_lo: jax.Array,  # [B, S]
    block_hi: jax.Array,  # [B, S]
    blocks: jax.Array,  # [NB, 2, BLOCK_LEN]
    encoder_config: EncoderConfig,
    cand: int = 50,
    k: int = 10,
    metric: str = "cosine",
    fusion_kind: str = "rrf",
    fusion_param: float = 60.0,
    tile_n: int = 4096,
    interpret: bool = False,
):
    """The one-XLA-program flagship at COMPACT scale: encoder forward +
    certified compact scan (no fp32 matrix in HBM — the 10M-on-one-chip
    configuration) + BM25 + fusion + top-k, one dispatch.

    Returns ``(f_rows [B,k], f_scores [B,k], d_rows, d_scores, s_rows,
    s_scores, ok [B], cand_rows [B,W], thr [B], qvecs [B,d])`` — the
    last four feed the r4 exact patch: ``ok`` flags queries whose dense
    SET the interval certificate proved; the candidate rows + tile
    threshold let the host settle the rest exactly (containment) and
    re-fuse those queries with the host fusion oracle; ``qvecs`` are
    the encoder outputs so the patch needs no second forward
    (HybridRetriever.retrieve_batch_fused wires all of this)."""
    from trueno_rag_tpu.ops.dense_tiered import dense_topk_compact_bf16r

    q = encoder_forward(encoder_params, token_ids, encoder_config)  # [B, d]
    d_scores, d_rows, ok, cand_rows, thr = dense_topk_compact_bf16r(
        q, m_bf16, e_l2, a_l2, r_i8, r_scale, e2_l2, valid_mask, cand,
        metric=metric, tile_n=tile_n, interpret=interpret,
        return_candidates=True,
    )
    s_scores, s_rows = bm25_topk_blocks(block_ids, block_lo, block_hi, blocks, k=cand)
    f_rows, f_scores = fuse_topk(
        d_rows, d_scores, s_rows, s_scores, kind=fusion_kind, param=fusion_param
    )
    return (f_rows[:, :k], f_scores[:, :k], d_rows, d_scores, s_rows,
            s_scores, ok, cand_rows, thr, q)
