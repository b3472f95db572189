"""Fused dense scoring + block-max Pallas kernel.

The XLA blockwise path (:func:`trueno_rag_tpu.ops.dense.blockwise_topk`)
computes the ``[B, N]`` score matrix with one matmul, then *re-reads* it
from HBM to reduce per-128-row block maxima — at corpus scale that
second pass is pure HBM bandwidth (e.g. 100 MB re-read for B=256,
N=100k). This kernel fuses the reduction into the matmul consumer:

    grid step i:  scores_tile = Q @ M[i·T:(i+1)·T].T      (MXU, fp32)
                  scores_out[i] = masked tile             (HBM write)
                  blockmax_out[i] = max over 128-row blocks (VPU, free)

so the score matrix is written once and never re-read for selection;
only the ≤k selected blocks per query are gathered afterwards.

Same exactness contract as the jnp path: fp32 accumulation
(``preferred_element_type`` + HIGHEST precision), invalid rows masked to
``-inf``, (score desc, row asc) ordering.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu import works everywhere; Mosaic lowering only on TPU
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = pltpu is not None
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

NEG_INF = float("-inf")
BLOCK = 128  # selection granularity (rows per block-max lane)


def pallas_available() -> bool:
    return _HAS_PLTPU and jax.default_backend() not in ("cpu",)


def _score_blockmax_kernel(q_ref, m_ref, valid_ref, scores_ref, bmax_ref):
    """One corpus tile: scores = q @ m_tile.T, masked; block maxima."""
    s = jax.lax.dot_general(
        q_ref[:],
        m_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, TILE_N]
    s = jnp.where(valid_ref[:][None, :], s, NEG_INF)
    scores_ref[:] = s
    b, tile_n = s.shape
    # blockmax emitted transposed [G_tile, B]: Mosaic requires the last
    # block dim divisible by 128 or equal to the full array dim; B is the
    # full dim, while tile_n//BLOCK (e.g. 16) would violate it.
    bmax_ref[:] = jnp.max(s.reshape(b, tile_n // BLOCK, BLOCK), axis=2).T


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def score_blockmax(
    queries: jax.Array,  # [B, d] f32 (pre-normalized for cosine)
    matrix: jax.Array,  # [N, d] f32, N % tile_n == 0
    valid_mask: jax.Array,  # [N] bool
    tile_n: int = 2048,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    b, d = queries.shape
    n = matrix.shape[0]
    assert n % tile_n == 0 and tile_n % BLOCK == 0
    grid = (n // tile_n,)
    kernel = pl.pallas_call(
        _score_blockmax_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0)),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0)),
            pl.BlockSpec((tile_n,), lambda i: (i,)),
        ],
        out_specs=[
            pl.BlockSpec((b, tile_n), lambda i: (0, i)),
            pl.BlockSpec((tile_n // BLOCK, b), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n), jnp.float32),
            jax.ShapeDtypeStruct((n // BLOCK, b), jnp.float32),
        ],
        interpret=interpret,
    )
    scores, bmax_t = kernel(queries, matrix, valid_mask)
    return scores, bmax_t.T


def _blockmax_only_kernel(q_ref, m_ref, valid_ref, bmax_ref):
    """One corpus tile: block maxima of masked scores — scores are never
    written to HBM (the two-pass path recomputes selected blocks)."""
    s = jax.lax.dot_general(
        q_ref[:],
        m_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    s = jnp.where(valid_ref[:][None, :], s, NEG_INF)
    b, tile_n = s.shape
    bmax_ref[:] = jnp.max(s.reshape(b, tile_n // BLOCK, BLOCK), axis=2).T


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def blockmax_only(
    queries: jax.Array,
    matrix: jax.Array,
    valid_mask: jax.Array,
    tile_n: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """[B, d] x [N, d] → block maxima [B, N/128] with no score output."""
    b, d = queries.shape
    n = matrix.shape[0]
    assert n % tile_n == 0 and tile_n % BLOCK == 0
    kernel = pl.pallas_call(
        _blockmax_only_kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0)),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0)),
            pl.BlockSpec((tile_n,), lambda i: (i,)),
        ],
        out_specs=pl.BlockSpec((tile_n // BLOCK, b), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n // BLOCK, b), jnp.float32),
        interpret=interpret,
    )
    return kernel(queries, matrix, valid_mask).T


@functools.partial(jax.jit, static_argnames=("k", "metric", "tile_n", "interpret"))
def pallas_dense_topk_twopass(
    queries: jax.Array,
    matrix: jax.Array,
    valid_mask: jax.Array,
    k: int,
    metric: str = "cosine",
    tile_n: int = 2048,
    interpret: bool = False,
):
    """Two-pass exact top-k for LARGE corpora: pass A computes only the
    per-128-row block maxima (Pallas, no [B, N] score tensor in HBM);
    pass B re-scores just the ≤k selected blocks per query.

    HBM traffic is O(matrix + B·k·128·d) instead of O(matrix + 2·B·N).
    MEASURED (v5e, B=256): slower than the one-pass blockwise path at
    1M (58 vs 32 ms) and 2.5M (82 vs 40 ms) — the small per-grid-step
    matmuls and vmapped block slices cost more than the score-tensor
    round-trip they avoid, so `dense_topk` (blockwise) remains the
    default. Kept as a parity-tested alternative: its traffic advantage
    grows linearly with N/B and the kernel is the starting point for a
    fully-fused selection kernel.
    """
    if metric == "cosine":
        qn = jnp.linalg.norm(queries, axis=-1, keepdims=True)
        queries = queries / jnp.where(qn == 0.0, 1.0, qn)
    elif metric != "dot":
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(f"twopass supports cosine/dot, got {metric!r}")
    b, d = queries.shape
    n = matrix.shape[0]
    b_pad = max(8, -(-b // 8) * 8)
    n_128 = -(-n // BLOCK) * BLOCK
    tile_cap = max(8 * BLOCK, (2 * 1024 * 1024 // (4 * b_pad)) // BLOCK * BLOCK)
    tile = min(tile_n, tile_cap)
    tile = tile if n_128 >= tile else max(n_128, 8 * BLOCK)
    n_pad = -(-n // tile) * tile
    if b_pad != b:
        queries = jnp.pad(queries, ((0, b_pad - b), (0, 0)))
    if n_pad != n:
        matrix = jnp.pad(matrix, ((0, n_pad - n), (0, 0)))
        valid_mask = jnp.pad(valid_mask, (0, n_pad - n))

    bmax = blockmax_only(queries, matrix, valid_mask, tile_n=tile, interpret=interpret)
    g = n_pad // BLOCK
    nb = min(k, g)
    _, bidx = jax.lax.top_k(bmax, nb)  # [B, nb]
    bidx = jax.lax.sort(bidx, dimension=1)  # row-asc tie order

    # pass B: re-score only the selected blocks (contiguous slices)
    def per_query(q, blocks):
        def one_block(bi):
            rows_blk = jax.lax.dynamic_slice(matrix, (bi * BLOCK, 0), (BLOCK, d))
            v_blk = jax.lax.dynamic_slice(valid_mask, (bi * BLOCK,), (BLOCK,))
            s = jnp.dot(rows_blk, q, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            return jnp.where(v_blk, s, NEG_INF)

        return jax.vmap(one_block)(blocks).reshape(nb * BLOCK)

    cand = jax.vmap(per_query)(queries, bidx)  # [B, nb*128]
    k_eff = min(k, nb * BLOCK)
    top_scores, flat_idx = jax.lax.top_k(cand, k_eff)
    blk = jnp.take_along_axis(bidx, flat_idx // BLOCK, axis=1)
    rows = (blk * BLOCK + flat_idx % BLOCK).astype(jnp.int32)
    rows = jnp.where(jnp.isneginf(top_scores), -1, rows)
    if k_eff < k:
        top_scores = jnp.pad(top_scores, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
        rows = jnp.pad(rows, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return top_scores[:b], rows[:b]


def _select_from_blockmax(
    scores: jax.Array, bmax: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Blockwise selection given precomputed block maxima (the tail of
    ops.dense.blockwise_topk, minus the re-reduction)."""
    b, n = scores.shape
    g = n // BLOCK
    nb = min(k, g)
    _, bidx = jax.lax.top_k(bmax, nb)
    bidx = jax.lax.sort(bidx, dimension=1)  # global-row tie order
    sb = scores.reshape(b, g, BLOCK)
    cand = jnp.take_along_axis(sb, bidx[:, :, None], axis=1).reshape(b, nb * BLOCK)
    k_eff = min(k, nb * BLOCK)
    top_scores, flat_idx = jax.lax.top_k(cand, k_eff)
    blk = jnp.take_along_axis(bidx, flat_idx // BLOCK, axis=1)
    rows = (blk * BLOCK + flat_idx % BLOCK).astype(jnp.int32)
    rows = jnp.where(jnp.isneginf(top_scores), -1, rows)
    if k_eff < k:
        top_scores = jnp.pad(top_scores, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
        rows = jnp.pad(rows, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return top_scores, rows


@functools.partial(jax.jit, static_argnames=("k", "metric", "tile_n", "interpret"))
def pallas_dense_topk(
    queries: jax.Array,
    matrix: jax.Array,
    valid_mask: jax.Array,
    k: int,
    metric: str = "cosine",
    tile_n: int = 2048,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in twin of :func:`trueno_rag_tpu.ops.dense.dense_topk`
    (cosine/dot metrics) with the scoring + block-max pass fused in
    Pallas. Pads (B, N) to kernel-friendly shapes internally."""
    if metric == "cosine":
        qn = jnp.linalg.norm(queries, axis=-1, keepdims=True)
        queries = queries / jnp.where(qn == 0.0, 1.0, qn)
    elif metric != "dot":
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(f"pallas_dense_topk supports cosine/dot, got {metric!r}")

    b, d = queries.shape
    n = matrix.shape[0]
    b_pad = max(8, -(-b // 8) * 8)
    n_128 = -(-n // BLOCK) * BLOCK
    # VMEM budget: the scores block is [B, tile] f32 and Mosaic double-
    # buffers it; cap tile so B*tile*4 stays ~<=2 MB. Mosaic also needs
    # the blockmax block's second-to-last dim (tile/128) >= 8, so tile
    # has a hard floor of 1024; beyond B~1024 the caller should slice
    # the batch instead.
    tile_cap = max(8 * BLOCK, (2 * 1024 * 1024 // (4 * b_pad)) // BLOCK * BLOCK)
    tile = min(tile_n, tile_cap)
    tile = tile if n_128 >= tile else max(n_128, 8 * BLOCK)
    n_pad = -(-n // tile) * tile
    if b_pad != b:
        queries = jnp.pad(queries, ((0, b_pad - b), (0, 0)))
    if n_pad != n:
        matrix = jnp.pad(matrix, ((0, n_pad - n), (0, 0)))
        valid_mask = jnp.pad(valid_mask, (0, n_pad - n))

    scores, bmax = score_blockmax(queries, matrix, valid_mask, tile_n=tile, interpret=interpret)
    top_scores, rows = _select_from_blockmax(scores, bmax, k)
    return top_scores[:b], rows[:b]
