"""Fused MaxSim scan kernel: the bf16 tier's bound pass as ONE Pallas
program whose interaction tensor never leaves VMEM.

The XLA tier (ops/maxsim.maxsim_topk_scan16) streams the bf16 token
replica through `maxsim_block_scores`, which materializes a
``[B, Lq, block, Lt]`` f32 interaction tensor in HBM every block — the
scan runs at ~100 GB/s effective instead of the device's ~540+ GB/s
streaming rate (measured 2026-08-19 at 100k×32×128). This kernel keeps
the whole interaction local: per ``tile_n``-chunk corpus tile, an
unrolled loop over the ``Lt`` document-token positions issues
``[B·Lq, H] × [H, tile_n]`` MXU dots (bf16 in, f32 accumulate) with a
running masked max held in VMEM, then one selection matmul folds the
``Lq`` per-query-token maxima into ``[B, tile_n]`` scores — the only
HBM write per tile.

Exactness: the kernel quantizes BOTH sides to bf16 (the MXU's native
input), so its scores differ from the XLA tier's (f32 query × upcast
tokens, HIGHEST). That is fine for the TIER — the certificate only
needs a sound interval around the primary-storage exact score — but the
bound must carry query-side residual terms the XLA tier does not need.
:func:`maxsim_scan16_query_prep` in ops/maxsim.py derives them; the
per-chunk width is

    W(b, c) = C1_b · e_max_c  +  (A_b + κ·(C1_b + Q_b)) · n_max_c

with ``A = Σᵢ‖qᵢ − bf16(qᵢ)‖`` (query quantization, rides the token
norm bound ``n_max``), ``C1 = Σᵢ‖bf16(qᵢ)‖`` (carries the token
residual ``e_max`` and this kernel's own f32 rounding), ``Q = Σᵢ‖qᵢ‖``
(carries the exact-scan oracle program's rounding) and
``κ = (H + Lq)·2⁻²³`` the shared dot+sum accumulation budget of either
program. Every coefficient is widened against its own f32 evaluation;
reference brute-force semantics as everywhere (index.rs:386-412).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = float("-inf")


def _maxsim_scan16_kernel(
    q_ref,  # [B·Lq, H] bf16 — b-major flat query tokens, padding zeroed
    tok_ref,  # [tile_n, Lt, H] bf16 — token replica tile
    tm_ref,  # [tile_n, Lt] int32 — 1 = valid document token
    valid_ref,  # [tile_n] int32 — 1 = live chunk
    out_ref,  # [B, tile_n] f32 — per-chunk bf16 MaxSim scores
    *,
    b: int,
    lq: int,
):
    """One corpus tile: Lt MXU dots with a running masked max (the
    interaction stays in VMEM), then the Lq-sum as a 0/1 selection
    matmul (a lane-axis reshape+reduce lowers poorly at Lq < 128;
    adding exact zeros is error-free, so the f32 rounding budget stays
    the Lq-term model the bound carries)."""
    lt = tok_ref.shape[1]
    tile_n = tok_ref.shape[0]
    q = q_ref[:]
    run = jnp.full((b * lq, tile_n), NEG_INF, dtype=jnp.float32)
    for j in range(lt):
        s = jax.lax.dot_general(
            q,
            tok_ref[:, j, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B·Lq, tile_n]
        run = jnp.maximum(
            run, jnp.where(tm_ref[:, j][None, :] != 0, s, NEG_INF)
        )
    # empty chunks (no valid token) contribute 0, like the XLA path;
    # zeroed padding query tokens max to exactly 0 over valid tokens
    best = jnp.where(jnp.isfinite(run), run, 0.0)
    row = jax.lax.broadcasted_iota(jnp.int32, (b, b * lq), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, b * lq), 1)
    sel = (col // lq == row).astype(jnp.float32)  # [B, B·Lq]
    scores = jax.lax.dot_general(
        sel,
        best,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, tile_n]
    out_ref[:, :] = jnp.where(valid_ref[:][None, :] != 0, scores, NEG_INF)


def _maxsim_scan_int8_kernel(
    q_ref,  # [B·Lq, H] int8 — b-major flat query tokens (padding all-0)
    tq_ref,  # [B·Lq] f32 — per-query-token symmetric scales
    tok_ref,  # [tile_n, Lt, H] int8 — token replica tile
    s_ref,  # [tile_n, Lt] f32 — per-doc-token symmetric scales
    tm_ref,  # [tile_n, Lt] int32 — 1 = valid document token
    valid_ref,  # [tile_n] int32 — 1 = live chunk
    out_ref,  # [B, tile_n] f32
    *,
    b: int,
    lq: int,
    use_int8_mxu: bool,
):
    """int8 sibling of :func:`_maxsim_scan16_kernel`: the integer dot is
    EXACT (int32 accumulate, |dot| < 2²⁴ asserted by the wrapper), so
    the only kernel-side rounding is the two dequant multiplies and the
    Lq-sum — the same error model as the XLA int8 tier
    (ops/maxsim.maxsim_topk_int8), whose bound transfers unchanged."""
    lt = tok_ref.shape[1]
    tile_n = tok_ref.shape[0]
    tq = tq_ref[:]
    run = jnp.full((b * lq, tile_n), NEG_INF, dtype=jnp.float32)
    for j in range(lt):
        if use_int8_mxu:
            dots = jax.lax.dot_general(
                q_ref[:],
                tok_ref[:, j, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            dots = jax.lax.dot_general(
                q_ref[:].astype(jnp.bfloat16),
                tok_ref[:, j, :].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # bit-identical: int8 exact in bf16, sums < 2²⁴ in f32
        sim = dots * tq[:, None] * s_ref[:, j][None, :]
        run = jnp.maximum(
            run, jnp.where(tm_ref[:, j][None, :] != 0, sim, NEG_INF)
        )
    best = jnp.where(jnp.isfinite(run), run, 0.0)
    row = jax.lax.broadcasted_iota(jnp.int32, (b, b * lq), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, b * lq), 1)
    sel = (col // lq == row).astype(jnp.float32)
    scores = jax.lax.dot_general(
        sel,
        best,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:, :] = jnp.where(valid_ref[:][None, :] != 0, scores, NEG_INF)


def _pick_tile_n(lt: int, h: int, bl: int, elem_bytes: int) -> int:
    """Largest power-of-two tile (×128) whose VMEM footprint fits: the
    token tile (elem_bytes·Lt·H B/chunk) + two live [B·Lq, tile_n] f32
    sims, budgeted ~10 MB of the 16 MB scoped stack."""
    budget = 10 * 2**20
    tile = 4096
    while tile > 128 and tile * (elem_bytes * lt * h + 8 * bl) > budget:
        tile //= 2
    return max(tile, 128)


@functools.partial(
    jax.jit, static_argnames=("tile_n", "interpret")
)
def maxsim_scan16_scores(
    q16: jax.Array,  # [B, Lq, H] bf16 (padding tokens zeroed)
    tok16: jax.Array,  # [N, Lt, H] bf16 replica (prepare_maxsim_scan16)
    t_mask: jax.Array,  # [N, Lt] bool
    valid: jax.Array,  # [N] bool
    tile_n: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Fused bf16 MaxSim of every query against every chunk →
    ``[B, N]`` f32 (``-inf`` at invalid chunks). ``tile_n = 0`` sizes
    the corpus tile to the VMEM budget automatically."""
    b, lq, h = q16.shape
    n, lt = t_mask.shape
    if tile_n <= 0:
        tile_n = _pick_tile_n(lt, h, b * lq, 2)
    g = max(-(-n // tile_n), 1)
    pad = g * tile_n - n
    tok_p, tm_p, v_p = tok16, t_mask, valid
    if pad:
        tok_p = jnp.pad(tok16, ((0, pad), (0, 0), (0, 0)))
        tm_p = jnp.pad(t_mask, ((0, pad), (0, 0)))
        v_p = jnp.pad(valid, ((0, pad),))
    qf = q16.reshape(b * lq, h)
    kernel = pl.pallas_call(
        functools.partial(_maxsim_scan16_kernel, b=b, lq=lq),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((b * lq, h), lambda i: (0, 0)),
            pl.BlockSpec((tile_n, lt, h), lambda i: (i, 0, 0)),
            pl.BlockSpec((tile_n, lt), lambda i: (i, 0)),
            pl.BlockSpec((tile_n,), lambda i: (i,)),
        ],
        out_specs=pl.BlockSpec((b, tile_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b, g * tile_n), jnp.float32),
        interpret=interpret,
    )
    s = kernel(qf, tok_p, tm_p.astype(jnp.int32), v_p.astype(jnp.int32))
    return s[:, :n] if pad else s


@functools.partial(
    jax.jit, static_argnames=("tile_n", "use_int8_mxu", "interpret")
)
def maxsim_scan_int8_scores(
    q8: jax.Array,  # [B, Lq, H] int8 (padding tokens all-zero)
    t_q: jax.Array,  # [B, Lq] f32 per-query-token scales
    tok8: jax.Array,  # [N, Lt, H] int8 replica (prepare_maxsim_int8)
    s_tok: jax.Array,  # [N, Lt] f32 per-doc-token scales
    t_mask: jax.Array,  # [N, Lt] bool
    valid: jax.Array,  # [N] bool
    tile_n: int = 0,
    use_int8_mxu: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Fused int8 MaxSim of every query against every chunk →
    ``[B, N]`` f32 (``-inf`` at invalid chunks). The integer dot is
    exact; scores equal the XLA int8 tier's up to f32 multiply/sum
    rounding, which its bound already budgets."""
    b, lq, h = q8.shape
    n, lt = t_mask.shape
    assert h * 127 * 127 < 2**24, "int dot must stay exactly representable"
    if tile_n <= 0:
        tile_n = _pick_tile_n(lt, h, b * lq, 1)
    g = max(-(-n // tile_n), 1)
    pad = g * tile_n - n
    tok_p, s_p, tm_p, v_p = tok8, s_tok, t_mask, valid
    if pad:
        tok_p = jnp.pad(tok8, ((0, pad), (0, 0), (0, 0)))
        s_p = jnp.pad(s_tok, ((0, pad), (0, 0)), constant_values=1.0)
        tm_p = jnp.pad(t_mask, ((0, pad), (0, 0)))
        v_p = jnp.pad(valid, ((0, pad),))
    kernel = pl.pallas_call(
        functools.partial(
            _maxsim_scan_int8_kernel, b=b, lq=lq, use_int8_mxu=use_int8_mxu
        ),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((b * lq, h), lambda i: (0, 0)),
            pl.BlockSpec((b * lq,), lambda i: (0,)),
            pl.BlockSpec((tile_n, lt, h), lambda i: (i, 0, 0)),
            pl.BlockSpec((tile_n, lt), lambda i: (i, 0)),
            pl.BlockSpec((tile_n, lt), lambda i: (i, 0)),
            pl.BlockSpec((tile_n,), lambda i: (i,)),
        ],
        out_specs=pl.BlockSpec((b, tile_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b, g * tile_n), jnp.float32),
        interpret=interpret,
    )
    s = kernel(
        q8.reshape(b * lq, h),
        t_q.reshape(b * lq),
        tok_p,
        s_p,
        tm_p.astype(jnp.int32),
        v_p.astype(jnp.int32),
    )
    return s[:, :n] if pad else s
