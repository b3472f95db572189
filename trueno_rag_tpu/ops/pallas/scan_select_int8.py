"""Fused int8 scan + block top-4 selection kernel.

The int8 sibling of :mod:`trueno_rag_tpu.ops.pallas.scan_select`: stream
an int8-quantized corpus once, compute EXACTLY-dequantized approximate
scores, and emit per-128-row-block top-5 upper values + top-4 argmax
lanes without materializing the [B, N] score tensor.

Arithmetic error model (why the caller's bound needs almost nothing
beyond the measured quantization residual):

- the integer dot ``m_i8 · q_i8`` is EXACT: |sum| ≤ d·127² (6.2M at
  d=384) < 2²⁴, so it is exactly representable even after the f32 cast;
- only the two scale multiplies ``dot · s_i · t_q`` round (~2⁻²⁴
  relative each), folded into the caller's ``v_q`` coefficient;
- the dominant gap vs the true fp32 score is the quantization residual,
  bounded rank-1 by the caller (e_l2·u_q + a_l2·v_q, measured pack-time
  / query-time norms; scales are amax/127, the tightest symmetric
  choice).

The matmul itself runs either natively in int8 (``use_int8_mxu=True``,
2x the bf16 MXU rate on v5e+) or as a bf16 matmul after an in-kernel
cast (integers ≤ 127 are exact in bf16 and partial sums stay < 2²⁴, so
the result is bit-identical). d must satisfy d·127² < 2²⁴ (d ≤ 1040)
for the exactness argument; the wrapper asserts it.

Reference semantics target: index.rs:386-412 exact brute force — this
kernel only ever *proposes* candidates; exactness is certified by the
tail in ops/dense_tiered.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from trueno_rag_tpu.ops.pallas.scan_select import BLOCK, TOP

NEG_INF = float("-inf")


def _kernel(q_ref, m_ref, sr_ref, el2_ref, al2_ref, valid_ref, tq_ref,
            uq_ref, vq_ref, *out_refs, use_int8_mxu: bool, top: int):
    """One corpus tile, transposed ([rows, queries]) like scan_select."""
    if use_int8_mxu:
        dot = jax.lax.dot_general(
            m_ref[:],
            q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # exact: |dot| < 2^24
    else:
        dot = jax.lax.dot_general(
            m_ref[:].astype(jnp.bfloat16),
            q_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # bit-identical: int8 values exact in bf16, sums < 2^24 in f32
    # dequantization: tightest symmetric (amax/127) scales; the two f32
    # scale multiplies round (~2^-24 rel), covered by the v_q arith term
    upper = dot * sr_ref[:][:, None] * tq_ref[:][None, :]
    upper = upper + el2_ref[:][:, None] * uq_ref[:][None, :]
    upper = upper + al2_ref[:][:, None] * vq_ref[:][None, :]
    upper = jnp.where(valid_ref[:][:, None] != 0, upper, NEG_INF)
    tile, b = upper.shape
    g = tile // BLOCK
    x = upper.reshape(g, BLOCK, b)
    lane = jax.lax.broadcasted_iota(jnp.int32, (g, BLOCK, b), 1)
    for t in range(top + 1):
        v = jnp.max(x, axis=1)  # [g, B]
        out_refs[t][:] = v
        if t < top:
            amax = jnp.max(jnp.where(x == v[:, None, :], lane, -1), axis=1)
            out_refs[top + 1 + t][:] = amax
            x = jnp.where(lane == amax[:, None, :], NEG_INF, x)


@functools.partial(jax.jit, static_argnames=("tile_n", "use_int8_mxu", "top", "interpret"))
def scan_select_int8(
    q_i8: jax.Array,  # [B, d] int8 (quantized, symmetric amax/127 scale t_q)
    m_i8: jax.Array,  # [N, d] int8, N % tile_n == 0
    s_row: jax.Array,  # [N] f32 — tightest symmetric (amax/127) row scales
    e_l2: jax.Array,  # [N] f32 — ‖row − s_i·row_i8‖₂
    a_l2: jax.Array,  # [N] f32 — ‖s_i·row_i8‖₂
    valid_i32: jax.Array,  # [N] int32 (0/1)
    t_q: jax.Array,  # [B] f32 — tightest symmetric (amax/127) query scales
    u_q: jax.Array,  # [B] f32 — bound coefficient on e_l2
    v_q: jax.Array,  # [B] f32 — bound coefficient on a_l2
    tile_n: int = 1024,
    use_int8_mxu: bool = True,
    top: int = TOP,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """→ (v1..v_{top+1} [B, G] f32, i1..i_top [B, G] int32), G = N/128."""
    b, d = q_i8.shape
    n = m_i8.shape[0]
    assert n % tile_n == 0 and tile_n % BLOCK == 0
    assert d * 127 * 127 < 2**24, "int dot must stay exactly representable"
    g_tile = tile_n // BLOCK
    grid = (n // tile_n,)
    out_specs = [pl.BlockSpec((g_tile, b), lambda i: (i, 0)) for _ in range(2 * top + 1)]
    out_shape = [jax.ShapeDtypeStruct((n // BLOCK, b), jnp.float32) for _ in range(top + 1)]
    out_shape += [jax.ShapeDtypeStruct((n // BLOCK, b), jnp.int32) for _ in range(top)]
    kernel = pl.pallas_call(
        functools.partial(_kernel, use_int8_mxu=use_int8_mxu, top=top),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0)),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0)),
            pl.BlockSpec((tile_n,), lambda i: (i,)),
            pl.BlockSpec((tile_n,), lambda i: (i,)),
            pl.BlockSpec((tile_n,), lambda i: (i,)),
            pl.BlockSpec((tile_n,), lambda i: (i,)),
            pl.BlockSpec((b,), lambda i: (0,)),
            pl.BlockSpec((b,), lambda i: (0,)),
            pl.BlockSpec((b,), lambda i: (0,)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )
    outs = kernel(q_i8, m_i8, s_row, e_l2, a_l2, valid_i32, t_q, u_q, v_q)
    return tuple(o.T for o in outs)
