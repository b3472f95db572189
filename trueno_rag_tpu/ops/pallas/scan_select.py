"""Fused bf16 scan + block top-4 selection kernel.

The tier-1 scan of :mod:`trueno_rag_tpu.ops.dense_tiered` in one Pallas
pass: stream the bf16 corpus once, compute upper-bounded approximate
scores on the MXU, and emit per-128-row-block statistics — the top-5
upper values and the top-4 argmax lanes — WITHOUT ever materializing the
[B, N] score tensor (at N=1M, B=256 that tensor alone is 1 GB written +
re-read per batch in the XLA path).

Per (query q, row i) the kernel computes

    upper = bf16(q)·bf16(m_i) + e_l2_i·u_q + a_l2_i·v_q

where u_q/v_q fold the query-side rounding norms (see dense_tiered's
bound derivation); the caller supplies them so the kernel stays a pure
rank-1-bound evaluator. Invalid rows are masked to -inf.

Why top-4 + a 5th value: the tail selects whole blocks, but only the 4
best rows per block become rescore candidates; the 5th value is the
proof obligation — every unselected row of a selected block has upper ≤
v5, so max(v5 over selected blocks) joins the certification threshold.
Four slots make "≥5 of the true top-k in one 128-row block" the only
in-block failure mode (probability ~(k choose 5)/G⁴ — negligible even
at N=100k), where certification fails closed to the fp32 path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = float("-inf")
BLOCK = 128  # selection granularity (rows per block lane)
TOP = 4  # default candidate slots per block (+1 threshold value)


def _scan_select_kernel(q_ref, m_ref, el2_ref, al2_ref, valid_ref, uq_ref, vq_ref,
                        *out_refs, top: int):
    """One corpus tile: upper-bounded bf16 scores → per-block top-
    ``top+1`` values + top-``top`` lane indices. out_refs = v1..v_{top+1}
    ([T/128, B] f32 each) then i1..i_top ([T/128, B] int32, lane within
    the 128-row block).

    ``top`` trades in-kernel selection passes (the VPU cost that scales
    with N) against in-block collision risk: with ``top`` slots, only
    ``top+1`` of the true top-k landing in ONE 128-row block defeats
    certification (fails closed). top=2 halves the selection loop and
    is sound down to ~400k rows (collision ~0.2%/query at k=50); top=4
    is the conservative default.

    Everything runs TRANSPOSED ([rows, queries]) so per-block reductions
    go over the sublane axis and outputs write [g, B] directly — the
    [B, g] orientation needs 9 in-kernel transposes per step, which
    measured ~3x slower than the matmul itself."""
    s = jax.lax.dot_general(
        m_ref[:],
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TILE, B] — bf16 inputs, f32 accumulation, MXU-native rate
    upper = s + el2_ref[:][:, None] * uq_ref[:][None, :]
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
            # manual argmax: the max lane among value-ties (candidate
            # ordering is restored later by the row-asc sort + exact
            # rescore, so which tied lane goes first is immaterial)
            amax = jnp.max(jnp.where(x == v[:, None, :], lane, -1), axis=1)
            out_refs[top + 1 + t][:] = amax
            x = jnp.where(lane == amax[:, None, :], NEG_INF, x)


@functools.partial(jax.jit, static_argnames=("tile_n", "top", "interpret"))
def scan_select(
    q_bf16: jax.Array,  # [B, d] bf16 (pre-normalized for cosine)
    m_bf16: jax.Array,  # [N, d] bf16, N % tile_n == 0
    e_l2: jax.Array,  # [N] f32
    a_l2: jax.Array,  # [N] f32
    valid_i32: jax.Array,  # [N] int32 (0/1)
    u_q: jax.Array,  # [B] f32 — bound coefficient on e_l2
    v_q: jax.Array,  # [B] f32 — bound coefficient on a_l2
    tile_n: int = 1024,
    top: int = TOP,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """→ (v1..v_{top+1} [B, G] f32, i1..i_top [B, G] int32), G = N/128."""
    b, d = q_bf16.shape
    n = m_bf16.shape[0]
    assert n % tile_n == 0 and tile_n % BLOCK == 0
    g_tile = tile_n // BLOCK
    grid = (n // tile_n,)
    out_specs = [pl.BlockSpec((g_tile, b), lambda i: (i, 0)) for _ in range(top + 1)]
    out_specs += [pl.BlockSpec((g_tile, b), lambda i: (i, 0)) for _ in range(top)]
    out_shape = [jax.ShapeDtypeStruct((n // BLOCK, b), jnp.float32) for _ in range(top + 1)]
    out_shape += [jax.ShapeDtypeStruct((n // BLOCK, b), jnp.int32) for _ in range(top)]
    kernel = pl.pallas_call(
        functools.partial(_scan_select_kernel, top=top),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0)),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0)),
            pl.BlockSpec((tile_n,), lambda i: (i,)),
            pl.BlockSpec((tile_n,), lambda i: (i,)),
            pl.BlockSpec((tile_n,), lambda i: (i,)),
            pl.BlockSpec((b,), lambda i: (0,)),
            pl.BlockSpec((b,), lambda i: (0,)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )
    outs = kernel(q_bf16, m_bf16, e_l2, a_l2, valid_i32, u_q, v_q)
    return tuple(o.T for o in outs)
