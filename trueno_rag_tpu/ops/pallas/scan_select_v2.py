"""Streaming-select v2: fused bf16 scan emitting per-TILE candidate
ROWS directly.

The v1 kernel (scan_select.py) reduces the corpus to per-128-row-block
statistics: at N=1M that is G=7813 blocks -> nine [G, B] side arrays,
an approx_max_k over [256, 7813], and lane->row arithmetic in the tail
— measured ~10.8 ms of the 14.1 ms tiered path (VERDICT r1, the 1M
selection tail). v2 moves one selection level INTO the kernel:

1. per 128-row block: top-2 upper values + argmax lanes and the 3rd
   value v3 (the bound on that block's unseen rows) — 9 VPU passes per
   tile vs v1's 13;
2. per SEL=1024-row tile: a [2·8, B] tournament merges the 16 block
   candidates into the tile's top-T (value, GLOBAL row) pairs plus the
   (T+1)-th value;
3. emitted per tile, PACKED into two arrays (so the tail's per-tile
   take_along is two gathers, not 2T+1): ``v_pack [B, T+1, G']`` =
   candidate values 0..T-1 plus channel T = thr =
   max(max_blocks v3, (T+1)-th candidate) — a RIGOROUS upper bound on
   every row of the tile not among its T candidates; and
   ``r_pack [B, T, G']`` int32 GLOBAL row ids (no lane arithmetic in
   the tail).

With G' = N/1024 (977 at 1M) the tail's top-k and threshold passes are
8x smaller and the side arrays drop from 9·[7813, B] to (2T+1)·[977, B].

Soundness (same interval-arithmetic frame as v1, reference semantics
index.rs:386-412): every corpus row is covered by exactly one of
  - an emitted candidate (exact-rescored or bounded by the trim
    threshold downstream),
  - a row of a selected tile not among its T candidates: upper <= thr
    of that tile,
  - a row of an unselected tile: upper <= vals_0 (tile max) <= the
    selection threshold.
Failure modes (top+1 block collisions, >T tile collisions, selector
misses, boundary ties) only RAISE thresholds — certification fails
closed to the fp32 path, never certifies a wrong result.

:func:`scan_select_int8_v2` is the int8 sibling (same packed outputs,
same tournament; exactly-dequantized scores per scan_select_int8.py's
error model) — the scan half of the 10M-rows-on-one-chip compact tier.

**v3 (r3, the production default for every tile-scan tier):** the v2
kernels broadcast the 1-D per-row ``e_l2``/``a_l2`` arrays across the
batch axis — each such broadcast is a LANE RELAYOUT on TPU, and the
two together cost 5.7 ms of the 22.9 ms marginal scan at 10.5M,
independent of batch size. :func:`scan_select_v3` (and the
``_indirect`` / ``int8`` siblings) select per-block top-2 by the raw
masked score and add the bound terms at per-BLOCK granularity
(``max_block(e_l2)·u + max_block(a_l2)·v``, carried in tiny
``[steps, 8, g]`` side arrays): every emitted value and threshold
remains a rigorous per-row upper bound (the block max dominates each
row's own term, u/v >= 0), just looser by the within-block el2/al2
spread — measured certification parity at 1M/10.5M random, and the
scan drops to ~15 ms (10.5M hybrid 34.5 -> 24.1 ms/batch). The
soundness pin lives in
tests/test_tiered_v2.py::test_scan_select_v3_packed_outputs_are_rigorous_upper_bounds.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = float("-inf")
BLOCK = 128  # inner block (argmax granularity)
SEL = 1024  # selection tile (rows per emitted candidate set)
TILE_T = 8  # default candidate rows kept per selection tile


def _tile_tournament(upper, base, t_top, v_ref, r_ref):
    """Steps 1-3 shared by the bf16 and int8 tile kernels: per-block
    top-2 (+ v3 bound on unseen rows), per-SEL-tile tournament over the
    2·(SEL/BLOCK) block candidates, packed emission.

    ``upper [tile_n, B]`` is the rigorous per-row upper bound (already
    -inf-masked for invalid rows); ``base`` is the tile's first global
    row. Writes ``v_ref [1, n_sel, T+1, B]`` (candidate values +
    channel T = thr) and ``r_ref [1, n_sel, T, B]`` (GLOBAL rows)."""
    tile, b = upper.shape
    n_sel = tile // SEL
    g = tile // BLOCK

    # -- per-block top-2 (+ v3 = bound on the block's unseen rows) -------
    x = upper.reshape(g, BLOCK, b)
    lane = jax.lax.broadcasted_iota(jnp.int32, (g, BLOCK, b), 1)
    blk_row0 = jax.lax.broadcasted_iota(jnp.int32, (g, b), 0) * BLOCK + base
    cand_v, cand_r = [], []
    for _ in range(2):
        v = jnp.max(x, axis=1)  # [g, B]
        amax = jnp.max(jnp.where(x == v[:, None, :], lane, -1), axis=1)
        cand_v.append(v)
        cand_r.append(blk_row0 + amax)  # global rows
        x = jnp.where(lane == amax[:, None, :], NEG_INF, x)
    v3 = jnp.max(x, axis=1)  # [g, B]

    # -- per-tile tournament over the 16 block candidates ----------------
    bpt = SEL // BLOCK  # blocks per selection tile (8)
    # [n_sel, 2*bpt, B]: the tile's candidate pool
    pool_v = jnp.concatenate(
        [cand_v[0].reshape(n_sel, bpt, b), cand_v[1].reshape(n_sel, bpt, b)], axis=1
    )
    pool_r = jnp.concatenate(
        [cand_r[0].reshape(n_sel, bpt, b), cand_r[1].reshape(n_sel, bpt, b)], axis=1
    )
    slot = jax.lax.broadcasted_iota(jnp.int32, (n_sel, 2 * bpt, b), 1)
    for t in range(t_top):
        v = jnp.max(pool_v, axis=1)  # [n_sel, B]
        smax = jnp.max(jnp.where(pool_v == v[:, None, :], slot, -1), axis=1)
        r = jnp.max(jnp.where(slot == smax[:, None, :], pool_r, -1), axis=1)
        # PACKED outputs: values+threshold share one array, rows another,
        # so the tail's per-tile take_along is TWO gathers, not 2T+1 —
        # each [B, kb]-from-[B, G'] gather measured ~0.25 ms of pure
        # latency at 1M (t2gath: 4.3 ms for 17 of them)
        v_ref[0, :, t, :] = v
        r_ref[0, :, t, :] = r
        pool_v = jnp.where(slot == smax[:, None, :], NEG_INF, pool_v)
    thr_pool = jnp.max(pool_v, axis=1)  # (T+1)-th candidate value
    thr_blocks = jnp.max(v3.reshape(n_sel, bpt, b), axis=1)
    v_ref[0, :, t_top, :] = jnp.maximum(thr_pool, thr_blocks)


def _apply_tags(upper, tags_ref, tall_ref, tany_ref, tnone_ref):
    """Mask ``upper [tile_n, B]`` to -inf where the tile's rows fail the
    per-query tag predicate (semantics of ops/tags.py::tag_pred).
    Masking happens BEFORE selection, so the certificate downstream
    proves the exact top-k set AMONG ALLOWED ROWS (the filtered-search
    contract).

    Applied as three sequential wheres rather than one fused boolean so
    at most ONE [tile_n, B] int32 temporary is live at a time — the
    fused form overflowed the 16 MB scoped-VMEM stack by ~1.5 MB at
    tile_n=4096, B=256 (three bit-op intermediates live at once)."""
    t = tags_ref[:][:, None]
    t_all = tall_ref[:][None, :]
    upper = jnp.where((t & t_all) == t_all, upper, NEG_INF)
    t_any = tany_ref[:][None, :]
    upper = jnp.where((t_any == 0) | ((t & t_any) != 0), upper, NEG_INF)
    return jnp.where((t & tnone_ref[:][None, :]) == 0, upper, NEG_INF)


def _scan_select_v2_kernel(
    q_ref, m_ref, el2_ref, al2_ref, valid_ref, uq_ref, vq_ref,
    *rest, t_top: int, tile_n: int, has_tags: bool,
):
    """One corpus tile of ``tile_n`` rows = ``tile_n // SEL`` selection
    tiles. out_refs = (v_pack [1, S, T+1, B] f32, r_pack [1, S, T, B]
    int32 GLOBAL rows). With ``has_tags``, four extra refs precede the
    outputs (tags [tile_n] i32; t_all/t_any/t_none [B] i32) and
    disallowed (row, query) pairs mask to -inf before selection.

    Transposed layout ([rows, queries]) throughout — reductions run on
    the sublane axis and outputs write [S, B] directly (the [B, S]
    orientation needs in-kernel transposes, measured ~3x slower than
    the matmul in v1's development).

    ``m_ref`` may be bf16 (the replica layout, 2 B/elem extra HBM) or
    f32 (the inline-cast layout: ONE fp32 array serves scan and exact
    rescore — the cast to bf16 happens here in VMEM, trading scan
    stream bytes for 2 B/elem of storage). Both produce bit-identical
    scores: the in-kernel astype is the same round-to-nearest-even as
    prepare_tiered's."""
    tag_refs, out_refs = (rest[:4], rest[4:]) if has_tags else ((), rest)
    m = m_ref[:]
    if m.dtype != jnp.bfloat16:
        m = m.astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        m,
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tile_n, B] — bf16 in, f32 accumulation on the MXU
    upper = s + el2_ref[:][:, None] * uq_ref[:][None, :]
    upper = upper + al2_ref[:][:, None] * vq_ref[:][None, :]
    upper = jnp.where(valid_ref[:][:, None] != 0, upper, NEG_INF)
    if has_tags:
        upper = _apply_tags(upper, *tag_refs)
    v_ref, r_ref = out_refs
    _tile_tournament(upper, pl.program_id(0) * tile_n, t_top, v_ref, r_ref)


def _scan_select_int8_v2_kernel(
    q_ref, m_ref, sr_ref, el2_ref, al2_ref, valid_ref, tq_ref, uq_ref,
    vq_ref, *rest, t_top: int, tile_n: int, use_int8_mxu: bool,
    has_tags: bool,
):
    """int8 sibling: exactly-dequantized approximate scores (the integer
    dot is EXACT for d·127² < 2²⁴ — see scan_select_int8.py's error
    model) + the same rank-1 bound, then the shared tile tournament."""
    tag_refs, out_refs = (rest[:4], rest[4:]) if has_tags else ((), rest)
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
    upper = dot * sr_ref[:][:, None] * tq_ref[:][None, :]
    upper = upper + el2_ref[:][:, None] * uq_ref[:][None, :]
    upper = upper + al2_ref[:][:, None] * vq_ref[:][None, :]
    upper = jnp.where(valid_ref[:][:, None] != 0, upper, NEG_INF)
    if has_tags:
        upper = _apply_tags(upper, *tag_refs)
    v_ref, r_ref = out_refs
    _tile_tournament(upper, pl.program_id(0) * tile_n, t_top, v_ref, r_ref)


@functools.partial(jax.jit, static_argnames=("tile_n", "t_top", "interpret"))
def scan_select_v2(
    q_bf16: jax.Array,  # [B, d] bf16 (pre-normalized for cosine)
    m_bf16: jax.Array,  # [N, d] bf16 — or f32 for the inline-cast
    #   layout (cast to bf16 in VMEM; bit-identical scores, no replica)
    e_l2: jax.Array,  # [N] f32
    a_l2: jax.Array,  # [N] f32
    valid_i32: jax.Array,  # [N] int32 (0/1)
    u_q: jax.Array,  # [B] f32 — bound coefficient on e_l2
    v_q: jax.Array,  # [B] f32 — bound coefficient on a_l2
    tile_n: int = 2048,
    t_top: int = TILE_T,
    interpret: bool = False,
    tags: Tuple[jax.Array, ...] | None = None,
) -> Tuple[jax.Array, ...]:
    """→ (v_pack [B, T+1, G'] f32 — values + thr channel, r_pack
    [B, T, G'] int32 global rows), G' = N / SEL.

    ``tags`` = (tag_bits [N] i32, t_all [B] i32, t_any [B] i32,
    t_none [B] i32) masks disallowed (row, query) pairs to -inf BEFORE
    selection, making the emitted candidates/thresholds an exact
    filtered search (ops/tags.py predicate semantics)."""
    b, d = q_bf16.shape
    n = m_bf16.shape[0]
    assert n % tile_n == 0 and tile_n % SEL == 0
    s_tile = tile_n // SEL
    n_sel = n // SEL
    steps = n // tile_n
    grid = (steps,)
    out_specs = [
        pl.BlockSpec((1, s_tile, t_top + 1, b), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, s_tile, t_top, b), lambda i: (i, 0, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((steps, s_tile, t_top + 1, b), jnp.float32),
        jax.ShapeDtypeStruct((steps, s_tile, t_top, b), jnp.int32),
    ]
    in_specs = [
        pl.BlockSpec((b, d), lambda i: (0, 0)),
        pl.BlockSpec((tile_n, d), lambda i: (i, 0)),
        pl.BlockSpec((tile_n,), lambda i: (i,)),
        pl.BlockSpec((tile_n,), lambda i: (i,)),
        pl.BlockSpec((tile_n,), lambda i: (i,)),
        pl.BlockSpec((b,), lambda i: (0,)),
        pl.BlockSpec((b,), lambda i: (0,)),
    ]
    args = [q_bf16, m_bf16, e_l2, a_l2, valid_i32, u_q, v_q]
    if tags is not None:
        in_specs += [
            pl.BlockSpec((tile_n,), lambda i: (i,)),
            pl.BlockSpec((b,), lambda i: (0,)),
            pl.BlockSpec((b,), lambda i: (0,)),
            pl.BlockSpec((b,), lambda i: (0,)),
        ]
        args += list(tags)
    kernel = pl.pallas_call(
        functools.partial(_scan_select_v2_kernel, t_top=t_top, tile_n=tile_n,
                          has_tags=tags is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )
    v_pack, r_pack = kernel(*args)
    # [steps, s_tile, C, B] -> [B, C, G']
    v_pack = v_pack.reshape(n_sel, t_top + 1, b).transpose(2, 1, 0)
    r_pack = r_pack.reshape(n_sel, t_top, b).transpose(2, 1, 0)
    return v_pack, r_pack


def _tile_tournament_blockcorr(s_masked, corr_g, base, t_top, v_ref, r_ref):
    """v3 tournament: per-block top-2 selected by the RAW (masked)
    score, with the bound correction applied at BLOCK granularity —
    ``corr_g [g, B] >= el2_row·u + al2_row·v`` for every row of the
    block (a per-block max of nonnegative per-row terms). Emitted
    values v + corr_g and bounds v3 + corr_g remain rigorous per-row
    upper bounds (v is that row's raw score; unseen rows have raw
    score <= v3), just looser by the block's el2/al2 spread — measured
    certification at 1M/10.5M random is unchanged while the kernel
    drops the two [tile]→[tile, B] per-row broadcasts that cost 5.7 ms
    of the 22.9 ms v2 scan at 10.5M (each 1-D per-row array broadcast
    is a lane relayout; the [g, B] form is 128x smaller)."""
    tile, b = s_masked.shape
    n_sel = tile // SEL
    g = tile // BLOCK

    x = s_masked.reshape(g, BLOCK, b)
    lane = jax.lax.broadcasted_iota(jnp.int32, (g, BLOCK, b), 1)
    blk_row0 = jax.lax.broadcasted_iota(jnp.int32, (g, b), 0) * BLOCK + base
    cand_v, cand_r = [], []
    for _ in range(2):
        v = jnp.max(x, axis=1)  # [g, B] raw-score block max
        amax = jnp.max(jnp.where(x == v[:, None, :], lane, -1), axis=1)
        cand_v.append(v + corr_g)  # corrected: rigorous upper bound
        cand_r.append(blk_row0 + amax)
        x = jnp.where(lane == amax[:, None, :], NEG_INF, x)
    v3 = jnp.max(x, axis=1) + corr_g  # bound on the block's unseen rows

    bpt = SEL // BLOCK
    pool_v = jnp.concatenate(
        [cand_v[0].reshape(n_sel, bpt, b), cand_v[1].reshape(n_sel, bpt, b)], axis=1
    )
    pool_r = jnp.concatenate(
        [cand_r[0].reshape(n_sel, bpt, b), cand_r[1].reshape(n_sel, bpt, b)], axis=1
    )
    slot = jax.lax.broadcasted_iota(jnp.int32, (n_sel, 2 * bpt, b), 1)
    for t in range(t_top):
        v = jnp.max(pool_v, axis=1)
        smax = jnp.max(jnp.where(pool_v == v[:, None, :], slot, -1), axis=1)
        r = jnp.max(jnp.where(slot == smax[:, None, :], pool_r, -1), axis=1)
        v_ref[0, :, t, :] = v
        r_ref[0, :, t, :] = r
        pool_v = jnp.where(slot == smax[:, None, :], NEG_INF, pool_v)
    thr_pool = jnp.max(pool_v, axis=1)
    thr_blocks = jnp.max(v3.reshape(n_sel, bpt, b), axis=1)
    v_ref[0, :, t_top, :] = jnp.maximum(thr_pool, thr_blocks)


def _scan_select_v3_kernel(
    q_ref, m_ref, ebc_ref, abc_ref, valid_ref, uq_ref, vq_ref,
    *rest, t_top: int, tile_n: int, has_tags: bool,
):
    """v3 corpus-tile kernel: raw-score selection + per-block bound
    corrections (see _tile_tournament_blockcorr). ebc/abc are the
    per-block maxes of e_l2/a_l2, pre-reshaped to [steps, 8, g] (the
    8-sublane replication satisfies the TPU block-shape rule; [1-D g]
    blocks are rejected and [tile, 1] columns overflow scoped VMEM)."""
    tag_refs, out_refs = (rest[:4], rest[4:]) if has_tags else ((), rest)
    m = m_ref[:]
    if m.dtype != jnp.bfloat16:
        m = m.astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        m,
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tile_n, B]
    s = jnp.where(valid_ref[:][:, None] != 0, s, NEG_INF)
    if has_tags:
        s = _apply_tags(s, *tag_refs)
    corr = (
        ebc_ref[0, 0][:, None] * uq_ref[:][None, :]
        + abc_ref[0, 0][:, None] * vq_ref[:][None, :]
    )  # [g, B]
    v_ref, r_ref = out_refs
    _tile_tournament_blockcorr(
        s, corr, pl.program_id(0) * tile_n, t_top, v_ref, r_ref
    )


@functools.partial(jax.jit, static_argnames=("tile_n", "t_top", "interpret"))
def scan_select_v3(
    q_bf16: jax.Array,  # [B, d] bf16 (pre-normalized for cosine)
    m_bf16: jax.Array,  # [N, d] bf16 — or f32 for the inline-cast layout
    e_l2: jax.Array,  # [N] f32
    a_l2: jax.Array,  # [N] f32
    valid_i32: jax.Array,  # [N] int32 (0/1)
    u_q: jax.Array,  # [B] f32 — bound coefficient on e_l2 (>= 0)
    v_q: jax.Array,  # [B] f32 — bound coefficient on a_l2 (>= 0)
    tile_n: int = 2048,
    t_top: int = TILE_T,
    interpret: bool = False,
    tags: Tuple[jax.Array, ...] | None = None,
) -> Tuple[jax.Array, ...]:
    """Drop-in faster sibling of :func:`scan_select_v2` (same signature,
    same packed outputs, same soundness frame): candidate selection by
    raw masked score, bound corrections at per-block granularity.
    Requires u_q, v_q >= 0 (they are — _bf16_query_bounds builds them
    from norms), since corr uses per-block MAXES of e_l2/a_l2.
    Measured at 10.5M x 384 B=256 on one v5e: 22.9 -> ~15 ms marginal
    per scan (the per-row el2/al2 lane relayouts were 5.7 ms; the
    emitted candidates differ only where el2 spread within a 128-block
    reorders near-equal uppers, and certification fails closed either
    way)."""
    b, d = q_bf16.shape
    n = m_bf16.shape[0]
    assert n % tile_n == 0 and tile_n % SEL == 0
    s_tile = tile_n // SEL
    n_sel = n // SEL
    steps = n // tile_n
    g = tile_n // BLOCK
    # per-block maxes, replicated to the (steps, 8, g) block layout
    eb = jnp.max(e_l2.reshape(n // BLOCK, BLOCK), axis=1)
    ab = jnp.max(a_l2.reshape(n // BLOCK, BLOCK), axis=1)
    ebc = jnp.broadcast_to(eb.reshape(steps, 1, g), (steps, 8, g))
    abc = jnp.broadcast_to(ab.reshape(steps, 1, g), (steps, 8, g))
    grid = (steps,)
    out_specs = [
        pl.BlockSpec((1, s_tile, t_top + 1, b), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, s_tile, t_top, b), lambda i: (i, 0, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((steps, s_tile, t_top + 1, b), jnp.float32),
        jax.ShapeDtypeStruct((steps, s_tile, t_top, b), jnp.int32),
    ]
    in_specs = [
        pl.BlockSpec((b, d), lambda i: (0, 0)),
        pl.BlockSpec((tile_n, d), lambda i: (i, 0)),
        pl.BlockSpec((1, 8, g), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, 8, g), lambda i: (i, 0, 0)),
        pl.BlockSpec((tile_n,), lambda i: (i,)),
        pl.BlockSpec((b,), lambda i: (0,)),
        pl.BlockSpec((b,), lambda i: (0,)),
    ]
    args = [q_bf16, m_bf16, ebc, abc, valid_i32, u_q, v_q]
    if tags is not None:
        in_specs += [
            pl.BlockSpec((tile_n,), lambda i: (i,)),
            pl.BlockSpec((b,), lambda i: (0,)),
            pl.BlockSpec((b,), lambda i: (0,)),
            pl.BlockSpec((b,), lambda i: (0,)),
        ]
        args += list(tags)
    kernel = pl.pallas_call(
        functools.partial(_scan_select_v3_kernel, t_top=t_top, tile_n=tile_n,
                          has_tags=tags is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )
    v_pack, r_pack = kernel(*args)
    v_pack = v_pack.reshape(n_sel, t_top + 1, b).transpose(2, 1, 0)
    r_pack = r_pack.reshape(n_sel, t_top, b).transpose(2, 1, 0)
    return v_pack, r_pack


def _scan_select_v2_indirect_kernel(
    sel_ref, q_ref, m_ref, el2_ref, al2_ref, valid_ref, uq_ref, vq_ref,
    *rest, t_top: int, tile_n: int, n_tiles: int, has_tags: bool,
):
    """Tile-indirect sibling of :func:`_scan_select_v2_kernel`: grid
    step ``i`` scans corpus tile ``sel_ref[i]`` (scalar-prefetched), so
    ONLY the selected tiles' bytes ever leave HBM — the selective-fetch
    mechanism the cluster-pruned tier needs (the XLA gather variant
    copies the union first: ~3x the selected bytes). Pad slots carry
    ``sel_ref[i] >= n_tiles``; their block index clamps (the DMA must
    stay in bounds) and every row masks to -inf. Emitted rows are
    GLOBAL (= sel_ref[i]·tile_n + offset) — no positional translation."""
    tag_refs, out_refs = (rest[:4], rest[4:]) if has_tags else ((), rest)
    sel = sel_ref[pl.program_id(0)]
    ok = sel < n_tiles
    m = m_ref[:]
    if m.dtype != jnp.bfloat16:
        m = m.astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        m, q_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    upper = s + el2_ref[:][:, None] * uq_ref[:][None, :]
    upper = upper + al2_ref[:][:, None] * vq_ref[:][None, :]
    upper = jnp.where(valid_ref[:][:, None] != 0, upper, NEG_INF)
    if has_tags:
        upper = _apply_tags(upper, *tag_refs)
    upper = jnp.where(ok, upper, NEG_INF)
    v_ref, r_ref = out_refs
    _tile_tournament(upper, sel * tile_n, t_top, v_ref, r_ref)


def _scan_select_v3_indirect_kernel(
    sel_ref, q_ref, m_ref, ebc_ref, abc_ref, valid_ref, uq_ref, vq_ref,
    *rest, t_top: int, tile_n: int, n_tiles: int, has_tags: bool,
):
    """v3 sibling of the indirect kernel: raw-score selection +
    per-block bound corrections over the SELECTED tiles only."""
    tag_refs, out_refs = (rest[:4], rest[4:]) if has_tags else ((), rest)
    sel = sel_ref[pl.program_id(0)]
    ok = sel < n_tiles
    m = m_ref[:]
    if m.dtype != jnp.bfloat16:
        m = m.astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        m, q_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = jnp.where(valid_ref[:][:, None] != 0, s, NEG_INF)
    if has_tags:
        s = _apply_tags(s, *tag_refs)
    s = jnp.where(ok, s, NEG_INF)
    corr = (
        ebc_ref[0, 0][:, None] * uq_ref[:][None, :]
        + abc_ref[0, 0][:, None] * vq_ref[:][None, :]
    )
    v_ref, r_ref = out_refs
    _tile_tournament_blockcorr(s, corr, sel * tile_n, t_top, v_ref, r_ref)


@functools.partial(
    jax.jit, static_argnames=("tile_n", "t_top", "interpret")
)
def scan_select_v3_indirect(
    q_bf16: jax.Array,  # [B, d] bf16 (pre-normalized for cosine)
    m_bf16: jax.Array,  # [N, d] bf16 (or f32 for the inline-cast layout)
    e_l2: jax.Array,  # [N] f32
    a_l2: jax.Array,  # [N] f32
    valid_i32: jax.Array,  # [N] int32 (0/1)
    u_q: jax.Array,  # [B] f32 (>= 0)
    v_q: jax.Array,  # [B] f32 (>= 0)
    tile_ids: jax.Array,  # [G] int32 — corpus tiles to scan; >= N/tile_n pads
    tile_n: int = 2048,
    t_top: int = TILE_T,
    interpret: bool = False,
    tags: Tuple[jax.Array, ...] | None = None,
) -> Tuple[jax.Array, ...]:
    """Drop-in faster sibling of :func:`scan_select_v2_indirect`:
    same selective-fetch contract and packed outputs, with the per-row
    el2/al2 lane relayouts replaced by per-block bound maxes (see
    :func:`scan_select_v3`)."""
    from jax.experimental.pallas import tpu as pltpu

    b, d = q_bf16.shape
    n = m_bf16.shape[0]
    assert n % tile_n == 0 and tile_n % SEL == 0
    n_tiles = n // tile_n
    s_tile = tile_n // SEL
    g = tile_n // BLOCK
    budget = tile_ids.shape[0]
    eb = jnp.max(e_l2.reshape(n // BLOCK, BLOCK), axis=1)
    ab = jnp.max(a_l2.reshape(n // BLOCK, BLOCK), axis=1)
    ebc = jnp.broadcast_to(eb.reshape(n_tiles, 1, g), (n_tiles, 8, g))
    abc = jnp.broadcast_to(ab.reshape(n_tiles, 1, g), (n_tiles, 8, g))

    def tile_map(i, sel):
        return (jnp.minimum(sel[i], n_tiles - 1), 0)

    def tile_map1(i, sel):
        return (jnp.minimum(sel[i], n_tiles - 1),)

    def tile_map3(i, sel):
        return (jnp.minimum(sel[i], n_tiles - 1), 0, 0)

    in_specs = [
        pl.BlockSpec((b, d), lambda i, sel: (0, 0)),
        pl.BlockSpec((tile_n, d), tile_map),
        pl.BlockSpec((1, 8, g), tile_map3),
        pl.BlockSpec((1, 8, g), tile_map3),
        pl.BlockSpec((tile_n,), tile_map1),
        pl.BlockSpec((b,), lambda i, sel: (0,)),
        pl.BlockSpec((b,), lambda i, sel: (0,)),
    ]
    args = [q_bf16, m_bf16, ebc, abc, valid_i32, u_q, v_q]
    if tags is not None:
        in_specs += [
            pl.BlockSpec((tile_n,), tile_map1),
            pl.BlockSpec((b,), lambda i, sel: (0,)),
            pl.BlockSpec((b,), lambda i, sel: (0,)),
            pl.BlockSpec((b,), lambda i, sel: (0,)),
        ]
        args += list(tags)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(budget,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, s_tile, t_top + 1, b), lambda i, sel: (i, 0, 0, 0)),
            pl.BlockSpec((1, s_tile, t_top, b), lambda i, sel: (i, 0, 0, 0)),
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(
            _scan_select_v3_indirect_kernel, t_top=t_top, tile_n=tile_n,
            n_tiles=n_tiles, has_tags=tags is not None,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((budget, s_tile, t_top + 1, b), jnp.float32),
            jax.ShapeDtypeStruct((budget, s_tile, t_top, b), jnp.int32),
        ],
        interpret=interpret,
    )
    v_pack, r_pack = kernel(tile_ids.astype(jnp.int32), *args)
    n_sel_out = budget * s_tile
    v_pack = v_pack.reshape(n_sel_out, t_top + 1, b).transpose(2, 1, 0)
    r_pack = r_pack.reshape(n_sel_out, t_top, b).transpose(2, 1, 0)
    return v_pack, r_pack


@functools.partial(
    jax.jit, static_argnames=("tile_n", "t_top", "interpret")
)
def scan_select_v2_indirect(
    q_bf16: jax.Array,  # [B, d] bf16 (pre-normalized for cosine)
    m_bf16: jax.Array,  # [N, d] bf16 (or f32 for the inline-cast layout)
    e_l2: jax.Array,  # [N] f32
    a_l2: jax.Array,  # [N] f32
    valid_i32: jax.Array,  # [N] int32 (0/1)
    u_q: jax.Array,  # [B] f32
    v_q: jax.Array,  # [B] f32
    tile_ids: jax.Array,  # [G] int32 — corpus tiles to scan; >= N/tile_n pads
    tile_n: int = 2048,
    t_top: int = TILE_T,
    interpret: bool = False,
    tags: Tuple[jax.Array, ...] | None = None,
) -> Tuple[jax.Array, ...]:
    """Selective-fetch scan: like :func:`scan_select_v2` but over the
    ``len(tile_ids)`` corpus tiles named by ``tile_ids`` — HBM traffic
    is exactly the selected tiles' bytes (scalar-prefetch DMA), vs 3x
    for gather-then-scan. → (v_pack [B, T+1, G·tile_n/SEL] f32, r_pack
    [B, T, G·tile_n/SEL] int32 GLOBAL rows); pad slots emit -inf/-junk
    rows that the tail's sentinel handling drops. ``tags`` as in
    :func:`scan_select_v2`."""
    from jax.experimental.pallas import tpu as pltpu

    b, d = q_bf16.shape
    n = m_bf16.shape[0]
    assert n % tile_n == 0 and tile_n % SEL == 0
    n_tiles = n // tile_n
    s_tile = tile_n // SEL
    budget = tile_ids.shape[0]

    def tile_map(i, sel):
        return (jnp.minimum(sel[i], n_tiles - 1), 0)

    def tile_map1(i, sel):
        return (jnp.minimum(sel[i], n_tiles - 1),)

    in_specs = [
        pl.BlockSpec((b, d), lambda i, sel: (0, 0)),
        pl.BlockSpec((tile_n, d), tile_map),
        pl.BlockSpec((tile_n,), tile_map1),
        pl.BlockSpec((tile_n,), tile_map1),
        pl.BlockSpec((tile_n,), tile_map1),
        pl.BlockSpec((b,), lambda i, sel: (0,)),
        pl.BlockSpec((b,), lambda i, sel: (0,)),
    ]
    args = [q_bf16, m_bf16, e_l2, a_l2, valid_i32, u_q, v_q]
    if tags is not None:
        in_specs += [
            pl.BlockSpec((tile_n,), tile_map1),
            pl.BlockSpec((b,), lambda i, sel: (0,)),
            pl.BlockSpec((b,), lambda i, sel: (0,)),
            pl.BlockSpec((b,), lambda i, sel: (0,)),
        ]
        args += list(tags)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(budget,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, s_tile, t_top + 1, b), lambda i, sel: (i, 0, 0, 0)),
            pl.BlockSpec((1, s_tile, t_top, b), lambda i, sel: (i, 0, 0, 0)),
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(
            _scan_select_v2_indirect_kernel, t_top=t_top, tile_n=tile_n,
            n_tiles=n_tiles, has_tags=tags is not None,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((budget, s_tile, t_top + 1, b), jnp.float32),
            jax.ShapeDtypeStruct((budget, s_tile, t_top, b), jnp.int32),
        ],
        interpret=interpret,
    )
    v_pack, r_pack = kernel(tile_ids.astype(jnp.int32), *args)
    g_sel = budget * s_tile
    v_pack = v_pack.reshape(g_sel, t_top + 1, b).transpose(2, 1, 0)
    r_pack = r_pack.reshape(g_sel, t_top, b).transpose(2, 1, 0)
    return v_pack, r_pack


def _scan_select_int8_v3_kernel(
    q_ref, m_ref, sr_ref, ebc_ref, abc_ref, valid_ref, tq_ref, uq_ref,
    vq_ref, *rest, t_top: int, tile_n: int, use_int8_mxu: bool,
    has_tags: bool,
):
    """int8 v3 kernel: the dequantized score keeps its per-row scale
    multiply (semantically required — selection ranks real scores),
    but the el2/al2 bound terms move to per-block maxes like
    :func:`scan_select_v3`, dropping two of the three per-row lane
    relayouts."""
    tag_refs, out_refs = (rest[:4], rest[4:]) if has_tags else ((), rest)
    if use_int8_mxu:
        dot = jax.lax.dot_general(
            m_ref[:], q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        dot = jax.lax.dot_general(
            m_ref[:].astype(jnp.bfloat16), q_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    s = dot * sr_ref[:][:, None] * tq_ref[:][None, :]
    s = jnp.where(valid_ref[:][:, None] != 0, s, NEG_INF)
    if has_tags:
        s = _apply_tags(s, *tag_refs)
    corr = (
        ebc_ref[0, 0][:, None] * uq_ref[:][None, :]
        + abc_ref[0, 0][:, None] * vq_ref[:][None, :]
    )
    v_ref, r_ref = out_refs
    _tile_tournament_blockcorr(
        s, corr, pl.program_id(0) * tile_n, t_top, v_ref, r_ref
    )


@functools.partial(
    jax.jit,
    static_argnames=("tile_n", "t_top", "use_int8_mxu", "interpret"),
)
def scan_select_int8_v3(
    q_i8: jax.Array,  # [B, d] int8 (symmetric amax/127 scale t_q)
    m_i8: jax.Array,  # [N, d] int8, N % tile_n == 0
    s_row: jax.Array,  # [N] f32 — tightest symmetric (amax/127) row scales
    e_l2: jax.Array,  # [N] f32 — ‖row − s_i·row_i8‖₂
    a_l2: jax.Array,  # [N] f32 — ‖s_i·row_i8‖₂
    valid_i32: jax.Array,  # [N] int32 (0/1)
    t_q: jax.Array,  # [B] f32 — query scales
    u_q: jax.Array,  # [B] f32 — bound coefficient on e_l2 (>= 0)
    v_q: jax.Array,  # [B] f32 — bound coefficient on a_l2 (>= 0)
    tile_n: int = 2048,
    t_top: int = TILE_T,
    use_int8_mxu: bool = True,
    interpret: bool = False,
    tags: Tuple[jax.Array, ...] | None = None,
) -> Tuple[jax.Array, ...]:
    """Drop-in faster sibling of :func:`scan_select_int8_v2` (same
    signature/outputs; per-block el2/al2 corrections — see
    :func:`scan_select_v3`)."""
    b, d = q_i8.shape
    n = m_i8.shape[0]
    assert n % tile_n == 0 and tile_n % SEL == 0
    assert d * 127 * 127 < 2**24, "int dot must stay exactly representable"
    s_tile = tile_n // SEL
    n_sel = n // SEL
    steps = n // tile_n
    g = tile_n // BLOCK
    eb = jnp.max(e_l2.reshape(n // BLOCK, BLOCK), axis=1)
    ab = jnp.max(a_l2.reshape(n // BLOCK, BLOCK), axis=1)
    ebc = jnp.broadcast_to(eb.reshape(steps, 1, g), (steps, 8, g))
    abc = jnp.broadcast_to(ab.reshape(steps, 1, g), (steps, 8, g))
    in_specs = [
        pl.BlockSpec((b, d), lambda i: (0, 0)),
        pl.BlockSpec((tile_n, d), lambda i: (i, 0)),
        pl.BlockSpec((tile_n,), lambda i: (i,)),
        pl.BlockSpec((1, 8, g), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, 8, g), lambda i: (i, 0, 0)),
        pl.BlockSpec((tile_n,), lambda i: (i,)),
        pl.BlockSpec((b,), lambda i: (0,)),
        pl.BlockSpec((b,), lambda i: (0,)),
        pl.BlockSpec((b,), lambda i: (0,)),
    ]
    args = [q_i8, m_i8, s_row, ebc, abc, valid_i32, t_q, u_q, v_q]
    if tags is not None:
        in_specs += [
            pl.BlockSpec((tile_n,), lambda i: (i,)),
            pl.BlockSpec((b,), lambda i: (0,)),
            pl.BlockSpec((b,), lambda i: (0,)),
            pl.BlockSpec((b,), lambda i: (0,)),
        ]
        args += list(tags)
    kernel = pl.pallas_call(
        functools.partial(
            _scan_select_int8_v3_kernel, t_top=t_top, tile_n=tile_n,
            use_int8_mxu=use_int8_mxu, has_tags=tags is not None,
        ),
        grid=(steps,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, s_tile, t_top + 1, b), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, s_tile, t_top, b), lambda i: (i, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((steps, s_tile, t_top + 1, b), jnp.float32),
            jax.ShapeDtypeStruct((steps, s_tile, t_top, b), jnp.int32),
        ],
        interpret=interpret,
    )
    v_pack, r_pack = kernel(*args)
    v_pack = v_pack.reshape(n_sel, t_top + 1, b).transpose(2, 1, 0)
    r_pack = r_pack.reshape(n_sel, t_top, b).transpose(2, 1, 0)
    return v_pack, r_pack


@functools.partial(
    jax.jit, static_argnames=("tile_n", "t_top", "use_int8_mxu", "interpret")
)
def scan_select_int8_v2(
    q_i8: jax.Array,  # [B, d] int8 (symmetric amax/127 scale t_q)
    m_i8: jax.Array,  # [N, d] int8, N % tile_n == 0
    s_row: jax.Array,  # [N] f32 — tightest symmetric (amax/127) row scales
    e_l2: jax.Array,  # [N] f32 — ‖row − s_i·row_i8‖₂
    a_l2: jax.Array,  # [N] f32 — ‖s_i·row_i8‖₂
    valid_i32: jax.Array,  # [N] int32 (0/1)
    t_q: jax.Array,  # [B] f32 — query scales
    u_q: jax.Array,  # [B] f32 — bound coefficient on e_l2
    v_q: jax.Array,  # [B] f32 — bound coefficient on a_l2
    tile_n: int = 2048,
    t_top: int = TILE_T,
    use_int8_mxu: bool = True,
    interpret: bool = False,
    tags: Tuple[jax.Array, ...] | None = None,
) -> Tuple[jax.Array, ...]:
    """int8 tile kernel → same packed outputs as :func:`scan_select_v2`:
    (v_pack [B, T+1, G'] f32, r_pack [B, T, G'] int32), G' = N / SEL.
    ``tags`` filters exactly as in :func:`scan_select_v2`."""
    b, d = q_i8.shape
    n = m_i8.shape[0]
    assert n % tile_n == 0 and tile_n % SEL == 0
    assert d * 127 * 127 < 2**24, "int dot must stay exactly representable"
    s_tile = tile_n // SEL
    n_sel = n // SEL
    steps = n // tile_n
    in_specs = [
        pl.BlockSpec((b, d), lambda i: (0, 0)),
        pl.BlockSpec((tile_n, d), lambda i: (i, 0)),
        pl.BlockSpec((tile_n,), lambda i: (i,)),
        pl.BlockSpec((tile_n,), lambda i: (i,)),
        pl.BlockSpec((tile_n,), lambda i: (i,)),
        pl.BlockSpec((tile_n,), lambda i: (i,)),
        pl.BlockSpec((b,), lambda i: (0,)),
        pl.BlockSpec((b,), lambda i: (0,)),
        pl.BlockSpec((b,), lambda i: (0,)),
    ]
    args = [q_i8, m_i8, s_row, e_l2, a_l2, valid_i32, t_q, u_q, v_q]
    if tags is not None:
        in_specs += [
            pl.BlockSpec((tile_n,), lambda i: (i,)),
            pl.BlockSpec((b,), lambda i: (0,)),
            pl.BlockSpec((b,), lambda i: (0,)),
            pl.BlockSpec((b,), lambda i: (0,)),
        ]
        args += list(tags)
    kernel = pl.pallas_call(
        functools.partial(
            _scan_select_int8_v2_kernel, t_top=t_top, tile_n=tile_n,
            use_int8_mxu=use_int8_mxu, has_tags=tags is not None,
        ),
        grid=(steps,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, s_tile, t_top + 1, b), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, s_tile, t_top, b), lambda i: (i, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((steps, s_tile, t_top + 1, b), jnp.float32),
            jax.ShapeDtypeStruct((steps, s_tile, t_top, b), jnp.int32),
        ],
        interpret=interpret,
    )
    v_pack, r_pack = kernel(*args)
    v_pack = v_pack.reshape(n_sel, t_top + 1, b).transpose(2, 1, 0)
    r_pack = r_pack.reshape(n_sel, t_top, b).transpose(2, 1, 0)
    return v_pack, r_pack
