"""Fused MaxSim scan kernels: the bf16/int8 tiers' bound pass as ONE
Pallas program whose interaction tensor never leaves VMEM.

The XLA tiers (ops/maxsim.maxsim_topk_scan16 / maxsim_topk_int8) stream
the quantized token replica through `maxsim_block_scores`, which
materializes a ``[B, Lq, block, Lt]`` f32 interaction tensor in HBM
every block — the scan runs at ~100 GB/s effective instead of the
device's ~540+ GB/s streaming rate (measured 2026-08-19 at
100k×32×128). These kernels keep the whole interaction local. Per
``tile_n``-chunk corpus tile:

1. ONE MXU dot ``[tile_n·Lt, H] × [H, B·Lq]`` over the flat token view
   (bf16 in / f32 accumulate, or exact int8→int32) → ``sims``;
2. mask padding tokens to −inf (flat ``[N·Lt]`` mask — blocked 1-D
   operands must align to the XLA T(1024) layout tile, hence the
   ``tile_n·Lt % 1024`` wrapper constraint);
3. a FREE leading-dim reshape ``[tile_n, Lt, B·Lq]`` and a sublane-group
   max over Lt → per-(chunk, query-token) best;
4. the Lq-sum as a 0/1 selection matmul → ``[B, tile_n]`` scores, the
   only HBM write per tile.

An earlier design (one small dot per token position, 32-way unrolled,
slicing the middle axis of a 3-D block) compiled for MINUTES and then
hung the tunneled backend — single big dot + leading-split reshape is
both the fast-compiling and the fast-running shape. Do not reintroduce
per-position slicing.

Exactness: the bf16 kernel quantizes BOTH sides to bf16 (the MXU's
native input), so its scores differ from the XLA tier's (f32 query ×
upcast tokens, HIGHEST). That is fine for the TIER — the certificate
only needs a sound interval around the primary-storage exact score —
but the bound must carry query-side residual terms the XLA tier does
not need. :func:`ops.maxsim._scan16_query_pack` derives them; the
per-chunk width is

    W(b, c) = C1_b · e_max_c  +  (A_b + κ·(C1_b + 2·Q_b)) · n_max_c

with ``A = Σᵢ‖qᵢ − bf16(qᵢ)‖`` (query quantization, rides the token
norm bound ``n_max``), ``C1 = Σᵢ‖bf16(qᵢ)‖`` (carries the token
residual ``e_max`` and this kernel's own f32 rounding), ``Q = Σᵢ‖qᵢ‖``
(carries the oracle and rescore programs' rounding) and
``κ = (H + Lq)·2⁻²³`` the per-program dot+sum accumulation budget. The
int8 kernel computes the SAME program as the XLA int8 tier semantically
(exact int32 dot + f32 dequant multiplies + max + Lq-sum), so that
tier's bound transfers unchanged. Reference brute-force semantics as
everywhere (index.rs:386-412).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = float("-inf")


def _lq_sum(best: jax.Array, b: int, lq: int, scale=None) -> jax.Array:
    """``[tile_n, B·Lq] → [B, tile_n]`` — the Lq-sum as a selection
    matmul (a lane-axis reshape+reduce lowers poorly at Lq < 128;
    adding exact zeros is error-free, so the f32 rounding budget stays
    the Lq-term model the bound carries). ``scale`` (optional
    ``[B·Lq]``, positive) folds per-query-token scales into the
    selection weights — sound for the int8 tier because a positive
    per-token scale commutes with the over-doc-tokens max."""
    bl = best.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (b, bl), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, bl), 1)
    sel = (col // lq == row).astype(jnp.float32)  # [B, B·Lq]
    if scale is not None:
        sel = sel * scale[None, :]
    return jax.lax.dot_general(
        sel,
        best,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # HIGHEST: a default-precision f32 matmul runs single-pass bf16
        # on the MXU, rounding `best` (measured 3e-3 absolute — far
        # outside the bound's f32 Lq-sum budget). HIGHEST keeps the 0/1
        # (or scale) multiplies exact and the sum in f32.
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, tile_n]


def _maxsim_scan16_kernel(
    q_ref,  # [B·Lq, H] bf16 — b-major flat query tokens, padding zeroed
    tok_ref,  # [tile_n·Lt, H] bf16 — flat token replica tile
    tm_ref,  # [tile_n·Lt] int32 — 1 = valid document token
    out_ref,  # [B, tile_n] f32 — per-chunk bf16 MaxSim scores
    *,
    b: int,
    lq: int,
    lt: int,
):
    tile_flat = tok_ref.shape[0]
    tile_n = tile_flat // lt
    sims = jax.lax.dot_general(
        tok_ref[:],
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tile_n·Lt, B·Lq]
    sims = jnp.where(tm_ref[:][:, None] != 0, sims, NEG_INF)
    best = jnp.max(sims.reshape(tile_n, lt, b * lq), axis=1)
    # empty chunks (no valid token) contribute 0, like the XLA path;
    # zeroed padding query tokens max to exactly 0 over valid tokens
    best = jnp.where(jnp.isfinite(best), best, 0.0)
    out_ref[:, :] = _lq_sum(best, b, lq)


def _maxsim_scan_int8_kernel(
    q_ref,  # [B·Lq, H] int8 — b-major flat query tokens (padding all-0)
    tq_ref,  # [B·Lq] f32 — per-query-token symmetric scales (> 0)
    tok_ref,  # [tile_n·Lt, H] int8 — flat token replica tile
    s_ref,  # [tile_n·Lt] f32 — per-doc-token symmetric scales
    tm_ref,  # [tile_n·Lt] int32 — 1 = valid document token
    out_ref,  # [B, tile_n] f32
    *,
    b: int,
    lq: int,
    lt: int,
    use_int8_mxu: bool,
):
    """int8 sibling: the integer dot is EXACT (int32 accumulate,
    |dot| < 2²⁴ asserted by the wrapper); the query scale applies after
    the max (positive per-token scales commute with it), inside the
    selection matmul."""
    tile_flat = tok_ref.shape[0]
    tile_n = tile_flat // lt
    if use_int8_mxu:
        dots = jax.lax.dot_general(
            tok_ref[:],
            q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        dots = jax.lax.dot_general(
            tok_ref[:].astype(jnp.bfloat16),
            q_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # bit-identical: int8 exact in bf16, sums < 2²⁴ in f32
    sims = dots * s_ref[:][:, None]  # doc-token scale (query's follows)
    sims = jnp.where(tm_ref[:][:, None] != 0, sims, NEG_INF)
    best = jnp.max(sims.reshape(tile_n, lt, b * lq), axis=1)
    best = jnp.where(jnp.isfinite(best), best, 0.0)
    out_ref[:, :] = _lq_sum(best, b, lq, scale=tq_ref[:])


def _pick_tile_n(
    n: int, lt: int, h: int, bl: int, elem_bytes: int, copies: int
) -> int:
    """Largest power-of-two corpus tile whose VMEM footprint fits the
    default 16 MB scoped stack AND whose flat extent tile·Lt is a
    multiple of 1024 — blocked 1-D operands must align to XLA's
    T(1024) layout tile (measured: mismatch is a hard Mosaic error).
    The wrapper pads Lt to a multiple of 32 first, which makes every
    tile ≥ 32 satisfy the 1024 rule. Among admissible tiles, one
    dividing ``n`` is preferred: row padding copies the whole replica
    every dispatch.

    Footprint model (measured, 2026-08-19): the [tile·Lt, B·Lq] sims
    buffers pad their LANE axis to 128 and Mosaic keeps ``copies``
    of them live — 2 for bf16 (f32 dot out + masked), 3 for int8
    (int32 dots + f32 dequant + masked; observed 43.55 M at
    flat=32768, bl=32 ≈ tok + 2.5 lane-padded copies, so 3 is the
    safe count)."""
    budget = 12 * 2**20
    bl_pad = -(-bl // 128) * 128
    per_chunk = lt * (elem_bytes * h + 4 * bl_pad * copies)
    # tile_n is the OUTPUT block's lane axis — Mosaic requires % 128
    # (row padding is cheap next to lane-padding the [B, N] output)
    ok = [
        t
        for t in (4096, 2048, 1024, 512, 256, 128)
        if t * per_chunk <= budget and (t * lt) % 1024 == 0
    ]
    if not ok:
        return 0  # no admissible tile — caller must slab the queries
    for t in ok:
        if n % t == 0:
            return t
    return ok[0]


def _query_slab(n: int, lt: int, h: int, b: int, lq: int,
                elem_bytes: int, copies: int):
    """→ ``(b_slab, tile_n)``: the largest query-slab size (a divisor
    of the padded batch) whose minimum 128-row corpus tile fits VMEM.
    Large ``B·Lq`` inflates the [tile·Lt, B·Lq] sims buffer past the
    scoped stack; slabbing the QUERY axis (re-streaming the corpus per
    slab) is the only budget-true split left once tile_n is floored at
    128 by the output-block rule."""
    b_s = b
    while b_s > 1:
        t = _pick_tile_n(n, lt, h, b_s * lq, elem_bytes, copies)
        if t:
            return b_s, t
        b_s = -(-b_s // 2)
    return 1, _pick_tile_n(n, lt, h, lq, elem_bytes, copies) or 128


def _pad_tokens(tok, tm, lt_pad, extra=()):
    """Pad the token axis to ``lt_pad`` slots (masked zeros; sublane
    tiling wants Lt % 32 == 0 for int8, % 16 for bf16 — 32 covers
    both). ``extra`` = same-shaped [N, Lt] arrays to pad along axis 1."""
    n, lt = tm.shape
    if lt == lt_pad:
        return tok, tm, tuple(extra)
    d = lt_pad - lt
    tok = jnp.pad(tok, ((0, 0), (0, d), (0, 0)))
    tm = jnp.pad(tm, ((0, 0), (0, d)))
    return tok, tm, tuple(jnp.pad(e, ((0, 0), (0, d))) for e in extra)


def _split_tail(tok, tm, tile_n, extra=()):
    """``(main_rows, tail arrays)`` for the ragged-corpus split: the
    first ``(N // tile_n) · tile_n`` rows run on the main grid READING
    THE ORIGINAL ARRAYS IN PLACE (in-bounds blocks need no divisibility
    of the array extent), and only the ≤ tile_n remainder rows are
    sliced out and zero-padded for a one-block tail dispatch.
    ``jnp.pad`` of the full corpus — the previous design — materialized
    a complete second copy of the replica in HBM (7.63 GiB at 1M x 32 x
    128, measured OOM 2026-08-19)."""
    n = tm.shape[0]
    g0, rem = divmod(n, tile_n)
    if not rem:
        return g0, None
    lo = g0 * tile_n
    pads = []
    for a in (tok, tm, *extra):
        t = jax.lax.dynamic_slice(
            a, (lo,) + (0,) * (a.ndim - 1), (rem, *a.shape[1:])
        )
        pad_cfg = ((0, tile_n - rem),) + ((0, 0),) * (a.ndim - 1)
        pads.append(jnp.pad(t, pad_cfg))
    return g0, tuple(pads)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
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
    the corpus tile automatically. Ragged corpora (N not a tile
    multiple) run the full tiles in place plus one zero-padded tail
    dispatch — no corpus-scale pad copy. ``Lt`` should be a multiple
    of 32 (the store default); other values pay a full-corpus pad."""
    b, lq, h = q16.shape
    n, lt = t_mask.shape
    lt_pad = -(-lt // 32) * 32
    tok16, t_mask, _ = _pad_tokens(tok16, t_mask, lt_pad)
    if tile_n <= 0:
        b_s, tile_n = _query_slab(n, lt_pad, h, b, lq, 2, copies=2)
    else:
        b_s = b

    def make_kernel(g):
        return pl.pallas_call(
            functools.partial(
                _maxsim_scan16_kernel, b=b_s, lq=lq, lt=lt_pad
            ),
            grid=(g,),
            in_specs=[
                pl.BlockSpec((b_s * lq, h), lambda i: (0, 0)),
                pl.BlockSpec((tile_n * lt_pad, h), lambda i: (i, 0)),
                pl.BlockSpec((tile_n * lt_pad,), lambda i: (i,)),
            ],
            out_specs=pl.BlockSpec((b_s, tile_n), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct(
                (b_s, g * tile_n), jnp.float32
            ),
            interpret=interpret,
        )

    g0, tail = _split_tail(tok16, t_mask, tile_n)
    k_main = make_kernel(g0) if g0 else None
    k_tail = make_kernel(1) if tail is not None else None
    tok_flat = tok16.reshape(n * lt_pad, h)
    tm_flat = t_mask.reshape(n * lt_pad).astype(jnp.int32)
    if tail is not None:
        tok_t, tm_t = tail
        tok_t = tok_t.reshape(tile_n * lt_pad, h)
        tm_t = tm_t.reshape(tile_n * lt_pad).astype(jnp.int32)

    b_pad = -(-b // b_s) * b_s
    qf = q16
    if b_pad != b:  # zero queries score 0 everywhere; rows dropped below
        qf = jnp.pad(q16, ((0, b_pad - b), (0, 0), (0, 0)))
    slabs = []
    for i in range(b_pad // b_s):
        q_i = qf[i * b_s : (i + 1) * b_s].reshape(b_s * lq, h)
        parts = []
        if k_main is not None:
            parts.append(k_main(q_i, tok_flat, tm_flat))
        if k_tail is not None:
            parts.append(k_tail(q_i, tok_t, tm_t))
        slabs.append(
            parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        )
    s = slabs[0] if len(slabs) == 1 else jnp.concatenate(slabs, axis=0)
    s = s[:b, :n] if (tail is not None or b_pad != b) else s
    return jnp.where(valid[None, :], s, NEG_INF)


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
    ``[B, N]`` f32 (``-inf`` at invalid chunks). Scores equal the XLA
    int8 tier's up to f32 multiply/sum rounding, which its bound
    already budgets."""
    b, lq, h = q8.shape
    n, lt = t_mask.shape
    assert h * 127 * 127 < 2**24, "int dot must stay exactly representable"
    lt_pad = -(-lt // 32) * 32
    tok8, t_mask, (s_tok,) = _pad_tokens(tok8, t_mask, lt_pad, (s_tok,))
    if tile_n <= 0:
        b_s, tile_n = _query_slab(n, lt_pad, h, b, lq, 1, copies=3)
    else:
        b_s = b

    def make_kernel(g):
        return pl.pallas_call(
            functools.partial(
                _maxsim_scan_int8_kernel, b=b_s, lq=lq, lt=lt_pad,
                use_int8_mxu=use_int8_mxu,
            ),
            grid=(g,),
            in_specs=[
                pl.BlockSpec((b_s * lq, h), lambda i: (0, 0)),
                pl.BlockSpec((b_s * lq,), lambda i: (0,)),
                pl.BlockSpec((tile_n * lt_pad, h), lambda i: (i, 0)),
                pl.BlockSpec((tile_n * lt_pad,), lambda i: (i,)),
                pl.BlockSpec((tile_n * lt_pad,), lambda i: (i,)),
            ],
            out_specs=pl.BlockSpec((b_s, tile_n), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct(
                (b_s, g * tile_n), jnp.float32
            ),
            interpret=interpret,
        )

    g0, tail = _split_tail(tok8, t_mask, tile_n, extra=(s_tok,))
    k_main = make_kernel(g0) if g0 else None
    k_tail = make_kernel(1) if tail is not None else None
    m = n * lt_pad
    tok_flat = tok8.reshape(m, h)
    s_flat = s_tok.reshape(m)
    tm_flat = t_mask.reshape(m).astype(jnp.int32)
    if tail is not None:
        tok_t, tm_t, s_t_ = tail
        tok_t = tok_t.reshape(tile_n * lt_pad, h)
        tm_t = tm_t.reshape(tile_n * lt_pad).astype(jnp.int32)
        s_t_ = s_t_.reshape(tile_n * lt_pad)

    b_pad = -(-b // b_s) * b_s
    qf, tqf = q8, t_q
    if b_pad != b:  # all-zero q8 rows dot to 0; their rows are dropped
        qf = jnp.pad(q8, ((0, b_pad - b), (0, 0), (0, 0)))
        tqf = jnp.pad(t_q, ((0, b_pad - b), (0, 0)), constant_values=1.0)
    slabs = []
    for i in range(b_pad // b_s):
        q_i = qf[i * b_s : (i + 1) * b_s].reshape(b_s * lq, h)
        tq_i = tqf[i * b_s : (i + 1) * b_s].reshape(b_s * lq)
        parts = []
        if k_main is not None:
            parts.append(k_main(q_i, tq_i, tok_flat, s_flat, tm_flat))
        if k_tail is not None:
            parts.append(k_tail(q_i, tq_i, tok_t, s_t_, tm_t))
        slabs.append(
            parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        )
    s = slabs[0] if len(slabs) == 1 else jnp.concatenate(slabs, axis=0)
    s = s[:b, :n] if (tail is not None or b_pad != b) else s
    return jnp.where(valid[None, :], s, NEG_INF)


# ---------------------------------------------------------------------------
# v2 bound-pass kernel: interaction oriented [B·Lq, tile·Lt]
# ---------------------------------------------------------------------------
#
# MEASURED DEAD END (kept parity-tested, like ops/pallas/bm25_fetch):
# 43.4 ms at 1M x 32 x 128 on v5e vs v1's 26.5, and an ~8-minute first
# compile (2026-08-19, benches/maxsim_kernel_bench.py --v2). The theory
# was sound-looking: v1's interaction sits [tile·Lt, B·Lq] with B·Lq on
# LANES (padded to 128 — 2x waste at the serving shape B·Lq = 64), so
# flipping to [B·Lq, tile·Lt] (B·Lq on sublanes, 8-mult) with an
# l-MAJOR replica layout turns the per-chunk token max into Lt
# contiguous lane-slices and folds the mask in as a prepared f32 bias
# (0 valid / -2^30 padding — adding 0.0 is exact, so the tier bound
# transfers unchanged). In practice the Lt-unrolled slice/max chain is
# the same program shape as the per-position slicing the v1 note warns
# about, and Mosaic lowers it far slower than v1's single sublane-group
# reduce. v1's 26.5 ms is also NOT VMEM-bound as the pass-count model
# assumed — it is flat across tile_n 128/256 and survives this 2x
# traffic increase, so the binding constraint is the lowered op
# schedule, not bytes. Don't retry an orientation flip without
# evidence Mosaic lowers lane-sliced max chains as full-rate vector
# ops.
#
# Two input layouts share the kernel body:
# - "opt": the replica was PREPARED l-major-grouped
#   (ops/maxsim.prepare_maxsim_scan16_opt) — zero in-kernel work;
# - "primary": the tile arrives [group, Lt, H] straight from primary
#   storage (the bf16 zero-copy tier) and one in-kernel leading-axes
#   swap re-lays it (~1 extra VMEM pass, still well under v1's 3).

_MASK_BIAS = -(2.0 ** 30)


def _maxsim_scan16_v2_kernel(
    q_ref,  # [B·Lq, H] bf16 — b-major flat query tokens, padding zeroed
    tok_ref,  # "opt": [group·Lt, H] l-major | "primary": [group, Lt, H]
    bias_ref,  # [Lt·group] f32 l-major — 0 valid / -2^30 padding token
    out_ref,  # [B, group] f32
    *,
    b: int,
    lq: int,
    lt: int,
    group: int,
):
    tok = tok_ref[:]
    if tok.ndim == 3:  # primary layout: [group, Lt, H] → l-major flat
        h = tok.shape[2]
        tok = jnp.swapaxes(tok, 0, 1).reshape(lt * group, h)
    sims = jax.lax.dot_general(
        q_ref[:],
        tok,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B·Lq, Lt·group]
    best = None
    for l in range(lt):
        sl = sims[:, l * group : (l + 1) * group] + (
            bias_ref[l * group : (l + 1) * group][None, :]
        )
        best = sl if best is None else jnp.maximum(best, sl)
    # empty chunks (every token masked) sit at ~-2^30 — reset to the
    # exact-0 empty score; real maxima are bounded by norm products
    # far above -2^29 (zeroed padding query rows max to exactly 0)
    best = jnp.where(best > -(2.0 ** 29), best, 0.0)
    bl = b * lq
    row = jax.lax.broadcasted_iota(jnp.int32, (b, bl), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, bl), 1)
    sel = (col // lq == row).astype(jnp.float32)  # [B, B·Lq]
    out_ref[:, :] = jax.lax.dot_general(
        sel,
        best,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # HIGHEST for the same reason as _lq_sum: default f32 runs
        # single-pass bf16 on the MXU and rounds `best` ~3e-3
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, group]


def _v2_query_slab(b: int, lq: int, lt: int, group: int) -> int:
    """Largest query-slab size whose [b_s·Lq, Lt·group] f32 interaction
    stays within ~4 MiB of VMEM (the tile itself adds ~2-4 MiB and the
    grid pipeline double-buffers the in-blocks)."""
    budget = 4 * 2 ** 20
    b_s = b
    while b_s > 1 and b_s * lq * lt * group * 4 > budget:
        b_s = -(-b_s // 2)
    return b_s


@functools.partial(
    jax.jit, static_argnames=("lt", "group", "interpret")
)
def maxsim_scan16_scores_v2(
    q16: jax.Array,  # [B, Lq, H] bf16 (padding tokens zeroed)
    tok_l: jax.Array,  # [Gp·Lt_p·group, H] bf16 l-major-grouped replica
    bias_l: jax.Array,  # [Gp·Lt_p·group] f32 mask bias
    valid: jax.Array,  # [N] bool
    lt: int,  # PADDED token count Lt_p of the opt pack
    group: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused bf16 MaxSim bound pass over an opt-layout replica →
    ``[B, N]`` f32 (``-inf`` at invalid chunks). Scores are
    bit-identical to :func:`maxsim_scan16_scores` over the same bf16
    values (same dot program, exact 0.0 bias adds), so the fused tier's
    certificate width transfers unchanged."""
    b, lq, h = q16.shape
    n = valid.shape[0]
    flat = tok_l.shape[0]
    gp = flat // (lt * group)
    b_s = _v2_query_slab(b, lq, lt, group)

    kern = pl.pallas_call(
        functools.partial(
            _maxsim_scan16_v2_kernel, b=b_s, lq=lq, lt=lt, group=group
        ),
        grid=(gp,),
        in_specs=[
            pl.BlockSpec((b_s * lq, h), lambda i: (0, 0)),
            pl.BlockSpec((group * lt, h), lambda i: (i, 0)),
            pl.BlockSpec((group * lt,), lambda i: (i,)),
        ],
        out_specs=pl.BlockSpec((b_s, group), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b_s, gp * group), jnp.float32),
        interpret=interpret,
    )

    b_pad = -(-b // b_s) * b_s
    qf = q16
    if b_pad != b:
        qf = jnp.pad(q16, ((0, b_pad - b), (0, 0), (0, 0)))
    slabs = []
    for i in range(b_pad // b_s):
        q_i = qf[i * b_s : (i + 1) * b_s].reshape(b_s * lq, h)
        slabs.append(kern(q_i, tok_l, bias_l))
    s = slabs[0] if len(slabs) == 1 else jnp.concatenate(slabs, axis=0)
    s = s[:b, :n]
    return jnp.where(valid[None, :], s, NEG_INF)


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def maxsim_scan16_scores_self_v2(
    q16: jax.Array,  # [B, Lq, H] bf16 (padding tokens zeroed)
    tokens: jax.Array,  # [N, Lt, H] bf16 PRIMARY storage (zero-copy)
    bias_l: jax.Array,  # [Gp·Lt·group] f32 l-major mask bias (prepped)
    valid: jax.Array,  # [N] bool
    group: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Zero-copy sibling of :func:`maxsim_scan16_scores_v2`: the scan
    streams PRIMARY bf16 storage in its native [N, Lt, H] layout (no
    replica copy — XLA charges aliased parameters separately, the
    self16 accounting note) and one in-kernel leading-axes swap
    re-lays each tile l-major. Ragged corpora run full groups in place
    plus one zero-padded tail dispatch (the bias is prepared padded, so
    only the ≤ group-row token tail is copied)."""
    b, lq, h = q16.shape
    n, lt = tokens.shape[0], tokens.shape[1]
    assert (group * lt) % 1024 == 0, "1-D bias block must align to T(1024)"
    b_s = _v2_query_slab(b, lq, lt, group)

    g0, rem = divmod(n, group)

    def make_kernel(g, bias_at):
        return pl.pallas_call(
            functools.partial(
                _maxsim_scan16_v2_kernel, b=b_s, lq=lq, lt=lt, group=group
            ),
            grid=(g,),
            in_specs=[
                pl.BlockSpec((b_s * lq, h), lambda i: (0, 0)),
                pl.BlockSpec((group, lt, h), lambda i: (i, 0, 0)),
                # the bias stays WHOLE (the prep pads it to Gp groups);
                # main blocks index i < g0 and the tail pins group g0 —
                # all in-bounds, no corpus-scale slice copies
                pl.BlockSpec((group * lt,), bias_at),
            ],
            out_specs=pl.BlockSpec((b_s, group), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((b_s, g * group), jnp.float32),
            interpret=interpret,
        )

    if rem:
        # only the ≤ group-row token tail is sliced and zero-padded;
        # the main grid reads the original array in place (in-bounds
        # blocks need no divisibility of the array extent)
        tok_t = jax.lax.dynamic_slice(
            tokens, (g0 * group, 0, 0), (rem, lt, h)
        )
        tok_t = jnp.pad(tok_t, ((0, group - rem), (0, 0), (0, 0)))
    k_main = make_kernel(g0, lambda i: (i,)) if g0 else None
    k_tail = make_kernel(1, lambda i, _g=g0: (_g,)) if rem else None

    b_pad = -(-b // b_s) * b_s
    qf = q16
    if b_pad != b:
        qf = jnp.pad(q16, ((0, b_pad - b), (0, 0), (0, 0)))
    slabs = []
    for i in range(b_pad // b_s):
        q_i = qf[i * b_s : (i + 1) * b_s].reshape(b_s * lq, h)
        parts = []
        if k_main is not None:
            parts.append(k_main(q_i, tokens, bias_l))
        if k_tail is not None:
            parts.append(k_tail(q_i, tok_t, bias_l))
        slabs.append(
            parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        )
    s = slabs[0] if len(slabs) == 1 else jnp.concatenate(slabs, axis=0)
    s = s[:b, :n]
    return jnp.where(valid[None, :], s, NEG_INF)
