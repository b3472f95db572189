"""Tiered dense top-k: fused bf16 scan + verified fp32 rescore — exact
results without the fp32-HIGHEST full scan.

At corpus scale the exact dense path (ops/dense.py) is dominated by the
fp32-HIGHEST scoring matmul (6 bf16 MXU passes) and the [B, N] f32 score
tensor's HBM round-trip. This module replaces both with ONE fused bf16
pass and recovers exactness with interval arithmetic (reference
semantics target: index.rs:386-412 exact brute force — recall must stay
exact):

1. **Scan** (Pallas, ops/pallas/scan_select.py): stream bf16(M) once;
   per (query, row) compute an UPPER bound on the true fp32 score,
   upper = bf16(q)·bf16(m_i) + bound(q, i); per 128-row block emit the
   top-5 upper values and top-4 argmax lanes. No [B, N] tensor exists.
2. **Bound**: rigorous. With M = A + E (A = bf16(M)) and q = b + f:
   |m·q − a·b| ≤ ‖E_i‖₂‖b‖₂ + ‖A_i‖₂‖f‖₂ + ‖E_i‖₂‖f‖₂ plus an
   f32-accumulation term d·2⁻²³·‖A_i‖₂‖b‖₂ and a safety factor. The
   row norms are exact pack-time constants; the query norms are exact
   query-time scalars; both fold into two rank-1 coefficients.
3. **Select**: top-(k+margin) blocks by block-max upper (a small
   [B, G] top-k). Exclusion thresholds: the (k+margin+1)-th block max
   (no excluded block can hold a better row) and max(v5) over selected
   blocks (no unselected row of a selected block can beat it).
4. **Rescore**: the selected blocks' top-4 rows (4·(k+margin) rows per
   query) gather as fp32 and rescore exactly (HIGHEST), ordered
   (score desc, row asc).
5. **Verify**: certified iff every query's k-th exact score STRICTLY
   beats its threshold. `dense_topk_tiered_checked` falls back to the
   fp32 path for uncertified batches — results are ALWAYS exact; the
   bf16 tier only ever accelerates.

Strictness matters for ties: an excluded row whose upper bound equals
the k-th exact score could be a true tie owed a row-asc slot, so
equality fails verification rather than risking the ordering contract.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from trueno_rag_tpu.ops.dense import NEG_INF, dense_topk
from trueno_rag_tpu.ops.pallas.scan_select import BLOCK, TOP, scan_select
from trueno_rag_tpu.ops.pallas.scan_select_int8 import scan_select_int8

# Safety inflation on the analytic bound: absorbs f32 rounding in the
# bound arithmetic itself (a handful of multiply-adds).
_BOUND_SLACK = 1.0001
_BOUND_EPS = 1e-7
_ROW_SENTINEL = 1 << 30  # marks empty candidate slots; kept distinct


@jax.jit
def prepare_tiered(matrix: jax.Array):
    """Pack the scan tier: bf16 matrix + exact per-row error norms.

    Returns (m_bf16 [N,d], e_l2 [N], a_l2 [N]) where e_l2 = ‖M_i −
    bf16(M_i)‖₂ and a_l2 = ‖bf16(M_i)‖₂, both in f32.

    The barrier is load-bearing: on the TPU backend XLA folds the
    f32→bf16→f32 convert pair back to the input, which silently zeroes
    the residual (measured on device: e_l2 ≡ 0 without it) and would
    void the certificate's error term."""
    m_bf16 = matrix.astype(jnp.bfloat16)
    a = jax.lax.optimization_barrier(m_bf16).astype(jnp.float32)
    e = matrix - a
    e_l2 = jnp.sqrt(jnp.sum(e * e, axis=1))
    a_l2 = jnp.sqrt(jnp.sum(a * a, axis=1))
    return m_bf16, e_l2, a_l2


def _bf16_query_bounds(q: jax.Array):
    """Quantize the query batch to bf16 and build the rank-1 bound
    coefficients of the bf16 error model → (qb [B,d] bf16, u_q [B],
    v_q [B]) with bound = e_l2·u_q + a_l2·v_q. The barrier prevents XLA
    from folding f32(bf16(q)) back to q, which would zero the
    query-side residual on TPU (see prepare_tiered). acc_eps covers the
    MXU's f32 accumulation rounding (d·2⁻²³ per unit ‖A‖‖b‖); slack
    inflates both coefficients and the flat eps rides v_q (a_l2 is 0
    only for all-zero rows, whose score is 0). CERTIFICATE-CRITICAL and
    shared by every bf16 tier — fix bound math HERE, once."""
    d = q.shape[1]
    qb = q.astype(jnp.bfloat16)
    f = q - jax.lax.optimization_barrier(qb).astype(jnp.float32)
    b_l2 = jnp.linalg.norm(qb.astype(jnp.float32), axis=1)
    f_l2 = jnp.linalg.norm(f, axis=1)
    acc_eps = jnp.float32(d) * jnp.float32(2.0**-23)
    u_q = (b_l2 + f_l2) * _BOUND_SLACK + _BOUND_EPS
    v_q = (f_l2 + acc_eps * b_l2) * _BOUND_SLACK + _BOUND_EPS
    return qb, u_q, v_q


def _topk_select(values: jax.Array, k: int, approx: bool):
    """Select ~top-k indices of ``values [B, G]`` plus a RIGOROUS
    per-row upper bound on every non-selected entry (the masked max).

    With ``approx=True`` selection uses ``jax.lax.approx_max_k`` — the
    TPU's fast partial-reduce top-k, measured ~4x faster than
    ``lax.top_k`` at [256, 782] — which may miss true top entries; the
    returned threshold is computed from the ACTUAL selected set
    (scatter -inf into selected slots, then row-max), so a miss only
    RAISES the threshold and the caller's certificate fails closed
    rather than certifying a wrong result. Exact mode keeps the same
    masked-max threshold (equal to the (k+1)-th value, but tighter when
    duplicates tie).

    Caveat for callers: if the selection boundary lands inside a mass
    of -inf entries (e.g. trimming a candidate list padded with -inf
    sentinels), the count trick can never prove exclusion across the
    tie and the threshold is ALWAYS +inf — correct but useless. Don't
    trim across -inf padding (see ops/clustered.py's rescore_rows
    note)."""
    bsz, g = values.shape
    if approx:
        # 0.95 default recall measured 189/256 certification at 1M
        # (misses raise the fail-closed threshold); 0.99 restores
        # 256/256 at a fraction of exact top_k's cost.
        vals, idx = jax.lax.approx_max_k(values, k, recall_target=0.99)
        # Scatter-free exclusion bound (a [B, G] boolean scatter lowers
        # to a SORT on TPU — measured ~6 ms at G=7813): with
        # vmin = min(selected), if EXACTLY k entries of the row are
        # >= vmin and the selected indices are distinct, the selected
        # set IS {v >= vmin}, so max(unselected) = max(v < vmin) — three
        # elementwise passes. Any other situation (approx missed a
        # >= vmin entry, boundary tie, duplicate index) fails closed
        # via a +inf threshold.
        vmin = jnp.min(vals, axis=1)  # [B]
        ge = values >= vmin[:, None]
        count = jnp.sum(ge, axis=1)
        idx_sorted = jax.lax.sort(idx, dimension=1)
        has_dup = jnp.any(idx_sorted[:, 1:] == idx_sorted[:, :-1], axis=1)
        thr_exact = jnp.max(jnp.where(ge, NEG_INF, values), axis=1)
        sound = (count == k) & ~has_dup
        threshold = jnp.where(sound, thr_exact, jnp.inf)
        return idx, threshold
    # exact selection: the (k+1)-th sorted value bounds every
    # unselected entry (no scatter needed)
    kk = min(k + 1, g)
    vals, idx = jax.lax.top_k(values, kk)
    if kk > k:
        return idx[:, :k], vals[:, k]
    return idx, jnp.full((bsz,), NEG_INF)


def _select_rescore_verify(
    outs, q, matrix, valid_mask, n, n_pad, bsz, b_pad, k, margin_blocks,
    rescore_rows=None, approx_select=True, top=TOP,
):
    """Shared tier-2/3 tail: block selection by upper bounds, exact fp32
    rescore of the selected blocks' top-4 rows, and the strict-beat
    certificate. ``outs`` is the (v1..v5, i1..i4) tuple from a scan
    kernel (bf16 or int8 tier); ``q`` is the fp32 query batch (metric
    already applied), unpadded [bsz, d].

    ``rescore_rows``: if set, only the best ``rescore_rows`` explicit
    candidates (globally, by upper bound) are gathered and rescored
    instead of all ``4·(k+margin_blocks)``; the (rescore_rows+1)-th
    explicit upper joins the certificate threshold, so exactness is
    still proven — every row is covered by one of three bounds:
    unselected block → its v1 ≤ thr_out; unseen row of a selected
    block → its v5 ≤ thr_in; un-rescored explicit candidate → thr_exp.
    Cuts the dominant fp32 row gather ~4-5x (measured; the tail, not
    the scan, limits the tiered path at N≈100k)."""
    v_top = outs[: top + 1]  # v1..v_{top+1} [B_pad, G]
    i_top = outs[top + 1 :]  # i1..i_top [B_pad, G] lanes
    g = n_pad // BLOCK

    # -- tier 2: block selection by v1 ------------------------------------
    kb = min(k + margin_blocks, g)
    b_idx, thr_out = _topk_select(v_top[0], kb, approx_select)
    b_idx = jax.lax.sort(b_idx, dimension=1)

    # threshold from unselected rows of selected blocks
    v5_sel = jnp.take_along_axis(v_top[top], b_idx, axis=1)  # [B, kb]
    thr_in = jnp.max(v5_sel, axis=1)
    threshold = jnp.maximum(thr_out, thr_in)

    # -- candidates: the top-4 rows of each selected block ----------------
    cand_parts, val_parts = [], []
    for t in range(top):
        lanes = jnp.take_along_axis(i_top[t], b_idx, axis=1)  # [B, kb]
        vals = jnp.take_along_axis(v_top[t], b_idx, axis=1)
        rows_t = b_idx * BLOCK + lanes
        slot = jax.lax.broadcasted_iota(jnp.int32, (b_pad, kb), 1) * top + t
        rows_t = jnp.where(jnp.isneginf(vals), _ROW_SENTINEL + slot, rows_t)
        cand_parts.append(rows_t)
        val_parts.append(vals)
    cand_rows = jnp.concatenate(cand_parts, axis=1)  # [B, 4·kb]
    cand_vals = jnp.concatenate(val_parts, axis=1)
    return _trim_rescore_verify(
        cand_rows, cand_vals, threshold, q, matrix, valid_mask, n, bsz,
        b_pad, k, rescore_rows, approx_select,
    )


def _trim_rescore_verify(
    cand_rows, cand_vals, threshold, q, matrix, valid_mask, n, bsz, b_pad,
    k_req, rescore_rows, approx_select, tags=None,
):
    """Common certificate tail: optional trim of the explicit candidate
    set, exact fp32 rescore, deterministic (score desc, row asc) top-k
    and the strict-beat verification. ``cand_rows`` must already map
    -inf candidates to distinct ``_ROW_SENTINEL`` slots. ``tags`` adds
    a defensive re-check of the filter predicate on the gathered
    candidates (the scan kernel already masked disallowed rows)."""
    k = k_req

    # -- optional global row trim before the fp32 gather ------------------
    width = cand_rows.shape[1]
    if rescore_rows is not None and rescore_rows < width:
        # fewer than k_req rescored rows could certify an incomplete
        # result set (the (k)-th *returned* score would not be the true
        # k-th) — clamp so the proof stays about the full top-k
        rescore_rows = max(rescore_rows, k_req)
        if rescore_rows < width:
            # the masked max over un-rescored explicit candidates joins
            # the certificate threshold: none of them can beat it
            v_idx, thr_exp = _topk_select(cand_vals, rescore_rows, approx_select)
            threshold = jnp.maximum(threshold, thr_exp)
            cand_rows = jnp.take_along_axis(cand_rows, v_idx, axis=1)
    cand_rows = jax.lax.sort(cand_rows, dimension=1)  # row-asc tie order
    # defensive dedup: a repeated candidate row (possible only if a
    # selector ever returned duplicate indices) must not occupy two
    # top-k slots — sentinel the repeat, which rescores as (-inf, -1)
    dup = jnp.concatenate(
        [jnp.zeros((b_pad, 1), bool), cand_rows[:, 1:] == cand_rows[:, :-1]],
        axis=1,
    )
    slot_w = jax.lax.broadcasted_iota(jnp.int32, cand_rows.shape, 1)
    cand_rows = jnp.where(dup, _ROW_SENTINEL + slot_w, cand_rows)

    # -- exact fp32 rescore of the candidates ------------------------------
    safe_rows = jnp.minimum(cand_rows, n - 1)
    gathered = jnp.take(matrix, safe_rows, axis=0)  # [B, 4·kb, d]
    exact = jax.lax.dot_general(
        q if bsz == b_pad else jnp.pad(q, ((0, b_pad - bsz), (0, 0))),
        gathered,
        (((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, 4·kb]
    live = (cand_rows < n) & jnp.take(valid_mask, safe_rows, axis=0)
    if tags is not None:
        # fail-closed re-check, same posture as the dup sentinel: a
        # disallowed row surviving a kernel bug rescores -inf
        from trueno_rag_tpu.ops.tags import tag_pred

        tag_bits, t_all, t_any, t_none = (jnp.asarray(t, jnp.int32) for t in tags)
        t_all_p = jnp.pad(t_all, (0, b_pad - bsz)) if b_pad != bsz else t_all
        t_any_p = jnp.pad(t_any, (0, b_pad - bsz)) if b_pad != bsz else t_any
        t_none_p = jnp.pad(t_none, (0, b_pad - bsz)) if b_pad != bsz else t_none
        live = live & tag_pred(
            jnp.take(tag_bits, safe_rows, axis=0),
            t_all_p[:, None], t_any_p[:, None], t_none_p[:, None],
        )
    exact = jnp.where(live, exact, NEG_INF)
    k = min(k_req, cand_rows.shape[1])
    top_s, idx = jax.lax.top_k(exact, k)
    top_r = jnp.take_along_axis(cand_rows, idx, axis=1).astype(jnp.int32)
    top_r = jnp.where(jnp.isneginf(top_s), -1, top_r)
    if k < k_req:
        top_s = jnp.pad(top_s, ((0, 0), (0, k_req - k)), constant_values=NEG_INF)
        top_r = jnp.pad(top_r, ((0, 0), (0, k_req - k)), constant_values=-1)

    # -- verify: k-th exact must STRICTLY beat every excluded upper -------
    kth = top_s[:, min(k, k_req) - 1]
    per_q = (kth > threshold) | jnp.isneginf(threshold)
    if k < k_req:
        # Candidate width < k_req: the returned set is truncated, so the
        # "kth beats threshold" proof is about the width-th row, not the
        # k_req-th. Only certify when the threshold is -inf — i.e. NO
        # excluded row exists anywhere (every valid row was rescored), so
        # a short result is provably the complete valid set. Otherwise
        # fail closed and let the checked wrapper take the fp32 path.
        per_q = per_q & jnp.isneginf(threshold)
    return top_s[:bsz], top_r[:bsz], per_q[:bsz]


def _metric_queries(queries, metric, kinds=("cosine", "dot")):
    if metric == "cosine":
        qn = jnp.linalg.norm(queries, axis=-1, keepdims=True)
        return queries / jnp.where(qn == 0.0, 1.0, qn)
    if metric == "dot":
        return queries
    from trueno_rag_tpu.errors import InvalidConfigError

    raise InvalidConfigError(f"tiered scan supports {'/'.join(kinds)}, got {metric!r}")


@functools.partial(
    jax.jit, static_argnames=("k", "margin_blocks", "metric", "tile_n", "rescore_rows", "approx_select", "block_top", "interpret")
)
def dense_topk_tiered(
    queries: jax.Array,  # [B, d] f32
    matrix: jax.Array,  # [N, d] f32 (cosine rows pre-normalized)
    m_bf16: jax.Array,  # [N, d] bf16 scan copy
    e_l2: jax.Array,  # [N] f32 — ‖row − bf16(row)‖₂
    a_l2: jax.Array,  # [N] f32 — ‖bf16(row)‖₂
    valid_mask: jax.Array,  # [N] bool
    k: int,
    margin_blocks: int = 64,
    metric: str = "cosine",
    tile_n: int = 1024,
    rescore_rows: int | None = None,
    approx_select: bool = True,
    block_top: int = TOP,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """→ (scores [B,k], rows [B,k], certified [B] bool).

    Where ``certified[i]`` is True, query i's results are PROVABLY the
    exact fp32 top-k with (score desc, row asc) ordering; elsewhere they
    are best-effort. Callers wanting the exactness contract use
    :func:`dense_topk_tiered_checked`, which re-runs only the
    uncertified queries on the fp32 path."""
    q = _metric_queries(queries, metric)
    n, d = matrix.shape
    bsz = q.shape[0]

    # -- bound coefficients (rank-1 per query; shared derivation) ---------
    qb, u_q, v_q = _bf16_query_bounds(q)

    # -- pad to kernel-friendly shapes ------------------------------------
    b_pad = max(8, -(-bsz // 8) * 8)
    tile = tile_n
    n_pad = -(-n // tile) * tile
    if n_pad < tile:
        n_pad = tile
    qb_p = jnp.pad(qb, ((0, b_pad - bsz), (0, 0))) if b_pad != bsz else qb
    u_p = jnp.pad(u_q, (0, b_pad - bsz)) if b_pad != bsz else u_q
    v_p = jnp.pad(v_q, (0, b_pad - bsz)) if b_pad != bsz else v_q
    if n_pad != n:
        m_bf16 = jnp.pad(m_bf16, ((0, n_pad - n), (0, 0)))
        e_l2 = jnp.pad(e_l2, (0, n_pad - n))
        a_l2 = jnp.pad(a_l2, (0, n_pad - n))
        valid_mask_p = jnp.pad(valid_mask, (0, n_pad - n), constant_values=False)
    else:
        valid_mask_p = valid_mask

    outs = scan_select(
        qb_p, m_bf16, e_l2, a_l2, valid_mask_p.astype(jnp.int32), u_p, v_p,
        tile_n=tile, top=block_top, interpret=interpret,
    )
    return _select_rescore_verify(
        outs, q, matrix, valid_mask, n, n_pad, bsz, b_pad, k, margin_blocks,
        rescore_rows=rescore_rows, approx_select=approx_select, top=block_top,
    )


def dense_topk_tiered_checked(
    queries, matrix, m_bf16, e_l2, a_l2, valid_mask, k,
    margin_blocks=64, metric="cosine", tile_n=1024, rescore_rows=None,
    approx_select=True, block_top=TOP, interpret=False,
):
    """Exactness-contract wrapper: tiered fast path, fp32 fallback when
    the certificate fails (rare — requires an excluded row within the
    bf16 error band of the k-th score, or ≥5 of the true top-k packed
    into one 128-row block). Returns (scores, rows, used_fallback)."""
    s, r, ok = dense_topk_tiered(
        queries, matrix, m_bf16, e_l2, a_l2, valid_mask, k,
        margin_blocks=margin_blocks, metric=metric, tile_n=tile_n,
        rescore_rows=rescore_rows, approx_select=approx_select,
        block_top=block_top, interpret=interpret,
    )
    return _checked_fallback(s, r, ok, queries, matrix, valid_mask, k, metric)


def _tile_candidates(outs, b_pad, k, margin_tiles, approx_select, t_top):
    """Tile selection over the scan_select(+int8)_v2 packed outputs →
    (cand_rows, cand_vals, threshold). ``outs`` = (v_pack [B_pad, T+1,
    G'], r_pack [B_pad, T, G']) — packed so the per-tile candidate
    fetch is TWO gathers (each [B, kb]-from-[B, G'] gather measured
    ~0.25 ms of pure latency at 1M; the v1 tail's many small gathers
    were most of its 10.8 ms). Rows are already GLOBAL (no lane
    arithmetic); G' = N/1024 is 8x smaller than v1's block grid,
    shrinking the selection top-k by the same factor."""
    v_pack, r_pack = outs
    g = v_pack.shape[2]

    kb = min(k + margin_tiles, g)
    t_idx, thr_out = _topk_select(v_pack[:, 0, :], kb, approx_select)
    t_idx = jax.lax.sort(t_idx, dimension=1)
    # flat 2D take_along (one gather per packed array) — the broadcast
    # [B, 1, kb] index form lowered to a ~1.2 ms/array gather at 1M,
    # the flattened form is the same op class as a plain [B, kb] gather
    cv = t_top + 1
    fiv = (jnp.arange(cv, dtype=jnp.int32)[None, :, None] * g + t_idx[:, None, :]).reshape(b_pad, cv * kb)
    vg = jnp.take_along_axis(v_pack.reshape(b_pad, cv * g), fiv, axis=1).reshape(b_pad, cv, kb)
    fir = (jnp.arange(t_top, dtype=jnp.int32)[None, :, None] * g + t_idx[:, None, :]).reshape(b_pad, t_top * kb)
    rg = jnp.take_along_axis(r_pack.reshape(b_pad, t_top * g), fir, axis=1).reshape(b_pad, t_top, kb)
    thr_in = jnp.max(vg[:, t_top, :], axis=1)
    threshold = jnp.maximum(thr_out, thr_in)

    cand_vals = vg[:, :t_top, :].reshape(b_pad, t_top * kb)
    cand_rows = rg.reshape(b_pad, t_top * kb)
    slot = jax.lax.broadcasted_iota(jnp.int32, (b_pad, t_top * kb), 1)
    cand_rows = jnp.where(jnp.isneginf(cand_vals), _ROW_SENTINEL + slot, cand_rows)
    return cand_rows, cand_vals, threshold


def _select_rescore_verify_tiles(
    outs, q, matrix, valid_mask, n, bsz, b_pad, k, margin_tiles,
    rescore_rows, approx_select, t_top, tags=None,
):
    """v2 tail: tile selection + exact fp32 rescore + strict-beat
    certificate (see :func:`_tile_candidates`)."""
    cand_rows, cand_vals, threshold = _tile_candidates(
        outs, b_pad, k, margin_tiles, approx_select, t_top
    )
    return _trim_rescore_verify(
        cand_rows, cand_vals, threshold, q, matrix, valid_mask, n, bsz,
        b_pad, k, rescore_rows, approx_select, tags=tags,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "margin_tiles", "metric", "tile_n", "rescore_rows", "approx_select", "t_top", "interpret"),
)
def dense_topk_tiered2(
    queries: jax.Array,  # [B, d] f32
    matrix: jax.Array,  # [N, d] f32 (cosine rows pre-normalized)
    m_bf16: jax.Array | None,  # [N, d] bf16 scan copy; None = inline-cast
    #   layout: the scan reads ``matrix`` directly and casts to bf16 in
    #   VMEM (scan_select_v2 kernel) — identical scores/certificates
    #   (same round-to-nearest-even), no 2 B/elem replica in HBM, scan
    #   streams 2x the bytes. e_l2/a_l2 are still prepare_tiered's.
    e_l2: jax.Array,  # [N] f32 — ‖row − bf16(row)‖₂
    a_l2: jax.Array,  # [N] f32 — ‖bf16(row)‖₂
    valid_mask: jax.Array,  # [N] bool
    k: int,
    # margin 16 certified only 180/256 at 1M (the exclusion threshold
    # sits at the (k+margin+1)-th tile max, and random-corpus order
    # statistics there are closer than the bf16 bound width); 32 is the
    # measured floor for 256/256
    margin_tiles: int = 32,
    metric: str = "cosine",
    tile_n: int = 2048,
    rescore_rows: int | None = 96,
    approx_select: bool = True,
    # 3 is the measured-fastest at k<=64 (8.2 ms at 1M); 4 default for
    # headroom at larger k (certification fails closed either way)
    t_top: int = 4,
    interpret: bool = False,
    tags: Tuple[jax.Array, ...] | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Streaming-select v2 (scan_select_v2 kernel): same exactness
    contract as :func:`dense_topk_tiered`, with the per-128-block side
    arrays replaced by per-1024-row-tile candidate rows emitted directly
    by the kernel. → (scores [B,k], rows [B,k], certified [B] bool).

    ``tags`` = (tag_bits [N] i32, t_all/t_any/t_none [B] i32) masks
    disallowed (row, query) pairs inside the scan, so a certified query
    is the provably exact fp32 top-k AMONG ALLOWED ROWS — the filtered
    search stays on the fast tier instead of the full fp32 tagged scan
    (uncertified queries fall back per-query in the checked wrapper)."""
    from trueno_rag_tpu.ops.pallas.scan_select_v2 import SEL, scan_select_v3

    q = _metric_queries(queries, metric)
    n, d = matrix.shape
    bsz = q.shape[0]

    qb, u_q, v_q = _bf16_query_bounds(q)

    # -- pad to kernel-friendly shapes ------------------------------------
    b_pad = max(8, -(-bsz // 8) * 8)
    tile = max(tile_n, SEL)
    n_pad = max(-(-n // tile) * tile, tile)
    qb_p = jnp.pad(qb, ((0, b_pad - bsz), (0, 0))) if b_pad != bsz else qb
    u_p = jnp.pad(u_q, (0, b_pad - bsz)) if b_pad != bsz else u_q
    v_p = jnp.pad(v_q, (0, b_pad - bsz)) if b_pad != bsz else v_q
    scan_m = matrix if m_bf16 is None else m_bf16
    if n_pad != n:
        scan_m = jnp.pad(scan_m, ((0, n_pad - n), (0, 0)))
        e_l2 = jnp.pad(e_l2, (0, n_pad - n))
        a_l2 = jnp.pad(a_l2, (0, n_pad - n))
        valid_p = jnp.pad(valid_mask, (0, n_pad - n), constant_values=False)
    else:
        valid_p = valid_mask

    outs = scan_select_v3(
        qb_p, scan_m, e_l2, a_l2, valid_p.astype(jnp.int32), u_p, v_p,
        tile_n=tile, t_top=t_top, interpret=interpret,
        tags=_pad_tags(tags, n, n_pad, bsz, b_pad),
    )
    return _select_rescore_verify_tiles(
        outs, q, matrix, valid_mask, n, bsz, b_pad, k, margin_tiles,
        rescore_rows, approx_select, t_top, tags=tags,
    )


def dense_topk_tiered2_checked(
    queries, matrix, m_bf16, e_l2, a_l2, valid_mask, k,
    margin_tiles=32, metric="cosine", tile_n=2048, rescore_rows=96,
    approx_select=True, t_top=4, interpret=False, tags=None,
):
    """Exactness-contract wrapper for the v2 kernel: fp32 fallback when
    the certificate fails (the tag-filtered fp32 scan when ``tags`` is
    given). Returns (scores, rows, used_fallback)."""
    s, r, ok = dense_topk_tiered2(
        queries, matrix, m_bf16, e_l2, a_l2, valid_mask, k,
        margin_tiles=margin_tiles, metric=metric, tile_n=tile_n,
        rescore_rows=rescore_rows, approx_select=approx_select,
        t_top=t_top, interpret=interpret, tags=tags,
    )
    return _checked_fallback(s, r, ok, queries, matrix, valid_mask, k, metric,
                             tags=tags)


def _checked_fallback(s, r, ok, queries, matrix, valid_mask, k, metric,
                      tags=None):
    """Re-run ONLY uncertified queries on the exact fp32 path (the
    tagged fp32 scan when ``tags`` is given) and patch their rows in.
    The failing subset is bucketed to a power of two (repeating its
    first query) so serving compiles O(log B) fallback programs, not
    one per failure pattern."""
    import numpy as np

    ok_np = np.asarray(ok)
    if ok_np.all():
        return s, r, False
    bad = np.flatnonzero(~ok_np)
    bucket = 1
    while bucket < len(bad):
        bucket *= 2
    sel = np.concatenate([bad, np.full(bucket - len(bad), bad[0], np.int64)])
    fb_q = jnp.asarray(np.asarray(queries)[sel])
    if tags is not None:
        from trueno_rag_tpu.ops.tags import dense_topk_tagged

        tag_bits, t_all, t_any, t_none = (jnp.asarray(t, jnp.int32) for t in tags)
        sel_j = jnp.asarray(sel)
        fb_s, fb_r = dense_topk_tagged(
            fb_q, matrix, valid_mask, tag_bits,
            jnp.take(t_all, sel_j), jnp.take(t_any, sel_j),
            jnp.take(t_none, sel_j), min(k, matrix.shape[0]), metric,
        )
    else:
        fb_s, fb_r = dense_topk(fb_q, matrix, valid_mask, min(k, matrix.shape[0]), metric)
    if fb_s.shape[1] < k:
        pad = k - fb_s.shape[1]
        fb_s = jnp.pad(fb_s, ((0, 0), (0, pad)), constant_values=NEG_INF)
        fb_r = jnp.pad(fb_r, ((0, 0), (0, pad)), constant_values=-1)
    bad_j = jnp.asarray(bad)
    s = s.at[bad_j].set(fb_s[: len(bad)])
    r = r.at[bad_j].set(fb_r[: len(bad)])
    return s, r, True


# ---------------------------------------------------------------------------
# int8 tier: 4x less scan HBM than fp32 (2x less than bf16), 2x MXU rate
# with the native int8 path. The integer dot is exact (< 2^24) so the
# bound carries only the measured per-row quantization residual plus a
# ~2^-24-relative term for the two f32 scale multiplies (see
# ops/pallas/scan_select_int8.py).
# ---------------------------------------------------------------------------


@jax.jit
def prepare_int8(matrix: jax.Array):
    """Pack the int8 scan tier.

    Returns ``(m_i8 [N,d] int8, s_row [N] f32, e_l2 [N] f32, a_l2 [N]
    f32)`` where ``s_row = amax/127`` per-row scales (tightest symmetric
    quantization — measured: power-of-two scales widened the residual up
    to 2x and cost certification at batch scale, while the f32 rounding
    they avoid is ~2⁻²⁴, covered by the arithmetic term in ``v_q``),
    ``e_l2 = ‖M_i − s_i·m_i8_i‖₂`` (measured residual norm) and
    ``a_l2 = ‖s_i·m_i8_i‖₂``."""
    amax = jnp.max(jnp.abs(matrix), axis=1)
    s = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    m_i8 = jnp.clip(jnp.round(matrix / s[:, None]), -127, 127).astype(jnp.int8)
    a = m_i8.astype(jnp.float32) * s[:, None]
    err = matrix - a
    e_l2 = jnp.sqrt(jnp.sum(err * err, axis=1))
    a_l2 = jnp.sqrt(jnp.sum(a * a, axis=1))
    return m_i8, s, e_l2, a_l2


@functools.partial(
    jax.jit,
    static_argnames=("k", "margin_blocks", "metric", "tile_n", "use_int8_mxu", "rescore_rows", "approx_select", "block_top", "interpret"),
)
def dense_topk_int8(
    queries: jax.Array,  # [B, d] f32
    matrix: jax.Array,  # [N, d] f32 (cosine rows pre-normalized)
    m_i8: jax.Array,  # [N, d] int8 scan copy
    s_row: jax.Array,  # [N] f32 — tightest symmetric (amax/127) row scales
    e_l2: jax.Array,  # [N] f32
    a_l2: jax.Array,  # [N] f32
    valid_mask: jax.Array,  # [N] bool
    k: int,
    margin_blocks: int = 64,
    metric: str = "cosine",
    tile_n: int = 1024,
    use_int8_mxu: bool = True,
    rescore_rows: int | None = None,
    approx_select: bool = True,
    block_top: int = TOP,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """→ (scores [B,k], rows [B,k], certified [B] bool) — int8 sibling of
    :func:`dense_topk_tiered`; same exactness contract."""
    q = _metric_queries(queries, metric)
    n, d = matrix.shape
    bsz = q.shape[0]

    # -- query quantization + bound coefficients (shared derivation;
    # error model documented on _int8_query_bounds) -----------------------
    q_i8, t_q, u_q, v_q = _int8_query_bounds(q)

    # -- pad to kernel-friendly shapes ------------------------------------
    b_pad = max(8, -(-bsz // 8) * 8)
    tile = tile_n
    n_pad = max(-(-n // tile) * tile, tile)
    if b_pad != bsz:
        q_i8 = jnp.pad(q_i8, ((0, b_pad - bsz), (0, 0)))
        t_q = jnp.pad(t_q, (0, b_pad - bsz), constant_values=1.0)
        u_q = jnp.pad(u_q, (0, b_pad - bsz))
        v_q = jnp.pad(v_q, (0, b_pad - bsz))
    if n_pad != n:
        m_i8 = jnp.pad(m_i8, ((0, n_pad - n), (0, 0)))
        s_row = jnp.pad(s_row, (0, n_pad - n), constant_values=1.0)
        e_l2 = jnp.pad(e_l2, (0, n_pad - n))
        a_l2 = jnp.pad(a_l2, (0, n_pad - n))
        valid_p = jnp.pad(valid_mask, (0, n_pad - n), constant_values=False)
    else:
        valid_p = valid_mask

    outs = scan_select_int8(
        q_i8, m_i8, s_row, e_l2, a_l2, valid_p.astype(jnp.int32), t_q, u_q, v_q,
        tile_n=tile, use_int8_mxu=use_int8_mxu, top=block_top, interpret=interpret,
    )
    return _select_rescore_verify(
        outs, q, matrix, valid_mask, n, n_pad, bsz, b_pad, k, margin_blocks,
        rescore_rows=rescore_rows, approx_select=approx_select, top=block_top,
    )


def dense_topk_int8_checked(
    queries, matrix, m_i8, s_row, e_l2, a_l2, valid_mask, k,
    margin_blocks=64, metric="cosine", tile_n=1024, use_int8_mxu=True,
    rescore_rows=None, approx_select=True, block_top=TOP, interpret=False,
):
    """Exactness-contract wrapper for the int8 tier: fp32 fallback when
    the certificate fails. Returns (scores, rows, used_fallback)."""
    s, r, ok = dense_topk_int8(
        queries, matrix, m_i8, s_row, e_l2, a_l2, valid_mask, k,
        margin_blocks=margin_blocks, metric=metric, tile_n=tile_n,
        use_int8_mxu=use_int8_mxu, rescore_rows=rescore_rows,
        approx_select=approx_select, block_top=block_top, interpret=interpret,
    )
    return _checked_fallback(s, r, ok, queries, matrix, valid_mask, k, metric)


# ---------------------------------------------------------------------------
# int8 tile kernel (v2): the scan_select_int8 path with the per-1024-row
# tile tail — at 10M rows the v1 block grid is G=78k (nine [G, B] side
# arrays, a [B, 78k] selection top-k); the tile grid is 8x smaller.
# ---------------------------------------------------------------------------


def _int8_query_bounds(q: jax.Array):
    """Quantize the query batch (tightest symmetric amax/127) and build
    the rank-1 bound coefficients of the int8 error model (see
    dense_topk_int8 / scan_select_int8.py): the integer dot is exact,
    so the bound carries the row residual (e_l2·u_q), the query
    residual against the dequantized rows (a_l2·v_q) and the ~2⁻²⁴
    scale-multiply rounding folded into v_q."""
    t_amax = jnp.max(jnp.abs(q), axis=1)
    t_q = jnp.where(t_amax == 0.0, 1.0, t_amax / 127.0)
    q_i8 = jnp.clip(jnp.round(q / t_q[:, None]), -127, 127).astype(jnp.int8)
    b_vec = q_i8.astype(jnp.float32) * t_q[:, None]
    f = q - b_vec
    b_l2 = jnp.linalg.norm(b_vec, axis=1)
    f_l2 = jnp.linalg.norm(f, axis=1)
    u_q = (b_l2 + f_l2) * _BOUND_SLACK + _BOUND_EPS
    v_q = (f_l2 + jnp.float32(4e-7) * b_l2) * _BOUND_SLACK + _BOUND_EPS
    return q_i8, t_q, u_q, v_q


@functools.partial(
    jax.jit,
    static_argnames=("k", "margin_tiles", "metric", "tile_n", "use_int8_mxu", "rescore_rows", "approx_select", "t_top", "interpret"),
)
def dense_topk_int8_tiered2(
    queries: jax.Array,  # [B, d] f32
    matrix: jax.Array,  # [N, d] f32 (cosine rows pre-normalized)
    m_i8: jax.Array,  # [N, d] int8 scan copy (prepare_int8)
    s_row: jax.Array,  # [N] f32 — tightest symmetric (amax/127) row scales
    e_l2: jax.Array,  # [N] f32
    a_l2: jax.Array,  # [N] f32
    valid_mask: jax.Array,  # [N] bool
    k: int,
    margin_tiles: int = 32,
    metric: str = "cosine",
    tile_n: int = 2048,
    use_int8_mxu: bool = True,
    rescore_rows: int | None = 96,
    approx_select: bool = True,
    t_top: int = 4,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """int8 scan through the v2 tile kernel + exact fp32 rescore — the
    int8 sibling of :func:`dense_topk_tiered2`, same exactness contract.
    → (scores [B,k], rows [B,k], certified [B] bool)."""
    from trueno_rag_tpu.ops.pallas.scan_select_v2 import SEL, scan_select_int8_v3

    q = _metric_queries(queries, metric)
    n, d = matrix.shape
    bsz = q.shape[0]
    q_i8, t_q, u_q, v_q = _int8_query_bounds(q)

    b_pad = max(8, -(-bsz // 8) * 8)
    tile = max(tile_n, SEL)
    n_pad = max(-(-n // tile) * tile, tile)
    if b_pad != bsz:
        q_i8 = jnp.pad(q_i8, ((0, b_pad - bsz), (0, 0)))
        t_q = jnp.pad(t_q, (0, b_pad - bsz), constant_values=1.0)
        u_q = jnp.pad(u_q, (0, b_pad - bsz))
        v_q = jnp.pad(v_q, (0, b_pad - bsz))
    if n_pad != n:
        m_i8 = jnp.pad(m_i8, ((0, n_pad - n), (0, 0)))
        s_row = jnp.pad(s_row, (0, n_pad - n), constant_values=1.0)
        e_l2 = jnp.pad(e_l2, (0, n_pad - n))
        a_l2 = jnp.pad(a_l2, (0, n_pad - n))
        valid_p = jnp.pad(valid_mask, (0, n_pad - n), constant_values=False)
    else:
        valid_p = valid_mask

    outs = scan_select_int8_v3(
        q_i8, m_i8, s_row, e_l2, a_l2, valid_p.astype(jnp.int32), t_q,
        u_q, v_q, tile_n=tile, t_top=t_top, use_int8_mxu=use_int8_mxu,
        interpret=interpret,
    )
    return _select_rescore_verify_tiles(
        outs, q, matrix, valid_mask, n, bsz, b_pad, k, margin_tiles,
        rescore_rows, approx_select, t_top,
    )


def dense_topk_int8_tiered2_checked(
    queries, matrix, m_i8, s_row, e_l2, a_l2, valid_mask, k,
    margin_tiles=32, metric="cosine", tile_n=2048, use_int8_mxu=True,
    rescore_rows=96, approx_select=True, t_top=4, interpret=False,
):
    """Exactness-contract wrapper for the int8 tile kernel: fp32
    fallback when the certificate fails. Returns (scores, rows,
    used_fallback)."""
    s, r, ok = dense_topk_int8_tiered2(
        queries, matrix, m_i8, s_row, e_l2, a_l2, valid_mask, k,
        margin_tiles=margin_tiles, metric=metric, tile_n=tile_n,
        use_int8_mxu=use_int8_mxu, rescore_rows=rescore_rows,
        approx_select=approx_select, t_top=t_top, interpret=interpret,
    )
    return _checked_fallback(s, r, ok, queries, matrix, valid_mask, k, metric)


# ---------------------------------------------------------------------------
# Compact tiers: CERTIFIED top-k SETS with no fp32 matrix on device.
#
# The exact tiers above need the fp32 matrix resident for the rescore:
# at 10M rows × d=384 that is 15 GB — more than a v5e chip's HBM by
# itself. The compact tiers drop it. The contract changes accordingly:
# the returned top-k ROW SET is still *provably* the exact top-k set
# by TRUE (real-arithmetic) scores (interval certificate, fail-closed
# flag), but scores — and the order within the set — come from the
# bf16 rescore (≤ ~1e-3 absolute; the certificate proves every selected
# row truly beats every excluded row, not the ordering among the k).
#
# What limits certification here is NOT the scan threshold (margin_tiles
# puts it far below the k-th score, same as the exact tiers) but the
# RESCORE interval: with the fp32 matrix gone, true scores are known
# only to ± the stored-copy residual, and the SET certificate needs the
# true-score gap at rank k to exceed the interval width. Measured at
# 1M×384 random (B=256): gap at rank 50 is median 7.6e-4 / p5 6.0e-5 /
# min 2e-7, while the bf16 residual norm is ~1.7e-3 — so a bf16-only
# rescore certifies 0/256 there (measured), and an int8-quantized
# CORRECTION of that residual (‖E − Ê‖ ≈ 2e-5, 86x tighter) plus a
# pairwise-tree rescore (the MXU dot's (d−1)u accumulation bound would
# otherwise dominate: 153/256) certifies 227/256 — at an unchanged
# ~8.9 ms/step. Real corpora separate relevant rows far more than
# random ones; these numbers are the worst case.
#
# Three storage layouts:
# - :func:`dense_topk_compact_bf16r` — bf16 scan+rescore copy + int8
#   residual correction: 3 B/elem (11.5 GB at 10M×384), rescore
#   interval ~2e-5. The default (best certification per byte).
# - :func:`dense_topk_compact_bf16` — ONE bf16 array, 2 B/elem
#   (7.7 GB at 10M×384); rescore interval ~1.7e-3 certifies only
#   well-separated corpora. The minimum-memory option.
# - :func:`dense_topk_compact` — int8 scan copy + bf16 rescore copy
#   (3 B/elem): the scan streams 2x fewer bytes than bf16r but the
#   rescore interval is the same ~1.7e-3 — strictly worse certification
#   than bf16r at equal footprint; kept for corpora with wide gaps
#   where scan bandwidth dominates.
# ---------------------------------------------------------------------------


def _pad_tags(tags, n, n_pad, bsz, b_pad):
    """Pad the tag-filter arrays to the kernel's row/batch padding:
    padded rows get tag word 0 (they are invalid anyway), padded
    queries get all-zero filter words (unconstrained)."""
    if tags is None:
        return None
    tag_bits, t_all, t_any, t_none = (jnp.asarray(t, jnp.int32) for t in tags)
    if n_pad != n:
        tag_bits = jnp.pad(tag_bits, (0, n_pad - n))
    if b_pad != bsz:
        t_all = jnp.pad(t_all, (0, b_pad - bsz))
        t_any = jnp.pad(t_any, (0, b_pad - bsz))
        t_none = jnp.pad(t_none, (0, b_pad - bsz))
    return (tag_bits, t_all, t_any, t_none)


@jax.jit
def prepare_residual(matrix: jax.Array):
    """Pack the int8 residual correction for the bf16r compact layout.

    Returns (r_i8 [N,d] int8, r_scale [N] f32, e2_l2 [N] f32): the
    bf16 residual E_i = M_i − bf16(M_i) quantized with the tightest
    symmetric scale (amax/127), plus the norm of what remains,
    e2_l2 = ‖E_i − scale_i·r_i8_i‖₂ — the rescore interval half-width.
    Measured at d=384 unit rows: e2_l2 ≈ 2e-5 vs e_l2 ≈ 1.7e-3 (86x).

    Same folding hazard as :func:`prepare_tiered`: both the bf16 value
    and the quantized residual pass through optimization barriers so
    XLA cannot reconstruct (and fold away) the exact residual chain on
    TPU."""
    a = jax.lax.optimization_barrier(matrix.astype(jnp.bfloat16)).astype(jnp.float32)
    e = matrix - a
    amax = jnp.max(jnp.abs(e), axis=1)
    scale = jnp.where(amax > 0.0, amax / 127.0, 1.0)
    r_i8 = jnp.round(e / scale[:, None]).astype(jnp.int8)
    r_f = jax.lax.optimization_barrier(r_i8).astype(jnp.float32) * scale[:, None]
    e2 = e - r_f
    e2_l2 = jnp.sqrt(jnp.sum(e2 * e2, axis=1))
    return r_i8, scale, e2_l2


def prepare_residual2(matrix: jax.Array):
    """Pack BOTH int8 residual levels for the bf16rr compact layout
    (4 B/element, ≤ ~8M×384 rows on one 16 GB chip).

    Returns (r_i8, r_scale, e2_l2, r2_i8, r2_scale, e3_l2): level 1 is
    exactly :func:`prepare_residual`'s quantization of E = M − bf16(M);
    level 2 quantizes what level 1 left, E₂ = E − s₁·r₁, with its own
    tightest symmetric scale. Computed in ONE function so the two
    levels are consistent by construction (no cross-jit elementwise
    drift can make e3_l2 unsound). Measured at d=384 unit rows:
    e3_l2 ≈ 2.6e-7 vs e2_l2 ≈ 2e-5 vs e_l2 ≈ 1.7e-3 — with the
    pairwise-tree rescore's ~1.2e-6 rounding bound, the certificate
    interval collapses to ~1.5e-6 (≈15x narrower than bf16r), which is
    the lever for near-100% device certification at 10M-class corpora
    (r4 verdict #8). Same folding hazards as :func:`prepare_residual`:
    every quantized value passes an optimization barrier."""
    a = jax.lax.optimization_barrier(matrix.astype(jnp.bfloat16)).astype(jnp.float32)
    e = matrix - a
    amax = jnp.max(jnp.abs(e), axis=1)
    s1 = jnp.where(amax > 0.0, amax / 127.0, 1.0)
    r1 = jnp.round(e / s1[:, None]).astype(jnp.int8)
    r1_f = jax.lax.optimization_barrier(r1).astype(jnp.float32) * s1[:, None]
    e2 = e - r1_f
    e2_l2 = jnp.sqrt(jnp.sum(e2 * e2, axis=1))
    amax2 = jnp.max(jnp.abs(e2), axis=1)
    s2 = jnp.where(amax2 > 0.0, amax2 / 127.0, 1.0)
    r2 = jnp.round(e2 / s2[:, None]).astype(jnp.int8)
    r2_f = jax.lax.optimization_barrier(r2).astype(jnp.float32) * s2[:, None]
    e3 = e2 - r2_f
    e3_l2 = jnp.sqrt(jnp.sum(e3 * e3, axis=1))
    return r1, s1, e2_l2, r2, s2, e3_l2


@functools.partial(
    jax.jit,
    static_argnames=("k", "margin_tiles", "metric", "tile_n", "rescore_rows", "approx_select", "t_top", "interpret", "return_bounds", "return_candidates"),
)
def dense_topk_compact_bf16rr(
    queries: jax.Array,  # [B, d] f32
    m_bf16: jax.Array,  # [N, d] bf16 scan+rescore copy (prepare_tiered)
    e_l2: jax.Array,  # [N] f32
    a_l2: jax.Array,  # [N] f32
    r_i8: jax.Array,  # [N, d] int8 level-1 residual
    r_scale: jax.Array,  # [N] f32
    e2_l2: jax.Array,  # [N] f32
    r2_i8: jax.Array,  # [N, d] int8 level-2 residual (prepare_residual2)
    r2_scale: jax.Array,  # [N] f32
    e3_l2: jax.Array,  # [N] f32 — ‖E − s₁r₁ − s₂r₂‖₂
    valid_mask: jax.Array,  # [N] bool
    k: int,
    margin_tiles: int = 32,
    metric: str = "cosine",
    tile_n: int = 2048,
    rescore_rows: int | None = 96,
    approx_select: bool = True,
    t_top: int = 4,
    interpret: bool = False,
    return_bounds: bool = False,
    return_candidates: bool = False,
    tags: Tuple[jax.Array, ...] | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Compact tier with TWO int8 residual levels — 4 B/element, the
    certification-ceiling layout (r4 verdict #8). The scan is identical
    to :func:`dense_topk_compact_bf16r` (same bf16 stream, same tile
    bounds — throughput unchanged); only the candidate rescore adds the
    second correction dot, so the certificate interval shrinks from
    ~e2_l2 (~2e-5) to ~e3_l2 + tree rounding (~1.5e-6). Memory is the
    cost: 16.1 GB at 10.5M×384 does NOT fit one chip — this layout is
    for ≤8M rows single-chip or the sharded mesh."""
    from trueno_rag_tpu.ops.pallas.scan_select_v2 import SEL, scan_select_v3

    q = _metric_queries(queries, metric)
    n, d = m_bf16.shape
    bsz = q.shape[0]
    qb, u_q, v_q = _bf16_query_bounds(q)
    b_pad = max(8, -(-bsz // 8) * 8)
    tile = max(tile_n, SEL)
    n_pad = max(-(-n // tile) * tile, tile)
    qb_p = jnp.pad(qb, ((0, b_pad - bsz), (0, 0))) if b_pad != bsz else qb
    u_p = jnp.pad(u_q, (0, b_pad - bsz)) if b_pad != bsz else u_q
    v_p = jnp.pad(v_q, (0, b_pad - bsz)) if b_pad != bsz else v_q
    if n_pad != n:
        m_p = jnp.pad(m_bf16, ((0, n_pad - n), (0, 0)))
        e_p = jnp.pad(e_l2, (0, n_pad - n))
        a_p = jnp.pad(a_l2, (0, n_pad - n))
        valid_p = jnp.pad(valid_mask, (0, n_pad - n), constant_values=False)
    else:
        m_p, e_p, a_p, valid_p = m_bf16, e_l2, a_l2, valid_mask
    outs = scan_select_v3(
        qb_p, m_p, e_p, a_p, valid_p.astype(jnp.int32), u_p, v_p,
        tile_n=tile, t_top=t_top, interpret=interpret,
        tags=_pad_tags(tags, n, n_pad, bsz, b_pad),
    )
    cand_rows, cand_vals, threshold = _tile_candidates(
        outs, b_pad, k, margin_tiles, approx_select, t_top
    )
    return _trim_rescore_verify_compact(
        cand_rows, cand_vals, threshold, q, m_bf16, e_l2, a_l2,
        valid_mask, n, bsz, b_pad, k, rescore_rows, approx_select,
        residual=(r_i8, r_scale, e2_l2),
        residual2=(r2_i8, r2_scale, e3_l2),
        return_bounds=return_bounds,
        tags=tags, return_candidates=return_candidates,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "margin_tiles", "metric", "tile_n", "rescore_rows", "approx_select", "t_top", "interpret", "return_bounds", "return_candidates"),
)
def dense_topk_compact_bf16r(
    queries: jax.Array,  # [B, d] f32
    m_bf16: jax.Array,  # [N, d] bf16 scan+rescore copy (prepare_tiered)
    e_l2: jax.Array,  # [N] f32 — ‖row − bf16(row)‖₂
    a_l2: jax.Array,  # [N] f32 — ‖bf16(row)‖₂
    r_i8: jax.Array,  # [N, d] int8 residual correction (prepare_residual)
    r_scale: jax.Array,  # [N] f32
    e2_l2: jax.Array,  # [N] f32 — ‖residual − correction‖₂
    valid_mask: jax.Array,  # [N] bool
    k: int,
    margin_tiles: int = 32,
    metric: str = "cosine",
    tile_n: int = 2048,
    rescore_rows: int | None = 96,
    approx_select: bool = True,
    t_top: int = 4,
    interpret: bool = False,
    return_bounds: bool = False,
    return_candidates: bool = False,
    tags: Tuple[jax.Array, ...] | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Compact tier with int8 residual correction — 3 B/element, the
    certification-per-byte sweet spot → (scores [B,k]
    residual-corrected, rows [B,k], set_certified [B] bool).

    ``return_candidates=True`` additionally returns the full pre-trim
    candidate rows ``cand [B, W]`` (W = t_top·(k+margin_tiles); entries
    ≥ N are sentinels) and the tile-level exclusion bound ``thr [B]`` —
    a sound upper bound on the TRUE score of every row outside ``cand``.
    This is the CONTAINMENT certificate: if the exact k-th candidate
    score (host f64 rescore of just those W rows) strictly beats
    ``thr``, the exact top-k set is provably inside ``cand`` — the
    uncertified-query patch then costs O(W·d) on the host instead of a
    full-matrix GEMM (see VectorStore._host_candidate_patch).

    ``tags`` = (tag_bits [N] i32, t_all [B] i32, t_any [B] i32,
    t_none [B] i32): disallowed (row, query) pairs mask to -inf inside
    the scan kernel, so candidates, thresholds, and the certificate all
    range over ALLOWED rows only — a certified query's set is provably
    the exact top-k among rows passing its filter (the same contract as
    ops/tags.py::dense_topk_tagged, at compact storage).

    ``return_bounds=True`` additionally returns per-candidate interval
    half-widths ``err [B,k]`` and the exclusion upper bound ``rhs [B]``
    (max possible TRUE score of any non-returned row, +inf when any
    local failure mode fired) — the pieces the sharded composition in
    ``parallel/compact.py`` needs to build a GLOBAL set certificate
    from per-shard scans.

    The scan is the same bf16 scan_select_v2 pass as the bf16 layout;
    the rescore adds the dequantized int8 residual, shrinking the
    true-score interval from ~e_l2 (~1.7e-3) to ~e2_l2 (~2e-5) — below
    the measured p5 rank-50 gap at 1M×384 random, so the SET
    certificate fires where the bf16-only layout cannot. Certified
    queries return the PROVABLY exact top-k SET by true scores
    (index.rs:386-412 semantics); scores/order are corrected-rescore
    values (±~2e-5). Uncertified queries are best-effort and flagged."""
    from trueno_rag_tpu.ops.pallas.scan_select_v2 import SEL, scan_select_v3

    q = _metric_queries(queries, metric)
    n, d = m_bf16.shape
    bsz = q.shape[0]

    qb, u_q, v_q = _bf16_query_bounds(q)

    b_pad = max(8, -(-bsz // 8) * 8)
    tile = max(tile_n, SEL)
    n_pad = max(-(-n // tile) * tile, tile)
    qb_p = jnp.pad(qb, ((0, b_pad - bsz), (0, 0))) if b_pad != bsz else qb
    u_p = jnp.pad(u_q, (0, b_pad - bsz)) if b_pad != bsz else u_q
    v_p = jnp.pad(v_q, (0, b_pad - bsz)) if b_pad != bsz else v_q
    if n_pad != n:
        m_p = jnp.pad(m_bf16, ((0, n_pad - n), (0, 0)))
        e_p = jnp.pad(e_l2, (0, n_pad - n))
        a_p = jnp.pad(a_l2, (0, n_pad - n))
        valid_p = jnp.pad(valid_mask, (0, n_pad - n), constant_values=False)
    else:
        m_p, e_p, a_p, valid_p = m_bf16, e_l2, a_l2, valid_mask

    outs = scan_select_v3(
        qb_p, m_p, e_p, a_p, valid_p.astype(jnp.int32), u_p, v_p,
        tile_n=tile, t_top=t_top, interpret=interpret,
        tags=_pad_tags(tags, n, n_pad, bsz, b_pad),
    )
    cand_rows, cand_vals, threshold = _tile_candidates(
        outs, b_pad, k, margin_tiles, approx_select, t_top
    )
    return _trim_rescore_verify_compact(
        cand_rows, cand_vals, threshold, q, m_bf16, e_l2, a_l2,
        valid_mask, n, bsz, b_pad, k, rescore_rows, approx_select,
        residual=(r_i8, r_scale, e2_l2), return_bounds=return_bounds,
        tags=tags, return_candidates=return_candidates,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "margin_tiles", "metric", "tile_n", "rescore_rows", "approx_select", "t_top", "interpret", "return_candidates"),
)
def dense_topk_compact_bf16(
    queries: jax.Array,  # [B, d] f32
    m_bf16: jax.Array,  # [N, d] bf16 — the ONLY matrix copy (prepare_tiered)
    e_l2: jax.Array,  # [N] f32 — ‖row − bf16(row)‖₂
    a_l2: jax.Array,  # [N] f32 — ‖bf16(row)‖₂
    valid_mask: jax.Array,  # [N] bool
    k: int,
    margin_tiles: int = 32,
    metric: str = "cosine",
    tile_n: int = 2048,
    rescore_rows: int | None = 96,
    approx_select: bool = True,
    t_top: int = 4,
    interpret: bool = False,
    return_candidates: bool = False,
    tags: Tuple[jax.Array, ...] | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Compact tier, bf16-only storage: the scan_select_v2 pass and the
    certified rescore read the SAME bf16 array — 2 B/element total, no
    fp32 matrix → (scores [B,k] bf16-rescored, rows [B,k],
    set_certified [B] bool). ``tags`` filters exactly as in
    :func:`dense_topk_compact_bf16r`.

    Where ``set_certified[i]`` is True, query i's k rows are PROVABLY
    the exact top-k SET by true scores (reference semantics
    index.rs:386-412); scores/order within the set are bf16-rescored
    (HIGHEST f32 accumulation over f32(bf16 rows), ≤ ~1e-3). The
    certificate interval IS that ~1.7e-3 residual: corpora whose
    rank-k gap sits below it fail closed (measured 0/256 at 1M×384
    random — use :func:`dense_topk_compact_bf16r` there). No device
    fp32 fallback exists at this footprint — uncertified queries are
    best-effort and flagged (VectorStore patches them from the host
    matrix)."""
    from trueno_rag_tpu.ops.pallas.scan_select_v2 import SEL, scan_select_v3

    q = _metric_queries(queries, metric)
    n, d = m_bf16.shape
    bsz = q.shape[0]

    # -- bound coefficients (identical derivation to dense_topk_tiered2) --
    qb, u_q, v_q = _bf16_query_bounds(q)

    b_pad = max(8, -(-bsz // 8) * 8)
    tile = max(tile_n, SEL)
    n_pad = max(-(-n // tile) * tile, tile)
    qb_p = jnp.pad(qb, ((0, b_pad - bsz), (0, 0))) if b_pad != bsz else qb
    u_p = jnp.pad(u_q, (0, b_pad - bsz)) if b_pad != bsz else u_q
    v_p = jnp.pad(v_q, (0, b_pad - bsz)) if b_pad != bsz else v_q
    if n_pad != n:
        m_p = jnp.pad(m_bf16, ((0, n_pad - n), (0, 0)))
        e_p = jnp.pad(e_l2, (0, n_pad - n))
        a_p = jnp.pad(a_l2, (0, n_pad - n))
        valid_p = jnp.pad(valid_mask, (0, n_pad - n), constant_values=False)
    else:
        m_p, e_p, a_p, valid_p = m_bf16, e_l2, a_l2, valid_mask

    outs = scan_select_v3(
        qb_p, m_p, e_p, a_p, valid_p.astype(jnp.int32), u_p, v_p,
        tile_n=tile, t_top=t_top, interpret=interpret,
        tags=_pad_tags(tags, n, n_pad, bsz, b_pad),
    )
    cand_rows, cand_vals, threshold = _tile_candidates(
        outs, b_pad, k, margin_tiles, approx_select, t_top
    )
    return _trim_rescore_verify_compact(
        cand_rows, cand_vals, threshold, q, m_bf16, e_l2, a_l2,
        valid_mask, n, bsz, b_pad, k, rescore_rows, approx_select,
        tags=tags, return_candidates=return_candidates,
    )


def _trim_rescore_verify_compact(
    cand_rows, cand_vals, threshold, q, m_bf16, bf_e_l2, bf_a_l2,
    valid_mask, n, bsz, b_pad, k_req, rescore_rows, approx_select,
    residual=None, residual2=None, return_bounds=False, tags=None,
    return_candidates=False,
):
    """Compact-tier tail: bf16 rescore with per-candidate interval
    bounds and the SET certificate.

    True score s_j = (A_j + E_j)·q with A = f32(bf16 row); the rescore
    computes r_j = A_j·q (HIGHEST, f32 accumulation), so
    |s_j − r_j| ≤ ‖E_j‖‖q‖ + d·2⁻²³·‖A_j‖‖q‖ (+slack) = err_j — exact
    pack-time norms, query-time ‖q‖. With ``residual`` (the bf16r
    layout: prepare_residual's int8 quantization Ê of E), the rescore
    adds the dequantized correction, r_j = (A_j + s_j·Ê_j)·q, and the
    interval shrinks to the UN-quantized remainder:
    |s_j − r_j| ≤ ‖E_j − s_j·Ê_j‖‖q‖ + d·2⁻²³·(‖A_j‖ + ‖E_j‖)‖q‖.
    Set certificate per query:
        min over selected (r_i − err_i)
          > max(threshold, max over unselected candidates (r_j + err_j))
    ⇒ every selected row's TRUE score strictly beats every excluded
    row's TRUE score ⇒ the selected set IS the fp32 top-k set. All
    failure modes (selector miss, dup rows, boundary tie, short width)
    only raise the right-hand side — fail-closed like the exact tiers."""
    d = q.shape[1]
    k = k_req
    width = cand_rows.shape[1]
    # Containment certificate inputs, captured BEFORE the rescore trim:
    # ``threshold`` here is the tile-level exclusion bound (max of the
    # (kb+1)-th tile max and the selected tiles' (t_top+1)-th value), a
    # sound upper bound on the TRUE score of every row NOT in
    # ``cand_rows`` — so if the host later proves the k-th exact
    # candidate score strictly beats it, the exact top-k set is
    # provably CONTAINED in the candidate rows and a ~W-row f64
    # rescore replaces the full-matrix host GEMM
    # (VectorStore._host_candidate_patch). The trim threshold below is
    # deliberately NOT folded in: trimmed candidates are still
    # candidate ROWS, the host rescores them exactly.
    cont_rows, cont_thr = cand_rows, threshold
    if rescore_rows is not None and rescore_rows < width:
        rescore_rows = max(rescore_rows, k_req)
        if rescore_rows < width:
            v_idx, thr_exp = _topk_select(cand_vals, rescore_rows, approx_select)
            threshold = jnp.maximum(threshold, thr_exp)
            cand_rows = jnp.take_along_axis(cand_rows, v_idx, axis=1)
    cand_rows = jax.lax.sort(cand_rows, dimension=1)  # row-asc tie order
    dup = jnp.concatenate(
        [jnp.zeros((b_pad, 1), bool), cand_rows[:, 1:] == cand_rows[:, :-1]],
        axis=1,
    )
    slot_w = jax.lax.broadcasted_iota(jnp.int32, cand_rows.shape, 1)
    cand_rows = jnp.where(dup, _ROW_SENTINEL + slot_w, cand_rows)

    # -- bf16 rescore + per-candidate interval ----------------------------
    safe_rows = jnp.minimum(cand_rows, n - 1)
    gathered = jnp.take(m_bf16, safe_rows, axis=0).astype(jnp.float32)
    q_p = q if bsz == b_pad else jnp.pad(q, ((0, b_pad - bsz), (0, 0)))
    q_norm = jnp.linalg.norm(q_p, axis=1)  # [B] (1.0 for cosine)
    acc_eps = jnp.float32(d) * jnp.float32(2.0**-23)
    e_g = jnp.take(bf_e_l2, safe_rows, axis=0)
    a_g = jnp.take(bf_a_l2, safe_rows, axis=0)
    if residual is None:
        r = jax.lax.dot_general(
            q_p, gathered, (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [B, width]
        err = ((e_g + acc_eps * a_g) * q_norm[:, None]) * _BOUND_SLACK + _BOUND_EPS
    else:
        # The MXU dot's accumulation order is implementation-defined, so
        # its rigorous rounding bound is (d−1)·2⁻²³·‖A‖‖q‖ ≈ 4.6e-5 at
        # d=384 — BIGGER than the ~2e-5 residual the int8 correction
        # leaves (measured: it capped certification at 153/256 on 1M
        # random). Compute the main dot as an explicit pairwise tree on
        # the VPU instead: one RN rounding per level, ⌈log2 d⌉+1 levels
        # (products + ⌈log2 d⌉ adds) ⇒ bound ~1.2e-6 and the interval
        # collapses to ~e2_l2. The tensor is [B, width, d] (small).
        r_i8, r_scale, e2_l2 = residual
        corr = jnp.take(r_i8, safe_rows, axis=0).astype(jnp.float32)
        s_g = jnp.take(r_scale, safe_rows, axis=0)
        prod = q_p[:, None, :] * gathered  # [B, width, d], one RN round
        levels = 1
        while prod.shape[-1] > 1:
            dd = prod.shape[-1]
            if dd % 2:
                prod = jnp.pad(prod, ((0, 0), (0, 0), (0, 1)))
                dd += 1
            prod = prod.reshape(prod.shape[0], prod.shape[1], dd // 2, 2)
            prod = prod[..., 0] + prod[..., 1]  # one RN round per level
            levels += 1
        # correction dot on the MXU: its (d−1)u bound scales with the
        # RESIDUAL magnitude (‖s·Ê‖ ≤ e_g + e2_g ≈ 1.7e-3), ~8e-8; the
        # final add contributes one more level on ‖A‖.
        r = prod[..., 0] + s_g * jax.lax.dot_general(
            q_p, corr, (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        e2_g = jnp.take(e2_l2, safe_rows, axis=0)
        if residual2 is None:
            tree_eps = jnp.float32(levels + 1) * jnp.float32(2.0**-23)
            err = (
                (e2_g + tree_eps * a_g + acc_eps * (e_g + e2_g)) * q_norm[:, None]
            ) * _BOUND_SLACK + _BOUND_EPS
        else:
            # bf16rr: second correction dot on the level-2 residual.
            # True s = (A + E)·q with E = s₁r₁ + s₂r₂ + E₃; the rescore
            # now reconstructs both quantized levels, so the interval is
            # ‖E₃‖‖q‖ + the tree rounding (one extra final add ⇒
            # levels+2) + the MXU acc rounding of BOTH correction dots
            # (operand norms ‖s₁r₁‖ ≤ e+e₂ and ‖s₂r₂‖ ≤ e₂+e₃).
            r2_i8, r2_scale, e3_l2 = residual2
            corr2 = jnp.take(r2_i8, safe_rows, axis=0).astype(jnp.float32)
            s2_g = jnp.take(r2_scale, safe_rows, axis=0)
            r = r + s2_g * jax.lax.dot_general(
                q_p, corr2, (((1,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            e3_g = jnp.take(e3_l2, safe_rows, axis=0)
            tree_eps = jnp.float32(levels + 2) * jnp.float32(2.0**-23)
            err = (
                (e3_g + tree_eps * a_g
                 + acc_eps * (e_g + 2.0 * e2_g + e3_g)) * q_norm[:, None]
            ) * _BOUND_SLACK + _BOUND_EPS
    live = (cand_rows < n) & jnp.take(valid_mask, safe_rows, axis=0)
    if tags is not None:
        # Defensive re-check (the kernel already masked disallowed rows
        # so no candidate should fail it): a disallowed row surviving a
        # kernel bug scores -inf here and can never certify — the same
        # fail-closed posture as the dup-row sentinel above.
        from trueno_rag_tpu.ops.tags import tag_pred

        tag_bits, t_all, t_any, t_none = (jnp.asarray(t, jnp.int32) for t in tags)
        t_all_p = jnp.pad(t_all, (0, b_pad - bsz)) if b_pad != bsz else t_all
        t_any_p = jnp.pad(t_any, (0, b_pad - bsz)) if b_pad != bsz else t_any
        t_none_p = jnp.pad(t_none, (0, b_pad - bsz)) if b_pad != bsz else t_none
        live = live & tag_pred(
            jnp.take(tag_bits, safe_rows, axis=0),
            t_all_p[:, None], t_any_p[:, None], t_none_p[:, None],
        )
    r = jnp.where(live, r, NEG_INF)
    err = jnp.where(live, err, 0.0)

    # -- top-k by rescored value (ties: lowest row, rows sorted asc) ------
    k = min(k_req, width)
    top_s, idx = jax.lax.top_k(r, k)
    top_r = jnp.take_along_axis(cand_rows, idx, axis=1).astype(jnp.int32)
    top_err = jnp.take_along_axis(err, idx, axis=1)
    top_r = jnp.where(jnp.isneginf(top_s), -1, top_r)

    # -- SET certificate ---------------------------------------------------
    # selected lower bounds (empty slots -inf → certificate demands an
    # empty exclusion set, the truncation rule below)
    sel_lower = jnp.min(jnp.where(jnp.isneginf(top_s), jnp.inf, top_s - top_err), axis=1)
    sel_lower = jnp.where(jnp.isinf(sel_lower), NEG_INF, sel_lower)  # all-empty
    # excluded-candidate upper bounds, scatter-free (_topk_select's
    # count trick): selected-by-r = {r >= vmin} only when exactly k
    # entries tie-free reach vmin; otherwise fail closed
    vmin = top_s[:, k - 1]
    ge = r >= vmin[:, None]
    count = jnp.sum(ge, axis=1)
    excl_upper = jnp.max(jnp.where(ge, NEG_INF, r + err), axis=1)
    excl_upper = jnp.where(count == k, excl_upper, jnp.inf)
    # SHORT results (fewer live candidates than k — an empty or
    # near-empty allowed set under a selective tag filter, or a tiny
    # shard): every live candidate is selected, so no CANDIDATE is
    # excluded and the count trick (which sees vmin=-inf ⇒ count=width)
    # must not fire. The result is provably complete iff no
    # non-candidate allowed row can exist, i.e. threshold == -inf.
    # This keeps per-shard rhs finite in the sharded composition
    # (parallel/compact.py) instead of poisoning the global certificate
    # with +inf whenever one shard's allowed set is small.
    n_live = jnp.sum(~jnp.isneginf(r), axis=1)
    short = n_live < k
    rhs = jnp.where(short, threshold, jnp.maximum(threshold, excl_upper))
    per_q = jnp.where(
        short, jnp.isneginf(rhs), (sel_lower > rhs) | jnp.isneginf(rhs)
    )
    if k < k_req:
        # truncated width: only certify when provably nothing was excluded
        per_q = per_q & jnp.isneginf(rhs)
        top_s = jnp.pad(top_s, ((0, 0), (0, k_req - k)), constant_values=NEG_INF)
        top_r = jnp.pad(top_r, ((0, 0), (0, k_req - k)), constant_values=-1)
        top_err = jnp.pad(top_err, ((0, 0), (0, k_req - k)), constant_values=0.0)
    out = (top_s[:bsz], top_r[:bsz], per_q[:bsz])
    if return_bounds:
        # For cross-shard composition (parallel/compact.py): per-
        # candidate interval half-widths plus the exclusion upper bound
        # — the max TRUE score any non-returned local row could have.
        # Note rhs already folds every local failure mode (selector
        # miss, dup, tie, short width) into +inf, so a shard whose own
        # set is uncertified still composes fail-closed globally.
        out = out + (top_err[:bsz], rhs[:bsz])
    if return_candidates:
        # For the host candidate patch: the FULL (pre-trim) candidate
        # rows and the tile-level exclusion bound. Sentinel entries
        # (rows >= n: -inf / duplicate slots) are the caller's to drop.
        out = out + (cont_rows[:bsz], cont_thr[:bsz])
    return out


@functools.partial(
    jax.jit,
    static_argnames=("k", "margin_tiles", "metric", "tile_n", "use_int8_mxu", "rescore_rows", "approx_select", "t_top", "interpret", "return_candidates"),
)
def dense_topk_compact(
    queries: jax.Array,  # [B, d] f32
    m_bf16: jax.Array,  # [N, d] bf16 rescore copy (prepare_tiered)
    bf_e_l2: jax.Array,  # [N] f32 — ‖row − bf16(row)‖₂
    bf_a_l2: jax.Array,  # [N] f32 — ‖bf16(row)‖₂
    m_i8: jax.Array,  # [N, d] int8 scan copy (prepare_int8)
    s_row: jax.Array,  # [N] f32
    i8_e_l2: jax.Array,  # [N] f32
    i8_a_l2: jax.Array,  # [N] f32
    valid_mask: jax.Array,  # [N] bool
    k: int,
    margin_tiles: int = 32,
    metric: str = "cosine",
    tile_n: int = 2048,
    use_int8_mxu: bool = True,
    rescore_rows: int | None = 96,
    approx_select: bool = True,
    t_top: int = 4,
    interpret: bool = False,
    return_candidates: bool = False,
    tags: Tuple[jax.Array, ...] | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Compact tier: int8 tile scan + certified bf16 rescore, **no fp32
    matrix** → (scores [B,k] bf16-rescored, rows [B,k],
    set_certified [B] bool). ``tags`` filters exactly as in
    :func:`dense_topk_compact_bf16r`.

    Where ``set_certified[i]`` is True, query i's k rows are PROVABLY
    the exact fp32 top-k SET (reference semantics index.rs:386-412);
    scores/order within the set are bf16-rescored (≤ ~1e-3). There is
    no exact fallback at this storage footprint — uncertified queries
    are best-effort and flagged; callers needing them exact re-run with
    a larger ``margin_tiles``/``rescore_rows`` or on a sharded fp32
    deployment. The int8 scan-side quantization NEVER affects certified
    results (candidate proposal only); the bf16 bound governs the
    certificate width."""
    from trueno_rag_tpu.ops.pallas.scan_select_v2 import SEL, scan_select_int8_v3

    q = _metric_queries(queries, metric)
    n = m_bf16.shape[0]
    bsz = q.shape[0]
    q_i8, t_q, u_q, v_q = _int8_query_bounds(q)

    b_pad = max(8, -(-bsz // 8) * 8)
    tile = max(tile_n, SEL)
    n_pad = max(-(-n // tile) * tile, tile)
    if b_pad != bsz:
        q_i8 = jnp.pad(q_i8, ((0, b_pad - bsz), (0, 0)))
        t_q = jnp.pad(t_q, (0, b_pad - bsz), constant_values=1.0)
        u_q = jnp.pad(u_q, (0, b_pad - bsz))
        v_q = jnp.pad(v_q, (0, b_pad - bsz))
    if n_pad != n:
        m_i8_p = jnp.pad(m_i8, ((0, n_pad - n), (0, 0)))
        s_row_p = jnp.pad(s_row, (0, n_pad - n), constant_values=1.0)
        e_p = jnp.pad(i8_e_l2, (0, n_pad - n))
        a_p = jnp.pad(i8_a_l2, (0, n_pad - n))
        valid_p = jnp.pad(valid_mask, (0, n_pad - n), constant_values=False)
    else:
        m_i8_p, s_row_p, e_p, a_p, valid_p = m_i8, s_row, i8_e_l2, i8_a_l2, valid_mask

    outs = scan_select_int8_v3(
        q_i8, m_i8_p, s_row_p, e_p, a_p, valid_p.astype(jnp.int32), t_q,
        u_q, v_q, tile_n=tile, t_top=t_top, use_int8_mxu=use_int8_mxu,
        interpret=interpret, tags=_pad_tags(tags, n, n_pad, bsz, b_pad),
    )
    cand_rows, cand_vals, threshold = _tile_candidates(
        outs, b_pad, k, margin_tiles, approx_select, t_top
    )
    return _trim_rescore_verify_compact(
        cand_rows, cand_vals, threshold, q, m_bf16, bf_e_l2, bf_a_l2,
        valid_mask, n, bsz, b_pad, k, rescore_rows, approx_select,
        tags=tags, return_candidates=return_candidates,
    )
