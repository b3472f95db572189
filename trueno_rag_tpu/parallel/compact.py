"""Corpus-sharded COMPACT dense retrieval: certified top-k SETS over a
mesh with no fp32 matrix on any chip.

The single-chip compact tier (ops/dense_tiered.py, compact header)
serves ~10M chunks from one v5e in ~11.5 GB of bf16+int8 replicas.
Sharding the replicas row-wise over the mesh's ``data`` axis multiplies
that: a v5e-8 holds ~80M chunks at 3 B/element — or 10M in ~1.5 GB per
chip — while queries stay one program with an ICI merge.

Certificate composition (the part that is NOT just the dense sharding
of parallel/sharded.py): each shard's compact scan returns, besides its
local top-k candidates with residual-corrected scores, (a) per-candidate
interval half-widths ``err`` — |true − rescored| bounds — and (b) an
exclusion upper bound ``rhs`` — the max TRUE score any non-returned
local row could have, +inf if any local failure mode fired
(``return_bounds=True`` on :func:`dense_topk_compact_bf16r`). After the
k·s all-gather, the global set certificate per query is

    min over selected (s_i − err_i)
      > max( max over shards rhs_shard,
             max over unselected gathered (s_j + err_j) )

⇒ every selected row's true score strictly beats every excluded row's
— whether that row was another shard candidate or never left its
shard. A shard whose own set is uncertified composes fail-closed (its
rhs is +inf), so no local flag needs trusting. Ties fail closed, like
every certificate in this codebase.

Exactness contract: where ``certified[i]`` is True the returned row set
IS the global fp32 top-k set (reference semantics, index.rs:386-412);
scores and order within the set are corrected-rescore values (±~2e-5).

Communication per query batch: ``s·k`` candidates × 16 B
(score, row, err) + ``s`` rhs scalars — still independent of N.
"""

from __future__ import annotations

import functools

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from trueno_rag_tpu.ops.dense import NEG_INF
from trueno_rag_tpu.ops.dense_tiered import (
    dense_topk_compact_bf16r,
    dense_topk_compact_bf16rr,
    prepare_residual,
    prepare_residual2,
    prepare_tiered,
)


def merge_bounded_candidates(s, r_glob, err, rhs, k: int, axis: str):
    """Inside shard_map: merge each shard's k bounded candidates and
    exclusion bound into the global top-k + composed SET certificate →
    ``(scores [B,k], rows [B,k] int32, certified [B])``.

    ``r_glob`` must be GLOBAL row ids with INT32_MAX for empty slots.
    Shard-axis concatenation preserves global row-ascending order, so
    lax.top_k's earlier-position tie preference keeps the (score desc,
    row asc) total order. Shared by the compact and clustered sharded
    tiers (each shard's ``rhs`` already folds its own failure modes —
    and, for clustered, its pruned-tile bound — so composition needs no
    per-tier knowledge)."""
    s_all = jax.lax.all_gather(s, axis, axis=1, tiled=True)  # [B, k*s]
    r_all = jax.lax.all_gather(r_glob, axis, axis=1, tiled=True)
    e_all = jax.lax.all_gather(err, axis, axis=1, tiled=True)
    rhs_all = jax.lax.all_gather(rhs[:, None], axis, axis=1, tiled=True)
    shard_bound = jnp.max(rhs_all, axis=1)  # [B]

    k_out = min(k, s_all.shape[1])
    s_top, idx = jax.lax.top_k(s_all, k_out)
    r_top = jnp.take_along_axis(r_all, idx, axis=1)
    e_top = jnp.take_along_axis(e_all, idx, axis=1)

    # global SET certificate (same structure as the single-chip tail;
    # scatter-free count-based selection identification)
    sel_lower = jnp.min(
        jnp.where(jnp.isneginf(s_top), jnp.inf, s_top - e_top), axis=1
    )
    sel_lower = jnp.where(jnp.isinf(sel_lower), NEG_INF, sel_lower)
    vmin = s_top[:, k_out - 1]
    ge = s_all >= vmin[:, None]
    count = jnp.sum(ge, axis=1)
    excl_upper = jnp.max(jnp.where(ge, NEG_INF, s_all + e_all), axis=1)
    excl_upper = jnp.where(count == k_out, excl_upper, jnp.inf)
    # SHORT results (global live candidates < k — e.g. a selective tag
    # filter allowing fewer than k rows corpus-wide): every live
    # candidate is selected, so no gathered candidate is excluded;
    # complete iff no shard can hold an unreturned allowed row
    # (shard_bound == -inf). Mirrors the single-chip short rule in
    # ops/dense_tiered._trim_rescore_verify_compact.
    n_live = jnp.sum(~jnp.isneginf(s_all), axis=1)
    short = n_live < k_out
    rhs_g = jnp.where(short, shard_bound, jnp.maximum(shard_bound, excl_upper))
    ok = jnp.where(
        short, jnp.isneginf(rhs_g), (sel_lower > rhs_g) | jnp.isneginf(rhs_g)
    )

    r_out = jnp.where(jnp.isneginf(s_top), -1, r_top).astype(jnp.int32)
    if k_out < k:
        s_top = jnp.pad(s_top, ((0, 0), (0, k - k_out)), constant_values=NEG_INF)
        r_out = jnp.pad(r_out, ((0, 0), (0, k - k_out)), constant_values=-1)
    return s_top, r_out, ok


def host_exact_patch(
    host: np.ndarray,  # [n, d] f32 original-order rows
    valid_host: np.ndarray,  # [n] bool
    tags_host,  # [n] int32 or None
    metric: str,
    q,  # [B, d] (device or host)
    s,  # [B, k] device scores
    r,  # [B, k] device rows (GLOBAL original ids)
    ok_np: np.ndarray,  # [B] bool — False entries get patched
    k: int,
    tag_masks=None,
):
    """Exact host re-run for uncertified queries: float64 accumulation,
    (score desc, row asc) ties — the same true-score order the
    certificate proves for certified queries (mirrors
    VectorStore._host_exact_patch). Shared by the compact and clustered
    sharded indexes. → (scores, rows) jnp arrays with the bad entries
    replaced."""
    s_np, r_np = np.asarray(s).copy(), np.asarray(r).copy()
    qn = np.asarray(q, dtype=np.float64)
    if metric == "cosine":
        norms = np.linalg.norm(qn, axis=1, keepdims=True)
        qn = qn / np.where(norms == 0.0, 1.0, norms)
    for i in np.flatnonzero(~ok_np):
        scores = host.astype(np.float64) @ qn[i]
        scores[~valid_host] = -np.inf
        if tag_masks is not None:
            bits = tags_host
            t_all = int(np.asarray(tag_masks[0])[i])
            t_any = int(np.asarray(tag_masks[1])[i])
            t_none = int(np.asarray(tag_masks[2])[i])
            allowed = (bits & t_all) == t_all
            allowed &= (t_any == 0) | ((bits & t_any) != 0)
            allowed &= (bits & t_none) == 0
            scores[~allowed] = -np.inf
        order = np.argsort(-scores, kind="stable")[:k]
        live = np.isfinite(scores[order])
        r_np[i, : len(order)] = np.where(live, order, -1)
        s_np[i, : len(order)] = np.where(
            live, scores[order], NEG_INF
        ).astype(np.float32)
        if len(order) < k:
            r_np[i, len(order):] = -1
            s_np[i, len(order):] = NEG_INF
    return jnp.asarray(s_np), jnp.asarray(r_np)


def sharded_compact_topk(
    queries: jax.Array,  # [B, d] f32, replicated
    m_bf16: jax.Array,  # [N, d] bf16, sharded P(axis, None)
    e_l2: jax.Array,  # [N] f32, sharded P(axis)
    a_l2: jax.Array,  # [N] f32
    r_i8: jax.Array,  # [N, d] int8
    r_scale: jax.Array,  # [N] f32
    e2_l2: jax.Array,  # [N] f32
    valid_mask: jax.Array,  # [N] bool
    k: int,
    mesh: Mesh,
    metric: str = "cosine",
    axis: str = "data",
    tile_n: int = 2048,
    interpret: bool = False,
    tags: Optional[Tuple[jax.Array, ...]] = None,
    residual2: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Certified-set top-k over row-sharded compact (bf16r) replicas.

    Returns ``(scores [B,k], rows [B,k] global ids, certified [B])``.

    ``tags`` = (tag_bits [N] i32 — sharded with the rows, t_all [B],
    t_any [B], t_none [B] — replicated): the filter predicate evaluates
    shard-locally inside each scan kernel (no extra communication), and
    the composed global certificate proves the exact top-k set AMONG
    ALLOWED rows — disallowed rows are -inf on both sides of the bound.

    ``residual2`` = (r2_i8 [N,d] int8, r2_scale [N] f32, e3_l2 [N] f32)
    from :func:`prepare_residual2` engages the bf16rr two-level rescore
    (same scan, ~15x narrower certificate interval, 4 B/elem).
    """

    layout = "bf16r" if residual2 is None else "bf16rr"
    args = [queries, m_bf16, e_l2, a_l2, r_i8, r_scale, e2_l2]
    if residual2 is not None:
        args += list(residual2)
    args += [valid_mask]
    if tags is not None:
        args += list(tags)
    return _sharded_compact_fn(
        mesh, axis, k, metric, tile_n, interpret, tags is not None, False,
        layout,
    )(*args)


@functools.lru_cache(maxsize=64)
def _sharded_compact_fn(mesh, axis, k, metric, tile_n, interpret, has_tags,
                        with_candidates, layout="bf16r"):
    """One jitted program per static config — a fresh shard_map+jit per
    call would retrace and RECOMPILE every search batch (same fix as
    sparse.py's _sharded_bm25_fn / sharded.py's _sharded_dense_fn).

    ``with_candidates=True`` additionally returns the all-gathered
    GLOBAL candidate rows ``cand [B, s·W]`` (INT32_MAX empties) and the
    composed containment threshold ``thr [B]`` = max over shards of the
    shard's tile-level exclusion bound — a sound upper bound on the
    TRUE score of every row outside the gathered candidates, because
    each row lives on exactly one shard and is either among that
    shard's candidates or bounded by that shard's threshold. This is
    the sharded form of the r4 containment certificate: the host
    patch f64-rescores just the union instead of running the global
    GEMM (ShardedCompactIndex.search). Communication adds s·W int32
    per query (~10 KB at s=8, W=328) — still N-independent."""

    def local(q, mb, el, al, ri, rs, e2, *rest):
        # layout "bf16rr" threads the level-2 residual triplet through
        # to the two-level rescore (4 B/elem per shard, certificate
        # interval ~1.5e-6 vs ~2e-5 — near-100% device certification on
        # the mesh, where this layout's memory actually fits: 10.5M
        # does NOT fit one chip at 4 B/elem but 2+ shards do).
        if layout == "bf16rr":
            r2, rs2, e3, v, *tag_args = rest
            out = dense_topk_compact_bf16rr(
                q, mb, el, al, ri, rs, e2, r2, rs2, e3, v, k,
                metric=metric, tile_n=tile_n, interpret=interpret,
                return_bounds=True, return_candidates=with_candidates,
                tags=tuple(tag_args) if tag_args else None,
            )
        else:
            v, *tag_args = rest
            out = dense_topk_compact_bf16r(
                q, mb, el, al, ri, rs, e2, v, k, metric=metric,
                tile_n=tile_n, interpret=interpret, return_bounds=True,
                return_candidates=with_candidates,
                tags=tuple(tag_args) if tag_args else None,
            )
        s, r, _ok, err, rhs = out[:5]
        local_n = mb.shape[0]
        shard = jax.lax.axis_index(axis)
        r_glob = jnp.where(r >= 0, r + shard * local_n, jnp.iinfo(jnp.int32).max)
        merged = merge_bounded_candidates(s, r_glob, err, rhs, k, axis)
        if not with_candidates:
            return merged
        cand, thr = out[5], out[6]
        cand_g = jnp.where(
            (cand >= 0) & (cand < local_n), cand + shard * local_n,
            jnp.iinfo(jnp.int32).max,
        ).astype(jnp.int32)
        cand_all = jax.lax.all_gather(cand_g, axis, axis=1, tiled=True)
        thr_all = jnp.max(
            jax.lax.all_gather(thr[:, None], axis, axis=1, tiled=True), axis=1
        )
        return merged + (cand_all, thr_all)

    in_specs = [P(), P(axis, None), P(axis), P(axis), P(axis, None),
                P(axis), P(axis)]
    if layout == "bf16rr":
        in_specs += [P(axis, None), P(axis), P(axis)]
    in_specs += [P(axis)]
    if has_tags:
        in_specs += [P(axis), P(), P(), P()]
    out_specs = (P(), P(), P())
    if with_candidates:
        out_specs += (P(), P())
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=out_specs,
        # outputs ARE replicated (identical all-gather + certificate on
        # every shard); inference can't see through axis_index
        check_vma=False,
    )
    return jax.jit(fn)


class ShardedCompactIndex:
    """Read-optimized sharded compact index: per-chip memory is
    3 bytes/element of the shard — no fp32 matrix anywhere on device.

    ``keep_host=True`` (default) retains the host fp32 matrix and
    patches uncertified queries with an exact host top-k (float64
    accumulation — the same true-score order the certificate proves for
    certified queries), mirroring the single-chip VectorStore's
    ``compact_fallback="host"``. Pass False to drop it (10M×384 fp32 is
    15 GB of host RAM) and serve best-effort flagged results instead.

    ``layout="bf16rr"`` adds the second int8 residual level (4 B/elem
    per shard vs 3): the scan is identical but the rescore interval
    collapses ~2e-5 → ~1.5e-6, measured +5.6% cost for device
    certification 95.7% → 99.6% at 4M (benches/bf16rr_probe.py). The
    mesh is where this layout belongs — 10.5M×384 at 4 B/elem (16.1 GB)
    does not fit ONE chip, but ≥2 shards hold it with room to spare, so
    sharded deployments get near-100% device certification and the host
    patch all but leaves the serving path.
    """

    def __init__(
        self,
        matrix: np.ndarray,
        mesh: Mesh,
        metric: str = "cosine",
        valid: Optional[np.ndarray] = None,
        axis: str = "data",
        rows_normalized: bool = False,
        tile_n: int = 2048,
        keep_host: bool = True,
        interpret: Optional[bool] = None,
        tags: Optional[np.ndarray] = None,
        layout: str = "bf16r",
    ) -> None:
        if layout not in ("bf16r", "bf16rr"):
            from trueno_rag_tpu.errors import InvalidConfigError

            raise InvalidConfigError(
                f"unknown compact shard layout {layout!r} (bf16r|bf16rr)"
            )
        self.layout = layout
        matrix = np.asarray(matrix, dtype=np.float32)
        n, d = matrix.shape
        self.n, self.metric, self.mesh, self.axis = n, metric, mesh, axis
        self.tile_n = tile_n
        if interpret is None:  # Pallas needs interpret mode off-TPU
            interpret = jax.devices()[0].platform not in ("tpu", "axon")
        self.interpret = interpret
        s = mesh.shape[axis]
        n_pad = ((n + s - 1) // s) * s
        if metric == "cosine" and not rows_normalized:
            norms = np.linalg.norm(matrix, axis=1, keepdims=True)
            matrix = matrix / np.where(norms == 0.0, 1.0, norms)
        if n_pad != n:
            matrix = np.pad(matrix, ((0, n_pad - n), (0, 0)))
        if metric not in ("cosine", "dot"):
            from trueno_rag_tpu.errors import InvalidConfigError

            raise InvalidConfigError("compact sharding supports cosine/dot metrics")
        v = np.zeros(n_pad, dtype=bool)
        v[:n] = True if valid is None else np.asarray(valid, dtype=bool)[:n]
        self._host = matrix[:n] if keep_host else None
        self._valid_host = v[:n]

        # Replica prep is row-wise independent, so preparing globally
        # and sharding after is equivalent to per-shard prep. (On a real
        # pod, prepare per host-slab and device_put each shard to avoid
        # materializing the fp32 matrix on one device.)
        mb, el, al = prepare_tiered(jnp.asarray(matrix))
        if layout == "bf16rr":
            ri, rs, e2, r2, rs2, e3 = prepare_residual2(jnp.asarray(matrix))
        else:
            ri, rs, e2 = prepare_residual(jnp.asarray(matrix))
            r2 = rs2 = e3 = None
        row_sh = NamedSharding(mesh, P(axis, None))
        vec_sh = NamedSharding(mesh, P(axis))
        self.m_bf16 = jax.device_put(mb, row_sh)
        self.e_l2 = jax.device_put(el, vec_sh)
        self.a_l2 = jax.device_put(al, vec_sh)
        self.r_i8 = jax.device_put(ri, row_sh)
        self.r_scale = jax.device_put(rs, vec_sh)
        self.e2_l2 = jax.device_put(e2, vec_sh)
        if layout == "bf16rr":
            self.r2_i8 = jax.device_put(r2, row_sh)
            self.r2_scale = jax.device_put(rs2, vec_sh)
            self.e3_l2 = jax.device_put(e3, vec_sh)
        self.valid = jax.device_put(jnp.asarray(v), vec_sh)
        self._tags_host = None
        self.tags = None
        if tags is not None:
            self.set_tags(tags)
        self.uncertified = 0  # observability counters
        self.candidate_patched = 0  # exact via the sharded containment patch
        self.gemm_patched = 0  # global-GEMM last resorts

    def set_tags(self, tags: np.ndarray) -> None:
        """(Re-)upload the per-row tag words, sharded with the rows —
        called at build and on registry tag edits (version-keyed by the
        owner, e.g. ShardedHybridIndex._refresh_tags_if_stale)."""
        t = np.zeros(self.valid.shape[0], dtype=np.int32)
        t[: min(self.n, len(tags))] = np.asarray(tags, np.int32)[: self.n]
        self._tags_host = t[: self.n]
        self.tags = jax.device_put(
            jnp.asarray(t), NamedSharding(self.mesh, P(self.axis))
        )

    def search(self, queries: np.ndarray, k: int, tag_masks=None):
        """→ ``(scores [B,k], rows [B,k], certified [B])``; with a host
        matrix, uncertified queries are patched exactly and reported
        certified=True in the returned flag's companion counter.

        ``tag_masks`` = per-query ``(t_all, t_any, t_none)`` int32 words
        (requires :meth:`set_tags`): the filter evaluates shard-locally
        inside the scan; certified queries return the provably exact
        top-k set among allowed rows, and the host patch applies the
        same filter."""
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, dtype=np.float32)))
        tags = None
        if tag_masks is not None:
            if self.tags is None:
                from trueno_rag_tpu.errors import InvalidConfigError

                raise InvalidConfigError("tag_masks given but no tags were set")
            tags = (
                self.tags,
                jnp.asarray(np.asarray(tag_masks[0], np.int32)),
                jnp.asarray(np.asarray(tag_masks[1], np.int32)),
                jnp.asarray(np.asarray(tag_masks[2], np.int32)),
            )
        args = [q, self.m_bf16, self.e_l2, self.a_l2, self.r_i8,
                self.r_scale, self.e2_l2]
        if self.layout == "bf16rr":
            args += [self.r2_i8, self.r2_scale, self.e3_l2]
        args += [self.valid]
        if tags is not None:
            args += list(tags)
        with_cand = self._host is not None
        out = _sharded_compact_fn(
            self.mesh, self.axis, k, self.metric, self.tile_n,
            self.interpret, tags is not None, with_cand, self.layout,
        )(*args)
        s, r, ok = out[:3]
        ok_np = np.asarray(ok).astype(bool)
        misses = int((~ok_np).sum())
        self.uncertified += misses
        if misses and self._host is not None:
            # containment first (sharded r4 form): the union of every
            # shard's candidate rows + the max shard threshold prove
            # the exact GLOBAL top-k lies inside the union — the f64
            # rescore of ~s·W rows replaces the global GEMM
            s_p, r_p, unresolved = self._containment_patch(
                np.asarray(q), np.asarray(s), np.asarray(r), ok_np, k,
                np.asarray(out[3]), np.asarray(out[4]), tag_masks)
            if len(unresolved):
                gm = np.ones_like(ok_np)
                gm[unresolved] = False
                s_p, r_p = host_exact_patch(
                    self._host, self._valid_host, self._tags_host,
                    self.metric, q, s_p, r_p, gm, k, tag_masks=tag_masks,
                )
                self.gemm_patched += len(unresolved)
            return jnp.asarray(s_p), jnp.asarray(r_p), jnp.ones_like(ok)
        return s, r, ok

    def _containment_patch(self, q, s, r, ok_np, k, cand, thr,
                           tag_masks=None):
        """Vectorized union rescore + containment check (the sharded
        analog of VectorStore._host_candidate_patch): exact f64 scores
        over each bad query's gathered candidate rows, (score desc,
        row asc) ties; contained iff the exact k-th strictly beats the
        composed shard threshold. Returns (scores, rows, unresolved)."""
        bad = np.flatnonzero(~ok_np)
        n = self._host.shape[0]
        s_np, r_np = s.copy(), r.copy()
        cr = cand[bad].astype(np.int64)  # [B', s*W]
        live = (cr >= 0) & (cr < n)
        safe = np.where(live, cr, 0)
        live &= self._valid_host[safe]
        if tag_masks is not None and self._tags_host is not None:
            bits = self._tags_host[safe]
            t_all = np.asarray(tag_masks[0], np.int32)[bad, None]
            t_any = np.asarray(tag_masks[1], np.int32)[bad, None]
            t_none = np.asarray(tag_masks[2], np.int32)[bad, None]
            allowed = (bits & t_all) == t_all
            allowed &= (t_any == 0) | ((bits & t_any) != 0)
            allowed &= (bits & t_none) == 0
            live &= allowed
        qv = q[bad].astype(np.float64)
        if self.metric == "cosine":
            nrm = np.linalg.norm(qv, axis=1, keepdims=True)
            qv = qv / np.where(nrm == 0.0, 1.0, nrm)
        g = self._host[safe].astype(np.float64)
        sc = np.einsum("bwd,bd->bw", g, qv)
        sc[~live] = -np.inf
        # candidate rows can repeat only through padding sentinels
        # (shards are disjoint row ranges) — dedupe defensively anyway
        sort_rows = np.where(live, cr, np.iinfo(np.int64).max)
        srt = np.sort(sort_rows, axis=1)
        if (srt[:, 1:] == srt[:, :-1])[(srt[:, 1:] < n)].any():
            for bi in range(cr.shape[0]):
                seen = set()
                for wi in range(cr.shape[1]):
                    if not live[bi, wi]:
                        continue
                    rr = int(cr[bi, wi])
                    if rr in seen:
                        live[bi, wi] = False
                        sc[bi, wi] = -np.inf
                    else:
                        seen.add(rr)
            sort_rows = np.where(live, cr, np.iinfo(np.int64).max)
        kk = min(k, cr.shape[1])
        order = np.lexsort((sort_rows, -sc), axis=-1)[:, :kk]
        top_s = np.take_along_axis(sc, order, axis=1)
        top_r = np.take_along_axis(safe, order, axis=1)
        if kk < k:
            top_s = np.pad(top_s, ((0, 0), (0, k - kk)),
                           constant_values=-np.inf)
            top_r = np.pad(top_r, ((0, 0), (0, k - kk)))
        n_live = live.sum(axis=1)
        thr_b = thr[bad].astype(np.float64)
        contained = np.where(
            n_live >= k, thr_b < top_s[:, k - 1] if k > 0 else False,
            np.isneginf(thr_b),
        )
        dead = np.isneginf(top_s)
        top_r = np.where(dead, -1, top_r)
        top_s32 = top_s.astype(np.float32)
        top_s32[dead] = NEG_INF
        fixed = bad[contained]
        s_np[fixed] = top_s32[contained]
        r_np[fixed] = top_r[contained]
        self.candidate_patched += int(contained.sum())
        return s_np, r_np, bad[~contained]
