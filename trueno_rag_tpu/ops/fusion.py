"""Rank fusion on device over padded top-k candidate arrays.

Vectorized recast of the reference's HashMap-based ``FusionStrategy::fuse``
(reference: fusion.rs:39-224). Candidate lists arrive as fixed-width
``(rows, scores)`` pairs (row ``-1`` + score ``-inf`` = empty slot), i.e.
exactly what :func:`trueno_rag_tpu.ops.dense.dense_topk` and
:func:`trueno_rag_tpu.ops.bm25.bm25_topk_segments` emit, so hybrid retrieval is a
single XLA program: dense matmul + BM25 scatter + fusion + final top-k
with no host round-trip.

Id matching between the two lists uses a ``[Kd, Ks]`` equality matrix —
for candidate widths of ~50 this is a trivial VPU op and avoids any
sorting/hashing of ids on device.

Semantics per variant match the reference exactly (see fusion.rs:65-224
and SURVEY §2.5): RRF ``Σ 1/(k + rank + 1)``; Linear min-max normalizes
each list (all-equal → all 1.0) then weights; Convex = Linear(alpha);
DBSF z-scores each list (σ=0 → 0.0) and sums; Union keeps dense entries
(score, rank) and appends unmatched sparse at rank offset ``|dense|``;
Intersection keeps matched ids at the mean of the two scores.

Output ordering is deterministic: (score desc, row asc); Union orders by
(rank asc, row asc) and carries original scores, as in the reference.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")
FUSION_KINDS = ("rrf", "linear", "convex", "dbsf", "union", "intersection")


def _minmax_norm(scores: jax.Array, valid: jax.Array) -> jax.Array:
    """Min-max to [0,1] over valid entries; all-equal → all 1.0
    (reference: fusion.rs:183-202)."""
    big = jnp.where(valid, scores, NEG_INF)
    small = jnp.where(valid, scores, jnp.inf)
    mx = jnp.max(big)
    mn = jnp.min(small)
    rng = mx - mn
    return jnp.where(rng > 0.0, (scores - mn) / jnp.where(rng > 0.0, rng, 1.0), 1.0)


def _zscore_norm(scores: jax.Array, valid: jax.Array) -> jax.Array:
    """Z-score over valid entries; zero variance → all 0.0
    (reference: fusion.rs:204-224)."""
    n = jnp.maximum(jnp.sum(valid), 1)
    mean = jnp.sum(jnp.where(valid, scores, 0.0)) / n
    var = jnp.sum(jnp.where(valid, (scores - mean) ** 2, 0.0)) / n
    std = jnp.sqrt(var)
    return jnp.where(std > 0.0, (scores - mean) / jnp.where(std > 0.0, std, 1.0), 0.0)


def _sort_desc(rows: jax.Array, scores: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Deterministic (score desc, row asc) ordering; invalid slots last."""
    key1 = jnp.where(jnp.isneginf(scores), jnp.inf, -scores)
    _, _, rows_s, scores_s = jax.lax.sort((key1, rows, rows, scores), num_keys=2)
    rows_s = jnp.where(jnp.isneginf(scores_s), -1, rows_s)
    return rows_s, scores_s


def _fuse_one(rows_d, scores_d, rows_s, scores_s, kind: str, param: float):
    kd, ks = rows_d.shape[0], rows_s.shape[0]
    valid_d = rows_d >= 0
    valid_s = rows_s >= 0
    # match[i, j]: dense slot i and sparse slot j name the same chunk row
    match = (rows_d[:, None] == rows_s[None, :]) & valid_d[:, None] & valid_s[None, :]
    matched_d = jnp.any(match, axis=1)
    matched_s = jnp.any(match, axis=0)

    def from_sparse(vals_s):
        """For each dense slot, the matched sparse value (or 0)."""
        return jnp.sum(jnp.where(match, vals_s[None, :], 0.0), axis=1)

    rank_d = jax.lax.broadcasted_iota(jnp.int32, (kd, 1), 0).squeeze(-1)
    rank_s = jax.lax.broadcasted_iota(jnp.int32, (ks, 1), 0).squeeze(-1)

    if kind == "rrf":
        k = param
        v_d = 1.0 / (k + rank_d.astype(jnp.float32) + 1.0)
        v_s = 1.0 / (k + rank_s.astype(jnp.float32) + 1.0)
        f_d = v_d + from_sparse(v_s)
        f_s = v_s
    elif kind in ("linear", "convex"):
        w = param
        nd = _minmax_norm(scores_d, valid_d)
        ns = _minmax_norm(scores_s, valid_s)
        f_d = w * nd + (1.0 - w) * from_sparse(ns)
        f_s = (1.0 - w) * ns
    elif kind == "dbsf":
        zd = _zscore_norm(scores_d, valid_d)
        zs = _zscore_norm(scores_s, valid_s)
        f_d = zd + from_sparse(zs)
        f_s = zs
    elif kind == "union":
        n_dense = jnp.sum(valid_d.astype(jnp.int32))
        include_s = valid_s & ~matched_s
        # order key = rank; dense first, unmatched sparse offset by |dense|
        # (reference: fusion.rs:140-160 — dense wins ties, original scores kept)
        intmax = jnp.iinfo(jnp.int32).max
        keys = jnp.concatenate(
            [
                jnp.where(valid_d, rank_d, intmax),
                jnp.where(include_s, n_dense + rank_s, intmax),
            ]
        )
        rows_all = jnp.concatenate(
            [jnp.where(valid_d, rows_d, -1), jnp.where(include_s, rows_s, -1)]
        )
        scores_all = jnp.concatenate(
            [
                jnp.where(valid_d, scores_d, NEG_INF),
                jnp.where(include_s, scores_s, NEG_INF),
            ]
        )
        _, rows_o, scores_o = jax.lax.sort((keys, rows_all, scores_all), num_keys=2)
        return rows_o, scores_o
    elif kind == "intersection":
        f_d = jnp.where(matched_d, (scores_d + from_sparse(scores_s)) / 2.0, NEG_INF)
        rows_all = jnp.concatenate([rows_d, jnp.full((ks,), -1, jnp.int32)])
        scores_all = jnp.concatenate(
            [jnp.where(matched_d & valid_d, f_d, NEG_INF), jnp.full((ks,), NEG_INF)]
        )
        return _sort_desc(rows_all, scores_all)
    else:
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(f"unknown fusion kind: {kind!r}")

    # Common tail for rrf/linear/dbsf: dense slots fused, sparse slots only
    # when not already represented by a dense slot.
    scores_all = jnp.concatenate(
        [
            jnp.where(valid_d, f_d, NEG_INF),
            jnp.where(valid_s & ~matched_s, f_s, NEG_INF),
        ]
    )
    rows_all = jnp.concatenate([rows_d, jnp.where(matched_s, -1, rows_s)])
    return _sort_desc(rows_all, scores_all)


def _fuse_many_one(rows_t, scores_t, kind: str, param: float, weights):
    """N-way fusion for ONE query over concatenated candidate slots.

    ``rows_t``/``scores_t`` are tuples of ``[K_j]`` arrays (one per
    source list, priority order). Candidate lists are assumed
    unique-rowed within each list (what every top-k op in this package
    emits); accumulation across lists deduplicates by row with the
    first-occurrence slot owning the fused entry. Host oracle:
    :meth:`trueno_rag_tpu.fusion.FusionStrategy.fuse_many`.
    """
    n_lists = len(rows_t)
    ks = [r.shape[0] for r in rows_t]
    rows_all = jnp.concatenate(rows_t)  # [K]
    scores_all = jnp.concatenate(scores_t)
    k_total = rows_all.shape[0]
    valid = rows_all >= 0
    lid = jnp.concatenate(
        [jnp.full((k,), j, jnp.int32) for j, k in enumerate(ks)]
    )
    rank = jnp.concatenate([jax.lax.iota(jnp.int32, k) for k in ks])
    # eq[i, j]: slots i and j name the same valid chunk row
    eq = (rows_all[:, None] == rows_all[None, :]) & valid[:, None] & valid[None, :]
    idx = jnp.arange(k_total)
    # ownership: the FIRST slot naming a row owns its fused entry
    dup_earlier = jnp.any(eq & (idx[None, :] < idx[:, None]), axis=1)
    own = valid & ~dup_earlier

    if kind == "rrf":
        vals = 1.0 / (param + rank.astype(jnp.float32) + 1.0)
        fused = jnp.sum(jnp.where(eq, vals[None, :], 0.0), axis=1)
    elif kind in ("linear", "convex"):
        vals = jnp.concatenate([
            w * _minmax_norm(s, r >= 0)
            for w, s, r in zip(weights, scores_t, rows_t)
        ])
        fused = jnp.sum(jnp.where(eq, vals[None, :], 0.0), axis=1)
    elif kind == "dbsf":
        vals = jnp.concatenate([
            _zscore_norm(s, r >= 0) for s, r in zip(scores_t, rows_t)
        ])
        fused = jnp.sum(jnp.where(eq, vals[None, :], 0.0), axis=1)
    elif kind == "union":
        # keep entries unmatched in every EARLIER list; output order =
        # (list priority, within-list rank) — exactly the host order
        matched_earlier = jnp.any(eq & (lid[None, :] < lid[:, None]), axis=1)
        include = valid & ~matched_earlier
        intmax = jnp.iinfo(jnp.int32).max
        # offset list j by the count of VALID slots in earlier lists and
        # tiebreak on rows — exactly `_fuse_one`'s union key space, so
        # fuse_topk_many((d, s)) == fuse_topk(d, s) even when candidate
        # lists carry interior invalid holes (post-tag-filter lists do)
        n_valid = jnp.sum(
            (valid[:, None] & (lid[:, None] == jnp.arange(n_lists)[None, :]))
            .astype(jnp.int32),
            axis=0,
        )  # [L]
        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(n_valid)[:-1]]
        )
        keys = jnp.where(include, offsets[lid] + rank, intmax)
        rows_u = jnp.where(include, rows_all, -1)
        scores_u = jnp.where(include, scores_all, NEG_INF)
        _, rows_o, scores_o = jax.lax.sort((keys, rows_u, scores_u), num_keys=2)
        return rows_o, scores_o
    elif kind == "intersection":
        # rows present in ALL lists; score = mean of per-list scores.
        # match_lists[i, m]: row i has a match in list m
        onehot = lid[:, None] == jnp.arange(n_lists)[None, :]  # [K, L]
        match_lists = jnp.any(eq[:, :, None] & onehot[None, :, :], axis=1)
        in_all = jnp.all(match_lists, axis=1)
        total = jnp.sum(jnp.where(eq, scores_all[None, :], 0.0), axis=1)
        fused = total / float(n_lists)
        own = own & in_all
    else:
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(f"unknown fusion kind: {kind!r}")

    out_scores = jnp.where(own, fused, NEG_INF)
    out_rows = jnp.where(own, rows_all, -1)
    return _sort_desc(out_rows, out_scores)


@functools.partial(jax.jit, static_argnames=("kind", "param", "weights"))
def fuse_topk_many(
    rows: Tuple[jax.Array, ...],
    scores: Tuple[jax.Array, ...],
    kind: str = "rrf",
    param: float = 60.0,
    weights: Tuple[float, ...] = (),
) -> Tuple[jax.Array, jax.Array]:
    """Batched N-way fusion: tuples of ``[B, K_j]`` candidate arrays →
    ``[B, ΣK_j]`` (rows, scores), deterministically ordered, invalid
    slots ``(-1, -inf)``. ``weights`` (static) are the per-list Linear/
    Convex weights from :meth:`FusionStrategy.resolve_weights`; pass
    ``()`` for rank/z-based kinds. ``fuse_topk_many((d, s), …)`` matches
    :func:`fuse_topk` on the same two lists."""
    rows = tuple(rows)
    scores = tuple(scores)
    if kind in ("linear", "convex") and len(weights) != len(rows):
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(
            f"got {len(weights)} fusion weights for {len(rows)} lists"
        )
    fn = functools.partial(_fuse_many_one, kind=kind, param=param, weights=weights)
    return jax.vmap(fn)(rows, scores)


@functools.partial(jax.jit, static_argnames=("kind", "param"))
def fuse_topk(
    rows_d: jax.Array,
    scores_d: jax.Array,
    rows_s: jax.Array,
    scores_s: jax.Array,
    kind: str = "rrf",
    param: float = 60.0,
) -> Tuple[jax.Array, jax.Array]:
    """Batched fusion: ``[B, Kd]`` + ``[B, Ks]`` → ``[B, Kd+Ks]``
    (rows, scores) deterministically ordered, invalid slots ``(-1, -inf)``.
    ``param`` is the RRF k / Linear dense weight / Convex alpha."""
    fn = functools.partial(_fuse_one, kind=kind, param=param)
    return jax.vmap(fn)(rows_d, scores_d, rows_s, scores_s)
