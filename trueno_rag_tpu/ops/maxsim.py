"""Late-interaction (MaxSim) retrieval ops: exact full scan + certified
centroid-pruned top-k over a device-resident token matrix.

The reference has no multi-vector retrieval at all (its rerankers are
lexical/mock, rerank.rs:17-264, and retrieval is single-vector,
index.rs:386-412); :mod:`trueno_rag_tpu.models.late_interaction` already
provides ColBERT-style MaxSim *reranking*. This module promotes late
interaction to a first-class RETRIEVAL tier over the whole corpus:

    MaxSim(q, D) = Σ_{i ∈ q tokens} max_{j ∈ D tokens} ⟨q_i, d_j⟩

scored for every chunk, with the framework's exactness discipline —
fp32 HIGHEST interaction math, (score desc, row asc) ordering, ``-1`` /
``-inf`` invalid slots, and a *certificate* on the pruned path.

Two scan strategies, both over a padded ``[N, Lt, H]`` token matrix:

- :func:`maxsim_scan_topk` — exact brute force, blockwise
  ``lax.scan`` so the ``[B, Lq, C, Lt]`` interaction tensor never
  exceeds one block. This is the oracle-by-construction path; its cost
  is inherently ~``Lq·Lt``× a single-vector scan, which is why
  production late-interaction engines prune.
- :func:`maxsim_topk_pruned` — the TPU-native production path. Each
  chunk's tokens are compressed to ``K`` covering centroids + radii
  (:func:`prepare_maxsim_bounds`); by Cauchy-Schwarz on the deviation
  ``d_j − c_g`` of a token from its group centroid,

      max_j ⟨qᵢ, d_j⟩ ≤ max_g ( ⟨qᵢ, c_g⟩ + ‖qᵢ‖·r_g )

  so summing the right side over query tokens is a sound per-chunk
  upper bound on MaxSim — PLAID's centroid interaction, made a
  *certificate* by the radii, at ``K/Lt`` of the exact interaction
  cost. The bound ranks every chunk, only the top ``rescore`` chunks'
  token slabs are gathered and exactly rescored, and the (C+1)-th
  bound becomes the exclusion threshold: ``certified[b]`` iff the
  k-th exact score strictly beats every unselected chunk's bound —
  the same fail-closed interval-certificate contract as the dense
  scan tiers (ops/dense_tiered.py, ops/clustered.py). Unlike PLAID-
  class systems, a certified result is *provably* the exact
  full-corpus MaxSim top-k, and a pruning miss fails the certificate
  rather than silently dropping a chunk. ``K`` trades bound-scan cost
  for tightness: ``K=1`` is the classic single-centroid bound (too
  loose to certify on realistic token spreads — measured), larger K
  shrinks the radii toward exactness. Measured regime: certifies only
  when chunks' own token sets cluster tightly (templated/duplicated
  text, or ``K ≳ Lt``); semantically diverse tokens defeat any
  covering-radius bound (slack ~7x the score gap on topic-structured
  synthetics).
- :func:`maxsim_topk_scan16` / :func:`maxsim_topk_int8` — the tiered
  scans (the :mod:`ops.dense_tiered` contract at chunk granularity).
  The exact scan is HBM-bandwidth-bound on the token stream, so a
  bf16 (2 B/elem) or int8 (1 B/elem) scan replica cuts the streamed
  bytes 2x/4x; every chunk gets a SOUND upper bound
  ``U = MaxSim_scan + W`` (W from per-chunk residual norms computed at
  pack time + the budgeted f32 rounding of both programs), the
  ``rescore`` best-bounded chunks are exactly rescored from primary
  storage, and the (R+1)-th bound is the exclusion threshold —
  certified results are provably the full-corpus exact top-k over the
  stored values, ties and quantization-noise collisions fail closed.
  Unlike bf16 *storage* (which redefines exactness over bf16 values),
  the tiers keep the PRIMARY dtype's exactness contract.
- :func:`maxsim_topk_token_pruned` — the tight certificate. Exact
  top-``T`` token matches per query token over the FLAT corpus-token
  matrix (a free in-program reshape of the ``[N, Lt, H]`` store) give
  both the candidates and the threshold: every unretrieved token
  scores ≤ τᵢ (the T-th hit),
  so a chunk with no hits is bounded by ``Σᵢ τᵢ`` and a hit chunk by
  the partial sum ``Σᵢ max(best_hitᵢ, τᵢ)``. Only the ``rescore``
  best-bounded candidates are exactly rescored; certification demands
  the k-th exact score strictly beat every surviving bound. This is
  the classic exact late-interaction algorithm recast as one jitted
  XLA program — it certifies where the radius bound cannot (8/8 vs
  0/8 on topic-structured synthetics at T≈Lt·N/60), at the cost of a
  ``[B·Lq, M]`` token-level score pass.

Exactness is defined over the STORED token values (the f32 upcast of
the storage dtype): callers that store bf16 tokens trade token
precision for 2x memory up front, once, at insert — the scan and the
certificate are then exact over what is stored, never approximate over
it.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from trueno_rag_tpu.ops.dense import blockwise_topk

NEG_INF = float("-inf")

# Build-side widening for the f64-computed radii (the only error left
# is the final f32 cast; query-side rounding has its own budget below,
# mirroring dense_tiered's split between build and query slack).
_RADIUS_SLACK = 1.0 + 1e-6
_RADIUS_EPS = 1e-7

# Query-side multiplicative slack + absolute floor on the device-
# evaluated bound (covers the few f32 adds/mults that combine the dot,
# spread and accumulation-error terms), same values and justification
# as dense_tiered._BOUND_SLACK/_BOUND_EPS.
_BOUND_SLACK = 1.0001
_BOUND_EPS = 1e-7


def _f32(x: jax.Array) -> jax.Array:
    return x if x.dtype == jnp.float32 else x.astype(jnp.float32)


def maxsim_block_scores(
    q_tok: jax.Array,  # [B, Lq, H] f32
    q_mask: jax.Array,  # [B, Lq] bool
    tok: jax.Array,  # [C, Lt, H] float (shared across the batch)
    t_mask: jax.Array,  # [C, Lt] bool
) -> jax.Array:
    """Exact MaxSim of every query against every chunk in one block →
    ``[B, C]`` f32. Padding doc tokens are masked to ``-inf`` before
    the max; padding query tokens and all-padding chunks contribute
    zero (an empty document scores 0, matching
    models/late_interaction.maxsim)."""
    sim = jnp.einsum(
        "bqh,cth->bqct", q_tok, _f32(tok),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    sim = jnp.where(t_mask[None, None, :, :], sim, NEG_INF)
    best = jnp.max(sim, axis=3)  # [B, Lq, C]
    best = jnp.where(q_mask[:, :, None] & jnp.isfinite(best), best, 0.0)
    return jnp.sum(best, axis=1)  # [B, C]


def maxsim_pair_scores(
    q_tok: jax.Array,  # [B, Lq, H] f32
    q_mask: jax.Array,  # [B, Lq] bool
    tok: jax.Array,  # [B, C, Lt, H] float (per-query candidates)
    t_mask: jax.Array,  # [B, C, Lt] bool
) -> jax.Array:
    """Exact MaxSim of each query against ITS OWN ``C`` candidates →
    ``[B, C]`` f32 (the rescore stage of the pruned path)."""
    sim = jnp.einsum(
        "bqh,bcth->bqct", q_tok, _f32(tok),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    sim = jnp.where(t_mask[:, None, :, :], sim, NEG_INF)
    best = jnp.max(sim, axis=3)  # [B, Lq, C]
    best = jnp.where(q_mask[:, :, None] & jnp.isfinite(best), best, 0.0)
    return jnp.sum(best, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "block"))
def maxsim_scan_topk(
    q_tok: jax.Array,  # [B, Lq, H] f32
    q_mask: jax.Array,  # [B, Lq] bool
    tokens: jax.Array,  # [N, Lt, H] float
    t_mask: jax.Array,  # [N, Lt] bool
    valid: jax.Array,  # [N] bool
    k: int,
    block: int = 512,
) -> Tuple[jax.Array, jax.Array]:
    """Exact full-corpus MaxSim top-k → ``(scores [B,k], rows [B,k])``.

    ``lax.scan`` over ``block``-chunk slabs bounds the interaction
    tensor at ``[B, Lq, block, Lt]`` f32; per-chunk scores accumulate
    into a ``[B, N]`` matrix and the framework's blockwise exact top-k
    selects (score desc, row asc; invalid rows ``-inf``/``-1``)."""
    n = tokens.shape[0]
    g = max(-(-n // block), 1)
    pad = g * block - n
    if pad:
        tokens = jnp.pad(tokens, ((0, pad), (0, 0), (0, 0)))
        t_mask = jnp.pad(t_mask, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, pad),))
    tok_b = tokens.reshape(g, block, *tokens.shape[1:])
    tm_b = t_mask.reshape(g, block, t_mask.shape[1])
    v_b = valid.reshape(g, block)

    def step(carry, xs):
        tok, tm, v = xs
        s = maxsim_block_scores(q_tok, q_mask, tok, tm)  # [B, block]
        s = jnp.where(v[None, :], s, NEG_INF)
        return carry, s

    _, scores = jax.lax.scan(step, 0.0, (tok_b, tm_b, v_b))  # [G, B, block]
    scores = jnp.transpose(scores, (1, 0, 2)).reshape(q_tok.shape[0], g * block)
    top_s, rows = blockwise_topk(scores, k)
    return top_s, rows


@functools.partial(jax.jit, static_argnames=("k_bound", "iters"))
def _kmeans_tokens_device(
    tok: jax.Array,  # [S, Lt, H] f32
    mask: jax.Array,  # [S, Lt] bool
    k_bound: int,
    iters: int,
) -> jax.Array:
    """Batched per-chunk k-means over each chunk's own tokens →
    proposed centroids ``[S, K, H]`` f32. QUALITY-ONLY: any centroids
    are sound once the host radius pass covers every token against its
    assigned centroid; this just makes the radii small. Init = evenly
    strided valid tokens; empty clusters keep their previous centroid."""
    s, lt, h = tok.shape
    tokm = jnp.where(mask[:, :, None], tok, 0.0)
    cnt = jnp.sum(mask, axis=1)  # [S]
    # strided init over the valid prefix order: rank tokens by validity-
    # stable position, take positions round(linspace) into the valid set
    pos = jnp.cumsum(mask, axis=1) - 1  # valid rank per slot
    want = (
        jnp.arange(k_bound)[None, :] * jnp.maximum(cnt - 1, 0)[:, None]
        // max(k_bound - 1, 1)
    )  # [S, K] target ranks
    hit = (pos[:, :, None] == want[:, None, :]) & mask[:, :, None]  # [S, Lt, K]
    # first slot achieving each rank
    first = jnp.argmax(hit, axis=1)  # [S, K]
    cent = jnp.take_along_axis(tokm, first[:, :, None], axis=1)  # [S, K, H]

    def step(cent, _):
        sc = jnp.einsum("sth,skh->stk", tok, cent) - 0.5 * jnp.sum(
            cent * cent, axis=2
        )[:, None, :]
        asg = jnp.argmax(sc, axis=2)  # [S, Lt]
        one = (
            jax.nn.one_hot(asg, k_bound, dtype=jnp.float32)
            * mask[:, :, None]
        )  # [S, Lt, K]
        sums = jnp.einsum("stk,sth->skh", one, tokm)
        n_k = jnp.sum(one, axis=1)  # [S, K]
        new = sums / jnp.maximum(n_k, 1.0)[:, :, None]
        cent = jnp.where(n_k[:, :, None] > 0, new, cent)
        return cent, None

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    return cent


def prepare_maxsim_bounds(
    tokens: np.ndarray,  # [N, Lt, H] (any float dtype; upcast defines stored values)
    t_mask: np.ndarray,  # [N, Lt] bool
    k_bound: int = 8,
    iters: int = 8,
    slab: int = 4096,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-chunk COMPRESSED token set with covering radii →
    ``(btok [N, K, H] f32, brad [N, K] f32, bmask [N, K] bool)``, the
    pruning-bound inputs of :func:`maxsim_topk_pruned`.

    Each chunk's ``Lt`` tokens are clustered into ``K = k_bound``
    groups (a batched k-means, device-accelerated, quality-only); each
    group's centroid + covering radius gives the sound per-query-token
    bound ``max_{j∈group} ⟨qᵢ, d_j⟩ ≤ ⟨qᵢ, c_g⟩ + ‖qᵢ‖·r_g``, so the
    bound-side interaction costs ``K/Lt`` of the exact one — PLAID's
    centroid interaction, made a *certificate* by the radii. ``K = 1``
    is the single-centroid bound; larger K tightens it (radii shrink)
    at linearly more bound-scan cost.

    Soundness: the host pass assigns every stored token (f32 upcast)
    to its nearest f32 centroid in f64 math and sets that group's
    radius to cover it, widened by ``_RADIUS_SLACK``/``_RADIUS_EPS``
    for the final f32 cast — ``‖d_j − c_{a(j)}‖ ≤ r_{a(j)}`` holds for
    every stored token regardless of k-means quality. Empty groups are
    masked out of the bound max; fully-empty chunks bound to 0 (their
    exact score). Slabbed so temporaries never exceed
    ``slab·Lt·H``."""
    n, lt, h = tokens.shape
    k_bound = max(1, min(k_bound, lt))
    btok = np.zeros((n, k_bound, h), dtype=np.float32)
    brad = np.zeros((n, k_bound), dtype=np.float32)
    bmask = np.zeros((n, k_bound), dtype=bool)
    mask = np.asarray(t_mask, bool)
    for lo in range(0, n, slab):
        hi = min(lo + slab, n)
        t32 = np.asarray(tokens[lo:hi], np.float32)
        m = mask[lo:hi]
        cent = np.asarray(
            _kmeans_tokens_device(
                jnp.asarray(t32), jnp.asarray(m), k_bound, iters
            ),
            np.float32,
        )  # [S, K, H]
        # host f64 assignment + covering radii vs the f32 centroids the
        # device will use
        t64 = t32.astype(np.float64)
        c64 = cent.astype(np.float64)
        d2 = (
            np.einsum("sth,sth->st", t64, t64)[:, :, None]
            - 2.0 * np.einsum("sth,skh->stk", t64, c64)
            + np.einsum("skh,skh->sk", c64, c64)[:, None, :]
        )  # [S, Lt, K]
        asg = d2.argmin(axis=2)  # [S, Lt]
        dist = np.sqrt(
            np.maximum(np.take_along_axis(d2, asg[:, :, None], axis=2)[:, :, 0], 0.0)
        )
        dist = np.where(m, dist, -1.0)  # padding never sets a radius
        r = np.zeros((hi - lo, k_bound), dtype=np.float64)
        used = np.zeros((hi - lo, k_bound), dtype=bool)
        np.maximum.at(
            r,
            (np.repeat(np.arange(hi - lo), lt), asg.reshape(-1)),
            np.maximum(dist.reshape(-1), 0.0),
        )
        np.logical_or.at(
            used,
            (np.repeat(np.arange(hi - lo), lt), asg.reshape(-1)),
            m.reshape(-1),
        )
        btok[lo:hi] = np.where(used[:, :, None], cent, 0.0)
        brad[lo:hi] = np.where(
            used, r * _RADIUS_SLACK + _RADIUS_EPS, 0.0
        ).astype(np.float32)
        bmask[lo:hi] = used
    return btok, brad, bmask


def _maxsim_bound_block(
    q_tok: jax.Array,  # [B, Lq, H] f32 (raw; padding handled via q_mask)
    q_mask: jax.Array,  # [B, Lq] bool
    qn_w: jax.Array,  # [B, Lq] f32 — ‖qᵢ‖ widened ≥ true norm
    btok: jax.Array,  # [C, K, H] f32
    brad: jax.Array,  # [C, K] f32
    bmask: jax.Array,  # [C, K] bool
) -> jax.Array:
    """Sound per-chunk MaxSim upper bounds for one block → ``[B, C]``
    f32. Per query token: ``max_g (⟨qᵢ,c_g⟩ + ‖qᵢ‖·r_g)`` over the
    chunk's valid groups (each token of the chunk lies within ``r_g``
    of its group centroid, so the max dominates ``max_j ⟨qᵢ,d_j⟩``);
    chunks with no valid group (empty docs) bound to their exact score
    0. Every f32 rounding is budgeted: the H-term dot's accumulation
    error rides ``‖qᵢ‖·‖c_g‖``, the Lq-term sum's rides the magnitude
    sum, and ``_BOUND_SLACK``/``_BOUND_EPS`` close the residue exactly
    like the clustered tier's tile bound (ops/clustered.py; review r3
    taught the acc term must carry the full ``‖c‖`` factor)."""
    h = q_tok.shape[2]
    lq = q_tok.shape[1]
    acc_eps = jnp.float32(h) * jnp.float32(2.0**-23)
    sim = jnp.einsum(
        "bqh,ckh->bqck", q_tok, btok,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, Lq, C, K]
    # centroid norms widened UP against their own f32 rounding-down
    cn_w = jnp.linalg.norm(btok, axis=2) * (1.0 + acc_eps)  # [C, K]
    term = sim + qn_w[:, :, None, None] * (
        brad[None, None, :, :] + acc_eps * cn_w[None, None, :, :]
    )
    term = jnp.where(bmask[None, None, :, :], term, NEG_INF)
    bi = jnp.max(term, axis=3)  # [B, Lq, C]
    bi = jnp.where(q_mask[:, :, None] & jnp.isfinite(bi), bi, 0.0)
    u = jnp.sum(bi, axis=1)  # [B, C]
    mag = jnp.sum(jnp.abs(bi), axis=1)
    u = u + mag * jnp.float32(lq) * jnp.float32(2.0**-23)
    u = u + mag * jnp.float32(_BOUND_SLACK - 1.0) + jnp.float32(_BOUND_EPS)
    return u


@functools.partial(
    jax.jit, static_argnames=("k", "rescore", "bound_block", "select")
)
def maxsim_topk_pruned(
    q_tok: jax.Array,  # [B, Lq, H] f32
    q_mask: jax.Array,  # [B, Lq] bool
    tokens: jax.Array,  # [N, Lt, H] float
    t_mask: jax.Array,  # [N, Lt] bool
    btok: jax.Array,  # [N, K, H] f32 (prepare_maxsim_bounds)
    brad: jax.Array,  # [N, K] f32
    bmask: jax.Array,  # [N, K] bool
    valid: jax.Array,  # [N] bool
    k: int,
    rescore: int = 128,
    bound_block: int = 4096,
    select: str = "auto",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Certified centroid-pruned MaxSim top-k →
    ``(scores [B,k], rows [B,k], certified [B] bool)``.

    Ranks every chunk by the sound K-group upper bound
    ``U = Σᵢ max_g (⟨qᵢ,c_g⟩ + ‖qᵢ‖·r_g)`` (``K/Lt`` of the exact
    interaction cost, streamed in ``bound_block``-chunk slabs so the
    ``[B,Lq,C,K]`` tensor stays bounded), exactly rescores the
    ``rescore`` best-bounded chunks, and certifies per query iff the
    k-th exact score strictly exceeds the (C+1)-th bound — every
    unselected chunk's true score is ≤ its bound ≤ that threshold, so
    a certified result IS the full-corpus exact top-k (ties at the
    boundary fail closed, as does any pruning miss).
    ``isneginf(threshold)`` certifies short corpora where nothing was
    excluded at all."""
    if rescore < k:
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(f"rescore={rescore} must be >= k={k}")
    b, lq, h = q_tok.shape
    n = tokens.shape[0]
    c_n = min(rescore, n)

    # -- sound per-chunk upper bounds (device f32, error-budgeted) -----
    qv = jnp.where(q_mask[:, :, None], q_tok, 0.0)
    # ‖qᵢ‖ widened ≥ the true norm against its own f32 rounding (sum of
    # H squares + sqrt can round DOWN by ~H·2⁻²³ relative; at H=4096
    # that exceeds _BOUND_SLACK's 1e-4 budget, so widen explicitly)
    qn_w = jnp.linalg.norm(qv, axis=2) * (
        1.0 + jnp.float32(h + 2) * jnp.float32(2.0**-23)
    )  # [B, Lq]

    g = max(-(-n // bound_block), 1)
    padn = g * bound_block - n
    btok_p, brad_p, bmask_p, valid_p = btok, brad, bmask, valid
    if padn:
        btok_p = jnp.pad(btok, ((0, padn), (0, 0), (0, 0)))
        brad_p = jnp.pad(brad, ((0, padn), (0, 0)))
        bmask_p = jnp.pad(bmask, ((0, padn), (0, 0)))
        valid_p = jnp.pad(valid, ((0, padn),))

    def step(carry, xs):
        bt, br, bm, v = xs
        ub = _maxsim_bound_block(q_tok, q_mask, qn_w, bt, br, bm)
        ub = jnp.where(v[None, :], ub, NEG_INF)
        return carry, ub

    _, u = jax.lax.scan(
        step,
        0.0,
        (
            btok_p.reshape(g, bound_block, *btok.shape[1:]),
            brad_p.reshape(g, bound_block, brad.shape[1]),
            bmask_p.reshape(g, bound_block, bmask.shape[1]),
            valid_p.reshape(g, bound_block),
        ),
    )  # [G, B, block]
    u = jnp.transpose(u, (1, 0, 2)).reshape(b, g * bound_block)
    if padn:
        u = u[:, :n]

    # -- select by bound, rescore exactly, certify (shared tail) --------
    return _select_rescore_certify(
        q_tok, q_mask, tokens, t_mask, u, k, c_n, select
    )


def _resolve_select(select: str, n: int, c_n: int) -> str:
    """``auto`` → ``exact``, always — MEASURED at 1M x 32 x 128 on v5e
    (2026-08-19): the approx tail saved only 1.2 ms of the fused tier's
    29 ms (the exact top-(C+1)'s full [B, 131k] sort is NOT the
    dominant cost; the bound kernel is), while certification collapsed
    8/8 → 1/8 — approx_max_k's ~0.99 recall over C=1024 entries almost
    always misses a few, and every miss rightly fails the count-trick
    threshold closed. ``approx`` stays available explicitly for
    small-C/latency-over-certainty configs, where a fallback exact
    rescan is acceptable."""
    if select == "auto":
        return "exact"
    if select not in ("exact", "approx"):
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(f"unknown select mode: {select!r}")
    return select


def _select_rescore_certify(
    q_tok: jax.Array,  # [B, Lq, H] f32
    q_mask: jax.Array,  # [B, Lq] bool
    tokens: jax.Array,  # [N, Lt, H] float (primary storage, rescore source)
    t_mask: jax.Array,  # [N, Lt] bool
    u: jax.Array,  # [B, N] f32 — SOUND per-chunk upper bounds (-inf = excluded)
    k: int,
    c_n: int,  # candidate width (≤ N)
    select: str = "exact",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Shared tail of every bound-ranked MaxSim tier: top-(C+1)
    selection by bound (the exclusion threshold covers every chunk NOT
    rescored — fail-closed by construction), exact rescore of the
    gathered candidate token slabs, and the certificate
    ``kth > threshold``. ``isneginf(threshold)`` certifies short
    corpora where nothing was excluded at all."""
    top_s, rows, kth, threshold = _select_rescore_threshold(
        q_tok, q_mask, tokens, t_mask, u, k, c_n, select
    )
    certified = (kth > threshold) | jnp.isneginf(threshold)
    return top_s, rows, certified


def _select_rescore_threshold(
    q_tok: jax.Array,
    q_mask: jax.Array,
    tokens: jax.Array,
    t_mask: jax.Array,
    u: jax.Array,
    k: int,
    c_n: int,
    select: str = "exact",
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Body of :func:`_select_rescore_certify` returning the raw
    certificate operands → ``(top_s [B,k], rows [B,k], kth [B],
    threshold [B])`` — the sharded composition needs them separately
    (global certificate = merged kth vs max-over-shards threshold)."""
    b = u.shape[0]
    n = u.shape[1]
    select = _resolve_select(select, n, c_n)
    if select == "approx":
        # approx_max_k + the scatter-free masked-max exclusion bound
        # (ops/dense_tiered._topk_select): the threshold is computed
        # from the ACTUAL selected set, so a selection miss only RAISES
        # it (+inf at any boundary tie or duplicate index) and the
        # certificate fails closed — never a wrong certified result.
        from trueno_rag_tpu.ops.dense_tiered import _topk_select

        cand, threshold = _topk_select(u, c_n, approx=True)
        # approx indices are raw positions: re-sentinel invalid (-inf
        # bound) chunks so tombstoned/tag-filtered rows cannot be
        # resurrected by the rescore
        uv = jnp.take_along_axis(u, cand, axis=1)
        cand = jnp.where(jnp.isneginf(uv), -1, cand)
        # short-allowed-set certificate: _topk_select's count trick
        # always fails (+inf) when the selection boundary sits in the
        # -inf mass — exactly the selective-tag-filter / short-corpus
        # regime the exact path certifies with a -inf threshold. If
        # every finite bound was selected (distinctly), nothing finite
        # was excluded, so max(excluded) = -inf rigorously.
        n_fin = jnp.sum(jnp.isfinite(u), axis=1)
        s_fin = jnp.sum(cand >= 0, axis=1)
    else:
        sel = min(c_n + 1, n)
        u_top, cand = blockwise_topk(u, sel)
        threshold = u_top[:, c_n] if sel > c_n else jnp.full((b,), NEG_INF)
        cand = cand[:, :c_n]

    # ascending-row candidate order so lax.top_k's lower-index tie
    # preference yields the framework's (score desc, row asc) order —
    # -1 sentinels sort first and carry -inf scores, so they are only
    # ever selected when fewer than k real candidates exist
    cand = jax.lax.sort(cand, dimension=1)
    if select == "approx":
        # a duplicated approx index must not occupy two result slots
        # (the threshold above is already +inf in that case — the query
        # is uncertified — but the returned rows stay well-formed)
        dup = (cand[:, 1:] == cand[:, :-1]) & (cand[:, 1:] >= 0)
        cand = cand.at[:, 1:].set(jnp.where(dup, -1, cand[:, 1:]))
        complete = (s_fin == n_fin) & ~jnp.any(dup, axis=1)
        threshold = jnp.where(complete, NEG_INF, threshold)

    # -- exact rescore of the gathered token slabs ---------------------
    # `tokens` may be the float primary OR an (tok8, s_tok) pair when
    # int8 IS the primary storage (the capacity tier): gather the raw
    # int8 rows + scales and dequantize only the [B, C] candidate
    # slabs — the f32 view of the corpus never materializes
    safe = jnp.maximum(cand, 0)
    if isinstance(tokens, tuple):
        t8, st = tokens
        tok_c = jnp.take(t8, safe.reshape(-1), axis=0).astype(jnp.float32)
        s_c = jnp.take(st, safe.reshape(-1), axis=0)
        tok_c = (tok_c * s_c[:, :, None]).reshape(
            b, c_n, t8.shape[1], t8.shape[2]
        )
    else:
        tok_c = jnp.take(tokens, safe.reshape(-1), axis=0)
        tok_c = tok_c.reshape(b, c_n, *tokens.shape[1:])
    tm_c = jnp.take(t_mask, safe.reshape(-1), axis=0).reshape(b, c_n, t_mask.shape[1])
    s = maxsim_pair_scores(q_tok, q_mask, tok_c, tm_c)  # [B, C]
    s = jnp.where(cand >= 0, s, NEG_INF)

    k_eff = min(k, c_n)
    top_s, idx = jax.lax.top_k(s, k_eff)
    rows = jnp.take_along_axis(cand, idx, axis=1)
    rows = jnp.where(jnp.isneginf(top_s), -1, rows)
    if k_eff < k:
        top_s = jnp.pad(top_s, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
        rows = jnp.pad(rows, ((0, 0), (0, k - k_eff)), constant_values=-1)

    kth = top_s[:, k_eff - 1]
    return top_s, rows, kth, threshold


# ---------------------------------------------------------------------------
# Tiered scans: bf16 / int8 scan replicas with certified exact rescore
# ---------------------------------------------------------------------------
#
# Why tiers and not cluster pruning: MaxSim sums Lq per-token maxima, so
# a sub-linear (IVF/cell) scan needs per-QUERY-TOKEN exclusion bounds
# tight at the cross-topic-dot scale (~0.2-0.3 on unit tokens). Any
# covering-radius bound over semantically diverse token cells carries
# the cell's internal spread (~1.2 on realistic normalized token
# clouds — see maxsim_topk_pruned's measured regime), so the summed
# slack exceeds real score gaps and the certificate dies; the
# token-pruned tier's exact τ certifies but reads the same bytes as
# the full scan. DERIVED DEAD END — don't retry cell pruning without a
# fundamentally tighter per-cell bound. What DOES pay is cutting the
# bytes of the linear scan itself: the scan is bandwidth-bound, so a
# 2 B (bf16) or 1 B (int8) replica is a ~2x/4x stream cut, and the
# dense tiers' interval-certificate machinery (ops/dense_tiered.py)
# transfers to chunk granularity unchanged.


def _scan16_slab(tok_s: jax.Array, tm_s: jax.Array):
    """Per-slab body of :func:`prepare_maxsim_scan16` (bounded temps)."""
    h = tok_s.shape[2]
    f32 = _f32(tok_s)
    tok16 = f32.astype(jnp.bfloat16)
    a = jax.lax.optimization_barrier(tok16).astype(jnp.float32)
    e = f32 - a
    # widen the f32-evaluated norms UP against their own rounding
    w = 1.0 + jnp.float32(h + 2) * jnp.float32(2.0**-23)
    e_l2 = jnp.sqrt(jnp.sum(e * e, axis=2)) * w  # [S, Lt]
    a_l2 = jnp.sqrt(jnp.sum(a * a, axis=2)) * w
    e_max = jnp.max(jnp.where(tm_s, e_l2, 0.0), axis=1)
    n_max = jnp.max(jnp.where(tm_s, a_l2 + e_l2, 0.0), axis=1)
    return tok16, e_max, n_max


def _int8_slab(tok_s: jax.Array, tm_s: jax.Array):
    """Per-slab body of :func:`prepare_maxsim_int8` (bounded temps)."""
    h = tok_s.shape[2]
    f32 = _f32(tok_s)
    amax = jnp.max(jnp.abs(f32), axis=2)  # [S, Lt]
    s = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    tok8 = jnp.clip(jnp.round(f32 / s[:, :, None]), -127, 127).astype(jnp.int8)
    a = tok8.astype(jnp.float32) * s[:, :, None]
    e = f32 - a
    w = 1.0 + jnp.float32(h + 2) * jnp.float32(2.0**-23)
    e_raw = jnp.sqrt(jnp.sum(e * e, axis=2))
    a_raw = jnp.sqrt(jnp.sum(a * a, axis=2))
    # the f32 dequantize multiply rounds each component by up to
    # |a_c|·2⁻²⁴ — an error RELATIVE TO a, not to e, so the residual
    # norm needs the absolute (a+e)·2⁻²⁴ correction before the
    # relative widening (the bf16 prep needs no such term: its
    # subtraction is exactly-rounded against an exactly-representable
    # operand, so its error is relative to e itself)
    e_l2 = (e_raw + (a_raw + e_raw) * jnp.float32(2.0**-24)) * w
    a_l2 = a_raw * w
    e_max = jnp.max(jnp.where(tm_s, e_l2, 0.0), axis=1)
    n_max = jnp.max(jnp.where(tm_s, a_l2 + e_l2, 0.0), axis=1)
    return tok8, s, e_max, n_max


def _slabbed_prep(body, tokens: jax.Array, t_mask: jax.Array, slab: int):
    """Run a per-slab pack body over ``slab``-row windows of the token
    tensor so the elementwise temporaries (f32 upcast, dequantized
    copy, residual, squared norms — each the size of the token tensor)
    never materialize at full N. At 300k×32×128 the unslabbed versions
    OOMed a 16 GB chip on temporaries alone, and a pad+reshape+scan
    rewrite STILL OOMed — ``jnp.pad`` of the 4.6 GiB primary is a full
    copy (measured 2026-08-19). This version indexes the original array
    in place: a ``fori_loop`` of clamped ``dynamic_slice`` reads (the
    last window overlaps instead of padding; overlapped rows recompute
    identical values) and ``dynamic_update_slice`` writes into
    preallocated outputs XLA updates in place."""
    n, lt = t_mask.shape
    h = tokens.shape[2]
    slab = min(slab, n)
    g = -(-n // slab) if n else 0
    out_sd = jax.eval_shape(
        body,
        jax.ShapeDtypeStruct((slab, lt, h), tokens.dtype),
        jax.ShapeDtypeStruct((slab, lt), t_mask.dtype),
    )
    init = tuple(jnp.zeros((n, *o.shape[1:]), o.dtype) for o in out_sd)
    if not g:
        return init

    def step(i, accs):
        lo = jnp.minimum(i * slab, n - slab)
        tok_s = jax.lax.dynamic_slice(tokens, (lo, 0, 0), (slab, lt, h))
        tm_s = jax.lax.dynamic_slice(t_mask, (lo, 0), (slab, lt))
        outs = body(tok_s, tm_s)
        return tuple(
            jax.lax.dynamic_update_slice(a, o, (lo,) + (0,) * (a.ndim - 1))
            for a, o in zip(accs, outs)
        )

    return jax.lax.fori_loop(0, g, step, init)


@functools.partial(jax.jit, static_argnames=("slab",))
def prepare_maxsim_scan16(tokens: jax.Array, t_mask: jax.Array,
                          slab: int = 8192):
    """Pack the bf16 MaxSim scan tier →
    ``(tok16 [N,Lt,H] bf16, e_max [N] f32, n_max [N] f32)``.

    ``e_max[c] = max over c's valid tokens of ‖d_j − f32(bf16(d_j))‖``
    (the per-token quantization residual) and ``n_max[c] = max_j
    (‖bf16(d_j)‖ + e_j)`` — an upper bound on BOTH the primary and the
    bf16 token norms, which the query op's rounding terms ride. Both
    norms are widened for their own device f32 evaluation. The
    optimization_barrier is load-bearing: TPU XLA folds f32(bf16(x))
    back to x and silently zeroes the residual (measured;
    dense_tiered.prepare_tiered has the canonical note). Runs on
    device, slabbed so temporaries stay bounded — no host round-trip
    of the token tensor."""
    return _slabbed_prep(_scan16_slab, tokens, t_mask, slab)


def _self16_slab(tok_s: jax.Array, tm_s: jax.Array):
    """Per-slab body of :func:`prepare_maxsim_self16`."""
    h = tok_s.shape[2]
    f32 = _f32(tok_s)
    w = 1.0 + jnp.float32(h + 2) * jnp.float32(2.0**-23)
    a_l2 = jnp.sqrt(jnp.sum(f32 * f32, axis=2)) * w
    n_max = jnp.max(jnp.where(tm_s, a_l2, 0.0), axis=1)
    return (n_max,)


@functools.partial(jax.jit, static_argnames=("slab",))
def prepare_maxsim_self16(tokens: jax.Array, t_mask: jax.Array,
                          slab: int = 8192):
    """Zero-copy bf16 tier pack for a bf16 PRIMARY store →
    ``(e_max [N] f32 = 0, n_max [N] f32)``; the scan replica is the
    primary tensor itself. When storage is already bf16, a
    :func:`prepare_maxsim_scan16` replica would duplicate the whole
    token tensor in HBM to hold values identical to the primary
    (``bf16→f32→bf16`` is the identity) with all-zero residuals. This
    pack skips the copy: residual bound 0, norm bound the widened
    per-chunk max token norm (the only input the bound math still
    needs). Callers pass the primary as ``tok16`` —
    ``maxsim_topk_scan16[_fused]`` then serves the bf16 corpus with NO
    extra corpus-scale memory, which is what makes 1M-chunk
    late-interaction fit one 16 GB chip."""
    if tokens.dtype != jnp.bfloat16:
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(
            "prepare_maxsim_self16 requires a bfloat16 primary store "
            f"(got {tokens.dtype})"
        )
    (n_max,) = _slabbed_prep(_self16_slab, tokens, t_mask, slab)
    return jnp.zeros_like(n_max), n_max


@functools.partial(jax.jit, static_argnames=("group",))
def prepare_maxsim_bias_l(t_mask: jax.Array, group: int = 256):
    """l-major grouped mask bias for the v2 bound-pass kernels →
    ``[Gp·Lt·group] f32`` (0 at valid tokens, -2^30 at padding; rows
    beyond N are all-bias). Tiny next to the corpus (4·N·Lt bytes), so
    the zero-copy tier's only extra HBM. The caller's ``Lt`` must keep
    ``(group·Lt) % 1024 == 0`` (Lt % 4 at the default group) — the
    kernels' 1-D block alignment rule."""
    from trueno_rag_tpu.ops.pallas.maxsim_scan import _MASK_BIAS

    n, lt = t_mask.shape
    gp = max(-(-n // group), 1)
    m = t_mask
    if gp * group != n:
        m = jnp.pad(t_mask, ((0, gp * group - n), (0, 0)))
    bias = jnp.where(m, 0.0, jnp.float32(_MASK_BIAS))
    return jnp.transpose(bias.reshape(gp, group, lt), (0, 2, 1)).reshape(-1)


@functools.partial(jax.jit, static_argnames=("group", "slab"))
def prepare_maxsim_scan16_opt(tokens: jax.Array, t_mask: jax.Array,
                              group: int = 256, slab: int = 8192):
    """Pack the bf16 tier for the v2 kernel's l-major-grouped layout →
    ``(tok_l [Gp·Lt_p·group, H] bf16, bias_l [Gp·Lt_p·group] f32,
    e_max [N] f32, n_max [N] f32)`` with ``Lt_p = Lt`` rounded up to a
    multiple of 4 (the 1-D block alignment rule at the default group).

    Within each ``group``-chunk tile the replica stores token position
    l MAJOR, so the kernel's per-chunk max is Lt contiguous lane-slices
    instead of a sublane-group reduce over a lane-padded buffer
    (ops/pallas/maxsim_scan.py's v2 note). Peak prep memory is ~2
    replica copies beyond the primary (pad + transpose) — for bf16
    primaries use :func:`prepare_maxsim_self16` + the zero-copy v2
    kernel instead."""
    n, lt = t_mask.shape
    lt_p = -(-lt // 4) * 4
    tok16, e_max, n_max = _slabbed_prep(_scan16_slab, tokens, t_mask, slab)
    gp = max(-(-n // group), 1)
    m = t_mask
    if gp * group != n or lt_p != lt:
        tok16 = jnp.pad(
            tok16, ((0, gp * group - n), (0, lt_p - lt), (0, 0))
        )
        m = jnp.pad(t_mask, ((0, gp * group - n), (0, lt_p - lt)))
    h = tokens.shape[2]
    tok_l = jnp.transpose(
        tok16.reshape(gp, group, lt_p, h), (0, 2, 1, 3)
    ).reshape(gp * lt_p * group, h)
    from trueno_rag_tpu.ops.pallas.maxsim_scan import _MASK_BIAS

    bias = jnp.where(m, 0.0, jnp.float32(_MASK_BIAS))
    bias_l = jnp.transpose(bias.reshape(gp, group, lt_p), (0, 2, 1)).reshape(-1)
    return tok_l, bias_l, e_max, n_max


@functools.partial(jax.jit, static_argnames=("slab",))
def prepare_maxsim_int8(tokens: jax.Array, t_mask: jax.Array,
                        slab: int = 8192):
    """Pack the int8 MaxSim scan tier →
    ``(tok8 [N,Lt,H] int8, s_tok [N,Lt] f32, e_max [N], n_max [N])``.

    Per-token-row tightest symmetric scales ``s = amax/127`` (the same
    choice as dense_tiered.prepare_int8 — power-of-two scales measured
    ~2x wider residuals there), ``e_max[c] = max_j ‖d_j − s_j·d8_j‖``
    and ``n_max[c] = max_j (‖s_j·d8_j‖ + e_j)`` (≥ both the primary
    and dequantized token norms), all widened for the device f32
    evaluation. Runs on device, slabbed (see
    :func:`prepare_maxsim_scan16`)."""
    return _slabbed_prep(_int8_slab, tokens, t_mask, slab)


def _widened_query_norms(q_tok: jax.Array, q_mask: jax.Array):
    """``(qv zeroed-padding [B,Lq,H], qn_w [B,Lq] ≥ true ‖qᵢ‖)`` — the
    norm widening covers its own f32 sum+sqrt rounding (derivation on
    maxsim_topk_pruned's qn_w)."""
    h = q_tok.shape[2]
    qv = jnp.where(q_mask[:, :, None], q_tok, 0.0)
    qn_w = jnp.linalg.norm(qv, axis=2) * (
        1.0 + jnp.float32(h + 2) * jnp.float32(2.0**-23)
    )
    return qv, qn_w


def _tier_rounding_coeff(lq: int, h: int) -> jnp.float32:
    """Per-unit ``Σᵢ‖qᵢ‖·n_max`` rounding budget shared by every tier:
    the H-term HIGHEST dot's accumulation error and the Lq-term f32
    score sum, for BOTH the tier's own program and the exact-scan
    oracle program the certificate is stated against (factor 2)."""
    return 2.0 * (
        jnp.float32(h) * jnp.float32(2.0**-23)
        + jnp.float32(lq) * jnp.float32(2.0**-23)
    )


def maxsim_topk_scan16(
    q_tok: jax.Array,  # [B, Lq, H] f32
    q_mask: jax.Array,  # [B, Lq] bool
    tokens: jax.Array,  # [N, Lt, H] float (primary storage — rescore source)
    t_mask: jax.Array,  # [N, Lt] bool
    tok16: jax.Array,  # [N, Lt, H] bf16 scan replica (prepare_maxsim_scan16)
    e_max: jax.Array,  # [N] f32
    n_max: jax.Array,  # [N] f32
    valid: jax.Array,  # [N] bool
    k: int,
    rescore: int = 1024,
    block: int = 1024,
    select: str = "auto",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Certified bf16-scan MaxSim top-k →
    ``(scores [B,k], rows [B,k], certified [B] bool)``.

    Streams the 2 B/elem replica instead of the primary tokens (the
    exact scan is bandwidth-bound, so ~2x at fp32 primary), bounds
    every chunk by ``U = MaxSim(q, bf16(D)) + Σᵢ‖qᵢ‖·e_max(D) +
    rounding(n_max)``, exactly rescores the ``rescore`` best-bounded
    chunks from PRIMARY storage and certifies against the (R+1)-th
    bound — a certified result is provably
    :func:`maxsim_scan_topk`'s answer (chunk-granular sibling of
    dense_topk_tiered; reference semantics index.rs:386-412).

    When ``tok16 is tokens`` (the bf16-primary zero-copy pack,
    :func:`prepare_maxsim_self16`), the corpus is passed to the jitted
    program ONCE: XLA's compile-time HBM accounting charges every
    parameter separately even when the runtime buffers alias, so the
    two-parameter form rejects corpora over half of HBM (measured OOM
    at 1M x 32 x 128, 2026-08-19)."""
    if rescore < k:
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(f"rescore={rescore} must be >= k={k}")
    if tok16 is tokens:
        return _maxsim_topk_self16(
            q_tok, q_mask, tokens, t_mask, e_max, n_max, valid,
            k=k, rescore=rescore, block=block, select=select,
        )
    return _maxsim_topk_scan16_two(
        q_tok, q_mask, tokens, t_mask, tok16, e_max, n_max, valid,
        k=k, rescore=rescore, block=block, select=select,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "rescore", "block", "select")
)
def _maxsim_topk_self16(
    q_tok, q_mask, tokens, t_mask, e_max, n_max, valid, k, rescore, block,
    select,
):
    return _scan16_xla_body(
        q_tok, q_mask, tokens, t_mask, tokens, e_max, n_max, valid,
        k, rescore, block, select,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "rescore", "block", "select")
)
def _maxsim_topk_scan16_two(
    q_tok, q_mask, tokens, t_mask, tok16, e_max, n_max, valid, k, rescore,
    block, select,
):
    return _scan16_xla_body(
        q_tok, q_mask, tokens, t_mask, tok16, e_max, n_max, valid,
        k, rescore, block, select,
    )


def _scan16_xla_body(
    q_tok, q_mask, tokens, t_mask, tok16, e_max, n_max, valid, k, rescore,
    block, select="auto",
):
    b, lq, h = q_tok.shape
    n = tokens.shape[0]
    qv, qn_w = _widened_query_norms(q_tok, q_mask)
    qsum_w = jnp.sum(jnp.where(q_mask, qn_w, 0.0), axis=1)  # [B]
    k_round = _tier_rounding_coeff(lq, h)

    g = max(-(-n // block), 1)
    pad = g * block - n
    tok16_p, tm_p, v_p, e_p, n_p = tok16, t_mask, valid, e_max, n_max
    if pad:
        tok16_p = jnp.pad(tok16, ((0, pad), (0, 0), (0, 0)))
        tm_p = jnp.pad(t_mask, ((0, pad), (0, 0)))
        v_p = jnp.pad(valid, ((0, pad),))
        e_p = jnp.pad(e_max, ((0, pad),))
        n_p = jnp.pad(n_max, ((0, pad),))

    def step(carry, xs):
        tok_b, tm_b, v_b, e_b, n_b = xs
        s16 = maxsim_block_scores(qv, q_mask, tok_b, tm_b)  # [B, block]
        w_bc = (
            qsum_w[:, None] * (e_b[None, :] + k_round * n_b[None, :])
        ) * jnp.float32(_BOUND_SLACK) + jnp.float32(_BOUND_EPS)
        u = jnp.where(v_b[None, :], s16 + w_bc, NEG_INF)
        return carry, u

    _, u = jax.lax.scan(
        step,
        0.0,
        (
            tok16_p.reshape(g, block, *tok16.shape[1:]),
            tm_p.reshape(g, block, t_mask.shape[1]),
            v_p.reshape(g, block),
            e_p.reshape(g, block),
            n_p.reshape(g, block),
        ),
    )
    u = jnp.transpose(u, (1, 0, 2)).reshape(b, g * block)
    if pad:
        u = u[:, :n]
    return _select_rescore_certify(
        qv, q_mask, tokens, t_mask, u, k, min(rescore, n), select
    )


def _scan16_query_pack(q_tok: jax.Array, q_mask: jax.Array):
    """Query-side pack of the fused kernel tier →
    ``(q16 [B,Lq,H] bf16 padding-zeroed, A [B], C1 [B], Q [B])``.

    The kernel (ops/pallas/maxsim_scan.py) quantizes the QUERY to bf16
    too (the XLA tier keeps q f32), so its bound needs query residual
    coefficients: ``A = Σᵢ‖qᵢ − f32(bf16(qᵢ))‖`` rides the token norm
    bound, ``C1 = Σᵢ‖bf16(qᵢ)‖`` rides the token residual and the
    kernel's own f32 rounding, ``Q = Σᵢ‖qᵢ‖`` rides the oracle/rescore
    programs' rounding. Every norm and each Lq-sum is widened UP
    against its own f32 evaluation; the optimization_barrier keeps XLA
    from folding the bf16 round-trip (prepare_maxsim_scan16's note)."""
    b, lq, h = q_tok.shape
    qv = jnp.where(q_mask[:, :, None], _f32(q_tok), 0.0)
    q16 = qv.astype(jnp.bfloat16)
    a = jax.lax.optimization_barrier(q16).astype(jnp.float32)
    e = qv - a
    w = 1.0 + jnp.float32(h + 2) * jnp.float32(2.0**-23)
    ws = 1.0 + jnp.float32(lq) * jnp.float32(2.0**-23)
    e_n = jnp.linalg.norm(e, axis=2) * w  # [B, Lq]
    a_n = jnp.linalg.norm(a, axis=2) * w
    q_n = jnp.linalg.norm(qv, axis=2) * w
    m = q_mask.astype(jnp.float32)
    return (
        q16,
        jnp.sum(e_n * m, axis=1) * ws,
        jnp.sum(a_n * m, axis=1) * ws,
        jnp.sum(q_n * m, axis=1) * ws,
    )


def _scan16_fused_widths(
    a_c: jax.Array,  # [B] Σ‖qᵢ − bf16(qᵢ)‖ (widened)
    c1: jax.Array,  # [B] Σ‖bf16(qᵢ)‖ (widened)
    q_w: jax.Array,  # [B] Σ‖qᵢ‖ (widened)
    e_max: jax.Array,  # [C] per-chunk token residual bound
    n_max: jax.Array,  # [C] per-chunk token norm bound
    h: int,
    lq: int,
) -> jax.Array:
    """→ ``W [B, C]``, the fused kernel tier's certificate width (the
    derivation on :func:`maxsim_topk_scan16_fused`); shared with the
    sharded composition so the bound math has one home."""
    kappa = jnp.float32(h + lq) * jnp.float32(2.0**-23)
    return (
        c1[:, None] * e_max[None, :]
        + (a_c + kappa * (c1 + 2.0 * q_w))[:, None] * n_max[None, :]
    ) * jnp.float32(_BOUND_SLACK) + jnp.float32(_BOUND_EPS)


def maxsim_topk_scan16_fused(
    q_tok: jax.Array,  # [B, Lq, H] f32
    q_mask: jax.Array,  # [B, Lq] bool
    tokens: jax.Array,  # [N, Lt, H] float (primary storage — rescore source)
    t_mask: jax.Array,  # [N, Lt] bool
    tok16: jax.Array,  # [N, Lt, H] bf16 scan replica (prepare_maxsim_scan16)
    e_max: jax.Array,  # [N] f32
    n_max: jax.Array,  # [N] f32
    valid: jax.Array,  # [N] bool
    k: int,
    rescore: int = 1024,
    tile_n: int = 0,
    interpret: bool = False,
    select: str = "auto",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Certified bf16-scan MaxSim top-k via the FUSED Pallas kernel →
    ``(scores [B,k], rows [B,k], certified [B] bool)``.

    Same contract as :func:`maxsim_topk_scan16` (a certified result is
    provably :func:`maxsim_scan_topk`'s full-corpus answer over primary
    storage) but the scan is one kernel whose ``[B·Lq, C]`` interaction
    never leaves VMEM — the XLA tier round-trips a ``[B,Lq,block,Lt]``
    tensor through HBM every block. The kernel quantizes the query to
    bf16 (MXU-native), so the bound adds query residual terms:

        U = s_kernel + C1·e_max + (A + κ·(C1 + 2Q))·n_max

    with ``A/C1/Q`` from :func:`_scan16_query_pack` and
    ``κ = (H+Lq)·2⁻²³`` covering the f32 dot+sum rounding of the
    kernel (on C1), the oracle AND the rescore programs (on Q, factor
    2). All slack only widens U — certification fails closed.

    ``tok16 is tokens`` (the zero-copy bf16-primary pack) lowers to a
    single-corpus-parameter program — XLA charges aliased parameters
    separately at compile time (maxsim_topk_scan16's note)."""
    if rescore < k:
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(f"rescore={rescore} must be >= k={k}")
    if tok16 is tokens:
        return _maxsim_topk_self16_fused(
            q_tok, q_mask, tokens, t_mask, e_max, n_max, valid,
            k=k, rescore=rescore, tile_n=tile_n, interpret=interpret,
            select=select,
        )
    return _maxsim_topk_scan16_fused_two(
        q_tok, q_mask, tokens, t_mask, tok16, e_max, n_max, valid,
        k=k, rescore=rescore, tile_n=tile_n, interpret=interpret,
        select=select,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "rescore", "tile_n", "interpret", "select"),
)
def _maxsim_topk_self16_fused(
    q_tok, q_mask, tokens, t_mask, e_max, n_max, valid, k, rescore, tile_n,
    interpret, select,
):
    return _scan16_fused_body(
        q_tok, q_mask, tokens, t_mask, tokens, e_max, n_max, valid,
        k, rescore, tile_n, interpret, select,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "rescore", "tile_n", "interpret", "select"),
)
def _maxsim_topk_scan16_fused_two(
    q_tok, q_mask, tokens, t_mask, tok16, e_max, n_max, valid, k, rescore,
    tile_n, interpret, select,
):
    return _scan16_fused_body(
        q_tok, q_mask, tokens, t_mask, tok16, e_max, n_max, valid,
        k, rescore, tile_n, interpret, select,
    )


def _scan16_fused_body(
    q_tok, q_mask, tokens, t_mask, tok16, e_max, n_max, valid, k, rescore,
    tile_n, interpret, select="auto",
):
    from trueno_rag_tpu.ops.pallas.maxsim_scan import maxsim_scan16_scores

    b, lq, h = q_tok.shape
    n = tokens.shape[0]
    qv = jnp.where(q_mask[:, :, None], _f32(q_tok), 0.0)
    q16, a_c, c1, q_w = _scan16_query_pack(q_tok, q_mask)
    s16k = maxsim_scan16_scores(
        q16, tok16, t_mask, valid, tile_n=tile_n, interpret=interpret
    )  # [B, N]; -inf at invalid chunks
    w_bc = _scan16_fused_widths(a_c, c1, q_w, e_max, n_max, h, lq)
    u = s16k + w_bc  # -inf + finite widening stays -inf
    return _select_rescore_certify(
        qv, q_mask, tokens, t_mask, u, k, min(rescore, n), select
    )


@functools.partial(
    jax.jit, static_argnames=("k", "rescore", "block", "select")
)
def maxsim_topk_int8(
    q_tok: jax.Array,  # [B, Lq, H] f32
    q_mask: jax.Array,  # [B, Lq] bool
    tokens: jax.Array,  # [N, Lt, H] float (primary storage — rescore source)
    t_mask: jax.Array,  # [N, Lt] bool
    tok8: jax.Array,  # [N, Lt, H] int8 scan replica (prepare_maxsim_int8)
    s_tok: jax.Array,  # [N, Lt] f32 per-token scales
    e_max: jax.Array,  # [N] f32
    n_max: jax.Array,  # [N] f32
    valid: jax.Array,  # [N] bool
    k: int,
    rescore: int = 1024,
    block: int = 512,
    select: str = "auto",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Certified int8-scan MaxSim top-k →
    ``(scores [B,k], rows [B,k], certified [B] bool)`` — the 1 B/elem
    sibling of :func:`maxsim_topk_scan16` (~4x less scan traffic than
    fp32 primary, ~2x less than bf16 primary, where it is the only
    tier that still cuts bytes). The integer q8·d8 dot is exact
    (int32 accumulate on the MXU); the bound carries the token residual
    (``e_max·Σu_q``), the query residual against the dequantized
    tokens (``n_max·Σv_q`` — coefficients from
    dense_tiered._int8_query_bounds, the certificate-critical shared
    derivation) and the budgeted f32 rounding of both programs."""
    if rescore < k:
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(f"rescore={rescore} must be >= k={k}")
    from trueno_rag_tpu.ops.dense_tiered import _int8_query_bounds

    b, lq, h = q_tok.shape
    n, lt = t_mask.shape
    qv, qn_w = _widened_query_norms(q_tok, q_mask)
    q8, t_q, u_q, v_q = _int8_query_bounds(qv.reshape(b * lq, h))
    qm_f = q_mask.reshape(b * lq)
    # padded query tokens contribute exactly 0 to MaxSim — zero their
    # error coefficients (their q8 rows are already all-zero)
    usum = jnp.sum(jnp.where(qm_f, u_q, 0.0).reshape(b, lq), axis=1)  # [B]
    vsum = jnp.sum(jnp.where(qm_f, v_q, 0.0).reshape(b, lq), axis=1)
    qsum_w = jnp.sum(jnp.where(q_mask, qn_w, 0.0), axis=1)
    k_round = _tier_rounding_coeff(lq, h)

    g = max(-(-n // block), 1)
    pad = g * block - n
    tok8_p, s_p, tm_p, v_p, e_p, n_p = tok8, s_tok, t_mask, valid, e_max, n_max
    if pad:
        tok8_p = jnp.pad(tok8, ((0, pad), (0, 0), (0, 0)))
        s_p = jnp.pad(s_tok, ((0, pad), (0, 0)), constant_values=1.0)
        tm_p = jnp.pad(t_mask, ((0, pad), (0, 0)))
        v_p = jnp.pad(valid, ((0, pad),))
        e_p = jnp.pad(e_max, ((0, pad),))
        n_p = jnp.pad(n_max, ((0, pad),))

    def step(carry, xs):
        tok_b, s_b, tm_b, v_b, e_b, n_b = xs  # [C, Lt, H] i8, [C, Lt], ...
        c = tok_b.shape[0]
        dots = jax.lax.dot_general(
            q8, tok_b.reshape(c * lt, h),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [B·Lq, C·Lt] — exact integer dot
        approx = (
            dots.astype(jnp.float32)
            * t_q[:, None]
            * s_b.reshape(c * lt)[None, :]
        )
        sim = approx.reshape(b, lq, c, lt)
        sim = jnp.where(tm_b[None, None, :, :], sim, NEG_INF)
        best = jnp.max(sim, axis=3)  # [B, Lq, C]
        best = jnp.where(q_mask[:, :, None] & jnp.isfinite(best), best, 0.0)
        s8 = jnp.sum(best, axis=1)  # [B, C]
        w_bc = (
            usum[:, None] * e_b[None, :]
            + vsum[:, None] * n_b[None, :]
            + k_round * qsum_w[:, None] * n_b[None, :]
        ) * jnp.float32(_BOUND_SLACK) + jnp.float32(_BOUND_EPS)
        u = jnp.where(v_b[None, :], s8 + w_bc, NEG_INF)
        return carry, u

    _, u = jax.lax.scan(
        step,
        0.0,
        (
            tok8_p.reshape(g, block, lt, h),
            s_p.reshape(g, block, lt),
            tm_p.reshape(g, block, lt),
            v_p.reshape(g, block),
            e_p.reshape(g, block),
            n_p.reshape(g, block),
        ),
    )
    u = jnp.transpose(u, (1, 0, 2)).reshape(b, g * block)
    if pad:
        u = u[:, :n]
    return _select_rescore_certify(
        qv, q_mask, tokens, t_mask, u, k, min(rescore, n), select
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "rescore", "tile_n", "interpret", "select"),
)
def maxsim_topk_int8_fused(
    q_tok: jax.Array,  # [B, Lq, H] f32
    q_mask: jax.Array,  # [B, Lq] bool
    tokens: jax.Array,  # [N, Lt, H] float (primary storage — rescore source)
    t_mask: jax.Array,  # [N, Lt] bool
    tok8: jax.Array,  # [N, Lt, H] int8 scan replica (prepare_maxsim_int8)
    s_tok: jax.Array,  # [N, Lt] f32 per-token scales
    e_max: jax.Array,  # [N] f32
    n_max: jax.Array,  # [N] f32
    valid: jax.Array,  # [N] bool
    k: int,
    rescore: int = 1024,
    tile_n: int = 0,
    interpret: bool = False,
    select: str = "auto",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Certified int8-scan MaxSim top-k via the FUSED Pallas kernel →
    ``(scores [B,k], rows [B,k], certified [B] bool)`` — the 1 B/elem
    sibling of :func:`maxsim_topk_scan16_fused`. The kernel computes
    the SAME program as :func:`maxsim_topk_int8` semantically (exact
    int32 dot, f32 dequant multiplies, masked max, Lq-term f32 sum), so
    that tier's bound coefficients transfer unchanged — only the scan's
    HBM traffic changes (no ``[B,Lq,block,Lt]`` round-trips)."""
    if rescore < k:
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(f"rescore={rescore} must be >= k={k}")
    from trueno_rag_tpu.ops.dense_tiered import _int8_query_bounds
    from trueno_rag_tpu.ops.pallas.maxsim_scan import maxsim_scan_int8_scores

    b, lq, h = q_tok.shape
    n = tokens.shape[0]
    qv, qn_w = _widened_query_norms(q_tok, q_mask)
    q8, t_q, u_q, v_q = _int8_query_bounds(qv.reshape(b * lq, h))
    qm_f = q_mask.reshape(b * lq)
    usum = jnp.sum(jnp.where(qm_f, u_q, 0.0).reshape(b, lq), axis=1)  # [B]
    vsum = jnp.sum(jnp.where(qm_f, v_q, 0.0).reshape(b, lq), axis=1)
    qsum_w = jnp.sum(jnp.where(q_mask, qn_w, 0.0), axis=1)
    k_round = _tier_rounding_coeff(lq, h)

    s8 = maxsim_scan_int8_scores(
        q8.reshape(b, lq, h), t_q.reshape(b, lq), tok8, s_tok, t_mask,
        valid, tile_n=tile_n, interpret=interpret,
    )  # [B, N]; -inf at invalid chunks
    w_bc = (
        usum[:, None] * e_max[None, :]
        + vsum[:, None] * n_max[None, :]
        + k_round * qsum_w[:, None] * n_max[None, :]
    ) * jnp.float32(_BOUND_SLACK) + jnp.float32(_BOUND_EPS)
    u = s8 + w_bc
    return _select_rescore_certify(
        qv, q_mask, tokens, t_mask, u, k, min(rescore, n), select
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "rescore", "tile_n", "interpret", "select"),
)
def maxsim_topk_int8_store(
    q_tok: jax.Array,  # [B, Lq, H] f32
    q_mask: jax.Array,  # [B, Lq] bool
    tok8: jax.Array,  # [N, Lt, H] int8 — THE storage (no float primary)
    s_tok: jax.Array,  # [N, Lt] f32 per-token scales
    t_mask: jax.Array,  # [N, Lt] bool
    n_max: jax.Array,  # [N] f32 — widened max dequantized token norm
    valid: jax.Array,  # [N] bool
    k: int,
    rescore: int = 1024,
    tile_n: int = 0,
    interpret: bool = False,
    select: str = "auto",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Certified MaxSim over int8 PRIMARY storage →
    ``(scores [B,k], rows [B,k], certified [B] bool)`` — the capacity
    tier (r4 verdict #5). Exactness is defined over the DEQUANTIZED
    stored tokens ``a_j = s_j·tok8_j`` (the same storage-tier contract
    as the dense ``storage_dtype="bfloat16"`` store: quantization
    happens at ingest, retrieval is exact over what is stored), so the
    ONLY corpus-scale array in HBM is the 1 B/element pack + scales —
    2M×32×128 fits in ~8.5 GB where the bf16-primary zero-copy tier
    (16.4 GB) cannot.

    Bound structure = :func:`maxsim_topk_int8_fused` with the
    token-residual term dropped (``e_max ≡ 0``: storage IS the int8
    values): the scan's int32 q8·tok8 dot is exact, so the interval
    covers only the QUERY quantization (``v_q`` per token, summed) and
    the budgeted f32 rounding of both programs. Candidate rescore
    gathers the raw int8 rows and dequantizes just the ``[B, C]``
    slabs (``_select_rescore_threshold``'s tuple-primary mode)."""
    if rescore < k:
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(f"rescore={rescore} must be >= k={k}")
    from trueno_rag_tpu.ops.dense_tiered import _int8_query_bounds
    from trueno_rag_tpu.ops.pallas.maxsim_scan import maxsim_scan_int8_scores

    b, lq, h = q_tok.shape
    n = tok8.shape[0]
    qv, qn_w = _widened_query_norms(q_tok, q_mask)
    q8, t_q, u_q, v_q = _int8_query_bounds(qv.reshape(b * lq, h))
    qm_f = q_mask.reshape(b * lq)
    vsum = jnp.sum(jnp.where(qm_f, v_q, 0.0).reshape(b, lq), axis=1)
    qsum_w = jnp.sum(jnp.where(q_mask, qn_w, 0.0), axis=1)
    k_round = _tier_rounding_coeff(lq, h)
    s8 = maxsim_scan_int8_scores(
        q8.reshape(b, lq, h), t_q.reshape(b, lq), tok8, s_tok, t_mask,
        valid, tile_n=tile_n, interpret=interpret,
    )
    w_bc = (
        (vsum + k_round * qsum_w)[:, None] * n_max[None, :]
    ) * jnp.float32(_BOUND_SLACK) + jnp.float32(_BOUND_EPS)
    u = s8 + w_bc
    return _select_rescore_certify(
        qv, q_mask, (tok8, s_tok), t_mask, u, k, min(rescore, n), select
    )


@functools.partial(
    jax.jit, static_argnames=("k", "t_hits", "rescore", "u_block")
)
def maxsim_topk_token_pruned(
    q_tok: jax.Array,  # [B, Lq, H] f32
    q_mask: jax.Array,  # [B, Lq] bool
    tokens: jax.Array,  # [N, Lt, H] float
    t_mask: jax.Array,  # [N, Lt] bool
    valid: jax.Array,  # [N] bool
    k: int,
    t_hits: int = 256,
    rescore: int = 256,
    u_block: int = 512,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Certified token-level-pruned MaxSim top-k →
    ``(scores [B,k], rows [B,k], certified [B] bool)``.

    The classic exact late-interaction algorithm as one XLA program:

    1. **Token pass** — exact top-``t_hits`` matches per query token
       over the flat ``[N·Lt, H]`` token matrix (one MXU matmul +
       blockwise exact top-k). The T-th hit score τᵢ bounds every
       unretrieved token; flat hit ids map to chunks by ``// Lt``
       (no gather).
    2. **Candidate bounds** — each hit chunk's sound upper bound is
       ``U(D) = Σᵢ max(best_hitᵢ(D), τᵢ)``; chunks with no hit at all
       are bounded by ``Σᵢ τᵢ``; empty-but-valid chunks score exactly
       0 and force the threshold to at least 0.
    3. **Rescore + certificate** — the ``rescore`` best-bounded
       candidates are exactly rescored; ``certified[b]`` iff the k-th
       exact score strictly beats max((C+1)-th bound, Σᵢτᵢ, empty
       floor). A certified result IS the full-corpus exact top-k over
       the stored token values; ties and pruning misses fail closed.

    τ and the hit scores come from a DIFFERENT matmul program than the
    rescore einsum, so both are widened by the cross-program rounding
    budget ``2·H·2⁻²³·‖qᵢ‖·max‖d‖`` before use (plus the framework's
    ``_BOUND_SLACK``/``_BOUND_EPS`` on every f32 reduction), keeping
    the certificate sound across programs.

    Memory: the token pass materializes ``[B·Lq, N·Lt]`` f32 scores —
    size the batch to the corpus (this is the latency tier; the exact
    scan streams instead). ``u_block`` bounds the ``[B, Lq, T,
    u_block]`` bound-matching tensor.
    """
    if rescore < k:
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(f"rescore={rescore} must be >= k={k}")
    b, lq, h = q_tok.shape
    n, lt = t_mask.shape
    m = n * lt
    acc_eps = jnp.float32(h) * jnp.float32(2.0**-23)

    # -- token pass ----------------------------------------------------
    qv = jnp.where(q_mask[:, :, None], q_tok, 0.0)
    qf = qv.reshape(b * lq, h)
    ftok = _f32(tokens).reshape(m, h)
    fvalid = (t_mask & valid[:, None]).reshape(m)
    s_tok = jax.lax.dot_general(
        qf, ftok, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # [B·Lq, M]
    s_tok = jnp.where(fvalid[None, :], s_tok, NEG_INF)
    t_eff = min(t_hits, m)
    hs, hid = blockwise_topk(s_tok, t_eff)  # [B·Lq, T]

    # cross-program widening: the rescore einsum may round the same
    # ⟨qᵢ,d⟩ differently; δ ≥ the discrepancy keeps τ/hits sound bounds
    qn_w = jnp.linalg.norm(qv, axis=2).reshape(b * lq) * (
        1.0 + jnp.float32(h + 2) * jnp.float32(2.0**-23)
    )
    dn_w = jnp.max(
        jnp.where(fvalid, jnp.linalg.norm(ftok, axis=1), 0.0)
    ) * (1.0 + jnp.float32(h + 2) * jnp.float32(2.0**-23))
    delta = 2.0 * acc_eps * qn_w * dn_w  # [B·Lq]
    tau = hs[:, t_eff - 1] + delta  # [B·Lq]; -inf stays -inf
    hs_w = hs + delta[:, None]
    # padded query tokens contribute exactly 0 to MaxSim: zero their τ
    # and drop their hits
    qm_f = q_mask.reshape(b * lq)
    tau = jnp.where(qm_f, tau, 0.0)
    hid = jnp.where(qm_f[:, None], hid, -1)

    hc = jnp.where(hid >= 0, hid // lt, -1).astype(jnp.int32)  # hit chunks
    hc3 = hc.reshape(b, lq, t_eff)
    hs3 = jnp.where(hc3 >= 0, hs_w.reshape(b, lq, t_eff), NEG_INF)
    tau2 = tau.reshape(b, lq)

    # Σᵢ τᵢ — the no-hit-chunk bound, widened for the Lq-term f32 sum.
    # τᵢ = -inf (every valid token retrieved for token i) implies no
    # wholly-unhit nonempty chunk can exist, so the bound is -inf; clamp
    # before the widened sum to avoid -inf + inf·slack = NaN.
    any_ninf = jnp.any(jnp.isneginf(tau2), axis=1)
    tau_f = jnp.where(jnp.isneginf(tau2), 0.0, tau2)
    stau = jnp.sum(tau_f, axis=1)
    stau_mag = jnp.sum(jnp.abs(tau_f), axis=1)
    stau = (
        stau
        + stau_mag * jnp.float32(lq) * jnp.float32(2.0**-23)
        + stau_mag * jnp.float32(_BOUND_SLACK - 1.0)
        + jnp.float32(_BOUND_EPS)
    )  # [B]
    stau = jnp.where(any_ninf, NEG_INF, stau)

    # -- candidate slots: dedup hit chunks per query ---------------------
    w = lq * t_eff
    cand_all = jax.lax.sort(hc.reshape(b, w), dimension=1)  # -1s first
    dup = jnp.concatenate(
        [jnp.zeros((b, 1), bool), cand_all[:, 1:] == cand_all[:, :-1]], axis=1
    )
    cand_all = jnp.where(dup, -1, cand_all)  # one slot per unique chunk
    gw = -(-w // u_block)
    padw = gw * u_block - w
    if padw:
        cand_all = jnp.pad(cand_all, ((0, 0), (0, padw)), constant_values=-1)

    # -- per-candidate sound bound U = Σᵢ max(best_hitᵢ, τᵢ) ------------
    def u_step(carry, cw):  # cw [B, u_block]
        eq = hc3[:, :, :, None] == cw[:, None, None, :]  # [B,Lq,T,u]
        mx = jnp.max(
            jnp.where(eq, hs3[:, :, :, None], NEG_INF), axis=2
        )  # [B, Lq, u]
        bi = jnp.maximum(mx, tau2[:, :, None])
        u = jnp.sum(bi, axis=1)
        mag = jnp.sum(jnp.abs(bi), axis=1)
        u = (
            u
            + mag * jnp.float32(lq) * jnp.float32(2.0**-23)
            + mag * jnp.float32(_BOUND_SLACK - 1.0)
            + jnp.float32(_BOUND_EPS)
        )
        u = jnp.where(cw >= 0, u, NEG_INF)
        return carry, u

    cw_blocks = jnp.transpose(
        cand_all.reshape(b, gw, u_block), (1, 0, 2)
    )  # [G, B, u]
    _, u_blocks = jax.lax.scan(u_step, 0.0, cw_blocks)
    u = jnp.transpose(u_blocks, (1, 0, 2)).reshape(b, gw * u_block)[:, :w]

    # -- select, rescore, certify ---------------------------------------
    c_n = min(rescore, w)
    sel = min(c_n + 1, w)
    u_top, uidx = blockwise_topk(u, sel)
    thr_cand = u_top[:, c_n] if sel > c_n else jnp.full((b,), NEG_INF)
    uidx = uidx[:, :c_n]
    rows_c = jnp.where(
        uidx >= 0,
        jnp.take_along_axis(cand_all, jnp.maximum(uidx, 0), axis=1),
        -1,
    )
    rows_c = jax.lax.sort(rows_c, dimension=1)  # (score desc, row asc) order

    safe = jnp.maximum(rows_c, 0)
    tok_c = jnp.take(tokens, safe.reshape(-1), axis=0).reshape(
        b, c_n, lt, tokens.shape[2]
    )
    tm_c = jnp.take(t_mask, safe.reshape(-1), axis=0).reshape(b, c_n, lt)
    s = maxsim_pair_scores(q_tok, q_mask, tok_c, tm_c)
    s = jnp.where(rows_c >= 0, s, NEG_INF)

    k_eff = min(k, c_n)
    top_s, idx = jax.lax.top_k(s, k_eff)
    rows = jnp.take_along_axis(rows_c, idx, axis=1)
    rows = jnp.where(jnp.isneginf(top_s), -1, rows)
    if k_eff < k:
        top_s = jnp.pad(
            top_s, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF
        )
        rows = jnp.pad(rows, ((0, 0), (0, k - k_eff)), constant_values=-1)

    # threshold over everything NOT exactly rescored: unselected
    # candidates' bounds, wholly-unhit chunks' Στ, and the 0.0 score of
    # any valid-but-empty chunk (never a candidate by construction)
    has_empty = jnp.any(valid & ~jnp.any(t_mask, axis=1))
    threshold = jnp.maximum(thr_cand, stau)
    threshold = jnp.where(
        has_empty, jnp.maximum(threshold, 0.0), threshold
    )
    kth = top_s[:, k_eff - 1]
    certified = (kth > threshold) | jnp.isneginf(threshold)
    return top_s, rows, certified


def maxsim_scan_oracle(
    q_tok: np.ndarray,
    q_mask: np.ndarray,
    tokens: np.ndarray,
    t_mask: np.ndarray,
    valid: np.ndarray,
    k: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host oracle for :func:`maxsim_scan_topk` (f32 math, the
    framework's (score desc, row asc) total order, ``-1``/``-inf``
    invalid slots)."""
    q_tok = np.asarray(q_tok, np.float32)
    tokens = np.asarray(tokens, np.float32)
    q_mask = np.asarray(q_mask, bool)
    t_mask = np.asarray(t_mask, bool)
    valid = np.asarray(valid, bool)
    b, n = q_tok.shape[0], tokens.shape[0]
    scores = np.full((b, n), NEG_INF, dtype=np.float32)
    for c in range(n):
        if not valid[c]:
            continue
        tm = t_mask[c]
        total = np.zeros((b,), np.float32)
        if tm.any():
            sim = np.einsum(
                "bqh,th->bqt", q_tok, tokens[c], dtype=np.float32
            )
            sim = np.where(tm[None, None, :], sim, NEG_INF)
            best = sim.max(axis=2)  # [B, Lq]
            best = np.where(q_mask & np.isfinite(best), best, 0.0)
            total = best.sum(axis=1, dtype=np.float32)
        scores[:, c] = total
    out_s = np.full((b, k), NEG_INF, dtype=np.float32)
    out_r = np.full((b, k), -1, dtype=np.int32)
    for i in range(b):
        order = sorted(range(n), key=lambda c: (-scores[i, c], c))
        kept = [c for c in order if np.isfinite(scores[i, c])][:k]
        out_s[i, : len(kept)] = scores[i, kept]
        out_r[i, : len(kept)] = kept
    return out_s, out_r
