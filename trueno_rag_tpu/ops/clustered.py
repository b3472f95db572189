"""Cluster-pruned certified dense tier: scan only the tiles that can
matter, keep the exact-set certificate.

The compact tiers stream the WHOLE corpus per batch — right for large
batches (the stream amortizes over B), wrong for latency: at 10M×384
a single query pays the full ~12 GB scan. Real embedding corpora are
strongly clustered, so almost every tile provably cannot contain a
top-k row. This module makes that a certificate:

- **Build** (:func:`prepare_clustered`): balanced k-means over the
  stored f32 rows assigns every row to one of ``T = N/tile_n``
  clusters of capacity ``tile_n``; the returned ``order`` permutes
  rows so cluster ``c`` IS storage tile ``c``. Per tile it returns the
  f32 centroid ``µ_c`` and a sound radius
  ``R_c ≥ max_{x∈c} ‖x − µ_c‖₂`` (computed in f64 over the exact f32
  values, widened by the same slack used everywhere else).
- **Query** (:func:`dense_topk_compact_bf16r_clustered`): by
  Cauchy-Schwarz every row of tile c satisfies
  ``q·x = q·µ_c + q·(x − µ_c) ≤ q·µ_c + ‖q‖·R_c = U_c`` —
  one tiny [B, T] matmul upper-bounds every tile. Each query probes
  its top-``probe_tiles`` tiles by ``U``; the batch union of probed
  tiles is gathered (XLA tile gather — contiguous copies, not row
  gathers) and scanned with the SAME scan_select_v2 kernel and
  rescore/certify tail as the compact tier. The unscanned tiles'
  ``max U_c`` joins the exclusion threshold, so a certified query's
  set is PROVABLY the exact top-k over the FULL corpus (reference
  semantics index.rs:386-412): if the pruning could have cut a true
  top-k row, the certificate fails closed instead.

Batch economics: the scan touches ``|union| ≤ B·probe_tiles`` tiles,
so pruning pays when ``B·probe_tiles ≪ T`` — the latency-critical
small-batch regime (the full-stream compact tier remains the
large-batch throughput path). Tag filters compose exactly as in the
compact tier (the predicate rides the kernel; ``U`` stays a valid
upper bound for any filtered subset, so pruning remains fail-closed).

This XLA path copies the union once (gather) and scans the copy
(~3x the selected bytes vs a perfect selective-DMA kernel — a
scalar-prefetch Pallas variant can cut that once measurable on
hardware); at 10%-selectivity it is still ~3x less HBM traffic than
the full stream.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from trueno_rag_tpu.ops.dense import NEG_INF
from trueno_rag_tpu.ops.dense_tiered import (
    _BOUND_EPS,
    _BOUND_SLACK,
    _bf16_query_bounds,
    _metric_queries,
    _pad_tags,
    _tile_candidates,
    _trim_rescore_verify_compact,
)


# ---------------------------------------------------------------------------
# Build: balanced k-means → tile permutation + certified tile bounds
# ---------------------------------------------------------------------------


def prepare_clustered(
    matrix,
    tile_n: int = 4096,
    metric: str = "cosine",
    iters: int = 8,
    sample: int = 65_536,
    seed: int = 0,
    alternatives: int = 8,
    slab: int = 1 << 18,
    valid: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cluster the corpus into ``T = ceil(N/tile_n)`` balanced tiles →
    ``(order [T·tile_n] int32, centroids [T, d] f32, radii [T] f32)``.

    ``order[i]`` is the ORIGINAL row stored at permuted position ``i``
    (``-1`` = hole; tiles are capacity-``tile_n``, the last members of
    underfull clusters are holes). Apply with
    :func:`apply_cluster_order` to every per-row array (matrix, norms,
    valid, tags), then hand the permuted arrays to the clustered query
    op. ``radii`` are sound against the exact f32 row/centroid values
    (f64 evaluation, slack-widened), so the query-side tile bound is a
    true upper bound — certification never depends on k-means quality,
    only pruning efficiency does.

    Lloyd's runs on a ``sample`` (device matmuls); the full assignment
    is device-scored in ``slab``-row slices; the balancing pass is a
    host greedy fill over rows ordered by assignment confidence
    (build-time, one pass).

    ``metric`` documents the score space the caller queries in; the
    CLUSTERING itself is always Euclidean k-means (for cosine the rows
    are pre-normalized — VectorStore normalizes at insert — so
    Euclidean and angular clustering coincide; for raw dot-metric
    corpora the bound stays SOUND regardless — it only uses true
    centroid/radius geometry — but pruning selectivity may be poorer).
    """
    m = np.asarray(matrix, dtype=np.float32)
    if valid is not None:
        # Cluster ONLY live rows: a capacity-padded store's zero rows
        # sit ~unit distance from every normalized row, so letting them
        # into a tile blows its radius to ~1 and kills that tile's
        # pruning bound (measured: radii 1.2-1.35 on pure blobs).
        # Invalid rows become holes; `order` still indexes the ORIGINAL
        # row space.
        keep = np.flatnonzero(np.asarray(valid, bool))
        if len(keep) == 0:
            # every row invalid (e.g. a fully-deleted store): all holes
            return (np.full(tile_n, -1, np.int32),
                    np.zeros((1, m.shape[1]), np.float32),
                    np.zeros(1, np.float32))
        if len(keep) < m.shape[0]:
            sub_order, centroids, radii = prepare_clustered(
                m[keep], tile_n=tile_n, metric=metric, iters=iters,
                sample=sample, seed=seed, alternatives=alternatives,
                slab=slab,
            )
            order = np.where(
                sub_order >= 0,
                keep[np.clip(sub_order, 0, len(keep) - 1)],
                -1,
            ).astype(np.int32)
            return order, centroids, radii
    n, d = m.shape
    if n == 0:
        return (np.full(tile_n, -1, np.int32),
                np.zeros((1, m.shape[1]), np.float32),
                np.zeros(1, np.float32))
    t = -(-n // tile_n)
    rng = np.random.default_rng(seed)

    # --- Lloyd's on a sample (device matmuls, host argmax) ---------------
    s_idx = rng.choice(n, size=min(sample, n), replace=False)
    s_rows = m[s_idx]
    # farthest-first init: random (and even kmeans++ sampled) init
    # routinely seeds two centers in one clump and leaves another clump
    # unclaimed, which Lloyd's never recovers from — one stray row then
    # blows that tile's radius to the inter-clump distance and kills
    # its pruning bound (measured: median radius 1.2 vs ~0.5). The
    # farthest-first traversal provably picks one seed per clump when
    # clumps are separated; Lloyd's then refines.
    cent = np.zeros((t, d), dtype=np.float32)
    cent[0] = s_rows[rng.integers(len(s_rows))]
    d2 = ((s_rows - cent[0]) ** 2).sum(axis=1)
    for c in range(1, t):
        cent[c] = s_rows[int(np.argmax(d2))]
        d2 = np.minimum(d2, ((s_rows - cent[c]) ** 2).sum(axis=1))
    for _ in range(max(iters, 1)):
        # Euclidean assignment: argmin ‖x − µ‖² == argmax (x·µ − ‖µ‖²/2).
        # Plain dot is norm-biased (a tight blob's mean has a larger
        # norm and swallows everything) and never recovers the blobs.
        scores = np.asarray(jnp.asarray(s_rows) @ jnp.asarray(cent).T)
        scores = scores - 0.5 * (cent * cent).sum(axis=1)[None, :]
        assign = scores.argmax(axis=1)
        for c in range(t):
            members = s_rows[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)

    # --- full assignment with alternatives (device-scored slabs) ---------
    n_alt = min(alternatives, t)
    top_alt = np.zeros((n, n_alt), dtype=np.int32)
    top_val = np.zeros((n, n_alt), dtype=np.float32)
    cent_j = jnp.asarray(cent)
    half_norm2 = 0.5 * (cent * cent).sum(axis=1)
    for lo in range(0, n, slab):
        sc = np.asarray(jnp.asarray(m[lo : lo + slab]) @ cent_j.T) - half_norm2[None, :]
        part = np.argpartition(-sc, n_alt - 1, axis=1)[:, :n_alt]
        vals = np.take_along_axis(sc, part, axis=1)
        o = np.argsort(-vals, axis=1, kind="stable")
        top_alt[lo : lo + slab] = np.take_along_axis(part, o, axis=1)
        top_val[lo : lo + slab] = np.take_along_axis(vals, o, axis=1)

    margin = top_val[:, 0] - (top_val[:, 1] if n_alt > 1 else 0.0)
    members = _greedy_fill(top_alt, margin, t, tile_n)

    # --- final layout + SOUND per-tile bounds over the f32 values --------
    # The scan kernel keeps only the top-2 rows per 128-row block
    # (scan_select_v2._tile_tournament), so any layout that puts >2 of a
    # query's true top-k in one block caps the emitted candidates and
    # fails the certificate. A query's concentrated top rows are
    # MUTUALLY near, hence have near-equal centroid scores — sorting
    # members by centroid score and interleaving by RANK (member j ->
    # block j mod nb) sends score-adjacent rows to distinct blocks.
    # (The greedy-visit margin order does NOT have this property —
    # measured: three planted near-duplicates of one centroid landed in
    # one block at ranks 60-150 and correctly but needlessly failed the
    # certificate.)
    from trueno_rag_tpu.ops.pallas.scan_select_v2 import BLOCK

    nb = max(tile_n // BLOCK, 1)
    order = np.full(t * tile_n, -1, dtype=np.int32)
    centroids = np.zeros((t, d), dtype=np.float32)
    radii = np.zeros(t, dtype=np.float32)
    for c in range(t):
        rows = np.asarray(members[c], dtype=np.int32)
        if len(rows) == 0:
            continue
        mu64 = m[rows].astype(np.float64).mean(axis=0)
        centroids[c] = mu64.astype(np.float32)
        cscore = m[rows].astype(np.float64) @ mu64
        rows = rows[np.argsort(-cscore, kind="stable")]
        j = np.arange(len(rows))
        pos = (j % nb) * BLOCK + j // nb
        order[c * tile_n + pos] = rows
        diff = m[rows].astype(np.float64) - centroids[c].astype(np.float64)
        r_max = float(np.sqrt((diff * diff).sum(axis=1)).max())
        radii[c] = np.float32(r_max * _BOUND_SLACK + _BOUND_EPS)
    return order, centroids, radii


def _greedy_fill(
    top_alt: np.ndarray, margin: np.ndarray, t: int, tile_n: int
) -> list:
    """Balanced greedy fill: most-confident rows (by assignment margin,
    best − second-best score) claim a slot in their best cluster first;
    rows whose alternatives are all full spill into any cluster with
    space. Shared by the host and device prep paths (the placement
    decision is inherently sequential — O(N·n_alt) host work over two
    small fetched arrays)."""
    visit = np.argsort(-margin, kind="stable")
    space = np.full(t, tile_n, dtype=np.int64)  # uniform capacities;
    # underfull clusters leave holes that absorb any shortfall
    members: list[list[int]] = [[] for _ in range(t)]
    overflow: list[int] = []
    for r in visit:
        for c in top_alt[r]:
            if space[c] > 0:
                members[c].append(int(r))
                space[c] -= 1
                break
        else:
            overflow.append(int(r))
    if overflow:  # all alternatives full: any cluster with space
        open_c = np.flatnonzero(space > 0)
        oi = 0
        for r in overflow:
            while space[open_c[oi]] == 0:
                oi += 1
            members[open_c[oi]].append(r)
            space[open_c[oi]] -= 1
    return members


def apply_cluster_order(arr, order: np.ndarray, fill=0):
    """Permute a per-row host array into the clustered layout:
    ``out[i] = arr[order[i]]`` with ``fill`` at holes. Works for ``[N]``
    and ``[N, d]`` arrays; returns ``[len(order), ...]``."""
    arr = np.asarray(arr)
    out_shape = (len(order),) + arr.shape[1:]
    out = np.full(out_shape, fill, dtype=arr.dtype)
    present = order >= 0
    out[present] = arr[order[present]]
    return out


def apply_cluster_order_device(arr: jax.Array, order, fill=0) -> jax.Array:
    """Device counterpart of :func:`apply_cluster_order`: one row
    gather of the DEVICE-resident array into the clustered layout
    (holes get ``fill``) — the permuted matrix never visits the host."""
    order = jnp.asarray(order)
    if arr.shape[0] == 0:
        return jnp.full((order.shape[0],) + arr.shape[1:], fill, arr.dtype)
    safe = jnp.clip(order, 0, arr.shape[0] - 1)
    out = jnp.take(arr, safe, axis=0)
    mask = (order >= 0).reshape((order.shape[0],) + (1,) * (arr.ndim - 1))
    return jnp.where(mask, out, jnp.asarray(fill, arr.dtype))


# --- device-resident build helpers (jitted; all [N, d] math on-chip) -------


@functools.partial(jax.jit, static_argnames=("t",))
def _ff_init_device(s_rows: jax.Array, first: jax.Array, t: int) -> jax.Array:
    """Farthest-first seeding on device (same traversal as the host
    path: provably one seed per separated clump; see prepare_clustered)."""
    cent0 = jnp.zeros((t, s_rows.shape[1]), jnp.float32).at[0].set(s_rows[first])
    d20 = jnp.sum((s_rows - cent0[0]) ** 2, axis=1)

    def body(c, state):
        cent, d2 = state
        nxt = s_rows[jnp.argmax(d2)]
        cent = cent.at[c].set(nxt)
        d2 = jnp.minimum(d2, jnp.sum((s_rows - nxt) ** 2, axis=1))
        return cent, d2

    cent, _ = jax.lax.fori_loop(1, t, body, (cent0, d20))
    return cent


@functools.partial(jax.jit, static_argnames=("t", "iters"))
def _lloyd_device(s_rows: jax.Array, cent0: jax.Array, t: int, iters: int) -> jax.Array:
    """Lloyd's on the sample, fully on device. The assignment uses the
    shifted-dot form (argmin ‖x−µ‖² == argmax x·µ − ‖µ‖²/2 — plain dot
    is norm-biased); the centroid update is the one-hot-matmul form of
    a segment mean (a [S, t] scatter-add lowers to a device sort,
    CLAUDE.md lore — the one-hot matmul rides the MXU instead)."""

    def one(_, cent):
        sc = jax.lax.dot_general(
            s_rows, cent, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        ) - 0.5 * jnp.sum(cent * cent, axis=1)[None, :]
        a = jnp.argmax(sc, axis=1)
        oh = jax.nn.one_hot(a, t, dtype=jnp.float32)  # [S, t]
        sums = jax.lax.dot_general(
            oh, s_rows, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # [t, d]
        cnt = jnp.sum(oh, axis=0)
        return jnp.where(cnt[:, None] > 0, sums / jnp.maximum(cnt, 1.0)[:, None], cent)

    return jax.lax.fori_loop(0, iters, one, cent0)


@functools.partial(jax.jit, static_argnames=("n_alt",))
def _assign_slab_device(ms: jax.Array, cent: jax.Array, n_alt: int):
    """Top-``n_alt`` cluster alternatives for one slab of rows →
    ``(margin [S] f32, idx [S, n_alt])``. Only the CONFIDENCE MARGIN
    (best − second-best) leaves the device, not all n_alt scores, and
    the ids ship as int16 when they fit — the greedy fill reads nothing
    else, and at 10M rows the difference is ~460 MB of fetch volume
    (minutes over this box's ~2 MB/s tunnel; real PCIe pays too)."""
    sc = jax.lax.dot_general(
        ms, cent, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ) - 0.5 * jnp.sum(cent * cent, axis=1)[None, :]
    vals, idx = jax.lax.top_k(sc, n_alt)
    margin = vals[:, 0] - (vals[:, 1] if n_alt > 1 else 0.0)
    if cent.shape[0] <= 32_767:
        idx = idx.astype(jnp.int16)
    else:
        idx = idx.astype(jnp.int32)
    return margin, idx


@functools.partial(jax.jit, static_argnames=("t",))
def _centroid_slab_device(ms: jax.Array, asg: jax.Array, t: int):
    """Partial (sum, count) of the final f32 centroids for one slab."""
    oh = jax.nn.one_hot(asg, t, dtype=jnp.float32)
    sums = jax.lax.dot_general(
        oh, ms, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    return sums, jnp.sum(oh, axis=0)


@jax.jit
def _row_stats_slab_device(ms: jax.Array, cent_rows: jax.Array):
    """Per-row ``‖x − µ_assigned‖²`` and centroid score ``x·µ`` for one
    slab (elementwise VPU math — no matmul rounding modes involved)."""
    diff = ms - cent_rows
    return jnp.sum(diff * diff, axis=1), jnp.sum(ms * cent_rows, axis=1)


# Multiplicative widening covering the DEVICE f32 evaluation of the
# per-row distance in _row_stats_slab_device: the subtraction and
# squares are exactly-rounded f32 ops and the d-term sum carries at
# worst sequential accumulation error, so the computed d² satisfies
# d²_fl ≥ d²_true · (1 − (d+2)·2⁻²⁴); at d=4096 that is ≤ 2.5e-4
# relative on d², i.e. ≤ 1.25e-4 on the radius. 5e-4 covers it 4x.
# (_BOUND_SLACK is budgeted for QUERY-side rounding and must not be
# borrowed for build-side error.)
_DEV_RADIUS_SLACK = 1.0 + 5e-4


def prepare_clustered_device(
    matrix: jax.Array,
    tile_n: int = 4096,
    metric: str = "cosine",
    iters: int = 8,
    sample: int = 65_536,
    seed: int = 0,
    alternatives: int = 8,
    slab: int = 1 << 18,
    valid=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Device-resident variant of :func:`prepare_clustered` — same
    ``(order, centroids, radii)`` contract, but every ``[N, d]``
    operation (seeding, Lloyd's, assignment, radii) runs on the
    accelerator; the host sees only O(N) int32/f32 vectors (assignment
    alternatives, margins, centroid scores) plus the tiny ``[T, d]``
    centroids. Use it when the corpus already lives in device memory —
    the host path round-trips the full matrix through the host, which a
    remote/tunneled device cannot afford (measured ~2 MB/s on this
    box's tunnel ⇒ minutes per GB) and even local PCIe pays twice.

    Soundness is preserved with an explicit budget: radii are the
    device-f32 per-row distances widened by ``_DEV_RADIUS_SLACK``
    (covering the on-chip f32 evaluation error — derivation at the
    constant) and then by the same ``_BOUND_SLACK``/``_BOUND_EPS`` as
    the host path (covering query-side rounding). The k-means quality
    itself never affects soundness, only pruning selectivity
    (see prepare_clustered's docstring).

    Implemented over :func:`prepare_clustered_stream` with the resident
    matrix as the row source (contiguous ranges read via dynamic_slice —
    row gathers are several times slower on this hardware, CLAUDE.md).
    """
    m = jnp.asarray(matrix)
    if m.dtype != jnp.float32:
        m = m.astype(jnp.float32)
    n = m.shape[0]

    def row_source(ids: np.ndarray) -> jax.Array:
        ids = np.asarray(ids)
        if (len(ids) and ids[0] >= 0 and ids[0] + len(ids) <= n
                and ids[-1] - ids[0] == len(ids) - 1
                and (np.diff(ids) == 1).all()):  # contiguous ascending run
            return jax.lax.dynamic_slice_in_dim(m, int(ids[0]), len(ids), axis=0)
        return jnp.take(m, jnp.asarray(np.maximum(ids, 0), jnp.int32), axis=0)

    return prepare_clustered_stream(
        row_source, n, int(m.shape[1]) if m.ndim == 2 else 0,
        tile_n=tile_n, metric=metric, iters=iters, sample=sample,
        seed=seed, alternatives=alternatives, slab=slab, valid=valid,
    )


def prepare_clustered_stream(
    row_source,
    n: int,
    d: int,
    tile_n: int = 4096,
    metric: str = "cosine",
    iters: int = 8,
    sample: int = 65_536,
    seed: int = 0,
    alternatives: int = 8,
    slab: int = 1 << 18,
    valid=None,
    recon_err: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Streaming variant of :func:`prepare_clustered_device`: the corpus
    is supplied by ``row_source(ids: np.ndarray int) -> [len(ids), d]
    f32 device array`` instead of a resident matrix, so the full fp32
    corpus NEVER exists anywhere — not in HBM (at 10M×384 it alone
    exceeds a v5e's 16 GB) and not on the host. Sources in use:

    - a resident device matrix (:func:`prepare_clustered_device` wraps
      this function with slice/gather reads);
    - a host matrix read slab-wise (``lambda ids: jnp.asarray(h[ids])``);
    - a deterministic on-device generator keyed by row id (how
      ``benches/clustered_bench.py --stream`` builds 10M-row corpora
      behind a ~2 MB/s tunnel);
    - a reconstruction from the compact replicas
      (``bf16 + r_scale·r_i8``) — pass ``recon_err`` (below).

    ``row_source`` must be a pure function of ``ids`` (the same id must
    yield the same row on every call — rows are re-read once per pass:
    assignment, centroids, radii) and must tolerate repeated ids.

    ``recon_err``: a sound upper bound on ``‖x_true − x_returned‖₂``
    per row, for APPROXIMATE sources. The published radius covers
    ``‖x_true − µ‖ ≤ ‖x̂ − µ‖ + ‖x_true − x̂‖``, so the tile bound
    ``q·µ + ‖q‖·R`` stays a true upper bound on scores of the EXACT
    stored rows (the centroid itself may be computed from x̂ — any
    vector is a valid center; only the radius carries soundness).
    Exact sources pass 0.0 (the default).

    Same ``(order, centroids, radii)`` contract and the same device
    slack budget as :func:`prepare_clustered_device`; k-means quality
    (hence pruning selectivity) may differ from the host path but
    soundness never does.
    """
    if valid is not None:
        keep = np.flatnonzero(np.asarray(valid, bool))
        if len(keep) == 0:
            return (np.full(tile_n, -1, np.int32),
                    np.zeros((1, d), np.float32),
                    np.zeros(1, np.float32))
        if len(keep) < n:
            sub_order, centroids, radii = prepare_clustered_stream(
                lambda ids: row_source(keep[ids]), len(keep), d,
                tile_n=tile_n, metric=metric, iters=iters, sample=sample,
                seed=seed, alternatives=alternatives, slab=slab,
                recon_err=recon_err,
            )
            order = np.where(
                sub_order >= 0,
                keep[np.clip(sub_order, 0, len(keep) - 1)],
                -1,
            ).astype(np.int32)
            return order, centroids, radii
    if n == 0:
        return (np.full(tile_n, -1, np.int32),
                np.zeros((1, d), np.float32),
                np.zeros(1, np.float32))
    t = -(-n // tile_n)
    rng = np.random.default_rng(seed)

    # --- seeding + Lloyd's on a sample (all on device) --------------------
    s_idx = np.sort(rng.choice(n, size=min(sample, n), replace=False))
    s_rows = row_source(s_idx)
    first = jnp.asarray(rng.integers(len(s_idx)), jnp.int32)
    cent = _lloyd_device(s_rows, _ff_init_device(s_rows, first, t), t, max(iters, 1))
    del s_rows

    # --- full assignment with alternatives (slabbed; small fetches) ------
    n_alt = min(alternatives, t)
    top_alt = np.zeros((n, n_alt), dtype=np.int32)
    margin = np.zeros(n, dtype=np.float32)
    for lo in range(0, n, slab):
        rows = row_source(np.arange(lo, min(lo + slab, n)))
        mg, idx = _assign_slab_device(rows, cent, n_alt)
        top_alt[lo : lo + slab] = np.asarray(idx).astype(np.int32)
        margin[lo : lo + slab] = np.asarray(mg)

    members = _greedy_fill(top_alt, margin, t, tile_n)

    # --- final centroids over the ACTUAL (capacity-balanced) assignment --
    asg = np.zeros(n, dtype=np.int32)
    for c, rows in enumerate(members):
        asg[rows] = c
    asg_j = jnp.asarray(asg)
    sums = np.zeros((t, d), np.float32)
    cnt = np.zeros(t, np.float32)
    for lo in range(0, n, slab):
        rows = row_source(np.arange(lo, min(lo + slab, n)))
        ps, pc = _centroid_slab_device(rows, asg_j[lo : lo + slab], t)
        sums += np.asarray(ps)
        cnt += np.asarray(pc)
    centroids = np.where(cnt[:, None] > 0, sums / np.maximum(cnt, 1.0)[:, None], 0.0)
    centroids = centroids.astype(np.float32)
    cent_j = jnp.asarray(centroids)

    # --- per-row stats vs the FINAL centroids (device; fetch [N] f32) ----
    d2 = np.zeros(n, np.float32)
    cscore = np.zeros(n, np.float32)
    for lo in range(0, n, slab):
        rows = row_source(np.arange(lo, min(lo + slab, n)))
        cent_rows = jnp.take(cent_j, asg_j[lo : lo + slab], axis=0)
        pd2, pcs = _row_stats_slab_device(rows, cent_rows)
        d2[lo : lo + slab] = np.asarray(pd2)
        cscore[lo : lo + slab] = np.asarray(pcs)

    # --- layout (same interleave rule as the host path) + sound radii ----
    from trueno_rag_tpu.ops.pallas.scan_select_v2 import BLOCK

    nb = max(tile_n // BLOCK, 1)
    order = np.full(t * tile_n, -1, dtype=np.int32)
    radii = np.zeros(t, dtype=np.float32)
    recon = float(max(recon_err, 0.0))
    for c in range(t):
        rows = np.asarray(members[c], dtype=np.int32)
        if len(rows) == 0:
            continue
        rows = rows[np.argsort(-cscore[rows], kind="stable")]
        j = np.arange(len(rows))
        pos = (j % nb) * BLOCK + j // nb
        order[c * tile_n + pos] = rows
        r_max = float(np.sqrt(np.float64(d2[np.asarray(members[c])].max())))
        radii[c] = np.float32(
            (r_max * _DEV_RADIUS_SLACK + recon) * _BOUND_SLACK + _BOUND_EPS
        )
    return order, centroids, radii


# ---------------------------------------------------------------------------
# Query: probe → gather union → certified scan over the union
# ---------------------------------------------------------------------------


def resolve_cluster_fetch(mode: str) -> str:
    """Resolve a ``cluster_fetch`` config value to a concrete mechanism.
    ``"auto"`` → the selective-DMA kernel on accelerators (measured on
    v5e at 1M×384: the only fetch that beats the full compact stream —
    dma 3.9 ms vs gather 9.8 ms vs full 4.6 ms at B=8) and the XLA
    gather on CPU (the Pallas kernel would run interpreted there)."""
    if mode != "auto":
        return mode
    return "gather" if jax.default_backend() == "cpu" else "dma"


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "probe_tiles", "margin_tiles", "metric", "tile_n",
        "rescore_rows", "approx_select", "t_top", "interpret",
        "return_stats", "fetch", "return_bounds", "return_candidates",
    ),
)
def dense_topk_compact_bf16r_clustered(
    queries: jax.Array,  # [B, d] f32
    m_bf16: jax.Array,  # [N, d] bf16, CLUSTERED layout (apply_cluster_order)
    e_l2: jax.Array,  # [N] f32
    a_l2: jax.Array,  # [N] f32
    r_i8: jax.Array,  # [N, d] int8 residual correction
    r_scale: jax.Array,  # [N] f32
    e2_l2: jax.Array,  # [N] f32
    valid_mask: jax.Array,  # [N] bool (holes False)
    k: int,
    centroids: jax.Array,  # [T, d] f32 (prepare_clustered)
    radii: jax.Array,  # [T] f32
    probe_tiles: int = 16,
    row_map: Optional[jax.Array] = None,  # [N] int32 = prepare's `order`
    margin_tiles: int = 32,
    metric: str = "cosine",
    tile_n: int = 4096,
    rescore_rows: int | None = None,
    approx_select: bool = False,
    t_top: int = 8,
    interpret: bool = False,
    tags: Tuple[jax.Array, ...] | None = None,
    return_stats: bool = False,
    fetch: str = "gather",
    return_bounds: bool = False,
    return_candidates: bool = False,
):
    """Cluster-pruned compact tier (bf16 + int8 residual, 3 B/element)
    → (scores [B, k], rows [B, k], set_certified [B] bool).

    Scans only the batch union of each query's ``probe_tiles`` best
    tiles by the certified bound ``U_c = q·µ_c + ‖q‖·R_c``; the max
    ``U`` over UNSCANNED tiles joins the exclusion threshold, so
    ``set_certified`` keeps the full-corpus exact-set contract — a
    pruning miss fails the certificate, never silently drops a row
    (fail-closed, like every tier). ``row_map`` (the build's ``order``)
    translates returned rows back to original ids; scores/rows/tags/
    valid must all be in the clustered layout. ``tags`` filters as in
    :func:`~trueno_rag_tpu.ops.dense_tiered.dense_topk_compact_bf16r`.
    ``return_stats`` appends the number of scanned tiles (traced i32);
    ``return_bounds`` additionally returns per-candidate interval
    half-widths ``err [B, k]`` and the exclusion upper bound ``rhs [B]``
    — the pruned-tile bound is already folded into ``rhs``, so the
    sharded composition (parallel/clustered.py) can build a GLOBAL
    certificate from per-shard pruned scans.

    ``t_top`` defaults to the kernel's full 8 (not the compact tier's
    4): clustered corpora CONCENTRATE the top-k — when more than
    ``t_top`` of the true top-k sit in one 1024-row selection tile the
    unemitted ones can never become candidates and the certificate
    (correctly) fails closed, so keep ``t_top ≥ k``.

    ``rescore_rows`` defaults to None (no trim) and ``approx_select``
    to False (exact tile selection), both unlike the compact tier: when
    the batch probes fewer unique tiles than the ``B·probe_tiles``
    budget, the padded union slots flood the candidate columns with
    -inf sentinels, and the approx-select count trick ALWAYS fails
    closed across a -inf selection boundary (+inf threshold — every
    query host-patches despite a perfect scan). Exact top_k handles
    -inf columns soundly, and both knobs govern arrays sized by the
    pruned union (small in the latency regime this tier serves), so
    the exact forms cost ~0 where approx paid off at the 1M full-scan
    scale.

    ``fetch`` picks the union-scan mechanism: ``"gather"`` copies the
    selected tiles with an XLA gather and scans the copy (~3x the
    selected bytes of HBM traffic; no custom-kernel risk), ``"dma"``
    scans the selected tiles in place via the scalar-prefetch kernel
    (:func:`~trueno_rag_tpu.ops.pallas.scan_select_v2.scan_select_v2_indirect`
    — exactly 1x the selected bytes). Same results either way
    (parity-tested).
    """
    from trueno_rag_tpu.ops.pallas.scan_select_v2 import (
        SEL,
        scan_select_v3,
        scan_select_v3_indirect,
    )

    if fetch not in ("gather", "dma"):
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(f"unknown fetch mode {fetch!r}")

    q = _metric_queries(queries, metric)
    n, d = m_bf16.shape
    bsz = q.shape[0]
    tile = max(tile_n, SEL)
    assert n % tile == 0, "clustered layout must be tile-aligned (use prepare_clustered's order)"
    t = n // tile
    assert centroids.shape[0] == t and radii.shape[0] == t

    # -- certified per-tile upper bounds (one tiny [B, T] matmul) ---------
    # true q·x ≤ q·µ + ‖q‖R  (Cauchy-Schwarz) and the f32 dot satisfies
    # fl(q·µ) ≥ q·µ − acc_eps·‖q‖‖µ‖, so the accumulation term must be
    # added at FULL strength with the ‖µ‖ factor (review r3: scaling it
    # by (_BOUND_SLACK−1)=1e-4 under-covered near-orthogonal centroids
    # — a certified WRONG set was constructible). The multiplicative
    # slack then covers the rounding of these few additions themselves,
    # exactly like the sibling bounds in dense_tiered.py.
    qn = jnp.linalg.norm(q, axis=1)
    mu_n = jnp.linalg.norm(centroids, axis=1)  # [T]
    s_c = jax.lax.dot_general(
        q, centroids, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, T]
    acc_eps = jnp.float32(d) * jnp.float32(2.0**-23)
    spread = qn[:, None] * radii[None, :]
    dot_err = acc_eps * qn[:, None] * mu_n[None, :]
    u = s_c + spread + dot_err
    u = u + (jnp.abs(s_c) + spread + dot_err) * jnp.float32(
        _BOUND_SLACK - 1.0
    ) + jnp.float32(_BOUND_EPS)
    tile_live = valid_mask.reshape(t, tile).any(axis=1)
    u = jnp.where(tile_live[None, :], u, NEG_INF)

    # -- probe set: per-query top-p, batch union, static budget -----------
    p = min(probe_tiles, t)
    _, top_tiles = jax.lax.top_k(u, p)  # [B, p]
    budget = min(t, bsz * p)
    sel = jnp.unique(top_tiles.reshape(-1), size=budget, fill_value=t)  # sorted
    sel_ok = sel < t
    ids = jnp.minimum(sel, t - 1)
    # scatter-free membership (sel is sorted): a [B, T] scatter lowers
    # to a device sort (CLAUDE.md lore) — searchsorted is O(T log Tb)
    pos = jnp.searchsorted(sel, jnp.arange(t, dtype=sel.dtype))
    scanned = (pos < budget) & (sel[jnp.minimum(pos, budget - 1)] == jnp.arange(t))
    unscanned_bound = jnp.max(
        jnp.where(scanned[None, :], NEG_INF, u), axis=1
    )  # [B]; -inf when everything is scanned

    qb, u_q, v_q = _bf16_query_bounds(q)

    b_pad = max(8, -(-bsz // 8) * 8)
    qb_p = jnp.pad(qb, ((0, b_pad - bsz), (0, 0))) if b_pad != bsz else qb
    u_p = jnp.pad(u_q, (0, b_pad - bsz)) if b_pad != bsz else u_q
    v_p = jnp.pad(v_q, (0, b_pad - bsz)) if b_pad != bsz else v_q

    if fetch == "dma":
        # scalar-prefetch kernel scans the selected tiles IN PLACE —
        # HBM traffic = exactly the union's bytes; rows come out global
        outs = scan_select_v3_indirect(
            qb_p, m_bf16, e_l2, a_l2, valid_mask.astype(jnp.int32),
            u_p, v_p, sel, tile_n=tile, t_top=t_top, interpret=interpret,
            tags=_pad_tags(tags, n, n, bsz, b_pad),
        )
        cand_rows, cand_vals, threshold = _tile_candidates(
            outs, b_pad, k, margin_tiles, approx_select, t_top
        )
    else:
        # gather the union (contiguous tile copies) and scan the copy
        m_sel = m_bf16.reshape(t, tile, d)[ids].reshape(budget * tile, d)
        e_sel = e_l2.reshape(t, tile)[ids].reshape(-1)
        a_sel = a_l2.reshape(t, tile)[ids].reshape(-1)
        valid_sel = (valid_mask.reshape(t, tile)[ids] & sel_ok[:, None]).reshape(-1)
        tags_sel = None
        if tags is not None:
            tags_sel = (tags[0].reshape(t, tile)[ids].reshape(-1),) + tuple(tags[1:])
        outs = scan_select_v3(
            qb_p, m_sel, e_sel, a_sel, valid_sel.astype(jnp.int32), u_p, v_p,
            tile_n=tile, t_top=t_top, interpret=interpret,
            tags=_pad_tags(tags_sel, budget * tile, budget * tile, bsz, b_pad),
        )
        cand_rows, cand_vals, threshold = _tile_candidates(
            outs, b_pad, k, margin_tiles, approx_select, t_top
        )
        # positional (union-local) rows -> clustered-layout global rows
        real = cand_rows < budget * tile
        safe = jnp.clip(cand_rows, 0, budget * tile - 1)
        glob = ids[safe // tile] * tile + (safe % tile)
        cand_rows = jnp.where(real, glob.astype(cand_rows.dtype), cand_rows)

    # pruned tiles join the exclusion threshold: certify only when the
    # kth rescored lower bound beats what ANY unscanned tile could hold
    ub = unscanned_bound
    if b_pad != bsz:
        ub = jnp.pad(ub, (0, b_pad - bsz), constant_values=NEG_INF)
    threshold = jnp.maximum(threshold, ub)

    out = _trim_rescore_verify_compact(
        cand_rows, cand_vals, threshold, q, m_bf16, e_l2, a_l2,
        valid_mask, n, bsz, b_pad, k, rescore_rows, approx_select,
        residual=(r_i8, r_scale, e2_l2), tags=tags,
        return_bounds=return_bounds, return_candidates=return_candidates,
    )
    scores, rows, certified = out[:3]
    if row_map is not None:
        safe_r = jnp.clip(rows, 0, n - 1)
        rows = jnp.where(rows >= 0, row_map[safe_r].astype(rows.dtype), rows)
    extra = tuple(out[3:])  # (err, rhs)? + (cand, thr)?
    if return_candidates:
        # the tail's containment threshold already folds the pruned-
        # tile bound (threshold was max'd with unscanned_bound BEFORE
        # the tail), so containment is sound for the pruned scan too:
        # any row in an unscanned tile is bounded by thr. Candidates
        # are CLUSTERED-layout rows — map to original ids for the host
        # patch, like the top-k rows above.
        cand_out, thr_out = extra[-2], extra[-1]
        if row_map is not None:
            live_c = (cand_out >= 0) & (cand_out < n)
            safe_c = jnp.clip(cand_out, 0, n - 1)
            cand_out = jnp.where(
                live_c, row_map[safe_c].astype(cand_out.dtype),
                jnp.int32(np.iinfo(np.int32).max),
            )
        extra = extra[:-2] + (cand_out, thr_out)
    if return_stats:
        return (scores, rows, certified, *extra,
                jnp.sum(sel_ok.astype(jnp.int32)))
    return (scores, rows, certified, *extra)
