"""Corpus-sharded CLUSTER-PRUNED dense retrieval: certified top-k SETS
over a mesh where each shard scans only the tiles that can matter.

Composes the two certified mechanisms this codebase already has:

- per shard, the cluster-pruned tier (ops/clustered.py) scans the
  probed tile union of ITS rows and returns bounded candidates plus an
  exclusion bound ``rhs`` that already folds the unscanned-tile bound
  (max ``U_c`` over that shard's pruned tiles);
- across shards, the bounded-candidate merge of the sharded compact
  tier (parallel/compact.py::merge_bounded_candidates) composes the
  global SET certificate from the k·s gathered candidates and the
  per-shard ``rhs`` maxima.

So a certified query's set is PROVABLY the exact top-k over the FULL
corpus even though every chip scanned only a few of its tiles — a
pruning miss anywhere raises that shard's ``rhs`` and the global
certificate fails closed (host patch covers it, as everywhere).

The latency composition for pods: per-chip work drops from the full
shard stream (N/s rows) to the probed union (≤ B·probe_tiles tiles),
while the merge stays the same k·s ICI all-gather. Clustering is
per-shard (each shard k-means its OWN rows), which is exactly what
multi-host ingest produces naturally.
"""

from __future__ import annotations

import functools

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from trueno_rag_tpu.ops.clustered import (
    apply_cluster_order,
    dense_topk_compact_bf16r_clustered,
    prepare_clustered,
)
from trueno_rag_tpu.ops.dense_tiered import prepare_residual, prepare_tiered
from trueno_rag_tpu.parallel.compact import merge_bounded_candidates

_INT_MAX = np.iinfo(np.int32).max


def sharded_clustered_topk(
    queries: jax.Array,  # [B, d] f32, replicated
    m_bf16: jax.Array,  # [s·Np, d] bf16, CLUSTERED per shard, P(axis, None)
    e_l2: jax.Array,  # [s·Np] f32, P(axis)
    a_l2: jax.Array,
    r_i8: jax.Array,  # [s·Np, d] int8, P(axis, None)
    r_scale: jax.Array,
    e2_l2: jax.Array,
    valid_mask: jax.Array,  # [s·Np] bool (holes False), P(axis)
    centroids: jax.Array,  # [s, T, d] f32, P(axis, None, None)
    radii: jax.Array,  # [s, T] f32, P(axis, None)
    row_map: jax.Array,  # [s·Np] int32 shard-LOCAL original rows, P(axis)
    rows_per_shard: int,
    k: int,
    mesh: Mesh,
    probe_tiles: int = 16,
    metric: str = "cosine",
    axis: str = "data",
    tile_n: int = 4096,
    fetch: str = "gather",
    interpret: bool = False,
    tags: Optional[Tuple[jax.Array, ...]] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Certified-set top-k over row-sharded, per-shard-clustered compact
    replicas → ``(scores [B,k], rows [B,k] GLOBAL original ids,
    certified [B])``. ``tags``: tag_bits [s·Np] in the CLUSTERED layout
    (sharded) + replicated [B] filter words — predicate evaluates
    inside each shard's pruned scan."""

    from trueno_rag_tpu.ops.clustered import resolve_cluster_fetch

    args = [queries, m_bf16, e_l2, a_l2, r_i8, r_scale, e2_l2, valid_mask,
            centroids, radii, row_map]
    if tags is not None:
        args += list(tags)
    return _sharded_clustered_fn(
        mesh, axis, k, rows_per_shard, probe_tiles, metric, tile_n,
        resolve_cluster_fetch(fetch), interpret, tags is not None,
    )(*args)


@functools.lru_cache(maxsize=64)
def _sharded_clustered_fn(mesh, axis, k, rows_per_shard, probe_tiles,
                          metric, tile_n, fetch, interpret, has_tags):
    """One jitted program per static config — a fresh shard_map+jit per
    call would retrace and RECOMPILE every search batch (same fix as
    the dense/BM25/compact sharded paths)."""

    def local(q, mb, el, al, ri, rs, e2, v, cent, rad, rmap, *tag_args):
        s, r, _ok, err, rhs = dense_topk_compact_bf16r_clustered(
            q, mb, el, al, ri, rs, e2, v, k, cent[0], rad[0],
            probe_tiles=probe_tiles, row_map=rmap, metric=metric,
            tile_n=tile_n, fetch=fetch, interpret=interpret,
            # concentrated top-k needs t_top >= k PLUS runner-up slack:
            # a tile's unemitted rows join the exclusion threshold at
            # the t_top-th candidate's bf16 upper bound (~±1.7e-3), so
            # at t_top == k any corpus whose (k+1)-th row sits within
            # that interval of the k-th certifies 0 queries; +4 extra
            # candidates rescore the runners-up in fp32 (interval
            # ~1e-5). Kernel pool caps at 16 (2 per 128-block × 8
            # blocks) — same sizing as VectorStore's single-chip path.
            t_top=min(max(8, k + 4), 16),
            tags=tag_args if tag_args else None, return_bounds=True,
        )
        shard = jax.lax.axis_index(axis)
        r_glob = jnp.where(r >= 0, r + shard * rows_per_shard, _INT_MAX)
        return merge_bounded_candidates(s, r_glob, err, rhs, k, axis)

    in_specs = [P(), P(axis, None), P(axis), P(axis), P(axis, None),
                P(axis), P(axis), P(axis), P(axis, None, None),
                P(axis, None), P(axis)]
    if has_tags:
        in_specs += [P(axis), P(), P(), P()]
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P(), P()),
        # outputs ARE replicated (identical all-gather + certificate on
        # every shard); inference can't see through axis_index
        check_vma=False,
    )
    return jax.jit(fn)


class ShardedClusteredIndex:
    """Read-optimized sharded cluster-pruned index: per-chip memory is
    3 B/element of the shard AND per-chip scan work is the probed tile
    union, not the whole shard. Per-shard k-means at build; the global
    exact-set certificate composes from per-shard pruned bounds.

    ``keep_host=True`` retains the host fp32 matrix and patches
    uncertified queries exactly (float64 accumulation), mirroring
    ShardedCompactIndex."""

    def __init__(
        self,
        matrix: np.ndarray,
        mesh: Mesh,
        metric: str = "cosine",
        valid: Optional[np.ndarray] = None,
        axis: str = "data",
        rows_normalized: bool = False,
        tile_n: int = 4096,
        probe_tiles: int = 16,
        fetch: str = "auto",
        kmeans_iters: int = 8,
        keep_host: bool = True,
        interpret: Optional[bool] = None,
        tags: Optional[np.ndarray] = None,
    ) -> None:
        matrix = np.asarray(matrix, dtype=np.float32)
        n, d = matrix.shape
        self.n, self.metric, self.mesh, self.axis = n, metric, mesh, axis
        self.tile_n = max(tile_n, 1024)
        self.probe_tiles = probe_tiles
        from trueno_rag_tpu.ops.clustered import resolve_cluster_fetch

        self.fetch = resolve_cluster_fetch(fetch)
        if interpret is None:  # Pallas needs interpret mode off-TPU
            interpret = jax.devices()[0].platform not in ("tpu", "axon")
        self.interpret = interpret
        if metric not in ("cosine", "dot"):
            from trueno_rag_tpu.errors import InvalidConfigError

            raise InvalidConfigError(
                "clustered sharding supports cosine/dot metrics"
            )
        s = mesh.shape[axis]
        self.rows_per_shard = rps = -(-n // s)
        if metric == "cosine" and not rows_normalized:
            norms = np.linalg.norm(matrix, axis=1, keepdims=True)
            matrix = matrix / np.where(norms == 0.0, 1.0, norms)
        v_host = np.zeros(n, dtype=bool)
        v_host[:] = True if valid is None else np.asarray(valid, dtype=bool)[:n]
        self._host = matrix if keep_host else None
        self._valid_host = v_host
        self._tags_host = None

        # --- per-shard clustering + permuted replica blocks --------------
        # (each shard k-means only ITS rows — the layout multi-host
        # ingest produces; on a real pod each host runs its own prepare)
        mb_b, el_b, al_b, ri_b, rs_b, e2_b = [], [], [], [], [], []
        v_b, rm_b, cent_b, rad_b = [], [], [], []
        t_shard = -(-rps // self.tile_n)
        for i in range(s):
            lo, hi = i * rps, min((i + 1) * rps, n)
            block = matrix[lo:hi]
            if block.shape[0] < rps:  # equalize shard row spaces
                block = np.pad(block, ((0, rps - block.shape[0]), (0, 0)))
            bv = np.zeros(rps, dtype=bool)
            bv[: hi - lo] = v_host[lo:hi]
            order, cent, rad = prepare_clustered(
                block, tile_n=self.tile_n, metric=metric, iters=kmeans_iters,
                seed=i, valid=bv,  # shard padding must not join tiles
            )
            mp = apply_cluster_order(block, order)
            vp = apply_cluster_order(bv, order, fill=False)
            mj = jnp.asarray(mp)
            parts = prepare_tiered(mj) + prepare_residual(mj)
            mb_b.append(np.asarray(parts[0]))
            el_b.append(np.asarray(parts[1]))
            al_b.append(np.asarray(parts[2]))
            ri_b.append(np.asarray(parts[3]))
            rs_b.append(np.asarray(parts[4]))
            e2_b.append(np.asarray(parts[5]))
            v_b.append(vp)
            rm_b.append(order.astype(np.int32))  # shard-LOCAL original rows
            cent_b.append(cent)
            rad_b.append(rad)
            assert len(order) == t_shard * self.tile_n

        from trueno_rag_tpu.parallel.ingest import assemble_row_sharded

        self.m_bf16 = assemble_row_sharded(mb_b, mesh, axis)
        self.e_l2 = assemble_row_sharded(el_b, mesh, axis)
        self.a_l2 = assemble_row_sharded(al_b, mesh, axis)
        self.r_i8 = assemble_row_sharded(ri_b, mesh, axis)
        self.r_scale = assemble_row_sharded(rs_b, mesh, axis)
        self.e2_l2 = assemble_row_sharded(e2_b, mesh, axis)
        self.valid = assemble_row_sharded(v_b, mesh, axis)
        self.row_map = assemble_row_sharded(rm_b, mesh, axis)
        self.centroids = assemble_row_sharded(
            [c[None] for c in cent_b], mesh, axis
        )
        self.radii = assemble_row_sharded([r[None] for r in rad_b], mesh, axis)
        self._orders = rm_b  # host copies (tag permutation on set_tags)
        self.tags = None
        if tags is not None:
            self.set_tags(tags)
        self.uncertified = 0  # observability counter

    def set_tags(self, tags: np.ndarray) -> None:
        """(Re-)upload per-row tag words, permuted into each shard's
        clustered layout and sharded with the rows."""
        from trueno_rag_tpu.parallel.ingest import assemble_row_sharded

        t = np.zeros(self.rows_per_shard * self.mesh.shape[self.axis],
                     dtype=np.int32)
        t[: min(self.n, len(tags))] = np.asarray(tags, np.int32)[: self.n]
        self._tags_host = t[: self.n]
        rps = self.rows_per_shard
        blocks = [
            apply_cluster_order(t[i * rps : (i + 1) * rps], order, fill=0)
            for i, order in enumerate(self._orders)
        ]
        self.tags = assemble_row_sharded(blocks, self.mesh, self.axis)

    def search(self, queries: np.ndarray, k: int, tag_masks=None):
        """→ ``(scores [B,k], rows [B,k] global ids, certified [B])``;
        with a host matrix, uncertified queries patch exactly."""
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
        s, r, ok = sharded_clustered_topk(
            q, self.m_bf16, self.e_l2, self.a_l2, self.r_i8, self.r_scale,
            self.e2_l2, self.valid, self.centroids, self.radii, self.row_map,
            self.rows_per_shard, k, self.mesh, self.probe_tiles, self.metric,
            self.axis, self.tile_n, self.fetch, self.interpret, tags=tags,
        )
        ok_np = np.asarray(ok).astype(bool)
        misses = int((~ok_np).sum())
        self.uncertified += misses
        if misses and self._host is not None:
            from trueno_rag_tpu.parallel.compact import host_exact_patch

            s_p, r_p = host_exact_patch(
                self._host, self._valid_host, self._tags_host, self.metric,
                q, s, r, ok_np, k, tag_masks=tag_masks,
            )
            return s_p, r_p, jnp.ones_like(ok)
        return s, r, ok
