"""Corpus-sharded dense retrieval: local top-k + ICI all-gather merge.

The pod-scale answer to the reference's single-host brute force: the
``[N, d]`` embedding matrix shards row-wise across the mesh's ``data``
axis (each chip holds ``N/s`` rows in its own HBM). A query batch is
replicated; every chip scores its shard on its MXU and keeps a local
top-k; the k candidates per chip (k·s total, not N) all-gather over ICI
and a final top-k yields the exact global result.

Exactness: identical to the single-device scan — the global top-k is a
subset of the union of local top-ks by a standard selection argument.
Tie-breaking stays (score desc, global row asc) because the all-gather
concatenates shards in axis order and ``lax.top_k`` prefers earlier
positions.

Communication cost per query batch: ``s * k * 8`` bytes (scores+rows),
independent of corpus size N — the merge is effectively free next to
the O(N·d/s) local scan.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from trueno_rag_tpu.ops.dense import NEG_INF, similarity_scores
from trueno_rag_tpu.ops.tags import tag_pred


def sharded_dense_topk(
    queries: jax.Array,
    matrix: jax.Array,
    valid_mask: jax.Array,
    k: int,
    mesh: Mesh,
    metric: str = "cosine",
    axis: str = "data",
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over a row-sharded corpus.

    Args:
      queries: ``[B, d]`` (replicated).
      matrix: ``[N, d]`` logically; physically sharded ``P(axis, None)``.
      valid_mask: ``[N]`` bool, sharded ``P(axis)``.
      k: candidates to return (``k <= N/s`` per shard).

    Returns ``(scores [B,k], rows [B,k])`` with *global* row ids.
    """
    return _sharded_dense_fn(mesh, axis, k, metric)(queries, matrix, valid_mask)


def sharded_dense_topk_tagged(
    queries: jax.Array,
    matrix: jax.Array,
    valid_mask: jax.Array,
    tag_bits: jax.Array,  # [N] int32, sharded P(axis)
    t_all: jax.Array,  # [B] replicated
    t_any: jax.Array,
    t_none: jax.Array,
    k: int,
    mesh: Mesh,
    metric: str = "cosine",
    axis: str = "data",
) -> Tuple[jax.Array, jax.Array]:
    """Tag-filtered sibling of :func:`sharded_dense_topk`: the filter
    predicate evaluates on each shard's local tag slice (three bit-ops
    fused into the local score masking), so filtering adds no
    communication — the ICI merge still moves only k·s candidates."""
    return _sharded_dense_tagged_fn(mesh, axis, k, metric)(
        queries, matrix, valid_mask, tag_bits, t_all, t_any, t_none
    )

def merge_local_topk(s_loc, r_glob, k: int, axis: str):
    """Inside shard_map: merge each shard's local top-k into the global
    top-k over the k·s ICI all-gather → ``(scores [B,k], rows [B,k]
    int32, -1 invalid)``. ``r_glob`` must carry GLOBAL row ids with
    INT32_MAX in empty slots. Shard-axis concatenation preserves global
    row-ascending order, so lax.top_k's earlier-position tie preference
    keeps the (score desc, row asc) total order. Shared by the dense,
    tagged, and BM25 sharded paths (the bounded-candidate variant lives
    in parallel/compact.py::merge_bounded_candidates)."""
    s_all = jax.lax.all_gather(s_loc, axis, axis=1, tiled=True)  # [B, k*s]
    r_all = jax.lax.all_gather(r_glob, axis, axis=1, tiled=True)
    k_out = min(k, s_all.shape[1])
    s_top, idx = jax.lax.top_k(s_all, k_out)
    r_top = jnp.take_along_axis(r_all, idx, axis=1)
    r_top = jnp.where(jnp.isneginf(s_top), -1, r_top).astype(jnp.int32)
    if k_out < k:
        s_top = jnp.pad(s_top, ((0, 0), (0, k - k_out)), constant_values=NEG_INF)
        r_top = jnp.pad(r_top, ((0, 0), (0, k - k_out)), constant_values=-1)
    return s_top, r_top


import functools


@functools.lru_cache(maxsize=64)
def _sharded_dense_fn(mesh, axis, k, metric):
    """One jitted program per (mesh, axis, k, metric) — a fresh
    shard_map+jit per call retraces and RECOMPILES every search batch
    (seconds on the tunneled device; same fix as sparse.py's
    _sharded_bm25_fn)."""

    def local(q, m, v):
        # m: [N/s, d] local shard; q replicated
        scores = similarity_scores(q, m, metric)
        masked = jnp.where(v[None, :], scores, NEG_INF)
        k_local = min(k, m.shape[0])
        s_loc, r_loc = jax.lax.top_k(masked, k_local)
        shard = jax.lax.axis_index(axis)
        r_glob = r_loc + shard * m.shape[0]
        r_glob = jnp.where(jnp.isneginf(s_loc), jnp.iinfo(jnp.int32).max, r_glob)
        return merge_local_topk(s_loc, r_glob, k, axis)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis)),
        out_specs=(P(), P()),
        # outputs ARE replicated (identical all-gather + top_k everywhere);
        # the varying-mesh-axes inference can't see through axis_index
        check_vma=False,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _sharded_dense_tagged_fn(mesh, axis, k, metric):
    """Tag-filtered sibling of :func:`_sharded_dense_fn` (same caching
    rationale)."""

    def local(q, m, v, bits, ta, ty, tn):
        scores = similarity_scores(q, m, metric)
        allowed = v[None, :] & tag_pred(
            bits[None, :], ta[:, None], ty[:, None], tn[:, None]
        )
        masked = jnp.where(allowed, scores, NEG_INF)
        k_local = min(k, m.shape[0])
        s_loc, r_loc = jax.lax.top_k(masked, k_local)
        shard = jax.lax.axis_index(axis)
        r_glob = r_loc + shard * m.shape[0]
        r_glob = jnp.where(jnp.isneginf(s_loc), jnp.iinfo(jnp.int32).max, r_glob)
        return merge_local_topk(s_loc, r_glob, k, axis)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis), P(axis), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _scatter_rows(m, vmask, r, u, vf):
    return m.at[r].set(u), vmask.at[r].set(vf)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_tags(t, r, u):
    return t.at[r].set(u)


class ShardedVectorIndex:
    """A read-optimized, corpus-sharded dense index.

    Built once from a host matrix (e.g. a :class:`VectorStore` snapshot
    or a loaded artifact); rows pad up to a multiple of the data-axis
    size and shard across chips. Query batches return exact global
    top-k. Mutation story: rebuild (batch-built index; the mutable
    path is the single-chip VectorStore — SURVEY §7.3 decision).
    """

    def __init__(
        self,
        matrix: np.ndarray,
        mesh: Mesh,
        metric: str = "cosine",
        valid: Optional[np.ndarray] = None,
        axis: str = "data",
        rows_normalized: bool = False,
        tags: Optional[np.ndarray] = None,
    ) -> None:
        matrix = np.asarray(matrix, dtype=np.float32)
        n, d = matrix.shape
        self.n = n
        self.metric = metric
        self.mesh = mesh
        self.axis = axis
        s = mesh.shape[axis]
        n_pad = ((n + s - 1) // s) * s
        # Skip normalization when the rows come from a VectorStore (it
        # normalizes at insert): re-normalizing perturbs values by an
        # ulp, which reorders near-tied scores vs the single-host path.
        if metric == "cosine" and not rows_normalized:
            norms = np.linalg.norm(matrix, axis=1, keepdims=True)
            matrix = matrix / np.where(norms == 0.0, 1.0, norms)
        if n_pad != n:
            matrix = np.pad(matrix, ((0, n_pad - n), (0, 0)))
        v = np.zeros(n_pad, dtype=bool)
        v[:n] = True if valid is None else np.asarray(valid, dtype=bool)[:n]
        row_sharding = NamedSharding(mesh, P(axis, None))
        mask_sharding = NamedSharding(mesh, P(axis))
        self.matrix = jax.device_put(matrix, row_sharding)
        self.valid = jax.device_put(v, mask_sharding)
        t = np.zeros(n_pad, dtype=np.int32)
        if tags is not None:
            t[:n] = np.asarray(tags, dtype=np.int32)[:n]
        self.tags = jax.device_put(t, mask_sharding)

    @classmethod
    def from_shard_matrices(
        cls,
        blocks,
        mesh: Mesh,
        metric: str = "cosine",
        valids=None,
        axis: str = "data",
        rows_normalized: bool = False,
        tags=None,
    ) -> "ShardedVectorIndex":
        """Multi-host ingest: build the sharded index from per-host row
        blocks — the full ``[N, d]`` matrix never exists on one host.

        ``blocks[i]`` is shard ``i``'s ``[rps_i, d]`` f32 rows (owning
        global rows ``[i·rps, i·rps + rps_i)`` with ``rps = max rps_i``;
        shorter blocks pad with invalid rows). Each block normalizes
        (unless ``rows_normalized``) and device_puts straight onto its
        shard's devices via
        :func:`~trueno_rag_tpu.parallel.ingest.assemble_row_sharded` —
        peak host memory is one block. ``valids``/``tags`` are optional
        per-shard ``[rps_i]`` masks/int32 words (host-tiny; assembled
        the same way). Search results are identical to constructing
        from the concatenated matrix (parity-asserted in
        tests/test_multihost_ingest.py).
        """
        from trueno_rag_tpu.errors import InvalidConfigError
        from trueno_rag_tpu.parallel.ingest import assemble_row_sharded

        s = mesh.shape[axis]
        if len(blocks) != s:
            raise InvalidConfigError(
                f"got {len(blocks)} shard blocks for a {s}-shard '{axis}' axis"
            )
        blocks = [np.asarray(blk, dtype=np.float32) for blk in blocks]
        d = blocks[0].shape[1]
        rps = max(blk.shape[0] for blk in blocks)
        n = sum(blk.shape[0] for blk in blocks)
        norm_blocks, valid_blocks, tag_blocks = [], [], []
        for i, blk in enumerate(blocks):
            if blk.shape[1] != d:
                raise InvalidConfigError(
                    f"shard {i} has dimension {blk.shape[1]}, expected {d}"
                )
            n_i = blk.shape[0]
            if metric == "cosine" and not rows_normalized:
                norms = np.linalg.norm(blk, axis=1, keepdims=True)
                blk = blk / np.where(norms == 0.0, 1.0, norms)
            if n_i < rps:
                blk = np.pad(blk, ((0, rps - n_i), (0, 0)))
            norm_blocks.append(blk)
            v = np.zeros(rps, dtype=bool)
            v[:n_i] = (
                True if valids is None else np.asarray(valids[i], dtype=bool)[:n_i]
            )
            valid_blocks.append(v)
            t = np.zeros(rps, dtype=np.int32)
            if tags is not None:
                t[:n_i] = np.asarray(tags[i], dtype=np.int32)[:n_i]
            tag_blocks.append(t)

        self = cls.__new__(cls)
        self.n = n
        self.metric = metric
        self.mesh = mesh
        self.axis = axis
        self.matrix = assemble_row_sharded(norm_blocks, mesh, axis)
        self.valid = assemble_row_sharded(valid_blocks, mesh, axis)
        self.tags = assemble_row_sharded(tag_blocks, mesh, axis)
        return self

    def search(self, queries: np.ndarray, k: int,
               tag_masks=None) -> Tuple[jax.Array, jax.Array]:
        """``tag_masks``: optional ``(t_all, t_any, t_none)`` int32
        arrays of length B (see ops/tags.py) for filtered search."""
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, dtype=np.float32)))
        if tag_masks is not None:
            return sharded_dense_topk_tagged(
                q, self.matrix, self.valid, self.tags,
                jnp.asarray(tag_masks[0]), jnp.asarray(tag_masks[1]),
                jnp.asarray(tag_masks[2]),
                k, self.mesh, self.metric, self.axis,
            )
        return sharded_dense_topk(q, self.matrix, self.valid, k, self.mesh, self.metric, self.axis)

    def update_rows(
        self,
        rows: np.ndarray,
        vectors: np.ndarray,
        valid: Optional[np.ndarray] = None,
        rows_normalized: bool = False,
        tags: Optional[np.ndarray] = None,
    ) -> None:
        """Incremental refresh: scatter changed rows into the sharded
        matrix in place (donated buffers — no second copy of the shard).

        The updates ship as a tiny replicated array; GSPMD routes each
        row to the shard that owns it. Rows must fit the existing
        padded capacity — capacity growth means rebuild (the sharded
        index is read-optimized; the mutable store is the single-chip
        VectorStore).
        """
        rows = np.asarray(rows, dtype=np.int32)
        vectors = np.asarray(vectors, dtype=np.float32)
        if rows.size == 0:
            return
        n_pad = self.matrix.shape[0]
        if int(rows.max()) >= n_pad:
            from trueno_rag_tpu.errors import InvalidConfigError

            raise InvalidConfigError(
                f"row {int(rows.max())} exceeds sharded capacity {n_pad}; rebuild"
            )
        if self.metric == "cosine" and not rows_normalized:
            norms = np.linalg.norm(vectors, axis=1, keepdims=True)
            vectors = vectors / np.where(norms == 0.0, 1.0, norms)
        v_flags = (
            np.ones(len(rows), dtype=bool)
            if valid is None
            else np.asarray(valid, dtype=bool)
        )

        # donate so the (potentially huge) sharded buffers update in
        # place; MODULE-LEVEL jitted scatters — a fresh jit(lambda) per
        # call would recompile both scatters on every incremental refresh
        self.matrix, self.valid = _scatter_rows(
            self.matrix, self.valid, jnp.asarray(rows), jnp.asarray(vectors),
            jnp.asarray(v_flags),
        )
        if tags is not None:
            self.tags = _scatter_tags(
                self.tags, jnp.asarray(rows),
                jnp.asarray(np.asarray(tags, dtype=np.int32)),
            )
        self.n = max(self.n, int(rows.max()) + 1)
