"""Corpus-sharded late-interaction (MaxSim) retrieval.

The multi-vector sibling of :mod:`trueno_rag_tpu.parallel.sharded`: the
``[N, Lt, H]`` token tensor shards row-wise across the mesh's ``data``
axis, the query token batch replicates, every chip runs the exact
blockwise MaxSim scan over its shard (``ops/maxsim.maxsim_scan_topk``
semantics), and the per-shard top-k candidates merge over ICI with
:func:`trueno_rag_tpu.parallel.sharded.merge_local_topk` — k·s scalars
per query, independent of N.

Exactness: identical to the single-device scan by the same selection
argument as the dense path; tie order stays (score desc, global row
asc) because shard concatenation preserves global row order. Tag
filters evaluate on each shard's local bit slice, adding zero
communication. The reference has no multi-vector retrieval at all
(index.rs:321-437 is single-vector brute force), so the correctness
oracle is this framework's own ``maxsim_scan_oracle``.
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
from trueno_rag_tpu.ops.maxsim import maxsim_block_scores
from trueno_rag_tpu.ops.tags import tag_pred
from trueno_rag_tpu.parallel.sharded import merge_local_topk

_I32_MAX = np.iinfo(np.int32).max


def _local_maxsim_topk(q, qm, tok, tm, allowed, k, block, axis):
    """Shard-local exact MaxSim scan + top-k with GLOBAL row ids
    (INT32_MAX in empty slots, ready for merge_local_topk)."""
    n = tok.shape[0]
    g = max(-(-n // block), 1)
    pad = g * block - n
    if pad:
        tok = jnp.pad(tok, ((0, pad), (0, 0), (0, 0)))
        tm = jnp.pad(tm, ((0, pad), (0, 0)))
        allowed = jnp.pad(allowed, ((0, pad),))

    def step(carry, xs):
        t, m, v = xs
        s = maxsim_block_scores(q, qm, t, m)
        return carry, jnp.where(v[None, :], s, NEG_INF)

    _, scores = jax.lax.scan(
        step,
        0.0,
        (
            tok.reshape(g, block, *tok.shape[1:]),
            tm.reshape(g, block, tm.shape[1]),
            allowed.reshape(g, block),
        ),
    )
    scores = jnp.transpose(scores, (1, 0, 2)).reshape(q.shape[0], g * block)
    k_local = min(k, n)
    s_loc, r_loc = jax.lax.top_k(scores[:, :n], k_local)
    shard = jax.lax.axis_index(axis)
    r_glob = r_loc + shard * n
    r_glob = jnp.where(jnp.isneginf(s_loc), _I32_MAX, r_glob)
    return merge_local_topk(s_loc, r_glob, k, axis)


@functools.lru_cache(maxsize=64)
def _sharded_maxsim_fn(mesh, axis, k, block):
    """One jitted program per (mesh, axis, k, block) — same recompile
    rationale as sharded.py::_sharded_dense_fn."""

    def local(q, qm, tok, tm, v):
        return _local_maxsim_topk(q, qm, tok, tm, v, k, block, axis)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis, None, None), P(axis, None), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _sharded_maxsim_tagged_fn(mesh, axis, k, block):
    def local(q, qm, tok, tm, v, bits, ta, ty, tn):
        # the tag predicate is per-CHUNK (row), evaluated per query and
        # joined into the validity mask before the scan — but the scan
        # masks rows per-batch, so fold the per-query predicate by
        # scanning with all rows valid and masking after. Cheaper:
        # MaxSim scores are per (query, chunk) already, so evaluate the
        # predicate once into [B, n] and mask the assembled scores.
        n = tok.shape[0]
        g = max(-(-n // block), 1)
        pad = g * block - n
        tok_p, tm_p, v_p = tok, tm, v
        if pad:
            tok_p = jnp.pad(tok, ((0, pad), (0, 0), (0, 0)))
            tm_p = jnp.pad(tm, ((0, pad), (0, 0)))
            v_p = jnp.pad(v, ((0, pad),))

        def step(carry, xs):
            t, m, vv = xs
            s = maxsim_block_scores(q, qm, t, m)
            return carry, jnp.where(vv[None, :], s, NEG_INF)

        _, scores = jax.lax.scan(
            step,
            0.0,
            (
                tok_p.reshape(g, block, *tok.shape[1:]),
                tm_p.reshape(g, block, tm.shape[1]),
                v_p.reshape(g, block),
            ),
        )
        scores = jnp.transpose(scores, (1, 0, 2)).reshape(q.shape[0], g * block)[:, :n]
        allowed = tag_pred(bits[None, :], ta[:, None], ty[:, None], tn[:, None])
        scores = jnp.where(allowed, scores, NEG_INF)
        k_local = min(k, n)
        s_loc, r_loc = jax.lax.top_k(scores, k_local)
        shard = jax.lax.axis_index(axis)
        r_glob = r_loc + shard * n
        r_glob = jnp.where(jnp.isneginf(s_loc), _I32_MAX, r_glob)
        return merge_local_topk(s_loc, r_glob, k, axis)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(), P(), P(axis, None, None), P(axis, None), P(axis),
            P(axis), P(), P(), P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_maxsim_topk(
    q_tok: jax.Array,  # [B, Lq, H] replicated
    q_mask: jax.Array,  # [B, Lq] replicated
    tokens: jax.Array,  # [N, Lt, H] sharded P(axis, None, None)
    t_mask: jax.Array,  # [N, Lt] sharded P(axis, None)
    valid: jax.Array,  # [N] sharded P(axis)
    k: int,
    mesh: Mesh,
    axis: str = "data",
    block: int = 512,
) -> Tuple[jax.Array, jax.Array]:
    """Exact MaxSim top-k over a row-sharded token corpus →
    ``(scores [B,k], rows [B,k])`` with GLOBAL row ids."""
    return _sharded_maxsim_fn(mesh, axis, k, block)(
        q_tok, q_mask, tokens, t_mask, valid
    )


def sharded_maxsim_topk_tagged(
    q_tok: jax.Array,
    q_mask: jax.Array,
    tokens: jax.Array,
    t_mask: jax.Array,
    valid: jax.Array,
    tag_bits: jax.Array,  # [N] int32 sharded P(axis)
    t_all: jax.Array,  # [B] replicated filter words
    t_any: jax.Array,
    t_none: jax.Array,
    k: int,
    mesh: Mesh,
    axis: str = "data",
    block: int = 512,
) -> Tuple[jax.Array, jax.Array]:
    """Tag-filtered sibling of :func:`sharded_maxsim_topk` — the filter
    evaluates on local tag slices; the merge still moves k·s scalars."""
    return _sharded_maxsim_tagged_fn(mesh, axis, k, block)(
        q_tok, q_mask, tokens, t_mask, valid, tag_bits, t_all, t_any, t_none
    )


class ShardedTokenIndex:
    """A read-optimized, corpus-sharded multi-vector index.

    Built once from host token arrays (e.g. a
    :class:`~trueno_rag_tpu.index.token_store.TokenVectorStore`
    snapshot); rows pad to a multiple of the data-axis size and shard
    across chips. Mutation story: rebuild (the mutable path is the
    single-chip store, mirroring ShardedVectorIndex)."""

    def __init__(
        self,
        tokens: np.ndarray,  # [N, Lt, H]
        t_mask: np.ndarray,  # [N, Lt]
        mesh: Mesh,
        valid: Optional[np.ndarray] = None,
        axis: str = "data",
        tokens_normalized: bool = False,
        tags: Optional[np.ndarray] = None,
        block: int = 512,
        storage_dtype: str = "float32",
        normalize_queries: bool = True,
    ) -> None:
        tokens = np.asarray(tokens, dtype=np.float32)
        n, lt, h = tokens.shape
        self.n, self.mesh, self.axis, self.block = n, mesh, axis, block
        # cosine MaxSim needs normalized query tokens too (the
        # single-chip store normalizes inside search_arrays)
        self.normalize_queries = normalize_queries
        if not tokens_normalized:
            norms = np.sqrt(np.einsum("nij,nij->ni", tokens, tokens))[:, :, None]
            tokens = tokens / np.where(norms > 0.0, norms, 1.0)
        s = mesh.shape[axis]
        n_pad = ((n + s - 1) // s) * s
        tm = np.asarray(t_mask, bool)
        if n_pad != n:
            tokens = np.pad(tokens, ((0, n_pad - n), (0, 0), (0, 0)))
            tm = np.pad(tm, ((0, n_pad - n), (0, 0)))
        v = np.zeros(n_pad, dtype=bool)
        v[:n] = True if valid is None else np.asarray(valid, dtype=bool)[:n]
        t = np.zeros(n_pad, dtype=np.int32)
        if tags is not None:
            t[:n] = np.asarray(tags, dtype=np.int32)[:n]
        dtype = jnp.bfloat16 if storage_dtype == "bfloat16" else jnp.float32
        row3 = NamedSharding(mesh, P(axis, None, None))
        row2 = NamedSharding(mesh, P(axis, None))
        row1 = NamedSharding(mesh, P(axis))
        self.tokens = jax.device_put(jnp.asarray(tokens, dtype=dtype), row3)
        self.t_mask = jax.device_put(tm, row2)
        self.valid = jax.device_put(v, row1)
        self.tags = jax.device_put(t, row1)

    @classmethod
    def from_token_store(cls, store, mesh: Mesh, axis: str = "data",
                         block: int = 512) -> "ShardedTokenIndex":
        """Snapshot a TokenVectorStore (rows stay registry-aligned, so
        global row ids hydrate through the same registry)."""
        cap = store._host.shape[0]
        tags = np.asarray(
            [store.registry.tags_of_row(r) for r in range(cap)], dtype=np.int32
        )
        return cls(
            store._host,
            store._t_mask,
            mesh,
            valid=store._valid,
            axis=axis,
            tokens_normalized=store.config.normalize,
            tags=tags,
            block=block,
            storage_dtype=store.config.storage_dtype,
            normalize_queries=store.config.normalize,
        )

    def _norm_q(self, q_tok: np.ndarray) -> np.ndarray:
        q = np.asarray(q_tok, np.float32)
        if self.normalize_queries:
            norms = np.sqrt(np.einsum("bij,bij->bi", q, q))[:, :, None]
            q = q / np.where(norms > 0.0, norms, 1.0)
        return q

    def search(
        self,
        q_tok: np.ndarray,  # [B, Lq, H]
        q_mask: Optional[np.ndarray] = None,
        k: int = 10,
    ) -> Tuple[np.ndarray, np.ndarray]:
        q = jnp.asarray(self._norm_q(q_tok))
        b, lq = q.shape[0], q.shape[1]
        qm = (
            jnp.ones((b, lq), bool)
            if q_mask is None
            else jnp.asarray(np.asarray(q_mask, bool))
        )
        s, r = sharded_maxsim_topk(
            q, qm, self.tokens, self.t_mask, self.valid, k,
            self.mesh, self.axis, self.block,
        )
        return np.asarray(s), np.asarray(r)

    def search_tagged(
        self,
        q_tok: np.ndarray,
        t_all: np.ndarray,
        t_any: np.ndarray,
        t_none: np.ndarray,
        q_mask: Optional[np.ndarray] = None,
        k: int = 10,
    ) -> Tuple[np.ndarray, np.ndarray]:
        q = jnp.asarray(self._norm_q(q_tok))
        b, lq = q.shape[0], q.shape[1]
        qm = (
            jnp.ones((b, lq), bool)
            if q_mask is None
            else jnp.asarray(np.asarray(q_mask, bool))
        )
        s, r = sharded_maxsim_topk_tagged(
            q, qm, self.tokens, self.t_mask, self.valid, self.tags,
            jnp.asarray(t_all, jnp.int32), jnp.asarray(t_any, jnp.int32),
            jnp.asarray(t_none, jnp.int32), k, self.mesh, self.axis, self.block,
        )
        return np.asarray(s), np.asarray(r)
