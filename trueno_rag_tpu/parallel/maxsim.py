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
from trueno_rag_tpu.ops.maxsim import (
    _scan16_fused_widths,
    _scan16_query_pack,
    _select_rescore_threshold,
    maxsim_block_scores,
    prepare_maxsim_scan16,
)
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


@functools.lru_cache(maxsize=64)
def _sharded_maxsim_fused_fn(mesh, axis, k, rescore, tile_n, interpret,
                             has_tags, self_replica=False,
                             select="auto"):
    """One jitted program per static config (recompile rationale as
    _sharded_maxsim_fn). Local work per shard: the fused Pallas bf16
    scan (ops/pallas/maxsim_scan.py) over the shard's replica, bound
    widening, exact rescore of the shard's best-bounded candidates from
    its PRIMARY rows, then the k·s ICI candidate merge plus a pmax of
    the per-shard exclusion thresholds — the global certificate
    ``merged kth > max_shards(threshold)`` proves the merged result is
    the exact full-corpus MaxSim top-k (every non-candidate chunk on
    shard j is bounded by threshold_j; candidate losers lost an exact
    comparison). Misses fail closed, exactly as single-chip.
    ``self_replica`` (bf16 primary + zero-copy pack) drops the separate
    replica parameter: the shard's primary IS the scan replica, so each
    chip holds the corpus once (maxsim_topk_scan16's accounting note)."""
    from trueno_rag_tpu.ops.pallas.maxsim_scan import maxsim_scan16_scores

    def local(q, qm, tok, tm, *rest):
        if self_replica:
            e_max, n_max, v, *tag_args = rest
            tok16 = tok
        else:
            tok16, e_max, n_max, v, *tag_args = rest
        b, lq, h = q.shape
        n_loc = tok.shape[0]
        qv = jnp.where(qm[:, :, None], q.astype(jnp.float32), 0.0)
        q16, a_c, c1, q_w = _scan16_query_pack(q, qm)
        s16k = maxsim_scan16_scores(
            q16, tok16, tm, v, tile_n=tile_n, interpret=interpret
        )  # [B, n_loc]
        u = s16k + _scan16_fused_widths(a_c, c1, q_w, e_max, n_max, h, lq)
        if tag_args:
            bits, ta, ty, tn = tag_args
            allowed = tag_pred(
                bits[None, :], ta[:, None], ty[:, None], tn[:, None]
            )
            u = jnp.where(allowed, u, NEG_INF)
        top_s, rows, _kth, thr = _select_rescore_threshold(
            qv, qm, tok, tm, u, k, min(rescore, n_loc), select
        )
        shard = jax.lax.axis_index(axis)
        r_glob = jnp.where(rows >= 0, rows + shard * n_loc, _I32_MAX)
        r_glob = jnp.where(jnp.isneginf(top_s), _I32_MAX, r_glob)
        s_m, r_m = merge_local_topk(top_s, r_glob, k, axis)
        thr_g = jax.lax.pmax(thr, axis)
        kth_g = s_m[:, k - 1] if k <= s_m.shape[1] else jnp.full(
            (s_m.shape[0],), NEG_INF
        )
        certified = (kth_g > thr_g) | jnp.isneginf(thr_g)
        return s_m, r_m, certified

    in_specs = [P(), P(), P(axis, None, None), P(axis, None)]
    if not self_replica:
        in_specs.append(P(axis, None, None))
    in_specs += [P(axis), P(axis), P(axis)]
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


def sharded_maxsim_topk_scan16_fused(
    q_tok: jax.Array,  # [B, Lq, H] replicated
    q_mask: jax.Array,  # [B, Lq] replicated
    tokens: jax.Array,  # [N, Lt, H] primary, sharded P(axis, None, None)
    t_mask: jax.Array,  # [N, Lt] sharded
    tok16: jax.Array,  # [N, Lt, H] bf16 replica, sharded
    e_max: jax.Array,  # [N] f32 sharded
    n_max: jax.Array,  # [N] f32 sharded
    valid: jax.Array,  # [N] bool sharded
    k: int,
    mesh: Mesh,
    axis: str = "data",
    rescore: int = 256,
    tile_n: int = 0,
    interpret: bool = False,
    tags: Optional[Tuple[jax.Array, ...]] = None,
    select: str = "auto",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Certified bf16-tier MaxSim top-k over a row-sharded token corpus
    via the fused kernel → ``(scores [B,k], rows [B,k] GLOBAL ids,
    certified [B])``. ``tags`` = (tag_bits [N] i32 sharded, t_all [B],
    t_any [B], t_none [B] replicated) makes it an exact FILTERED search
    (certified sets are the exact top-k among allowed rows).
    ``tok16 is tokens`` (the zero-copy bf16-primary pack,
    prepare_maxsim_self16) lowers to a single-corpus-parameter program
    so each chip holds its shard once."""
    self_replica = tok16 is tokens
    args = [q_tok, q_mask, tokens, t_mask]
    if not self_replica:
        args.append(tok16)
    args += [e_max, n_max, valid]
    if tags is not None:
        args += list(tags)
    return _sharded_maxsim_fused_fn(
        mesh, axis, k, rescore, tile_n, interpret, tags is not None,
        self_replica, select,
    )(*args)


@functools.lru_cache(maxsize=64)
def _sharded_maxsim_prep_fn(mesh, axis):
    """Shard-local tier pack: prepare_maxsim_scan16 is per-row math, so
    it runs on each shard's rows with no communication."""
    fn = shard_map(
        lambda tok, tm: prepare_maxsim_scan16(tok, tm),
        mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None)),
        out_specs=(P(axis, None, None), P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _sharded_maxsim_self_prep_fn(mesh, axis):
    """Zero-copy tier pack for bf16-primary shards: per-shard
    prepare_maxsim_self16 (no replica, just the norm bound)."""
    from trueno_rag_tpu.ops.maxsim import prepare_maxsim_self16

    fn = shard_map(
        lambda tok, tm: prepare_maxsim_self16(tok, tm),
        mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None)),
        out_specs=(P(axis), P(axis)),
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
        scan: str = "exact",
        rescore: int = 256,
        interpret: Optional[bool] = None,
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
        if scan not in ("exact", "tiered"):
            from trueno_rag_tpu.errors import InvalidConfigError

            raise InvalidConfigError(
                f"scan must be exact|tiered, got {scan!r}"
            )
        self.scan, self.rescore = scan, rescore
        if interpret is None:  # Pallas needs interpret mode off-TPU
            interpret = jax.devices()[0].platform not in ("tpu", "axon")
        self.interpret = interpret
        self.uncertified = 0
        self._tier = None
        if scan == "tiered":
            if dtype == jnp.bfloat16:
                # bf16 primary: zero-copy pack — the shard replica IS
                # the primary (no per-chip duplicate of the corpus)
                e_max, n_max = _sharded_maxsim_self_prep_fn(mesh, axis)(
                    self.tokens, self.t_mask
                )
                self._tier = (self.tokens, e_max, n_max)
            else:
                # shard-local bf16 replica pack (per-row math, no comms)
                self._tier = _sharded_maxsim_prep_fn(mesh, axis)(
                    self.tokens, self.t_mask
                )

    @classmethod
    def from_token_store(cls, store, mesh: Mesh, axis: str = "data",
                         block: int = 512, scan: str = "exact",
                         rescore: int = 256) -> "ShardedTokenIndex":
        """Snapshot a TokenVectorStore (rows stay registry-aligned, so
        global row ids hydrate through the same registry). ``scan=
        "tiered"`` serves through the fused bf16 tier with exact-scan
        fallback, like the single-chip store's ``scan="tiered"``."""
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
            # the store's host rows are ALREADY exactly what should be
            # served: normalized at insert when config.normalize, raw
            # otherwise — never re-normalize a snapshot (passing
            # store.config.normalize here silently normalized the
            # corpus of a normalize=False store, breaking parity with
            # the single-chip search)
            tokens_normalized=True,
            tags=tags,
            block=block,
            storage_dtype=store.config.storage_dtype,
            normalize_queries=store.config.normalize,
            scan=scan,
            rescore=rescore,
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
        if self.scan == "tiered":
            s, r, cert = sharded_maxsim_topk_scan16_fused(
                q, qm, self.tokens, self.t_mask, *self._tier, self.valid,
                k, self.mesh, self.axis, self.rescore,
                interpret=self.interpret,
            )
            cert_np = np.asarray(cert)
            if not cert_np.all():
                # fail-closed: uncertified queries re-run on the exact
                # sharded scan (certified ones are provably identical)
                self.uncertified += int((~cert_np).sum())
                s_e, r_e = sharded_maxsim_topk(
                    q, qm, self.tokens, self.t_mask, self.valid, k,
                    self.mesh, self.axis, self.block,
                )
                s = jnp.where(cert[:, None], s, s_e)
                r = jnp.where(cert[:, None], r, r_e)
        else:
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
        ta = jnp.asarray(t_all, jnp.int32)
        ty = jnp.asarray(t_any, jnp.int32)
        tn = jnp.asarray(t_none, jnp.int32)
        if self.scan == "tiered":
            s, r, cert = sharded_maxsim_topk_scan16_fused(
                q, qm, self.tokens, self.t_mask, *self._tier, self.valid,
                k, self.mesh, self.axis, self.rescore,
                interpret=self.interpret,
                tags=(self.tags, ta, ty, tn),
            )
            cert_np = np.asarray(cert)
            if not cert_np.all():
                self.uncertified += int((~cert_np).sum())
                s_e, r_e = sharded_maxsim_topk_tagged(
                    q, qm, self.tokens, self.t_mask, self.valid,
                    self.tags, ta, ty, tn, k, self.mesh, self.axis,
                    self.block,
                )
                s = jnp.where(cert[:, None], s, s_e)
                r = jnp.where(cert[:, None], r, r_e)
        else:
            s, r = sharded_maxsim_topk_tagged(
                q, qm, self.tokens, self.t_mask, self.valid, self.tags,
                ta, ty, tn, k, self.mesh, self.axis, self.block,
            )
        return np.asarray(s), np.asarray(r)
