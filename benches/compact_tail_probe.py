"""Decompose the 10.5M compact hybrid batch (r3 verdict #3: trim the
non-scan tail): chained marginals for

  scan    — scan_select_v3 kernel only (outputs reduced to a scalar)
  dense   — full dense_topk_compact_bf16r (scan + selection + gather +
            residual rescore + certificate)
  +bm25   — dense + bm25_topk_blocks
  full    — dense + bm25 + fuse_topk + final top_k

Deltas between consecutive rows apportion the tail. bench.py chain
methodology; fixed dispatch decomposed via steps-2 vs steps-N.

Run: PYTHONPATH=.:$PYTHONPATH python -u benches/compact_tail_probe.py [--n ...]
"""

from __future__ import annotations

import argparse
import functools
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=20 * 524_288)
    p.add_argument("--d", type=int, default=384)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--cand", type=int, default=50)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--slab", type=int, default=524_288)
    p.add_argument("--iters", type=int, default=12)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from benches.hybrid_scale_bench import build_bm25_device, query_blocks_from_indptr
    from trueno_rag_tpu.ops.bm25 import bm25_topk_blocks
    from trueno_rag_tpu.ops.dense_tiered import (
        _bf16_query_bounds,
        _metric_queries,
        dense_topk_compact_bf16r,
        prepare_residual,
        prepare_tiered,
    )
    from trueno_rag_tpu.ops.fusion import fuse_topk
    from trueno_rag_tpu.ops.pallas.scan_select_v2 import scan_select_v3

    n, d, b, cand, k = args.n, args.d, args.batch, args.cand, args.k

    blocks, indptr = build_bm25_device(n, 50_000, avg_len=64)
    bids, blo, bhi = query_blocks_from_indptr(indptr, b, 6)
    sparse = tuple(jnp.asarray(x) for x in (bids, blo, bhi))
    jax.block_until_ready(blocks)

    @functools.partial(jax.jit, static_argnames=("rows", "dim"))
    def gen_slab(seed, rows, dim):
        m = jax.random.normal(jax.random.PRNGKey(seed), (rows, dim), jnp.float32)
        return m / jnp.linalg.norm(m, axis=1, keepdims=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def set_slab(dest, s, lo):
        return jax.lax.dynamic_update_slice(dest, s, (lo,) + (0,) * (dest.ndim - 1))

    t0 = time.perf_counter()
    parts = [
        jnp.zeros((n, d), jnp.bfloat16),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n, d), jnp.int8),
        jnp.ones((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    ]
    for si, lo in enumerate(range(0, n, args.slab)):
        s = gen_slab(si, args.slab, d)
        pieces = prepare_tiered(s) + prepare_residual(s)
        parts = [set_slab(dst, pc, lo) for dst, pc in zip(parts, pieces)]
        del s, pieces
    jax.block_until_ready(parts)
    print(f"N={n:,} built in {time.perf_counter()-t0:.1f}s", flush=True)
    valid = jnp.ones((n,), bool)
    queries = jax.random.normal(jax.random.PRNGKey(777), (b, d), jnp.float32)

    def stage_fn(stage):
        # arrays travel as ARGUMENTS (lore: closures bake into the
        # jaxpr as constants and remote compile ships the corpus)
        @functools.partial(jax.jit, static_argnames=("steps",))
        def chain(queries, bids, blo, bhi, blocks, *rest, steps):
            m_bf16, e_l2, a_l2, r_i8, r_scale, e2_l2, valid = rest
            parts_l = rest[:-1]

            def one(carry, _):
                q = queries + carry
                shift = (carry > 1e30).astype(jnp.int32)
                if stage == "scan":
                    qq = _metric_queries(q, "cosine")
                    qb, u_q, v_q = _bf16_query_bounds(qq)
                    outs = scan_select_v3(
                        qb, m_bf16, e_l2, a_l2, valid.astype(jnp.int32),
                        u_q, v_q, tile_n=4096, t_top=4,
                    )
                    v = sum(jnp.sum(o[:, 0, :1]) for o in outs)
                elif stage == "dense":
                    s, r, ok = dense_topk_compact_bf16r(
                        q, *parts_l, valid, cand, tile_n=4096)
                    v = jnp.max(s) + jnp.sum(ok).astype(jnp.float32)
                elif stage == "bm25":
                    s, r, ok = dense_topk_compact_bf16r(
                        q, *parts_l, valid, cand, tile_n=4096)
                    s_s, s_r = bm25_topk_blocks(bids + shift, blo, bhi,
                                                blocks, k=cand)
                    v = jnp.max(s) + jnp.max(s_s) + jnp.sum(ok).astype(jnp.float32)
                else:
                    d_s, d_r, ok = dense_topk_compact_bf16r(
                        q, *parts_l, valid, cand, tile_n=4096)
                    s_s, s_r = bm25_topk_blocks(bids + shift, blo, bhi,
                                                blocks, k=cand)
                    f_r, f_s = fuse_topk(d_r, d_s, s_r, s_s, kind="rrf",
                                         param=60.0)
                    v = jnp.max(jax.lax.top_k(f_s, k)[0]) + jnp.sum(ok).astype(jnp.float32)
                return v * 1e-12, None

            c, _ = jax.lax.scan(one, 0.0, None, length=steps)
            return c

        return chain

    valid_j = valid
    arrs = (queries, *sparse, blocks, *parts, valid_j)

    def marginal(chain, iters):
        float(chain(*arrs, steps=1))
        def timed(s):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(chain(*arrs, steps=s))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[1]
        d_hi = timed(iters)
        d_lo = timed(2)
        return (d_hi - d_lo) / (iters - 2)

    prev = 0.0
    for stage in ("scan", "dense", "bm25", "full"):
        m = marginal(stage_fn(stage), args.iters) * 1e3
        print(f"{stage:6s}: {m:6.1f} ms/batch marginal  (+{m-prev:5.1f})",
              flush=True)
        prev = m


if __name__ == "__main__":
    main()
