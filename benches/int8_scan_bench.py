"""int8-scan + patch-always experiment at 10.5M (ROADMAP #38): the
compact "int8" layout streams a 1 B/elem scan replica (half the bf16r
scan bytes) with a bf16 rescore whose ~1.7e-3 interval certifies ~0%
on random corpora — worthless under the old certified-or-GEMM regime,
but the r4 containment patch changed the economics: if the tile
threshold still proves containment, EVERY query can be settled exactly
by the ~W-row host f64 rescore, and the device only needs to be a fast
sound CANDIDATE GENERATOR.

This bench measures on the real chip:
  1. the full-hybrid chained marginal with the int8 scan vs bf16r,
  2. certified + containment counts for the int8 pass,
  3. the vectorized host patch cost for the whole batch (which on this
     1-core dev box is the honest bottleneck; a v5e host has >100
     cores and the patch is embarrassingly parallel across queries).

Run: PYTHONPATH=.:$PYTHONPATH python -u benches/int8_scan_bench.py [--n ...]
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
    import numpy as np

    from benches.hybrid_scale_bench import build_bm25_device, query_blocks_from_indptr
    from trueno_rag_tpu.ops.bm25 import bm25_topk_blocks
    from trueno_rag_tpu.ops.dense_tiered import (
        dense_topk_compact,
        dense_topk_compact_bf16r,
        prepare_int8,
        prepare_residual,
        prepare_tiered,
    )
    from trueno_rag_tpu.ops.fusion import fuse_topk

    n, d, b, cand, k = args.n, args.d, args.batch, args.cand, args.k

    blocks, indptr = build_bm25_device(n, 50_000, avg_len=64)
    bids, blo, bhi = query_blocks_from_indptr(indptr, b, 6)
    sparse = tuple(jnp.asarray(x) for x in (bids, blo, bhi))
    jax.block_until_ready(blocks)

    def _gen_body(idx, dd):
        keys = jax.vmap(jax.random.fold_in, (None, 0))(jax.random.PRNGKey(0), idx)
        m = jax.vmap(lambda kk: jax.random.normal(kk, (dd,), jnp.float32))(keys)
        return m / jnp.linalg.norm(m, axis=1, keepdims=True)

    @functools.partial(jax.jit, static_argnames=("rows", "dim"))
    def gen_slab(lo, rows, dim):
        return _gen_body(lo + jnp.arange(rows, dtype=jnp.uint32), dim)

    @functools.partial(jax.jit, static_argnames=("dim",))
    def gen_rows_at(idx, dim):
        return _gen_body(idx, dim)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def set_slab(dest, s, lo):
        return jax.lax.dynamic_update_slice(dest, s, (lo,) + (0,) * (dest.ndim - 1))

    # int8 layout: bf16 rescore copy + int8 scan copy (3 B/elem total)
    t0 = time.perf_counter()
    parts8 = [
        jnp.zeros((n, d), jnp.bfloat16),   # m_bf16 (rescore)
        jnp.zeros((n,), jnp.float32),      # bf_e_l2
        jnp.zeros((n,), jnp.float32),      # bf_a_l2
        jnp.zeros((n, d), jnp.int8),       # m_i8 (scan)
        jnp.ones((n,), jnp.float32),       # s_row
        jnp.zeros((n,), jnp.float32),      # i8_e_l2
        jnp.zeros((n,), jnp.float32),      # i8_a_l2
    ]
    for si, lo in enumerate(range(0, n, args.slab)):
        s = gen_slab(jnp.uint32(lo), args.slab, d)
        pieces = prepare_tiered(s) + prepare_int8(s)
        parts8 = [set_slab(dst, pc, lo) for dst, pc in zip(parts8, pieces)]
        del s, pieces
    jax.block_until_ready(parts8)
    print(f"int8 layout built in {time.perf_counter()-t0:.1f}s", flush=True)
    valid = jnp.ones((n,), bool)
    queries = jax.random.normal(jax.random.PRNGKey(777), (b, d), jnp.float32)

    # -- int8 primary pass: certification + containment ---------------------
    s1, r1, ok, cand_rows, thr = dense_topk_compact(
        queries, *parts8, valid, cand, tile_n=4096, return_candidates=True,
    )
    ok_np = np.asarray(ok)
    bad = np.flatnonzero(~ok_np)
    print(f"int8 primary: {int(ok_np.sum())}/{b} certified", flush=True)

    t0 = time.perf_counter()
    cand_np = np.asarray(cand_rows)
    thr_np = np.asarray(thr)
    t_fetch = time.perf_counter() - t0
    rows_needed = np.unique(cand_np[(cand_np >= 0) & (cand_np < n)])
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        host_vals = np.asarray(gen_rows_at(
            jnp.asarray(rows_needed.astype(np.uint32)), d))

    def patch_all(cand_b, thr_b, q_b):
        live = (cand_b >= 0) & (cand_b < n)
        safe = np.where(live, cand_b, rows_needed[0])
        gi = np.searchsorted(rows_needed, safe)
        g = host_vals[gi].astype(np.float64)
        qn = q_b.astype(np.float64)
        qn /= np.linalg.norm(qn, axis=1, keepdims=True)
        sc = np.einsum("bwd,bd->bw", g, qn)
        sc[~live] = -np.inf
        order = np.lexsort(
            (np.where(live, cand_b, np.iinfo(np.int64).max), -sc), axis=-1
        )[:, :cand]
        top_s = np.take_along_axis(sc, order, axis=1)
        return top_s[:, -1] > thr_b

    q_np = np.asarray(queries)
    pts = []
    for _ in range(3):
        t0 = time.perf_counter()
        contained = patch_all(cand_np.astype(np.int64), thr_np, q_np)
        pts.append(time.perf_counter() - t0)
    t_patch = sorted(pts)[1]
    print(f"containment (ALL {b} queries): {int(contained.sum())}/{b}; "
          f"host patch {t_patch*1e3:.1f} ms/batch on 1 core "
          f"(fetch {t_fetch*1e3:.1f} ms tunnel; embarrassingly parallel "
          f"across queries on a real host)", flush=True)

    # -- chained full-hybrid marginals: int8 vs bf16r ------------------------
    def hybrid_marginal(fn_kind, parts):
        @functools.partial(jax.jit, static_argnames=("steps",))
        def chain(q, bids, blo, bhi, blocks, *rest, steps):
            *mats, valid = rest

            def one(carry, _):
                qq = q + carry
                shift = (carry > 1e30).astype(jnp.int32)
                if fn_kind == "int8":
                    d_s, d_r, ok2 = dense_topk_compact(
                        qq, *mats, valid, cand, tile_n=4096)
                else:
                    d_s, d_r, ok2 = dense_topk_compact_bf16r(
                        qq, *mats, valid, cand, tile_n=4096)
                s_s, s_r = bm25_topk_blocks(bids + shift, blo, bhi, blocks, k=cand)
                f_r, f_s = fuse_topk(d_r, d_s, s_r, s_s, kind="rrf", param=60.0)
                top = jax.lax.top_k(f_s, k)[0]
                return (jnp.max(top) + jnp.sum(ok2).astype(jnp.float32)) * 1e-12, None

            c, _ = jax.lax.scan(one, 0.0, None, length=steps)
            return c

        arrs = (queries, *sparse, blocks, *parts, valid)
        float(chain(*arrs, steps=1))

        def timed(st):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(chain(*arrs, steps=st))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[1]

        return (timed(args.iters) - timed(2)) / (args.iters - 2) * 1e3

    m8 = hybrid_marginal("int8", parts8)
    print(f"int8-scan hybrid: {m8:.1f} ms/batch marginal "
          f"({b/m8*1e3:.0f} q/s device-side)", flush=True)

    # rebuild the bf16r layout for the head-to-head (frees int8 first)
    del parts8
    parts_r = [
        jnp.zeros((n, d), jnp.bfloat16),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n, d), jnp.int8),
        jnp.ones((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    ]
    for si, lo in enumerate(range(0, n, args.slab)):
        s = gen_slab(jnp.uint32(lo), args.slab, d)
        pieces = prepare_tiered(s) + prepare_residual(s)
        parts_r = [set_slab(dst, pc, lo) for dst, pc in zip(parts_r, pieces)]
        del s, pieces
    jax.block_until_ready(parts_r)
    mr = hybrid_marginal("bf16r", parts_r)
    print(f"bf16r hybrid:     {mr:.1f} ms/batch marginal "
          f"({b/mr*1e3:.0f} q/s device-side)  -> int8 speedup {mr/m8:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
