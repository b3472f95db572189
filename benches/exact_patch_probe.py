"""Probe the r4 exact-contract design at 10.5M on the real chip:

1. containment rate of the PRIMARY pass's candidates for uncertified
   queries (how often does the host candidate patch suffice?),
2. the patch's real costs: device->host candidate fetch (tunnel-bound
   here, PCIe on real metal) + host f64 rescore,
3. B-sweep of the full hybrid chain (B=256/512/1024) — the scan is
   memory-bound and B-independent, so QPS should ~double per doubling
   until compute/VMEM binds.

Run: PYTHONPATH=.:$PYTHONPATH python -u benches/exact_patch_probe.py [--n ...]
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
    p.add_argument("--k", type=int, default=50)
    p.add_argument("--slab", type=int, default=524_288)
    p.add_argument("--sweep", type=str, default="256,512,1024")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from benches.hybrid_scale_bench import build_bm25_device, query_blocks_from_indptr
    from trueno_rag_tpu.ops.bm25 import bm25_topk_blocks
    from trueno_rag_tpu.ops.dense_tiered import (
        dense_topk_compact_bf16r,
        prepare_residual,
        prepare_tiered,
    )
    from trueno_rag_tpu.ops.fusion import fuse_topk

    n, d, b, k = args.n, args.d, args.batch, args.k

    blocks, indptr = build_bm25_device(n, 50_000, avg_len=64)
    jax.block_until_ready(blocks)
    print("bm25 device blocks built", flush=True)

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
    print(f"N={n:,} bf16r replicas built in {time.perf_counter()-t0:.1f}s", flush=True)
    valid = jnp.ones((n,), bool)
    queries = jax.random.normal(jax.random.PRNGKey(777), (b, d), jnp.float32)

    # -- primary pass with candidates --------------------------------------
    t0 = time.perf_counter()
    s1, r1, ok, cand, thr = dense_topk_compact_bf16r(
        queries, *parts, valid, k, tile_n=4096, return_candidates=True,
    )
    ok_np = np.asarray(ok)
    print(f"primary: {int(ok_np.sum())}/{b} certified "
          f"({time.perf_counter()-t0:.1f}s incl. compile); "
          f"cand width {cand.shape[1]}", flush=True)

    bad = np.flatnonzero(~ok_np)
    if len(bad) == 0:
        print("no failures to patch")
    else:
        # fetch cost (tunnel here, PCIe on metal): candidate rows + thr
        # + best-effort scores/rows for the bad queries only
        t0 = time.perf_counter()
        cand_bad = np.asarray(cand[jnp.asarray(bad)])
        thr_bad = np.asarray(thr[jnp.asarray(bad)])
        t_fetch = time.perf_counter() - t0
        print(f"fetch: {cand_bad.nbytes + thr_bad.nbytes} B for "
              f"{len(bad)} queries in {t_fetch*1e3:.1f} ms", flush=True)

        # regenerate host fp32 slabs on the LOCAL cpu backend (threefry
        # bits are platform-invariant; last-ulp normalize differences
        # are ~1e-8, far below the containment margin)
        q_np = np.asarray(queries)[bad]
        rows_needed = np.unique(cand_bad[(cand_bad >= 0) & (cand_bad < n)])
        slabs_needed = np.unique(rows_needed // args.slab)
        t0 = time.perf_counter()
        host_rows = {}
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            for si in slabs_needed:
                lo = int(si) * args.slab
                sl = np.asarray(gen_slab(int(si), args.slab, d))
                in_slab = rows_needed[(rows_needed >= lo) & (rows_needed < lo + args.slab)]
                for r in in_slab:
                    host_rows[int(r)] = sl[int(r) - lo]
                del sl
        t_regen = time.perf_counter() - t0
        print(f"host slab regen: {len(slabs_needed)} slabs, "
              f"{len(rows_needed)} rows in {t_regen:.1f}s (bench-only cost; "
              f"production reads VectorStore._host)", flush=True)

        # the patch itself: f64 rescore + containment check
        t0 = time.perf_counter()
        contained = 0
        ties_resolved = 0
        for bi, qi in enumerate(bad):
            cr = cand_bad[bi]
            cr = np.unique(cr[(cr >= 0) & (cr < n)])
            mat = np.stack([host_rows[int(r)] for r in cr]).astype(np.float64)
            qv = q_np[bi].astype(np.float64)
            qv /= np.linalg.norm(qv)
            s = mat @ qv
            order = np.lexsort((cr, -s))[:k]
            s_k = s[order[-1]]
            if float(thr_bad[bi]) < s_k:
                contained += 1
                # how many of the device's best-effort rows did the
                # exact rescore actually change?
                dev_rows = set(int(x) for x in np.asarray(r1)[qi] if x >= 0)
                ties_resolved += len(dev_rows.symmetric_difference(
                    set(int(x) for x in cr[order])) ) // 2
        t_patch = time.perf_counter() - t0
        print(f"containment: {contained}/{len(bad)} patched exactly from "
              f"candidates ({t_patch*1e3:.1f} ms host rescore); "
              f"{len(bad)-contained} would need the GEMM; "
              f"avg set diff vs best-effort {ties_resolved/max(contained,1):.2f} rows",
              flush=True)

    # -- B-sweep of the full hybrid chain ----------------------------------
    for bs in [int(x) for x in args.sweep.split(",") if x]:
        qb = jax.random.normal(jax.random.PRNGKey(bs), (bs, d), jnp.float32)
        bids, blo, bhi = query_blocks_from_indptr(indptr, bs, 6)
        sparse = tuple(jnp.asarray(x) for x in (bids, blo, bhi))

        @functools.partial(jax.jit, static_argnames=("steps",))
        def chain(queries, bids, blo, bhi, blocks, *rest, steps):
            *mats, valid = rest

            def one(carry, _):
                q = queries + carry
                shift = (carry > 1e30).astype(jnp.int32)
                d_s, d_r, ok2 = dense_topk_compact_bf16r(
                    q, *mats, valid, k, tile_n=4096
                )
                s_s, s_r = bm25_topk_blocks(bids + shift, blo, bhi, blocks, k=k)
                f_r, f_s = fuse_topk(d_r, d_s, s_r, s_s, kind="rrf", param=60.0)
                top = jax.lax.top_k(f_s, 10)[0]
                return (jnp.max(top) + jnp.sum(ok2).astype(jnp.float32)) * 1e-12, None

            c, _ = jax.lax.scan(one, 0.0, None, length=steps)
            return c

        arrs = (qb, *sparse, blocks, *parts, valid)
        iters = 12
        float(chain(*arrs, steps=1))
        float(chain(*arrs, steps=2))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(*arrs, steps=iters))
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[1]
        # decompose fixed dispatch via steps-2
        t2 = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(*arrs, steps=2))
            t2.append(time.perf_counter() - t0)
        dt2 = sorted(t2)[1]
        marginal = (dt - dt2) / (iters - 2)
        print(f"B={bs}: {bs*iters/dt:.0f} q/s chained ({dt/iters*1e3:.1f} ms/batch incl. "
              f"dispatch share; marginal {marginal*1e3:.1f} ms/batch -> "
              f"{bs/marginal:.0f} q/s marginal)", flush=True)


if __name__ == "__main__":
    main()
