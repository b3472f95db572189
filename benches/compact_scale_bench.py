"""Compact-tier scale bench: certified top-k SETS with no fp32 matrix
in HBM (ops/dense_tiered.dense_topk_compact_bf16r / _bf16 / _compact).

The point of the compact tiers is corpora the fp32 tiers cannot hold on
one chip: 10M x 384 is 15 GB fp32 — more than a v5e's HBM — but 11.5 GB
as bf16 + int8 residual correction (--scan bf16r, default; the
certification-per-byte sweet spot), 7.7 GB as a single bf16 copy
(--scan bf16), or 11.5 GB as int8 scan + bf16 rescore (--scan int8).
This bench

1. synthesizes the corpus ON DEVICE in slabs (the tunnel cannot ship
   GBs) and builds the replicas with donated-buffer slab writes so the
   fp32 rows only ever exist one slab at a time;
2. at --check sizes (fp32 fits alongside, <= ~2.5M) verifies certified
   row SETS against the exact oracle;
3. times the query in a dependency-chained lax.scan materializing one
   scalar (bench.py methodology: block_until_ready returns early over
   the tunnel and large fetches measure the tunnel, not the device).

Run: PYTHONPATH=.:$PYTHONPATH python benches/compact_scale_bench.py \
    [--n 10000000] [--check]
"""

from __future__ import annotations

import argparse
import functools
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=10_000_000)
    p.add_argument("--d", type=int, default=384)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--k", type=int, default=50)
    p.add_argument("--slab", type=int, default=524_288)
    p.add_argument("--tile-n", type=int, default=4096)
    p.add_argument("--scan", default="bf16r", choices=("bf16r", "bf16", "int8"),
               help="compact layout: bf16 + int8 residual correction "
                    "(3 B/elem, default), bf16-only (2 B/elem), or "
                    "int8 scan + bf16 rescore (3 B/elem)")
    p.add_argument("--check", action="store_true",
                   help="verify certified sets vs the fp32 oracle "
                        "(needs the fp32 matrix resident: <= ~2.5M)")
    p.add_argument("--hybrid", action="store_true",
                   help="full hybrid: compact dense + device-synthesized "
                        "BM25 block table + RRF + top-10 — the 10M "
                        "north-star workload on ONE chip")
    p.add_argument("--cand", type=int, default=50)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--vocab", type=int, default=50_000)
    p.add_argument("--tags", action="store_true",
                   help="tag-filtered queries: 3 random tag bits per row, "
                        "filter = require bit0 (~50%% of rows allowed); the "
                        "predicate rides the scan kernel")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from trueno_rag_tpu.ops.dense import dense_topk
    from trueno_rag_tpu.ops.dense_tiered import (
        dense_topk_compact,
        dense_topk_compact_bf16,
        dense_topk_compact_bf16r,
        prepare_int8,
        prepare_residual,
        prepare_tiered,
    )

    n, d, b, k = args.n, args.d, args.batch, args.k
    assert n % args.slab == 0, "use --n a multiple of --slab"

    @functools.partial(jax.jit, static_argnames=("rows", "dim"))
    def gen_slab(seed, rows, dim):
        m = jax.random.normal(jax.random.PRNGKey(seed), (rows, dim), jnp.float32)
        return m / jnp.linalg.norm(m, axis=1, keepdims=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def set_slab(dest, slab, lo):
        return jax.lax.dynamic_update_slice(dest, slab, (lo,) + (0,) * (dest.ndim - 1))

    sparse = None
    if args.hybrid:
        # Build the BM25 structures FIRST: synthesizing ~170M postings
        # at 10M chunks peaks several GB of transients, which OOM next
        # to the ~12 GB of resident replicas but fit fine in an empty
        # HBM (the kept block table is only ~1.3 GB).
        import os
        import sys

        import jax as _jax

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from hybrid_scale_bench import build_bm25_device, query_blocks_from_indptr

        blocks, indptr = build_bm25_device(n, args.vocab, avg_len=64)
        bids, blo, bhi = query_blocks_from_indptr(indptr, b, terms_per_query=6)
        sparse = (jnp.asarray(bids), jnp.asarray(blo), jnp.asarray(bhi), blocks)
        _jax.block_until_ready(blocks)
        print(f"BM25 block table: {blocks.nbytes/2**30:.2f} GiB "
              f"({int(indptr[-1]):,} postings); slots/query={bids.shape[1]}",
              flush=True)

    t0 = time.perf_counter()
    parts = [
        jnp.zeros((n, d), jnp.bfloat16),  # m_bf16
        jnp.zeros((n,), jnp.float32),     # bf e_l2
        jnp.zeros((n,), jnp.float32),     # bf a_l2
    ]
    if args.scan == "int8":
        parts += [
            jnp.zeros((n, d), jnp.int8),  # m_i8
            jnp.ones((n,), jnp.float32),  # s_row
            jnp.zeros((n,), jnp.float32),  # i8 e_l2
            jnp.zeros((n,), jnp.float32),  # i8 a_l2
        ]
    elif args.scan == "bf16r":
        parts += [
            jnp.zeros((n, d), jnp.int8),  # r_i8
            jnp.ones((n,), jnp.float32),  # r_scale
            jnp.zeros((n,), jnp.float32),  # e2_l2
        ]
    compact = {
        "int8": dense_topk_compact,
        "bf16": dense_topk_compact_bf16,
        "bf16r": dense_topk_compact_bf16r,
    }[args.scan]
    keep_fp32 = args.check
    fp32 = jnp.zeros((n, d), jnp.float32) if keep_fp32 else None
    for si, lo in enumerate(range(0, n, args.slab)):
        slab = gen_slab(si, args.slab, d)
        pieces = prepare_tiered(slab)
        if args.scan == "int8":
            pieces = pieces + prepare_int8(slab)
        elif args.scan == "bf16r":
            pieces = pieces + prepare_residual(slab)
        parts = [set_slab(dst, p, lo) for dst, p in zip(parts, pieces)]
        if keep_fp32:
            fp32 = set_slab(fp32, slab, lo)
        del slab, pieces
    jax.block_until_ready(parts)
    bytes_elem = 2 if args.scan == "bf16" else 3
    extra = n * 4 * {"int8": 5, "bf16r": 4, "bf16": 2}[args.scan]
    print(f"N={n:,} d={d} scan={args.scan} replicas built in "
          f"{time.perf_counter()-t0:.1f}s "
          f"({(n*d*bytes_elem + extra)/2**30:.2f} GiB device)", flush=True)

    valid = jnp.ones((n,), bool)
    queries = jax.random.normal(jax.random.PRNGKey(777), (b, d), jnp.float32)

    tags = None
    if args.tags:
        tag_bits = jax.random.randint(
            jax.random.PRNGKey(99), (n,), 0, 8, jnp.int32
        )
        tags = (
            tag_bits,
            jnp.full((b,), 1, jnp.int32),  # require bit0: ~50% allowed
            jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), jnp.int32),
        )

    # -- certification count + (optionally) oracle set check ---------------
    s_c, r_c, ok = compact(
        queries, *parts, valid, k, tile_n=args.tile_n, tags=tags,
    )
    ok_np = np.asarray(ok).astype(bool)
    print(f"certified: {int(ok_np.sum())}/{b}", flush=True)
    if args.check:
        # with --tags the oracle scans allowed rows only (the filter is
        # identical for every query in this bench, so it folds into the
        # validity mask)
        oracle_valid = valid if tags is None else valid & ((tags[0] & 1) != 0)
        s_x, r_x = dense_topk(queries, fp32, oracle_valid, k, "cosine")
        r_cn, r_xn = np.asarray(r_c), np.asarray(r_x)
        bad = [
            int(q) for q in np.flatnonzero(ok_np)
            if set(r_cn[q].tolist()) != set(r_xn[q].tolist())
        ]
        assert not bad, f"certified sets differ from oracle: queries {bad}"
        print(f"oracle check: all {int(ok_np.sum())} certified sets exact",
              flush=True)
        if args.hybrid:
            # The compact contract certifies the dense SET, not the
            # order within it; RRF fuses by RANK, so a within-set swap
            # can perturb the fused list. Report how often the fused
            # top-k matches the fp32-dense hybrid exactly.
            from trueno_rag_tpu.ops.bm25 import bm25_topk_blocks
            from trueno_rag_tpu.ops.fusion import fuse_topk

            s_s, s_r = bm25_topk_blocks(sparse[0], sparse[1], sparse[2],
                                        sparse[3], k=k)
            fr_c, _ = fuse_topk(r_c, s_c, s_r, s_s, kind="rrf", param=60.0)
            fr_x, _ = fuse_topk(r_x, s_x, s_r, s_s, kind="rrf", param=60.0)
            fc = np.asarray(fr_c)[:, : args.topk]
            fx = np.asarray(fr_x)[:, : args.topk]
            same = sum(
                1 for q in np.flatnonzero(ok_np)
                if (fc[q] == fx[q]).all()
            )
            print(f"fused top-{args.topk} identical to fp32 hybrid: "
                  f"{same}/{int(ok_np.sum())} certified queries", flush=True)

    # -- timing: dependency-chained scan, one scalar out -------------------
    if args.hybrid:
        from trueno_rag_tpu.ops.bm25 import bm25_topk_blocks
        from trueno_rag_tpu.ops.fusion import fuse_topk

        @functools.partial(jax.jit, static_argnames=("steps",))
        def chain(queries, bids, blo, bhi, blocks, tags, *rest, steps):
            *mats, valid = rest

            def one(carry, _):
                q = queries + carry
                shift = (carry > 1e30).astype(jnp.int32)
                d_s, d_r, ok = compact(
                    q, *mats, valid, args.cand, tile_n=args.tile_n, tags=tags,
                )
                s_s, s_r = bm25_topk_blocks(bids + shift, blo, bhi, blocks,
                                            k=args.cand)
                f_r, f_s = fuse_topk(d_r, d_s, s_r, s_s, kind="rrf", param=60.0)
                top = jax.lax.top_k(f_s, args.topk)[0]
                return (jnp.max(top) + jnp.sum(ok).astype(jnp.float32)) * 1e-12, None

            c, _ = jax.lax.scan(one, 0.0, None, length=steps)
            return c

        arrs = (queries, *sparse[:3], sparse[3], tags, *parts, valid)
        label = f"hybrid-compact[{args.scan}{'+tags' if args.tags else ''}]"
    else:
        @functools.partial(jax.jit, static_argnames=("steps",))
        def chain(queries, tags, *rest, steps):
            *mats, valid = rest

            def one(carry, _):
                q = queries + carry
                s, r, ok = compact(
                    q, *mats, valid, k, tile_n=args.tile_n, tags=tags,
                )
                return (jnp.max(s) + jnp.sum(ok).astype(jnp.float32)) * 1e-12, None

            c, _ = jax.lax.scan(one, 0.0, None, length=steps)
            return c

        arrs = (queries, tags, *parts, valid)
        label = f"compact[{args.scan}{'+tags' if args.tags else ''}]"

    float(chain(*arrs, steps=args.iters))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(*arrs, steps=args.iters))
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[1] / args.iters
    scan_bytes = 1 if args.scan == "int8" else 2
    bw = n * d * scan_bytes / dt / 2**30
    print(f"{label} @ {n:,}: {dt*1e3:8.3f} ms/step -> "
          f"{b/dt:10,.0f} q/s (scan stream {bw:,.0f} GiB/s)", flush=True)


if __name__ == "__main__":
    main()
