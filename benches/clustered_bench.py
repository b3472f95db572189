"""Cluster-pruned tier latency bench: full compact stream vs pruned
scan (gather and selective-DMA fetch) on a clustered corpus.

The compact tiers stream the whole corpus per batch — right for B=256
throughput, wrong for latency: one query pays the full multi-GB scan.
This bench measures the small-batch regime the clustered tier exists
for, on mixture-of-Gaussians data (the structure real embedding
corpora have; random data has no clusters to prune and is measured by
compact_scale_bench).

Per variant it reports ms/batch via the dependency-chained lax.scan
methodology (CLAUDE.md: block_until_ready returns early over the
tunnel; each step's query depends on the carry so XLA cannot hoist),
plus certified counts and the scanned-tile fraction.

Note (r3): this script materializes the fp32 matrix alongside the
clustered replicas, so it tops out ~2.5M on one v5e — at 10.5M it dies
on TPU ResourceExhausted (measured; the chip recovered on its own).
The 10M-scale clustered numbers come from the slab-built store path
(docs/architecture.md), not this script.

Run: PYTHONPATH=.:$PYTHONPATH python benches/clustered_bench.py \
    [--n 1048576] [--batch 8] [--probe 16] [--check]
"""

from __future__ import annotations

import argparse
import functools
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_048_576)
    p.add_argument("--d", type=int, default=384)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--blobs", type=int, default=0,
                   help="0 = one blob per tile (n / tile-n)")
    p.add_argument("--sigma", type=float, default=0.025,
                   help="blob spread; tile radius ~ sigma*sqrt(d)")
    p.add_argument("--planted", type=int, default=0,
                   help="near-duplicate top rows planted per blob "
                        "(0 = k; planting MORE than k leaves planted "
                        "rows beyond t_top in the loose bf16 threshold "
                        "channel and correctly fails the certificate)")
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--probe", type=int, default=16)
    p.add_argument("--tile-n", type=int, default=4096)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--check", action="store_true",
                   help="oracle-check certified sets (hosts the fp32 matmul)")
    p.add_argument("--host-prep", action="store_true",
                   help="host corpus + prepare_clustered (round-trips the "
                        "full matrix through the host — fine locally, "
                        "minutes-per-GB over this box's ~2 MB/s tunnel)")
    p.add_argument("--fetch", default="both", choices=("both", "gather", "dma"),
                   help="union-scan mechanism(s) to certify + time. At 10M "
                        "the gather copy's XLA temps (~7 GB) do not fit "
                        "next to the 12 GB replicas — use --fetch dma "
                        "(the production default on accelerators anyway).")
    p.add_argument("--stream", action="store_true",
                   help="10M-scale mode: the fp32 corpus NEVER exists — "
                        "rows are an on-device function of their id "
                        "(prepare_clustered_stream), permuted replicas "
                        "are generated straight into cluster order, and "
                        "the --check oracle streams slab-wise top-k "
                        "merges. Required above ~4M (the resident-f32 "
                        "paths exceed a v5e's 16 GB HBM).")
    p.add_argument("--hybrid", action="store_true",
                   help="also time the FULL hybrid at this batch size: "
                        "clustered dense + device BM25 block table + RRF "
                        "+ top-10 — the 10M north-star workload in its "
                        "latency (small-B) regime")
    p.add_argument("--vocab", type=int, default=50_000)
    p.add_argument("--topk", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from trueno_rag_tpu.ops.clustered import (
        apply_cluster_order,
        apply_cluster_order_device,
        dense_topk_compact_bf16r_clustered,
        prepare_clustered,
        prepare_clustered_device,
        prepare_clustered_stream,
    )
    from trueno_rag_tpu.ops.dense_tiered import (
        dense_topk_compact_bf16r,
        prepare_residual,
        prepare_tiered,
    )

    interp = jax.default_backend() == "cpu"  # smoke-testable off-TPU
    n, d, b, k = args.n, args.d, args.batch, args.k
    tile_n = args.tile_n
    t = -(-n // tile_n)
    blobs = args.blobs or t
    rng = np.random.default_rng(0)

    prep_name = "host" if args.host_prep else ("stream" if args.stream else "device")
    print(f"N={n:,} d={d} B={b} blobs={blobs} tiles={t} "
          f"probe={args.probe} k={k} prep={prep_name}",
          flush=True)

    sparse = None
    if args.hybrid:
        # BM25 synthesis FIRST: its multi-GB transients fit in an empty
        # HBM but not next to the resident replicas (compact_scale_bench
        # learned the same ordering); the kept block table is ~1.3 GB.
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from hybrid_scale_bench import build_bm25_device, query_blocks_from_indptr

        blocks, indptr = build_bm25_device(n, args.vocab, avg_len=64)
        bids, blo, bhi = query_blocks_from_indptr(indptr, b, terms_per_query=6)
        sparse = (jnp.asarray(bids), jnp.asarray(blo), jnp.asarray(bhi), blocks)
        jax.block_until_ready(blocks)
        print(f"BM25 block table: {blocks.nbytes/2**30:.2f} GiB "
              f"({int(indptr[-1]):,} postings)", flush=True)

    # -- corpus: blobs + planted relevant rows -----------------------------
    # balanced blobs (each fits one tile) — the structure the pruning
    # bound needs; k-means recovers them as pure tiles. Only the tiny
    # [blobs, d] centers are host-born; the [N, d] corpus is generated
    # ON DEVICE (host gen + upload would ship GBs through the tunnel).
    centers = rng.standard_normal((blobs, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    per = -(-n // blobs)
    nplant = args.planted or k

    row_source = None
    if args.stream:
        # rows are a pure on-device function of their GLOBAL id — the
        # fp32 corpus never exists (not in HBM, not on the host), so
        # corpus size is bounded by the 3 B/elem replicas alone. The
        # permuted replica build below generates rows STRAIGHT INTO
        # cluster order (gen(order[lo:hi])), which no resident-matrix
        # choreography can do without 2x fp32 transients.
        centers_j = jnp.asarray(centers)
        qb = min(blobs, 64)
        gkey = jax.random.PRNGKey(0)

        @jax.jit
        def gen_rows(ids):
            ids = jnp.maximum(ids, 0)
            keys = jax.vmap(lambda i: jax.random.fold_in(gkey, i))(ids)
            noise = jax.vmap(lambda kk: jax.random.normal(kk, (d,)))(keys)
            which = jnp.minimum(ids // per, blobs - 1)
            plant = (ids % per < nplant) & (ids // per < qb)
            sig = jnp.where(plant, 0.01, args.sigma)[:, None]
            rows = jnp.take(centers_j, which, axis=0) + sig * noise
            return rows / jnp.linalg.norm(rows, axis=1, keepdims=True)

        def row_source(ids):
            return gen_rows(jnp.asarray(np.asarray(ids), jnp.int32))

        t0 = time.perf_counter()
        order, cent, radii = prepare_clustered_stream(
            row_source, n, d, tile_n=tile_n, iters=8)
        print(f"clustering(stream): {time.perf_counter()-t0:.1f}s, "
              f"median radius {np.median(radii):.3f}", flush=True)
        m_oracle = m_dev = None
    elif args.host_prep:
        which = np.repeat(np.arange(blobs), per)[:n]
        m = centers[which] + args.sigma * rng.standard_normal((n, d)).astype(np.float32)
        for bi in range(min(blobs, 64)):  # plant only for the queried blobs
            rows = np.flatnonzero(which == bi)[:nplant]
            m[rows] = centers[bi] + 0.01 * rng.standard_normal(
                (len(rows), d)
            ).astype(np.float32)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        m_oracle = m = m.astype(np.float32)

        t0 = time.perf_counter()
        order, cent, radii = prepare_clustered(m, tile_n=tile_n, iters=8)
        print(f"clustering(host): {time.perf_counter()-t0:.1f}s, "
              f"median radius {np.median(radii):.3f}", flush=True)
    else:
        centers_j = jnp.asarray(centers)
        kd, kp = jax.random.split(jax.random.PRNGKey(0))

        @jax.jit
        def gen_corpus(centers_j):
            which = jnp.minimum(jnp.arange(n) // per, blobs - 1)
            m = jnp.take(centers_j, which, axis=0) + args.sigma * jax.random.normal(
                kd, (n, d), jnp.float32)
            # plant near-duplicates of the queried centers as their true
            # top rows (blob bi's rows are contiguous at bi*per)
            qb = min(blobs, 64)
            prow = (jnp.arange(qb)[:, None] * per + jnp.arange(nplant)[None, :]).reshape(-1)
            pval = jnp.repeat(centers_j[:qb], nplant, axis=0) + 0.01 * jax.random.normal(
                kp, (qb * nplant, d), jnp.float32)
            keepmask = prow < n
            prow = jnp.where(keepmask, prow, n - 1)
            pval = jnp.where(keepmask[:, None], pval,
                             m[n - 1] if n else pval)
            m = m.at[prow].set(pval)
            return m / jnp.linalg.norm(m, axis=1, keepdims=True)

        m_dev = jax.block_until_ready(gen_corpus(centers_j))

        t0 = time.perf_counter()
        order, cent, radii = prepare_clustered_device(m_dev, tile_n=tile_n, iters=8)
        print(f"clustering(device): {time.perf_counter()-t0:.1f}s, "
              f"median radius {np.median(radii):.3f}", flush=True)
        m_oracle = m_dev  # oracle runs in ORIGINAL row space, then frees

    valid = jnp.asarray(order >= 0)
    # tiny query perturbation: at 0.02+ the planted-vs-blob-mass score
    # gap compresses below the bf16 threshold channel and certification
    # legitimately fails (the top-k becomes genuinely ambiguous)
    queries = centers[:b].astype(np.float32) + 0.005 * rng.standard_normal(
        (b, d)
    ).astype(np.float32)
    queries = jnp.asarray(queries)

    # -- oracle top-k (once, BEFORE replica prep; fp32 brute force) --------
    # order matters for HBM at 4M×384: the f32 corpus (6.4 GB) must be
    # gone before the replicas (4.8 GB) concatenate, or the two plus
    # the concat transients exceed a v5e's 16 GB.
    rx_sets = None
    if args.check and args.stream:
        # streaming oracle: slab-wise fp32 HIGHEST matmul + running
        # top-k merge — exact brute-force semantics without the matrix
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def merge(cs, cr, rows, base):
            sc = jax.lax.dot_general(
                queries, rows, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
            ids = base + jnp.arange(rows.shape[0], dtype=jnp.int32)
            alls = jnp.concatenate([cs, sc], axis=1)
            allr = jnp.concatenate(
                [cr, jnp.broadcast_to(ids[None, :], sc.shape)], axis=1)
            v, i = jax.lax.top_k(alls, k)
            return v, jnp.take_along_axis(allr, i, axis=1)

        cs = jnp.full((b, k), -jnp.inf, jnp.float32)
        cr = jnp.full((b, k), -1, jnp.int32)
        for lo in range(0, n, 1 << 19):
            cs, cr = merge(cs, cr, row_source(np.arange(lo, min(lo + (1 << 19), n))),
                           jnp.int32(lo))
        rx_sets = [set(row.tolist()) for row in np.asarray(cr)]
    elif args.check:
        from trueno_rag_tpu.ops.dense import dense_topk

        _, rx = dense_topk(queries, jnp.asarray(m_oracle),
                           jnp.ones(n, bool), k, "cosine")
        rx_sets = [set(row.tolist()) for row in np.asarray(rx)]

    # slab-wise PERMUTED replica prep: gather each slab's rows straight
    # from the unpermuted matrix (the full permuted f32 copy never
    # exists; mirrors VectorStore's compact_prep_rows slabbing)
    step = 1 << 19
    slabs = []
    parts = None
    if args.stream:
        # generate rows DIRECTLY in cluster order; holes become zero
        # rows (the valid mask keeps them out of every scan). Slabs are
        # written into preallocated replicas with DONATED update-slices
        # — a final concatenate would hold slabs + output at once
        # (2x the 12 GB replicas: the exact OOM measured at 10.5M).
        @functools.partial(jax.jit, donate_argnums=(0,))
        def set_slab(dest, part, lo):
            return jax.lax.dynamic_update_slice(
                dest, part, (lo,) + (0,) * (dest.ndim - 1))

        for lo in range(0, len(order), step):
            ids = order[lo : lo + step]
            ms = row_source(ids)
            ms = jnp.where(jnp.asarray(ids >= 0)[:, None], ms, 0.0)
            pieces = prepare_tiered(ms) + prepare_residual(ms)
            if parts is None:
                parts = [jnp.zeros((len(order),) + p.shape[1:], p.dtype)
                         for p in pieces]
            parts = [set_slab(dst, p, lo) for dst, p in zip(parts, pieces)]
            del ms, pieces
        jax.block_until_ready(parts)
    elif args.host_prep:
        mp_host = apply_cluster_order(m_oracle if isinstance(m_oracle, np.ndarray)
                                      else np.asarray(m_oracle), order)
        for lo in range(0, len(order), step):
            ms = jnp.asarray(mp_host[lo : lo + step])
            slabs.append(prepare_tiered(ms) + prepare_residual(ms))
        del mp_host
    else:
        for lo in range(0, len(order), step):
            ms = apply_cluster_order_device(m_oracle, order[lo : lo + step])
            slabs.append(prepare_tiered(ms) + prepare_residual(ms))
        jax.block_until_ready(slabs)
    m_oracle = m_dev = None  # free the f32 corpus before the concat
    if parts is None:
        parts = [p[0] if len(p) == 1 else jnp.concatenate(p, axis=0)
                 for p in zip(*slabs)]
    del slabs
    cent_j, radii_j = jnp.asarray(cent), jnp.asarray(radii)
    order_j = jnp.asarray(order)
    jax.block_until_ready(parts)

    # -- certification + oracle check -------------------------------------
    fetches = ("gather", "dma") if args.fetch == "both" else (args.fetch,)
    if args.fetch == "both" and n >= 4_000_000:
        # the gather variant materializes an XLA copy of the probed
        # union (~3x its bytes of program temp — measured +7.0 GB at
        # 10.5M/B=8/probe=16) next to the 11.5 GB replicas: HBM OOM.
        # Production cluster_fetch="auto" resolves to dma on
        # accelerators for exactly this reason; keep only dma here.
        print("n >= 4M: skipping the gather fetch variant (union copy "
              "OOMs HBM next to the replicas; auto->dma in production)",
              flush=True)
        fetches = ("dma",)
    for fetch in fetches:
        s, r, ok, nsc = dense_topk_compact_bf16r_clustered(
            queries, *parts, valid, k, cent_j, radii_j,
            probe_tiles=args.probe, row_map=order_j, tile_n=tile_n,
            return_stats=True, fetch=fetch, interpret=interp,
        )
        ok_np = np.asarray(ok).astype(bool)
        print(f"[{fetch}] certified {int(ok_np.sum())}/{b}, "
              f"scanned {int(nsc)}/{t} tiles", flush=True)
        if rx_sets is not None:
            rn = np.asarray(r)
            bad = [int(i) for i in np.flatnonzero(ok_np)
                   if set(rn[i].tolist()) != rx_sets[i]]
            print(f"[{fetch}] oracle check: {len(bad)} bad certified sets "
                  f"{bad[:5]}", flush=True)

    # -- timing: dependency-chained scan, one scalar out -------------------
    def timed(label, fn, *arrs):
        @functools.partial(jax.jit, static_argnames=("steps",))
        def chain(q0, *rest, steps):
            def one(carry, _):
                qq = q0 + carry
                out = fn(qq, *rest)
                return (jnp.max(out[0]) + jnp.sum(out[2]).astype(jnp.float32)) * 1e-12, None

            c, _ = jax.lax.scan(one, 0.0, None, length=steps)
            return c

        float(chain(*arrs, steps=args.iters))  # compile + warm
        ts = []
        for _ in range(3):
            t1 = time.perf_counter()
            float(chain(*arrs, steps=args.iters))
            ts.append((time.perf_counter() - t1) / args.iters)
        ms = sorted(ts)[1] * 1e3
        print(f"{label}: {ms:.2f} ms/batch ({b/sorted(ts)[1]:.0f} q/s)",
              flush=True)
        return ms

    full = timed(
        "full-scan compact ",
        lambda qq, *a: dense_topk_compact_bf16r(qq, *a, k, tile_n=tile_n,
                                                interpret=interp),
        queries, *parts, valid,
    )
    for fetch in fetches:
        ms = timed(
            f"clustered[{fetch}]",
            lambda qq, *a, _f=fetch: dense_topk_compact_bf16r_clustered(
                qq, *a[:-2], a[-2], k, a[-1][0], a[-1][1],
                probe_tiles=args.probe, tile_n=tile_n, fetch=_f,
                interpret=interp,
            ),
            queries, *parts, valid, (cent_j, radii_j),
        )
        print(f"  speedup vs full scan: {full/ms:.2f}x", flush=True)

    if args.hybrid:
        # full hybrid in the LATENCY regime: clustered dense candidates
        # + BM25 block scoring + RRF + final top-k, one fused program.
        # The BM25 query slots get the same carry-dependence the dense
        # queries do (CLAUDE.md: every stage input must depend on the
        # loop carry or XLA hoists the stage out of the scan).
        from trueno_rag_tpu.ops.bm25 import bm25_topk_blocks
        from trueno_rag_tpu.ops.fusion import fuse_topk

        fetch = fetches[-1]  # dma on accelerators (resolve order: both→dma)

        def hybrid_fn(qq, carry, bids, blo, bhi, blocks, *a):
            shift = (carry > 1e30).astype(jnp.int32)
            d_s, d_r, ok = dense_topk_compact_bf16r_clustered(
                qq, *a[:-2], a[-2], k, a[-1][0], a[-1][1],
                probe_tiles=args.probe, tile_n=tile_n, fetch=fetch,
                interpret=interp,
            )
            s_s, s_r = bm25_topk_blocks(bids + shift, blo, bhi, blocks, k=k)
            f_r, f_s = fuse_topk(d_r, d_s, s_r, s_s, kind="rrf", param=60.0)
            top = jax.lax.top_k(f_s, min(args.topk, f_s.shape[1]))[0]
            return top, ok

        @functools.partial(jax.jit, static_argnames=("steps",))
        def hchain(q0, bids, blo, bhi, blocks, *rest, steps):
            def one(carry, _):
                top, ok = hybrid_fn(q0 + carry, carry, bids, blo, bhi,
                                    blocks, *rest)
                return (jnp.max(top) + jnp.sum(ok).astype(jnp.float32)) * 1e-12, None

            c, _ = jax.lax.scan(one, 0.0, None, length=steps)
            return c

        arrs = (queries, *sparse[:3], sparse[3], *parts, valid, (cent_j, radii_j))
        float(hchain(*arrs, steps=args.iters))  # compile + warm
        ts = []
        for _ in range(3):
            t1 = time.perf_counter()
            float(hchain(*arrs, steps=args.iters))
            ts.append((time.perf_counter() - t1) / args.iters)
        ms = sorted(ts)[1] * 1e3
        print(f"hybrid-clustered[{fetch}]: {ms:.2f} ms/batch "
              f"({b/sorted(ts)[1]:.0f} q/s)", flush=True)


if __name__ == "__main__":
    main()
