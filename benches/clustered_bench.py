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
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from trueno_rag_tpu.ops.clustered import (
        apply_cluster_order,
        dense_topk_compact_bf16r_clustered,
        prepare_clustered,
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

    print(f"N={n:,} d={d} B={b} blobs={blobs} tiles={t} "
          f"probe={args.probe} k={k}", flush=True)

    # -- corpus: blobs + planted relevant rows (host; build-time) ---------
    centers = rng.standard_normal((blobs, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # balanced blobs (each fits one tile) — the structure the pruning
    # bound needs; k-means recovers them as pure tiles
    which = np.repeat(np.arange(blobs), -(-n // blobs))[:n]
    m = centers[which] + args.sigma * rng.standard_normal((n, d)).astype(np.float32)
    for bi in range(min(blobs, 64)):  # plant only for the queried blobs
        rows = np.flatnonzero(which == bi)[: (args.planted or k)]
        m[rows] = centers[bi] + 0.01 * rng.standard_normal(
            (len(rows), d)
        ).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    m = m.astype(np.float32)

    t0 = time.perf_counter()
    order, cent, radii = prepare_clustered(m, tile_n=tile_n, iters=8)
    print(f"clustering: {time.perf_counter()-t0:.1f}s, "
          f"median radius {np.median(radii):.3f}", flush=True)

    mp = apply_cluster_order(m, order).astype(np.float32)
    parts = prepare_tiered(jnp.asarray(mp)) + prepare_residual(jnp.asarray(mp))
    parts = [jax.device_put(x) for x in parts]
    valid = jnp.asarray(order >= 0)
    cent_j, radii_j = jnp.asarray(cent), jnp.asarray(radii)
    order_j = jnp.asarray(order)
    # tiny query perturbation: at 0.02+ the planted-vs-blob-mass score
    # gap compresses below the bf16 threshold channel and certification
    # legitimately fails (the top-k becomes genuinely ambiguous)
    queries = centers[:b].astype(np.float32) + 0.005 * rng.standard_normal(
        (b, d)
    ).astype(np.float32)
    queries = jnp.asarray(queries)
    jax.block_until_ready(parts)

    # -- certification + oracle check -------------------------------------
    for fetch in ("gather", "dma"):
        s, r, ok, nsc = dense_topk_compact_bf16r_clustered(
            queries, *parts, valid, k, cent_j, radii_j,
            probe_tiles=args.probe, row_map=order_j, tile_n=tile_n,
            return_stats=True, fetch=fetch, interpret=interp,
        )
        ok_np = np.asarray(ok).astype(bool)
        print(f"[{fetch}] certified {int(ok_np.sum())}/{b}, "
              f"scanned {int(nsc)}/{t} tiles", flush=True)
        if args.check:
            from trueno_rag_tpu.ops.dense import dense_topk

            sx, rx = dense_topk(queries, jnp.asarray(m), jnp.ones(n, bool),
                                k, "cosine")
            rn, rxn = np.asarray(r), np.asarray(rx)
            bad = [int(i) for i in np.flatnonzero(ok_np)
                   if set(rn[i].tolist()) != set(rxn[i].tolist())]
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
    for fetch in ("gather", "dma"):
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


if __name__ == "__main__":
    main()
