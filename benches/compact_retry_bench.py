"""Measure the widened device retry on uncertified compact queries at
10.5M (the r3 answer to the 10M worst-case gap): primary pass with the
production config, then the retry config on the failures, reporting
certified counts before/after, the retry's cost, and the recorded
error bound for anything still uncertified.

Run: PYTHONPATH=.:$PYTHONPATH python -u benches/compact_retry_bench.py \
    [--n 10485760]
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
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from trueno_rag_tpu.ops.dense_tiered import (
        dense_topk_compact_bf16r,
        prepare_residual,
        prepare_tiered,
    )

    n, d, b, k = args.n, args.d, args.batch, args.k

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
    print(f"N={n:,} bf16r replicas built in {time.perf_counter()-t0:.1f}s",
          flush=True)
    valid = jnp.ones((n,), bool)
    queries = jax.random.normal(jax.random.PRNGKey(777), (b, d), jnp.float32)

    # -- primary pass: the production config -------------------------------
    t0 = time.perf_counter()
    s1, r1, ok1 = dense_topk_compact_bf16r(
        queries, *parts, valid, k, tile_n=4096, rescore_rows=96,
        t_top=4, margin_tiles=32,
    )
    ok1_np = np.asarray(ok1)
    t_primary = time.perf_counter() - t0
    print(f"primary: {int(ok1_np.sum())}/{b} certified "
          f"({t_primary:.1f}s incl. compile)", flush=True)

    # -- widened retry on the failures (VectorStore._compact_device_retry's
    # -- exact parameters) --------------------------------------------------
    bad = np.flatnonzero(~ok1_np)
    if len(bad) == 0:
        print("nothing to retry")
        return
    bpad = 8
    while bpad < len(bad):
        bpad *= 2
    q_bad = np.zeros((bpad, d), np.float32)
    q_bad[: len(bad)] = np.asarray(queries)[bad]
    t0 = time.perf_counter()
    s2, r2, ok2, err2, rhs2 = dense_topk_compact_bf16r(
        jnp.asarray(q_bad), *parts, valid, k, tile_n=4096,
        rescore_rows=None, t_top=8, margin_tiles=128, return_bounds=True,
    )
    ok2_np = np.asarray(ok2)[: len(bad)]
    t_retry = time.perf_counter() - t0
    print(f"retry:   {int(ok2_np.sum())}/{len(bad)} of the failures "
          f"certified ({t_retry:.1f}s incl. compile; retry batch {bpad})",
          flush=True)
    total = int(ok1_np.sum()) + int(ok2_np.sum())
    print(f"total:   {total}/{b} certified after retry", flush=True)
    still = ~ok2_np
    if still.any():
        s2n = np.asarray(s2)[: len(bad)]
        e2n = np.asarray(err2)[: len(bad)]
        rhs = np.asarray(rhs2)[: len(bad)]
        sel_lower = np.where(np.isneginf(s2n), np.inf, s2n - e2n).min(axis=1)
        bound = np.maximum(rhs - sel_lower, 0.0)[still]
        finite = bound[np.isfinite(bound)]
        print(f"still uncertified: {int(still.sum())}; recorded worst-case "
              f"score-error bounds: max={bound.max():.3e} "
              f"median={np.median(finite) if len(finite) else float('nan'):.3e} "
              f"(inf count {int(np.isinf(bound).sum())})", flush=True)

    # -- retry steady-state cost (chained scan, no compile) ----------------
    @functools.partial(jax.jit, static_argnames=("steps",))
    def chain(q, *rest, steps):
        *mats, valid = rest

        def one(carry, _):
            s, r, ok = dense_topk_compact_bf16r(
                q + carry, *mats, valid, k, tile_n=4096,
                rescore_rows=None, t_top=8, margin_tiles=128,
            )
            return (jnp.max(s) + jnp.sum(ok).astype(jnp.float32)) * 1e-12, None

        c, _ = jax.lax.scan(one, 0.0, None, length=steps)
        return c

    arrs = (jnp.asarray(q_bad), *parts, valid)
    float(chain(*arrs, steps=1))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(*arrs, steps=3))
        ts.append((time.perf_counter() - t0) / 3)
    print(f"retry scan steady-state: {min(ts)*1e3:.1f} ms per "
          f"{bpad}-query retry batch", flush=True)


if __name__ == "__main__":
    main()
