"""bf16rr exploration probe (r4 verdict #8 — with a kill criterion).

Question: does the two-level-residual compact layout
(`ops/dense_tiered.dense_topk_compact_bf16rr`, 4 B/element) buy enough
DEVICE certification over bf16r (3 B/element) to matter, at what
throughput cost? The scan is byte-identical (same bf16 stream + tile
bounds); only the candidate rescore adds the second int8 correction
dot, so the expected cost is ~0 and the expected gain is the rescore
interval: ~2.2e-5 → ~1.5e-6 (≈15x), i.e. near-tie certification
failures should drop roughly in proportion to the interval width.

Method: 4M×384 corpus (fits both layouts' replicas simultaneously —
they SHARE the bf16/e/a/r1/s1/e2 arrays; rr adds r2/s2/e3, total
~6.1 GB), INTERLEAVED A/B chains (CLAUDE.md: the pool drifts >2x
within a session; sequenced comparisons confound variant with pool
mood), certified_frac from a single uncached pass each.

Kill criterion (recorded either way, like int8-scan was): bf16rr is
DEAD unless uncertified_rr <= 0.5 * uncertified_r at <= 15% slowdown.

Run: PYTHONPATH=.:$PYTHONPATH python -u benches/bf16rr_probe.py [--n 4194304]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time


def _note(msg):
    print(f"[bf16rr {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def probe(n=4 * 1_048_576, dim=384, batch=256, iters=8, repeats=4):

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import interleaved
    from trueno_rag_tpu.ops.dense_tiered import (
        dense_topk_compact_bf16r,
        dense_topk_compact_bf16rr,
        prepare_residual2,
        prepare_tiered,
    )

    slab = 1 << 19

    # ONE jitted program per slab (gen + both residual preps + all 9
    # donated updates): the eager per-op form dispatched ~30 remote
    # ops/slab and the pool's allocator churn left the subsequent scan
    # RESOURCE_EXHAUSTED at the 8M capacity edge even though XLA's own
    # memory analysis says the scan needs only ~48 MB of temp next to
    # the 12.19 GiB replicas (measured r5; the fused build fits).
    @functools.partial(jax.jit, donate_argnums=tuple(range(9)))
    def build_slab(*state):
        *parts, lo = state
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            jax.random.PRNGKey(0), lo + jnp.arange(slab, dtype=jnp.uint32))
        s = jax.vmap(lambda kk: jax.random.normal(kk, (dim,), jnp.float32))(keys)
        s = s / jnp.linalg.norm(s, axis=1, keepdims=True)
        pieces = prepare_tiered(s) + prepare_residual2(s)
        lo32 = lo.astype(jnp.int32)
        return tuple(
            jax.lax.dynamic_update_slice(
                d, p, (lo32,) + (jnp.int32(0),) * (d.ndim - 1))
            for d, p in zip(parts, pieces)
        )

    parts = [
        jnp.zeros((n, dim), jnp.bfloat16), jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n, dim), jnp.int8), jnp.ones((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n, dim), jnp.int8), jnp.ones((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    ]
    t0 = time.perf_counter()
    for lo in range(0, n, slab):
        parts = list(build_slab(*parts, jnp.uint32(lo)))
    jax.block_until_ready(parts)
    _note(f"replicas built in {time.perf_counter() - t0:.1f}s "
          f"({sum(a.size * a.dtype.itemsize for a in parts) / 2**30:.2f} GiB)")
    valid = jnp.ones((n,), bool)
    q = jax.random.normal(jax.random.PRNGKey(7), (batch, dim), jnp.float32)

    tier_r = tuple(parts[:6])
    tier_rr = tuple(parts)

    # certification (single uncached pass each). The blocking fetch
    # BETWEEN passes is load-bearing at the capacity edge: dispatch is
    # async, so without it both scan programs' HBM temps co-allocate
    # next to the 12.2 GiB replicas — measured RESOURCE_EXHAUSTED at 8M
    # where each pass alone fits.
    _, _, ok_r = dense_topk_compact_bf16r(q, *tier_r, valid, 10, tile_n=4096)
    unc_r = int((~np.asarray(ok_r)).sum())
    _, _, ok_rr = dense_topk_compact_bf16rr(q, *tier_rr, valid, 10, tile_n=4096)
    unc_rr = int((~np.asarray(ok_rr)).sum())
    _note(f"uncertified: bf16r {unc_r}/{batch}  bf16rr {unc_rr}/{batch}")

    def chain_of(fn, tier):
        @functools.partial(jax.jit, static_argnames=("steps",))
        def chain(q, *rest, steps):
            *mats, valid = rest

            def one(carry, _):
                s, r, ok = fn(q + carry, *mats, valid, 10, tile_n=4096)
                return (jnp.max(s) + jnp.sum(ok).astype(jnp.float32)) * 1e-12, None

            c, _ = jax.lax.scan(one, 0.0, None, length=steps)
            return c

        arrs = (q, *tier, valid)
        float(chain(*arrs, steps=1))
        float(chain(*arrs, steps=iters))

        def run():
            t0 = time.perf_counter()
            float(chain(*arrs, steps=iters))
            return time.perf_counter() - t0

        return run

    _note("compiling both chains")
    runs = {"bf16r": chain_of(dense_topk_compact_bf16r, tier_r),
            "bf16rr": chain_of(dense_topk_compact_bf16rr, tier_rr)}
    meds, per_round = interleaved(runs, repeats=repeats)
    ms_r = float(meds["bf16r"]) / iters * 1e3
    ms_rr = float(meds["bf16rr"]) / iters * 1e3
    # paired per-round ratios — the interleave-sound comparison
    ratios = [b / a for a, b in zip(per_round["bf16r"], per_round["bf16rr"])]
    slowdown = sorted(ratios)[len(ratios) // 2]
    win = unc_rr <= 0.5 * unc_r and slowdown <= 1.15
    out = {
        "n": n, "batch": batch,
        "uncertified_bf16r": unc_r, "uncertified_bf16rr": unc_rr,
        "ms_per_batch_bf16r": round(ms_r, 2),
        "ms_per_batch_bf16rr": round(ms_rr, 2),
        "paired_slowdown_median": round(slowdown, 4),
        "per_round_s": {k: [round(v, 3) for v in vs]
                        for k, vs in per_round.items()},
        "verdict": "WIN" if win else "DEAD",
    }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=4 * 1_048_576)
    p.add_argument("--dim", type=int, default=384)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--repeats", type=int, default=4)
    args = p.parse_args()
    print(json.dumps(probe(args.n, args.dim, args.batch, args.iters,
                           args.repeats)))


if __name__ == "__main__":
    main()
