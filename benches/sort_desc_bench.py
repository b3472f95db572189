"""A/B: deterministic (score desc, row asc) ordering strategies for the
fusion tail at candidate widths (~[256, 100]).

CLAUDE.md lore says multi-key lax.sort is pathologically slow on TPU;
fusion's _sort_desc is the one remaining 2-key sort in the hybrid hot
path. Candidates:

  multikey   — current: lax.sort((negscore, rows, rows, scores), num_keys=2)
  stable2    — sort rows asc (1-key), then STABLE 1-key sort by negscore
  presort_topk — sort rows asc (1-key), then lax.top_k over the full
               width (top_k's lower-index tie preference = row asc)

(An int64 composite-key variant is impossible: the framework runs with
x64 disabled.) All variants produce identical output by construction (asserted first).

Run: PYTHONPATH=.:$PYTHONPATH python benches/sort_desc_bench.py
"""

from __future__ import annotations

import argparse
import functools
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--width", type=int, default=100)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    NEG_INF = float("-inf")
    b, w = args.batch, args.width

    def multikey(rows, scores):
        key1 = jnp.where(jnp.isneginf(scores), jnp.inf, -scores)
        _, _, rows_s, scores_s = jax.lax.sort((key1, rows, rows, scores), num_keys=2)
        rows_s = jnp.where(jnp.isneginf(scores_s), -1, rows_s)
        return rows_s, scores_s

    def stable2(rows, scores):
        rows_a, scores_a = jax.lax.sort((rows, scores), num_keys=1)
        key1 = jnp.where(jnp.isneginf(scores_a), jnp.inf, -scores_a)
        _, rows_s, scores_s = jax.lax.sort(
            (key1, rows_a, scores_a), num_keys=1, is_stable=True
        )
        rows_s = jnp.where(jnp.isneginf(scores_s), -1, rows_s)
        return rows_s, scores_s

    def presort_topk(rows, scores):
        rows_a, scores_a = jax.lax.sort((rows, scores), num_keys=1)
        scores_s, idx = jax.lax.top_k(scores_a, scores_a.shape[-1])
        rows_s = jnp.take_along_axis(rows_a, idx, axis=-1)
        rows_s = jnp.where(jnp.isneginf(scores_s), -1, rows_s)
        return rows_s, scores_s

    fns = {"multikey": multikey, "stable2": stable2,
           "presort_topk": presort_topk}

    rng = np.random.default_rng(0)
    scores = rng.standard_normal((b, w)).astype(np.float32)
    scores[:, 1::2] = scores[:, ::2]  # inject exact ties
    scores[:, -5:] = NEG_INF
    rows = rng.integers(0, 1 << 22, size=(b, w)).astype(np.int32)
    rows[:, -5:] = rng.integers(0, 1 << 22, size=(b, 5))
    sj, rj = jnp.asarray(scores), jnp.asarray(rows)

    ref = None
    for name, fn in fns.items():
        r, s = jax.jit(fn)(rj, sj)
        out = (np.asarray(r), np.asarray(s))
        if ref is None:
            ref = out
        else:
            np.testing.assert_array_equal(out[0], ref[0], err_msg=name)
            np.testing.assert_array_equal(out[1], ref[1], err_msg=name)
    print(f"[{b}x{w}] all variants identical; timing…")

    for name, fn in fns.items():
        @functools.partial(jax.jit, static_argnames=("steps",))
        def chain(steps, fn=fn):
            def one(c, _):
                r, s = fn(rj, sj + c)
                return jnp.max(s) * 1e-12 + c * 0.5, None
            c, _ = jax.lax.scan(one, 0.0, None, length=steps)
            return c

        float(chain(args.iters))
        t0 = time.perf_counter()
        float(chain(args.iters))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"sort[{name:12s}]: {dt*1e6:9.1f} us/step")


if __name__ == "__main__":
    main()
