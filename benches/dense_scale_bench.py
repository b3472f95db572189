"""Dense-path A/B at corpus scale: fp32 blockwise vs bf16 tier vs int8
tier, WITHOUT the BM25 stage.

The full tiered_bench at 1M rows ships ~GBs of host-built BM25 arrays
over the dev tunnel (~2 MB/s) and has broken the remote-compile
transport; the dense-path decision doesn't need BM25, so here EVERYTHING
is generated on device (no bulk host→device transfer) and each variant
compiles a minimal chain.

Run: PYTHONPATH=.:$PYTHONPATH python benches/dense_scale_bench.py \
       [--n 1000000] [--batch 256] [--kinds fp32,tiered,int8,int8bf16]
"""

from __future__ import annotations

import argparse
import functools
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--d", type=int, default=384)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--cand", type=int, default=50)
    p.add_argument("--kinds", default="fp32,tiered,int8,int8bf16")
    p.add_argument("--check", action="store_true", help="exactness spot check first")
    p.add_argument("--rescore-rows", type=int, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from trueno_rag_tpu.ops.dense import dense_topk
    from trueno_rag_tpu.ops.dense_tiered import (
        dense_topk_int8,
        dense_topk_tiered,
        prepare_int8,
        prepare_tiered,
    )

    n, d, b, cand = args.n, args.d, args.batch, args.cand
    key1, key2 = jax.random.split(jax.random.PRNGKey(0))
    matrix = jax.random.normal(key1, (n, d), dtype=jnp.float32)
    matrix = matrix / jnp.linalg.norm(matrix, axis=1, keepdims=True)
    valid = jnp.ones((n,), bool)
    queries = jax.random.normal(key2, (b, d), dtype=jnp.float32)
    m_bf16, e_l2, a_l2 = prepare_tiered(matrix)
    m_i8, s_row, e8, a8 = prepare_int8(matrix)
    jax.block_until_ready(m_i8)
    print(f"N={n:,} d={d} B={b} cand={cand}")

    if args.check:
        s_t, r_t, ok = dense_topk_tiered(queries, matrix, m_bf16, e_l2, a_l2, valid, cand)
        s_8, r_8, ok8 = dense_topk_int8(queries, matrix, m_i8, s_row, e8, a8, valid, cand)
        s_x, r_x = dense_topk(queries, matrix, valid, cand, "cosine")
        print(f"bf16 certified={int(np.asarray(ok).sum())}/{b} rows_equal="
              f"{bool(np.array_equal(np.asarray(r_t), np.asarray(r_x)))} | "
              f"int8 certified={int(np.asarray(ok8).sum())}/{b} rows_equal="
              f"{bool(np.array_equal(np.asarray(r_8), np.asarray(r_x)))}")

    # NB: arrays are ARGUMENTS, not closures — closed-over device arrays
    # bake into the jaxpr as constants and the remote-compile tunnel has
    # to ship the whole corpus with the program (GBs at 1M rows; this is
    # what previously "broke" the 1M A/B).
    @functools.partial(jax.jit, static_argnames=("steps", "kind"))
    def chain(queries, matrix, m_bf16, e_l2, a_l2, m_i8, s_row, e8, a8, valid,
              steps, kind):
        def one(carry, _):
            q = queries + carry  # keep the stage dependent on the carry
            if kind == "tiered":
                s, r, _ = dense_topk_tiered(
                    q, matrix, m_bf16, e_l2, a_l2, valid, cand,
                    rescore_rows=args.rescore_rows,
                )
            elif kind == "int8":
                s, r, _ = dense_topk_int8(
                    q, matrix, m_i8, s_row, e8, a8, valid, cand,
                    rescore_rows=args.rescore_rows,
                )
            elif kind == "int8bf16":
                s, r, _ = dense_topk_int8(
                    q, matrix, m_i8, s_row, e8, a8, valid, cand,
                    use_int8_mxu=False, rescore_rows=args.rescore_rows,
                )
            else:
                s, r = dense_topk(q, matrix, valid, cand, "cosine")
            return jnp.max(s) * 1e-12, None

        c, _ = jax.lax.scan(one, 0.0, None, length=steps)
        return c

    arrs = (queries, matrix, m_bf16, e_l2, a_l2, m_i8, s_row, e8, a8, valid)
    for kind in args.kinds.split(","):
        try:
            float(chain(*arrs, 1, kind))  # compile
            float(chain(*arrs, args.iters, kind))  # warm
            t0 = time.perf_counter()
            float(chain(*arrs, args.iters, kind))
            dt = (time.perf_counter() - t0) / args.iters
            print(f"dense[{kind:8s}]: {dt*1e3:8.3f} ms/step → {b/dt:12,.0f} q/s")
        except Exception as e:  # noqa: BLE001 — report per-kind failures
            print(f"dense[{kind:8s}]: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
