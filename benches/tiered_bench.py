"""End-to-end A/B: hybrid query chain with the fp32 dense path vs the
tiered (bf16 scan + verified rescore) dense path.

Per-op micro-benchmarks on the tunneled device carry a ~1.2 ms fixed
per-scan-step cost around matmuls, so stages must be compared INSIDE
the full fused program (bench.py methodology) where that cost
amortizes across the whole step.

Run: PYTHONPATH=.:$PYTHONPATH python benches/tiered_bench.py [--n 100000]
"""

from __future__ import annotations

import argparse
import functools
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--cand", type=int, default=50)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--skip-check", action="store_true")
    p.add_argument("--rescore-rows", type=int, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_synthetic_bm25, make_query_blocks
    from trueno_rag_tpu.ops.bm25 import bm25_topk_blocks
    from trueno_rag_tpu.ops.dense import dense_topk
    from trueno_rag_tpu.ops.dense_tiered import (
        dense_topk_int8,
        dense_topk_tiered,
        dense_topk_tiered2,
        prepare_int8,
        prepare_tiered,
    )
    from trueno_rag_tpu.ops.fusion import fuse_topk

    n, b, cand, k = args.n, args.batch, args.cand, args.k
    key1, key2 = jax.random.split(jax.random.PRNGKey(0))
    matrix = jax.random.normal(key1, (n, 384), dtype=jnp.float32)
    matrix = matrix / jnp.linalg.norm(matrix, axis=1, keepdims=True)
    valid = jnp.ones((n,), bool)
    queries = jax.random.normal(key2, (b, 384), dtype=jnp.float32)
    snap = build_synthetic_bm25(n, vocab=50_000, avg_len=64)
    bids, blo, bhi, blocks = make_query_blocks(snap, b, terms_per_query=6)
    bids, blo, bhi = jnp.asarray(bids), jnp.asarray(blo), jnp.asarray(bhi)
    m_bf16, e_l2, a_l2 = prepare_tiered(matrix)
    m_i8, s_row, e8_l2, a8_l2 = prepare_int8(matrix)
    jax.block_until_ready(m_bf16)
    jax.block_until_ready(m_i8)

    if not args.skip_check:  # exactness spot check on this corpus
        s_t, r_t, ok = dense_topk_tiered(
            queries, matrix, m_bf16, e_l2, a_l2, valid, cand,
            rescore_rows=args.rescore_rows,
        )
        s_8, r_8, ok8 = dense_topk_int8(
            queries, matrix, m_i8, s_row, e8_l2, a8_l2, valid, cand,
            rescore_rows=args.rescore_rows,
        )
        s_x, r_x = dense_topk(queries, matrix, valid, cand, "cosine")
        s_2, r_2, ok2 = dense_topk_tiered2(
            queries, matrix, m_bf16, e_l2, a_l2, valid, cand,
            rescore_rows=args.rescore_rows or 96,
        )
        ok2m = np.asarray(ok2).astype(bool)
        print(f"N={n:,}: bf16 certified={int(np.asarray(ok).sum())}/{b} rows_equal="
              f"{bool(np.array_equal(np.asarray(r_t), np.asarray(r_x)))} | "
              f"int8 certified={int(np.asarray(ok8).sum())}/{b} rows_equal="
              f"{bool(np.array_equal(np.asarray(r_8), np.asarray(r_x)))} | "
              f"tile(v2) certified={int(ok2m.sum())}/{b} certified_rows_equal="
              f"{bool(np.array_equal(np.asarray(r_2)[ok2m], np.asarray(r_x)[ok2m]))}")

    # arrays as arguments, not closures: closed-over device arrays bake
    # into the jaxpr as constants and remote compile ships the corpus
    @functools.partial(jax.jit, static_argnames=("steps", "dense_kind"))
    def hybrid_chain(queries, matrix, m_bf16, e_l2, a_l2, m_i8, s_row,
                     e8_l2, a8_l2, valid, bids, blo, bhi, blocks,
                     steps, dense_kind):
        def one(carry, _):
            q = queries + carry
            shift = (carry > 1e30).astype(jnp.int32)
            if dense_kind == "tiered2":
                d_s, d_r, ok = dense_topk_tiered2(
                    q, matrix, m_bf16, e_l2, a_l2, valid, cand,
                    rescore_rows=args.rescore_rows or 96,
                )
            elif dense_kind == "tiered":
                d_s, d_r, ok = dense_topk_tiered(
                    q, matrix, m_bf16, e_l2, a_l2, valid, cand,
                    rescore_rows=args.rescore_rows,
                )
            elif dense_kind == "int8":
                d_s, d_r, ok = dense_topk_int8(
                    q, matrix, m_i8, s_row, e8_l2, a8_l2, valid, cand,
                    rescore_rows=args.rescore_rows,
                )
            elif dense_kind == "int8bf16":
                d_s, d_r, ok = dense_topk_int8(
                    q, matrix, m_i8, s_row, e8_l2, a8_l2, valid, cand,
                    use_int8_mxu=False, rescore_rows=args.rescore_rows,
                )
            else:
                d_s, d_r = dense_topk(q, matrix, valid, cand, "cosine")
            s_s, s_r = bm25_topk_blocks(bids + shift, blo, bhi, blocks, k=cand)
            f_r, f_s = fuse_topk(d_r, d_s, s_r, s_s, kind="rrf", param=60.0)
            top = jax.lax.top_k(f_s, k)[0]
            return jnp.max(top) * 1e-12, None

        c, _ = jax.lax.scan(one, 0.0, None, length=steps)
        return c

    import os
    kinds = os.environ.get("TB_KINDS", "fp32,tiered,tiered2").split(",")
    arrs = (queries, matrix, m_bf16, e_l2, a_l2, m_i8, s_row, e8_l2, a8_l2,
            valid, bids, blo, bhi, blocks)
    for kind in kinds:
        float(hybrid_chain(*arrs, args.iters, kind))  # compile + warm
        t0 = time.perf_counter()
        float(hybrid_chain(*arrs, args.iters, kind))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"hybrid[{kind:6s}]: {dt*1e3:7.3f} ms/step → {b/dt:10,.0f} q/s")


if __name__ == "__main__":
    main()
