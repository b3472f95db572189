"""Stage apportionment for the tiered dense path: where do the
milliseconds go at a given corpus size?

Chains (bench.py methodology — every stage input depends on the carry,
one scalar materialized):

  scan    — the Pallas scan_select kernel alone (outputs reduced to a
            scalar so nothing large is fetched)
  tail    — select+rescore+verify alone, fed by PRECOMPUTED kernel
            outputs (shifted by a carry-derived zero so XLA cannot
            hoist it)
  tiered  — the full dense_topk_tiered
  fp32    — the exact dense_topk baseline

Run: PYTHONPATH=.:$PYTHONPATH python -u benches/tiered_profile.py \
       [--n 100000] [--batch 256] [--cand 50] [--rescore-rows 192]
"""

from __future__ import annotations

import argparse
import functools
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--d", type=int, default=384)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--cand", type=int, default=50)
    p.add_argument("--rescore-rows", type=int, default=None)
    p.add_argument("--stages", default="fp32,scan,tail,tiered")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from trueno_rag_tpu.ops import dense_tiered as dt
    from trueno_rag_tpu.ops.dense import dense_topk
    from trueno_rag_tpu.ops.pallas.scan_select import scan_select

    n, d, b, cand = args.n, args.d, args.batch, args.cand
    key1, key2 = jax.random.split(jax.random.PRNGKey(0))
    matrix = jax.random.normal(key1, (n, d), dtype=jnp.float32)
    matrix = matrix / jnp.linalg.norm(matrix, axis=1, keepdims=True)
    valid = jnp.ones((n,), bool)
    queries = jax.random.normal(key2, (b, d), dtype=jnp.float32)
    m_bf16, e_l2, a_l2 = dt.prepare_tiered(matrix)
    jax.block_until_ready(m_bf16)

    # fixed kernel-input shapes (mirror dense_topk_tiered's padding)
    tile = 1024
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        m_pad = jnp.pad(m_bf16, ((0, n_pad - n), (0, 0)))
        e_pad = jnp.pad(e_l2, (0, n_pad - n))
        a_pad = jnp.pad(a_l2, (0, n_pad - n))
        v_pad = jnp.pad(valid, (0, n_pad - n), constant_values=False)
    else:
        m_pad, e_pad, a_pad, v_pad = m_bf16, e_l2, a_l2, valid

    qn = jnp.linalg.norm(queries, axis=-1, keepdims=True)
    qf = queries / jnp.where(qn == 0.0, 1.0, qn)
    qb0 = qf.astype(jnp.bfloat16)
    f0 = qf - jax.lax.optimization_barrier(qb0).astype(jnp.float32)
    b_l2 = jnp.linalg.norm(jax.lax.optimization_barrier(qb0).astype(jnp.float32), axis=1)
    f_l2 = jnp.linalg.norm(f0, axis=1)
    u0 = (b_l2 + f_l2) * 1.0001 + 1e-7
    v0 = (f_l2 + d * 2.0**-23 * b_l2) * 1.0001 + 1e-7
    outs0 = scan_select(qb0, m_pad, e_pad, a_pad, v_pad.astype(jnp.int32), u0, v0)
    outs0 = jax.block_until_ready(outs0)

    @functools.partial(jax.jit, static_argnames=("steps", "stage"))
    def chain(steps, stage):
        def one(carry, _):
            shift = (carry > 1e30).astype(jnp.float32)  # always 0, opaque
            ishift = shift.astype(jnp.int32)
            q = queries + carry
            if stage == "fp32":
                s, _ = dense_topk(q, matrix, valid, cand, "cosine")
                out = jnp.max(s)
            elif stage == "scan":
                outs = scan_select(
                    qb0 + shift.astype(jnp.bfloat16), m_pad, e_pad, a_pad,
                    v_pad.astype(jnp.int32), u0, v0,
                )
                out = jnp.max(outs[0])
            elif stage == "tail":
                outs = tuple(o + shift if o.dtype == jnp.float32 else o + ishift
                             for o in outs0)
                s, _, ok = dt._select_rescore_verify(
                    outs, qf, matrix, valid, n, n_pad, b, b, cand, 64,
                    rescore_rows=args.rescore_rows,
                )
                out = jnp.max(s) + jnp.sum(ok)
            else:  # tiered
                s, _, ok = dt.dense_topk_tiered(
                    q, matrix, m_bf16, e_l2, a_l2, valid, cand,
                    rescore_rows=args.rescore_rows,
                )
                out = jnp.max(s) + jnp.sum(ok)
            return out * 1e-12, None

        c, _ = jax.lax.scan(one, 0.0, None, length=steps)
        return c

    print(f"N={n:,} d={d} B={b} cand={cand} rescore_rows={args.rescore_rows}")
    for stage in args.stages.split(","):
        float(chain(args.iters, stage))  # compile + warm
        t0 = time.perf_counter()
        float(chain(args.iters, stage))
        dt_s = (time.perf_counter() - t0) / args.iters
        print(f"{stage:7s}: {dt_s*1e3:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
