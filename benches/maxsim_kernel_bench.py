"""Isolate the fused MaxSim bound-pass kernel and sweep its corpus
tile size: is the 1M fused tier (29 ms end-to-end, ~263 GB/s effective
2026-08-19) kernel-bound, and does the VMEM footprint at tile_n=256
(~12 MiB with two lane-padded sims copies) prevent the grid pipeline
from double-buffering the 2 MiB token blocks?

Times ONLY ``maxsim_scan16_scores`` / ``maxsim_scan_int8_scores`` (the
[B, N] bound pass — no selection, no rescore) with the chained-scan
methodology (CLAUDE.md). Reports ms/batch and the marginal HBM rate of
the replica stream; the device's measured single-vector streaming rate
is ~540 GB/s (k_mm), speed-of-light ~819 GB/s.

Run: PYTHONPATH=.:$PYTHONPATH python benches/maxsim_kernel_bench.py \
    [--n 1000000] [--tiles 0,128,256] [--int8]
"""

from __future__ import annotations

import argparse
import functools
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--lt", type=int, default=32)
    p.add_argument("--h", type=int, default=128)
    p.add_argument("--b", type=int, default=8)
    p.add_argument("--lq", type=int, default=8)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--tiles", default="0,128,256")
    p.add_argument("--v2", action="store_true",
                   help="time the v2 kernels instead: [B·Lq, tile·Lt] "
                        "orientation, bias-add mask, l-major slice max "
                        "(self: in-kernel transpose of primary layout)")
    p.add_argument("--groups", default="256",
                   help="v2 group sizes to sweep")
    p.add_argument("--int8", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        from trueno_rag_tpu.utils.preflight import force_cpu

        force_cpu()
    else:
        from trueno_rag_tpu.utils.preflight import force_cpu, tpu_preflight

        if not tpu_preflight():
            print("TPU preflight failed; falling back to CPU", flush=True)
            force_cpu()

    import jax
    import jax.numpy as jnp

    from trueno_rag_tpu.ops.pallas.maxsim_scan import (
        maxsim_scan16_scores,
        maxsim_scan_int8_scores,
    )

    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind}", flush=True)
    n, lt, h, b, lq = args.n, args.lt, args.h, args.b, args.lq

    # slab-generated bf16 corpus (the maxsim_bench pattern: an f32
    # intermediate at 1M x 32 x 128 is 16 GiB — over HBM)
    slab = 131_072

    @functools.partial(jax.jit, static_argnames=("rows",))
    def gen_tokens(key, rows):
        t = jax.random.normal(key, (rows, lt, h), jnp.float32)
        t = t / jnp.linalg.norm(t, axis=2, keepdims=True)
        lens = jax.random.randint(
            jax.random.fold_in(key, 1), (rows,), max(1, lt // 2), lt + 1
        )
        mask = jnp.arange(lt)[None, :] < lens[:, None]
        return t.astype(jnp.bfloat16), mask

    @jax.jit
    def build(key):
        tok0 = jnp.zeros((n, lt, h), jnp.bfloat16)
        m0 = jnp.zeros((n, lt), bool)
        g = -(-n // slab)

        def body(i, acc):
            tok_a, m_a = acc
            t, m = gen_tokens(jax.random.fold_in(key, i), slab)
            lo = jnp.minimum(i * slab, n - slab)
            tok_a = jax.lax.dynamic_update_slice(tok_a, t, (lo, 0, 0))
            m_a = jax.lax.dynamic_update_slice(m_a, m, (lo, 0))
            return tok_a, m_a

        return jax.lax.fori_loop(0, g, body, (tok0, m0))

    key = jax.random.PRNGKey(0)
    if n <= slab:
        tokens, t_mask = gen_tokens(key, n)
    else:
        tokens, t_mask = build(key)
    valid = jnp.ones((n,), bool)
    q16, _ = gen_tokens(jax.random.fold_in(key, 99), b)
    q16 = q16[:, :lq]
    jax.block_until_ready(tokens)
    gib = n * lt * h * 2 / 2**30
    print(f"corpus: {n} x {lt} x {h} ({gib:.2f} GiB bf16); "
          f"queries {b} x {lq}", flush=True)

    if args.int8:
        from trueno_rag_tpu.ops.maxsim import prepare_maxsim_int8

        tok8, s_tok = (jax.block_until_ready(a)
                       for a in prepare_maxsim_int8(tokens, t_mask))
        qa = jnp.max(jnp.abs(q16.astype(jnp.float32)), axis=2)
        t_q = jnp.maximum(qa / 127.0, 1e-12)
        q8 = jnp.clip(
            jnp.round(q16.astype(jnp.float32) / t_q[:, :, None]), -127, 127
        ).astype(jnp.int8)

    def timed(label, fn, *arrs):
        @functools.partial(jax.jit, static_argnames=("steps",))
        def chain(q0, steps, *rest):
            def one(carry, _):
                qq = q0 + carry
                out = fn(qq, *rest)
                return jnp.max(out) * 1e-12, None

            c, _ = jax.lax.scan(one, 0.0, None, length=steps)
            return c

        t0 = time.perf_counter()
        float(chain(q16, args.iters, *arrs))
        print(f"{label}: compiled+warm in {time.perf_counter()-t0:.1f}s",
              flush=True)
        ts = []
        for _ in range(3):
            t1 = time.perf_counter()
            float(chain(q16, args.iters, *arrs))
            ts.append((time.perf_counter() - t1) / args.iters)
        ms = sorted(ts)[1] * 1e3
        bytes_ = n * lt * h * (1 if args.int8 else 2)
        print(f"{label}: {ms:.2f} ms/batch  "
              f"({bytes_ / (ms * 1e-3) / 1e9:.0f} GB/s replica stream)",
              flush=True)
        return ms

    if args.v2:
        from trueno_rag_tpu.ops.maxsim import (
            prepare_maxsim_bias_l,
            prepare_maxsim_scan16_opt,
        )
        from trueno_rag_tpu.ops.pallas.maxsim_scan import (
            maxsim_scan16_scores_self_v2,
            maxsim_scan16_scores_v2,
        )

        for g_s in args.groups.split(","):
            g = int(g_s)
            bias_l = jax.block_until_ready(prepare_maxsim_bias_l(t_mask, g))
            timed(
                f"v2 self-primary bound pass [group={g}]",
                lambda qq, tok_a, bias_a, v_a, _g=g: (
                    maxsim_scan16_scores_self_v2(
                        qq.astype(jnp.bfloat16), tok_a, bias_a, v_a, group=_g)
                ),
                tokens, bias_l, valid,
            )
            bias_l.delete()
            if n * lt * h * 2 * 2 < 12 * 2**30:  # opt replica = 2nd corpus
                pack = tuple(jax.block_until_ready(a) for a in
                             prepare_maxsim_scan16_opt(tokens, t_mask, g))
                tok_l, bias_o = pack[0], pack[1]
                lt_p = tok_l.shape[0] // ((-(-n // g)) * g)
                timed(
                    f"v2 opt-layout bound pass [group={g}]",
                    lambda qq, tl_a, bias_a, v_a, _g=g, _lt=lt_p: (
                        maxsim_scan16_scores_v2(
                            qq.astype(jnp.bfloat16), tl_a, bias_a, v_a,
                            lt=_lt, group=_g)
                    ),
                    tok_l, bias_o, valid,
                )
                for a in pack:
                    a.delete()
        return

    for t_s in args.tiles.split(","):
        t = int(t_s)
        if args.int8:
            timed(
                f"int8 bound pass [tile_n={t or 'auto'}]",
                lambda qq, tq_a, tok_a, s_a, tm_a, v_a, _t=t: (
                    maxsim_scan_int8_scores(
                        jnp.clip(jnp.round(qq.astype(jnp.float32)
                                           / tq_a[:, :, None]),
                                 -127, 127).astype(jnp.int8),
                        tq_a, tok_a, s_a, tm_a, v_a, tile_n=_t)
                ),
                t_q, tok8, s_tok, t_mask, valid,
            )
        else:
            timed(
                f"bf16 bound pass [tile_n={t or 'auto'}]",
                # qq = q0 + carry promotes to f32 — cast back so the
                # kernel sees the bf16 program it serves in production
                lambda qq, tok_a, tm_a, v_a, _t=t: maxsim_scan16_scores(
                    qq.astype(jnp.bfloat16), tok_a, tm_a, v_a, tile_n=_t),
                tokens, t_mask, valid,
            )


if __name__ == "__main__":
    main()
