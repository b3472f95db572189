"""Late-interaction (MaxSim) retrieval bench: exact blockwise scan vs
the certified token-pruned tier, on topic-structured token corpora.

Late interaction costs ~``Lq·Lt``x a single-vector scan by
construction; this bench measures what the tier actually delivers on
this device and where the token-pruned certificate pays. Data is
topic-structured (tokens near one of ``--topics`` directions — the
shape encoder token embeddings have; pure random data cannot certify
ANY pruning bound and is the fallback regime by design).

Corpus and queries generate ON DEVICE (the tunnel moves ~2 MB/s; a
100k x 32 x 128 token tensor is 1.6 GB). Timing uses the
dependency-chained lax.scan methodology (CLAUDE.md): every step's
query depends on the carry so XLA cannot hoist, and one scalar
materializes.

Run: PYTHONPATH=.:$PYTHONPATH python benches/maxsim_bench.py \
    [--n 100000] [--lt 32] [--h 128] [--b 8] [--check]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--lt", type=int, default=32)
    p.add_argument("--h", type=int, default=128)
    p.add_argument("--b", type=int, default=8)
    p.add_argument("--lq", type=int, default=8)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--topics", type=int, default=4096)
    p.add_argument("--noise", type=float, default=0.15)
    p.add_argument("--t-hits", type=int, default=4096)
    p.add_argument("--rescore", type=int, default=1024)
    p.add_argument("--select", default="auto",
                   choices=("auto", "exact", "approx"),
                   help="tier candidate selection: exact top-(C+1) "
                        "(full-width sort at corpus scale) vs "
                        "approx_max_k + fail-closed threshold")
    p.add_argument("--block", type=int, default=1024)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--dtype", default="float32", choices=("float32", "bfloat16"))
    p.add_argument("--tiered", action="store_true",
                   help="certify + time the bf16/int8 tiered scans "
                        "(quantized replica stream + exact rescore from "
                        "primary — the latency tiers)")
    p.add_argument("--fused", action="store_true",
                   help="certify + time the fused Pallas bf16 scan tier "
                        "(the interaction tensor never leaves VMEM)")
    p.add_argument("--pruned", action="store_true",
                   help="also certify + time the token-pruned tier (same "
                        "full matmul as the exact scan + selection "
                        "overhead; T>512 top_k is minutes-slow on device)")
    p.add_argument("--radius", action="store_true",
                   help="also certify the K-centroid radius tier (pulls "
                        "the token tensor to host: slow over the tunnel)")
    p.add_argument("--skip-exact", action="store_true",
                   help="skip the exact-scan timing (its first compile "
                        "is ~8 min at 1M per new batch shape); tier "
                        "ratios are then omitted")
    p.add_argument("--only", default="",
                   help="comma-list filter of tier labels to run "
                        "(e.g. fused-bf16)")
    p.add_argument("--check", action="store_true",
                   help="oracle-check certified sets vs the exact scan")
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

    from trueno_rag_tpu.ops.maxsim import (
        maxsim_scan_topk,
        maxsim_topk_int8,
        maxsim_topk_int8_fused,
        maxsim_topk_pruned,
        maxsim_topk_scan16,
        maxsim_topk_scan16_fused,
        maxsim_topk_token_pruned,
        prepare_maxsim_bounds,
        prepare_maxsim_int8,
        prepare_maxsim_scan16,
    )

    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind}", flush=True)
    n, lt, h, b, lq, k = args.n, args.lt, args.h, args.b, args.lq, args.k
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    # -- device-side corpus generation -------------------------------------
    @functools.partial(jax.jit, static_argnames=("rows",))
    def gen_tokens(key, topics, rows):
        k1, k2, k3 = jax.random.split(key, 3)
        tid = jax.random.randint(k1, (rows, lt), 0, args.topics)
        t = topics[tid] + args.noise * jax.random.normal(
            k2, (rows, lt, h), jnp.float32
        )
        t = t / jnp.linalg.norm(t, axis=2, keepdims=True)
        lens = jax.random.randint(k3, (rows,), max(1, lt // 2), lt + 1)
        mask = jnp.arange(lt)[None, :] < lens[:, None]
        return t.astype(dtype), mask

    def gen_corpus(key, topics, rows):
        """Slab-generate large corpora: gen_tokens materializes an f32
        [rows, Lt, H] intermediate (norm + divide copies), which at 1M
        x 32 x 128 is 16+ GiB — over one v5e's HBM even for a bf16
        corpus. A fori_loop of clamped dynamic_update_slice windows
        (the _slabbed_prep pattern, ops/maxsim.py) keeps temporaries at
        slab size; the last window overlaps instead of padding, so no
        full-size slice copy materializes on the way out."""
        slab = 131_072
        if rows <= slab:
            return gen_tokens(key, topics, rows)
        g = -(-rows // slab)

        @jax.jit
        def build(key, topics):
            tok0 = jnp.zeros((rows, lt, h), dtype)
            m0 = jnp.zeros((rows, lt), bool)

            def body(i, acc):
                tok_a, m_a = acc
                t, m = gen_tokens(jax.random.fold_in(key, i), topics, slab)
                lo = jnp.minimum(i * slab, rows - slab)
                tok_a = jax.lax.dynamic_update_slice(tok_a, t, (lo, 0, 0))
                m_a = jax.lax.dynamic_update_slice(m_a, m, (lo, 0))
                return tok_a, m_a

            return jax.lax.fori_loop(0, g, body, (tok0, m0))

        return build(key, topics)

    key = jax.random.PRNGKey(0)
    kt, kc, kq = jax.random.split(key, 3)
    topics = jax.random.normal(kt, (args.topics, h), jnp.float32)
    topics = topics / jnp.linalg.norm(topics, axis=1, keepdims=True)
    tokens, t_mask = gen_corpus(kc, topics, n)
    valid = jnp.ones((n,), bool)
    q_tok, q_mask = gen_tokens(kq, topics, b)
    q_tok = q_tok.astype(jnp.float32)[:, :lq]
    q_mask = q_mask[:, :lq]
    jax.block_until_ready(tokens)
    gb = n * lt * h * (2 if args.dtype == "bfloat16" else 4) / 2**30
    print(f"corpus: {n} chunks x {lt} tokens x {h} dims "
          f"({gb:.2f} GiB {args.dtype}); queries {b} x {lq}", flush=True)

    # -- certification + optional oracle check (token-pruned is gated:
    # it computes the SAME full token matmul as the exact scan plus
    # selection overhead — measured SLOWER; its value is the certified
    # candidate-generation structure, not latency) ------------------------
    if args.pruned:
        s_p, r_p, cert = maxsim_topk_token_pruned(
            q_tok, q_mask, tokens, t_mask, valid, k,
            t_hits=args.t_hits, rescore=args.rescore,
        )
        cert_np = np.asarray(cert).astype(bool)
        print(f"token-pruned: certified {int(cert_np.sum())}/{b} "
              f"(T={args.t_hits}, rescore={args.rescore})", flush=True)
        if args.check:
            s_e, r_e = maxsim_scan_topk(
                q_tok, q_mask, tokens, t_mask, valid, k, args.block
            )
            r_e, r_pn = np.asarray(r_e), np.asarray(r_p)
            bad = [i for i in np.flatnonzero(cert_np)
                   if not np.array_equal(r_pn[i], r_e[i])]
            print(f"oracle check: {len(bad)} bad certified results {bad[:5]}",
                  flush=True)

    if args.radius:
        # K-centroid radius tier (expected near-zero certification on
        # topic-diverse chunks — report it honestly). Gated: the prep
        # round-trips the full token tensor through the host, which is
        # minutes-per-GB over this box's ~2 MB/s tunnel.
        btok, brad, bmask = prepare_maxsim_bounds(
            np.asarray(tokens, np.float32), np.asarray(t_mask), k_bound=8
        )
        _, _, cert_r = maxsim_topk_pruned(
            q_tok, q_mask, tokens, t_mask,
            jnp.asarray(btok), jnp.asarray(brad), jnp.asarray(bmask),
            valid, k, rescore=args.rescore,
        )
        print(f"radius-pruned (K=8): certified "
              f"{int(np.asarray(cert_r).sum())}/{b}", flush=True)

    # -- timing -------------------------------------------------------------
    # Corpus arrays pass as ARGUMENTS, never closures: closed-over
    # device arrays bake into the jaxpr as constants and the remote
    # compile ships the whole 1.5 GiB corpus over the ~2 MB/s tunnel
    # (CLAUDE.md; re-learned the hard way by this bench's first run).
    def timed(label, fn, *arrs):
        @functools.partial(jax.jit, static_argnames=("steps",))
        def chain(q0, steps, *rest):
            def one(carry, _):
                qq = q0 + carry
                out = fn(qq, *rest)
                return jnp.max(out[0]) * 1e-12, None

            c, _ = jax.lax.scan(one, 0.0, None, length=steps)
            return c

        import time as _t
        _t0 = _t.perf_counter()
        print(f"{label}: compiling...", flush=True)
        float(chain(q_tok, args.iters, *arrs))  # compile + warm
        print(f"{label}: compiled+warm in {_t.perf_counter()-_t0:.1f}s", flush=True)
        ts = []
        for _ in range(3):
            t1 = time.perf_counter()
            float(chain(q_tok, args.iters, *arrs))
            ts.append((time.perf_counter() - t1) / args.iters)
        ms = sorted(ts)[1] * 1e3
        print(f"{label}: {ms:.2f} ms/batch ({b / sorted(ts)[1]:.0f} q/s, "
              f"{b * lq / sorted(ts)[1]:.0f} qtok/s)", flush=True)
        return ms

    exact_ms = None
    if not args.skip_exact:
        exact_ms = timed(
            f"exact scan [{args.dtype}]",
            lambda qq, tok_a, tm_a, v_a: maxsim_scan_topk(
                qq, q_mask, tok_a, tm_a, v_a, k, args.block),
            tokens, t_mask, valid,
        )
    if args.dtype == "float32" and not args.skip_exact:
        # the bf16-storage lever: half the HBM stream, exact over the
        # stored bf16 values (the framework's storage-dtype contract)
        tokens16 = tokens.astype(jnp.bfloat16)
        jax.block_until_ready(tokens16)
        bf16_ms = timed(
            "exact scan [bfloat16 storage]",
            lambda qq, tok_a, tm_a, v_a: maxsim_scan_topk(
                qq, q_mask, tok_a, tm_a, v_a, k, args.block),
            tokens16, t_mask, valid,
        )
        print(f"bf16-storage speedup: {exact_ms / bf16_ms:.2f}x", flush=True)
        tokens16.delete()  # 2 B/elem at corpus scale — free before tiers
    if args.tiered or args.fused:
        # tiers quantize the PRIMARY stored values (here: the corpus as
        # generated, at --dtype); rescore gathers from primary. Prep is
        # device-resident (no host round-trip of the token tensor).
        oracle_rows = None
        if args.check:
            # oracle BEFORE any replica prep (the 10M clustered-bench
            # ordering): running the exact scan while an int8 replica
            # (+3.9 GiB at 1M) is live OOMs a 16 GiB chip — hoist it
            # once to host; the certified-set contract is tier-agnostic
            _, r_e0 = maxsim_scan_topk(
                q_tok, q_mask, tokens, t_mask, valid, k, args.block
            )
            oracle_rows = np.asarray(r_e0)
        packs = []
        if args.tiered:
            packs.append(
                ("tiered-bf16", prepare_maxsim_scan16, maxsim_topk_scan16))
            packs.append(
                ("tiered-int8", prepare_maxsim_int8, maxsim_topk_int8))
        if args.fused:
            packs.append(
                ("fused-bf16", prepare_maxsim_scan16,
                 maxsim_topk_scan16_fused))
            packs.append(
                ("fused-int8", prepare_maxsim_int8,
                 maxsim_topk_int8_fused))
        only = {s for s in args.only.split(",") if s}
        for label, prep, op in packs:
            if only and label not in only:
                continue
            if label == "tiered-bf16" and args.dtype == "bfloat16":
                continue  # same bytes as the exact scan — no tier
            owns_replica = True
            if label == "fused-bf16" and args.dtype == "bfloat16":
                # zero-copy production config: the primary IS the
                # replica (prepare_maxsim_self16) — the fused kernel
                # serves the bf16 corpus with no extra HBM
                from trueno_rag_tpu.ops.maxsim import prepare_maxsim_self16

                e0, n0 = (jax.block_until_ready(a)
                          for a in prepare_maxsim_self16(tokens, t_mask))
                pack = (tokens, e0, n0)
                owns_replica = False
            else:
                pack = tuple(jax.block_until_ready(a)
                             for a in prep(tokens, t_mask))
            s_t, r_t, cert = op(
                q_tok, q_mask, tokens, t_mask, *pack, valid, k,
                rescore=args.rescore, select=args.select,
            )
            cert_np = np.asarray(cert).astype(bool)
            print(f"{label}: certified {int(cert_np.sum())}/{b} "
                  f"(rescore={args.rescore})", flush=True)
            if args.check:
                r_tn = np.asarray(r_t)
                bad = [i for i in np.flatnonzero(cert_np)
                       if not np.array_equal(r_tn[i], oracle_rows[i])]
                print(f"{label} oracle check: {len(bad)} bad certified "
                      f"results {bad[:5]}", flush=True)
            if owns_replica:
                t_ms = timed(
                    label,
                    lambda qq, tok_a, tm_a, v_a, *pk: op(
                        qq, q_mask, tok_a, tm_a, *pk, v_a, k,
                        rescore=args.rescore, select=args.select),
                    tokens, t_mask, valid, *pack,
                )
            else:
                # self-pack: the corpus enters the timing chain ONCE —
                # XLA charges aliased jit parameters separately, so
                # passing primary + replica double-counts 7.6 GiB at 1M
                # (measured OOM); aliasing inside the traced chain keeps
                # the op's `tok16 is tokens` dispatch on the same tracer
                t_ms = timed(
                    label,
                    lambda qq, tok_a, tm_a, v_a, e_, n_: op(
                        qq, q_mask, tok_a, tm_a, tok_a, e_, n_, v_a, k,
                        rescore=args.rescore, select=args.select),
                    tokens, t_mask, valid, *pack[1:],
                )
            if exact_ms is not None:
                print(f"{label} vs exact [{args.dtype}]: "
                      f"{exact_ms / t_ms:.2f}x", flush=True)
            for a_ in (pack if owns_replica else pack[1:]):
                a_.delete()  # free the replica before the next tier
    if args.pruned:
        pruned_ms = timed(
            "token-pruned ",
            lambda qq, tok_a, tm_a, v_a: maxsim_topk_token_pruned(
                qq, q_mask, tok_a, tm_a, v_a, k,
                t_hits=args.t_hits, rescore=args.rescore,
            ),
            tokens, t_mask, valid,
        )
        ratio = ("" if exact_ms is None
                 else f"{exact_ms / pruned_ms:.2f}x ")
        print(f"token-pruned vs exact: {ratio}"
              f"(certified {int(cert_np.sum())}/{b}; uncertified queries "
              f"re-run the exact scan in production)", flush=True)


if __name__ == "__main__":
    main()
