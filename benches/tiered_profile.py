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
    p.add_argument("--tile", type=int, default=1024)
    p.add_argument("--tile2", type=int, default=2048, help="scan_select_v2 grid tile")
    p.add_argument("--margin2", type=int, default=32, help="v2 margin_tiles")
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

    # v2 kernel padding (tile2 multiple)
    t2 = args.tile2
    n_pad2 = max(-(-n // t2) * t2, t2)
    if n_pad2 != n:
        m_pad2 = jnp.pad(m_bf16, ((0, n_pad2 - n), (0, 0)))
        e_pad2 = jnp.pad(e_l2, (0, n_pad2 - n))
        a_pad2 = jnp.pad(a_l2, (0, n_pad2 - n))
        v_pad2 = jnp.pad(valid, (0, n_pad2 - n), constant_values=False)
    else:
        m_pad2, e_pad2, a_pad2, v_pad2 = m_bf16, e_l2, a_l2, valid

    from trueno_rag_tpu.ops.pallas.scan_select_v2 import scan_select_v2

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
    outs20 = scan_select_v2(qb0, m_pad2, e_pad2, a_pad2, v_pad2.astype(jnp.int32),
                            u0, v0, tile_n=args.tile2)
    outs20 = jax.block_until_ready(outs20)

    # kernel ablation: same tiling/IO as scan_select, but the in-kernel
    # selection reduced to a single per-block max (isolates the cost of
    # the 13-pass top-5+argmax4 selection loop from matmul+stream)
    from jax.experimental import pallas as pl

    def _mm_kernel(q_ref, m_ref, el2_ref, al2_ref, valid_ref, uq_ref, vq_ref, o_ref):
        s = jax.lax.dot_general(
            m_ref[:], q_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        upper = s + el2_ref[:][:, None] * uq_ref[:][None, :]
        upper = upper + al2_ref[:][:, None] * vq_ref[:][None, :]
        upper = jnp.where(valid_ref[:][:, None] != 0, upper, -jnp.inf)
        t_, b_ = upper.shape
        o_ref[:] = jnp.max(upper.reshape(t_ // 128, 128, b_), axis=1)

    def _mm_kernel_T(q_ref, m_ref, el2_ref, al2_ref, valid_ref, uq_ref, vq_ref, o_ref):
        # queries as lhs: [B, d] x [tile, d]^T -> [B, tile]
        s = jax.lax.dot_general(
            q_ref[:], m_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        upper = s + el2_ref[:][None, :] * uq_ref[:][:, None]
        upper = upper + al2_ref[:][None, :] * vq_ref[:][:, None]
        upper = jnp.where(valid_ref[:][None, :] != 0, upper, -jnp.inf)
        b_, t_ = upper.shape
        o_ref[:] = jnp.max(upper.reshape(b_, t_ // 128, 128), axis=2)

    def _mm_kernel_N(qT_ref, m_ref, el2_ref, al2_ref, valid_ref, uq_ref, vq_ref, o_ref):
        # MXU-native nn form: m [tile, d] x qT [d, B] -> [tile, B]
        s = jax.lax.dot_general(
            m_ref[:], qT_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        upper = s + el2_ref[:][:, None] * uq_ref[:][None, :]
        upper = upper + al2_ref[:][:, None] * vq_ref[:][None, :]
        upper = jnp.where(valid_ref[:][:, None] != 0, upper, -jnp.inf)
        t_, b_ = upper.shape
        o_ref[:] = jnp.max(upper.reshape(t_ // 128, 128, b_), axis=1)

    @functools.partial(jax.jit, static_argnames=("steps", "tile", "orient"))
    def mm_chain(qb0, m_pad, e_pad, a_pad, v_pad, u0, v0, steps, tile, orient):
        g_tile = tile // 128
        if orient == "nn":
            kern = pl.pallas_call(
                _mm_kernel_N,
                grid=(m_pad.shape[0] // tile,),
                in_specs=[
                    pl.BlockSpec((d, b), lambda i: (0, 0)),
                    pl.BlockSpec((tile, d), lambda i: (i, 0)),
                    pl.BlockSpec((tile,), lambda i: (i,)),
                    pl.BlockSpec((tile,), lambda i: (i,)),
                    pl.BlockSpec((tile,), lambda i: (i,)),
                    pl.BlockSpec((b,), lambda i: (0,)),
                    pl.BlockSpec((b,), lambda i: (0,)),
                ],
                out_specs=pl.BlockSpec((g_tile, b), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((m_pad.shape[0] // 128, b), jnp.float32),
            )

            def one(carry, _):
                o = kern(qb0.T + carry.astype(jnp.bfloat16), m_pad, e_pad, a_pad,
                         v_pad.astype(jnp.int32), u0, v0)
                return jnp.max(o) * 1e-12, None

            c, _ = jax.lax.scan(one, 0.0, None, length=steps)
            return c
        if orient == "rowmajor":
            kern = pl.pallas_call(
                _mm_kernel,
                grid=(m_pad.shape[0] // tile,),
                in_specs=[
                    pl.BlockSpec((b, d), lambda i: (0, 0)),
                    pl.BlockSpec((tile, d), lambda i: (i, 0)),
                    pl.BlockSpec((tile,), lambda i: (i,)),
                    pl.BlockSpec((tile,), lambda i: (i,)),
                    pl.BlockSpec((tile,), lambda i: (i,)),
                    pl.BlockSpec((b,), lambda i: (0,)),
                    pl.BlockSpec((b,), lambda i: (0,)),
                ],
                out_specs=pl.BlockSpec((g_tile, b), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((m_pad.shape[0] // 128, b), jnp.float32),
            )
        else:
            kern = pl.pallas_call(
                _mm_kernel_T,
                grid=(m_pad.shape[0] // tile,),
                in_specs=[
                    pl.BlockSpec((b, d), lambda i: (0, 0)),
                    pl.BlockSpec((tile, d), lambda i: (i, 0)),
                    pl.BlockSpec((tile,), lambda i: (i,)),
                    pl.BlockSpec((tile,), lambda i: (i,)),
                    pl.BlockSpec((tile,), lambda i: (i,)),
                    pl.BlockSpec((b,), lambda i: (0,)),
                    pl.BlockSpec((b,), lambda i: (0,)),
                ],
                out_specs=pl.BlockSpec((b, g_tile), lambda i: (0, i)),
                out_shape=jax.ShapeDtypeStruct((b, m_pad.shape[0] // 128), jnp.float32),
            )

        def one(carry, _):
            o = kern(qb0 + carry.astype(jnp.bfloat16), m_pad, e_pad, a_pad,
                     v_pad.astype(jnp.int32), u0, v0)
            return jnp.max(o) * 1e-12, None

        c, _ = jax.lax.scan(one, 0.0, None, length=steps)
        return c

    # arrays as arguments, not closures (remote compile ships closure
    # constants with the program — the corpus, at corpus scale)
    @functools.partial(jax.jit, static_argnames=("steps", "stage"))
    def chain(queries, matrix, valid, m_bf16, e_l2, a_l2, m_pad, e_pad,
              a_pad, v_pad, m_pad2, e_pad2, a_pad2, v_pad2, qb0, qf, u0,
              v0, outs0, outs20, steps, stage):
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
            elif stage == "tsel":
                # selection sub-stage only: block top-k + candidate build
                v1 = outs0[0] + shift
                kb = min(cand + 64, v1.shape[1])
                b_scores, b_idx = jax.lax.top_k(v1, kb)
                b_idx = jax.lax.sort(b_idx, dimension=1)
                parts = [
                    jnp.take_along_axis(outs0[5 + t] + ishift, b_idx, axis=1)
                    + b_idx * 128
                    for t in range(4)
                ]
                cr = jax.lax.sort(jnp.concatenate(parts, axis=1), dimension=1)
                out = jnp.sum(cr) * 1e-9 + jnp.max(b_scores)
            elif stage == "tgather":
                # gather+rescore sub-stage with fixed plausible rows
                rows = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (b, args.rescore_rows or 192), 1
                    )
                    * 401
                    + ishift
                ) % n
                g = jnp.take(matrix, rows, axis=0)
                ex = jax.lax.dot_general(
                    qf, g, (((1,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                s2, _ = jax.lax.top_k(ex, cand)
                out = jnp.max(s2)
            elif stage == "tgather2":
                # gather + ELEMENTWISE rescore (VPU) instead of the
                # batched [B,R,d]x[B,d] GEMV (batch-256 matvecs on MXU)
                rows = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (b, args.rescore_rows or 192), 1
                    )
                    * 401
                    + ishift
                ) % n
                g = jnp.take(matrix, rows, axis=0)
                ex = jnp.sum(g * qf[:, None, :], axis=-1)
                s2, _ = jax.lax.top_k(ex, cand)
                out = jnp.max(s2)
            elif stage == "g_sorted":
                # locality-ordered gather + broadcast-q elementwise
                # rescore + tiny score scatter-back
                R = args.rescore_rows or 192
                rows = (
                    jax.lax.broadcasted_iota(jnp.int32, (b, R), 1) * 401 + ishift
                ) % n
                flat = rows.reshape(-1)
                order = jnp.argsort(flat)
                sorted_rows = jnp.take(flat, order)
                g = jnp.take(matrix, sorted_rows, axis=0)  # sequential-ish
                owner = order // R  # originating query of each sorted row
                qrows = jnp.take(qf, owner, axis=0)  # [B*R, d] from a 256-row table
                sc = jnp.sum(g * qrows, axis=-1)  # [B*R]
                ex = jnp.zeros((b * R,), jnp.float32).at[order].set(sc).reshape(b, R)
                s2, _ = jax.lax.top_k(ex, cand)
                out = jnp.max(s2)
            elif stage == "s_raw":
                # approx_max_k alone, no threshold machinery
                v1 = outs0[0] + shift
                vals, idx = jax.lax.approx_max_k(v1, min(cand + 64, v1.shape[1]),
                                                 recall_target=0.99)
                out = jnp.max(vals) + jnp.sum(idx) * 1e-9
            elif stage == "s_scatter":
                # the masked-max threshold alone (fixed indices)
                v1 = outs0[0] + shift
                kb2 = min(cand + 64, v1.shape[1])
                idx = (jax.lax.broadcasted_iota(jnp.int32, (b, kb2), 1) * 67 + ishift) % v1.shape[1]
                sel = jnp.zeros(v1.shape, bool).at[
                    jnp.arange(b)[:, None], idx
                ].set(True)
                thr = jnp.max(jnp.where(sel, -jnp.inf, v1), axis=1)
                out = jnp.max(thr)
            elif stage == "s_approx95":
                # cheaper selector setting: recall 0.95 with margin 256
                v1 = outs0[0] + shift
                kb = min(cand + 256, v1.shape[1])
                _, idx = jax.lax.approx_max_k(v1, kb, recall_target=0.95)
                sel = jnp.zeros(v1.shape, bool).at[
                    jnp.arange(v1.shape[0])[:, None], idx
                ].set(True)
                thr = jnp.max(jnp.where(sel, -jnp.inf, v1), axis=1)
                out = jnp.max(thr) + jnp.sum(idx) * 1e-9
            elif stage == "s_approx":
                # the production selector: approx_max_k + masked-max
                # threshold on [B, G]
                v1 = outs0[0] + shift
                idx, thr = dt._topk_select(v1, min(cand + 64, v1.shape[1]), True)
                out = jnp.max(thr) + jnp.sum(idx) * 1e-9
            elif stage == "s_topk":
                v1 = outs0[0] + shift
                bs, bi = jax.lax.top_k(v1, min(cand + 64 + 1, v1.shape[1]))
                out = jnp.max(bs) + jnp.sum(bi) * 1e-9
            elif stage == "s_sort":
                v1 = outs0[0] + shift
                bs, bi = jax.lax.top_k(v1, min(cand + 64 + 1, v1.shape[1]))
                bi = jax.lax.sort(bi[:, :-1], dimension=1)
                out = jnp.max(bs) + jnp.sum(bi) * 1e-9
            elif stage == "s_gath":
                v1 = outs0[0] + shift
                bs, bi = jax.lax.top_k(v1, min(cand + 64 + 1, v1.shape[1]))
                bi = jax.lax.sort(bi[:, :-1], dimension=1)
                acc = jnp.zeros_like(bi)
                for t in range(4):
                    acc = acc + jnp.take_along_axis(outs0[5 + t] + ishift, bi, axis=1)
                out = jnp.max(bs) + jnp.sum(acc) * 1e-9
            elif stage == "s_bigsort":
                cr0 = (
                    jax.lax.broadcasted_iota(jnp.int32, (b, 460), 1) * 7919 + ishift
                ) % 100003
                cr = jax.lax.sort(cr0, dimension=1)
                out = jnp.sum(cr) * 1e-9
            elif stage == "g_only":
                rows = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (b, args.rescore_rows or 192), 1
                    )
                    * 401
                    + ishift
                ) % n
                g = jnp.take(matrix, rows, axis=0)
                out = jnp.sum(g[:, :, 0]) * 1e-9
            elif stage == "tsel_lean":
                # selection with a lean margin (kb = cand + 14)
                v1 = outs0[0] + shift
                kb = min(cand + 14, v1.shape[1])
                b_scores, b_idx = jax.lax.top_k(v1, kb)
                b_idx = jax.lax.sort(b_idx, dimension=1)
                parts = [
                    jnp.take_along_axis(outs0[5 + t] + ishift, b_idx, axis=1)
                    + b_idx * 128
                    for t in range(4)
                ]
                cr = jax.lax.sort(jnp.concatenate(parts, axis=1), dimension=1)
                out = jnp.sum(cr) * 1e-9 + jnp.max(b_scores)
            elif stage == "tail2":
                outs = (outs20[0] + shift, outs20[1] + ishift)
                s, _, ok = dt._select_rescore_verify_tiles(
                    outs, qf, matrix, valid, n, b, b, cand, args.margin2,
                    args.rescore_rows, True, 8,
                )
                out = jnp.max(s) + jnp.sum(ok)
            elif stage == "t2sel":
                # tile selection + packed candidate fetch, no trim/gather
                t_top = 8
                v_pack = outs20[0] + shift
                r_pack = outs20[1] + ishift
                kb = min(cand + args.margin2, v_pack.shape[2])
                t_idx, thr_out = dt._topk_select(v_pack[:, 0, :], kb, True)
                t_idx = jax.lax.sort(t_idx, dimension=1)
                vg = jnp.take_along_axis(v_pack, t_idx[:, None, :], axis=2)
                rg = jnp.take_along_axis(r_pack, t_idx[:, None, :], axis=2)
                out = jnp.max(thr_out) + jnp.sum(vg) * 1e-9 + jnp.sum(rg) * 1e-9
            elif stage == "t2approx":
                # the tile selector alone on [B, G']
                v1 = outs20[0][:, 0, :] + shift
                idx, thr = dt._topk_select(v1, min(cand + args.margin2, v1.shape[1]), True)
                out = jnp.max(thr) + jnp.sum(idx) * 1e-9
            elif stage == "t2approx_x":
                # exact top_k variant of the tile selector
                v1 = outs20[0][:, 0, :] + shift
                idx, thr = dt._topk_select(v1, min(cand + args.margin2, v1.shape[1]), False)
                out = jnp.max(thr) + jnp.sum(idx) * 1e-9
            elif stage == "t2trim_sort":
                # descending single-key sort as the trim (exact, gives
                # the (R+1)-th value as the threshold for free)
                t_top = 8
                kb = min(cand + args.margin2, outs20[0].shape[2])
                width = t_top * kb
                cv = (jax.lax.broadcasted_iota(jnp.int32, (b, width), 1)
                      .astype(jnp.float32) * 0.001 + shift)
                rr0 = (jax.lax.broadcasted_iota(jnp.int32, (b, width), 1) * 17 + ishift)
                _, rr_sorted, cv_sorted = jax.lax.sort(
                    (-cv, rr0, cv), num_keys=1)
                R = args.rescore_rows or 192
                out = jnp.sum(rr_sorted[:, :R]) * 1e-9 + jnp.max(cv_sorted[:, R])
            elif stage == "t2gath":
                # the two packed take_along gathers alone (fixed indices)
                g2 = outs20[0].shape[2]
                kb = min(cand + args.margin2, g2)
                idx = (jax.lax.broadcasted_iota(jnp.int32, (b, kb), 1) * 13 + ishift) % g2
                vg = jnp.take_along_axis(outs20[0] + shift, idx[:, None, :], axis=2)
                rg = jnp.take_along_axis(outs20[1] + ishift, idx[:, None, :], axis=2)
                out = jnp.sum(vg) * 1e-9 + jnp.sum(rg.astype(jnp.float32)) * 1e-9
            elif stage == "t2trim":
                # the trim's certified top-R over the candidate width
                t_top = 8
                kb = min(cand + args.margin2, outs20[0].shape[2])
                width = t_top * kb
                cv = (jax.lax.broadcasted_iota(jnp.int32, (b, width), 1)
                      .astype(jnp.float32) * 0.001 + shift)
                v_idx, thr_exp = dt._topk_select(cv, args.rescore_rows or 192, True)
                out = jnp.max(thr_exp) + jnp.sum(v_idx) * 1e-9
            elif stage == "scan2":
                outs = scan_select_v2(
                    qb0 + shift.astype(jnp.bfloat16), m_pad2, e_pad2, a_pad2,
                    v_pad2.astype(jnp.int32), u0, v0, tile_n=args.tile2,
                )
                out = jnp.max(outs[0])
            elif stage == "tiered2":
                s, _, ok = dt.dense_topk_tiered2(
                    q, matrix, m_bf16, e_l2, a_l2, valid, cand,
                    rescore_rows=args.rescore_rows, tile_n=args.tile2,
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
    arrs = (queries, matrix, valid, m_bf16, e_l2, a_l2, m_pad, e_pad,
            a_pad, v_pad, m_pad2, e_pad2, a_pad2, v_pad2, qb0, qf, u0,
            v0, outs0, outs20)
    for stage in args.stages.split(","):
        if stage.startswith("k_mm"):
            orient = {"k_mmT": "qmajor", "k_mmN": "nn"}.get(stage, "rowmajor")
            margs = (qb0, m_pad, e_pad, a_pad, v_pad, u0, v0)
            float(mm_chain(*margs, args.iters, args.tile, orient))
            t0 = time.perf_counter()
            float(mm_chain(*margs, args.iters, args.tile, orient))
        else:
            float(chain(*arrs, args.iters, stage))  # compile + warm
            t0 = time.perf_counter()
            float(chain(*arrs, args.iters, stage))
        dt_s = (time.perf_counter() - t0) / args.iters
        print(f"{stage:7s}: {dt_s*1e3:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
