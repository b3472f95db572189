"""Streaming-select v2 tiers: the bf16/int8 tile kernels share the v1
exactness contract (checked wrappers ALWAYS match the fp32 oracle), and
the compact tiers (bf16-only or int8-scan storage, no fp32 matrix)
must never certify a wrong top-k SET — reference semantics
index.rs:386-412."""

import numpy as np
import pytest
import jax.numpy as jnp

from trueno_rag_tpu.ops.dense import dense_topk
from trueno_rag_tpu.ops.dense_tiered import (
    dense_topk_compact,
    dense_topk_compact_bf16,
    dense_topk_compact_bf16r,
    dense_topk_int8_tiered2,
    dense_topk_int8_tiered2_checked,
    dense_topk_tiered2,
    dense_topk_tiered2_checked,
    prepare_int8,
    prepare_residual,
    prepare_tiered,
)


def build(n, d, bq, seed, invalidate=True):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    q = rng.standard_normal((bq, d)).astype(np.float32)
    valid = np.ones(n, bool)
    if invalidate:
        valid[n // 10 : n // 8] = False
    return jnp.asarray(m), jnp.asarray(q), jnp.asarray(valid)


def compact_pack(m):
    mb, bf_e, bf_a = prepare_tiered(m)
    mi, s, i8_e, i8_a = prepare_int8(m)
    return mb, bf_e, bf_a, mi, s, i8_e, i8_a


def compact_call(layout, q, m, valid, k, **kw):
    """Dispatch over the compact storage layouts (same contract)."""
    if layout == "int8":
        return dense_topk_compact(
            q, *compact_pack(m), valid, k, use_int8_mxu=False, **kw
        )
    if layout == "bf16r":
        return dense_topk_compact_bf16r(
            q, *(prepare_tiered(m) + prepare_residual(m)), valid, k, **kw
        )
    return dense_topk_compact_bf16(q, *prepare_tiered(m), valid, k, **kw)


COMPACT_LAYOUTS = ("int8", "bf16", "bf16r")


# -- exact-contract tile kernels (bf16 + int8) ------------------------------


@pytest.mark.parametrize(
    "n,d,bq,k", [(5000, 64, 7, 10), (20000, 384, 4, 50), (300, 32, 3, 7)]
)
def test_tiered2_checked_matches_oracle(n, d, bq, k):
    m, q, valid = build(n, d, bq, seed=n)
    mb, el2, al2 = prepare_tiered(m)
    s_c, r_c, _ = dense_topk_tiered2_checked(
        q, m, mb, el2, al2, valid, k, tile_n=1024, interpret=True
    )
    s_x, r_x = dense_topk(q, m, valid, k, "cosine")
    np.testing.assert_array_equal(np.asarray(r_c), np.asarray(r_x))
    np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_x), atol=2e-6, rtol=2e-6)


@pytest.mark.parametrize(
    "n,d,bq,k", [(5000, 64, 7, 10), (20000, 384, 4, 50), (300, 32, 3, 7)]
)
def test_int8_tiered2_checked_matches_oracle(n, d, bq, k):
    m, q, valid = build(n, d, bq, seed=n + 1)
    mi, s, el2, al2 = prepare_int8(m)
    s_c, r_c, _ = dense_topk_int8_tiered2_checked(
        q, m, mi, s, el2, al2, valid, k, tile_n=1024, use_int8_mxu=False,
        interpret=True,
    )
    s_x, r_x = dense_topk(q, m, valid, k, "cosine")
    np.testing.assert_array_equal(np.asarray(r_c), np.asarray(r_x))
    np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_x), atol=2e-6, rtol=2e-6)


def test_int8_tiered2_mxu_paths_bit_identical():
    m, q, valid = build(4096, 128, 5, seed=11)
    mi, s, el2, al2 = prepare_int8(m)
    a = dense_topk_int8_tiered2(
        q, m, mi, s, el2, al2, valid, 9, tile_n=1024, use_int8_mxu=True,
        interpret=True,
    )
    b = dense_topk_int8_tiered2(
        q, m, mi, s, el2, al2, valid, 9, tile_n=1024, use_int8_mxu=False,
        interpret=True,
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_tiered2_certified_results_are_exact():
    for seed in range(4):
        m, q, valid = build(8192, 96, 6, seed)
        mb, el2, al2 = prepare_tiered(m)
        s_t, r_t, ok = dense_topk_tiered2(
            q, m, mb, el2, al2, valid, 12, tile_n=1024, interpret=True
        )
        ok_np = np.asarray(ok)
        if not ok_np.any():
            continue
        s_x, r_x = dense_topk(q, m, valid, 12, "cosine")
        np.testing.assert_array_equal(
            np.asarray(r_t)[ok_np], np.asarray(r_x)[ok_np]
        )


# -- compact tier: certified SET semantics ----------------------------------


def planted(n, d, bq, k, seed):
    """Corpus with ``k`` well-separated planted neighbors per query
    (cosine ~0.96-0.99 vs ~0.5 background max at d=64) spread across
    selection tiles — certification must succeed and the top-k SET is
    unambiguous."""
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((bq, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    expected = []
    stride = max(n // k - 13, 1)
    for b in range(bq):
        rows = [(17 + b + i * stride) % n for i in range(k)]
        assert len(set(rows)) == k
        for j, row in enumerate(rows):
            u = rng.standard_normal(d).astype(np.float32)
            u /= np.linalg.norm(u)
            m[row] = q[b] + (0.1 + 0.05 * j) * u  # cosine ~0.995..0.96
        expected.append(rows)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return jnp.asarray(m), jnp.asarray(q), expected


@pytest.mark.parametrize("layout", COMPACT_LAYOUTS)
def test_compact_planted_certifies_and_matches_set(layout):
    n, d, bq, k = 4096, 64, 4, 5
    m, q, expected = planted(n, d, bq, k, seed=2)
    valid = jnp.ones(n, bool)
    s_c, r_c, ok = compact_call(
        layout, q, m, valid, k, tile_n=1024, interpret=True,
    )
    assert bool(np.asarray(ok).all()), "well-separated corpus must certify"
    s_x, r_x = dense_topk(q, m, valid, k, "cosine")
    for b in range(bq):
        assert set(np.asarray(r_c)[b].tolist()) == set(np.asarray(r_x)[b].tolist())
        assert set(np.asarray(r_c)[b].tolist()) == set(expected[b])
    # scores are bf16-rescored: close, not exact
    order = np.argsort(np.asarray(r_c), axis=1)
    oracle_order = np.argsort(np.asarray(r_x), axis=1)
    np.testing.assert_allclose(
        np.take_along_axis(np.asarray(s_c), order, 1),
        np.take_along_axis(np.asarray(s_x), oracle_order, 1),
        atol=5e-3,
    )


@pytest.mark.parametrize("layout", COMPACT_LAYOUTS)
def test_compact_certificate_never_lies(layout):
    """Random corpus at a tile count where certification is partial
    (measured ~5/8 at n=32k, d=32, k=10): every certified query must be
    the exact fp32 top-k SET; uncertified ones carry no claim."""
    any_ok = False
    for seed in range(3):
        m, q, valid = build(32768, 32, 8, seed, invalidate=(seed % 2 == 0))
        s_c, r_c, ok = compact_call(
            layout, q, m, valid, 10, tile_n=1024, interpret=True,
        )
        ok_np = np.asarray(ok)
        if not ok_np.any():
            continue
        any_ok = True
        _, r_x = dense_topk(q, m, valid, 10, "cosine")
        for b in np.flatnonzero(ok_np):
            assert set(np.asarray(r_c)[b].tolist()) == set(
                np.asarray(r_x)[b].tolist()
            ), f"certified wrong set (seed={seed}, q={b})"
    assert any_ok, "test vacuous: nothing certified across seeds"


@pytest.mark.parametrize("layout", COMPACT_LAYOUTS)
def test_compact_exact_ties_fail_closed(layout):
    rng = np.random.default_rng(3)
    m = rng.standard_normal((2048, 32)).astype(np.float32)
    m[500:521] = m[0]  # 21 exact copies straddle any k=5 boundary
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    q = jnp.asarray(m[0][None, :].copy())
    m = jnp.asarray(m)
    valid = jnp.ones(2048, bool)
    _, _, ok = compact_call(layout, q, m, valid, 5, tile_n=1024, interpret=True)
    assert not bool(np.asarray(ok).any())


@pytest.mark.parametrize("layout", COMPACT_LAYOUTS)
def test_compact_trim_path_certified_sets_exact(layout):
    """rescore_rows=60 < the 128-candidate width triggers the explicit
    trim (thr_exp joins the certificate) — certified sets stay exact."""
    m, q, valid = build(32768, 32, 8, seed=7)
    s_c, r_c, ok = compact_call(
        layout, q, m, valid, 10, tile_n=1024, rescore_rows=60, interpret=True,
    )
    ok_np = np.asarray(ok)
    assert ok_np.any(), "trim test vacuous: nothing certified"
    _, r_x = dense_topk(q, m, valid, 10, "cosine")
    for b in np.flatnonzero(ok_np):
        assert set(np.asarray(r_c)[b].tolist()) == set(np.asarray(r_x)[b].tolist())


@pytest.mark.parametrize("layout", COMPACT_LAYOUTS)
def test_compact_dot_metric(layout):
    m, q, _ = build(4096, 64, 3, seed=5)
    # un-normalize rows so dot != cosine
    rng = np.random.default_rng(5)
    m = jnp.asarray(np.asarray(m) * rng.uniform(0.5, 2.0, (4096, 1)).astype(np.float32))
    valid = jnp.ones(4096, bool)
    s_c, r_c, ok = compact_call(
        layout, q, m, valid, 8, metric="dot", tile_n=1024, interpret=True,
    )
    ok_np = np.asarray(ok)
    _, r_x = dense_topk(q, m, valid, 8, "dot")
    for b in np.flatnonzero(ok_np):
        assert set(np.asarray(r_c)[b].tolist()) == set(np.asarray(r_x)[b].tolist())


@pytest.mark.parametrize("layout", COMPACT_LAYOUTS)
def test_compact_invalid_rows_never_returned(layout):
    m, q, valid = build(4096, 64, 6, seed=13)
    valid_np = np.asarray(valid)
    r_c = np.asarray(
        compact_call(layout, q, m, valid, 20, tile_n=1024, interpret=True)[1]
    )
    for row in r_c.ravel():
        assert row == -1 or valid_np[row]


@pytest.mark.parametrize("layout", COMPACT_LAYOUTS)
def test_compact_short_corpus_truncation(layout):
    """k beyond the candidate width: only certify when provably nothing
    was excluded; rows pad with -1."""
    m, q, valid = build(300, 32, 3, seed=21, invalidate=False)
    s_c, r_c, ok = compact_call(layout, q, m, valid, 40, tile_n=1024, interpret=True)
    assert r_c.shape == (3, 40)
    # n=300 > width=t_top*1 tile: excluded rows exist, must not certify
    assert not bool(np.asarray(ok).any())


# -- inline-cast scan layout (f32 matrix feeds the kernel directly) ---------


def test_tiered2_inline_cast_bit_identical_to_replica():
    """m_bf16=None streams the fp32 matrix through the kernel, casting
    to bf16 in VMEM — the same round-to-nearest-even as prepare_tiered,
    so scores, rows, and certificates must be bit-identical to the
    replica layout (and the checked path stays oracle-exact)."""
    m, q, valid = build(8192, 96, 6, seed=31)
    mb, el2, al2 = prepare_tiered(m)
    a = dense_topk_tiered2(q, m, mb, el2, al2, valid, 12, tile_n=1024, interpret=True)
    b = dense_topk_tiered2(q, m, None, el2, al2, valid, 12, tile_n=1024, interpret=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_tiered2_checked_inline_matches_oracle():
    m, q, valid = build(5000, 64, 7, seed=41)
    _, el2, al2 = prepare_tiered(m)
    s_c, r_c, _ = dense_topk_tiered2_checked(
        q, m, None, el2, al2, valid, 10, tile_n=1024, interpret=True
    )
    s_x, r_x = dense_topk(q, m, valid, 10, "cosine")
    np.testing.assert_array_equal(np.asarray(r_c), np.asarray(r_x))
    np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_x), atol=2e-6, rtol=2e-6)


def test_compact_bf16r_resolves_gaps_bf16_cannot():
    """Plant a rank-k boundary gap between the two rescore intervals
    (~2e-5 for the residual-corrected layout, ~1.7e-3 for bf16-only,
    measured at d=384): bf16-only must fail closed, bf16r must certify
    — and its certified sets must match the fp32 oracle."""
    rng = np.random.default_rng(97)
    n, d, bq, k = 8192, 384, 4, 8
    m = rng.standard_normal((n, d)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    q = rng.standard_normal((bq, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    # planted neighbors at cosine 0.9, 0.9-gap, 0.9-2*gap, ... with
    # gap = 4e-4: each successive pair (incl. the k/k+1 boundary) is
    # separated by ~4e-4 — far above 2e-5, far below 1.7e-3.
    gap = 4e-4
    used = set()
    for b in range(bq):
        for i in range(k + 4):
            # spread across 1024-row selection units: the kernel keeps
            # t_top=4 candidates per unit, so piling plants into one
            # unit is a (correctly fail-closed) selector miss
            row = (31 + b * 97 + i * 661) % n
            assert row not in used
            used.add(row)
            target = 0.9 - gap * i
            u = rng.standard_normal(d).astype(np.float32)
            u -= (u @ q[b]) * q[b]
            u /= np.linalg.norm(u)
            m[row] = target * q[b] + np.sqrt(1.0 - target * target) * u
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    m, q = jnp.asarray(m), jnp.asarray(q)
    valid = jnp.ones(n, bool)
    _, _, ok_b = dense_topk_compact_bf16(
        q, *prepare_tiered(m), valid, k, tile_n=1024, interpret=True
    )
    s_r, r_r, ok_r = dense_topk_compact_bf16r(
        q, *(prepare_tiered(m) + prepare_residual(m)), valid, k,
        tile_n=1024, interpret=True,
    )
    assert not bool(np.asarray(ok_b).any()), "bf16 interval cannot resolve 4e-4"
    assert bool(np.asarray(ok_r).all()), "bf16r interval must resolve 4e-4"
    _, r_x = dense_topk(q, m, valid, k, "cosine")
    for b in range(bq):
        assert set(np.asarray(r_r)[b].tolist()) == set(np.asarray(r_x)[b].tolist())


# -- v3 kernel soundness pins (r3: per-block bound corrections) -------------


def test_scan_select_v3_packed_outputs_are_rigorous_upper_bounds():
    """Direct soundness pin for scan_select_v3 (the r3 kernel behind the
    bf16 tile and compact tiers): every emitted candidate value must be
    >= that row's per-row upper bound s + el2*u + al2*v (v3 emits the
    looser per-block-max correction), and every tile's thr channel must
    be >= the upper bound of every row of the tile NOT among its
    emitted candidates. Computed against a numpy oracle in interpret
    mode."""
    from trueno_rag_tpu.ops.pallas.scan_select_v2 import (
        SEL,
        scan_select_v3,
    )

    rng = np.random.default_rng(3)
    n, d, bq, t_top = 4096, 32, 8, 4
    m = rng.standard_normal((n, d)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    q = rng.standard_normal((bq, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    valid = np.ones(n, bool)
    valid[100:140] = False

    mb, e_l2, a_l2 = prepare_tiered(jnp.asarray(m))
    qb = jnp.asarray(q).astype(jnp.bfloat16)
    u_q = jnp.ones((bq,), jnp.float32) * 1.01
    v_q = jnp.full((bq,), 1e-6, jnp.float32)
    v_pack, r_pack = scan_select_v3(
        qb, mb, e_l2, a_l2, jnp.asarray(valid).astype(jnp.int32),
        u_q, v_q, tile_n=2048, t_top=t_top, interpret=True,
    )
    v_pack, r_pack = np.asarray(v_pack), np.asarray(r_pack)

    # numpy oracle of per-row upper bounds (the quantity v2 computed
    # per row; v3's emissions must dominate it). Both operands are the
    # bf16-rounded values the kernel actually dots — q's own rounding
    # is covered by u_q/v_q in the production bound derivation, not
    # here.
    s = (np.asarray(mb).astype(np.float32)
         @ np.asarray(qb).astype(np.float32).T)  # [n, bq]
    upper = s + np.asarray(e_l2)[:, None] * 1.01 + np.asarray(a_l2)[:, None] * 1e-6
    upper[~valid] = -np.inf

    n_sel = n // SEL
    eps = 1e-5
    for b in range(bq):
        for t in range(n_sel):
            cand_rows = r_pack[b, :, t]
            cand_vals = v_pack[b, :t_top, t]
            thr = v_pack[b, t_top, t]
            tile_rows = np.arange(t * SEL, (t + 1) * SEL)
            emitted = set(int(r) for r in cand_rows)
            for cv, cr in zip(cand_vals, cand_rows):
                if np.isneginf(cv):
                    continue
                assert t * SEL <= cr < (t + 1) * SEL, (b, t, cr)
                assert cv >= upper[cr, b] - eps, (b, t, cr, cv, upper[cr, b])
            unem = [r for r in tile_rows if r not in emitted]
            worst = upper[unem, b].max()
            assert thr >= worst - eps, (b, t, thr, worst)


def test_scan_select_v3_matches_v2_certified_behavior():
    """The v3-backed compact path must produce oracle-exact certified
    sets on a corpus where certification succeeds — and at least one
    query must actually certify (the kernel swap must not silently
    fail everything closed)."""
    n, d, bq, k = 6144, 48, 8, 10
    m, q, valid = build(n, d, bq, seed=9)
    mb, bf_e, bf_a = prepare_tiered(m)
    res = prepare_residual(m)
    s_c, r_c, ok = dense_topk_compact_bf16r(
        q, mb, bf_e, bf_a, *res, valid, k, interpret=True,
        tile_n=2048, rescore_rows=48,
    )
    ok_np = np.asarray(ok)
    assert ok_np.any(), "v3 compact path certified nothing on easy data"
    s_x, r_x = dense_topk(q, m, valid, k, "cosine")
    for i in np.flatnonzero(ok_np):
        assert set(np.asarray(r_c)[i].tolist()) == set(np.asarray(r_x)[i].tolist())


def test_containment_threshold_bounds_every_non_candidate_row():
    """The r4 containment contract (return_candidates): ``thr[b]`` must
    be a SOUND upper bound on the TRUE (f64) score of every row NOT in
    ``cand[b]`` — the exactness of the whole candidate-patch path rests
    on this single inequality, so pin it directly against the oracle
    across random corpora, invalidated rows, and all three compact
    layouts."""
    for seed in (0, 1, 2):
        n, d, bq, k = 6144, 48, 8, 10
        m, q, valid = build(n, d, bq, seed)
        mb, bf_e, bf_a, mi, s_r, i8_e, i8_a = compact_pack(m)
        ri, rs, e2 = prepare_residual(m)
        outs = {
            "bf16r": dense_topk_compact_bf16r(
                q, mb, bf_e, bf_a, ri, rs, e2, valid, k,
                tile_n=1024, interpret=True, return_candidates=True),
            "bf16": dense_topk_compact_bf16(
                q, mb, bf_e, bf_a, valid, k,
                tile_n=1024, interpret=True, return_candidates=True),
            "int8": dense_topk_compact(
                q, mb, bf_e, bf_a, mi, s_r, i8_e, i8_a, valid, k,
                tile_n=1024, interpret=True, return_candidates=True),
        }
        qn = np.asarray(q, np.float64)
        qn /= np.linalg.norm(qn, axis=1, keepdims=True)
        true = qn @ np.asarray(m, np.float64).T  # [B, N]
        true[:, ~np.asarray(valid)] = -np.inf
        for name, out in outs.items():
            cand, thr = np.asarray(out[-2]), np.asarray(out[-1])
            for b in range(bq):
                mask = np.ones(n, bool)
                cr = cand[b]
                cr = cr[(cr >= 0) & (cr < n)]
                mask[cr] = False
                worst = true[b, mask].max()
                assert worst <= thr[b] + 1e-12, (
                    f"{name} seed {seed} q{b}: non-candidate row scores "
                    f"{worst} > threshold {thr[b]}")


def test_clustered_containment_threshold_covers_pruned_tiles():
    """Clustered variant of the pin: the returned threshold must bound
    every row outside the candidate set INCLUDING rows in tiles the
    pruned scan never touched."""
    from trueno_rag_tpu.ops.clustered import (
        apply_cluster_order,
        dense_topk_compact_bf16r_clustered,
        prepare_clustered,
    )

    rng = np.random.default_rng(3)
    n, d, bq, k, tile = 4096, 32, 4, 8, 1024
    # blobby corpus so pruning actually prunes
    centers = rng.standard_normal((4, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    m = np.repeat(centers, n // 4, axis=0) + 0.05 * rng.standard_normal(
        (n, d)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    order, cent, radii = prepare_clustered(m, tile_n=tile, iters=4)
    mp = apply_cluster_order(m, order)
    mb, e_l2, a_l2 = prepare_tiered(jnp.asarray(mp))
    ri, rs, e2 = prepare_residual(jnp.asarray(mp))
    valid = jnp.asarray(order >= 0)
    q = jnp.asarray(
        centers[:bq] + 0.01 * rng.standard_normal((bq, d)).astype(np.float32))
    out = dense_topk_compact_bf16r_clustered(
        q, mb, e_l2, a_l2, ri, rs, e2, valid, k,
        jnp.asarray(cent), jnp.asarray(radii), probe_tiles=2,
        row_map=jnp.asarray(order), tile_n=tile, interpret=True,
        return_candidates=True,
    )
    cand, thr = np.asarray(out[-2]), np.asarray(out[-1])
    qn = np.asarray(q, np.float64)
    qn /= np.linalg.norm(qn, axis=1, keepdims=True)
    true = qn @ m.astype(np.float64).T  # ORIGINAL row space
    for b in range(bq):
        mask = np.ones(n, bool)
        cr = cand[b]
        cr = cr[(cr >= 0) & (cr < n)]
        mask[cr] = False
        worst = true[b, mask].max()
        assert worst <= thr[b] + 1e-12, (
            f"q{b}: pruned/non-candidate row scores {worst} > thr {thr[b]}")


# -- bf16rr: the two-level-residual certification-ceiling layout (r5) -------


def test_prepare_residual2_consistent_and_sound():
    """Level-1 outputs must equal prepare_residual's exactly (one store
    can serve either layout from one prep), and e3_l2 must dominate the
    true two-level reconstruction error while sitting far below e2_l2."""
    from trueno_rag_tpu.ops.dense_tiered import (
        prepare_residual,
        prepare_residual2,
        prepare_tiered,
    )

    rng = np.random.default_rng(5)
    m = rng.standard_normal((600, 384)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    m = jnp.asarray(m)
    r1a, s1a, e2a = (np.asarray(x) for x in prepare_residual(m))
    r1, s1, e2, r2, s2, e3 = (np.asarray(x) for x in prepare_residual2(m))
    # level 1 agrees with prepare_residual up to XLA fusion ulps (the
    # two preps are different graphs; a store uses ONE of them, so
    # bit-equality across functions is not a contract)
    assert (r1 != r1a).mean() < 0.01
    np.testing.assert_allclose(s1, s1a, rtol=1e-6)
    np.testing.assert_allclose(e2, e2a, rtol=1e-4, atol=1e-9)
    mb = np.asarray(prepare_tiered(m)[0]).astype(np.float32)
    e_true = np.asarray(m, np.float64) - mb
    rec = (s1[:, None] * r1.astype(np.float64)
           + s2[:, None] * r2.astype(np.float64))
    resid = np.linalg.norm(e_true - rec, axis=1)
    # e3_l2 (f32, widened at pack time) must dominate the f64-true
    # remainder up to f32 evaluation noise
    assert (resid <= e3 * 1.0001 + 1e-9).all()
    assert np.median(e3) < np.median(e2) / 20  # the whole point


def test_compact_bf16rr_resolves_gaps_bf16r_cannot():
    """Plant rank-boundary gaps of 6e-6 — inside bf16r's ~2.2e-5
    rescore interval (must fail closed) but above bf16rr's ~1.5e-6
    (must certify), with certified sets matching the fp32 oracle."""
    from trueno_rag_tpu.ops.dense_tiered import (
        dense_topk_compact_bf16r,
        dense_topk_compact_bf16rr,
        prepare_residual2,
        prepare_tiered,
    )

    rng = np.random.default_rng(31)
    n, d, bq, k = 8192, 384, 4, 8
    m = rng.standard_normal((n, d)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    q = rng.standard_normal((bq, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    gap = 6e-6
    used = set()
    for b in range(bq):
        for i in range(k + 4):
            row = (31 + b * 97 + i * 661) % n
            assert row not in used
            used.add(row)
            target = 0.9 - gap * i
            u = rng.standard_normal(d).astype(np.float32)
            u -= (u @ q[b]) * q[b]
            u /= np.linalg.norm(u)
            m[row] = target * q[b] + np.sqrt(1.0 - target * target) * u
    # NO re-normalization pass here: f32 normalize perturbs the planted
    # cosines by ~1e-7 each, which at a 6e-6 gap budget is fine — but
    # the rows are unit up to 1e-7 already
    mj, qj = jnp.asarray(m), jnp.asarray(q)
    valid = jnp.ones(n, bool)
    pack1 = prepare_tiered(mj)
    packr = prepare_residual2(mj)
    _, _, ok_r = dense_topk_compact_bf16r(
        qj, *(pack1 + packr[:3]), valid, k, tile_n=1024, interpret=True,
    )
    s2_, r2_, ok_rr = dense_topk_compact_bf16rr(
        qj, *(pack1 + packr), valid, k, tile_n=1024, interpret=True,
    )
    assert not bool(np.asarray(ok_r).any()), "bf16r interval cannot resolve 6e-6"
    assert bool(np.asarray(ok_rr).all()), "bf16rr interval must resolve 6e-6"
    _, r_x = dense_topk(qj, mj, valid, k, "cosine")
    for b in range(bq):
        assert set(np.asarray(r2_)[b].tolist()) == set(np.asarray(r_x)[b].tolist())


def test_compact_bf16rr_random_matches_oracle_fail_closed():
    """Random corpora: every certified bf16rr query's set equals the
    fp32 oracle; the uncertified are flagged, never wrong-certified."""
    from trueno_rag_tpu.ops.dense_tiered import (
        dense_topk_compact_bf16rr,
        prepare_residual2,
        prepare_tiered,
    )

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        # >= k/t_top selection units: the per-tile candidate pool must
        # be able to hold a top-k at all (3 tiles x t_top=4 cannot
        # certify k=10 — structural, layout-independent)
        n, d, bq, k = 8192, 384, 4, 8
        m = rng.standard_normal((n, d)).astype(np.float32)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        q = rng.standard_normal((bq, d)).astype(np.float32)
        mj, qj = jnp.asarray(m), jnp.asarray(q)
        valid = jnp.ones(n, bool)
        s, r, ok = dense_topk_compact_bf16rr(
            qj, *(prepare_tiered(mj) + prepare_residual2(mj)), valid, k,
            tile_n=1024, interpret=True,
        )
        assert np.asarray(ok).any()
        _, r_x = dense_topk(qj, mj, valid, k, "cosine")
        for b in np.flatnonzero(np.asarray(ok)):
            assert set(np.asarray(r)[b].tolist()) == set(np.asarray(r_x)[b].tolist())
