"""Tiered dense top-k (bf16 scan + verified fp32 rescore): the checked
wrapper must ALWAYS match the fp32 oracle exactly — certification
failures fall back, never degrade results."""

import numpy as np
import pytest
import jax.numpy as jnp

from trueno_rag_tpu.ops.dense import dense_topk
from trueno_rag_tpu.ops.dense_tiered import (
    dense_topk_tiered,
    dense_topk_tiered_checked,
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


@pytest.mark.parametrize(
    "n,d,bq,k", [(5000, 64, 7, 10), (20000, 384, 4, 50), (300, 32, 3, 7), (1000, 48, 5, 13)]
)
def test_tiered_checked_matches_oracle(n, d, bq, k):
    m, q, valid = build(n, d, bq, seed=n)
    mb, el2, al2 = prepare_tiered(m)
    s_c, r_c, _ = dense_topk_tiered_checked(q, m, mb, el2, al2, valid, k, interpret=True)
    s_x, r_x = dense_topk(q, m, valid, k, "cosine")
    np.testing.assert_array_equal(np.asarray(r_c), np.asarray(r_x))
    np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_x), atol=2e-6, rtol=2e-6)


def test_tiered_certified_results_are_exact():
    """Whenever the certificate fires, results must equal the oracle
    bit-for-bit (rows) — the certificate is a proof, not a heuristic."""
    for seed in range(5):
        m, q, valid = build(8192, 96, 6, seed)
        mb, el2, al2 = prepare_tiered(m)
        s_t, r_t, ok = dense_topk_tiered(q, m, mb, el2, al2, valid, 12, interpret=True)
        if not bool(ok.all()):
            continue
        s_x, r_x = dense_topk(q, m, valid, 12, "cosine")
        np.testing.assert_array_equal(np.asarray(r_t), np.asarray(r_x))


def test_tiered_exact_ties_fail_closed():
    """Duplicated rows create exact ties at the k boundary; the
    certificate must fail (strict >) and the checked wrapper must fall
    back to the fp32 path, preserving (score desc, row asc)."""
    rng = np.random.default_rng(3)
    m = rng.standard_normal((1000, 32)).astype(np.float32)
    m[500:521] = m[0]
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    q = jnp.asarray(m[0][None, :].copy())
    m = jnp.asarray(m)
    mb, el2, al2 = prepare_tiered(m)
    valid = jnp.ones(1000, bool)
    s_c, r_c, fb = dense_topk_tiered_checked(q, m, mb, el2, al2, valid, 5, interpret=True)
    s_x, r_x = dense_topk(q, m, valid, 5, "cosine")
    assert fb  # 16 surplus exact ties cannot be certified
    np.testing.assert_array_equal(np.asarray(r_c), np.asarray(r_x))


def test_tiered_dot_metric_and_euclidean_rejection():
    m, q, valid = build(2048, 64, 4, seed=9)
    mb, el2, al2 = prepare_tiered(m)
    s_c, r_c, _ = dense_topk_tiered_checked(
        q, m, mb, el2, al2, valid, 9, metric="dot", interpret=True
    )
    s_x, r_x = dense_topk(q, m, valid, 9, "dot")
    np.testing.assert_array_equal(np.asarray(r_c), np.asarray(r_x))
    from trueno_rag_tpu.errors import InvalidConfigError

    with pytest.raises(InvalidConfigError):
        dense_topk_tiered(q, m, mb, el2, al2, valid, 9, metric="euclidean", interpret=True)


def test_tiered_bound_is_rigorous():
    """The analytic upper bound must dominate the true fp32 score for
    every (query, row) — checked directly against the bf16 scan."""
    rng = np.random.default_rng(17)
    n, d, bq = 4096, 80, 5
    m = rng.standard_normal((n, d)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    q = rng.standard_normal((bq, d)).astype(np.float32)
    qn = np.linalg.norm(q, axis=1, keepdims=True)
    q = q / qn
    mj = jnp.asarray(m)
    mb, el2, al2 = prepare_tiered(mj)
    qb = jnp.asarray(q).astype(jnp.bfloat16)
    approx = np.asarray(
        jnp.dot(qb, jnp.asarray(mb).T, preferred_element_type=jnp.float32)
    )
    f = q - np.asarray(qb, dtype=np.float32)
    b_l2 = np.linalg.norm(np.asarray(qb, dtype=np.float32), axis=1)
    f_l2 = np.linalg.norm(f, axis=1)
    acc = d * 2.0**-23
    u = (b_l2 + f_l2) * 1.0001 + 1e-7
    v = (f_l2 + acc * b_l2) * 1.0001 + 1e-7
    upper = approx + np.asarray(el2)[None, :] * u[:, None] + np.asarray(al2)[None, :] * v[:, None]
    true = q.astype(np.float64) @ m.astype(np.float64).T  # oracle scores
    assert (upper + 1e-6 >= true).all(), float((true - upper).max())


@pytest.mark.parametrize("rr", [8, 24, 64, 10_000])
def test_tiered_rescore_rows_trim_matches_oracle(rr):
    """The global candidate-row trim must preserve the exactness
    contract: the checked wrapper equals the fp32 oracle for any
    rescore_rows, including over-large (no-op) values."""
    m, q, valid = build(6000, 96, 5, seed=rr)
    mb, el2, al2 = prepare_tiered(m)
    s_c, r_c, _ = dense_topk_tiered_checked(
        q, m, mb, el2, al2, valid, 11, rescore_rows=rr, interpret=True
    )
    s_x, r_x = dense_topk(q, m, valid, 11, "cosine")
    np.testing.assert_array_equal(np.asarray(r_c), np.asarray(r_x))
    np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_x), atol=2e-6, rtol=2e-6)


def test_tiered_trim_certified_results_are_exact():
    """When the trimmed-tail certificate fires, rows must equal the
    oracle — the extra thr_exp threshold keeps the proof sound."""
    hits = 0
    for seed in range(6):
        m, q, valid = build(8192, 96, 6, seed)
        mb, el2, al2 = prepare_tiered(m)
        s_t, r_t, ok = dense_topk_tiered(
            q, m, mb, el2, al2, valid, 12, rescore_rows=48, interpret=True
        )
        if not bool(ok.all()):
            continue
        hits += 1
        s_x, r_x = dense_topk(q, m, valid, 12, "cosine")
        np.testing.assert_array_equal(np.asarray(r_t), np.asarray(r_x))
    assert hits  # the trim must certify at least sometimes on random data


def test_prepare_residuals_are_nonzero():
    """Regression: XLA on TPU folds the f32→bf16→f32 convert pair back
    to the input unless blocked by an optimization barrier, which zeroes
    e_l2 and silently voids the certificate's quantization-error term
    (observed on hardware). The packed residual of a generic random
    matrix must be positive on EVERY backend."""
    m, _, _ = build(2048, 64, 1, seed=77)
    _, el2, al2 = prepare_tiered(m)
    assert float(jnp.min(el2)) > 0.0
    assert float(jnp.min(al2)) > 0.0


@pytest.mark.parametrize("bt", [1, 2, 3])
def test_block_top_variants_keep_exactness_contract(bt):
    """Any block_top keeps the checked wrapper exact — fewer in-block
    candidate slots only raise the fail-closed certificate's strictness
    (top+1 clustered true-top rows in one 128-row block)."""
    m, q, valid = build(6000, 64, 5, seed=40 + bt)
    mb, el2, al2 = prepare_tiered(m)
    s_c, r_c, _ = dense_topk_tiered_checked(
        q, m, mb, el2, al2, valid, 11, block_top=bt, rescore_rows=64, interpret=True
    )
    s_x, r_x = dense_topk(q, m, valid, 11, "cosine")
    np.testing.assert_array_equal(np.asarray(r_c), np.asarray(r_x))


def test_topk_select_threshold_bounds_all_unselected():
    """Soundness property of the scatter-free selector: for every row,
    either threshold == +inf (failed closed) or threshold >= every
    value NOT in the selected index set — in both exact and approx
    modes, including tie-heavy inputs."""
    from trueno_rag_tpu.ops.dense_tiered import _topk_select

    rng = np.random.default_rng(11)
    for trial in range(8):
        b, g, k = 5, 64, 7
        vals = rng.standard_normal((b, g)).astype(np.float32)
        if trial % 2:  # inject heavy exact ties
            vals[:, : g // 2] = np.round(vals[:, : g // 2] * 4) / 4
        for approx in (False, True):
            idx, thr = _topk_select(jnp.asarray(vals), k, approx)
            idx = np.asarray(idx)
            thr = np.asarray(thr)
            for row in range(b):
                if np.isposinf(thr[row]):
                    continue  # failed closed — always sound
                unsel = np.setdiff1d(np.arange(g), idx[row])
                assert vals[row, unsel].max() <= thr[row] + 1e-7, (
                    trial, approx, row)


def test_truncated_candidates_fail_closed():
    """ADVICE r1 (high): when the candidate width block_top*kb is
    smaller than k_req, the tier can only return a truncated result —
    it must NOT certify while excluded rows may exist (threshold >
    -inf), or the checked wrapper would skip the fp32 fallback and
    break the exactness contract.

    Construction: 256 rows in 2 blocks (tile_n=256), two dominant rows
    per block and everything else orthogonal to the query, so the
    4-candidate truncated result decisively beats the in-block
    threshold — exactly the shape that certified pre-fix."""
    rng = np.random.default_rng(7)
    d = 32
    q = rng.standard_normal((1, d)).astype(np.float32)
    qn = (q / np.linalg.norm(q))[0]
    m = rng.standard_normal((256, d)).astype(np.float32)
    m -= np.outer(m @ qn, qn)  # orthogonal to the query
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    for r, c in ((0, 0.99), (1, 0.98), (128, 0.97), (129, 0.96)):
        orth = m[r].copy()
        m[r] = c * qn + np.sqrt(1.0 - c * c) * orth
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    mj, qj, vj = jnp.asarray(m), jnp.asarray(q), jnp.asarray(np.ones(256, bool))
    mb, el2, al2 = prepare_tiered(mj)
    k = 12
    s_t, r_t, ok = dense_topk_tiered(
        qj, mj, mb, el2, al2, vj, k, tile_n=256, block_top=2, interpret=True
    )
    assert int((np.asarray(r_t) >= 0).sum()) < k, "construction must truncate"
    assert not bool(np.asarray(ok).any()), "truncated result must not certify"
    s_c, r_c, _ = dense_topk_tiered_checked(
        qj, mj, mb, el2, al2, vj, k, tile_n=256, block_top=2, interpret=True
    )
    s_x, r_x = dense_topk(qj, mj, vj, k, "cosine")
    np.testing.assert_array_equal(np.asarray(r_c), np.asarray(r_x))
    np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_x), atol=2e-6, rtol=2e-6)
