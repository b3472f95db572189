"""int8 tiered dense top-k (exact-dequant int8 scan + verified fp32
rescore): same exactness contract as the bf16 tier — the checked wrapper
must ALWAYS match the fp32 oracle; certification failures fall back."""

import numpy as np
import pytest
import jax.numpy as jnp

from trueno_rag_tpu.ops.dense import dense_topk
from trueno_rag_tpu.ops.dense_tiered import (
    dense_topk_int8,
    dense_topk_int8_checked,
    prepare_int8,
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


def test_prepare_int8_scales_tight_and_residuals_exact():
    m, _, _ = build(512, 64, 1, seed=0)
    m_i8, s, e_l2, a_l2 = prepare_int8(m)
    s_np = np.asarray(s)
    amax = np.abs(np.asarray(m)).max(axis=1)
    np.testing.assert_allclose(s_np, amax / 127.0, rtol=1e-6)  # tightest scale
    a = np.asarray(m_i8, dtype=np.float32) * s_np[:, None]
    # XLA may fuse m − m_i8·s into an FMA, so the measured residual can
    # differ from numpy's two-step rounding by ~1 ulp per element; the
    # rigor of the bound is asserted in float64 by
    # test_int8_bound_is_rigorous, not here.
    np.testing.assert_allclose(
        np.asarray(e_l2), np.linalg.norm(np.asarray(m) - a, axis=1), rtol=1e-4, atol=1e-7
    )
    assert np.abs(np.asarray(m_i8)).max() <= 127


@pytest.mark.parametrize(
    "n,d,bq,k", [(5000, 64, 7, 10), (20000, 384, 4, 50), (300, 32, 3, 7), (1000, 48, 5, 13)]
)
def test_int8_checked_matches_oracle(n, d, bq, k):
    m, q, valid = build(n, d, bq, seed=n)
    mi, s, el2, al2 = prepare_int8(m)
    s_c, r_c, _ = dense_topk_int8_checked(
        q, m, mi, s, el2, al2, valid, k, use_int8_mxu=False, interpret=True
    )
    s_x, r_x = dense_topk(q, m, valid, k, "cosine")
    np.testing.assert_array_equal(np.asarray(r_c), np.asarray(r_x))
    np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_x), atol=2e-6, rtol=2e-6)


def test_int8_certified_results_are_exact():
    for seed in range(5):
        m, q, valid = build(8192, 96, 6, seed)
        mi, s, el2, al2 = prepare_int8(m)
        s_t, r_t, ok = dense_topk_int8(
            q, m, mi, s, el2, al2, valid, 12, use_int8_mxu=False, interpret=True
        )
        if not bool(ok.all()):
            continue
        s_x, r_x = dense_topk(q, m, valid, 12, "cosine")
        np.testing.assert_array_equal(np.asarray(r_t), np.asarray(r_x))


def test_int8_mxu_paths_bit_identical():
    """Native int8 dot and the bf16-cast dot must agree bitwise — both
    are exact integer arithmetic below 2^24 (interpret mode checks the
    math; the real-device check lives in the benches)."""
    m, q, valid = build(4096, 128, 5, seed=11)
    mi, s, el2, al2 = prepare_int8(m)
    a = dense_topk_int8(q, m, mi, s, el2, al2, valid, 9, use_int8_mxu=True, interpret=True)
    b = dense_topk_int8(q, m, mi, s, el2, al2, valid, 9, use_int8_mxu=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))


def test_int8_exact_ties_fail_closed():
    rng = np.random.default_rng(3)
    m = rng.standard_normal((1000, 32)).astype(np.float32)
    m[500:521] = m[0]
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    q = jnp.asarray(m[0][None, :].copy())
    m = jnp.asarray(m)
    mi, s, el2, al2 = prepare_int8(m)
    valid = jnp.ones(1000, bool)
    s_c, r_c, fb = dense_topk_int8_checked(
        q, m, mi, s, el2, al2, valid, 5, use_int8_mxu=False, interpret=True
    )
    s_x, r_x = dense_topk(q, m, valid, 5, "cosine")
    assert fb  # surplus exact ties cannot be certified
    np.testing.assert_array_equal(np.asarray(r_c), np.asarray(r_x))


def test_int8_dot_metric_and_euclidean_rejection():
    m, q, valid = build(2048, 64, 4, seed=9)
    mi, s, el2, al2 = prepare_int8(m)
    s_c, r_c, _ = dense_topk_int8_checked(
        q, m, mi, s, el2, al2, valid, 9, metric="dot", use_int8_mxu=False, interpret=True
    )
    s_x, r_x = dense_topk(q, m, valid, 9, "dot")
    np.testing.assert_array_equal(np.asarray(r_c), np.asarray(r_x))
    from trueno_rag_tpu.errors import InvalidConfigError

    with pytest.raises(InvalidConfigError):
        dense_topk_int8(
            q, m, mi, s, el2, al2, valid, 9, metric="euclidean", interpret=True
        )


def test_int8_bound_is_rigorous():
    """upper = exact-dequant approx + e_l2·u + a_l2·v must dominate the
    true score for every (query, row) — verified in float64."""
    rng = np.random.default_rng(17)
    n, d, bq = 4096, 80, 5
    m = rng.standard_normal((n, d)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    q = rng.standard_normal((bq, d)).astype(np.float32)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    mj = jnp.asarray(m)
    m_i8, s, el2, al2 = prepare_int8(mj)

    t_amax = np.abs(q).max(axis=1)
    t = (t_amax / 127.0).astype(np.float32)
    q_i8 = np.clip(np.round(q / t[:, None]), -127, 127).astype(np.int8)
    b_vec = q_i8.astype(np.float32) * t[:, None]
    f = q - b_vec
    b_l2 = np.linalg.norm(b_vec, axis=1)
    f_l2 = np.linalg.norm(f, axis=1)
    u = (b_l2 + f_l2) * 1.0001 + 1e-7
    v = (f_l2 + 4e-7 * b_l2) * 1.0001 + 1e-7

    dot = q_i8.astype(np.int64) @ np.asarray(m_i8).astype(np.int64).T
    # f32 cast + two f32 scale multiplies, matching the kernel's rounding
    approx = (dot.astype(np.float32) * np.asarray(s)[None, :]).astype(np.float32) * t[:, None]
    upper = approx + np.asarray(el2)[None, :] * u[:, None] + np.asarray(al2)[None, :] * v[:, None]
    true = q.astype(np.float64) @ m.astype(np.float64).T
    assert (upper + 1e-6 >= true).all(), float((true - upper).max())


def test_int8_zero_rows_and_zero_query():
    """All-zero rows quantize to scale 1 / residual 0; a zero query is
    handled by the cosine zero-norm guard."""
    rng = np.random.default_rng(5)
    m = rng.standard_normal((600, 40)).astype(np.float32)
    m[100:110] = 0.0
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    m = np.where(norms > 0, m / np.where(norms == 0, 1.0, norms), 0.0).astype(np.float32)
    q = np.zeros((2, 40), np.float32)
    q[1] = rng.standard_normal(40)
    mj, qj = jnp.asarray(m), jnp.asarray(q)
    valid = jnp.ones(600, bool)
    mi, s, el2, al2 = prepare_int8(mj)
    assert float(jnp.max(jnp.abs(el2[100:110]))) == 0.0
    s_c, r_c, _ = dense_topk_int8_checked(
        qj, mj, mi, s, el2, al2, valid, 7, use_int8_mxu=False, interpret=True
    )
    s_x, r_x = dense_topk(qj, mj, valid, 7, "cosine")
    np.testing.assert_array_equal(np.asarray(r_c), np.asarray(r_x))


def test_partial_batch_fallback_patches_only_failing_queries():
    """One tie-poisoned query must not force the whole batch to the
    fp32 path: certified queries keep tier results, the failing query is
    patched from the fp32 fallback, and EVERY query matches the oracle."""
    rng = np.random.default_rng(23)
    m = rng.standard_normal((4096, 64)).astype(np.float32)
    m[2000:2021] = m[0]  # exact duplicates → uncertifiable ties vs row 0
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    q = rng.standard_normal((5, 64)).astype(np.float32)
    q[2] = m[0]  # this query hits the tie wall
    mj, qj = jnp.asarray(m), jnp.asarray(q)
    valid = jnp.ones(4096, bool)
    mi, s, el2, al2 = prepare_int8(mj)
    _, _, certm = dense_topk_int8(
        qj, mj, mi, s, el2, al2, valid, 5, use_int8_mxu=False, interpret=True
    )
    certm = np.asarray(certm)
    assert not certm[2] and certm.sum() >= 1  # mixed batch
    s_c, r_c, fb = dense_topk_int8_checked(
        qj, mj, mi, s, el2, al2, valid, 5, use_int8_mxu=False, interpret=True
    )
    assert fb
    s_x, r_x = dense_topk(qj, mj, valid, 5, "cosine")
    np.testing.assert_array_equal(np.asarray(r_c), np.asarray(r_x))


def test_int8_rescore_rows_trim_matches_oracle():
    """Trimmed-tail exactness contract on the int8 tier."""
    for rr in (16, 40):
        m, q, valid = build(5000, 96, 5, seed=100 + rr)
        m8, sr, el2, al2 = prepare_int8(m)
        s_c, r_c, _ = dense_topk_int8_checked(
            q, m, m8, sr, el2, al2, valid, 11, rescore_rows=rr, interpret=True
        )
        s_x, r_x = dense_topk(q, m, valid, 11, "cosine")
        np.testing.assert_array_equal(np.asarray(r_c), np.asarray(r_x))
        np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_x), atol=2e-6, rtol=2e-6)
