"""MaxSim retrieval ops: the exact scan must match the host oracle, and
the pruned path's certificate must be a PROOF — certified results equal
the full-scan oracle exactly, on arbitrary data."""

import numpy as np
import pytest
import jax.numpy as jnp
from hypothesis import given, settings
from hypothesis import strategies as st

from trueno_rag_tpu.errors import InvalidConfigError
from trueno_rag_tpu.ops.maxsim import (
    maxsim_scan_oracle,
    maxsim_scan_topk,
    maxsim_topk_pruned,
    prepare_maxsim_bounds,
)


def build(n, lt, h, b, lq, seed, ragged=True, tombstones=True, dtype=np.float32):
    rng = np.random.default_rng(seed)
    tokens = rng.standard_normal((n, lt, h)).astype(np.float32)
    tokens /= np.linalg.norm(tokens, axis=2, keepdims=True)
    tokens = tokens.astype(dtype)
    if ragged:
        lens = rng.integers(0, lt + 1, size=n)  # some chunks fully empty
        t_mask = np.arange(lt)[None, :] < lens[:, None]
    else:
        t_mask = np.ones((n, lt), bool)
    q = rng.standard_normal((b, lq, h)).astype(np.float32)
    q /= np.linalg.norm(q, axis=2, keepdims=True)
    q_lens = rng.integers(1, lq + 1, size=b)
    q_mask = np.arange(lq)[None, :] < q_lens[:, None]
    valid = np.ones(n, bool)
    if tombstones:
        valid[n // 7 : n // 5] = False
    return tokens, t_mask, q, q_mask, valid


def to_dev(*arrays):
    return tuple(jnp.asarray(a) for a in arrays)


@pytest.mark.parametrize(
    "n,lt,h,b,lq,k,block",
    [(300, 8, 32, 5, 6, 7, 64), (1000, 5, 16, 3, 4, 10, 512), (64, 3, 8, 2, 2, 70, 16)],
)
def test_scan_matches_oracle(n, lt, h, b, lq, k, block):
    tokens, t_mask, q, q_mask, valid = build(n, lt, h, b, lq, seed=n)
    s_d, r_d = maxsim_scan_topk(*to_dev(q, q_mask, tokens, t_mask, valid), k, block)
    s_o, r_o = maxsim_scan_oracle(q, q_mask, tokens, t_mask, valid, k)
    np.testing.assert_array_equal(np.asarray(r_d), r_o)
    finite = np.isfinite(s_o)
    np.testing.assert_allclose(
        np.asarray(s_d)[finite], s_o[finite], atol=1e-5, rtol=1e-5
    )


def test_scan_tie_break_row_ascending():
    """Chunks with identical token sets score identically; ties resolve
    to the lower row, matching the framework's total order."""
    rng = np.random.default_rng(0)
    base = rng.standard_normal((1, 4, 16)).astype(np.float32)
    tokens = np.repeat(base, 6, axis=0)
    t_mask = np.ones((6, 4), bool)
    q = rng.standard_normal((2, 3, 16)).astype(np.float32)
    q_mask = np.ones((2, 3), bool)
    valid = np.ones(6, bool)
    _, rows = maxsim_scan_topk(*to_dev(q, q_mask, tokens, t_mask, valid), 4, 128)
    np.testing.assert_array_equal(np.asarray(rows), [[0, 1, 2, 3]] * 2)


def test_empty_chunk_scores_zero_and_can_outrank_negatives():
    """An empty (all-padding) chunk scores 0.0 — the reranker's
    semantics — so it outranks chunks whose best matches are negative."""
    h = 8
    q = np.zeros((1, 1, h), np.float32)
    q[0, 0, 0] = 1.0
    q_mask = np.ones((1, 1), bool)
    tokens = np.zeros((3, 2, h), np.float32)
    tokens[0, :, 0] = -0.9  # negative best
    tokens[2, :, 0] = 0.5  # positive best
    t_mask = np.array([[True, True], [False, False], [True, True]])
    valid = np.ones(3, bool)
    s, r = maxsim_scan_topk(*to_dev(q, q_mask, tokens, t_mask, valid), 3, 128)
    np.testing.assert_array_equal(np.asarray(r), [[2, 1, 0]])
    np.testing.assert_allclose(np.asarray(s)[0, 1], 0.0)


@pytest.mark.parametrize("k_bound", [1, 3, 8])
def test_bounds_cover_every_stored_token(k_bound):
    """Every stored token must lie within SOME valid group's radius —
    the soundness base of the certificate — at any K."""
    for dtype in (np.float32, "bfloat16"):
        tokens, t_mask, _, _, _ = build(
            200, 7, 24, 1, 1, seed=3,
            dtype=np.float32 if dtype == np.float32 else jnp.bfloat16,
        )
        tok32 = np.asarray(tokens, np.float32)
        btok, brad, bmask = prepare_maxsim_bounds(tok32, t_mask, k_bound=k_bound)
        # [N, Lt, K] distances token→centroid in f64
        d = np.linalg.norm(
            tok32[:, :, None, :].astype(np.float64)
            - btok[:, None, :, :].astype(np.float64),
            axis=3,
        )
        covered = (d <= brad[:, None, :] + 1e-9) & bmask[:, None, :]
        assert covered.any(axis=2)[t_mask].all()
        # masked-out groups carry zero radius and zero centroid
        assert (brad[~bmask] == 0).all()


@pytest.mark.parametrize("n,lt,h,b,lq,k,rescore", [
    (400, 6, 32, 4, 5, 8, 64),
    (150, 4, 16, 3, 3, 5, 16),
    (50, 3, 8, 2, 2, 10, 64),  # rescore > n, k close to n
])
def test_pruned_certified_matches_oracle(n, lt, h, b, lq, k, rescore):
    tokens, t_mask, q, q_mask, valid = build(n, lt, h, b, lq, seed=n + 1)
    bounds = prepare_maxsim_bounds(np.asarray(tokens, np.float32), t_mask)
    s_p, r_p, cert = maxsim_topk_pruned(
        *to_dev(q, q_mask, tokens, t_mask, *bounds, valid), k, rescore
    )
    s_o, r_o = maxsim_scan_oracle(q, q_mask, tokens, t_mask, valid, k)
    cert = np.asarray(cert)
    assert cert.any(), "random data at this scale should certify some queries"
    for i in np.flatnonzero(cert):
        np.testing.assert_array_equal(np.asarray(r_p)[i], r_o[i])
        finite = np.isfinite(s_o[i])
        np.testing.assert_allclose(
            np.asarray(s_p)[i][finite], s_o[i][finite], atol=1e-5, rtol=1e-5
        )


def test_pruned_short_corpus_certifies_truncated_results():
    """Fewer valid chunks than k: nothing is excluded, so the result is
    certified WITH -1 padding (the ADVICE-r1 truncation rule: only
    certify short results when provably nothing was excluded)."""
    tokens, t_mask, q, q_mask, _ = build(6, 3, 8, 2, 2, seed=9, tombstones=False)
    valid = np.array([True, True, True, False, False, False])
    bounds = prepare_maxsim_bounds(tokens, t_mask)
    s, r, cert = maxsim_topk_pruned(
        *to_dev(q, q_mask, tokens, t_mask, *bounds, valid), 5, 8
    )
    assert bool(np.asarray(cert).all())
    r = np.asarray(r)
    assert (r[:, 3:] == -1).all()
    assert set(r[0, :3]) == {0, 1, 2}


def test_pruned_rescore_below_k_rejected():
    tokens, t_mask, q, q_mask, valid = build(20, 2, 8, 1, 1, seed=1)
    bounds = prepare_maxsim_bounds(tokens, t_mask)
    with pytest.raises(InvalidConfigError):
        maxsim_topk_pruned(
            *to_dev(q, q_mask, tokens, t_mask, *bounds, valid), 8, 4
        )


def test_pruned_uncertified_on_tight_rescore_stays_sound():
    """A rescore budget of exactly k on concentrated data should leave
    some queries uncertified — and NEVER certify a wrong set."""
    rng = np.random.default_rng(7)
    # concentrated corpus: all chunks near one direction, so bounds
    # overlap heavily and C=k pruning cannot separate them
    base = rng.standard_normal((1, 1, 24)).astype(np.float32)
    tokens = base + 0.01 * rng.standard_normal((500, 4, 24)).astype(np.float32)
    tokens /= np.linalg.norm(tokens, axis=2, keepdims=True)
    t_mask = np.ones((500, 4), bool)
    q = rng.standard_normal((6, 3, 24)).astype(np.float32)
    q_mask = np.ones((6, 3), bool)
    valid = np.ones(500, bool)
    bounds = prepare_maxsim_bounds(tokens, t_mask)
    s_p, r_p, cert = maxsim_topk_pruned(
        *to_dev(q, q_mask, tokens, t_mask, *bounds, valid), 10, 10
    )
    s_o, r_o = maxsim_scan_oracle(q, q_mask, tokens, t_mask, valid, 10)
    for i in range(6):
        if np.asarray(cert)[i]:
            np.testing.assert_array_equal(np.asarray(r_p)[i], r_o[i])


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(1, 12), st.integers(8, 40))
def test_pruned_certificate_fail_closed_property(seed, k, rescore):
    """On ARBITRARY data (duplicates, empties, tombstones, adversarial
    scales), every certified query's row set equals the oracle's
    exactly. Uncertified queries make no claim."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(k, 120))
    lt, h = int(rng.integers(1, 6)), int(rng.integers(4, 24))
    b, lq = int(rng.integers(1, 4)), int(rng.integers(1, 5))
    rescore = max(rescore, k)
    tokens = (rng.standard_normal((n, lt, h)) * rng.choice([1e-3, 1.0, 50.0])).astype(np.float32)
    if n > 3 and bool(rng.integers(0, 2)):
        tokens[1] = tokens[0]  # exact duplicate chunk
    t_mask = rng.random((n, lt)) < 0.8
    q = rng.standard_normal((b, lq, h)).astype(np.float32)
    q_mask = rng.random((b, lq)) < 0.9
    q_mask[:, 0] = True
    valid = rng.random(n) < 0.9
    bounds = prepare_maxsim_bounds(tokens, t_mask)
    s_p, r_p, cert = maxsim_topk_pruned(
        *to_dev(q, q_mask, tokens, t_mask, *bounds, valid), k, rescore
    )
    s_o, r_o = maxsim_scan_oracle(q, q_mask, tokens, t_mask, valid, k)
    for i in np.flatnonzero(np.asarray(cert)):
        np.testing.assert_array_equal(np.asarray(r_p)[i], r_o[i])


def test_bf16_storage_scan_is_exact_over_stored_values():
    """bf16 token storage: the scan is exact over the UPCAST stored
    values (the framework's storage-dtype contract)."""
    tokens, t_mask, q, q_mask, valid = build(
        120, 4, 16, 3, 3, seed=5, dtype=jnp.bfloat16
    )
    tok32 = np.asarray(tokens, np.float32)
    s_d, r_d = maxsim_scan_topk(*to_dev(q, q_mask, tokens, t_mask, valid), 6, 64)
    s_o, r_o = maxsim_scan_oracle(q, q_mask, tok32, t_mask, valid, 6)
    np.testing.assert_array_equal(np.asarray(r_d), r_o)


# ---------------------------------------------------------------------------
# token-level pruned path
# ---------------------------------------------------------------------------

from trueno_rag_tpu.ops.maxsim import maxsim_topk_token_pruned  # noqa: E402


def structured(n, lt, h, b, lq, seed, n_topics=64, noise=0.15):
    """Topic-clustered token embeddings — what encoder outputs look
    like, and the regime where the covering-radius bound measured 0/8
    certified while the token-level bound certifies."""
    rng = np.random.default_rng(seed)
    topics = rng.standard_normal((n_topics, h)).astype(np.float32)
    topics /= np.linalg.norm(topics, axis=1, keepdims=True)
    tok = topics[rng.integers(0, n_topics, size=(n, lt))]
    tok = tok + noise * rng.standard_normal((n, lt, h)).astype(np.float32)
    tok /= np.linalg.norm(tok, axis=2, keepdims=True)
    lens = rng.integers(1, lt + 1, size=n)
    t_mask = np.arange(lt)[None, :] < lens[:, None]
    q = topics[rng.integers(0, n_topics, size=(b, lq))]
    q = q + noise * rng.standard_normal((b, lq, h)).astype(np.float32)
    q = (q / np.linalg.norm(q, axis=2, keepdims=True)).astype(np.float32)
    q_mask = np.ones((b, lq), bool)
    valid = np.ones(n, bool)
    return tok.astype(np.float32), t_mask, q, q_mask, valid


def test_token_pruned_certifies_on_structured_data():
    tok, tm, q, qm, valid = structured(3000, 8, 32, 6, 4, seed=11)
    s_p, r_p, cert = maxsim_topk_token_pruned(
        *to_dev(q, qm, tok, tm, valid), 10, t_hits=1024, rescore=512
    )
    s_o, r_o = maxsim_scan_oracle(q, qm, tok, tm, valid, 10)
    cert = np.asarray(cert)
    assert cert.sum() >= 4, f"expected most queries certified, got {cert.sum()}/6"
    for i in np.flatnonzero(cert):
        np.testing.assert_array_equal(np.asarray(r_p)[i], r_o[i])
        np.testing.assert_allclose(
            np.asarray(s_p)[i], s_o[i], atol=1e-5, rtol=1e-5
        )


def test_token_pruned_short_corpus_certifies_truncated():
    tok, tm, q, qm, _ = build(6, 3, 8, 2, 2, seed=9, tombstones=False)
    valid = np.array([True, True, True, False, False, False])
    s, r, cert = maxsim_topk_token_pruned(
        *to_dev(q, qm, tok, tm, valid), 5, t_hits=64, rescore=8
    )
    assert bool(np.asarray(cert).all())
    r = np.asarray(r)
    assert (r[:, 3:] == -1).all()
    assert set(r[0, :3]) == {0, 1, 2}


def test_token_pruned_empty_chunk_blocks_false_certificates():
    """A valid empty chunk scores exactly 0 and is never a token-level
    candidate; when 0 would make the true top-k, the certificate must
    fail rather than return a set missing it."""
    rng = np.random.default_rng(3)
    h = 16
    # all real chunks score NEGATIVELY against the query; the empty
    # chunk (score 0) belongs at rank 1
    q = np.zeros((1, 2, h), np.float32); q[:, :, 0] = 1.0
    qm = np.ones((1, 2), bool)
    tok = -np.abs(rng.standard_normal((50, 3, h)).astype(np.float32))
    tok[:, :, 0] = -0.5
    tm = np.ones((50, 3), bool)
    tm[7] = False  # chunk 7 is empty but valid
    valid = np.ones(50, bool)
    s, r, cert = maxsim_topk_token_pruned(
        *to_dev(q, qm, tok, tm, valid), 3, t_hits=8, rescore=8
    )
    s_o, r_o = maxsim_scan_oracle(q, qm, tok, tm, valid, 3)
    assert r_o[0, 0] == 7  # oracle puts the empty chunk first
    if bool(np.asarray(cert)[0]):
        np.testing.assert_array_equal(np.asarray(r)[0], r_o[0])


def test_token_pruned_rescore_below_k_rejected():
    tok, tm, q, qm, valid = build(20, 2, 8, 1, 1, seed=1)
    with pytest.raises(InvalidConfigError):
        maxsim_topk_token_pruned(*to_dev(q, qm, tok, tm, valid), 8, 16, 4)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(1, 12), st.integers(4, 64))
def test_token_pruned_certificate_fail_closed_property(seed, k, t_hits):
    """On ARBITRARY data every certified query's rows equal the
    oracle's exactly; uncertified queries make no claim."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(k, 120))
    lt, h = int(rng.integers(1, 6)), int(rng.integers(4, 24))
    b, lq = int(rng.integers(1, 4)), int(rng.integers(1, 5))
    rescore = int(rng.integers(k, 2 * k + 8))
    tokens = (rng.standard_normal((n, lt, h)) * rng.choice([1e-3, 1.0, 50.0])).astype(np.float32)
    if n > 3 and bool(rng.integers(0, 2)):
        tokens[1] = tokens[0]
    t_mask = rng.random((n, lt)) < 0.8
    q = rng.standard_normal((b, lq, h)).astype(np.float32)
    q_mask = rng.random((b, lq)) < 0.9
    q_mask[:, 0] = True
    valid = rng.random(n) < 0.9
    s_p, r_p, cert = maxsim_topk_token_pruned(
        *to_dev(q, q_mask, tokens, t_mask, valid), k, t_hits, rescore
    )
    assert not np.isnan(np.asarray(s_p)[np.isfinite(np.asarray(s_p))]).any()
    s_o, r_o = maxsim_scan_oracle(q, q_mask, tokens, t_mask, valid, k)
    for i in np.flatnonzero(np.asarray(cert)):
        np.testing.assert_array_equal(np.asarray(r_p)[i], r_o[i])
