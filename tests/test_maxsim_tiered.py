"""Tiered MaxSim scans (bf16 / int8 replicas): certified results must
equal the full-scan oracle exactly on arbitrary data, the tiers must
actually certify on realistic data, and the TokenVectorStore integration
must be fail-closed with exact-scan fallback."""

import numpy as np
import pytest
import jax.numpy as jnp
from hypothesis import given, settings
from hypothesis import strategies as st

from trueno_rag_tpu.errors import InvalidConfigError
from trueno_rag_tpu.ops.maxsim import (
    maxsim_scan_oracle,
    maxsim_topk_int8,
    maxsim_topk_int8_fused,
    maxsim_topk_scan16,
    maxsim_topk_scan16_fused,
    prepare_maxsim_int8,
    prepare_maxsim_scan16,
)
from tests.test_maxsim import build, structured, to_dev


def run_scan16(tokens, t_mask, q, q_mask, valid, k, rescore, block=128):
    td = jnp.asarray(tokens)
    pack = prepare_maxsim_scan16(td, jnp.asarray(t_mask))
    return maxsim_topk_scan16(
        *to_dev(q, q_mask), td, jnp.asarray(t_mask), *pack,
        jnp.asarray(valid), k, rescore, block
    )


def run_int8(tokens, t_mask, q, q_mask, valid, k, rescore, block=128):
    td = jnp.asarray(tokens)
    pack = prepare_maxsim_int8(td, jnp.asarray(t_mask))
    return maxsim_topk_int8(
        *to_dev(q, q_mask), td, jnp.asarray(t_mask), *pack,
        jnp.asarray(valid), k, rescore, block
    )


def run_fused(tokens, t_mask, q, q_mask, valid, k, rescore, block=128):
    """The fused-kernel bf16 tier (interpret mode on the CPU suite);
    same certified contract as run_scan16, wider bound (bf16 query)."""
    td = jnp.asarray(tokens)
    pack = prepare_maxsim_scan16(td, jnp.asarray(t_mask))
    return maxsim_topk_scan16_fused(
        *to_dev(q, q_mask), td, jnp.asarray(t_mask), *pack,
        jnp.asarray(valid), k, rescore, interpret=True
    )


def run_fused8(tokens, t_mask, q, q_mask, valid, k, rescore, block=128):
    """The fused-kernel int8 tier (interpret mode on the CPU suite)."""
    td = jnp.asarray(tokens)
    pack = prepare_maxsim_int8(td, jnp.asarray(t_mask))
    return maxsim_topk_int8_fused(
        *to_dev(q, q_mask), td, jnp.asarray(t_mask), *pack,
        jnp.asarray(valid), k, rescore, interpret=True
    )


# ---------------------------------------------------------------------------
# prep soundness
# ---------------------------------------------------------------------------


def test_scan16_residuals_cover_every_token():
    """e_max must dominate every valid token's bf16 residual, and n_max
    both norms — the soundness base of the bf16 certificate."""
    tokens, t_mask, _, _, _ = build(200, 6, 24, 1, 1, seed=2)
    tok16, e_max, n_max = prepare_maxsim_scan16(
        jnp.asarray(tokens), jnp.asarray(t_mask)
    )
    e_max, n_max = np.asarray(e_max), np.asarray(n_max)
    a = np.asarray(tok16, np.float32).astype(np.float64)
    e = tokens.astype(np.float64) - a
    e_l2 = np.linalg.norm(e, axis=2)
    a_l2 = np.linalg.norm(a, axis=2)
    for c in range(200):
        m = t_mask[c]
        if not m.any():
            continue
        assert e_l2[c][m].max() <= e_max[c] + 1e-12
        assert (a_l2[c][m] + e_l2[c][m]).max() <= n_max[c] * (1 + 1e-6) + 1e-12
    # unit tokens quantize with a real, nonzero residual
    assert (e_max[t_mask.any(axis=1)] > 0).all()


def test_int8_residuals_cover_every_token():
    tokens, t_mask, _, _, _ = build(150, 5, 16, 1, 1, seed=4)
    tok8, s_tok, e_max, n_max = prepare_maxsim_int8(
        jnp.asarray(tokens), jnp.asarray(t_mask)
    )
    a = np.asarray(tok8, np.float32).astype(np.float64) * np.asarray(
        s_tok, np.float64
    )[:, :, None]
    e = tokens.astype(np.float64) - a
    e_l2 = np.linalg.norm(e, axis=2)
    a_l2 = np.linalg.norm(a, axis=2)
    e_max, n_max = np.asarray(e_max), np.asarray(n_max)
    for c in range(150):
        m = t_mask[c]
        if not m.any():
            continue
        assert e_l2[c][m].max() <= e_max[c] + 1e-12
        assert (a_l2[c][m] + e_l2[c][m]).max() <= n_max[c] * (1 + 1e-6) + 1e-12


# ---------------------------------------------------------------------------
# certified exactness
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("runner", [run_scan16, run_int8, run_fused, run_fused8],
                         ids=["bf16", "int8", "fused", "fused8"])
@pytest.mark.parametrize("n,lt,h,b,lq,k,rescore", [
    (400, 6, 32, 4, 5, 8, 128),
    (150, 4, 16, 3, 3, 5, 64),
    (50, 3, 8, 2, 2, 10, 64),  # rescore > n, k close to n
])
def test_tier_certified_matches_oracle(runner, n, lt, h, b, lq, k, rescore):
    tokens, t_mask, q, q_mask, valid = build(n, lt, h, b, lq, seed=n + 1)
    s_t, r_t, cert = runner(tokens, t_mask, q, q_mask, valid, k, rescore)
    s_o, r_o = maxsim_scan_oracle(q, q_mask, tokens, t_mask, valid, k)
    cert = np.asarray(cert)
    assert cert.any(), "quantization noise ≪ random score gaps: must certify"
    for i in np.flatnonzero(cert):
        np.testing.assert_array_equal(np.asarray(r_t)[i], r_o[i])
        finite = np.isfinite(s_o[i])
        np.testing.assert_allclose(
            np.asarray(s_t)[i][finite], s_o[i][finite], atol=1e-5, rtol=1e-5
        )


@pytest.mark.parametrize("runner", [run_scan16, run_int8, run_fused, run_fused8],
                         ids=["bf16", "int8", "fused", "fused8"])
def test_tier_certifies_on_structured_data(runner):
    """Topic-clustered tokens (the encoder-output regime): the tiers'
    widening is quantization-scale, far below topical score gaps, so
    certification should be the common case."""
    tok, tm, q, qm, valid = structured(2000, 8, 32, 6, 4, seed=13)
    s_t, r_t, cert = runner(tok, tm, q, qm, valid, 10, 256)
    s_o, r_o = maxsim_scan_oracle(q, qm, tok, tm, valid, 10)
    cert = np.asarray(cert)
    assert cert.sum() >= 4, f"expected most certified, got {cert.sum()}/6"
    for i in np.flatnonzero(cert):
        np.testing.assert_array_equal(np.asarray(r_t)[i], r_o[i])


@pytest.mark.parametrize("runner", [run_scan16, run_int8, run_fused, run_fused8],
                         ids=["bf16", "int8", "fused", "fused8"])
def test_tier_short_corpus_certifies_truncated(runner):
    tokens, t_mask, q, q_mask, _ = build(6, 3, 8, 2, 2, seed=9, tombstones=False)
    valid = np.array([True, True, True, False, False, False])
    s, r, cert = runner(tokens, t_mask, q, q_mask, valid, 5, 8)
    assert bool(np.asarray(cert).all())
    r = np.asarray(r)
    assert (r[:, 3:] == -1).all()
    assert set(r[0, :3]) == {0, 1, 2}


@pytest.mark.parametrize("runner", [run_scan16, run_int8, run_fused, run_fused8],
                         ids=["bf16", "int8", "fused", "fused8"])
def test_tier_rescore_below_k_rejected(runner):
    tokens, t_mask, q, q_mask, valid = build(20, 2, 8, 1, 1, seed=1)
    with pytest.raises(InvalidConfigError):
        runner(tokens, t_mask, q, q_mask, valid, 8, 4)


def test_tier_duplicate_chunks_fail_closed_or_exact():
    """Near-duplicate chunks sit inside one another's widening band —
    the certificate must refuse or return the oracle's exact rows."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((1, 1, 24)).astype(np.float32)
    tokens = base + 1e-4 * rng.standard_normal((300, 4, 24)).astype(np.float32)
    tokens /= np.linalg.norm(tokens, axis=2, keepdims=True)
    t_mask = np.ones((300, 4), bool)
    q = rng.standard_normal((4, 3, 24)).astype(np.float32)
    q_mask = np.ones((4, 3), bool)
    valid = np.ones(300, bool)
    for runner in (run_scan16, run_int8):
        s_t, r_t, cert = runner(tokens, t_mask, q, q_mask, valid, 10, 16)
        s_o, r_o = maxsim_scan_oracle(q, q_mask, tokens, t_mask, valid, 10)
        for i in np.flatnonzero(np.asarray(cert)):
            np.testing.assert_array_equal(np.asarray(r_t)[i], r_o[i])


@pytest.mark.parametrize("runner", [run_scan16, run_int8, run_fused, run_fused8],
                         ids=["bf16", "int8", "fused", "fused8"])
@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(1, 12))
def test_tier_certificate_fail_closed_property(runner, seed, k):
    """On ARBITRARY data (duplicates, empties, tombstones, adversarial
    scales) every certified query's rows equal the oracle's exactly."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(k, 120))
    lt, h = int(rng.integers(1, 6)), int(rng.integers(4, 24))
    b, lq = int(rng.integers(1, 4)), int(rng.integers(1, 5))
    rescore = int(rng.integers(k, 2 * k + 16))
    tokens = (
        rng.standard_normal((n, lt, h)) * rng.choice([1e-3, 1.0, 50.0])
    ).astype(np.float32)
    if n > 3 and bool(rng.integers(0, 2)):
        tokens[1] = tokens[0]
    t_mask = rng.random((n, lt)) < 0.8
    q = rng.standard_normal((b, lq, h)).astype(np.float32)
    q_mask = rng.random((b, lq)) < 0.9
    q_mask[:, 0] = True
    valid = rng.random(n) < 0.9
    s_t, r_t, cert = runner(tokens, t_mask, q, q_mask, valid, k, rescore)
    assert not np.isnan(np.asarray(s_t)[np.isfinite(np.asarray(s_t))]).any()
    s_o, r_o = maxsim_scan_oracle(q, q_mask, tokens, t_mask, valid, k)
    for i in np.flatnonzero(np.asarray(cert)):
        np.testing.assert_array_equal(np.asarray(r_t)[i], r_o[i])


def test_int8_tier_over_bf16_primary_exact_over_stored():
    """bf16 primary storage + int8 scan replica: certified results equal
    the oracle computed over the UPCAST STORED bf16 values (the
    storage-dtype contract — the tier never loosens it)."""
    tokens, t_mask, q, q_mask, valid = build(
        200, 4, 16, 3, 3, seed=6, dtype=jnp.bfloat16
    )
    tok32 = np.asarray(tokens, np.float32)
    td = jnp.asarray(tokens)  # bf16 on device
    pack = prepare_maxsim_int8(td, jnp.asarray(t_mask))
    s_t, r_t, cert = maxsim_topk_int8(
        *to_dev(q, q_mask), td, jnp.asarray(t_mask), *pack,
        jnp.asarray(valid), 6, 64, 128
    )
    s_o, r_o = maxsim_scan_oracle(q, q_mask, tok32, t_mask, valid, 6)
    cert = np.asarray(cert)
    assert cert.any()
    for i in np.flatnonzero(cert):
        np.testing.assert_array_equal(np.asarray(r_t)[i], r_o[i])


# ---------------------------------------------------------------------------
# TokenVectorStore integration
# ---------------------------------------------------------------------------

from trueno_rag_tpu.chunking import Chunk  # noqa: E402
from trueno_rag_tpu.index.token_store import (  # noqa: E402
    TokenStoreConfig,
    TokenVectorStore,
)


def _fill_store(cfg, n=120, seed=0):
    rng = np.random.default_rng(seed)
    store = TokenVectorStore(cfg)
    chunks, mats = [], []
    for i in range(n):
        c = Chunk(
            document_id=f"d{i}", content=f"chunk {i}",
            start_offset=0, end_offset=7,
        )
        t = rng.standard_normal((int(rng.integers(1, cfg.max_tokens + 1)),
                                 cfg.hidden_dim)).astype(np.float32)
        chunks.append(c)
        mats.append(t)
    store.insert_many(chunks, mats)
    return store, chunks


@pytest.mark.parametrize("scan_dtype", ["bfloat16", "int8"])
def test_store_tiered_matches_exact(scan_dtype):
    cfg = dict(hidden_dim=16, max_tokens=5, rescore=64)
    s_t, chunks = _fill_store(
        TokenStoreConfig(scan="tiered", scan_dtype=scan_dtype, **cfg)
    )
    s_e, _ = _fill_store(TokenStoreConfig(scan="exact", **cfg))
    rng = np.random.default_rng(1)
    q = rng.standard_normal((3, 4, 16)).astype(np.float32)
    a = s_t.search_arrays(q, k=7)
    b = s_e.search_arrays(q, k=7)
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_allclose(a[0], b[0], atol=1e-5, rtol=1e-5)


def test_store_tiered_fallback_counts_uncertified():
    """Near-duplicate corpus at a starved rescore budget: the tier
    cannot separate candidates, so the store must fall back to the
    exact scan (still exact results) and count the misses."""
    rng = np.random.default_rng(2)
    cfg = TokenStoreConfig(
        hidden_dim=12, max_tokens=3, scan="tiered", rescore=1
    )
    store = TokenVectorStore(cfg)
    base = rng.standard_normal((1, 3, 12)).astype(np.float32)
    chunks, mats = [], []
    for i in range(150):
        chunks.append(Chunk(
            document_id=f"d{i}", content=f"c{i}",
            start_offset=0, end_offset=3,
        ))
        mats.append(base[0] + 1e-5 * rng.standard_normal((3, 12)).astype(np.float32))
    store.insert_many(chunks, mats)
    exact = TokenVectorStore(
        TokenStoreConfig(hidden_dim=12, max_tokens=3, scan="exact")
    )
    exact.insert_many(chunks, mats)
    q = rng.standard_normal((2, 2, 12)).astype(np.float32)
    a = store.search_arrays(q, k=5)
    b = exact.search_arrays(q, k=5)
    np.testing.assert_array_equal(a[1], b[1])
    assert store.uncertified > 0


def test_store_tiered_respects_filter_and_mutation():
    cfg = dict(hidden_dim=16, max_tokens=4, rescore=64)
    s_t, chunks = _fill_store(TokenStoreConfig(scan="tiered", **cfg), n=80)
    s_e, _ = _fill_store(TokenStoreConfig(scan="exact", **cfg), n=80)
    for c in chunks[:10]:
        s_t.remove(c.id)
        s_e.remove(c.id)
    rng = np.random.default_rng(3)
    q = rng.standard_normal((2, 3, 16)).astype(np.float32)
    allowed = np.zeros(s_t._host.shape[0], bool)
    allowed[20:60] = True
    a = s_t.search_arrays(q, k=6, allowed_rows=allowed)
    b = s_e.search_arrays(q, k=6, allowed_rows=allowed)
    np.testing.assert_array_equal(a[1], b[1])
    assert set(a[1].ravel()) <= set(range(20, 60)) | {-1}


def test_self16_pack_zero_copy_exact_over_stored():
    """bf16 primary + explicit bf16 tier: the replica must alias the
    primary (prepare_maxsim_self16 — no corpus-scale copy), residuals
    must be exactly zero, and certified results must equal the oracle
    over the upcast stored values."""
    from trueno_rag_tpu.ops.maxsim import prepare_maxsim_self16

    tokens, t_mask, q, q_mask, valid = build(
        180, 4, 16, 3, 3, seed=9, dtype=jnp.bfloat16
    )
    td = jnp.asarray(tokens)
    e_max, n_max = prepare_maxsim_self16(td, jnp.asarray(t_mask))
    assert float(jnp.max(e_max)) == 0.0
    s_t, r_t, cert = maxsim_topk_scan16(
        *to_dev(q, q_mask), td, jnp.asarray(t_mask), td, e_max, n_max,
        jnp.asarray(valid), 6, 64, 128
    )
    s_o, r_o = maxsim_scan_oracle(
        q, q_mask, np.asarray(td, np.float32), t_mask, valid, 6
    )
    cert = np.asarray(cert)
    assert cert.any()
    for i in np.flatnonzero(cert):
        np.testing.assert_array_equal(np.asarray(r_t)[i], r_o[i])
    # fp32 primary must be rejected (the identity-replica argument only
    # holds when the store dtype IS bf16)
    with pytest.raises(InvalidConfigError):
        prepare_maxsim_self16(
            jnp.asarray(tokens, jnp.float32), jnp.asarray(t_mask)
        )


def test_store_bf16_primary_bf16_tier_aliases_primary():
    """TokenVectorStore with bf16 storage + explicit bf16 scan_dtype
    must build the zero-copy tier: the tier's replica IS the device
    primary buffer, and search stays exact vs the exact-scan store."""
    cfg = dict(hidden_dim=16, max_tokens=5, rescore=64)
    s_t, _ = _fill_store(TokenStoreConfig(
        scan="tiered", scan_dtype="bfloat16", scan_kernel="xla",
        storage_dtype="bfloat16", **cfg,
    ))
    s_e, _ = _fill_store(TokenStoreConfig(
        scan="exact", storage_dtype="bfloat16", **cfg,
    ))
    tier = s_t._device_tier()
    assert tier[0] == "bfloat16"
    assert tier[1] is s_t._device()[0]  # aliased, not a copy
    rng = np.random.default_rng(4)
    q = rng.standard_normal((3, 4, 16)).astype(np.float32)
    a = s_t.search_arrays(q, k=7)
    b = s_e.search_arrays(q, k=7)
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_allclose(a[0], b[0], atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("n", [200, 128, 72])
def test_fused_ragged_corpus_main_plus_tail(n):
    """Corpus sizes straddling the tile boundary at a forced tile_n=128:
    n=200 exercises main grid + zero-padded tail, n=128 the pure main
    grid, n=72 the pure tail — all must match the oracle on certified
    queries (the previous full-corpus jnp.pad design OOMed at 1M)."""
    from trueno_rag_tpu.ops.pallas.maxsim_scan import maxsim_scan16_scores

    tokens, t_mask, q, q_mask, valid = build(n, 4, 16, 3, 3, seed=11)
    td = jnp.asarray(tokens)
    pack = prepare_maxsim_scan16(td, jnp.asarray(t_mask))
    s_t, r_t, cert = maxsim_topk_scan16_fused(
        *to_dev(q, q_mask), td, jnp.asarray(t_mask), *pack,
        jnp.asarray(valid), 6, 64, tile_n=128, interpret=True
    )
    s_o, r_o = maxsim_scan_oracle(q, q_mask, tokens, t_mask, valid, 6)
    cert = np.asarray(cert)
    assert cert.any()
    for i in np.flatnonzero(cert):
        np.testing.assert_array_equal(np.asarray(r_t)[i], r_o[i])
    # the raw kernel wrapper must agree with the XLA block scores on the
    # ragged shape too (tail rows zero-padded, phantom columns sliced)
    from trueno_rag_tpu.ops.maxsim import (
        _scan16_query_pack,
        maxsim_block_scores,
    )

    q16, _, _, _ = _scan16_query_pack(*to_dev(q, q_mask))
    s_k = maxsim_scan16_scores(
        q16, pack[0], jnp.asarray(t_mask), jnp.asarray(valid),
        tile_n=128, interpret=True,
    )
    s_ref = maxsim_block_scores(
        q16.astype(jnp.float32), jnp.asarray(q_mask),
        pack[0], jnp.asarray(t_mask),
    )
    s_ref = jnp.where(jnp.asarray(valid)[None, :], s_ref, float("-inf"))
    np.testing.assert_allclose(
        np.asarray(s_k), np.asarray(s_ref), atol=5e-2, rtol=5e-2
    )


def test_store_scan_dtype_auto_resolution():
    assert TokenStoreConfig().resolved_scan_dtype() == "bfloat16"
    assert (
        TokenStoreConfig(storage_dtype="bfloat16").resolved_scan_dtype()
        == "int8"
    )
    assert (
        TokenStoreConfig(scan_dtype="int8").resolved_scan_dtype() == "int8"
    )
    with pytest.raises(InvalidConfigError):
        TokenStoreConfig(scan_dtype="fp8")
    with pytest.raises(InvalidConfigError):
        TokenStoreConfig(scan="clustered")


# ---------------------------------------------------------------------------
# approx candidate selection (the corpus-scale tail: approx_max_k +
# scatter-free fail-closed exclusion threshold instead of the full
# [B, width] sort the exact top-(C+1) lowers to at 100k-1M chunks)
# ---------------------------------------------------------------------------


def run_scan16_approx(tokens, t_mask, q, q_mask, valid, k, rescore,
                      block=128):
    td = jnp.asarray(tokens)
    pack = prepare_maxsim_scan16(td, jnp.asarray(t_mask))
    return maxsim_topk_scan16(
        *to_dev(q, q_mask), td, jnp.asarray(t_mask), *pack,
        jnp.asarray(valid), k, rescore, block, select="approx"
    )


def run_fused_approx(tokens, t_mask, q, q_mask, valid, k, rescore,
                     block=128):
    td = jnp.asarray(tokens)
    pack = prepare_maxsim_scan16(td, jnp.asarray(t_mask))
    return maxsim_topk_scan16_fused(
        *to_dev(q, q_mask), td, jnp.asarray(t_mask), *pack,
        jnp.asarray(valid), k, rescore, interpret=True, select="approx"
    )


@pytest.mark.parametrize("runner", [run_scan16_approx, run_fused_approx],
                         ids=["bf16", "fused"])
def test_approx_select_certified_matches_oracle(runner):
    tokens, t_mask, q, q_mask, valid = build(400, 6, 32, 4, 5, seed=7)
    s_t, r_t, cert = runner(tokens, t_mask, q, q_mask, valid, 8, 128)
    s_o, r_o = maxsim_scan_oracle(q, q_mask, tokens, t_mask, valid, 8)
    cert = np.asarray(cert)
    assert cert.any(), "approx selection must still certify on random data"
    for i in np.flatnonzero(cert):
        np.testing.assert_array_equal(np.asarray(r_t)[i], r_o[i])
        finite = np.isfinite(s_o[i])
        np.testing.assert_allclose(
            np.asarray(s_t)[i][finite], s_o[i][finite], atol=1e-5, rtol=1e-5
        )


def test_approx_select_tombstones_stay_excluded():
    """Invalid (-inf bound) chunks must never be resurrected by the
    approx rescore, certified or not — approx_max_k returns raw
    positions, so the tail re-sentinels them."""
    tokens, t_mask, q, q_mask, valid = build(200, 4, 16, 3, 3, seed=11)
    valid = valid.copy()
    dead = np.arange(0, 200, 3)
    valid[dead] = False
    _, r_t, _ = run_scan16_approx(tokens, t_mask, q, q_mask, valid, 6, 32)
    r_t = np.asarray(r_t)
    assert not np.isin(r_t[r_t >= 0], dead).any()


def test_approx_select_short_allowed_set_certifies():
    """When the allowed set is smaller than the candidate width the
    count trick always fails (+inf at a -inf boundary) — the
    completeness certificate (every finite bound selected, distinct)
    must restore the exact path's certified-short-result semantics."""
    tokens, t_mask, q, q_mask, valid = build(300, 4, 16, 2, 3, seed=13)
    valid = np.zeros_like(valid)
    allowed = np.array([5, 77, 123, 250])
    valid[allowed] = True
    s_t, r_t, cert = run_scan16_approx(tokens, t_mask, q, q_mask, valid, 6, 64)
    assert np.asarray(cert).all()
    s_o, r_o = maxsim_scan_oracle(q, q_mask, tokens, t_mask, valid, 6)
    np.testing.assert_array_equal(np.asarray(r_t), r_o)
    # exactly the 4 allowed rows, then -1 sentinels
    assert set(np.asarray(r_t)[0][:4]) == set(allowed.tolist())
    assert (np.asarray(r_t)[:, 4:] == -1).all()


def test_resolve_select_auto_thresholds():
    """auto = exact ALWAYS (measured 2026-08-19: approx saved 1.2 ms of
    29 at 1M while certification fell 8/8 -> 1/8); approx only on
    explicit request."""
    from trueno_rag_tpu.ops.maxsim import _resolve_select

    assert _resolve_select("auto", 1_000_000, 1024) == "exact"
    assert _resolve_select("auto", 1000, 128) == "exact"
    assert _resolve_select("exact", 1_000_000, 1024) == "exact"
    assert _resolve_select("approx", 1000, 128) == "approx"
    with pytest.raises(InvalidConfigError):
        _resolve_select("fast", 1000, 128)


# ---------------------------------------------------------------------------
# v2 bound-pass kernels (measured DEAD END at 1M on v5e: 43.4 ms vs
# v1's 26.5 — the in-kernel transpose + Lt-unrolled lane-slice max is
# the per-position-slicing pattern maxsim_scan.py warns about; kept
# parity-tested like ops/pallas/bm25_fetch)
# ---------------------------------------------------------------------------


def test_v2_bound_pass_parity_with_v1():
    from trueno_rag_tpu.ops.maxsim import (
        prepare_maxsim_bias_l,
        prepare_maxsim_scan16_opt,
    )
    from trueno_rag_tpu.ops.pallas.maxsim_scan import (
        maxsim_scan16_scores,
        maxsim_scan16_scores_self_v2,
        maxsim_scan16_scores_v2,
    )

    rng = np.random.default_rng(3)
    n, lt, h, b, lq = 600, 4, 32, 3, 5
    tok = rng.normal(size=(n, lt, h)).astype(np.float32)
    tok /= np.linalg.norm(tok, axis=2, keepdims=True)
    lens = rng.integers(1, lt + 1, size=n)
    lens[7] = 0  # an empty chunk must score exactly 0
    tm = np.arange(lt)[None, :] < lens[:, None]
    valid = np.ones(n, bool)
    valid[3] = False
    q = rng.normal(size=(b, lq, h)).astype(np.float32)
    qm = np.arange(lq)[None, :] < rng.integers(1, lq + 1, size=b)[:, None]

    tok16 = jnp.asarray(tok).astype(jnp.bfloat16)
    q16 = jnp.where(
        jnp.asarray(qm)[:, :, None], jnp.asarray(q), 0.0
    ).astype(jnp.bfloat16)
    tmj, vj = jnp.asarray(tm), jnp.asarray(valid)

    s1 = np.asarray(
        maxsim_scan16_scores(q16, tok16, tmj, vj, interpret=True)
    )
    tok_l, bias_l, _e, _n = prepare_maxsim_scan16_opt(tok16, tmj, group=256)
    lt_p = tok_l.shape[0] // ((-(-n // 256)) * 256)
    s2 = np.asarray(maxsim_scan16_scores_v2(
        q16, tok_l, bias_l, vj, lt=lt_p, group=256, interpret=True
    ))
    s3 = np.asarray(maxsim_scan16_scores_self_v2(
        q16, tok16, prepare_maxsim_bias_l(tmj, 256), vj,
        group=256, interpret=True,
    ))
    fin = np.isfinite(s1)
    assert (np.isfinite(s2) == fin).all() and (np.isfinite(s3) == fin).all()
    assert s1[0, 7] == 0.0 and s2[0, 7] == 0.0 and s3[0, 7] == 0.0
    np.testing.assert_allclose(s2[fin], s1[fin], atol=2e-6, rtol=1e-6)
    np.testing.assert_allclose(s3[fin], s1[fin], atol=2e-6, rtol=1e-6)


# ---------------------------------------------------------------------------
# int8 PRIMARY storage (r5 capacity tier: no float corpus anywhere)
# ---------------------------------------------------------------------------


def _store8_pack(tokens, t_mask):
    from trueno_rag_tpu.ops.maxsim import prepare_maxsim_int8

    td = jnp.asarray(np.asarray(tokens, np.float32))
    tok8, s_tok, _e, n_max = prepare_maxsim_int8(td, jnp.asarray(t_mask))
    a = np.asarray(tok8, np.float32) * np.asarray(s_tok)[:, :, None]
    return tok8, s_tok, n_max, a


@pytest.mark.parametrize("n,lt,h,b,lq,k,rescore", [
    (400, 6, 32, 4, 5, 8, 128),
    (150, 4, 16, 3, 3, 5, 64),
    (50, 3, 8, 2, 2, 10, 64),
])
def test_int8_store_certified_matches_dequantized_oracle(n, lt, h, b, lq, k, rescore):
    """Exactness contract of the capacity tier: certified results equal
    the full-scan oracle over the DEQUANTIZED stored tokens (the only
    values that exist — there is no float primary)."""
    from trueno_rag_tpu.ops.maxsim import maxsim_topk_int8_store

    tokens, t_mask, q, q_mask, valid = build(n, lt, h, b, lq, seed=n + 7)
    tok8, s_tok, n_max, a = _store8_pack(tokens, t_mask)
    s_t, r_t, cert = maxsim_topk_int8_store(
        *to_dev(q, q_mask), tok8, s_tok, jnp.asarray(t_mask), n_max,
        jnp.asarray(valid), k, rescore, interpret=True,
    )
    s_o, r_o = maxsim_scan_oracle(q, q_mask, a, t_mask, valid, k)
    cert = np.asarray(cert)
    assert cert.any(), "query-side-only interval: must certify random gaps"
    for i in np.flatnonzero(cert):
        np.testing.assert_array_equal(np.asarray(r_t)[i], r_o[i])
        finite = np.isfinite(s_o[i])
        np.testing.assert_allclose(
            np.asarray(s_t)[i][finite], s_o[i][finite], atol=1e-5, rtol=1e-5
        )


def test_int8_store_duplicates_fail_closed_or_exact():
    from trueno_rag_tpu.ops.maxsim import maxsim_topk_int8_store

    tokens, t_mask, q, q_mask, valid = build(120, 4, 16, 3, 3, seed=3)
    tokens[40:60] = tokens[0]  # 20 exact duplicates of chunk 0
    t_mask[40:60] = t_mask[0]
    tok8, s_tok, n_max, a = _store8_pack(tokens, t_mask)
    s_t, r_t, cert = maxsim_topk_int8_store(
        *to_dev(q, q_mask), tok8, s_tok, jnp.asarray(t_mask), n_max,
        jnp.asarray(valid), 8, 64, interpret=True,
    )
    s_o, r_o = maxsim_scan_oracle(q, q_mask, a, t_mask, valid, 8)
    for i in np.flatnonzero(np.asarray(cert)):
        np.testing.assert_array_equal(np.asarray(r_t)[i], r_o[i])


def test_int8_store_certificate_fail_closed_property():
    """Sweep seeds; every certified query must equal the dequantized
    oracle — the properties suite's contract for the storage tier."""
    from trueno_rag_tpu.ops.maxsim import maxsim_topk_int8_store

    checked = 0
    for seed in range(6):
        tokens, t_mask, q, q_mask, valid = build(90, 3, 16, 2, 3, seed=seed)
        tok8, s_tok, n_max, a = _store8_pack(tokens, t_mask)
        s_t, r_t, cert = maxsim_topk_int8_store(
            *to_dev(q, q_mask), tok8, s_tok, jnp.asarray(t_mask), n_max,
            jnp.asarray(valid), 6, 32, interpret=True,
        )
        s_o, r_o = maxsim_scan_oracle(q, q_mask, a, t_mask, valid, 6)
        for i in np.flatnonzero(np.asarray(cert)):
            np.testing.assert_array_equal(np.asarray(r_t)[i], r_o[i])
            checked += 1
    assert checked >= 4
