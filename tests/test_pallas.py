"""Pallas kernel parity tests (interpret mode on CPU; the jnp blockwise
path is the oracle — same contract as the real-TPU spot check)."""

import numpy as np
import pytest
import jax.numpy as jnp

from trueno_rag_tpu.ops.dense import dense_topk
from trueno_rag_tpu.ops.pallas.dense_score import pallas_available, pallas_dense_topk


@pytest.mark.parametrize(
    "n,d,b,k",
    [(1000, 64, 5, 13), (4096, 128, 16, 50), (300, 32, 3, 7), (128, 384, 1, 5)],
)
def test_pallas_dense_matches_xla(n, d, b, k):
    rng = np.random.default_rng(n)
    matrix = rng.standard_normal((n, d)).astype(np.float32)
    matrix /= np.linalg.norm(matrix, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[n // 10 : n // 5] = False
    s_p, r_p = pallas_dense_topk(
        jnp.asarray(q), jnp.asarray(matrix), jnp.asarray(valid), k, "cosine", interpret=True
    )
    s_x, r_x = dense_topk(jnp.asarray(q), jnp.asarray(matrix), jnp.asarray(valid), k, "cosine")
    np.testing.assert_array_equal(np.asarray(r_p), np.asarray(r_x))
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x), atol=1e-5, rtol=1e-5)


def test_pallas_dot_metric():
    rng = np.random.default_rng(1)
    matrix = rng.standard_normal((512, 32)).astype(np.float32)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    valid = np.ones(512, bool)
    s_p, r_p = pallas_dense_topk(
        jnp.asarray(q), jnp.asarray(matrix), jnp.asarray(valid), 9, "dot", interpret=True
    )
    s_x, r_x = dense_topk(jnp.asarray(q), jnp.asarray(matrix), jnp.asarray(valid), 9, "dot")
    np.testing.assert_array_equal(np.asarray(r_p), np.asarray(r_x))


def test_pallas_rejects_euclidean():
    from trueno_rag_tpu.errors import InvalidConfigError

    with pytest.raises(InvalidConfigError):
        pallas_dense_topk(
            jnp.zeros((1, 8)), jnp.zeros((16, 8)), jnp.ones(16, bool), 2, "euclidean", interpret=True
        )


def test_pallas_available_reports_platform():
    assert pallas_available() in (True, False)  # CPU in tests -> False


# -------------------------------------------------------- attention ----


@pytest.mark.parametrize("causal", [True, False])
def test_block_attention_matches_oracle(causal):
    import jax

    from trueno_rag_tpu.ops.pallas.attention import attention_oracle, block_attention

    rng = np.random.default_rng(0)
    bh, t, hd = 4, 256, 32
    q = jnp.asarray(rng.standard_normal((bh, t, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((bh, t, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((bh, t, hd)).astype(np.float32))
    mask = np.ones((bh, t), bool)
    mask[0, 200:] = False  # padding on one row
    mask = jnp.asarray(mask)
    got = block_attention(q, k, v, mask, causal=causal, interpret=True)
    want = attention_oracle(q, k, v, mask, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_block_attention_at_design_point_8k():
    """The kernel exists FOR T=8192 (NemotronConfig max_length, the
    reference design point embed.rs:746-750) — run it there, not just at
    toy lengths: parity vs the materializing oracle at the full 8k with
    ragged padding (r3 verdict: the design point was argued, never
    exercised)."""
    from trueno_rag_tpu.ops.pallas.attention import attention_oracle, block_attention

    rng = np.random.default_rng(1)
    bh, t, hd = 2, 8192, 32
    q = jnp.asarray(rng.standard_normal((bh, t, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((bh, t, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((bh, t, hd)).astype(np.float32))
    mask = np.ones((bh, t), bool)
    mask[1, 7000:] = False
    got = block_attention(q, k, v, jnp.asarray(mask), causal=True, interpret=True)
    want = attention_oracle(q, k, v, jnp.asarray(mask), causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_nemotron_forward_at_8k_context():
    """Full decoder forward at T=8192 through the block-attention path
    (auto switches to it at this length) with a small-heads config:
    finite, unit-norm output and last-token pooling past the padding
    boundary."""
    import dataclasses

    import jax

    from trueno_rag_tpu.models.nemotron import (
        NemotronConfig, init_nemotron_params, nemotron_forward)

    cfg = dataclasses.replace(
        NemotronConfig.tiny(), max_len=8192, compute_dtype=jnp.float32)
    params = init_nemotron_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    ids = rng.integers(3, cfg.vocab_size, (1, 8192), dtype=np.int32)
    ids[0, 6000:] = 0  # PAD — last valid token at 5999
    out = np.asarray(nemotron_forward(params, jnp.asarray(ids), cfg))
    assert out.shape == (1, cfg.hidden_dim)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)
    # pooling must track the true last token: moving the pad boundary
    # must change the embedding
    ids2 = ids.copy()
    ids2[0, 4000:] = 0
    out2 = np.asarray(nemotron_forward(params, jnp.asarray(ids2), cfg))
    assert np.abs(out - out2).max() > 1e-3


def test_nemotron_block_attention_matches_naive():
    import dataclasses

    import jax

    from trueno_rag_tpu.models.nemotron import NemotronConfig, init_nemotron_params, nemotron_forward

    cfg_naive = dataclasses.replace(NemotronConfig.tiny(), attention_impl="naive", compute_dtype=jnp.float32)
    cfg_block = dataclasses.replace(cfg_naive, attention_impl="block")
    params = init_nemotron_params(jax.random.PRNGKey(0), cfg_naive)
    ids = jnp.asarray(np.random.default_rng(0).integers(3, 512, (2, 128), dtype=np.int32))
    out_naive = np.asarray(nemotron_forward(params, ids, cfg_naive))
    out_block = np.asarray(nemotron_forward(params, ids, cfg_block))
    np.testing.assert_allclose(out_block, out_naive, atol=3e-4, rtol=3e-4)


@pytest.mark.parametrize("n,d,b,k", [(1000, 64, 5, 13), (4096, 128, 16, 50)])
def test_twopass_matches_xla(n, d, b, k):
    from trueno_rag_tpu.ops.pallas.dense_score import pallas_dense_topk_twopass

    rng = np.random.default_rng(n)
    matrix = rng.standard_normal((n, d)).astype(np.float32)
    matrix /= np.linalg.norm(matrix, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[n // 7 : n // 5] = False
    s_p, r_p = pallas_dense_topk_twopass(
        jnp.asarray(q), jnp.asarray(matrix), jnp.asarray(valid), k, "cosine", interpret=True
    )
    s_x, r_x = dense_topk(jnp.asarray(q), jnp.asarray(matrix), jnp.asarray(valid), k, "cosine")
    np.testing.assert_array_equal(np.asarray(r_p), np.asarray(r_x))
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x), atol=1e-5, rtol=1e-5)


# -------------------------------------------------------- bm25 DMA ----


@pytest.mark.parametrize("seed,nwords,ndocs,nq", [(0, 50, 200, 5), (1, 20, 800, 9), (2, 300, 100, 3)])
def test_bm25_dma_matches_segments(seed, nwords, ndocs, nq):
    from trueno_rag_tpu.chunking import Chunk
    from trueno_rag_tpu.index.bm25 import BM25Index
    from trueno_rag_tpu.ops.pallas.bm25_fetch import bm25_topk_dma, gather_aligned_segments

    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(nwords)]
    idx = BM25Index(use_native=False)
    for i in range(ndocs):
        text = " ".join(rng.choice(words, size=rng.integers(5, 60)))
        idx.add(Chunk(id=f"c{i}", document_id="d", content=text, start_offset=0, end_offset=1))
    idx._refresh_snapshot()
    snap = idx._snap
    queries = [" ".join(rng.choice(words, size=rng.integers(1, 6))) for _ in range(nq)]
    queries.append("zzz unknown terms only")
    k = 10
    s_ref, r_ref = idx.search_arrays(queries, k)
    block_ids, lo, hi, s_slots, _ = gather_aligned_segments(
        snap["indptr"], None, snap["vocab"], idx._tokenize, queries, int(snap["indptr"][-1])
    )
    s_dma, r_dma = bm25_topk_dma(
        jnp.asarray(block_ids), jnp.asarray(lo), jnp.asarray(hi), idx._get_packed(),
        float(snap["avgdl"]), k=k, s_slots=s_slots, interpret=True,
    )
    # Scores agree to fp32 associativity tolerance; rows agree except
    # near-tie swaps (host-precomputed vs device-computed contributions
    # can differ in the last ulp).
    s_d = np.asarray(s_dma)[: len(queries)]
    r_d = np.asarray(r_dma)[: len(queries)]
    s_r, r_r = np.asarray(s_ref), np.asarray(r_ref)
    np.testing.assert_allclose(
        np.where(np.isneginf(s_d), 0, s_d), np.where(np.isneginf(s_r), 0, s_r),
        atol=1e-4, rtol=1e-4,
    )
    for qi in range(len(queries)):
        for j in np.nonzero(r_d[qi] != r_r[qi])[0]:
            assert abs(s_d[qi, j] - s_r[qi, j]) < 1e-4, (qi, j)
            assert r_d[qi, j] in r_r[qi], (qi, j)
