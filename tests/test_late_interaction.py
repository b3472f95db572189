"""Late-interaction (MaxSim) reranking: device/oracle parity, masking
honesty, reranker-protocol contract."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trueno_rag_tpu.models.encoder import EncoderConfig, encoder_forward, encoder_token_states, init_encoder_params
from trueno_rag_tpu.models.late_interaction import (
    LateInteractionReranker,
    late_interaction_scores,
    maxsim,
    maxsim_oracle,
)

CFG = EncoderConfig(vocab_size=256, hidden_dim=32, num_layers=1, num_heads=2,
                    mlp_dim=64, max_len=32)


def _toks(seed, k, tq, td, h):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((tq, h)).astype(np.float32)
    d = rng.standard_normal((k, td, h)).astype(np.float32)
    qm = rng.random(tq) < 0.8
    dm = rng.random((k, td)) < 0.8
    qm[0] = True
    return q, qm, d, dm


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_maxsim_matches_oracle(seed):
    q, qm, d, dm = _toks(seed, k=5, tq=7, td=11, h=16)
    got = np.asarray(maxsim(jnp.asarray(q), jnp.asarray(qm), jnp.asarray(d), jnp.asarray(dm)))
    want = maxsim_oracle(q, qm, d, dm)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_maxsim_padding_is_inert():
    """Extra padded tokens on either side must not change any score."""
    q, qm, d, dm = _toks(3, k=4, tq=6, td=9, h=16)
    base = np.asarray(maxsim(jnp.asarray(q), jnp.asarray(qm), jnp.asarray(d), jnp.asarray(dm)))
    q2 = np.concatenate([q, np.random.default_rng(9).standard_normal((3, 16)).astype(np.float32)])
    qm2 = np.concatenate([qm, np.zeros(3, bool)])
    d2 = np.concatenate([d, np.ones((4, 2, 16), np.float32) * 100], axis=1)
    dm2 = np.concatenate([dm, np.zeros((4, 2), bool)], axis=1)
    padded = np.asarray(maxsim(jnp.asarray(q2), jnp.asarray(qm2), jnp.asarray(d2), jnp.asarray(dm2)))
    np.testing.assert_allclose(padded, base, rtol=1e-6)


def test_maxsim_all_padding_candidate_scores_zero():
    q, qm, d, dm = _toks(4, k=3, tq=5, td=7, h=8)
    dm[1, :] = False  # empty document
    got = np.asarray(maxsim(jnp.asarray(q), jnp.asarray(qm), jnp.asarray(d), jnp.asarray(dm)))
    assert got[1] == 0.0
    np.testing.assert_allclose(got, maxsim_oracle(q, qm, d, dm), rtol=1e-5, atol=1e-5)


def test_token_states_match_pooled_forward():
    """encoder_token_states must be the same trunk encoder_forward
    pools — mean-pooling the token states reproduces the embedding."""
    import dataclasses

    cfg = dataclasses.replace(CFG, pooling="mean", normalize=False)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(3, 256, (4, 12), dtype=np.int32))
    toks, mask = encoder_token_states(params, ids, cfg)
    pooled = encoder_forward(params, ids, cfg)
    maskf = np.asarray(mask, np.float32)
    manual = (np.asarray(toks) * maskf[..., None]).sum(1) / np.maximum(
        maskf.sum(1, keepdims=True), 1e-9
    )
    np.testing.assert_allclose(manual, np.asarray(pooled), rtol=2e-3, atol=2e-3)


def test_late_interaction_scores_end_to_end_and_self_preference():
    """Through the real trunk: a candidate identical to the query must
    out-score unrelated candidates (every query token finds itself)."""
    params = init_encoder_params(jax.random.PRNGKey(1), CFG)
    from trueno_rag_tpu.models.encoder import HashTokenizer

    tok = HashTokenizer(CFG.vocab_size, CFG.max_len)
    query = "systolic arrays multiply matrices"
    cands = [query, "unrelated pastry recipes entirely", "matrices appear here too"]
    q_ids = tok.encode_batch([query])
    d_ids = tok.encode_batch(cands)
    scores = np.asarray(late_interaction_scores(
        params, jnp.asarray(q_ids), jnp.asarray(d_ids), CFG
    ))
    assert scores.shape == (3,)
    assert scores[0] == scores.max()


def test_reranker_protocol_contract():
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.retrieve import RetrievalResult

    rr = LateInteractionReranker(config=CFG, seed=0)
    cands = [
        RetrievalResult(
            chunk=Chunk(document_id="d", content=c, start_offset=0, end_offset=len(c),
                        metadata=ChunkMetadata(), id=chunk_id_from_int(i)),
            dense_score=0.5,
        )
        for i, c in enumerate(["alpha beta gamma", "delta epsilon", "alpha beta"])
    ]
    out = rr.rerank("alpha beta gamma", cands, top_k=2)
    assert len(out) == 2
    assert all(r.rerank_score is not None for r in out)
    assert all(r.dense_score == 0.5 for r in out)  # per-source scores survive
    scores = [r.rerank_score for r in out]
    assert scores == sorted(scores, reverse=True)
    assert rr.score_batch("q", []).shape == (0,)
