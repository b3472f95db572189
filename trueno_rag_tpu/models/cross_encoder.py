"""Neural cross-encoder reranker: joint (query, passage) scoring on device.

The reference only ships a term-overlap mock "standing in for a real
cross-encoder" (reference: rerank.rs:124-191). This is the real thing,
TPU-native: query and passage concatenate as
``[CLS] query [SEP] passage [SEP]``, run through the bidirectional
encoder from :mod:`trueno_rag_tpu.models.encoder`, and a scalar head on
the CLS state yields the relevance logit. All (query, candidate) pairs
score in ONE batched forward pass — a [num_candidates, T] device batch
— instead of per-pair calls.

Implements the ``Reranker`` protocol, so it drops into ``RagPipeline``
anywhere the lexical/mock rerankers do.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from trueno_rag_tpu.models.encoder import (
    PAD_ID,
    SEP_ID,
    EncoderConfig,
    HashTokenizer,
    _pool,
    _round_up,
    _round_up_pow2,
    init_encoder_params,
)
from trueno_rag_tpu.retrieve import RetrievalResult


def init_cross_encoder_params(rng: jax.Array, config: EncoderConfig) -> Dict[str, jax.Array]:
    k1, k2 = jax.random.split(rng)
    params = init_encoder_params(k1, config)
    params["score_w"] = jax.nn.initializers.normal(0.02)(k2, (config.hidden_dim, 1), jnp.float32)
    params["score_b"] = jnp.zeros((1,), jnp.float32)
    return params


@partial(jax.jit, static_argnames=("config",))
def cross_encoder_scores(params: Dict[str, jax.Array], token_ids: jax.Array, config: EncoderConfig) -> jax.Array:
    """[B, T] pair token ids → [B] relevance scores (sigmoid logits)."""
    # reuse the encoder trunk but pool CLS + scalar head
    from trueno_rag_tpu.models.encoder import _block, _layer_norm

    mask = token_ids != PAD_ID
    t = token_ids.shape[1]
    dtype = config.compute_dtype
    x = params["tok_emb"][token_ids] + params["pos_emb"][:t][None, :, :]
    x = _layer_norm(x.astype(dtype), params["emb_ln_scale"], params["emb_ln_bias"])
    layer_params = {
        k: params[k]
        for k in (
            "qkv_w", "qkv_b", "attn_out_w", "attn_out_b",
            "ln1_scale", "ln1_bias", "mlp_w1", "mlp_b1",
            "mlp_w2", "mlp_b2", "ln2_scale", "ln2_bias",
        )
    }

    def body(carry, lp):
        return _block(carry, mask, lp, config), None

    x, _ = jax.lax.scan(body, x, layer_params)
    cls = _pool(x, mask, "cls")  # [B, H] f32
    if "pooler_w" in params:  # HF BERT pooler (dense+tanh) before the head
        cls = jnp.tanh(cls @ params["pooler_w"] + params["pooler_b"])
    logits = cls @ params["score_w"] + params["score_b"]
    # sigmoid for [0,1] scores; monotonic, so rankings equal raw logits
    return jax.nn.sigmoid(logits[:, 0])


class CrossEncoderReranker:
    """Neural second-stage reranker (Reranker protocol).

    Scores all candidates against the query in one device batch and
    returns results ordered (score desc, chunk id asc), like every other
    reranker in :mod:`trueno_rag_tpu.rerank`.
    """

    def __init__(
        self,
        config: Optional[EncoderConfig] = None,
        params: Optional[Dict[str, jax.Array]] = None,
        seed: int = 0,
        max_len: int = 256,
    ) -> None:
        self.config = config or EncoderConfig.tiny()
        self.params = params if params is not None else init_cross_encoder_params(
            jax.random.PRNGKey(seed), self.config
        )
        self.max_len = min(max_len, self.config.max_len)
        self.tokenizer = HashTokenizer(self.config.vocab_size, self.max_len)

    def _encode_pairs(self, query: str, contents: Sequence[str]) -> np.ndarray:
        q_ids = self.tokenizer.encode(query)[:-1]  # keep CLS, drop SEP; re-add below
        rows = []
        for content in contents:
            c_ids = self.tokenizer.encode(content)[1:]  # drop CLS, keep ... SEP
            pair = q_ids + [SEP_ID] + c_ids
            rows.append(pair[: self.max_len])
        longest = max(len(r) for r in rows)
        t = min(_round_up(longest, 16), self.max_len)
        out = np.full((len(rows), t), PAD_ID, dtype=np.int32)
        for i, r in enumerate(rows):
            r = r[:t]
            out[i, : len(r)] = r
        return out

    def score_batch(self, query: str, contents: Sequence[str]) -> np.ndarray:
        if not contents:
            return np.zeros((0,), dtype=np.float32)
        ids = self._encode_pairs(query, contents)
        b = _round_up_pow2(ids.shape[0])
        if b != ids.shape[0]:
            ids = np.pad(ids, ((0, b - ids.shape[0]), (0, 0)))
        scores = cross_encoder_scores(self.params, jnp.asarray(ids), self.config)
        return np.asarray(scores[: len(contents)])

    def rerank(self, query: str, candidates: Sequence[RetrievalResult], top_k: int) -> List[RetrievalResult]:
        scores = self.score_batch(query, [r.chunk.content for r in candidates])
        rescored = [
            RetrievalResult(
                chunk=r.chunk,
                dense_score=r.dense_score,
                sparse_score=r.sparse_score,
                fused_score=r.fused_score,
                rerank_score=float(s),
            )
            for r, s in zip(candidates, scores)
        ]
        rescored.sort(key=lambda r: (-(r.rerank_score or 0.0), r.chunk.id))
        return rescored[:top_k]
