"""Late-interaction (ColBERT-style MaxSim) reranking.

A capability tier between the bi-encoder (one vector per text — cheap,
coarse) and the cross-encoder (joint forward per pair — precise,
expensive): encode query and candidates *separately* into per-token
vectors and score

    MaxSim(q, d) = Σ_{i ∈ q tokens} max_{j ∈ d tokens} ⟨q_i, d_j⟩

so token-level evidence survives without any joint forward. The
reference has no analog (its rerankers are lexical/mock,
rerank.rs:17-264); this is a native TPU design — the interaction is one
``[Tq, H] × [K·Td, H]`` MXU matmul followed by masked VPU reductions,
and query/candidate encoding shares :mod:`trueno_rag_tpu.models.encoder`'s
trunk (one jitted program end-to-end).

Token vectors are L2-normalized (cosine MaxSim, the ColBERT v1 choice),
padding doc tokens are masked to -inf before the max, and padding query
tokens contribute zero to the sum, so scores are length-honest.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from trueno_rag_tpu.chunking import Chunk
from trueno_rag_tpu.models.encoder import (
    EncoderConfig,
    HashTokenizer,
    _round_up_pow2,
    encoder_token_states,
    init_encoder_params,
)
from trueno_rag_tpu.retrieve import RetrievalResult

NEG_INF = float("-inf")


def _l2_tokens(x: jax.Array) -> jax.Array:
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.where(n == 0.0, 1.0, n)


def maxsim(
    q_tok: jax.Array,  # [Tq, H] f32 (normalized)
    q_mask: jax.Array,  # [Tq] bool
    d_tok: jax.Array,  # [K, Td, H] f32 (normalized)
    d_mask: jax.Array,  # [K, Td] bool
) -> jax.Array:
    """→ [K] MaxSim scores of one query against K candidates."""
    sim = jnp.einsum(
        "qh,kth->kqt", q_tok, d_tok,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    sim = jnp.where(d_mask[:, None, :], sim, NEG_INF)
    best = jnp.max(sim, axis=2)  # [K, Tq]
    # all-padding candidates produce -inf bests; they score 0 like an
    # empty document rather than poisoning the sum
    best = jnp.where(q_mask[None, :] & jnp.isfinite(best), best, 0.0)
    return jnp.sum(best, axis=1)


def maxsim_oracle(q_tok, q_mask, d_tok, d_mask) -> np.ndarray:
    """Scalar NumPy oracle for :func:`maxsim` (parity tests)."""
    q_tok, d_tok = np.asarray(q_tok, np.float32), np.asarray(d_tok, np.float32)
    q_mask, d_mask = np.asarray(q_mask, bool), np.asarray(d_mask, bool)
    out = np.zeros((d_tok.shape[0],), np.float32)
    for k in range(d_tok.shape[0]):
        total = 0.0
        for i in range(q_tok.shape[0]):
            if not q_mask[i]:
                continue
            best = NEG_INF
            for j in range(d_tok.shape[1]):
                if not d_mask[k, j]:
                    continue
                best = max(best, float(q_tok[i] @ d_tok[k, j]))
            if best != NEG_INF:
                total += best
        out[k] = total
    return out


@functools.partial(jax.jit, static_argnames=("config",))
def late_interaction_scores(
    params: Dict[str, jax.Array],
    q_ids: jax.Array,  # [1, Tq] int32
    d_ids: jax.Array,  # [K, Td] int32
    config: EncoderConfig,
) -> jax.Array:
    """One XLA program: encode query + candidates through the shared
    trunk, normalize tokens, MaxSim → ``[K]`` scores."""
    q_tok, q_mask = encoder_token_states(params, q_ids, config)
    d_tok, d_mask = encoder_token_states(params, d_ids, config)
    return maxsim(_l2_tokens(q_tok[0]), q_mask[0], _l2_tokens(d_tok), d_mask)


class LateInteractionReranker:
    """Reranker-protocol wrapper (see rerank.py) around MaxSim scoring.

    Shares weights with a bi-encoder when ``params`` is passed (the
    ColBERT recipe: one trunk, token-level scoring at rerank time);
    otherwise initializes its own.
    """

    def __init__(
        self,
        config: Optional[EncoderConfig] = None,
        params: Optional[Dict[str, jax.Array]] = None,
        seed: int = 0,
        max_len: int = 128,
    ) -> None:
        self.config = config or EncoderConfig.tiny()
        self.params = params if params is not None else init_encoder_params(
            jax.random.PRNGKey(seed), self.config
        )
        self.max_len = min(max_len, self.config.max_len)
        self.tokenizer = HashTokenizer(self.config.vocab_size, self.max_len)

    def score_batch(self, query: str, contents: Sequence[str]) -> np.ndarray:
        if not contents:
            return np.zeros((0,), dtype=np.float32)
        q_ids = self.tokenizer.encode_batch([query])
        d_ids = self.tokenizer.encode_batch(contents)
        k = _round_up_pow2(d_ids.shape[0])
        if k != d_ids.shape[0]:  # bucket K to bound recompiles
            d_ids = np.pad(d_ids, ((0, k - d_ids.shape[0]), (0, 0)))
        scores = late_interaction_scores(
            self.params, jnp.asarray(q_ids), jnp.asarray(d_ids), self.config
        )
        return np.asarray(scores[: len(contents)])

    def rerank(
        self, query: str, candidates: Sequence[RetrievalResult], top_k: int
    ) -> List[RetrievalResult]:
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


# ---------------------------------------------------------------------------
# Corpus-scale retrieval (TokenVectorStore-backed)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("config",))
def _token_states_jit(params, token_ids, config):
    return encoder_token_states(params, token_ids, config)


class LateInteractionRetriever:
    """Corpus-scale MaxSim retrieval (ColBERT-class).

    The shared encoder trunk produces per-token vectors for BOTH sides
    (one model, no joint forward); documents index into a
    :class:`~trueno_rag_tpu.index.token_store.TokenVectorStore`, and
    queries run either the exact blockwise MaxSim scan or the certified
    token-pruned tier (``TokenStoreConfig.scan``). The reference has no
    analog — its retrieval is strictly single-vector
    (index.rs:321-437) — so the contract here follows the framework's
    own retriever protocol (index/index_batch/retrieve, RetrievalResult
    with the MaxSim score in ``dense_score``).

    Token L2-normalization happens inside the store (insert and query),
    so scores are cosine MaxSim regardless of encoder scaling.
    """

    def __init__(
        self,
        config: Optional[EncoderConfig] = None,
        params: Optional[Dict[str, jax.Array]] = None,
        seed: int = 0,
        max_len: int = 32,
        store_config: Optional["TokenStoreConfig"] = None,
        registry=None,
    ) -> None:
        from trueno_rag_tpu.index.token_store import TokenStoreConfig, TokenVectorStore

        self.config = config or EncoderConfig.tiny()
        self.params = params if params is not None else init_encoder_params(
            jax.random.PRNGKey(seed), self.config
        )
        self.max_len = min(max_len, self.config.max_len)
        self.tokenizer = HashTokenizer(self.config.vocab_size, self.max_len)
        sc = store_config or TokenStoreConfig(
            hidden_dim=self.config.hidden_dim, max_tokens=self.max_len
        )
        if sc.hidden_dim != self.config.hidden_dim:
            from trueno_rag_tpu.errors import InvalidConfigError

            raise InvalidConfigError(
                f"store hidden_dim {sc.hidden_dim} != encoder hidden_dim "
                f"{self.config.hidden_dim}"
            )
        self.store = TokenVectorStore(sc, registry=registry)

    @property
    def registry(self):
        """The chunk registry (the store owns it) — exposed so registry
        consumers like ``tune.calibration_queries`` sample real corpus
        words instead of falling back to a constant string."""
        return self.store.registry

    def _encode(self, texts: Sequence[str]):
        """texts → ``(tokens [B, T, H] f32, mask [B, T] bool)`` numpy.
        B is bucketed to a power of two to bound recompiles (T is
        already bucketed by the tokenizer's pad_multiple)."""
        ids = self.tokenizer.encode_batch(texts)
        b = _round_up_pow2(ids.shape[0])
        if b != ids.shape[0]:
            ids = np.pad(ids, ((0, b - ids.shape[0]), (0, 0)))
        tok, mask = _token_states_jit(self.params, jnp.asarray(ids), self.config)
        n = len(texts)
        return np.asarray(tok[:n]), np.asarray(mask[:n])

    def index(self, chunk: Chunk) -> None:
        tok, mask = self._encode([chunk.content])
        self.store.insert(chunk, tok[0], mask[0])

    def index_batch(self, chunks: Sequence[Chunk], encode_batch: int = 128) -> None:
        for lo in range(0, len(chunks), encode_batch):
            batch = chunks[lo : lo + encode_batch]
            tok, mask = self._encode([c.content for c in batch])
            self.store.insert_many(batch, list(tok), list(mask))

    def retrieve(self, query: str, k: int,
                 tag_filter=None) -> List[RetrievalResult]:
        return self.retrieve_batch(
            [query], k,
            tag_filter=None if tag_filter is None else [tag_filter],
        )[0]

    def retrieve_batch(
        self, queries: Sequence[str], k: int, tag_filter=None
    ) -> List[List[RetrievalResult]]:
        """Batched MaxSim retrieval. ``tag_filter`` (one TagFilter or a
        per-query list, the serving contract) resolves host-side to an
        allowed-row mask that joins the tombstone mask BEFORE the scan,
        so every tier — exact, token-pruned, tiered — searches the
        FILTERED corpus exactly (certified sets are the exact top-k
        among allowed rows). Queries sharing a filter batch together;
        distinct filters dispatch per group (filters are per-row masks
        device-side, and serving batches rarely mix many)."""
        if not queries or len(self.store) == 0 or k <= 0:
            return [[] for _ in queries]
        q_tok, q_mask = self._encode(list(queries))
        b = len(queries)
        out: List[List[RetrievalResult]] = [[] for _ in range(b)]
        if tag_filter is None:
            groups = [(None, list(range(b)))]
        else:
            from trueno_rag_tpu.retrieve import resolve_tag_filters

            t_all, t_any, t_none = resolve_tag_filters(
                self.store.registry, tag_filter, b
            )
            by_words: Dict[tuple, List[int]] = {}
            for i in range(b):
                by_words.setdefault(
                    (int(t_all[i]), int(t_any[i]), int(t_none[i])), []
                ).append(i)
            cap = self.store._host.shape[0]
            bits = self.store.registry.tag_bits_array(cap)
            groups = []
            for (wa, wy, wn), idxs in by_words.items():
                if wa == 0 and wy == 0 and wn == 0:
                    groups.append((None, idxs))
                    continue
                allowed = (
                    ((bits & wa) == wa)
                    & ((wy == 0) | ((bits & wy) != 0))
                    & ((bits & wn) == 0)
                )
                groups.append((allowed, idxs))
        for allowed, idxs in groups:
            scores, rows = self.store.search_arrays(
                q_tok[idxs], q_mask[idxs], k, allowed_rows=allowed
            )
            for j, i in enumerate(idxs):
                hits = self.store._hydrate(scores[j], rows[j])
                out[i] = [
                    RetrievalResult(chunk=self.store.get(cid), dense_score=s)
                    for cid, s in hits
                ]
        return out

    def ensure_ready(self) -> None:
        """Warm the device replica (and the scan-tier pack, if one is
        configured) so a hot reload swaps in a ready index — the serving
        layer calls this before exposing a reloaded retriever."""
        self.store._device()
        if self.store.config.scan == "tiered":
            self.store._device_tier()

    def __len__(self) -> int:
        return len(self.store)
