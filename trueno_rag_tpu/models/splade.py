"""Learned sparse retrieval (SPLADE-class): a trainable vocabulary
expansion model whose sparse activations score through the framework's
block-gather posting machinery.

The reference has no learned-sparse retrieval of any kind — its sparse
path is classic BM25 over surface tokens (reference: index.rs:30-280).
This family fills the quality band between BM25 (exact-term, no
semantics) and dense bi-encoders (semantic, but no exact-term
precision): the encoder expands each text into a sparse vector over the
VOCABULARY,

    w(x)[v] = max_i  mask_i · log(1 + relu(z_iv)),     z = MLM head

(the SPLADE-max formulation), so "tpu" can activate "accelerator" and
"chip" with learned weights, while exact matches keep their lexical
precision. Scoring is a weighted sparse dot
``score(q, d) = Σ_v w(q)[v] · w(d)[v]`` — after top-T sparsification
this is a postings problem, and it rides the SAME measured-fast device
path as BM25 (`ops/bm25.py::weighted_topk_blocks`: one wide block
gather at ~400 GB/s + candidate-space segment-sum + exact top-k), not a
new kernel. TPU-first choices:

- the expansion runs as one jitted XLA program (trunk + tied MLM head +
  log1p/relu/max over tokens) with static shapes; top-T sparsification
  is `lax.top_k` over the [B, V] activations;
- the MLM head is TIED to the trunk's token embedding (the BERT MLM
  convention): the only new parameters are the small transform layer
  and the vocab bias, so checkpoints stay trunk-shaped;
- documents pay expansion once at index time; a query pays one encoder
  forward + a candidate-space scan independent of corpus size.

Training (`train/contrastive.py::splade_contrastive_loss`) is in-batch
InfoNCE over the DENSE [B, B] activation dot (sparsification is
inference-only) plus the FLOPS regularizer Σ_v (mean_b w_bv)² that
drives activations sparse — the standard SPLADE recipe, here as one
jitted step.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from trueno_rag_tpu.chunking import Chunk
from trueno_rag_tpu.models.encoder import (
    EncoderConfig,
    HashTokenizer,
    _RESERVED,
    _layer_norm,
    _round_up_pow2,
    _token_states,
    init_encoder_params,
)
from trueno_rag_tpu.retrieve import RetrievalResult


def init_splade_params(rng: jax.Array, config: EncoderConfig) -> Dict[str, jax.Array]:
    """Trunk parameters + the MLM-style expansion head. The vocab
    projection is TIED to ``tok_emb`` (no [H, V] matrix of its own);
    the head adds only a dense transform (+LN) and a per-vocab bias —
    the BERT masked-LM head shape."""
    h = config.hidden_dim
    k_trunk, k_head = jax.random.split(rng)
    params = init_encoder_params(k_trunk, config)
    init = jax.nn.initializers.normal(stddev=0.02)
    params.update({
        "splade_tr_w": init(k_head, (h, h), jnp.float32),
        "splade_tr_b": jnp.zeros((h,), jnp.float32),
        "splade_ln_scale": jnp.ones((h,), jnp.float32),
        "splade_ln_bias": jnp.zeros((h,), jnp.float32),
        "splade_vocab_bias": jnp.zeros((config.vocab_size,), jnp.float32),
    })
    return params


def splade_head(
    params: Dict[str, jax.Array],
    states: jax.Array,  # [B, T, H] token states (trunk output)
    mask: jax.Array,  # [B, T] bool
) -> jax.Array:
    """Token states → sparse vocab activations ``[B, V]`` f32.

    transform(+GELU)+LN, tied-embedding projection to vocab logits,
    then the SPLADE-max pool ``max_t log1p(relu(z))`` over valid
    tokens. Reserved ids (PAD/CLS/SEP-class, the tokenizer's first
    ``_RESERVED`` slots) are zeroed so padding machinery never becomes
    a scoring term. Activations are ≥ 0 by construction — the property
    the candidate-space segment-sum scoring relies on
    (ops/bm25._candidate_topk's cumsum-difference needs non-negative
    contributions)."""
    x = states.astype(jnp.float32)
    x = jax.nn.gelu(
        jnp.dot(x, params["splade_tr_w"]) + params["splade_tr_b"],
        approximate=False,
    )
    x = _layer_norm(x, params["splade_ln_scale"], params["splade_ln_bias"])
    logits = (
        jnp.einsum(
            "bth,vh->btv", x, params["tok_emb"].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        + params["splade_vocab_bias"]
    )  # [B, T, V]
    act = jnp.log1p(jax.nn.relu(logits))
    act = jnp.where(mask[:, :, None], act, 0.0)
    act = jnp.max(act, axis=1)  # [B, V] — SPLADE-max pooling
    return act.at[:, :_RESERVED].set(0.0)


@functools.partial(jax.jit, static_argnames=("config",))
def splade_activations(
    params: Dict[str, jax.Array],
    token_ids: jax.Array,  # [B, T] int32
    config: EncoderConfig,
) -> jax.Array:
    """ids → sparse vocab activations ``[B, V]`` f32 (one XLA program:
    trunk + head + pool)."""
    states, mask = _token_states(params, token_ids, config)
    return splade_head(params, states, mask)


def splade_head_oracle(
    params: Dict[str, jax.Array],
    states: np.ndarray,  # [B, T, H] f32
    mask: np.ndarray,  # [B, T] bool
) -> np.ndarray:
    """Host oracle for :func:`splade_head` (scalar-faithful numpy; the
    framework's every-device-op-has-an-oracle convention)."""
    from scipy.special import erf  # scipy ships with the image's numpy stack

    x = np.asarray(states, np.float64)
    w = np.asarray(params["splade_tr_w"], np.float64)
    b = np.asarray(params["splade_tr_b"], np.float64)
    x = np.dot(x, w) + b
    x = 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))  # exact (erf) GELU
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    x = (x - mean) / np.sqrt(var + 1e-12)
    x = x * np.asarray(params["splade_ln_scale"], np.float64) + np.asarray(
        params["splade_ln_bias"], np.float64
    )
    logits = x @ np.asarray(params["tok_emb"], np.float64).T + np.asarray(
        params["splade_vocab_bias"], np.float64
    )
    act = np.log1p(np.maximum(logits, 0.0))
    act = np.where(np.asarray(mask, bool)[:, :, None], act, 0.0)
    act = act.max(axis=1)
    act[:, :_RESERVED] = 0.0
    return act.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("t",))
def splade_topt(acts: jax.Array, t: int) -> Tuple[jax.Array, jax.Array]:
    """Sparsify activations → ``(terms [B, T] int32, weights [B, T]
    f32)`` with the framework's invalid-slot convention (``-1`` term,
    ``0`` weight for empty slots). Deterministic: (weight desc, term
    asc) — `lax.top_k` prefers the lower index on ties."""
    t_eff = min(t, acts.shape[1])
    w, terms = jax.lax.top_k(acts, t_eff)
    live = w > 0.0
    terms = jnp.where(live, terms, -1).astype(jnp.int32)
    w = jnp.where(live, w, 0.0)
    if t_eff < t:
        terms = jnp.pad(terms, ((0, 0), (0, t - t_eff)), constant_values=-1)
        w = jnp.pad(w, ((0, 0), (0, t - t_eff)))
    return terms, w


class SpladeEncoder:
    """Host-facing expansion model: texts → top-T (term, weight) pairs.

    ``doc_top``/``query_top`` bound the expansion widths (documents
    typically keep more terms than queries — the asymmetry of the
    SPLADE serving recipe: doc-side cost is paid once at indexing)."""

    def __init__(
        self,
        config: Optional[EncoderConfig] = None,
        params: Optional[Dict[str, jax.Array]] = None,
        seed: int = 0,
        max_len: int = 64,
        doc_top: int = 128,
        query_top: int = 32,
    ) -> None:
        self.config = config or EncoderConfig.tiny()
        self.params = (
            params
            if params is not None
            else init_splade_params(jax.random.PRNGKey(seed), self.config)
        )
        if "splade_vocab_bias" not in self.params:
            from trueno_rag_tpu.errors import InvalidConfigError

            raise InvalidConfigError(
                "params lack the SPLADE head (init_splade_params)"
            )
        self.max_len = min(max_len, self.config.max_len)
        self.doc_top = min(doc_top, self.config.vocab_size)
        self.query_top = min(query_top, self.config.vocab_size)
        self.tokenizer = HashTokenizer(self.config.vocab_size, self.max_len)
        # recorded for artifact identity only (meaningless when params
        # were passed in — the fingerprint is the real identity then)
        self.seed = seed if params is None else None

    def params_fingerprint(self) -> str:
        """Deterministic 16-hex digest of the encoder's weights.

        Index artifacts store this next to the learned postings so a
        load can verify the supplied query encoder IS the model that
        produced the document expansions — a mismatched encoder (other
        seed, trained vs untrained) makes learned scores silent noise,
        the failure mode persist.load_index guards against."""
        import hashlib

        h = hashlib.blake2b(digest_size=8)
        for name in sorted(self.params):
            arr = np.asarray(self.params[name])
            h.update(name.encode())
            h.update(str(arr.shape).encode())
            h.update(np.ascontiguousarray(arr, np.float32).tobytes())
        return h.hexdigest()

    def _expand(self, texts: Sequence[str], top: int):
        ids = self.tokenizer.encode_batch(texts)
        b = _round_up_pow2(ids.shape[0])  # bucketed batch: bounded recompiles
        if b != ids.shape[0]:
            ids = np.pad(ids, ((0, b - ids.shape[0]), (0, 0)))
        acts = splade_activations(self.params, jnp.asarray(ids), self.config)
        terms, w = splade_topt(acts, top)
        n = len(texts)
        return np.asarray(terms[:n]), np.asarray(w[:n])

    def expand_documents(self, texts: Sequence[str]):
        """→ ``(terms [N, doc_top] int32, weights [N, doc_top] f32)``."""
        return self._expand(texts, self.doc_top)

    def expand_queries(self, texts: Sequence[str]):
        """→ ``(terms [B, query_top] int32, weights [B, query_top] f32)``."""
        return self._expand(texts, self.query_top)


class SpladeRetriever:
    """Learned-sparse retrieval end to end: expansion model + the
    device posting index (`index/learned_sparse.py`).

    Protocol mirrors the framework's retrievers (index / index_batch /
    retrieve / retrieve_batch returning ``RetrievalResult`` with the
    score in ``sparse_score``), so it drops into pipelines and serving
    wherever BM25 does."""

    def __init__(
        self,
        config: Optional[EncoderConfig] = None,
        params: Optional[Dict[str, jax.Array]] = None,
        seed: int = 0,
        max_len: int = 64,
        doc_top: int = 128,
        query_top: int = 32,
        registry=None,
    ) -> None:
        from trueno_rag_tpu.index.learned_sparse import LearnedSparseIndex

        self.encoder = SpladeEncoder(
            config=config, params=params, seed=seed, max_len=max_len,
            doc_top=doc_top, query_top=query_top,
        )
        self.index_store = LearnedSparseIndex(registry=registry)

    @property
    def params(self):
        return self.encoder.params

    @property
    def registry(self):
        return self.index_store.registry

    def index(self, chunk: Chunk) -> None:
        self.index_batch([chunk])

    def index_batch(self, chunks: Sequence[Chunk], encode_batch: int = 128) -> None:
        for lo in range(0, len(chunks), encode_batch):
            batch = chunks[lo : lo + encode_batch]
            terms, w = self.encoder.expand_documents([c.content for c in batch])
            self.index_store.add_batch(batch, terms, w)

    def remove(self, chunk_id: str) -> bool:
        return self.index_store.remove(chunk_id)

    def retrieve(self, query: str, k: int, tag_filter=None) -> List[RetrievalResult]:
        return self.retrieve_batch(
            [query], k, tag_filter=None if tag_filter is None else [tag_filter]
        )[0]

    def retrieve_batch(
        self, queries: Sequence[str], k: int, tag_filter=None
    ) -> List[List[RetrievalResult]]:
        """Batched learned-sparse retrieval. ``tag_filter`` resolves to
        an allowed-row mask that rides the scoring op itself
        (weighted_topk_blocks' ``allowed``), so the filtered top-k is
        exact — not an over-fetch-and-drop."""
        if not queries or len(self.index_store) == 0 or k <= 0:
            return [[] for _ in queries]
        q_terms, q_w = self.encoder.expand_queries(list(queries))
        b = len(queries)
        allowed = None
        if tag_filter is not None:
            from trueno_rag_tpu.retrieve import resolve_tag_filters

            t_all, t_any, t_none = resolve_tag_filters(
                self.registry, tag_filter, b
            )
            cap = self.index_store.capacity_rows
            bits = self.registry.tag_bits_array(cap)
            allowed = np.stack([
                ((bits & t_all[i]) == t_all[i])
                & ((t_any[i] == 0) | ((bits & t_any[i]) != 0))
                & ((bits & t_none[i]) == 0)
                for i in range(b)
            ])
        scores, rows = self.index_store.search_arrays(
            q_terms, q_w, k, allowed_rows=allowed
        )
        out: List[List[RetrievalResult]] = []
        for i in range(b):
            hits: List[RetrievalResult] = []
            for s, r in zip(scores[i], rows[i]):
                if r < 0:
                    continue
                cid = self.registry.id_of(int(r))
                if cid is None:
                    continue
                hits.append(
                    RetrievalResult(
                        chunk=self.registry.get_chunk(cid), sparse_score=float(s)
                    )
                )
            out.append(hits)
        return out

    def ensure_ready(self) -> None:
        self.index_store.ensure_ready()

    def __len__(self) -> int:
        return len(self.index_store)
