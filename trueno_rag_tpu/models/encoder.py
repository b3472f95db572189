"""MiniLM/BGE-class transformer encoder as a pure-JAX forward pass.

Capability-equivalent to the reference's ``FastEmbedder`` family
(reference: embed.rs:348-532 — AllMiniLmL6V2(384), AllMiniLmL12V2(384),
BgeSmallEnV15(384), BgeBaseEnV15(768), NomicEmbedTextV1(768) via ONNX
Runtime), rebuilt TPU-first:

- Parameters are a flat pytree with layer-stacked weights; the layer
  loop is a ``lax.scan``, so XLA compiles ONE block regardless of depth.
- Compute runs in bfloat16 on the MXU with float32 layernorm/softmax
  accumulation; pooled outputs are float32.
- Static shapes: token batches pad to power-of-two (batch, seq) buckets.
- The pooling strategies the reference only *configures*
  (PoolingStrategy, embed.rs:8-24, never actually applied) are
  implemented for real here: cls / mean / weighted_mean / last_token,
  all padding-mask-aware.

Tokenization: no network egress in this environment, so the default is
:class:`HashTokenizer` — deterministic hashed word ids (the same trick
as the reference's MockEmbedder, applied at the token level) — which
exercises the full real forward pass; load a real vocab/checkpoint from
local disk for production embeddings.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from trueno_rag_tpu.embed import Embedder, EmbeddingConfig, PoolingStrategy
from trueno_rag_tpu.errors import InvalidConfigError
from trueno_rag_tpu.text import tokenize_simple

PAD_ID = 0
CLS_ID = 1
SEP_ID = 2
_RESERVED = 3


@dataclass(frozen=True)
class EncoderConfig:
    """Architecture hyperparameters. ``minilm_l6`` mirrors
    sentence-transformers/all-MiniLM-L6-v2's shape (384-d, 6 layers,
    12 heads); ``bge_base`` mirrors BAAI/bge-base-en-v1.5 (768-d)."""

    vocab_size: int = 30522
    hidden_dim: int = 384
    num_layers: int = 6
    num_heads: int = 12
    mlp_dim: int = 1536
    max_len: int = 256
    pooling: str = PoolingStrategy.MEAN.value
    normalize: bool = True
    compute_dtype: Any = jnp.bfloat16
    # Position encoding: "learned" (BERT/MiniLM/BGE absolute table) or
    # "rotary" (RoPE on q/k per head — RoFormer/Nomic-class encoders;
    # no pos_emb parameter). rope_interleaved selects the pairing:
    # False = NeoX/llama split-half (what flash-attn and Nomic use),
    # True = GPT-J/RoFormer even-odd interleaving.
    position: str = "learned"
    rope_base: float = 10000.0
    rope_interleaved: bool = False
    # MLP flavor: "gelu" (BERT intermediate->output) or "swiglu"
    # (Nomic: mlp_w1 packs [gate|up] as [H, 2*mlp_dim])
    mlp: str = "gelu"
    # Rematerialize transformer blocks under grad (jax.checkpoint):
    # activations recompute in the backward pass instead of living
    # across it — trades ~1/3 more FLOPs for O(layers) less activation
    # HBM, the standard lever for long-sequence / large-batch
    # contrastive training. No effect on inference.
    remat: bool = False

    def __post_init__(self) -> None:
        if self.hidden_dim % self.num_heads != 0:
            raise InvalidConfigError("hidden_dim must be divisible by num_heads")
        if self.position not in ("learned", "rotary"):
            raise InvalidConfigError(f"unknown position {self.position!r}")
        if self.mlp not in ("gelu", "swiglu"):
            raise InvalidConfigError(f"unknown mlp {self.mlp!r}")
        if (self.hidden_dim // self.num_heads) % 2 != 0 and self.position == "rotary":
            raise InvalidConfigError("rotary needs an even head dim")

    @classmethod
    def minilm_l6(cls) -> "EncoderConfig":
        return cls(hidden_dim=384, num_layers=6, num_heads=12, mlp_dim=1536)

    @classmethod
    def minilm_l12(cls) -> "EncoderConfig":
        return cls(hidden_dim=384, num_layers=12, num_heads=12, mlp_dim=1536)

    @classmethod
    def bge_small(cls) -> "EncoderConfig":
        return cls(hidden_dim=384, num_layers=12, num_heads=12, mlp_dim=1536)

    @classmethod
    def bge_base(cls) -> "EncoderConfig":
        return cls(hidden_dim=768, num_layers=12, num_heads=12, mlp_dim=3072)

    @classmethod
    def nomic(cls) -> "EncoderConfig":
        """nomic-ai/nomic-embed-text-v1's shape (embed.rs:348-404 lists
        it in the reference's model zoo): 768-d, 12 layers, rotary
        position, SwiGLU MLP. The real model runs 8192 tokens; max_len
        caps at 2048 here — O(T^2) attention memory is the binding
        constraint, and ops/pallas/attention.py is the long-context
        path beyond it."""
        return cls(vocab_size=30528, hidden_dim=768, num_layers=12,
                   num_heads=12, mlp_dim=3072, max_len=2048,
                   position="rotary", mlp="swiglu")

    @classmethod
    def tiny(cls) -> "EncoderConfig":
        """Test-size config: real architecture, toy capacity."""
        return cls(vocab_size=512, hidden_dim=64, num_layers=2, num_heads=4, mlp_dim=128, max_len=64)


def init_encoder_params(rng: jax.Array, config: EncoderConfig) -> Dict[str, jax.Array]:
    """Initialize the parameter pytree. Per-layer weights carry a leading
    ``[num_layers, ...]`` axis so the forward pass can ``lax.scan``."""
    h, m, L = config.hidden_dim, config.mlp_dim, config.num_layers
    keys = jax.random.split(rng, 8)
    init = jax.nn.initializers.normal(stddev=0.02)

    def stack(key, shape):
        return init(key, (L, *shape), jnp.float32)

    m1 = 2 * m if config.mlp == "swiglu" else m
    params = {
        "tok_emb": init(keys[0], (config.vocab_size, h), jnp.float32),
        "emb_ln_scale": jnp.ones((h,), jnp.float32),
        "emb_ln_bias": jnp.zeros((h,), jnp.float32),
        "qkv_w": stack(keys[2], (h, 3 * h)),
        "qkv_b": jnp.zeros((L, 3 * h), jnp.float32),
        "attn_out_w": stack(keys[3], (h, h)),
        "attn_out_b": jnp.zeros((L, h), jnp.float32),
        "ln1_scale": jnp.ones((L, h), jnp.float32),
        "ln1_bias": jnp.zeros((L, h), jnp.float32),
        "mlp_w1": stack(keys[4], (h, m1)),
        "mlp_b1": jnp.zeros((L, m1), jnp.float32),
        "mlp_w2": stack(keys[5], (m, h)),
        "mlp_b2": jnp.zeros((L, h), jnp.float32),
        "ln2_scale": jnp.ones((L, h), jnp.float32),
        "ln2_bias": jnp.zeros((L, h), jnp.float32),
    }
    if config.position == "learned":
        params["pos_emb"] = init(keys[1], (config.max_len, h), jnp.float32)
    return params


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    """LayerNorm with float32 statistics regardless of compute dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-12)
    return (y * scale + bias).astype(x.dtype)


def _rope_heads(x: jax.Array, base: float, interleaved: bool) -> jax.Array:
    """Rotary position embedding over ``[B, H, T, hd]`` head states.

    ``interleaved=False`` is the NeoX/llama split-half pairing (pairs
    (x[i], x[i+half]) — flash-attn's default, what Nomic ships, and
    models/nemotron.py's convention); ``interleaved=True`` pairs
    even/odd lanes (GPT-J — transformers' RoFormer applies exactly
    this, which the import test pins numerically). Angles are computed
    in f32; per-pair frequency base**(-i/half) in both layouts."""
    b, nh, t, hd = x.shape
    half = hd // 2
    freqs = 1.0 / (base ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = jnp.arange(t, dtype=jnp.float32)[:, None] * freqs[None, :]
    cos = jnp.cos(angles)[None, None]  # [1, 1, T, half]
    sin = jnp.sin(angles)[None, None]
    if interleaved:
        x1 = x[..., 0::2].astype(jnp.float32)
        x2 = x[..., 1::2].astype(jnp.float32)
        y1 = x1 * cos - x2 * sin
        y2 = x2 * cos + x1 * sin
        return jnp.stack([y1, y2], axis=-1).reshape(x.shape).astype(x.dtype)
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def _attention(x: jax.Array, mask: jax.Array, lp: Dict[str, jax.Array],
               config: "EncoderConfig") -> jax.Array:
    """Bidirectional multi-head attention with padding-key masking.
    float32 softmax accumulation; matmuls on the MXU in compute dtype."""
    num_heads = config.num_heads
    b, t, h = x.shape
    hd = h // num_heads
    qkv = jnp.dot(x, lp["qkv_w"].astype(x.dtype)) + lp["qkv_b"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(a):
        return a.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    if config.position == "rotary":
        q = _rope_heads(q, config.rope_base, config.rope_interleaved)
        k = _rope_heads(k, config.rope_base, config.rope_interleaved)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / np.sqrt(hd).astype(np.float32)
    neg = jnp.asarray(-1e9, dtype=logits.dtype)
    logits = jnp.where(mask[:, None, None, :], logits, neg)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, h)
    return jnp.dot(ctx, lp["attn_out_w"].astype(x.dtype)) + lp["attn_out_b"].astype(x.dtype)


def _block(x: jax.Array, mask: jax.Array, lp: Dict[str, jax.Array],
           config: "EncoderConfig") -> jax.Array:
    """Post-LN transformer block (BERT/MiniLM convention; Nomic-class
    configs swap the GELU MLP for SwiGLU)."""
    attn = _attention(x, mask, lp, config)
    x = _layer_norm(x + attn, lp["ln1_scale"], lp["ln1_bias"])
    pre = jnp.dot(x, lp["mlp_w1"].astype(x.dtype)) + lp["mlp_b1"].astype(x.dtype)
    if config.mlp == "swiglu":
        gate, up = jnp.split(pre, 2, axis=-1)
        hdn = jax.nn.silu(gate) * up
    else:
        # exact (erf) GELU: BERT/MiniLM/BGE checkpoints use it, and the
        # default tanh approximation drifts ~1e-3 per activation —
        # enough to flip near-tie rankings under REAL loaded weights
        hdn = jax.nn.gelu(pre, approximate=False)
    out = jnp.dot(hdn, lp["mlp_w2"].astype(x.dtype)) + lp["mlp_b2"].astype(x.dtype)
    return _layer_norm(x + out, lp["ln2_scale"], lp["ln2_bias"])


def _pool(hidden: jax.Array, mask: jax.Array, pooling: str) -> jax.Array:
    """Padding-aware pooling → [B, H] float32."""
    hidden = hidden.astype(jnp.float32)
    maskf = mask.astype(jnp.float32)
    if pooling == PoolingStrategy.CLS.value:
        return hidden[:, 0, :]
    if pooling == PoolingStrategy.LAST_TOKEN.value:
        last = jnp.maximum(jnp.sum(mask, axis=1) - 1, 0)  # [B]
        return jnp.take_along_axis(hidden, last[:, None, None], axis=1)[:, 0, :]
    if pooling == PoolingStrategy.WEIGHTED_MEAN.value:
        t = hidden.shape[1]
        w = jax.lax.broadcasted_iota(jnp.float32, (1, t), 1) + 1.0
        w = w * maskf
        return jnp.sum(hidden * w[..., None], axis=1) / jnp.maximum(
            jnp.sum(w, axis=1, keepdims=True), 1e-9
        )
    # mean (default)
    return jnp.sum(hidden * maskf[..., None], axis=1) / jnp.maximum(
        jnp.sum(maskf, axis=1, keepdims=True), 1e-9
    )


def _token_states(
    params: Dict[str, jax.Array],
    token_ids: jax.Array,  # [B, T] int32
    config: EncoderConfig,
):
    """Shared trunk: ids → final per-token hidden states (compute
    dtype) + padding mask. ``encoder_forward`` pools these; the
    late-interaction scorer consumes them token-wise."""
    mask = token_ids != PAD_ID
    t = token_ids.shape[1]
    dtype = config.compute_dtype
    x = params["tok_emb"][token_ids]
    if config.position == "learned":
        x = x + params["pos_emb"][:t][None, :, :]
    x = _layer_norm(x.astype(dtype), params["emb_ln_scale"], params["emb_ln_bias"])

    layer_params = {
        k: params[k]
        for k in (
            "qkv_w", "qkv_b", "attn_out_w", "attn_out_b",
            "ln1_scale", "ln1_bias", "mlp_w1", "mlp_b1",
            "mlp_w2", "mlp_b2", "ln2_scale", "ln2_bias",
        )
    }

    block = _block
    if config.remat:
        block = jax.checkpoint(_block, static_argnums=(3,))

    def scan_body(carry, lp):
        return block(carry, mask, lp, config), None

    x, _ = jax.lax.scan(scan_body, x, layer_params)
    return x, mask


@partial(jax.jit, static_argnames=("config",))
def encoder_token_states(
    params: Dict[str, jax.Array],
    token_ids: jax.Array,  # [B, T] int32
    config: EncoderConfig,
):
    """Per-token final states ``([B, T, H] float32, mask [B, T])`` —
    the token-level interface for late-interaction (MaxSim) scoring."""
    x, mask = _token_states(params, token_ids, config)
    return x.astype(jnp.float32), mask


@partial(jax.jit, static_argnames=("config",))
def encoder_forward(
    params: Dict[str, jax.Array],
    token_ids: jax.Array,  # [B, T] int32
    config: EncoderConfig,
) -> jax.Array:
    """Full encoder forward: ids → pooled (optionally L2-normed)
    ``[B, hidden_dim]`` float32 embeddings."""
    x, mask = _token_states(params, token_ids, config)
    pooled = _pool(x, mask, config.pooling)
    if config.normalize:
        n = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
        pooled = pooled / jnp.where(n == 0.0, 1.0, n)
    return pooled


# ---------------------------------------------------------------------------
# Tokenization
# ---------------------------------------------------------------------------


class HashTokenizer:
    """Deterministic word-level tokenizer: ``id = 3 + blake2b(word) %
    (vocab - 3)``. No vocabulary files needed; stable across processes.
    Produces ``[CLS] tokens... [SEP]`` like BERT-family tokenizers."""

    def __init__(self, vocab_size: int, max_len: int) -> None:
        self.vocab_size = vocab_size
        self.max_len = max_len
        self._cache: Dict[str, int] = {}

    def _word_id(self, w: str) -> int:
        if len(self._cache) > 262_144:
            # long-lived serving over ID/URL-heavy corpora would grow
            # the word cache without bound; the recompute it saves is
            # ~1 µs, so dropping it wholesale is cheaper than an LRU
            self._cache.clear()
        cached = self._cache.get(w)
        if cached is None:
            digest = hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest()
            cached = _RESERVED + int.from_bytes(digest, "little") % (self.vocab_size - _RESERVED)
            self._cache[w] = cached
        return cached

    def encode(self, text: str) -> List[int]:
        ids = [CLS_ID]
        for w in tokenize_simple(text)[: self.max_len - 2]:
            ids.append(self._word_id(w))
        ids.append(SEP_ID)
        return ids

    def encode_batch(self, texts: Sequence[str], pad_multiple: int = 16) -> np.ndarray:
        encoded = [self.encode(t) for t in texts]
        longest = max((len(e) for e in encoded), default=2)
        t = min(_round_up(longest, pad_multiple), self.max_len)
        out = np.full((len(texts), t), PAD_ID, dtype=np.int32)
        for i, e in enumerate(encoded):
            e = e[:t]
            out[i, : len(e)] = e
        return out


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _round_up_pow2(n: int, minimum: int = 8) -> int:
    m = minimum
    while m < n:
        m *= 2
    return m


# ---------------------------------------------------------------------------
# Embedder wrapper
# ---------------------------------------------------------------------------


class JaxEncoderEmbedder(Embedder):
    """``Embedder`` backed by the JAX encoder forward pass.

    The full query path — tokenize (host) → forward → pool → normalize
    (device) — compiles to one XLA program per (batch, seq) bucket.
    ``embed_queries_device`` returns the device array directly so the
    retrieval stack can fuse encode→score→fuse without host hops.
    """

    def __init__(
        self,
        config: Optional[EncoderConfig] = None,
        params: Optional[Dict[str, jax.Array]] = None,
        embedding_config: Optional[EmbeddingConfig] = None,
        seed: int = 0,
        model_name: str = "jax-minilm-l6",
    ) -> None:
        super().__init__(embedding_config)
        self.encoder_config = config or EncoderConfig.minilm_l6()
        if embedding_config is not None:
            # an explicitly-passed EmbeddingConfig carries the pooling /
            # normalize / truncation choices (reference semantics: they
            # live on EmbeddingConfig). Only NON-DEFAULT fields override
            # the encoder config, so an explicit EncoderConfig(pooling=
            # "cls") survives an EmbeddingConfig passed for its prefixes.
            import dataclasses

            from trueno_rag_tpu.embed import EmbeddingConfig as _EC

            defaults = _EC()
            updates = {}
            if embedding_config.pooling != defaults.pooling:
                updates["pooling"] = embedding_config.pooling.value
            if embedding_config.normalize != defaults.normalize:
                updates["normalize"] = embedding_config.normalize
            if embedding_config.max_length != defaults.max_length:
                updates["max_len"] = min(
                    embedding_config.max_length, self.encoder_config.max_len
                )
            if updates:
                self.encoder_config = dataclasses.replace(
                    self.encoder_config, **updates
                )
        self.params = params if params is not None else init_encoder_params(
            jax.random.PRNGKey(seed), self.encoder_config
        )
        self.tokenizer = HashTokenizer(self.encoder_config.vocab_size, self.encoder_config.max_len)
        self._model_name = model_name

    @property
    def dimension(self) -> int:
        return self.encoder_config.hidden_dim

    @property
    def model_id(self) -> str:
        return self._model_name

    def _forward_texts(self, texts: Sequence[str]) -> jax.Array:
        ids = self.tokenizer.encode_batch(texts)
        b = _round_up_pow2(ids.shape[0])
        if b != ids.shape[0]:  # pad batch to bucket to bound recompiles
            ids = np.pad(ids, ((0, b - ids.shape[0]), (0, 0)))
        out = encoder_forward(self.params, jnp.asarray(ids), self.encoder_config)
        return out[: len(texts)]

    def embed(self, text: str) -> np.ndarray:
        return np.asarray(self._forward_texts([text])[0])

    def embed_batch(self, texts: Sequence[str]) -> np.ndarray:
        if len(texts) == 0:
            return np.zeros((0, self.dimension), dtype=np.float32)
        return np.asarray(self._forward_texts(list(texts)))

    def embed_queries_device(self, queries: Sequence[str]) -> jax.Array:
        """Device-resident query embeddings for the fused retrieval path."""
        return self._forward_texts([self.config.query_prefix + q for q in queries])

    # -- checkpointing ---------------------------------------------------------

    def save_checkpoint(self, path: str) -> None:
        from trueno_rag_tpu.persist import save_params

        save_params(path, self.params, meta={"model_name": self._model_name})

    @classmethod
    def load_checkpoint(
        cls, path: str, config: Optional[EncoderConfig] = None, **kw
    ) -> "JaxEncoderEmbedder":
        from trueno_rag_tpu.persist import load_params

        params, meta = load_params(path)
        return cls(config=config, params=params, model_name=meta.get("model_name", "jax-encoder"), **kw)
