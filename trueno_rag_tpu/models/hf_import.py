"""Import BERT-family HuggingFace checkpoints into the JAX encoder.

MiniLM (all-MiniLM-L6/L12-v2), BGE (bge-small/base-en-v1.5) and friends
are BERT-architecture encoders; this module maps an HF checkpoint
directory (``config.json`` + ``model.safetensors``/``pytorch_model.bin``
+ ``vocab.txt``) onto :func:`trueno_rag_tpu.models.encoder`'s
layer-stacked parameter layout, giving real production embeddings from
locally-available weights (this environment has no network egress; the
reference's fastembed downloads models at first use, embed.rs:419-532).

Fidelity notes:
- HF Linear weights are ``[out, in]`` → transposed.
- Q/K/V concatenate into the fused ``qkv_w`` ``[hidden, 3*hidden]``.
- ``token_type_embeddings[0]`` folds into the word embeddings (retrieval
  encodes single segments, so every position is type 0).
- Requires ``pad_token_id == 0`` (standard for BERT vocabs) because the
  encoder masks on token id 0.

The faithfulness test constructs a *random-weight* ``BertModel`` with
``transformers`` (no download), exports it, and asserts our forward
matches it numerically.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np

from trueno_rag_tpu.errors import SerializationError
from trueno_rag_tpu.models.encoder import EncoderConfig, JaxEncoderEmbedder
from trueno_rag_tpu.models.tokenization import WordPieceTokenizer


def _load_hf_state(model_dir: str) -> Dict[str, np.ndarray]:
    st_path = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return load_file(st_path)
    pt_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(pt_path):
        import torch

        state = torch.load(pt_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in state.items()}
    raise SerializationError(f"no model.safetensors or pytorch_model.bin in {model_dir}")


def convert_bert_state(
    state: Dict[str, np.ndarray], num_layers: int, position: str = "learned"
) -> Dict[str, np.ndarray]:
    """HF BERT-family state dict → layer-stacked encoder params
    (float32). ``position="rotary"`` skips the absolute position table
    (RoFormer checkpoints have none — positions enter through RoPE on
    q/k instead)."""

    def get(name: str) -> np.ndarray:
        for prefix in ("", "bert.", "model.", "roformer."):
            key = prefix + name
            if key in state:
                return np.asarray(state[key], dtype=np.float32)
        raise SerializationError(f"missing HF weight: {name}")

    tok = get("embeddings.word_embeddings.weight")
    if any(k.endswith("embeddings.token_type_embeddings.weight") for k in state):
        tok = tok + get("embeddings.token_type_embeddings.weight")[0][None, :]

    def stack(fmt: str, transpose: bool = False) -> np.ndarray:
        mats = [get(fmt.format(i)) for i in range(num_layers)]
        if transpose:
            mats = [m.T for m in mats]
        return np.stack(mats)

    qkv_w = np.concatenate(
        [
            stack("encoder.layer.{}.attention.self.query.weight", transpose=True),
            stack("encoder.layer.{}.attention.self.key.weight", transpose=True),
            stack("encoder.layer.{}.attention.self.value.weight", transpose=True),
        ],
        axis=2,
    )  # [L, H, 3H]
    qkv_b = np.concatenate(
        [
            stack("encoder.layer.{}.attention.self.query.bias"),
            stack("encoder.layer.{}.attention.self.key.bias"),
            stack("encoder.layer.{}.attention.self.value.bias"),
        ],
        axis=1,
    )  # [L, 3H]

    out = {
        "tok_emb": tok,
        "emb_ln_scale": get("embeddings.LayerNorm.weight"),
        "emb_ln_bias": get("embeddings.LayerNorm.bias"),
        "qkv_w": qkv_w,
        "qkv_b": qkv_b,
        "attn_out_w": stack("encoder.layer.{}.attention.output.dense.weight", transpose=True),
        "attn_out_b": stack("encoder.layer.{}.attention.output.dense.bias"),
        "ln1_scale": stack("encoder.layer.{}.attention.output.LayerNorm.weight"),
        "ln1_bias": stack("encoder.layer.{}.attention.output.LayerNorm.bias"),
        "mlp_w1": stack("encoder.layer.{}.intermediate.dense.weight", transpose=True),
        "mlp_b1": stack("encoder.layer.{}.intermediate.dense.bias"),
        "mlp_w2": stack("encoder.layer.{}.output.dense.weight", transpose=True),
        "mlp_b2": stack("encoder.layer.{}.output.dense.bias"),
        "ln2_scale": stack("encoder.layer.{}.output.LayerNorm.weight"),
        "ln2_bias": stack("encoder.layer.{}.output.LayerNorm.bias"),
    }
    if position == "learned":
        out["pos_emb"] = get("embeddings.position_embeddings.weight")
    return out


def convert_nomic_state(
    state: Dict[str, np.ndarray], num_layers: int
) -> Dict[str, np.ndarray]:
    """nomic-bert-2048-family state dict (``encoder.layers.{i}.attn.Wqkv``
    / ``mlp.fc11``+``fc12`` SwiGLU naming) → layer-stacked encoder
    params.

    Gate order is pinned to flash-attn's ``GatedMlp``, which nomic's
    ``modeling_hf_nomic_bert.py`` derives its fc11/fc12 split from:
    ``y, gate = fc1(x).chunk(2); y * act(gate)`` — the SECOND chunk is
    activated, the same order as ``torch.nn.functional.glu`` (the
    sigmoid special case routes through ``F.glu`` directly, and the
    other activations use the same chunk order). So **fc11 is the
    LINEAR up-projection and fc12 the activated gate**:
    ``fc2(fc11(x) * act(fc12(x)))``. encoder._block splits ``mlp_w1``
    as ``[gate | up]`` with ``silu(gate) * up``, hence
    ``mlp_w1 = [fc12ᵀ | fc11ᵀ]``. tests/test_hf_import.py pins this
    against torch's ``F.glu`` chunk semantics (the only in-image ground
    truth for the convention; no egress to fetch a real checkpoint)."""

    def get(name: str, required: bool = True):
        for prefix in ("", "model.", "bert."):
            if prefix + name in state:
                return np.asarray(state[prefix + name], dtype=np.float32)
        if required:
            raise SerializationError(f"missing HF weight: {name}")
        return None

    h = get("embeddings.word_embeddings.weight").shape[1]

    def stack(fmt, transpose=False, default_shape=None):
        mats = []
        for i in range(num_layers):
            m = get(fmt.format(i), required=default_shape is None)
            if m is None:
                m = np.zeros(default_shape, np.float32)
            mats.append(m.T if transpose else m)
        return np.stack(mats)

    tok = get("embeddings.word_embeddings.weight")
    tte = get("embeddings.token_type_embeddings.weight", required=False)
    if tte is not None:
        tok = tok + tte[0][None, :]
    mlp_w1 = np.concatenate(
        [
            # [gate | up] = [fc12 | fc11] — see the gate-order pin above
            stack("encoder.layers.{}.mlp.fc12.weight", transpose=True),
            stack("encoder.layers.{}.mlp.fc11.weight", transpose=True),
        ],
        axis=2,
    )  # [L, H, 2M]
    m2 = mlp_w1.shape[2]
    m = m2 // 2
    return {
        "tok_emb": tok,
        "emb_ln_scale": get("emb_ln.weight"),
        "emb_ln_bias": get("emb_ln.bias"),
        "qkv_w": stack("encoder.layers.{}.attn.Wqkv.weight", transpose=True),
        "qkv_b": stack("encoder.layers.{}.attn.Wqkv.bias",
                       default_shape=(3 * h,)),
        "attn_out_w": stack("encoder.layers.{}.attn.out_proj.weight",
                            transpose=True),
        "attn_out_b": stack("encoder.layers.{}.attn.out_proj.bias",
                            default_shape=(h,)),
        "ln1_scale": stack("encoder.layers.{}.norm1.weight"),
        "ln1_bias": stack("encoder.layers.{}.norm1.bias"),
        "mlp_w1": mlp_w1,
        "mlp_b1": np.concatenate(
            [
                stack("encoder.layers.{}.mlp.fc12.bias", default_shape=(m,)),
                stack("encoder.layers.{}.mlp.fc11.bias", default_shape=(m,)),
            ],
            axis=1,
        ),
        "mlp_w2": stack("encoder.layers.{}.mlp.fc2.weight", transpose=True),
        "mlp_b2": stack("encoder.layers.{}.mlp.fc2.bias",
                        default_shape=(h,)),
        "ln2_scale": stack("encoder.layers.{}.norm2.weight"),
        "ln2_bias": stack("encoder.layers.{}.norm2.bias"),
    }


def load_hf_rotary_encoder(
    model_dir: str,
    pooling: str = "mean",
    normalize: bool = True,
    max_len: int = 256,
    compute_dtype: Any = None,
    embedding_config=None,
) -> JaxEncoderEmbedder:
    """Build a :class:`JaxEncoderEmbedder` from a local ROTARY encoder
    checkpoint: transformers ``roformer`` (rotary q/k, GELU MLP,
    GPT-J-interleaved pairing — numerically verified against a
    random-weight RoFormerModel in tests/test_hf_import.py) or a
    ``nomic_bert`` directory (rotary, SwiGLU, NeoX pairing — the
    reference zoo's NomicEmbedTextV1, embed.rs:348-404)."""
    import jax.numpy as jnp

    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    model_type = hf_cfg.get("model_type", "roformer")
    if model_type not in ("roformer", "nomic_bert"):
        raise SerializationError(
            f"load_hf_rotary_encoder expects roformer/nomic_bert, got {model_type!r}"
        )
    if hf_cfg.get("pad_token_id", 0) != 0:
        raise SerializationError("encoder requires pad_token_id == 0")
    is_nomic = model_type == "nomic_bert"
    config = EncoderConfig(
        vocab_size=hf_cfg["vocab_size"],
        hidden_dim=hf_cfg["hidden_size"],
        num_layers=hf_cfg["num_hidden_layers"],
        num_heads=hf_cfg["num_attention_heads"],
        # nomic's intermediate_size is the PER-BRANCH SwiGLU width
        # (fc11/fc12 are each [n_inner, H]) — exactly mlp_dim here
        mlp_dim=hf_cfg["intermediate_size"],
        max_len=min(max_len, hf_cfg.get("max_position_embeddings", max_len)),
        pooling=pooling,
        normalize=normalize,
        compute_dtype=compute_dtype if compute_dtype is not None else jnp.bfloat16,
        position="rotary",
        rope_base=float(hf_cfg.get("rotary_emb_base", 10000.0)),
        rope_interleaved=not is_nomic,
        mlp="swiglu" if is_nomic else "gelu",
    )
    state = _load_hf_state(model_dir)
    conv = (
        convert_nomic_state(state, config.num_layers)
        if is_nomic
        else convert_bert_state(state, config.num_layers, position="rotary")
    )
    params = {k: jnp.asarray(v) for k, v in conv.items()}
    name = hf_cfg.get("_name_or_path") or os.path.basename(os.path.normpath(model_dir))
    emb = JaxEncoderEmbedder(
        config=config, params=params, model_name=name,
        embedding_config=embedding_config,
    )
    vocab_path = os.path.join(model_dir, "vocab.txt")
    if os.path.exists(vocab_path):
        emb.tokenizer = WordPieceTokenizer.from_vocab_file(vocab_path, max_len=config.max_len)
    return emb


def load_hf_cross_encoder(
    model_dir: str,
    max_len: int = 256,
    compute_dtype: Any = None,
):
    """Build a :class:`~trueno_rag_tpu.models.cross_encoder.CrossEncoderReranker`
    from a local HF ``BertForSequenceClassification`` checkpoint (the
    architecture of the standard ms-marco MiniLM rerankers).

    Maps the BERT trunk like :func:`load_hf_bert_encoder`; the
    single-logit classifier head becomes the score head. HF pools the
    CLS state through ``bert.pooler`` (dense+tanh) before the
    classifier, so the pooler folds into the head computation.
    """
    import jax.numpy as jnp

    from trueno_rag_tpu.models.cross_encoder import CrossEncoderReranker

    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    config = EncoderConfig(
        vocab_size=hf_cfg["vocab_size"],
        hidden_dim=hf_cfg["hidden_size"],
        num_layers=hf_cfg["num_hidden_layers"],
        num_heads=hf_cfg["num_attention_heads"],
        mlp_dim=hf_cfg["intermediate_size"],
        max_len=min(max_len, hf_cfg.get("max_position_embeddings", max_len)),
        pooling="cls",
        normalize=False,
        compute_dtype=compute_dtype if compute_dtype is not None else jnp.bfloat16,
    )
    state = _load_hf_state(model_dir)
    params = {k: jnp.asarray(v) for k, v in convert_bert_state(state, config.num_layers).items()}

    def get(name: str) -> np.ndarray:
        for prefix in ("", "bert."):
            if prefix + name in state:
                return np.asarray(state[prefix + name], dtype=np.float32)
        raise SerializationError(f"missing HF weight: {name}")

    params["pooler_w"] = jnp.asarray(get("pooler.dense.weight").T)
    params["pooler_b"] = jnp.asarray(get("pooler.dense.bias"))
    clf_w = get("classifier.weight")  # [num_labels, H]
    if clf_w.shape[0] != 1:
        raise SerializationError(
            f"cross-encoder import expects a single-logit classifier, got {clf_w.shape[0]} labels"
        )
    params["score_w"] = jnp.asarray(clf_w.T)  # [H, 1]
    params["score_b"] = jnp.asarray(get("classifier.bias"))

    reranker = CrossEncoderReranker(config=config, params=params, max_len=config.max_len)
    vocab_path = os.path.join(model_dir, "vocab.txt")
    if os.path.exists(vocab_path):
        reranker.tokenizer = WordPieceTokenizer.from_vocab_file(vocab_path, max_len=config.max_len)
    reranker.has_pooler = True
    return reranker


def load_hf_bert_encoder(
    model_dir: str,
    pooling: str = "mean",
    normalize: bool = True,
    max_len: int = 256,
    compute_dtype: Any = None,
    embedding_config=None,
) -> JaxEncoderEmbedder:
    """Build a :class:`JaxEncoderEmbedder` from a local HF checkpoint."""
    import jax.numpy as jnp

    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    if hf_cfg.get("pad_token_id", 0) != 0:
        raise SerializationError("encoder requires pad_token_id == 0")
    config = EncoderConfig(
        vocab_size=hf_cfg["vocab_size"],
        hidden_dim=hf_cfg["hidden_size"],
        num_layers=hf_cfg["num_hidden_layers"],
        num_heads=hf_cfg["num_attention_heads"],
        mlp_dim=hf_cfg["intermediate_size"],
        max_len=min(max_len, hf_cfg.get("max_position_embeddings", max_len)),
        pooling=pooling,
        normalize=normalize,
        compute_dtype=compute_dtype if compute_dtype is not None else jnp.bfloat16,
    )
    params = {k: jnp.asarray(v) for k, v in convert_bert_state(_load_hf_state(model_dir), config.num_layers).items()}
    name = hf_cfg.get("_name_or_path") or os.path.basename(os.path.normpath(model_dir))
    emb = JaxEncoderEmbedder(
        config=config, params=params, model_name=name, embedding_config=embedding_config
    )
    vocab_path = os.path.join(model_dir, "vocab.txt")
    if os.path.exists(vocab_path):
        emb.tokenizer = WordPieceTokenizer.from_vocab_file(vocab_path, max_len=config.max_len)
    return emb
