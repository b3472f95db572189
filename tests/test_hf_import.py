"""HF BERT import faithfulness: construct a RANDOM-weight BertModel with
transformers (no network), export it, and assert our JAX encoder
reproduces its hidden states / pooled embeddings numerically."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from trueno_rag_tpu.models.hf_import import convert_bert_state, load_hf_bert_encoder
from trueno_rag_tpu.models.tokenization import WordPieceTokenizer, basic_tokenize

TINY_CFG = dict(
    vocab_size=200,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
    pad_token_id=0,
    type_vocab_size=2,
)

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
    "the", "fox", "jump", "##s", "##ing", "over", "dog", "lazy", "quick",
    "retrieval", "tpu", "matrix", "a", "b", "c", ".", ",",
]


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_tiny_bert")
    torch.manual_seed(0)
    cfg = transformers.BertConfig(**TINY_CFG)
    model = transformers.BertModel(cfg)
    model.eval()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    from safetensors.numpy import save_file

    save_file(state, str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump(TINY_CFG, f)
    with open(d / "vocab.txt", "w") as f:
        f.write("\n".join(VOCAB))
    return str(d), model


def test_forward_matches_transformers(hf_dir):
    import jax.numpy as jnp

    model_dir, torch_model = hf_dir
    emb = load_hf_bert_encoder(
        model_dir, pooling="mean", normalize=False, compute_dtype=jnp.float32
    )

    ids = np.array(
        [[2, 5, 6, 8, 3, 0, 0, 0], [2, 9, 10, 11, 14, 15, 16, 3]], dtype=np.int32
    )
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        out = torch_model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()
    # mean-pool with the same mask
    m = mask[..., None].astype(np.float32)
    expected = (out * m).sum(1) / m.sum(1)

    from trueno_rag_tpu.models.encoder import encoder_forward

    got = np.asarray(encoder_forward(emb.params, jnp.asarray(ids), emb.encoder_config))
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=2e-4)


def test_embedder_end_to_end(hf_dir):
    model_dir, _ = hf_dir
    emb = load_hf_bert_encoder(model_dir)
    assert isinstance(emb.tokenizer, WordPieceTokenizer)
    v = emb.embed("the quick fox jumps")
    assert v.shape == (32,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4
    # deterministic + distinct
    np.testing.assert_allclose(emb.embed("the fox"), emb.embed("the fox"))
    assert not np.allclose(emb.embed("the fox"), emb.embed("tpu matrix"))


def test_convert_rejects_missing_weight():
    from trueno_rag_tpu.errors import SerializationError

    with pytest.raises(SerializationError):
        convert_bert_state({"embeddings.word_embeddings.weight": np.zeros((4, 4))}, 1)


# ------------------------------------------------------------ wordpiece ----


def test_basic_tokenize():
    assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    assert basic_tokenize("  spaced   out  ") == ["spaced", "out"]


def test_wordpiece_continuations():
    vocab = {t: i for i, t in enumerate(VOCAB)}
    tok = WordPieceTokenizer(vocab, max_len=16)
    ids = tok.encode("the fox jumps")
    # jumps -> jump + ##s
    assert ids == [2, vocab["the"], vocab["fox"], vocab["jump"], vocab["##s"], 3]
    # unknown word -> [UNK]
    ids = tok.encode("zzzq")
    assert ids == [2, 1, 3]


def test_wordpiece_batch_padding():
    vocab = {t: i for i, t in enumerate(VOCAB)}
    tok = WordPieceTokenizer(vocab, max_len=32)
    batch = tok.encode_batch(["the fox", "the quick lazy dog jumping over the fox"])
    assert batch.shape[0] == 2
    assert batch[0, 0] == 2  # CLS
    assert (batch[0] == 0).any()  # padded


def test_cross_encoder_import_matches_transformers(hf_dir, tmp_path):
    """Random-weight BertForSequenceClassification (1 label) exported and
    imported: our scores must be sigmoid(HF logits)."""
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from trueno_rag_tpu.models.hf_import import load_hf_cross_encoder

    torch.manual_seed(1)
    cfg = transformers.BertConfig(**TINY_CFG, num_labels=1)
    model = transformers.BertForSequenceClassification(cfg)
    model.eval()
    d = tmp_path / "ce"
    d.mkdir()
    save_file({k: v.numpy() for k, v in model.state_dict().items()}, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(TINY_CFG))
    (d / "vocab.txt").write_text("\n".join(VOCAB))

    rr = load_hf_cross_encoder(str(d), compute_dtype=jnp.float32)
    ids = np.array([[2, 5, 6, 3, 8, 3, 0, 0], [2, 9, 10, 3, 11, 14, 15, 3]], dtype=np.int32)
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        logits = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask),
        ).logits.numpy()[:, 0]
    expected = 1.0 / (1.0 + np.exp(-logits))

    from trueno_rag_tpu.models.cross_encoder import cross_encoder_scores

    got = np.asarray(cross_encoder_scores(rr.params, jnp.asarray(ids), rr.config))
    np.testing.assert_allclose(got, expected, atol=3e-4, rtol=3e-4)

    # end-to-end rerank through the imported model
    out = rr.score_batch("the fox", ["the fox jumps", "tpu matrix"])
    assert out.shape == (2,) and np.isfinite(out).all()


# ---------------------------------------------------------------------------
# rotary (RoFormer / Nomic-class) import
# ---------------------------------------------------------------------------

ROFORMER_CFG = dict(
    model_type="roformer",
    vocab_size=200,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
    pad_token_id=0,
    type_vocab_size=2,
    embedding_size=32,
    rotary_value=False,
)


@pytest.fixture(scope="module")
def roformer_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_tiny_roformer")
    torch.manual_seed(1)
    cfg = transformers.RoFormerConfig(**{
        k: v for k, v in ROFORMER_CFG.items() if k != "model_type"
    })
    model = transformers.RoFormerModel(cfg)
    model.eval()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    from safetensors.numpy import save_file

    save_file(state, str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump(ROFORMER_CFG, f)
    with open(d / "vocab.txt", "w") as f:
        f.write("\n".join(VOCAB))
    return str(d), model


def test_rotary_forward_matches_transformers_roformer(roformer_dir):
    """The rotary attention path (position='rotary',
    rope_interleaved=True) must reproduce a random-weight
    RoFormerModel's hidden states — the numerical pin for the RoPE
    math (pairing, frequencies, masking), exactly like the BERT test
    pins the learned-position path."""
    import jax.numpy as jnp

    from trueno_rag_tpu.models.encoder import encoder_forward
    from trueno_rag_tpu.models.hf_import import load_hf_rotary_encoder

    model_dir, torch_model = roformer_dir
    emb = load_hf_rotary_encoder(
        model_dir, pooling="mean", normalize=False, compute_dtype=jnp.float32
    )
    assert emb.encoder_config.position == "rotary"
    assert emb.encoder_config.rope_interleaved is True
    assert "pos_emb" not in emb.params

    ids = np.array(
        [[2, 5, 6, 8, 3, 0, 0, 0], [2, 9, 10, 11, 14, 15, 16, 3]], dtype=np.int32
    )
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        out = torch_model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()
    m = mask[..., None].astype(np.float32)
    expected = (out * m).sum(1) / m.sum(1)
    got = np.asarray(encoder_forward(emb.params, jnp.asarray(ids), emb.encoder_config))
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=2e-4)


def test_nomic_state_conversion_and_forward(tmp_path):
    """Synthetic nomic_bert checkpoint (Wqkv / fc11+fc12 SwiGLU naming,
    biasless MLP like the real nomic-bert-2048) loads, forwards, and
    maps fc12->gate (activated) / fc11->up (linear) — flash-attn's
    GatedMlp chunk order, which nomic's modeling file derives from and
    which torch.nn.functional.glu pins externally (F.glu activates the
    SECOND half; nomic's sigmoid path routes through F.glu and the
    other activations reuse the same (y, gate) chunk order)."""
    import jax.numpy as jnp

    from trueno_rag_tpu.models.encoder import encoder_forward
    from trueno_rag_tpu.models.hf_import import load_hf_rotary_encoder

    rng = np.random.default_rng(0)
    h, L, m, v = 32, 2, 48, 128
    state = {"embeddings.word_embeddings.weight": rng.standard_normal((v, h)),
             "embeddings.token_type_embeddings.weight": rng.standard_normal((2, h)),
             "emb_ln.weight": np.ones(h), "emb_ln.bias": np.zeros(h)}
    for i in range(L):
        state[f"encoder.layers.{i}.attn.Wqkv.weight"] = rng.standard_normal((3 * h, h))
        state[f"encoder.layers.{i}.attn.Wqkv.bias"] = rng.standard_normal(3 * h)
        state[f"encoder.layers.{i}.attn.out_proj.weight"] = rng.standard_normal((h, h))
        state[f"encoder.layers.{i}.attn.out_proj.bias"] = rng.standard_normal(h)
        state[f"encoder.layers.{i}.norm1.weight"] = np.ones(h)
        state[f"encoder.layers.{i}.norm1.bias"] = np.zeros(h)
        state[f"encoder.layers.{i}.norm2.weight"] = np.ones(h)
        state[f"encoder.layers.{i}.norm2.bias"] = np.zeros(h)
        state[f"encoder.layers.{i}.mlp.fc11.weight"] = rng.standard_normal((m, h))
        state[f"encoder.layers.{i}.mlp.fc12.weight"] = rng.standard_normal((m, h))
        state[f"encoder.layers.{i}.mlp.fc2.weight"] = rng.standard_normal((h, m))
    state = {k: np.asarray(val, np.float32) * 0.05 for k, val in state.items()}
    from safetensors.numpy import save_file

    d = tmp_path / "nomic"
    d.mkdir()
    save_file(state, str(d / "model.safetensors"))
    cfg = dict(model_type="nomic_bert", vocab_size=v, hidden_size=h,
               num_hidden_layers=L, num_attention_heads=4,
               intermediate_size=m, max_position_embeddings=64,
               pad_token_id=0, rotary_emb_base=1000.0)
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    emb = load_hf_rotary_encoder(str(d), compute_dtype=jnp.float32)
    ec = emb.encoder_config
    assert (ec.position, ec.mlp, ec.rope_interleaved) == ("rotary", "swiglu", False)
    assert ec.rope_base == 1000.0
    assert emb.params["mlp_w1"].shape == (L, h, 2 * m)
    ids = jnp.asarray([[2, 5, 6, 3, 0, 0]], jnp.int32)
    out = encoder_forward(emb.params, ids, ec)
    assert out.shape == (1, h) and bool(np.isfinite(np.asarray(out)).all())

    # oracle: hand-computed SwiGLU on layer 0 must match the packed
    # mlp_w1 split order — encoder._block computes silu(gate) * up on
    # the [gate | up] halves, so gate must be fc12 and up fc11
    x = np.asarray(rng.standard_normal(h), np.float32)
    pre = x @ np.asarray(emb.params["mlp_w1"][0])
    gate, up = pre[: m], pre[m:]
    fc11 = np.asarray(state["encoder.layers.0.mlp.fc11.weight"])
    fc12 = np.asarray(state["encoder.layers.0.mlp.fc12.weight"])
    np.testing.assert_allclose(gate, x @ fc12.T, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(up, x @ fc11.T, rtol=1e-5, atol=1e-5)

    # external pin for the chunk order (no egress to fetch a real
    # checkpoint): torch.nn.functional.glu activates the SECOND half —
    # glu(cat[y, g]) == y * sigmoid(g) — and flash-attn's GatedMlp
    # (nomic's base) uses that same order for every activation:
    # y, gate = fc1(x).chunk(2); y * act(gate), with fc11 = first
    # chunk. Our import must therefore compute fc11(x) * silu(fc12(x)).
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    xt = torch.from_numpy(x)
    y_lin = xt @ torch.from_numpy(fc11).T
    g_act = xt @ torch.from_numpy(fc12).T
    torch.testing.assert_close(
        F.glu(torch.cat([y_lin, g_act]), dim=-1),
        y_lin * torch.sigmoid(g_act),
    )
    import jax

    ours = np.asarray(jax.nn.silu(jnp.asarray(gate)) * jnp.asarray(up))
    want = (y_lin * F.silu(g_act)).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-5)


def test_nomic_preset_shape():
    from trueno_rag_tpu.models.encoder import EncoderConfig

    cfg = EncoderConfig.nomic()
    assert (cfg.hidden_dim, cfg.num_layers, cfg.mlp, cfg.position) == (
        768, 12, "swiglu", "rotary")
