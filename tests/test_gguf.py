"""GGUF interop (reference: embed.rs:690-723 consumption via
realizar::gguf; failure modes embed.rs:1661-1691). Tests build tiny
synthetic GGUF files — no external model artifacts needed."""

import struct

import numpy as np
import pytest

from trueno_rag_tpu.errors import IndexNotFoundError, SerializationError
from trueno_rag_tpu.models.gguf import (
    GGML_F16,
    GGML_Q4_0,
    GGML_Q4_1,
    GGML_Q8_0,
    load_nemotron_gguf,
    read_gguf,
    write_gguf,
)


def test_roundtrip_metadata_and_tensors(tmp_path):
    path = str(tmp_path / "t.gguf")
    rng = np.random.default_rng(0)
    tensors = {
        "a.weight": rng.standard_normal((4, 6)).astype(np.float32),
        "b.bias": rng.standard_normal((8,)).astype(np.float32),
    }
    meta = {"general.architecture": "llama", "llama.block_count": 2,
            "llama.rope.freq_base": 10000.0, "some.flag": True}
    write_gguf(path, meta, tensors)
    m2, t2 = read_gguf(path)
    assert m2["general.architecture"] == "llama"
    assert m2["llama.block_count"] == 2
    assert m2["some.flag"] is True
    for k, v in tensors.items():
        np.testing.assert_array_equal(t2[k], v)


def test_error_taxonomy(tmp_path):
    with pytest.raises(IndexNotFoundError):
        read_gguf(str(tmp_path / "missing.gguf"))
    bad = tmp_path / "bad.gguf"
    bad.write_bytes(b"not a valid gguf file")
    with pytest.raises(SerializationError):
        read_gguf(str(bad))
    trunc = tmp_path / "trunc.gguf"
    trunc.write_bytes(b"GGUF" + struct.pack("<I", 3))  # header cut short
    with pytest.raises(SerializationError):
        read_gguf(str(trunc))
    vers = tmp_path / "vers.gguf"
    vers.write_bytes(b"GGUF" + struct.pack("<IQQ", 99, 0, 0))
    with pytest.raises(SerializationError):
        read_gguf(str(vers))


def _manual_gguf(path, name, dims, ggml_type, blob):
    """Hand-roll a single-tensor GGUF (for non-F32 types the writer
    doesn't emit)."""
    out = bytearray()
    out += b"GGUF" + struct.pack("<IQQ", 3, 1, 0)
    nb = name.encode()
    out += struct.pack("<Q", len(nb)) + nb
    out += struct.pack("<I", len(dims))
    for d in dims:
        out += struct.pack("<Q", d)
    out += struct.pack("<IQ", ggml_type, 0)
    out += b"\x00" * ((-len(out)) % 32)
    out += blob
    with open(path, "wb") as f:
        f.write(bytes(out))


def test_f16_and_q8_0_dequant(tmp_path):
    vals = (np.arange(64, dtype=np.float32) - 31.5) / 7.0
    p16 = str(tmp_path / "f16.gguf")
    _manual_gguf(p16, "x", (64,), GGML_F16, vals.astype(np.float16).tobytes())
    _, t = read_gguf(p16)
    np.testing.assert_allclose(t["x"], vals, atol=2e-3)

    # Q8_0: two blocks of 32, scale = amax/127
    q8 = bytearray()
    for blk in vals.reshape(2, 32):
        scale = np.float16(np.abs(blk).max() / 127.0)
        q = np.clip(np.round(blk / np.float32(scale)), -127, 127).astype(np.int8)
        q8 += scale.tobytes() + q.tobytes()
    pq = str(tmp_path / "q8.gguf")
    _manual_gguf(pq, "x", (64,), GGML_Q8_0, bytes(q8))
    _, t = read_gguf(pq)
    np.testing.assert_allclose(t["x"], vals, atol=0.05)


def test_q4_dequant(tmp_path):
    vals = np.linspace(-2.0, 2.0, 32, dtype=np.float32)
    # Q4_0: scale = amax/7 (negated max convention simplified), q in [0,15]
    scale = np.float16(np.abs(vals).max() / 7.0)
    q = np.clip(np.round(vals / np.float32(scale)) + 8, 0, 15).astype(np.uint8)
    packed = (q[:16] | (q[16:] << 4)).astype(np.uint8)
    p = str(tmp_path / "q4.gguf")
    _manual_gguf(p, "x", (32,), GGML_Q4_0, scale.tobytes() + packed.tobytes())
    _, t = read_gguf(p)
    np.testing.assert_allclose(t["x"], vals, atol=float(scale) * 0.51 + 1e-6)

    # Q4_1: d = (max-min)/15, m = min, q in [0,15]
    d = np.float16((vals.max() - vals.min()) / 15.0)
    m = np.float16(vals.min())
    q = np.clip(np.round((vals - np.float32(m)) / np.float32(d)), 0, 15).astype(np.uint8)
    packed = (q[:16] | (q[16:] << 4)).astype(np.uint8)
    p1 = str(tmp_path / "q41.gguf")
    _manual_gguf(p1, "x", (32,), GGML_Q4_1,
                 d.tobytes() + m.tobytes() + packed.tobytes())
    _, t = read_gguf(p1)
    np.testing.assert_allclose(t["x"], vals, atol=float(d) * 0.51 + 2e-3)


def test_unsupported_ggml_type_is_loud(tmp_path):
    p = str(tmp_path / "q4k.gguf")
    _manual_gguf(p, "x", (256,), 12, b"\x00" * 1024)  # Q4_K
    with pytest.raises(SerializationError, match="Q4_K"):
        read_gguf(p)


def _tiny_llama_gguf(path, L=2, h=16, heads=4, m=32, vocab=64):
    rng = np.random.default_rng(1)
    tensors = {"token_embd.weight": rng.standard_normal((vocab, h)).astype(np.float32),
               "output_norm.weight": np.ones(h, np.float32)}
    for i in range(L):
        tensors[f"blk.{i}.attn_q.weight"] = rng.standard_normal((h, h)).astype(np.float32)
        tensors[f"blk.{i}.attn_k.weight"] = rng.standard_normal((h, h)).astype(np.float32)
        tensors[f"blk.{i}.attn_v.weight"] = rng.standard_normal((h, h)).astype(np.float32)
        tensors[f"blk.{i}.attn_output.weight"] = rng.standard_normal((h, h)).astype(np.float32)
        tensors[f"blk.{i}.attn_norm.weight"] = np.ones(h, np.float32)
        tensors[f"blk.{i}.ffn_gate.weight"] = rng.standard_normal((m, h)).astype(np.float32)
        tensors[f"blk.{i}.ffn_up.weight"] = rng.standard_normal((m, h)).astype(np.float32)
        tensors[f"blk.{i}.ffn_down.weight"] = rng.standard_normal((h, m)).astype(np.float32)
        tensors[f"blk.{i}.ffn_norm.weight"] = np.ones(h, np.float32)
    meta = {"general.architecture": "llama", "llama.block_count": L,
            "llama.embedding_length": h, "llama.feed_forward_length": m,
            "llama.attention.head_count": heads, "llama.context_length": 128,
            "llama.rope.freq_base": 10000.0}
    write_gguf(path, meta, tensors)
    return tensors


def test_nemotron_gguf_import_and_forward(tmp_path):
    path = str(tmp_path / "tiny.gguf")
    tensors = _tiny_llama_gguf(path)
    params, cfg = load_nemotron_gguf(path)
    assert cfg.num_layers == 2 and cfg.hidden_dim == 16 and cfg.mlp_dim == 32
    assert params["qkv_w"].shape == (2, 16, 48)
    # orientation: our [in, out] == llama [out, in] transposed
    np.testing.assert_allclose(
        np.asarray(params["qkv_w"])[0, :, :16],
        tensors["blk.0.attn_q.weight"].T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["mlp_down_w"])[1],
        tensors["blk.1.ffn_down.weight"].T, rtol=1e-6)

    from trueno_rag_tpu.models.nemotron import NemotronEmbedder

    emb = NemotronEmbedder.from_gguf(path)
    v = emb.embed_batch(["hello world", "gguf import"])
    assert v.shape == (2, 16)
    assert np.all(np.isfinite(v))
    # normalized output (config default)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-4)


def test_nemotron_gguf_missing_tensor(tmp_path):
    path = str(tmp_path / "partial.gguf")
    write_gguf(path, {"general.architecture": "llama", "llama.block_count": 1},
               {"token_embd.weight": np.zeros((8, 4), np.float32)})
    with pytest.raises(SerializationError, match="missing tensor"):
        load_nemotron_gguf(path)
