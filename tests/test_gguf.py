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
    p = str(tmp_path / "q3k.gguf")
    _manual_gguf(p, "x", (256,), 11, b"\x00" * 1024)  # Q3_K (unimplemented)
    with pytest.raises(SerializationError, match="Q3_K"):
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


# ---------------------------------------------------------------------------
# k-quant super-block formats (Q4_K / Q5_K / Q6_K / Q8_K)
# ---------------------------------------------------------------------------

def _scale_min_k4_scalar(j, q):
    """ggml get_scale_min_k4, transcribed (the test oracle)."""
    if j < 4:
        return int(q[j]) & 63, int(q[j + 4]) & 63
    return ((int(q[j + 4]) & 0x0F) | ((int(q[j - 4]) >> 6) << 4),
            (int(q[j + 4]) >> 4) | ((int(q[j]) >> 6) << 4))


def _dequant_kquant_scalar(rec, ggml_type):
    """Scalar transcription of ggml's dequantize_row_q{4,5,6,8}_K for
    ONE super-block of raw bytes — the independent oracle the
    vectorized package decoder is pinned against."""
    y = np.zeros(256, np.float64)
    if ggml_type == 15:  # Q8_K
        d = rec[:4].view(np.float32)[0]
        q = rec[4:260].view(np.int8)
        return d * q.astype(np.float64)
    if ggml_type == 14:  # Q6_K
        ql, qh = rec[:128], rec[128:192]
        sc = rec[192:208].view(np.int8)
        d = float(rec[208:210].view(np.float16)[0])
        yo = 0
        qlo, qho, sco = 0, 0, 0
        for _ in range(2):  # n = 0, 128
            for l in range(32):
                is_ = l // 16
                q1 = ((int(ql[qlo + l]) & 0xF) | (((int(qh[qho + l]) >> 0) & 3) << 4)) - 32
                q2 = ((int(ql[qlo + l + 32]) & 0xF) | (((int(qh[qho + l]) >> 2) & 3) << 4)) - 32
                q3 = ((int(ql[qlo + l]) >> 4) | (((int(qh[qho + l]) >> 4) & 3) << 4)) - 32
                q4 = ((int(ql[qlo + l + 32]) >> 4) | (((int(qh[qho + l]) >> 6) & 3) << 4)) - 32
                y[yo + l] = d * int(sc[sco + is_]) * q1
                y[yo + l + 32] = d * int(sc[sco + is_ + 2]) * q2
                y[yo + l + 64] = d * int(sc[sco + is_ + 4]) * q3
                y[yo + l + 96] = d * int(sc[sco + is_ + 6]) * q4
            yo += 128
            qlo += 64
            qho += 32
            sco += 8
        return y
    d = float(rec[0:2].view(np.float16)[0])
    dmin = float(rec[2:4].view(np.float16)[0])
    scales = rec[4:16]
    if ggml_type == 12:  # Q4_K
        qs = rec[16:144]
        yo, qo = 0, 0
        for j in range(4):
            sc1, m1 = _scale_min_k4_scalar(2 * j, scales)
            sc2, m2 = _scale_min_k4_scalar(2 * j + 1, scales)
            for l in range(32):
                y[yo + l] = d * sc1 * (int(qs[qo + l]) & 0xF) - dmin * m1
                y[yo + 32 + l] = d * sc2 * (int(qs[qo + l]) >> 4) - dmin * m2
            yo += 64
            qo += 32
        return y
    # Q5_K
    qh, qs = rec[16:48], rec[48:176]
    yo, qo = 0, 0
    u1, u2 = 1, 2
    for j in range(4):
        sc1, m1 = _scale_min_k4_scalar(2 * j, scales)
        sc2, m2 = _scale_min_k4_scalar(2 * j + 1, scales)
        for l in range(32):
            y[yo + l] = d * sc1 * ((int(qs[qo + l]) & 0xF) + (16 if int(qh[l]) & u1 else 0)) - dmin * m1
            y[yo + 32 + l] = d * sc2 * ((int(qs[qo + l]) >> 4) + (16 if int(qh[l]) & u2 else 0)) - dmin * m2
        yo += 64
        qo += 32
        u1 <<= 2
        u2 <<= 2
    return y


@pytest.mark.parametrize("ggml_type,block_bytes", [
    (12, 144), (13, 176), (14, 210), (15, 292),
], ids=["Q4_K", "Q5_K", "Q6_K", "Q8_K"])
def test_kquant_dequant_matches_scalar_oracle(tmp_path, ggml_type, block_bytes):
    """Random raw super-blocks decoded by the package's vectorized path
    must match the scalar ggml-reference transcription bit-for-bit
    (both compute in f32-representable values)."""
    rng = np.random.default_rng(ggml_type)
    nb = 3
    raw = rng.integers(0, 256, size=nb * block_bytes, dtype=np.uint8)
    if ggml_type == 15:  # keep Q8_K's f32 scale finite and sane
        for b in range(nb):
            raw[b * 292 : b * 292 + 4] = np.frombuffer(
                np.float32(0.01 * (b + 1)).tobytes(), np.uint8)
    else:  # keep the f16 scales finite (avoid inf/nan bit patterns)
        for b in range(nb):
            off = b * block_bytes + (208 if ggml_type == 14 else 0)
            raw[off : off + 2] = np.frombuffer(
                np.float16(0.02 * (b + 1)).tobytes(), np.uint8)
            if ggml_type in (12, 13):
                raw[b * block_bytes + 2 : b * block_bytes + 4] = np.frombuffer(
                    np.float16(0.003 * (b + 1)).tobytes(), np.uint8)
    p = str(tmp_path / "k.gguf")
    _manual_gguf(p, "x", (nb * 256,), ggml_type, raw.tobytes())
    _, t = read_gguf(p)
    got = t["x"]
    want = np.concatenate([
        _dequant_kquant_scalar(raw[b * block_bytes : (b + 1) * block_bytes],
                               ggml_type)
        for b in range(nb)
    ])
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=0, atol=0)


def test_kquant_nemotron_load(tmp_path):
    """A Q6_K token-embedding tensor flows through load_nemotron_gguf
    like any float tensor (dequantized on read)."""
    from trueno_rag_tpu.models.gguf import _tensor_nbytes

    assert _tensor_nbytes(14, 512) == 2 * 210
    assert _tensor_nbytes(12, 256) == 144
    assert _tensor_nbytes(13, 256) == 176
    assert _tensor_nbytes(15, 256) == 292


# -- device-side k-quant dequant (r5: layer-streamed quantized serving) ------


@pytest.mark.parametrize("kind,ggml_type", [("q4_k", 12), ("q6_k", 14)])
def test_device_kquant_dequant_matches_host_decoder(kind, ggml_type):
    """gguf_device's XLA bit-unpack must decode the SAME bytes to the
    same values as the host decoder (the scalar-oracle-pinned numpy
    path) — the invariant that makes on-chip dequant trustworthy."""
    import numpy as np

    from trueno_rag_tpu.models import gguf, gguf_device

    rng = np.random.default_rng(3)
    values = rng.standard_normal(8 * 256).astype(np.float32)
    raw = gguf_device.quantize_kquant_host(values, kind)
    host = gguf._dequantize_kquant(raw.reshape(-1), ggml_type, values.size)
    import jax.numpy as jnp

    dev = gguf_device._DEQUANT[kind](jnp.asarray(raw), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(dev).reshape(-1), host, rtol=1e-6, atol=1e-7
    )


@pytest.mark.parametrize("kind", ["q4_k", "q6_k"])
def test_kquant_host_encoder_roundtrip_error_bounded(kind):
    """The bench/test encoder must produce blocks whose decode is close
    to the original values (simple affine fit: looser than ggml's
    search, but the quantization error must still be small relative to
    the value scale)."""
    import numpy as np

    from trueno_rag_tpu.models import gguf, gguf_device

    rng = np.random.default_rng(11)
    values = (rng.standard_normal(4 * 256) * 0.05).astype(np.float32)
    raw = gguf_device.quantize_kquant_host(values, kind)
    ggml_type = 12 if kind == "q4_k" else 14
    back = gguf._dequantize_kquant(raw.reshape(-1), ggml_type, values.size)
    scale = np.abs(values).max()
    tol = scale * (0.12 if kind == "q4_k" else 0.04)
    assert np.abs(back - values).max() <= tol


def test_quantized_nemotron_forward_matches_dequantized_weights():
    """nemotron_forward_quantized (dequant inside the layer scan) must
    equal nemotron_forward run on the host-dequantized copies of the
    SAME quantized blocks — the layer streaming changes memory layout,
    not math."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from trueno_rag_tpu.models import gguf, gguf_device
    from trueno_rag_tpu.models.nemotron import (
        NemotronConfig,
        init_nemotron_params,
        nemotron_forward,
    )

    cfg = NemotronConfig.tiny()
    params = init_nemotron_params(jax.random.PRNGKey(0), cfg)
    params = {k: np.asarray(v) for k, v in params.items()}
    qp = gguf_device.quantize_nemotron_params(params)
    # host-dequantize the same blocks back into stacked f32 params
    deq = dict(params)
    for name, (shape, kind) in qp["shapes"].items():
        ggml_type = 12 if kind == "q4_k" else 14
        L = np.asarray(qp[name]).shape[0]
        deq[name] = np.stack([
            gguf._dequantize_kquant(
                np.asarray(qp[name][i]).reshape(-1), ggml_type,
                int(np.prod(shape)),
            ).reshape(shape).astype(np.float32)
            for i in range(L)
        ])
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 3, cfg.vocab_size)
    want = np.asarray(nemotron_forward(
        {k: jnp.asarray(v) for k, v in deq.items()}, ids, cfg))
    got = np.asarray(gguf_device.nemotron_forward_quantized(qp, ids, cfg))
    # identical weights; bf16 compute — differences only from the
    # dequant arithmetic running in-graph vs on host
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
    cos = (got * want).sum(axis=1)
    assert (cos > 0.999).all()
