"""Device-resident k-quant weights: dequantize-on-the-fly in XLA.

The host loader (:mod:`trueno_rag_tpu.models.gguf`) decodes GGUF
k-quant tensors to f32 in numpy — correct for importing, but an 8B
NV-Embed-class model dequantized to bf16 is ~15.9 GB and cannot share
one v5e chip with 8k-context activations. This module keeps the RAW
k-quant super-block bytes in HBM (Q4_K ≈ 0.56 B/param, Q6_K ≈ 0.82 —
~4.4-6.5 GB for the full 32-layer stack, the reference's serving
artifact format, embed.rs:690-723) and unpacks each layer's weights
inside the jitted forward, so only ONE layer's bf16 weights (~0.5 GB)
ever exist at a time. The unpack is pure integer bit-twiddling + two
broadcast multiplies — VPU work that overlaps the previous layer's
MXU matmuls under XLA's scheduler.

Bit layouts mirror ggml's dequantize_row_q{4,6}_K exactly (llama.cpp
ggml-quants.c), and are pinned against the host decoder's scalar-loop
oracle in tests/test_gguf.py (q4k/q6k device parity tests).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

QK_K = 256  # k-quant super-block length
Q4K_BLOCK_BYTES = 144
Q6K_BLOCK_BYTES = 210


def _f16_from_bytes(lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Two uint8 planes (little-endian) -> f32 via an f16 bitcast."""
    u = lo.astype(jnp.uint16) | (hi.astype(jnp.uint16) << 8)
    return jax.lax.bitcast_convert_type(u, jnp.float16).astype(jnp.float32)


def _kscale_min_device(scales: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Device port of gguf._kscale_min: the packed 12-byte 6-bit
    (scale, min) header of Q4_K/Q5_K -> (sc [nb, 8], mn [nb, 8])."""
    sc = jnp.concatenate(
        [
            scales[:, :4] & 63,
            (scales[:, 8:12] & 0x0F) | ((scales[:, 0:4] >> 6) << 4),
        ],
        axis=1,
    )
    mn = jnp.concatenate(
        [
            scales[:, 4:8] & 63,
            (scales[:, 8:12] >> 4) | ((scales[:, 4:8] >> 6) << 4),
        ],
        axis=1,
    )
    return sc, mn


def q4k_dequant(raw: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Q4_K super-blocks ``[nb, 144] uint8`` -> values ``[nb, 256]``.

    Layout per block: d f16, dmin f16, 12B packed 6-bit scales/mins
    (8 sub-blocks of 32), 128B of 4-bit quants. value = d*sc*q -
    dmin*mn, with the low/high nibble split ggml uses (groups of 64:
    32 low nibbles then 32 high nibbles share one (sc, mn) pair each).
    """
    nb = raw.shape[0]
    d = _f16_from_bytes(raw[:, 0], raw[:, 1])[:, None]
    dmin = _f16_from_bytes(raw[:, 2], raw[:, 3])[:, None]
    sc, mn = _kscale_min_device(raw[:, 4:16])
    sc = sc.astype(jnp.float32)
    mn = mn.astype(jnp.float32)
    qs = raw[:, 16:144]
    groups = []
    for j in range(4):  # static 64-element groups — unrolled in the jaxpr
        q = qs[:, 32 * j : 32 * j + 32]
        lo = (q & 0x0F).astype(jnp.float32)
        hi = (q >> 4).astype(jnp.float32)
        groups.append(d * sc[:, 2 * j : 2 * j + 1] * lo
                      - dmin * mn[:, 2 * j : 2 * j + 1])
        groups.append(d * sc[:, 2 * j + 1 : 2 * j + 2] * hi
                      - dmin * mn[:, 2 * j + 1 : 2 * j + 2])
    return jnp.concatenate(groups, axis=1).astype(dtype).reshape(nb, QK_K)


def q6k_dequant(raw: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Q6_K super-blocks ``[nb, 210] uint8`` -> values ``[nb, 256]``.

    Layout: 128B low-4 bits, 64B high-2 bits, 16 int8 sub-scales,
    d f16. value = d * sc[i//16] * (q - 32)."""
    nb = raw.shape[0]
    ql = raw[:, :128]
    qh = raw[:, 128:192]
    sc = jax.lax.bitcast_convert_type(raw[:, 192:208], jnp.int8).astype(jnp.float32)
    d = _f16_from_bytes(raw[:, 208], raw[:, 209])[:, None]
    halves = []
    for h in (0, 1):
        ql_h = ql[:, 64 * h : 64 * h + 64]
        qh_h = qh[:, 32 * h : 32 * h + 32]
        sc_h = sc[:, 8 * h : 8 * h + 8]
        ql_lo, ql_hi = ql_h & 0x0F, ql_h >> 4
        q = jnp.concatenate(
            [
                ql_lo[:, :32] | (((qh_h >> 0) & 3) << 4),
                ql_lo[:, 32:] | (((qh_h >> 2) & 3) << 4),
                ql_hi[:, :32] | (((qh_h >> 4) & 3) << 4),
                ql_hi[:, 32:] | (((qh_h >> 6) & 3) << 4),
            ],
            axis=1,
        ).astype(jnp.float32) - 32.0
        halves.append(jnp.repeat(sc_h, 16, axis=1) * q)
    return (d * jnp.concatenate(halves, axis=1)).astype(dtype).reshape(nb, QK_K)


_DEQUANT = {"q4_k": q4k_dequant, "q6_k": q6k_dequant}
_BLOCK_BYTES = {"q4_k": Q4K_BLOCK_BYTES, "q6_k": Q6K_BLOCK_BYTES}


def dequant_matrix(raw: jax.Array, shape: Tuple[int, int], kind: str,
                   dtype=jnp.bfloat16) -> jax.Array:
    """Raw blocks ``[nb, block_bytes]`` -> a weight matrix ``shape``
    (row-major over the flat dequantized stream, the GGUF tensor
    order)."""
    return _DEQUANT[kind](raw, dtype).reshape(shape)


# ---------------------------------------------------------------------------
# Quantized Nemotron forward (layer-streamed)
# ---------------------------------------------------------------------------

# llama.cpp's Q4_K_M recipe: everything Q4_K except the MLP down
# projection, which gets Q6_K (it is the quantization-sensitive matmul)
WEIGHT_KINDS = {
    "qkv_w": "q4_k",
    "attn_out_w": "q4_k",
    "mlp_gate_w": "q4_k",
    "mlp_up_w": "q4_k",
    "mlp_down_w": "q6_k",
}


def quantize_kquant_host(values: np.ndarray, kind: str) -> np.ndarray:
    """Host-side ENCODER producing valid k-quant blocks from f32 values
    (flat length divisible by 256) — the test/bench path to real block
    bytes without a GGUF artifact in the image. Simple per-sub-block
    affine fit (not ggml's iterative search — bit-layout compatible,
    just a slightly worse RMSE), decodable by both this module and the
    host decoder."""
    flat = np.asarray(values, np.float32).reshape(-1)
    if flat.size % QK_K:
        raise ValueError("length must be a multiple of 256")
    nb = flat.size // QK_K
    blocks = flat.reshape(nb, QK_K)
    if kind == "q6_k":
        out = np.zeros((nb, Q6K_BLOCK_BYTES), np.uint8)
        sub = blocks.reshape(nb, 16, 16)
        amax = np.abs(sub).max(axis=2)  # [nb, 16]
        d = amax.max(axis=1) / (32.0 * 127.0)  # headroom for int8 scales
        d = np.where(d > 0, d, 1.0).astype(np.float16).astype(np.float32)
        sc = np.clip(np.round(amax / (32.0 * d[:, None])), -128, 127)
        scale = d[:, None, None] * sc[:, :, None]
        q = np.clip(np.round(sub / np.where(scale != 0, scale, 1.0)) + 32,
                    0, 63).astype(np.uint8)
        q = q.reshape(nb, QK_K)
        for h in (0, 1):
            qh128 = q[:, 128 * h : 128 * h + 128]
            lo = qh128 & 0x0F
            hi2 = qh128 >> 4  # 2 high bits
            out[:, 64 * h : 64 * h + 32] = lo[:, :32] | (lo[:, 64:96] << 4)
            out[:, 64 * h + 32 : 64 * h + 64] = lo[:, 32:64] | (lo[:, 96:128] << 4)
            out[:, 128 + 32 * h : 128 + 32 * h + 32] = (
                hi2[:, :32] | (hi2[:, 32:64] << 2)
                | (hi2[:, 64:96] << 4) | (hi2[:, 96:128] << 6)
            )
        out[:, 192:208] = sc.astype(np.int8).view(np.uint8)
        out[:, 208:210] = d.astype(np.float16)[:, None].view(np.uint8)
        return out
    if kind != "q4_k":
        raise ValueError(f"unsupported kind {kind!r}")
    out = np.zeros((nb, Q4K_BLOCK_BYTES), np.uint8)
    sub = blocks.reshape(nb, 8, 32)
    vmax = sub.max(axis=2)
    vmin = np.minimum(sub.min(axis=2), 0.0)
    d = np.maximum(vmax - vmin, 1e-12).max(axis=1) / (63.0 * 15.0)
    d = d.astype(np.float16).astype(np.float32)
    dmin = (-vmin).max(axis=1) / 63.0
    dmin = dmin.astype(np.float16).astype(np.float32)
    sc = np.clip(np.round((vmax - vmin) / (15.0 * d[:, None])), 0, 63)
    mn = np.clip(np.round(-vmin / np.where(dmin > 0, dmin, 1.0)[:, None]), 0, 63)
    scale = d[:, None, None] * sc[:, :, None]
    q = np.clip(
        np.round((sub + dmin[:, None, None] * mn[:, :, None])
                 / np.where(scale != 0, scale, 1.0)),
        0, 15,
    ).astype(np.uint8)  # [nb, 8, 32]
    # pack the ggml nibble order: group j holds sub-blocks 2j (low
    # nibbles) and 2j+1 (high nibbles)
    for j in range(4):
        out[:, 16 + 32 * j : 16 + 32 * j + 32] = (
            q[:, 2 * j] | (q[:, 2 * j + 1] << 4)
        )
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:4] = dmin.astype(np.float16)[:, None].view(np.uint8)
    packed = np.zeros((nb, 12), np.uint8)
    sc8 = sc.astype(np.uint8)
    mn8 = mn.astype(np.uint8)
    packed[:, 0:4] = (sc8[:, :4] & 63) | ((sc8[:, 4:] >> 4) << 6)
    packed[:, 4:8] = (mn8[:, :4] & 63) | ((mn8[:, 4:] >> 4) << 6)
    packed[:, 8:12] = (sc8[:, 4:] & 0x0F) | ((mn8[:, 4:] & 0x0F) << 4)
    out[:, 4:16] = packed
    return out


def quantize_nemotron_params(params: Dict[str, np.ndarray]) -> Dict[str, object]:
    """f32 stacked Nemotron params -> the layer-streamed quantized form:
    per-weight raw block stacks ``[L, nb, block_bytes] uint8`` (Q4_K_M
    kinds), with norms/embedding kept in bf16/f32 (llama.cpp keeps
    them unquantized too)."""
    out: Dict[str, object] = {
        "tok_emb": jnp.asarray(np.asarray(params["tok_emb"], np.float32),
                               jnp.bfloat16),
        "final_rms_scale": jnp.asarray(params["final_rms_scale"],
                                       jnp.float32),
        "rms1_scale": jnp.asarray(params["rms1_scale"], jnp.float32),
        "rms2_scale": jnp.asarray(params["rms2_scale"], jnp.float32),
        "shapes": {},
    }
    for name, kind in WEIGHT_KINDS.items():
        w = np.asarray(params[name], np.float32)  # [L, in, out]
        L = w.shape[0]
        out["shapes"][name] = (tuple(w.shape[1:]), kind)
        blocks = np.stack(
            [quantize_kquant_host(w[i], kind) for i in range(L)]
        )
        out[name] = jnp.asarray(blocks)
    return out


@partial(jax.jit, static_argnames=("config", "shapes"))
def _quant_forward(qparams, token_ids, config, shapes):
    from trueno_rag_tpu.models.nemotron import PAD_ID, _decoder_block, _rms_norm

    mask = token_ids != PAD_ID
    x = qparams["tok_emb"][token_ids].astype(config.compute_dtype)
    scan_over = {name: qparams[name] for name, _ in shapes}
    scan_over["rms1_scale"] = qparams["rms1_scale"]
    scan_over["rms2_scale"] = qparams["rms2_scale"]
    shape_of = dict(shapes)

    def body(carry, lp):
        dq = {
            name: dequant_matrix(lp[name], shp, kind,
                                 dtype=config.compute_dtype)
            for name, (shp, kind) in shape_of.items()
        }
        dq["rms1_scale"] = lp["rms1_scale"]
        dq["rms2_scale"] = lp["rms2_scale"]
        return _decoder_block(carry, mask, dq, config), None

    x, _ = jax.lax.scan(body, x, scan_over)
    last = jnp.maximum(jnp.sum(mask, axis=1) - 1, 0)
    pooled = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0, :]
    pooled = _rms_norm(pooled, qparams["final_rms_scale"]).astype(jnp.float32)
    if config.normalize:
        n = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
        pooled = pooled / jnp.where(n == 0.0, 1.0, n)
    return pooled


def nemotron_forward_quantized(qparams: Dict[str, object],
                               token_ids: jax.Array, config) -> jax.Array:
    """Layer-streamed quantized forward: identical math to
    :func:`trueno_rag_tpu.models.nemotron.nemotron_forward` except each
    layer's weights unpack from their k-quant blocks inside the scan —
    peak weight HBM = quantized stack + ONE layer's bf16 matrices.
    """
    shapes = tuple(sorted(qparams["shapes"].items()))
    arrays = {k: v for k, v in qparams.items() if k != "shapes"}
    return _quant_forward(arrays, token_ids, config, shapes)
