"""Memory-efficient attention Pallas kernel for long-context encoders.

The naive attention in the decoder materializes ``[B, H, T, T]`` logits —
at the Nemotron config's 8192-token context that is hundreds of GB and
simply cannot run. This kernel processes one query block at a time
(grid over (batch·heads, query blocks)), keeping only a ``[bq, T]``
logits panel in VMEM, so activation memory is O(T) per step and the full
8k context fits comfortably (K/V panels for one head at 8192×128 bf16
are 2 MB each).

Shapes: ``q/k/v [BH, T, hd]`` (heads folded into the leading dim), a
``[BH, T]`` key-validity mask, optional causality. MXU matmuls run in
the input dtype with fp32 logits/softmax accumulation — numerically the
same recipe as the reference jnp attention, which tests pin it to.

This covers the SURVEY long-context requirement (§5): standard JAX
attention for short contexts, this kernel for the 8k-token
Nemotron-class path.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale: float, causal: bool, bq: int):
    q = q_ref[0]  # [bq, hd]
    k = k_ref[0]  # [T, hd]
    v = v_ref[0]  # [T, hd]
    # Mosaic needs mask blocks >= (8, T); fetch 8 rows, select ours.
    kmask = mask_ref[pl.program_id(0) % 8]  # [T] bool
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, T]
    t = logits.shape[1]
    keep = kmask[None, :]
    if causal:
        qi = pl.program_id(1)
        qpos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, t), 0)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (bq, t), 1)
        keep = keep & (kpos <= qpos)
    logits = jnp.where(keep, logits, jnp.asarray(-1e9, logits.dtype))
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out_ref[0] = jnp.dot(probs, v, preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "interpret"))
def block_attention(
    q: jax.Array,  # [BH, T, hd]
    k: jax.Array,  # [BH, T, hd]
    v: jax.Array,  # [BH, T, hd]
    key_mask: jax.Array,  # [BH, T] bool — False for padding keys
    causal: bool = True,
    block_q: int = 128,
    interpret: bool = False,
) -> jax.Array:
    bh, t, hd = q.shape
    bq = min(block_q, t)
    assert t % bq == 0, "sequence length must divide the query block"
    scale = float(1.0 / np.sqrt(hd))
    grid = (bh, t // bq)
    # pad mask rows to a multiple of 8 (Mosaic min sublane tile)
    bh8 = -(-bh // 8) * 8
    if bh8 != bh:
        key_mask = jnp.pad(key_mask, ((0, bh8 - bh), (0, 0)))
    kernel = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, causal=causal, bq=bq),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, t, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, t, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((8, t), lambda b, i: (b // 8, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, t, hd), q.dtype),
        interpret=interpret,
    )
    return kernel(q, k, v, key_mask)


def attention_oracle(q, k, v, key_mask, causal=True):
    """jnp reference (materializes [BH, T, T]); the parity oracle."""
    bh, t, hd = q.shape
    logits = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / np.sqrt(hd).astype(np.float32)
    keep = key_mask[:, None, :]
    if causal:
        keep = keep & jnp.tril(jnp.ones((t, t), bool))[None, :, :]
    logits = jnp.where(keep, logits, jnp.asarray(-1e9, logits.dtype))
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bqk,bkd->bqd", probs, v, preferred_element_type=jnp.float32).astype(q.dtype)
