"""Pallas DMA kernel for BM25 segment fetch + contribution math.

The XLA segment path (`ops.bm25.bm25_topk_segments`) fetches posting
runs with vmapped ``dynamic_slice`` at ~2-5 GB/s effective — far below
HBM bandwidth, dominated by per-slice dispatch. This kernel lets
Mosaic's pipeline stream the segments instead: segment ids arrive as
scalar-prefetch arrays, the input BlockSpec's index_map reads them to
choose which ``[SEGMENT_LEN, 4]`` slab of the packed postings to DMA
next, and the kernel computes the masked BM25 contribution for the slab
while the next slab is in flight.

Constraints shaping the design:
- BlockSpec index units are BLOCK counts, so segments must be
  SEGMENT_LEN-aligned: the host emits aligned block ids plus (lo, hi)
  within-block valid ranges (a run may start/end mid-block; neighbors'
  postings inside the block are masked off).
- Mosaic requires >=(8, 128)-ish output tiles, so the grid walks 8
  consecutive (query, slot) pairs per output block (out block index =
  i // 8, the kernel writes row i % 8).

The sort + segment-sum + top-k stages remain in XLA (they measured
cheap); only the fetch+math moves into the kernel.

Exactness note: rows/ordering match ``bm25_topk_segments`` exactly, but
scores can differ by ~1e-4 in fp32 — aligned blocks sum contributions in
a different associativity order than term-aligned segments.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from trueno_rag_tpu.ops.bm25 import NEG_INF, SEGMENT_LEN


def _fetch_kernel(block_ids, lo, hi, packed_ref, out_rows_ref, out_contrib_ref,
                  *, k1: float, b: float, avgdl: float):
    i = pl.program_id(0)
    g = packed_ref[...]  # [SEGMENT_LEN, 4] — DMA'd slab chosen by index_map
    r_bits = g[:, 0]
    tf = g[:, 1]
    dl = g[:, 2]
    idf_t = g[:, 3]
    lane = jax.lax.broadcasted_iota(jnp.int32, (SEGMENT_LEN, 1), 0).squeeze(-1)
    valid = (lane >= lo[i]) & (lane < hi[i])
    denom = tf + k1 * (1.0 - b + b * dl / max(avgdl, 1e-9))
    contrib = idf_t * tf * (k1 + 1.0) / jnp.maximum(denom, 1e-9)
    r = jax.lax.bitcast_convert_type(r_bits, jnp.int32)
    intmax = jnp.iinfo(jnp.int32).max
    out_rows_ref[i % 8] = jnp.where(valid, r, intmax)
    out_contrib_ref[i % 8] = jnp.where(valid, contrib, 0.0)


@functools.partial(jax.jit, static_argnames=("avgdl", "k1", "b", "interpret"))
def fetch_contribs(
    block_ids: jax.Array,  # [B*S] int32 — SEGMENT_LEN-aligned block index per slot
    lo: jax.Array,  # [B*S] int32 — first valid lane within the block
    hi: jax.Array,  # [B*S] int32 — one past the last valid lane
    packed: jax.Array,  # [P_pad, 4] f32 — every indexed block must be in bounds
    avgdl: float,  # static: fixed per index snapshot (recompile on rebuild)
    k1: float = 1.2,
    b: float = 0.75,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """→ (rows [BS, SEGMENT_LEN] int32 with INTMAX invalid,
         contribs [BS, SEGMENT_LEN] f32 with 0 invalid)."""
    bs = block_ids.shape[0]
    assert bs % 8 == 0, "caller pads (B*S) to a multiple of 8"
    from jax.experimental.pallas import tpu as pltpu

    # Index maps are invoked with (*program_ids, *scalar_prefetch_refs).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # block_ids, lo, hi
        grid=(bs,),
        in_specs=[
            pl.BlockSpec((SEGMENT_LEN, 4), lambda i, bids, lo, hi: (bids[i], 0)),
        ],
        out_specs=[
            pl.BlockSpec((8, SEGMENT_LEN), lambda i, bids, lo, hi: (i // 8, 0)),
            pl.BlockSpec((8, SEGMENT_LEN), lambda i, bids, lo, hi: (i // 8, 0)),
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(_fetch_kernel, k1=k1, b=b, avgdl=avgdl),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bs, SEGMENT_LEN), jnp.int32),
            jax.ShapeDtypeStruct((bs, SEGMENT_LEN), jnp.float32),
        ],
        interpret=interpret,
    )
    return kernel(block_ids, lo, hi, packed)


def _fetch_kernel8(block_ids, lo, hi, *refs, k1: float, b: float, avgdl: float):
    """8 slabs per grid step: refs = 8 input slab refs + 2 output refs.
    Step i handles flat slots [8i, 8i+8); slab j writes output row j."""
    i = pl.program_id(0)
    out_rows_ref, out_contrib_ref = refs[8], refs[9]
    lane = jax.lax.broadcasted_iota(jnp.int32, (SEGMENT_LEN, 1), 0).squeeze(-1)
    intmax = jnp.iinfo(jnp.int32).max
    for j in range(8):
        g = refs[j][...]
        tf = g[:, 1]
        dl = g[:, 2]
        idf_t = g[:, 3]
        valid = (lane >= lo[i * 8 + j]) & (lane < hi[i * 8 + j])
        denom = tf + k1 * (1.0 - b + b * dl / max(avgdl, 1e-9))
        contrib = idf_t * tf * (k1 + 1.0) / jnp.maximum(denom, 1e-9)
        r = jax.lax.bitcast_convert_type(g[:, 0], jnp.int32)
        out_rows_ref[j] = jnp.where(valid, r, intmax)
        out_contrib_ref[j] = jnp.where(valid, contrib, 0.0)


@functools.partial(jax.jit, static_argnames=("avgdl", "k1", "b", "interpret"))
def fetch_contribs8(
    block_ids: jax.Array,
    lo: jax.Array,
    hi: jax.Array,
    packed: jax.Array,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """8-slabs-per-step variant of :func:`fetch_contribs` — fewer grid
    steps, 8 DMAs in flight per step."""
    bs = block_ids.shape[0]
    assert bs % 8 == 0
    from jax.experimental.pallas import tpu as pltpu

    def slab_spec(j):
        return pl.BlockSpec(
            (SEGMENT_LEN, 4), lambda i, bids, lo, hi, j=j: (bids[i * 8 + j], 0)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bs // 8,),
        in_specs=[slab_spec(j) for j in range(8)],
        out_specs=[
            pl.BlockSpec((8, SEGMENT_LEN), lambda i, bids, lo, hi: (i, 0)),
            pl.BlockSpec((8, SEGMENT_LEN), lambda i, bids, lo, hi: (i, 0)),
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(_fetch_kernel8, k1=k1, b=b, avgdl=avgdl),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bs, SEGMENT_LEN), jnp.int32),
            jax.ShapeDtypeStruct((bs, SEGMENT_LEN), jnp.float32),
        ],
        interpret=interpret,
    )
    return kernel(block_ids, lo, hi, *([packed] * 8))


@functools.partial(jax.jit, static_argnames=("avgdl", "k", "s_slots", "k1", "b", "interpret", "wide"))
def bm25_topk_dma(
    block_ids: jax.Array,  # [B*S] int32 (aligned block per slot, padded)
    lo: jax.Array,  # [B*S]
    hi: jax.Array,  # [B*S]
    packed: jax.Array,
    avgdl,
    k: int,
    s_slots: int,
    k1: float = 1.2,
    b: float = 0.75,
    interpret: bool = False,
    wide: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Full BM25 top-k with the DMA fetch kernel feeding the XLA
    sort/segment-sum/top-k tail. Same output contract as
    :func:`trueno_rag_tpu.ops.bm25.bm25_topk_segments`."""
    fetch = fetch_contribs8 if wide else fetch_contribs
    rows_f, contribs_f = fetch(
        block_ids, lo, hi, packed, avgdl, k1=k1, b=b, interpret=interpret
    )
    bsz = block_ids.shape[0] // s_slots
    L = s_slots * SEGMENT_LEN
    rows = rows_f.reshape(bsz, L)
    contribs = contribs_f.reshape(bsz, L)

    def one_query(r_slot, c_slot):
        r_sorted, c_sorted = jax.lax.sort((r_slot, c_slot), num_keys=1)
        csum = jnp.cumsum(c_sorted)
        nxt = jnp.concatenate([r_sorted[1:], jnp.full((1,), -1, r_sorted.dtype)])
        is_end = r_sorted != nxt
        # cummax, not associative_scan: the 219-s-vs-6-s compile fix
        # (see ops/bm25._candidate_topk)
        run_max = jax.lax.cummax(jnp.where(is_end, csum, -jnp.inf))
        prev_csum = jnp.concatenate([jnp.full((1,), -jnp.inf, csum.dtype), run_max[:-1]])
        base = jnp.where(jnp.isneginf(prev_csum), 0.0, prev_csum)
        seg_sum = csum - base
        valid = is_end & (r_sorted != jnp.iinfo(jnp.int32).max) & (seg_sum > 0.0)
        scores_c = jnp.where(valid, seg_sum, NEG_INF)
        k_eff = min(k, L)
        top_s, top_i = jax.lax.top_k(scores_c, k_eff)
        top_r = jnp.where(jnp.isneginf(top_s), -1, r_sorted[top_i]).astype(jnp.int32)
        if k_eff < k:
            top_s = jnp.pad(top_s, (0, k - k_eff), constant_values=NEG_INF)
            top_r = jnp.pad(top_r, (0, k - k_eff), constant_values=-1)
        return top_s, top_r

    return jax.vmap(one_query)(rows, contribs)


def gather_aligned_segments(indptr, terms, vocab, tokenize_fn, queries, packed_len):
    """Host: compile queries into SEGMENT_LEN-aligned (block, lo, hi)
    slots. ``packed_len`` = number of real postings (the padding block
    after them is the sentinel target)."""
    sentinel_block = packed_len // SEGMENT_LEN  # the all-padding block
    per_query = []
    max_slots = 1
    for q in queries:
        slots = []
        for term in tokenize_fn(q):
            tid = vocab.get(term)
            if tid is None:
                continue
            t_lo, t_hi = int(indptr[tid]), int(indptr[tid + 1])
            blk0 = t_lo // SEGMENT_LEN
            blk1 = (t_hi - 1) // SEGMENT_LEN if t_hi > t_lo else blk0 - 1
            for blk in range(blk0, blk1 + 1):
                base = blk * SEGMENT_LEN
                slots.append(
                    (blk, max(t_lo - base, 0), min(t_hi - base, SEGMENT_LEN))
                )
        per_query.append(slots)
        max_slots = max(max_slots, len(slots))
    s_slots = max(2, max_slots)
    # The kernel walks 8 (query, slot) pairs per output block, so the
    # flat slot count must be a multiple of 8 — pad whole queries (not
    # trailing slots) to keep the [B, S] reshape aligned.
    import math

    bsz = len(queries)
    bsz_pad = -(-bsz // (8 // math.gcd(s_slots, 8))) * (8 // math.gcd(s_slots, 8))
    total = bsz_pad * s_slots
    block_ids = np.full(total, sentinel_block, dtype=np.int32)
    lo = np.zeros(total, dtype=np.int32)
    hi = np.zeros(total, dtype=np.int32)
    for qi, slots in enumerate(per_query):
        for si, (blk, l, h) in enumerate(slots[:s_slots]):
            j = qi * s_slots + si
            block_ids[j] = blk
            lo[j] = l
            hi[j] = h
    return block_ids, lo, hi, s_slots, bsz_pad
