"""A/B: BM25 segment fetch via vmapped dynamic_slice (ops.bm25) vs the
Pallas scalar-prefetch DMA kernel (ops.pallas.bm25_fetch).

Run on the attached TPU:
    PYTHONPATH=.:$PYTHONPATH python benches/bm25_dma_bench.py [--n 100000]

Both paths get the SAME term selection per query; the DMA path's slots
are SEGMENT_LEN-aligned blocks with (lo, hi) masks, the segment path's
are term-aligned (start, len) runs. Timing follows CLAUDE.md: chained
lax.scan, carry-dependent inputs, scalar materialization.
"""

from __future__ import annotations

import argparse

import numpy as np


def make_aligned_and_segment_slots(snap, batch, terms_per_query, seed=1):
    from trueno_rag_tpu.ops.bm25 import SEGMENT_LEN

    rng = np.random.default_rng(seed)
    indptr = snap["indptr"]
    vocab = len(indptr) - 1
    sentinel_start = int(indptr[-1])
    sentinel_block = sentinel_start // SEGMENT_LEN
    per_q_seg, per_q_blk = [], []
    max_seg = max_blk = 1
    for _ in range(batch):
        segs, blks = [], []
        for t in rng.choice(vocab, size=terms_per_query, replace=False):
            lo, hi = int(indptr[t]), int(indptr[t + 1])
            hi = min(hi, lo + 512)
            for s in range(lo, hi, SEGMENT_LEN):
                segs.append((s, min(SEGMENT_LEN, hi - s)))
            if hi > lo:
                for blk in range(lo // SEGMENT_LEN, (hi - 1) // SEGMENT_LEN + 1):
                    base = blk * SEGMENT_LEN
                    blks.append((blk, max(lo - base, 0), min(hi - base, SEGMENT_LEN)))
        per_q_seg.append(segs)
        per_q_blk.append(blks)
        max_seg, max_blk = max(max_seg, len(segs)), max(max_blk, len(blks))
    S = max(2, max_seg)
    starts = np.full((batch, S), sentinel_start, dtype=np.int32)
    lens = np.zeros((batch, S), dtype=np.int32)
    for i, segs in enumerate(per_q_seg):
        for j, (s, ln) in enumerate(segs):
            starts[i, j] = s
            lens[i, j] = ln
    import math

    SB = max(2, max_blk)
    bsz_pad = -(-batch // (8 // math.gcd(SB, 8))) * (8 // math.gcd(SB, 8))
    block_ids = np.full(bsz_pad * SB, sentinel_block, dtype=np.int32)
    lo_a = np.zeros(bsz_pad * SB, dtype=np.int32)
    hi_a = np.zeros(bsz_pad * SB, dtype=np.int32)
    for i, blks in enumerate(per_q_blk):
        for j, (blk, l, h) in enumerate(blks):
            block_ids[i * SB + j] = blk
            lo_a[i * SB + j] = l
            hi_a[i * SB + j] = h
    return starts, lens, block_ids, lo_a, hi_a, SB


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--terms", type=int, default=6)
    p.add_argument("--cand", type=int, default=50)
    p.add_argument("--wide", action="store_true")
    args = p.parse_args()
    WIDE = args.wide

    import jax
    import jax.numpy as jnp

    from bench import build_synthetic_bm25
    from benches.device_profile import chain_timed
    from trueno_rag_tpu.ops.bm25 import SEGMENT_LEN, bm25_topk_segments, pack_postings
    from trueno_rag_tpu.ops.pallas.bm25_fetch import bm25_topk_dma

    snap = build_synthetic_bm25(args.n, vocab=50_000, avg_len=64)
    term_of = np.repeat(np.arange(len(snap["indptr"]) - 1), np.diff(snap["indptr"]))
    packed_np = np.asarray(
        pack_postings(
            np.asarray(snap["rows"]), np.asarray(snap["tfs"]),
            np.asarray(snap["doc_len"]), np.asarray(snap["idf"]), term_of,
        )
    )
    # DMA path wants every indexed block fully in bounds; pad to a
    # SEGMENT_LEN multiple (cheap, host-side, once per snapshot).
    pad = (-len(packed_np)) % SEGMENT_LEN
    packed = jnp.asarray(np.pad(packed_np, ((0, pad), (0, 0))))
    starts, lens, block_ids, lo, hi, SB = make_aligned_and_segment_slots(
        snap, args.batch, args.terms
    )
    starts, lens = jnp.asarray(starts), jnp.asarray(lens)
    block_ids, lo, hi = jnp.asarray(block_ids), jnp.asarray(lo), jnp.asarray(hi)
    avgdl = float(snap["avgdl"])
    cand = args.cand

    dev = jax.devices()[0].platform
    print(f"device: {dev} | N={args.n:,} B={args.batch} terms={args.terms} "
          f"S_seg={starts.shape[1]} S_blk={SB}")

    # parity first (rows must match exactly)
    s_seg, r_seg = jax.block_until_ready(
        bm25_topk_segments(starts, lens, packed, jnp.asarray(np.float32(avgdl)), k=cand)
    )
    s_dma, r_dma = jax.block_until_ready(
        bm25_topk_dma(block_ids, lo, hi, packed, avgdl, k=cand, s_slots=SB, wide=WIDE)
    )
    rows_equal = bool(np.array_equal(np.asarray(r_dma)[: args.batch], np.asarray(r_seg)))
    max_ds = float(
        np.max(
            np.abs(
                np.where(np.isneginf(np.asarray(s_dma)[: args.batch]), 0, np.asarray(s_dma)[: args.batch])
                - np.where(np.isneginf(np.asarray(s_seg)), 0, np.asarray(s_seg))
            )
        )
    )
    print(f"parity: rows_equal={rows_equal} max|Δscore|={max_ds:.2e}")

    floor = chain_timed(lambda c: c * 1.000001 + 1e-12)
    print(f"scan-step floor : {floor*1e3:8.3f} ms")

    def seg_body(c):
        shift = (c > 1e30).astype(jnp.int32)
        s, _ = bm25_topk_segments(starts + shift, lens, packed,
                                  jnp.asarray(np.float32(avgdl)), k=cand)
        return jnp.max(s) * 1e-12 + c * 1e-30

    t_seg = chain_timed(seg_body)
    print(f"segments path   : {t_seg*1e3:8.3f} ms  ({args.batch/t_seg:,.0f} q/s)")

    def dma_body(c):
        shift = (c > 1e30).astype(jnp.int32)
        s, _ = bm25_topk_dma(block_ids + shift, lo, hi, packed, avgdl, k=cand, s_slots=SB, wide=WIDE)
        return jnp.max(s) * 1e-12 + c * 1e-30

    t_dma = chain_timed(dma_body)
    print(f"dma kernel path : {t_dma*1e3:8.3f} ms  ({args.batch/t_dma:,.0f} q/s)")
    print(f"speedup         : {t_seg/t_dma:6.2f}x")


if __name__ == "__main__":
    main()
