"""BM25 scoring on device over a CSR postings store.

TPU-native recast of the reference's inverted-index search
(reference: index.rs:30-280). The reference unions posting lists into a
candidate set and then *linearly rescans* each posting list per
(candidate, term) pair — effectively O(cand·terms·postings)
(index.rs:127-133, 212-243). Here:

- The host owns the vocabulary and CSR layout (``indptr``); the device
  owns the numeric posting arrays (``rows``, ``tfs``), per-term ``idf``,
  per-doc lengths and ``avgdl``.
- A query is compiled host-side into flat **gather lists**: the posting
  positions its terms touch plus the term id per position, padded to a
  static bucket length. This keeps every device shape static while the
  work stays proportional to the real posting mass.
- The device gathers (row, tf, idf, doclen) per position, computes the
  Okapi BM25 contribution and scatter-adds into a dense score vector —
  one fused XLA program per query batch, then exact top-k.

Scoring math matches the reference exactly (index.rs:136-154):
``idf = ln((N - df + 0.5) / (df + 0.5) + 1)`` and
``tf_norm = tf * (k1 + 1) / (tf + k1 * (1 - b + b * len/avglen))``;
only candidates with score > 0 are returned (index.rs:231).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


# Postings per fetched segment. Isolated fetch throughput rises with
# segment size (2.1 GB/s at 256 -> 5.5 GB/s at 1024, per-slice overhead),
# but inside the full hybrid program 256 measured FASTER end-to-end than
# 512 (41.9k vs 36.9k QPS, same-session A/B) — XLA overlaps many small
# slices with the surrounding compute better than few large ones.
SEGMENT_LEN = 256


@functools.partial(jax.jit, static_argnames=("k", "k1", "b"))
def bm25_topk_segments(
    seg_starts: jax.Array,  # [B, S] int32 — posting offsets of contiguous runs
    seg_lens: jax.Array,  # [B, S] int32 — run lengths (<= SEGMENT_LEN)
    packed: jax.Array,  # [P + SEGMENT_LEN, 4] f32 — padded pre-joined postings
    avgdl: jax.Array,
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
) -> Tuple[jax.Array, jax.Array]:
    """Candidate BM25 with contiguous-segment fetch — the fast path.

    Element gathers are the TPU's weakest memory op (~28 ms for a
    256-query batch at L=2048; pre-joining into one gather still costs
    ~15 ms). But a query's postings are ≤S contiguous CSR runs, and a
    vmapped ``dynamic_slice`` streams those runs ~5x faster than any
    per-element gather. The host emits (start, len) pairs per run
    (long posting lists split into multiple SEGMENT_LEN runs); scoring
    then proceeds exactly like :func:`bm25_topk_candidates` on the
    flattened [S·SEGMENT_LEN] panel.
    """
    bsz, s = seg_starts.shape
    pm = SEGMENT_LEN
    L = s * pm

    def one_query(starts, lens):
        def fetch(st):
            return jax.lax.dynamic_slice(packed, (st, 0), (pm, 4))

        g = jax.vmap(fetch)(starts)  # [S, PM, 4]
        lane = jax.lax.broadcasted_iota(jnp.int32, (s, pm), 1)
        mask = (lane < lens[:, None]).reshape(L)
        g = g.reshape(L, 4)
        r = jax.lax.bitcast_convert_type(g[:, 0], jnp.int32)
        tf = g[:, 1]
        dl = g[:, 2]
        idf_t = g[:, 3]
        denom = tf + k1 * (1.0 - b + b * dl / jnp.maximum(avgdl, 1e-9))
        contrib = idf_t * tf * (k1 + 1.0) / jnp.maximum(denom, 1e-9)
        contrib = jnp.where(mask, contrib, 0.0)
        r_key = jnp.where(mask, r, jnp.iinfo(jnp.int32).max)
        r_sorted, c_sorted = jax.lax.sort((r_key, contrib), num_keys=1)
        csum = jnp.cumsum(c_sorted)
        nxt = jnp.concatenate([r_sorted[1:], jnp.full((1,), -1, r_sorted.dtype)])
        is_end = r_sorted != nxt
        run_max = jax.lax.associative_scan(jnp.maximum, jnp.where(is_end, csum, -jnp.inf))
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

    return jax.vmap(one_query)(seg_starts, seg_lens)


def pack_postings(rows, tfs, doc_len, idf, term_of_posting) -> "jnp.ndarray":
    """Host helper: pre-join per-posting (row, tf, doc_len[row],
    idf[term]) into the [P, 4] float32 record bm25_topk_segments expects."""
    import numpy as np

    rows = np.asarray(rows, dtype=np.int32)
    # SEGMENT_LEN rows of padding so segment slices never read OOB; the
    # padding's row bits decode to int32 max-sentinel with zero tf.
    packed = np.zeros((len(rows) + SEGMENT_LEN, 4), dtype=np.float32)
    packed[: len(rows), 0] = rows.view(np.float32)
    packed[: len(rows), 1] = np.asarray(tfs, dtype=np.float32)
    packed[: len(rows), 2] = np.asarray(doc_len, dtype=np.float32)[rows]
    packed[: len(rows), 3] = np.asarray(idf, dtype=np.float32)[
        np.asarray(term_of_posting, dtype=np.int64)
    ]
    return jnp.asarray(packed)


@functools.partial(jax.jit, static_argnames=("k", "k1", "b"))
def bm25_topk_candidates(
    positions: jax.Array,  # [B, L] int32 — indices into the postings arrays
    pos_terms: jax.Array,  # [B, L] int32 — term id per position
    pos_mask: jax.Array,  # [B, L] bool — False for padding slots
    rows: jax.Array,  # [P] int32 — chunk row per posting
    tfs: jax.Array,  # [P] float32 — term frequency per posting
    idf: jax.Array,  # [V] float32 — per-term idf
    doc_len: jax.Array,  # [N] float32 — token count per chunk row
    avgdl: jax.Array,  # scalar float32
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
) -> Tuple[jax.Array, jax.Array]:
    """Candidate-set BM25 top-k — corpus-size-independent.

    The scatter formulation (:func:`bm25_topk_scatter`) materializes a
    dense ``[B, N]`` score vector; its cost grows with the corpus even
    though only the union of the query terms' postings (≤ L rows) can
    score non-zero — exactly the candidate-union insight of the
    reference's own search (index.rs:212-243). This version stays in
    candidate space:

    1. gather (row, tf·idf-contribution) per posting position — [B, L];
    2. sort each query's postings by row (single-key int sort);
    3. segment-sum equal-row runs with a cumsum-difference (no scatter):
       ``seg_sum[i] = cumsum[i] - cumsum[prev_segment_end]`` at each
       run's last element;
    4. exact top-k over the ≤L candidate scores.

    O(L log L) per query regardless of N, and the sorted-row layout
    makes ``lax.top_k``'s tie preference yield (score desc, row asc)
    automatically. Scoring math identical to the scatter path.
    """
    L = positions.shape[1]

    def one_query(pos, terms, mask):
        r = rows[pos]
        tf = tfs[pos]
        dl = doc_len[r]
        idf_t = idf[terms]
        denom = tf + k1 * (1.0 - b + b * dl / jnp.maximum(avgdl, 1e-9))
        contrib = idf_t * tf * (k1 + 1.0) / jnp.maximum(denom, 1e-9)
        contrib = jnp.where(mask, contrib, 0.0)
        r_key = jnp.where(mask, r, jnp.iinfo(jnp.int32).max)  # padding last
        r_sorted, c_sorted = jax.lax.sort((r_key, contrib), num_keys=1)
        csum = jnp.cumsum(c_sorted)
        nxt = jnp.concatenate([r_sorted[1:], jnp.full((1,), -1, r_sorted.dtype)])
        is_end = r_sorted != nxt  # last element of each equal-row run
        # Base = csum at the previous run's end. contrib >= 0 makes csum
        # monotone, so the latest selected value IS the running max —
        # a pure cummax, avoiding a per-element gather (which costs ~10x
        # the rest of this function on TPU).
        run_max = jax.lax.associative_scan(jnp.maximum, jnp.where(is_end, csum, -jnp.inf))
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

    return jax.vmap(one_query)(positions, pos_terms, pos_mask)


@functools.partial(jax.jit, static_argnames=("k", "k1", "b", "n_rows"))
def bm25_topk_scatter(
    positions: jax.Array,  # [B, L] int32 — indices into the postings arrays
    pos_terms: jax.Array,  # [B, L] int32 — term id per position
    pos_mask: jax.Array,  # [B, L] bool — False for padding slots
    rows: jax.Array,  # [P] int32 — chunk row per posting
    tfs: jax.Array,  # [P] float32 — term frequency per posting
    idf: jax.Array,  # [V] float32 — per-term idf
    doc_len: jax.Array,  # [N] float32 — token count per chunk row
    avgdl: jax.Array,  # scalar float32
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
    n_rows: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Batched BM25 top-k. Returns ``(scores [B,k], rows [B,k])`` with
    (score desc, row asc) ordering; slots with score <= 0 are (-inf, -1),
    mirroring the reference's score>0 filter."""
    n = n_rows or doc_len.shape[0]

    def one_query(pos, terms, mask):
        r = rows[pos]  # [L]
        tf = tfs[pos]
        dl = doc_len[r]
        idf_t = idf[terms]
        denom = tf + k1 * (1.0 - b + b * dl / jnp.maximum(avgdl, 1e-9))
        contrib = idf_t * tf * (k1 + 1.0) / jnp.maximum(denom, 1e-9)
        contrib = jnp.where(mask, contrib, 0.0)
        # Padding positions point at posting 0; their contribution is 0.
        scores = jnp.zeros((n,), dtype=jnp.float32).at[r].add(contrib)
        return scores

    scores = jax.vmap(one_query)(positions, pos_terms, pos_mask)  # [B, N]
    masked = jnp.where(scores > 0.0, scores, NEG_INF)
    from trueno_rag_tpu.ops.dense import blockwise_topk

    top_scores, top_rows = blockwise_topk(masked, min(k, n))
    top_rows = jnp.where(jnp.isneginf(top_scores), -1, top_rows).astype(jnp.int32)
    if top_scores.shape[1] < k:  # corpus smaller than k: pad out
        pad = k - top_scores.shape[1]
        top_scores = jnp.pad(top_scores, ((0, 0), (0, pad)), constant_values=NEG_INF)
        top_rows = jnp.pad(top_rows, ((0, 0), (0, pad)), constant_values=-1)
    return top_scores, top_rows


def bucket_len(n: int, minimum: int = 64) -> int:
    """Round a gather-list length up to a power-of-two bucket so jit
    recompiles O(log L) times, not per query."""
    m = minimum
    while m < n:
        m *= 2
    return m
