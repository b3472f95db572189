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

Precision note: the candidate tail sums equal-row runs as an f32
cumsum DIFFERENCE across the whole candidate panel, so a row's score
carries rounding proportional to the panel's cumulative contribution
mass (~mass·2⁻²³), not just its own few terms — near-ties inside that
envelope can order differently from the per-row host oracle on very
heavy panels (the parity tests use rel=1e-4 accordingly; exact ties
are already unordered in the reference, index.rs:231-243).
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

# Postings per block in the block-gather layout (the default fast path).
BLOCK_LEN = 256
# Row ids ride the block tables as f32 VALUES; exact only below 2**24.
MAX_BLOCK_ROWS = 1 << 24


def _candidate_topk(r_key: jax.Array, contrib: jax.Array, k: int):
    """Shared tail for candidate-space BM25: one query's (row-key,
    contribution) pairs → exact (scores [k], rows [k]) with the
    (score desc, row asc) contract. r_key uses int32-max for invalid
    slots; contrib is 0 there. Sort by row, segment-sum equal-row runs
    via cumsum difference (contrib >= 0 ⇒ running max of selected
    cumsums IS the previous run's end — no gather), score>0 filter."""
    L = r_key.shape[0]
    r_sorted, c_sorted = jax.lax.sort((r_key, contrib), num_keys=1)
    csum = jnp.cumsum(c_sorted)
    nxt = jnp.concatenate([r_sorted[1:], jnp.full((1,), -1, r_sorted.dtype)])
    is_end = r_sorted != nxt
    # lax.cummax, NOT associative_scan(maximum): they compute the same
    # inclusive running max, but XLA's fusion search explodes when an
    # associative_scan sits downstream of sort+cumsum in one program —
    # measured 219 s vs 6 s COMPILE at [256, 8192] on v5e (r5; this was
    # the "~20-minute staged warmup": one such compile per (B, S)
    # bucket). Same runtime (27.6 vs 28.0 ms), bit-identical outputs.
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


def pack_posting_blocks(
    rows, tfs, doc_len, idf, term_of_posting, avgdl, k1: float = 1.2, b: float = 0.75
) -> "jnp.ndarray":
    """Host: pack postings into the [NB, 2, BLOCK_LEN] block table the
    block-gather fast path fetches — lane 0 = row id as an f32 VALUE
    (exact below 2**24 rows), lane 1 = the FULL precomputed Okapi BM25
    contribution idf·tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl)).

    Precomputing the contribution at pack time (vs fetching tf/dl/idf
    and computing on device) is valid because k1/b/avgdl are fixed per
    snapshot; it halves the per-posting record to 8 bytes. All math in
    float32 to bit-match the device computation it replaces.
    """
    import numpy as np

    rows = np.asarray(rows, dtype=np.int32)
    p = len(rows)
    if p and int(rows.max()) >= MAX_BLOCK_ROWS:
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(
            "row ids exceed f32-exact range; use the segment path"
        )
    tfs32 = np.asarray(tfs, dtype=np.float32)
    dl32 = np.asarray(doc_len, dtype=np.float32)[rows]
    idf32 = np.asarray(idf, dtype=np.float32)[np.asarray(term_of_posting, dtype=np.int64)]
    k1f, bf = np.float32(k1), np.float32(b)
    av = np.maximum(np.float32(avgdl), np.float32(1e-9))
    denom = tfs32 + k1f * (np.float32(1.0) - bf + bf * dl32 / av)
    contrib = idf32 * tfs32 * (k1f + np.float32(1.0)) / np.maximum(denom, np.float32(1e-9))
    # The block after the last posting is the sentinel target for padded
    # slots (always masked, so its contents never matter). Write the two
    # lanes straight into the table (np.stack of flat intermediates cost
    # ~0.5 s at 3M postings on a 1-core box — two avoidable full copies).
    nb = p // BLOCK_LEN + 1
    table = np.zeros((nb, 2, BLOCK_LEN), dtype=np.float32)
    fb, rem = divmod(p, BLOCK_LEN)
    if fb:
        table[:fb, 0, :] = rows[: fb * BLOCK_LEN].astype(np.float32).reshape(fb, BLOCK_LEN)
        table[:fb, 1, :] = contrib[: fb * BLOCK_LEN].reshape(fb, BLOCK_LEN)
    if rem:
        table[fb, 0, :rem] = rows[fb * BLOCK_LEN:].astype(np.float32)
        table[fb, 1, :rem] = contrib[fb * BLOCK_LEN:]
    return jnp.asarray(table)


@functools.partial(jax.jit, static_argnames=("k",))
def bm25_topk_blocks(
    block_ids: jax.Array,  # [B, S] int32 — block index per slot
    lo: jax.Array,  # [B, S] int32 — first valid lane within the block
    hi: jax.Array,  # [B, S] int32 — one past the last valid lane
    blocks: jax.Array,  # [NB, 2, BLOCK_LEN] f32 — see pack_posting_blocks
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Block-gather BM25 top-k — the fast path.

    The segment path's vmapped ``dynamic_slice`` stream is latency-bound
    on slab count (~0.2 ms per slab column at B=256 regardless of
    bytes); a single wide row-gather (``jnp.take`` of [2·BLOCK_LEN]-wide
    rows) moves the same postings at ~400 GB/s (measured v5e: 0.02 ms vs
    1.5 ms for 9 MB). Blocks are BLOCK_LEN-aligned, so a query term's
    run may start/end mid-block — (lo, hi) mask off neighbors' postings.
    Scoring math lives in the precomputed contributions; the tail is the
    shared sort + segment-sum + top-k.
    """
    bsz, s = block_ids.shape
    bl = blocks.shape[-1]
    L = s * bl
    g = jnp.take(blocks, block_ids.reshape(-1), axis=0)  # [B*S, 2, BL]
    g = g.reshape(bsz, s, 2, bl)
    lane = jax.lax.broadcasted_iota(jnp.int32, (bsz, s, bl), 2)
    mask = (lane >= lo[:, :, None]) & (lane < hi[:, :, None])
    r = g[:, :, 0, :].astype(jnp.int32)  # f32 row VALUES — exact < 2**24
    contrib = jnp.where(mask, g[:, :, 1, :], 0.0).reshape(bsz, L)
    r_key = jnp.where(mask, r, jnp.iinfo(jnp.int32).max).reshape(bsz, L)
    return jax.vmap(functools.partial(_candidate_topk, k=k))(r_key, contrib)


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
        return _candidate_topk(r_key, contrib, k)

    return jax.vmap(one_query)(seg_starts, seg_lens)


def pack_weighted_blocks(rows, weights) -> "jnp.ndarray":
    """Host: pack LEARNED-SPARSE postings into the same [NB, 2,
    BLOCK_LEN] block-table layout as :func:`pack_posting_blocks` —
    lane 0 = row id as an f32 VALUE (exact below 2**24 rows), lane 1 =
    the document-side term weight. Unlike BM25 the query side carries a
    weight too, so the full contribution ``q_w · d_w`` is completed on
    device by :func:`weighted_topk_blocks` (the query weight is a
    per-slot scalar — it cannot be baked in at pack time).

    The reference has no learned-sparse retrieval at all (its only
    sparse path is BM25, index.rs:30-280); this layout exists because
    the wide row-gather (~400 GB/s measured, pack_posting_blocks' note)
    is the fastest posting fetch on this hardware and it is score-
    model-agnostic: anything of the form Σ_t f(t)·g(t, d) rides it.
    """
    import numpy as np

    rows = np.asarray(rows, dtype=np.int32)
    p = len(rows)
    if p and int(rows.max()) >= MAX_BLOCK_ROWS:
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(
            "row ids exceed f32-exact range; shard the index instead"
        )
    w32 = np.asarray(weights, dtype=np.float32)
    nb = p // BLOCK_LEN + 1  # trailing block = always-masked sentinel
    table = np.zeros((nb, 2, BLOCK_LEN), dtype=np.float32)
    fb, rem = divmod(p, BLOCK_LEN)
    if fb:
        table[:fb, 0, :] = rows[: fb * BLOCK_LEN].astype(np.float32).reshape(fb, BLOCK_LEN)
        table[:fb, 1, :] = w32[: fb * BLOCK_LEN].reshape(fb, BLOCK_LEN)
    if rem:
        table[fb, 0, :rem] = rows[fb * BLOCK_LEN:].astype(np.float32)
        table[fb, 1, :rem] = w32[fb * BLOCK_LEN:]
    return jnp.asarray(table)


@functools.partial(jax.jit, static_argnames=("k",))
def weighted_topk_blocks(
    block_ids: jax.Array,  # [B, S] int32 — block index per slot
    lo: jax.Array,  # [B, S] int32 — first valid lane within the block
    hi: jax.Array,  # [B, S] int32 — one past the last valid lane
    q_w: jax.Array,  # [B, S] f32 — query-side weight per slot
    blocks: jax.Array,  # [NB, 2, BLOCK_LEN] f32 — pack_weighted_blocks
    k: int,
    allowed: jax.Array = None,  # optional [N] or [B, N] bool row filter
) -> Tuple[jax.Array, jax.Array]:
    """Weighted block-gather sparse top-k →
    ``(scores [B,k], rows [B,k])`` — the learned-sparse (SPLADE-class)
    scoring op: ``score(q, d) = Σ_t q_w[t] · d_w[d, t]`` over the
    query's expanded terms.

    Identical fetch plan to :func:`bm25_topk_blocks` (one wide
    ``jnp.take`` of [2·BLOCK_LEN]-wide rows); the only new math is the
    per-slot query-weight multiply. A slot whose term spans multiple
    blocks repeats its weight on every slot. ``allowed`` (e.g. a
    resolved tag filter joined with tombstones) zeroes excluded rows'
    contributions, so the score>0 filter in the shared tail drops them
    — an exact FILTERED top-k, not a post-filter. Ordering contract as
    everywhere: (score desc, row asc), ``-1``/``-inf`` invalid slots;
    only scores > 0 are returned (a document sharing no expansion term
    with the query is not a hit, matching BM25's score>0 semantics).
    """
    bsz, s = block_ids.shape
    bl = blocks.shape[-1]
    L = s * bl
    g = jnp.take(blocks, block_ids.reshape(-1), axis=0)  # [B*S, 2, BL]
    g = g.reshape(bsz, s, 2, bl)
    lane = jax.lax.broadcasted_iota(jnp.int32, (bsz, s, bl), 2)
    mask = (lane >= lo[:, :, None]) & (lane < hi[:, :, None])
    r = g[:, :, 0, :].astype(jnp.int32)  # f32 row VALUES — exact < 2**24
    contrib = jnp.where(mask, g[:, :, 1, :] * q_w[:, :, None], 0.0)
    if allowed is not None:
        safe = jnp.maximum(r, 0)
        if allowed.ndim == 1:  # one filter for the whole batch
            ok = jnp.take(allowed, safe.reshape(-1)).reshape(r.shape)
        else:  # per-query filters [B, N]
            ok = jnp.take_along_axis(
                allowed, safe.reshape(bsz, L), axis=1
            ).reshape(r.shape)
        contrib = jnp.where(ok, contrib, 0.0)
    contrib = contrib.reshape(bsz, L)
    r_key = jnp.where(mask, r, jnp.iinfo(jnp.int32).max).reshape(bsz, L)
    return jax.vmap(functools.partial(_candidate_topk, k=k))(r_key, contrib)


def pack_postings(rows, tfs, doc_len, idf, term_of_posting) -> "jnp.ndarray":
    """Host helper: pre-join per-posting (row, tf, doc_len[row],
    idf[term]) into the [P, 4] float32 record bm25_topk_segments expects."""
    import numpy as np

    rows = np.asarray(rows, dtype=np.int32)
    # SEGMENT_LEN rows of padding so segment slices never read OOB. The
    # padding's row bits are WRITTEN as the int32 max-sentinel (zeros
    # would bitcast to real row 0) — seg_lens always mask padding lanes
    # today, but the sentinel makes the invariant true rather than
    # merely documented.
    packed = np.zeros((len(rows) + SEGMENT_LEN, 4), dtype=np.float32)
    packed[len(rows):, 0] = np.full(
        SEGMENT_LEN, np.iinfo(np.int32).max, np.int32
    ).view(np.float32)
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
        return _candidate_topk(r_key, contrib, k)

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
