"""Full hybrid (dense + BM25 + fusion) A/B at corpus scale with the
BM25 structures synthesized ON DEVICE.

bench.py builds its synthetic postings on the host; at ≥1M chunks the
arrays are hundreds of MB and shipping them over the dev tunnel
(~2 MB/s) dominated or broke earlier scale runs. Here everything but
the tiny per-query slot lists (built from the fetched 400 KB indptr)
is generated directly in HBM, so the only host↔device traffic is
queries and scalars.

Run: PYTHONPATH=.:$PYTHONPATH python -u benches/hybrid_scale_bench.py \
       [--n 1000000] [--kinds fp32,tiered]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np

K1, B_PARAM = 1.2, 0.75


def build_bm25_device(n_chunks: int, vocab: int, avg_len: int, seed: int = 0):
    """Device-side synthetic BM25 block table (same distribution as
    bench.build_synthetic_bm25). Returns (blocks [NB,2,256], indptr_np)."""
    import jax
    import jax.numpy as jnp

    from trueno_rag_tpu.ops.bm25 import BLOCK_LEN

    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    total = n_chunks * avg_len // 4
    w = 1.0 / jnp.arange(1, vocab + 1, dtype=jnp.float32) ** 0.9
    cdf = jnp.cumsum(w / jnp.sum(w))
    term = jnp.clip(
        jnp.searchsorted(cdf, jax.random.uniform(k1, (total,))), 0, vocab - 1
    ).astype(jnp.int32)
    term_sorted = jnp.sort(term)
    rows = jax.random.randint(k2, (total,), 0, n_chunks, dtype=jnp.int32)
    tfs = jax.random.randint(k3, (total,), 1, 5).astype(jnp.float32)
    indptr = jnp.searchsorted(term_sorted, jnp.arange(vocab + 1))
    df = jnp.maximum(jnp.diff(indptr), 1).astype(jnp.float32)
    idf = jnp.log((n_chunks - df + 0.5) / (df + 0.5) + 1.0)
    doc_len = jax.random.randint(
        k4, (n_chunks,), avg_len // 2, avg_len * 2
    ).astype(jnp.float32)
    avgdl = jnp.maximum(jnp.mean(doc_len), 1e-9)

    dl = jnp.take(doc_len, rows)
    idf_p = jnp.take(idf, term_sorted)
    denom = tfs + K1 * (1.0 - B_PARAM + B_PARAM * dl / avgdl)
    contrib = idf_p * tfs * (K1 + 1.0) / jnp.maximum(denom, 1e-9)

    nb = total // BLOCK_LEN + 1
    pad = nb * BLOCK_LEN - total
    flat_rows = jnp.pad(rows.astype(jnp.float32), (0, pad))
    flat_contrib = jnp.pad(contrib, (0, pad))
    blocks = jnp.stack(
        [flat_rows.reshape(nb, BLOCK_LEN), flat_contrib.reshape(nb, BLOCK_LEN)],
        axis=1,
    )
    return blocks, np.asarray(indptr)  # indptr: ~400 KB fetch


def query_blocks_from_indptr(indptr, batch, terms_per_query, seed=1):
    """Per-query BLOCK_LEN-aligned slots (host; mirrors bench.py)."""
    from trueno_rag_tpu.ops.bm25 import BLOCK_LEN

    rng = np.random.default_rng(seed)
    vocab = len(indptr) - 1
    sentinel = int(indptr[-1]) // BLOCK_LEN
    per_query, max_slots = [], 1
    for _ in range(batch):
        slots = []
        for t in rng.choice(vocab, size=terms_per_query, replace=False):
            lo, hi = int(indptr[t]), int(indptr[t + 1])
            hi = min(hi, lo + 512)
            if hi <= lo:
                continue
            for blk in range(lo // BLOCK_LEN, (hi - 1) // BLOCK_LEN + 1):
                base = blk * BLOCK_LEN
                slots.append((blk, max(lo - base, 0), min(hi - base, BLOCK_LEN)))
        per_query.append(slots)
        max_slots = max(max_slots, len(slots))
    S = max(2, max_slots)
    bids = np.full((batch, S), sentinel, dtype=np.int32)
    lo_a = np.zeros((batch, S), dtype=np.int32)
    hi_a = np.zeros((batch, S), dtype=np.int32)
    for i, slots in enumerate(per_query):
        for j, (blk, lo, hi) in enumerate(slots):
            bids[i, j], lo_a[i, j], hi_a[i, j] = blk, lo, hi
    return bids, lo_a, hi_a


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--d", type=int, default=384)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--cand", type=int, default=50)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--vocab", type=int, default=50_000)
    p.add_argument("--kinds", default="fp32,tiered")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from trueno_rag_tpu.ops.bm25 import bm25_topk_blocks
    from trueno_rag_tpu.ops.dense import dense_topk
    from trueno_rag_tpu.ops.dense_tiered import dense_topk_tiered, prepare_tiered
    from trueno_rag_tpu.ops.fusion import fuse_topk

    n, d, b, cand, k = args.n, args.d, args.batch, args.cand, args.k
    key1, key2 = jax.random.split(jax.random.PRNGKey(0))
    matrix = jax.random.normal(key1, (n, d), dtype=jnp.float32)
    matrix = matrix / jnp.linalg.norm(matrix, axis=1, keepdims=True)
    valid = jnp.ones((n,), bool)
    queries = jax.random.normal(key2, (b, d), dtype=jnp.float32)
    mb, el2, al2 = prepare_tiered(matrix)
    blocks, indptr = build_bm25_device(n, args.vocab, avg_len=64)
    bids, blo, bhi = query_blocks_from_indptr(indptr, b, terms_per_query=6)
    bids, blo, bhi = jnp.asarray(bids), jnp.asarray(blo), jnp.asarray(bhi)
    jax.block_until_ready(blocks)
    print(f"N={n:,} built on device; slots/query={bids.shape[1]}", flush=True)

    @functools.partial(jax.jit, static_argnames=("steps", "kind"))
    def chain(queries, matrix, mb, el2, al2, valid, bids, blo, bhi, blocks,
              steps, kind):
        def one(carry, _):
            q = queries + carry
            shift = (carry > 1e30).astype(jnp.int32)
            if kind == "tiered":
                d_s, d_r, ok = dense_topk_tiered(
                    q, matrix, mb, el2, al2, valid, cand,
                    rescore_rows=192, block_top=2, tile_n=4096,
                )
                extra = jnp.sum(ok)
            else:
                d_s, d_r = dense_topk(q, matrix, valid, cand, "cosine")
                extra = 0.0
            s_s, s_r = bm25_topk_blocks(bids + shift, blo, bhi, blocks, k=cand)
            f_r, f_s = fuse_topk(d_r, d_s, s_r, s_s, kind="rrf", param=60.0)
            top = jax.lax.top_k(f_s, k)[0]
            return (jnp.max(top) + extra) * 1e-12, None

        c, _ = jax.lax.scan(one, 0.0, None, length=steps)
        return c

    arrs = (queries, matrix, mb, el2, al2, valid, bids, blo, bhi, blocks)
    for kind in args.kinds.split(","):
        float(chain(*arrs, args.iters, kind))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(*arrs, args.iters, kind))
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[1] / args.iters
        print(f"hybrid[{kind:6s}] @ {n:,}: {dt*1e3:8.3f} ms/step → {b/dt:10,.0f} q/s",
              flush=True)


if __name__ == "__main__":
    main()
