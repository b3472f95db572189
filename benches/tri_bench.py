"""Tri-hybrid A/B on the attached TPU: what the learned-sparse third
source adds on top of the classic dense+BM25 hybrid, and what the
one-dispatch tri program costs vs its stages.

Everything big (dense matrix, BM25 contribution blocks, learned weight
blocks) is synthesized ON DEVICE (the dev tunnel is ~2 MB/s; see
hybrid_scale_bench.py). Timing follows the repo lore: dependency-
chained lax.scan materializing one scalar, all arrays passed as jit
ARGUMENTS.

Run: PYTHONPATH=.:$PYTHONPATH python -u benches/tri_bench.py [--n 100000]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np

from benches.hybrid_scale_bench import build_bm25_device, query_blocks_from_indptr


def build_learned_device(n_chunks: int, vocab: int, avg_terms: int, seed: int = 7):
    """Device-side synthetic learned-sparse block table: term-sorted
    postings with uniform(0.05, 1] weights (the SPLADE top-T layout),
    packed [NB, 2, BLOCK_LEN] rows/weights."""
    import jax
    import jax.numpy as jnp

    from trueno_rag_tpu.ops.bm25 import BLOCK_LEN

    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    total = n_chunks * avg_terms
    term = jax.random.randint(k1, (total,), 0, vocab, dtype=jnp.int32)
    term_sorted = jnp.sort(term)
    rows = jax.random.randint(k2, (total,), 0, n_chunks, dtype=jnp.int32)
    w = jax.random.uniform(k3, (total,), minval=0.05, maxval=1.0)
    indptr = jnp.searchsorted(term_sorted, jnp.arange(vocab + 1))
    nb = total // BLOCK_LEN + 1
    pad = nb * BLOCK_LEN - total
    blocks = jnp.stack(
        [
            jnp.pad(rows.astype(jnp.float32), (0, pad)).reshape(nb, BLOCK_LEN),
            jnp.pad(w, (0, pad)).reshape(nb, BLOCK_LEN),
        ],
        axis=1,
    )
    return blocks, np.asarray(indptr)


def learned_query_slots(indptr, batch, terms_per_query, seed=3):
    """Expanded-query slots + weights over the learned table (host)."""
    bids, lo, hi = query_blocks_from_indptr(indptr, batch, terms_per_query,
                                            seed=seed)
    rng = np.random.default_rng(seed + 1)
    qw = np.where(hi > lo, rng.uniform(0.1, 1.0, size=bids.shape), 0.0)
    return bids, lo, hi, qw.astype(np.float32)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--d", type=int, default=384)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--cand", type=int, default=50)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--vocab", type=int, default=50_000)
    p.add_argument("--expand-vocab", type=int, default=30_000)
    p.add_argument("--terms", type=int, default=6)
    p.add_argument("--expansions", type=int, default=32)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from trueno_rag_tpu.ops.bm25 import bm25_topk_blocks, weighted_topk_blocks
    from trueno_rag_tpu.ops.dense import dense_topk
    from trueno_rag_tpu.ops.fusion import fuse_topk, fuse_topk_many

    n, d, b, cand, k = args.n, args.d, args.batch, args.cand, args.k
    key1, key2 = jax.random.split(jax.random.PRNGKey(0))
    matrix = jax.random.normal(key1, (n, d), dtype=jnp.float32)
    matrix = matrix / jnp.linalg.norm(matrix, axis=1, keepdims=True)
    valid = jnp.ones((n,), bool)
    queries = jax.random.normal(key2, (b, d), dtype=jnp.float32)
    blocks, indptr = build_bm25_device(n, args.vocab, avg_len=64)
    bids, blo, bhi = query_blocks_from_indptr(indptr, b, args.terms)
    l_blocks, l_indptr = build_learned_device(n, args.expand_vocab, 24)
    lb, ll, lh, lw = learned_query_slots(l_indptr, b, args.expansions)
    arrs = tuple(
        jnp.asarray(x)
        for x in (queries, matrix, valid, bids, blo, bhi, blocks,
                  lb, ll, lh, lw, l_blocks)
    )
    jax.block_until_ready(arrs[-1])
    print(
        f"N={n:,} built on device; bm25 slots/query={bids.shape[1]}, "
        f"learned slots/query={lb.shape[1]}", flush=True,
    )

    @functools.partial(jax.jit, static_argnames=("steps", "kind"))
    def chain(queries, matrix, valid, bids, blo, bhi, blocks,
              lb, ll, lh, lw, l_blocks, steps, kind):
        def one(carry, _):
            q = queries + carry
            shift = (carry > 1e30).astype(jnp.int32)
            d_s, d_r = dense_topk(q, matrix, valid, cand, "cosine")
            s_s, s_r = bm25_topk_blocks(bids + shift, blo, bhi, blocks, k=cand)
            if kind == "tri":
                l_s, l_r = weighted_topk_blocks(
                    lb + shift, ll, lh, lw + carry * 1e-30, l_blocks, k=cand
                )
                f_r, f_s = fuse_topk_many(
                    (d_r, s_r, l_r), (d_s, s_s, l_s), kind="rrf", param=60.0
                )
            elif kind == "tri_fuse2":
                # ablation: learned scoring runs, fusion stays two-way —
                # isolates the N-way fusion's own cost
                l_s, l_r = weighted_topk_blocks(
                    lb + shift, ll, lh, lw + carry * 1e-30, l_blocks, k=cand
                )
                f_r, f_s = fuse_topk(d_r, d_s, s_r, s_s, kind="rrf", param=60.0)
                f_s = f_s + jnp.max(l_s) * 1e-30  # keep the stage live
            else:
                f_r, f_s = fuse_topk(d_r, d_s, s_r, s_s, kind="rrf", param=60.0)
            top = jax.lax.top_k(f_s, k)[0]
            return jnp.max(top) * 1e-12, None

        c, _ = jax.lax.scan(one, 0.0, None, length=steps)
        return c

    for kind in ("hybrid2", "tri_fuse2", "tri"):
        float(chain(*arrs, args.iters, kind))  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(*arrs, args.iters, kind))
            ts.append((time.perf_counter() - t0) / args.iters)
        ms = min(ts) * 1e3
        print(
            f"{kind:8s} {ms:7.2f} ms/step  {b / min(ts):10,.0f} q/s "
            f"(B={b}, cand={cand}, k={k})", flush=True,
        )


if __name__ == "__main__":
    main()
