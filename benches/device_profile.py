"""Device-stage profiling: reproduces the measurements behind
docs/architecture.md's performance tables.

Run: PYTHONPATH=. python benches/device_profile.py [--n 100000] [--batch 256]

Methodology (critical on tunneled devices — see CLAUDE.md):
- every stage is timed inside a dependency-chained lax.scan whose inputs
  all depend on the loop carry (otherwise XLA hoists loop-invariant
  stages and the numbers lie);
- only a scalar is fetched at the end (large fetches measure the
  transport, not the TPU);
- a per-scan-step floor (~0.65 ms on the dev tunnel) is reported
  separately so stage times can be interpreted.
"""

from __future__ import annotations

import argparse
import functools
import time



def chain_timed(body, iters=20):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(n):
        def step(c, _):
            return body(c), None

        c, _ = jax.lax.scan(step, 0.0, None, length=n)
        return c

    float(chain(n=1))
    float(chain(n=iters))
    t0 = time.perf_counter()
    float(chain(n=iters))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--cand", type=int, default=50)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_synthetic_bm25, make_query_segments
    from trueno_rag_tpu.ops.bm25 import bm25_topk_segments
    from trueno_rag_tpu.ops.dense import dense_topk, similarity_scores
    from trueno_rag_tpu.ops.fusion import fuse_topk

    n, b, cand = args.n, args.batch, args.cand
    key = jax.random.PRNGKey(0)
    matrix = jax.random.normal(key, (n, 384), dtype=jnp.float32)
    matrix = matrix / jnp.linalg.norm(matrix, axis=1, keepdims=True)
    valid = jnp.ones((n,), bool)
    queries = jax.random.normal(key, (b, 384), dtype=jnp.float32)
    snap = build_synthetic_bm25(n, vocab=50_000, avg_len=64)
    seg_starts, seg_lens, packed = make_query_segments(snap, b, terms_per_query=6)
    seg_starts, seg_lens = jnp.asarray(seg_starts), jnp.asarray(seg_lens)
    avgdl = snap["avgdl"]

    print(f"device: {jax.devices()[0].platform} | N={n:,} B={b} cand={cand}")
    floor = chain_timed(lambda c: c * 1.000001 + 1e-12)
    print(f"scan-step floor            : {floor*1e3:8.3f} ms")

    t = chain_timed(lambda c: jnp.max(similarity_scores(queries + c, matrix)) * 1e-9)
    print(f"dense matmul (fp32 HIGHEST): {t*1e3:8.3f} ms")

    t = chain_timed(lambda c: jnp.max(dense_topk(queries + c, matrix, valid, cand)[0]) * 1e-9)
    print(f"dense + blockwise top-{cand:<4d}: {t*1e3:8.3f} ms")

    def bm25(c):
        shift = (c > 1e30).astype(jnp.int32)
        s, r = bm25_topk_segments(seg_starts + shift, seg_lens, packed, avgdl, k=cand)
        return jnp.max(s) * 1e-12 + c * 1e-30

    t = chain_timed(bm25)
    print(f"bm25 segments top-{cand:<7d}: {t*1e3:8.3f} ms")

    from bench import make_query_blocks
    from trueno_rag_tpu.ops.bm25 import bm25_topk_blocks

    bids, blo, bhi, blocks = make_query_blocks(snap, b, terms_per_query=6)
    bids, blo, bhi = jnp.asarray(bids), jnp.asarray(blo), jnp.asarray(bhi)

    def bm25_blk(c):
        shift = (c > 1e30).astype(jnp.int32)
        s, r = bm25_topk_blocks(bids + shift, blo, bhi, blocks, k=cand)
        return jnp.max(s) * 1e-12 + c * 1e-30

    t = chain_timed(bm25_blk)
    print(f"bm25 blocks top-{cand:<9d}: {t*1e3:8.3f} ms")

    d_s, d_r = dense_topk(queries, matrix, valid, cand)
    s_s, s_r = bm25_topk_segments(seg_starts, seg_lens, packed, avgdl, k=cand)
    t = chain_timed(lambda c: jnp.max(fuse_topk(d_r, d_s + c, s_r, s_s)[1]) * 1e-12)
    print(f"fusion rrf ({cand}+{cand} cands) : {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
