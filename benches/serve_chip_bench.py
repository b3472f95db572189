"""Serving measured AGAINST THE CHIP (r3 verdict #6): the real
MicroBatcher coalescing Poisson arrivals into device batches over the
1M-chunk bf16-tier hybrid program, with per-request latency
percentiles.

benches/serve_bench.py measures the HTTP plumbing on CPU (justified
there: the tunnel would dominate). This bench swaps the other side in:
the batcher dispatches to the REAL device and every batch completes by
fetching its [B, k] rows — a small fetch that forces remote execution
to finish, so request latencies are end-to-end honest. On this
harness each launch carries ~25-60 ms of fixed TUNNEL dispatch+fetch
(measured below as `rtt_floor_ms` via a null program); production PCIe
pays microseconds for the same step, so the tunnel-corrected
percentiles (`p50_ms - rtt_floor_ms`) are the hardware-limited view.

Query vectors come from a precomputed pool (the encoder's cost is the
encoder-fused bench's subject, not the batcher's).

Run: PYTHONPATH=.:$PYTHONPATH python -u benches/serve_chip_bench.py \
    [--n 1000000] [--requests 1200] [--load 0.6]
"""

from __future__ import annotations

import argparse
import threading
import time


def build_device_serving(n_chunks: int, dim: int, pool: int, k: int,
                         buckets=(8, 16, 32, 64)):
    """1M bf16-tier hybrid serving program + query pool → (serve_fn,
    pool arrays). serve_fn(qv [B,d], slot_idx [B]) -> rows [B,k] np."""
    import jax
    import jax.numpy as jnp

    from benches.hybrid_scale_bench import build_bm25_device, query_blocks_from_indptr
    from trueno_rag_tpu.ops.bm25 import bm25_topk_blocks
    from trueno_rag_tpu.ops.dense_tiered import dense_topk_tiered2, prepare_tiered
    from trueno_rag_tpu.ops.fusion import fuse_topk

    key1, key2 = jax.random.split(jax.random.PRNGKey(0))
    matrix = jax.random.normal(key1, (n_chunks, dim), dtype=jnp.float32)
    matrix = matrix / jnp.linalg.norm(matrix, axis=1, keepdims=True)
    valid = jnp.ones((n_chunks,), bool)
    mb, el2, al2 = prepare_tiered(matrix)
    blocks, indptr = build_bm25_device(n_chunks, 50_000, avg_len=64)
    bids, blo, bhi = query_blocks_from_indptr(indptr, pool, 6)
    q_pool = jax.random.normal(key2, (pool, dim), dtype=jnp.float32)
    corpus = tuple(jnp.asarray(x)
                   for x in (matrix, mb, el2, al2, valid, bids, blo, bhi, blocks))

    @jax.jit
    def serve(qv, slots, matrix, mb, el2, al2, valid, bids, blo, bhi, blocks):
        d_s, d_r, ok = dense_topk_tiered2(
            qv, matrix, mb, el2, al2, valid, 50,
            rescore_rows=96, t_top=4, margin_tiles=32, tile_n=4096,
        )
        s_s, s_r = bm25_topk_blocks(
            jnp.take(bids, slots, axis=0), jnp.take(blo, slots, axis=0),
            jnp.take(bhi, slots, axis=0), blocks, k=50)
        f_r, f_s = fuse_topk(d_r, d_s, s_r, s_s, kind="rrf", param=60.0)
        top_s, idx = jax.lax.top_k(f_s, k)
        return jnp.take_along_axis(f_r, idx, axis=1), top_s

    import numpy as np

    def serve_np(qv_np, slot_np):
        b = len(qv_np)
        bucket = next(x for x in buckets if x >= b)
        qv = np.zeros((bucket, dim), np.float32)
        qv[:b] = qv_np
        slots = np.zeros((bucket,), np.int32)
        slots[:b] = slot_np
        rows, scores = serve(jnp.asarray(qv), jnp.asarray(slots), *corpus)
        return np.asarray(rows)[:b], np.asarray(scores)[:b]  # forces completion

    # pre-compile every bucket (prewarm(), as production does)
    for bk in buckets:
        serve_np(np.zeros((bk, dim), np.float32), np.zeros((bk,), np.int32))
    return serve_np, np.asarray(q_pool)


class DeviceRetriever:
    """retrieve_batch-compatible adapter dispatching to the device
    program; results are (row, score) pairs — hydration fidelity is
    serve_bench's subject, not the device path's."""

    def __init__(self, serve_np, q_pool):
        self._serve = serve_np
        self._pool = q_pool

    def retrieve_batch(self, queries, k, tag_filter=None):
        import numpy as np

        slots = np.asarray([int(q.split()[-1]) % len(self._pool)
                            for q in queries], np.int32)
        rows, scores = self._serve(self._pool[slots], slots)
        return [[(int(r), float(s)) for r, s in zip(rw, sc) if r >= 0]
                for rw, sc in zip(rows, scores)]

    def __len__(self):
        return len(self._pool)


def measure(n_chunks=1_000_000, dim=384, pool=1024, k=10, requests=1200,
            load=0.6, max_batch=64, seed=3):
    """Returns a dict: served qps, p50/p95/p99 ms, rtt floor, capacity."""
    import numpy as np

    from trueno_rag_tpu.serve import MicroBatcher

    serve_np, q_pool = build_device_serving(n_chunks, dim, pool, k)

    # fixed tunnel dispatch+fetch floor: a null device program
    import jax
    import jax.numpy as jnp

    @jax.jit
    def null(x):
        return x + 1.0

    null(jnp.float32(0.0))
    rtts = []
    for _ in range(15):
        t0 = time.perf_counter()
        float(null(jnp.float32(t0 % 1)))
        rtts.append(time.perf_counter() - t0)
    rtt_floor = float(np.median(rtts)) * 1e3

    # capacity: back-to-back full batches through the adapter
    retr = DeviceRetriever(serve_np, q_pool)
    qs = [f"pool query {i}" for i in range(max_batch)]
    for _ in range(2):
        retr.retrieve_batch(qs, k)
    t0 = time.perf_counter()
    reps = 15
    for _ in range(reps):
        retr.retrieve_batch(qs, k)
    cap_qps = max_batch * reps / (time.perf_counter() - t0)

    batcher = MicroBatcher(retr, max_batch=max_batch, max_wait_ms=2.0)
    # knee sweep first (fewer requests per point), then the headline
    # load with the full request budget
    sweep = []
    for lv in (0.4, 0.75, 0.9):
        pt = _run_load(batcher, cap_qps, lv, max(200, requests // 3), k,
                       seed + int(lv * 100))
        sweep.append({"load": lv, **pt})
    head = _run_load(batcher, cap_qps, load, requests, k, seed)
    batcher.shutdown()
    return {
        "served_qps": head["served_qps"],
        "offered_qps": head["offered_qps"],
        "capacity_qps": round(cap_qps, 1),
        "p50_ms": head["p50_ms"],
        "p95_ms": head["p95_ms"],
        "p99_ms": head["p99_ms"],
        "rtt_floor_ms": round(rtt_floor, 1),
        "p50_ms_rtt_corrected": round(max(head["p50_ms"] - rtt_floor, 0.0), 1),
        "drift_p99_ms": head["drift_p99_ms"],
        "errors": head["errors"],
        "batches": batcher.batches_served,
        "load_sweep": sweep,
    }


def _run_load(batcher, cap_qps, load, requests, k, seed):
    """Offered-load run with DEADLINE-BASED firing (r4 verdict #4).

    The old generator slept `gap` then SPAWNED a thread per request —
    at 1.7 ms inter-arrival on one core the spawn+sleep overhead
    stretched the schedule, so "served < offered" measured the load
    generator, not the server. Here the Poisson schedule is an
    ABSOLUTE timeline fixed before the run; a pre-spawned worker pool
    (each worker owns the i ≡ w mod W stripe of the schedule) sleeps
    until each deadline and fires. `drift_*` reports how well the
    generator held its own schedule — the evidence the offered rate
    was real."""
    import numpy as np

    rng = np.random.default_rng(seed)
    lam = load * cap_qps
    sched = np.cumsum(rng.exponential(1.0 / lam, size=requests))
    lat = np.zeros(requests)
    drift = np.zeros(requests)
    ok = np.zeros(requests, dtype=bool)
    end_t = np.zeros(requests)
    workers = int(min(256, max(32, lam)))
    done = threading.Semaphore(0)
    t_start = time.perf_counter() + 0.1  # workers reach their 1st deadline

    def worker(w):
        for i in range(w, requests, workers):
            target = t_start + sched[i]
            now = time.perf_counter()
            if target > now:
                time.sleep(target - now)
            fire_t = time.perf_counter()
            drift[i] = (fire_t - target) * 1e3
            try:
                batcher.query(f"pool query {i}", k=k, timeout=30.0)
                ok[i] = True
            except Exception:  # noqa: BLE001 — counted, not raised
                pass
            end_t[i] = time.perf_counter()
            lat[i] = (end_t[i] - fire_t) * 1e3
            done.release()

    threads = [threading.Thread(target=worker, args=(w,), daemon=True)
               for w in range(workers)]
    for t in threads:
        t.start()
    for _ in range(requests):
        done.acquire()
    # steady-state service rate: completions INSIDE the firing window
    # divided by the window — counting the post-schedule drain tail in
    # the denominator systematically under-reports by ~latency/window
    # (at a 1 s window and 90 ms p50 that is ~10%, and it measures the
    # window length, not the server)
    window = float(sched[-1])
    in_window = int((end_t <= t_start + window).sum())
    p50, p95, p99 = (float(np.percentile(lat, p)) for p in (50, 95, 99))
    return {
        "served_qps": round(in_window / window, 1),
        "served_qps_incl_drain": round(
            requests / (float(end_t.max()) - t_start), 1),
        "offered_qps": round(lam, 1),
        "p50_ms": round(p50, 1),
        "p95_ms": round(p95, 1),
        "p99_ms": round(p99, 1),
        "drift_p50_ms": round(float(np.percentile(drift, 50)), 2),
        "drift_p99_ms": round(float(np.percentile(drift, 99)), 2),
        "errors": int((~ok).sum()),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--requests", type=int, default=1200)
    p.add_argument("--load", type=float, default=0.6)
    p.add_argument("--max-batch", type=int, default=64)
    args = p.parse_args()
    out = measure(n_chunks=args.n, requests=args.requests, load=args.load,
                  max_batch=args.max_batch)
    print(out, flush=True)


if __name__ == "__main__":
    main()
