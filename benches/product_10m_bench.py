"""PRODUCT-stack bench at north-star scale (r4 verdict #1).

Every prior 10.5M row measured the ops chains over synthetically
generated device slabs ("production reads VectorStore._host instead" —
an untested claim at that scale). This bench builds the REAL product
object end-to-end and measures what the framework, not the kernels,
delivers:

    Chunk objects (synthetic text + precomputed embeddings)
      -> HybridRetriever.index_batch          [native C++ BM25 tokenize/
         (timed: product ingest)               build + registry + host
                                               fp32 matrix]
      -> ensure_ready()                        [CSR snapshot + block-
         (timed: device build)                  table pack + streamed
                                               bf16r replica build/upload]
      -> retrieve_batch (config fused=True)    [encoder + certified
         (timed: product QPS)                   compact scan + BM25 +
                                               fusion in ONE program;
                                               staged exact patch reads
                                               the real ``_host``]

Embeddings are PRE-computed (the offline-embedding production pattern;
encoder throughput has its own rows) and random — dense throughput is
data-independent. Text is synthetic with Zipf(0.9) term popularity over
a 50k vocab; query terms sample ranks >= 5000 (informative terms — the
head of a Zipf vocabulary is stopword-like and carries no BM25 signal).

Reference contract: index.rs:386-412 (ingest) + retrieve.rs:175-220
(hybrid query) semantics at ~10,500x the reference book's scale.

Comparison targets: ``hybrid_qps_10.5m_compact_bf16r`` (the raw ops
chain) and ``encoder_fused_qps_10.5m_compact`` (the same one-program
path over synthetic slabs). On this harness the product path pays the
TUNNEL per batch (one dispatch RTT + the result fetch at ~17 MB/s);
``qps_tunnel_corrected`` subtracts the measured RTT floor + fetch time
the way the serve row's ``p50_ms_rtt_corrected`` does, and is the
figure transferable to a real TPU VM (PCIe fetches are ~us).
"""

from __future__ import annotations

import faulthandler
import gc
import json
import resource
import sys
import time

import numpy as np

# stall watchdog: if no progress note for 5 min, dump thread stacks to
# stderr (same pattern as bench.py — diagnosable, not silent)
faulthandler.dump_traceback_later(300, repeat=True, file=sys.stderr)


def _note(msg: str) -> None:
    faulthandler.cancel_dump_traceback_later()
    faulthandler.dump_traceback_later(300, repeat=True, file=sys.stderr)
    print(f"[product {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def _rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def synth_corpus(rows: int, vocab: int, doc_tokens: int, seed: int = 0):
    """Zipf(0.9) word ids -> per-doc texts. Returns (texts, word_arr).
    Untimed: corpus synthesis is the experiment's input, not product
    work."""
    rng = np.random.default_rng(seed)
    w = 1.0 / (np.arange(1, vocab + 1) ** 0.9)
    cdf = np.cumsum(w / w.sum())
    texts = []
    step = 1 << 19
    word_arr = np.array([f"w{i:05d}" for i in range(vocab)])
    for lo in range(0, rows, step):
        m = min(step, rows - lo)
        ids = np.searchsorted(cdf, rng.random((m, doc_tokens))).clip(0, vocab - 1)
        texts.extend(" ".join(r) for r in word_arr[ids])
        if lo % (1 << 21) == 0:
            _note(f"text {lo + m}/{rows}")
    return texts, word_arr


def measure(rows: int = 20 * 524_288, dim: int = 384, doc_tokens: int = 16,
            vocab: int = 50_000, cand: int = 50, k: int = 10,
            slab: int = 1 << 19, q_iters: int = 24, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from trueno_rag_tpu.chunking import Chunk
    from trueno_rag_tpu.index import VectorStoreConfig
    from trueno_rag_tpu.models.encoder import JaxEncoderEmbedder
    from trueno_rag_tpu.retrieve import HybridRetriever, HybridRetrieverConfig

    out: dict = {"rows_n": rows, "dim": dim, "doc_tokens": doc_tokens,
                 "platform": jax.default_backend()}
    rng = np.random.default_rng(seed + 1)

    _note(f"synthesizing corpus: {rows} docs x {doc_tokens} tokens")
    texts, word_arr = synth_corpus(rows, vocab, doc_tokens, seed)
    embs = rng.standard_normal((rows, dim), dtype=np.float32)
    _note(f"corpus ready (rss {_rss_gb():.1f} GB)")

    emb = JaxEncoderEmbedder()  # MiniLM-L6-shaped, 384-d (random params)
    retr = HybridRetriever(
        emb,
        config=HybridRetrieverConfig(candidates_per_source=cand, fused=True),
        vector_config=VectorStoreConfig(
            dimension=dim, scan_tier="compact", scan_tile_n=4096,
            initial_capacity=rows,
        ),
    )

    # -- product ingest (host): Chunk objects -> native BM25 build +
    # -- registry + host fp32 matrix ------------------------------------
    # Bulk-ingest GC hygiene: the corpus is tens of millions of live
    # container objects; CPython's generational passes over them during
    # the allocation-heavy ingest are pure overhead (nothing in this
    # loop creates cycles). freeze() moves the pre-existing corpus out
    # of the collector's view; collection is re-enabled after.
    gc.collect()
    gc.freeze()
    gc.disable()
    t0 = time.perf_counter()
    for lo in range(0, rows, slab):
        m = min(slab, rows - lo)
        chunks = []
        for i in range(lo, lo + m):
            t = texts[i]
            c = Chunk(document_id="corpus", content=t,
                      start_offset=0, end_offset=len(t))
            c.embedding = embs[i]
            chunks.append(c)
        retr.index_batch(chunks)
        _note(f"ingest {lo + m}/{rows} (rss {_rss_gb():.1f} GB)")
    ingest_s = time.perf_counter() - t0
    gc.enable()
    out["ingest_s"] = round(ingest_s, 1)
    out["ingest_chunks_per_s"] = round(rows / ingest_s, 1)
    _note(f"ingest: {rows / ingest_s:,.0f} chunks/s")

    # -- device build: BM25 snapshot/pack + streamed bf16r replicas ----
    t0 = time.perf_counter()
    retr.ensure_ready()
    # block_until_ready returns before remote execution completes on
    # this tunnel (CLAUDE.md); a dependent scalar FETCH of every tier
    # array is the only sync that proves the streamed upload drained —
    # without it the build time under-reports by the in-flight minutes
    # and the next phase silently absorbs them
    for a in retr.vector_store._tier:
        float(jnp.sum(a[:4].astype(jnp.float32)))
    device_build_s = time.perf_counter() - t0
    replica_gb = sum(
        a.size * a.dtype.itemsize for a in retr.vector_store._tier
    ) / 1e9
    out["device_build_s"] = round(device_build_s, 1)
    out["replica_gb"] = round(replica_gb, 2)
    out["peak_rss_gb"] = round(_rss_gb(), 1)
    _note(f"device build {device_build_s:.1f}s, replicas {replica_gb:.2f} GB, "
          f"rss {_rss_gb():.1f} GB")

    # -- RTT floor (same correction as serve_chip_bench) ----------------
    one = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((), jnp.float32)
    float(one(z))
    rtts = []
    for _ in range(15):
        t0 = time.perf_counter()
        float(one(z))
        rtts.append(time.perf_counter() - t0)
    rtt_ms = sorted(rtts)[len(rtts) // 2] * 1e3
    out["rtt_floor_ms"] = round(rtt_ms, 1)

    # -- product retrieval ---------------------------------------------
    def make_queries(b, qseed):
        q_rng = np.random.default_rng(qseed)
        tids = q_rng.integers(5000, vocab, size=(b, 6))
        return [" ".join(word_arr[t]) for t in tids]

    store = retr.vector_store

    def run(b, iters, label):
        sets = [make_queries(b, 100 + s) for s in range(4)]
        _note(f"{label}: compiling (first call)")
        retr.retrieve_batch(sets[0], k)  # compile
        retr.retrieve_batch(sets[1], k)  # warm caches
        u0 = store.compact_uncertified
        c0 = store.compact_candidate_patched
        g0 = store.compact_gemm_patched
        times = []
        t_all0 = time.perf_counter()
        for it in range(iters):
            qs = sets[it % len(sets)]
            t0 = time.perf_counter()
            res = retr.retrieve_batch(qs, k)
            times.append(time.perf_counter() - t0)
        wall = time.perf_counter() - t_all0
        assert len(res) == b and res[0], "product results must hydrate"
        med = sorted(times)[len(times) // 2]
        return {
            "ms_per_batch": round(med * 1e3, 1),
            "ms_min": round(min(times) * 1e3, 1),
            "ms_max": round(max(times) * 1e3, 1),
            "qps": round(b / med, 1),
            "qps_sustained": round(b * iters / wall, 1),
            "uncertified": store.compact_uncertified - u0,
            "candidate_patched": store.compact_candidate_patched - c0,
            "gemm_patched": store.compact_gemm_patched - g0,
        }

    def guarded(key, fn):
        # one stuck phase (a 20-min remote compile happens — measured)
        # must not lose every other number of a 40-minute build
        try:
            out[key] = fn()
            _note(f"{key}: {out[key]}")
        except Exception as e:  # noqa: BLE001
            out[key] = {"error": repr(e)}
            _note(f"{key} FAILED: {e!r}")

    guarded("fused_b256", lambda: run(256, q_iters, "fused B=256"))
    guarded("fused_b1024",
            lambda: run(1024, max(6, q_iters // 3), "fused B=1024"))

    # -- pipelined exact serving (r4 verdict #2): the submit/collect
    # -- seam, 2 deep — batch N's host side (fetch + staged patch +
    # -- hydration) overlaps batch N+1's device scan ----------------------
    def run_pipelined(b, iters, label):
        sets = [make_queries(b, 200 + s) for s in range(4)]
        u0 = store.compact_uncertified
        g0 = store.compact_gemm_patched
        h = retr.retrieve_batch_submit(sets[0], k)
        res = retr.retrieve_batch_collect(h)  # compile + warm
        t0 = time.perf_counter()
        h_prev = retr.retrieve_batch_submit(sets[0], k)
        done = 0
        for it in range(1, iters):
            h_next = retr.retrieve_batch_submit(sets[it % len(sets)], k)
            res = retr.retrieve_batch_collect(h_prev)
            done += len(res)
            h_prev = h_next
        done += len(retr.retrieve_batch_collect(h_prev))
        wall = time.perf_counter() - t0
        return {
            "ms_per_batch": round(wall / iters * 1e3, 1),
            "qps": round(done / wall, 1),
            "uncertified": store.compact_uncertified - u0,
            "gemm_patched": store.compact_gemm_patched - g0,
        }

    guarded("pipelined_b256",
            lambda: run_pipelined(256, q_iters, "pipelined B=256"))

    # -- served percentiles under offered load through the REAL
    # -- MicroBatcher (pipeline_depth=2) ---------------------------------
    try:
        from benches.serve_chip_bench import _run_load

        from trueno_rag_tpu.serve import MicroBatcher

        class _Q:  # map "pool query i" -> a real query string
            def __init__(self, r):
                self._r = r

            def retrieve_batch(self, queries, k, tag_filter=None):
                qs = [qpool[int(q.split()[-1]) % len(qpool)] for q in queries]
                return self._r.retrieve_batch(qs, k)

            def retrieve_batch_submit(self, queries, k, tag_filter=None):
                qs = [qpool[int(q.split()[-1]) % len(qpool)] for q in queries]
                return self._r.retrieve_batch_submit(qs, k)

            def retrieve_batch_collect(self, handle):
                return self._r.retrieve_batch_collect(handle)

        qpool = make_queries(1024, 999)
        qb = _Q(retr)
        # prewarm every power-of-two batch bucket BEFORE load: each
        # fused-compact compile is 40-90 s on this backend and a cold
        # bucket under load stalls the whole queue behind it (measured:
        # p50 ~20 s, served 24/s — the run-3 lesson)
        bs = 1
        while bs <= 128:
            _note(f"serve prewarm: bucket {bs}")
            qb.retrieve_batch([f"pool query {i}" for i in range(bs)], k)
            bs *= 2
        batcher = MicroBatcher(qb, max_batch=128, max_wait_ms=5.0,
                               pipeline_depth=2)
        # closed-loop capacity through the REAL batcher (96 concurrent
        # requesters, no schedule), then offer 0.6x of it
        import threading as _th

        n_cap = 1200
        ctr = [0]
        lk = _th.Lock()

        def _worker():
            while True:
                with lk:
                    i = ctr[0]
                    if i >= n_cap:
                        return
                    ctr[0] += 1
                batcher.query(f"pool query {i}", k=k, timeout=60.0)

        ths = [_th.Thread(target=_worker, daemon=True) for _ in range(96)]
        t0 = time.perf_counter()
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        cap = n_cap / (time.perf_counter() - t0)
        _note(f"serve capacity (closed loop): {cap:.1f} q/s")
        srv = _run_load(batcher, cap, 0.6, 600, k, seed=11)
        srv["capacity_qps"] = round(cap, 1)
        batcher.shutdown()
        out["serve_exact"] = srv
        _note(f"serve exact: {srv}")
    except Exception as e:  # noqa: BLE001 — the other rows still count
        out["serve_exact"] = {"error": repr(e)}
    # staged-path comparison last: its warmup once took ~20 minutes —
    # root-caused (r5) to the BM25 tail's associative_scan compile
    # pathology, fixed with lax.cummax in ops/bm25._candidate_topk;
    # the ordering stays as cheap insurance (a stall here costs only
    # this comparison row).
    def _staged():
        retr.config.fused = False
        try:
            return run(256, max(8, q_iters // 2), "staged B=256")
        finally:
            retr.config.fused = True

    guarded("staged_b256", _staged)
    out["final_rss_gb"] = round(_rss_gb(), 1)

    # free the device + host state for whatever runs after us
    del retr, store, emb, texts, embs
    gc.collect()
    return out


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=20 * 524_288)
    p.add_argument("--doc-tokens", type=int, default=16)
    p.add_argument("--q-iters", type=int, default=24)
    args = p.parse_args()
    out = measure(rows=args.rows, doc_tokens=args.doc_tokens,
                  q_iters=args.q_iters)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
