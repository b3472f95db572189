"""HTTP serving front-end benchmark: where does the Python/GIL HTTP
layer cap throughput relative to the device-side batch ceiling?

Starts run_server's stack in-process (RagHTTPServer + MicroBatcher)
over a synthetic hybrid index, then drives it from separate client
PROCESSES over persistent HTTP/1.1 connections at several concurrency
levels, reporting served QPS and p50/p99 per level, plus the
device-side retrieve_batch ceiling measured directly (same corpus,
same batch size) so the HTTP gap is a single division. Measured
results + the fixes they drove live in docs/deployment.md.

Run: PYTHONPATH=.:$PYTHONPATH PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       python -u benches/serve_bench.py [--chunks 10000] [--dim 64]

(CPU by default: over this dev box's TPU tunnel, HTTP-vs-device ratios
would measure the tunnel, not the server.)
"""

from __future__ import annotations

import argparse
import json
import socket
import threading
import time


def build_retriever(n_chunks: int, dim: int):
    import numpy as np

    from trueno_rag_tpu.chunking import Chunk
    from trueno_rag_tpu.embed import MockEmbedder
    from trueno_rag_tpu.retrieve import HybridRetriever

    rng = np.random.default_rng(0)
    words = np.array([f"w{i:04d}" for i in range(5000)])
    retr = HybridRetriever(MockEmbedder(dimension=dim))
    chunks = []
    embs = rng.standard_normal((n_chunks, dim)).astype(np.float32)
    texts = [" ".join(words[rng.integers(0, 5000, size=20)]) for _ in range(n_chunks)]
    for i, t in enumerate(texts):
        c = Chunk(document_id="b", content=t, start_offset=0, end_offset=len(t))
        c.embedding = embs[i]
        chunks.append(c)
    retr.index_batch(chunks)
    return retr, texts


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--chunks", type=int, default=10_000)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--requests", type=int, default=2000)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--max-batch", type=int, default=64)
    p.add_argument("--workers", type=int, default=0,
                   help="HTTP front-end worker processes (0 = classic "
                        "single-process server)")
    args = p.parse_args()

    import numpy as np

    from trueno_rag_tpu.serve import MicroBatcher, RagHTTPServer, make_handler, prewarm

    retr, texts = build_retriever(args.chunks, args.dim)
    queries = [t[:40] for t in texts[:256]]

    # compile every batch bucket up front — without this, bucket compiles
    # land on live requests and show up as multi-second p99 outliers
    prewarm(retr, args.max_batch, k=args.k, sample_queries=queries)

    # device-side ceiling: direct batched retrieval, no HTTP/batcher
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        retr.retrieve_batch(queries[: args.max_batch], args.k)
    ceiling = args.max_batch * reps / (time.perf_counter() - t0)
    print(f"device-side ceiling (retrieve_batch B={args.max_batch}): {ceiling:,.0f} q/s")

    batcher = MicroBatcher(retr, max_batch=args.max_batch, max_wait_ms=2.0)
    mp_server = None
    if args.workers:
        from trueno_rag_tpu.serve import MultiProcessServer

        mp_server = MultiProcessServer(batcher, "127.0.0.1", 0, args.workers)
        port = mp_server.port
        server = None
        print(f"{args.workers} front-end worker processes (SO_REUSEPORT)")
    else:
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        server = RagHTTPServer(("127.0.0.1", port), make_handler(batcher))
        threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}/query"

    # Clients are separate PROCESSES: in-process client threads would
    # share the server's GIL and measure their own contention, not the
    # server's (measured: thread clients showed multi-second fake p99s).
    import multiprocessing as mp

    ctx = mp.get_context("fork")

    print(f"HTTP serving over {args.chunks} chunks (max_batch={args.max_batch}):")
    for conc in (1, 8, 32, 128):
        n_per = max(1, args.requests // conc)
        with ctx.Pool(processes=min(conc, 32)) as pool:
            t0 = time.perf_counter()
            all_lats = pool.starmap(
                _client_worker,
                [(url, queries, args.k, n_per, i * n_per) for i in range(conc)],
            )
            wall = time.perf_counter() - t0
        lats = [x for sub in all_lats for x in sub]
        served = len(lats) / wall
        lat_ms = np.sort(np.array(lats)) * 1e3
        p50 = lat_ms[len(lat_ms) // 2]
        p99 = lat_ms[min(len(lat_ms) - 1, int(len(lat_ms) * 0.99))]
        dev = batcher.latency_stats()
        print(
            f"  conc {conc:4d}: {served:8,.0f} q/s  p50 {p50:7.2f} ms  "
            f"p99 {p99:7.2f} ms  ({served / ceiling * 100:5.1f}% of ceiling)  "
            f"[device batch p50 {dev.get('p50_ms', 0):6.1f} / p99 {dev.get('p99_ms', 0):7.1f} ms, "
            f"{batcher.batches_served} batches]",
            flush=True,
        )

    if mp_server is not None:
        mp_server.stop()
    else:
        server.shutdown()
    batcher.shutdown()


def _client_worker(url, queries, k, n, qoff):
    # one persistent HTTP/1.1 connection per client (what a production
    # front end does); reconnect only on errors
    import http.client
    import socket as socket_mod
    from urllib.parse import urlparse

    u = urlparse(url)

    def fresh():
        c = http.client.HTTPConnection(u.hostname, u.port)
        c.connect()
        # client-side Nagle + server delayed-ACK = 40 ms per request
        # (headers and body go out as separate segments)
        c.sock.setsockopt(socket_mod.IPPROTO_TCP, socket_mod.TCP_NODELAY, 1)
        return c

    conn = fresh()
    lat = []
    for i in range(n):
        body = json.dumps({"query": queries[(qoff + i) % len(queries)], "k": k}).encode()
        t = time.perf_counter()
        try:
            conn.request("POST", u.path, body=body,
                         headers={"Content-Type": "application/json"})
            conn.getresponse().read()
        except (http.client.HTTPException, OSError):
            conn.close()
            conn = fresh()
            conn.request("POST", u.path, body=body,
                         headers={"Content-Type": "application/json"})
            conn.getresponse().read()
        lat.append(time.perf_counter() - t)
    conn.close()
    return lat


if __name__ == "__main__":
    main()
