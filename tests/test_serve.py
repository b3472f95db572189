"""Serving tests: micro-batcher coalescing + the HTTP surface end-to-end
(real server on a random port, concurrent clients)."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
from trueno_rag_tpu.embed import TfIdfEmbedder
from trueno_rag_tpu.retrieve import HybridRetriever
from trueno_rag_tpu.serve import MicroBatcher, make_handler

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "machine learning models process large data sets",
    "foxes are clever wild animals living in forests",
    "tensor processing units multiply matrices quickly",
]


@pytest.fixture(scope="module")
def retriever():
    emb = TfIdfEmbedder(32).fit(CORPUS)
    retr = HybridRetriever(emb)
    chunks = []
    for i, t in enumerate(CORPUS):
        c = Chunk(document_id="d", content=t, start_offset=0, end_offset=len(t),
                  metadata=ChunkMetadata(title=f"t{i}"), id=chunk_id_from_int(i))
        c.set_embedding(emb.embed_document(t))
        chunks.append(c)
    retr.index_batch(chunks)
    # warm the compiled programs so server requests are fast
    retr.retrieve_batch(["warmup"], 3)
    return retr


def test_microbatcher_coalesces(retriever):
    batcher = MicroBatcher(retriever, max_batch=8, max_wait_ms=150.0)
    try:
        results = [None] * 6
        threads = []

        def go(i):
            results[i] = batcher.query("fox forests" if i % 2 else "tensor matrices", k=2)

        for i in range(6):
            t = threading.Thread(target=go, args=(i,))
            threads.append(t)
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert all(r is not None and len(r) > 0 for r in results)
        # 6 concurrent queries should have shared batches
        assert batcher.batches_served < 6
        assert batcher.queries_served == 6
        # right answers routed to the right callers
        assert "fox" in results[1][0].chunk.content
        assert "matrices" in results[0][0].chunk.content.lower() or results[0]
    finally:
        batcher.shutdown()


@pytest.fixture(scope="module")
def server(retriever):
    batcher = MicroBatcher(retriever, max_batch=8, max_wait_ms=2.0)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(batcher))
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()
    srv.server_close()
    batcher.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:  # 4xx still carries a JSON body
        return e.code, json.loads(e.read())


def test_http_health(server):
    with urllib.request.urlopen(server + "/health", timeout=10) as resp:
        data = json.loads(resp.read())
    assert data["status"] == "ok"
    assert data["chunks"] == 4
    # tier observability: which scan tier serves, certificate misses
    assert data["scan_tier"] in ("none", "bf16", "int8", "compact", "clustered")
    assert data["tier_fallbacks"] == 0 and data["uncertified_queries"] == 0


def test_http_single_query(server):
    status, data = _post(server + "/query", {"query": "clever fox", "k": 2})
    assert status == 200
    assert len(data["results"]) == 2
    top = data["results"][0]
    assert "fox" in top["content"]
    assert {"score", "chunk_id", "title", "content"} <= set(top)


def test_http_batch_query(server):
    status, data = _post(server + "/query", {"queries": ["fox", "tensor units"], "k": 1})
    assert status == 200
    assert len(data["batches"]) == 2
    assert "fox" in data["batches"][0][0]["content"]
    assert "tensor" in data["batches"][1][0]["content"].lower()


def test_http_errors(server):
    status, data = _post(server + "/query", {"k": 3})
    assert status == 400 and "error" in data
    status, data = _post(server + "/query", {"query": "   "})
    assert status == 400  # empty query -> QueryError -> 400
    req = urllib.request.Request(server + "/nope", data=b"{}")
    try:
        urllib.request.urlopen(req, timeout=10)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_empty_query_rejected_before_batching(retriever):
    """Regression (code review): one empty query must not poison the
    micro-batch for concurrent valid requests."""
    from trueno_rag_tpu.errors import QueryError

    batcher = MicroBatcher(retriever, max_batch=8, max_wait_ms=30.0)
    try:
        outcome = {}

        def bad():
            try:
                batcher.query("   ", k=2)
                outcome["bad"] = "no error"
            except QueryError:
                outcome["bad"] = "rejected"

        def good():
            outcome["good"] = batcher.query("fox", k=2)

        t1 = threading.Thread(target=bad)
        t2 = threading.Thread(target=good)
        t1.start(); t2.start()
        t1.join(20); t2.join(20)
        assert outcome["bad"] == "rejected"
        assert outcome["good"], "valid request must survive a bad neighbor"
    finally:
        batcher.shutdown()


def test_latency_stats_populated(retriever):
    batcher = MicroBatcher(retriever, max_batch=4, max_wait_ms=1.0)
    try:
        for _ in range(3):
            batcher.query("fox", k=1)
        stats = batcher.latency_stats()
        assert {"p50_ms", "p95_ms", "p99_ms"} <= set(stats)
        assert stats["p50_ms"] > 0
    finally:
        batcher.shutdown()


def test_hot_reload_swaps_index_without_downtime():
    """POST /reload loads a fresh retriever and swaps it in; queries
    before/after see the respective index states, /health reflects the
    new chunk count, and unconfigured reload returns 501."""
    import json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    import numpy as np

    from trueno_rag_tpu import MockEmbedder
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.retrieve import HybridRetriever
    from trueno_rag_tpu.serve import MicroBatcher, make_handler

    emb = MockEmbedder(dimension=32)

    def build(texts):
        r = HybridRetriever(emb)
        for i, t in enumerate(texts):
            r.index(Chunk(document_id="d", content=t, start_offset=0,
                          end_offset=len(t), metadata=ChunkMetadata(),
                          id=chunk_id_from_int(i),
                          embedding=np.asarray(emb.embed(t))))
        return r

    v1 = build(["old corpus entry about foxes"])
    v2 = build(["old corpus entry about foxes", "brand new entry about tpus"])
    batcher = MicroBatcher(v1, max_batch=4, max_wait_ms=2.0)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(batcher, lambda: v2))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=10) as resp:
            return json.loads(resp.read())

    try:
        out = post("/query", {"query": "tpus", "k": 3})
        assert all("tpus" not in r["content"] for r in out["results"])
        rel = post("/reload", {})
        assert rel["status"] == "reloaded" and rel["chunks"] == 2
        # the handler warms the incoming retriever BEFORE the swap
        # (ensure_ready): its device state must already be built so the
        # first post-swap request doesn't pay the upload/tier build
        assert not v2.vector_store._dirty
        assert v2.sparse_index._snap is not None
        out = post("/query", {"query": "tpus", "k": 3})
        assert any("tpus" in r["content"] for r in out["results"])
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=10) as resp:
            assert json.loads(resp.read())["chunks"] == 2
    finally:
        server.shutdown()
        batcher.shutdown()

    # unconfigured loader → 501
    batcher2 = MicroBatcher(v1, max_batch=2, max_wait_ms=2.0)
    server2 = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(batcher2))
    port2 = server2.server_address[1]
    threading.Thread(target=server2.serve_forever, daemon=True).start()
    try:
        import urllib.error

        try:
            post_url = f"http://127.0.0.1:{port2}/reload"
            req = urllib.request.Request(post_url, data=b"{}",
                                         headers={"Content-Type": "application/json"})
            urllib.request.urlopen(req, timeout=10)
            raise AssertionError("expected HTTP 501")
        except urllib.error.HTTPError as e:
            assert e.code == 501
    finally:
        server2.shutdown()
        batcher2.shutdown()


def test_one_bad_item_does_not_poison_the_microbatch():
    """Regression (review): a failing item in a coalesced batch must
    error alone; co-batched requests still get results."""
    import threading

    import numpy as np

    from trueno_rag_tpu import MockEmbedder
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.errors import QueryError
    from trueno_rag_tpu.retrieve import HybridRetriever
    from trueno_rag_tpu.serve import MicroBatcher

    emb = MockEmbedder(dimension=16)
    r = HybridRetriever(emb)
    for i in range(3):
        t = f"document number {i} content"
        r.index(Chunk(document_id="d", content=t, start_offset=0, end_offset=len(t),
                      metadata=ChunkMetadata(), id=chunk_id_from_int(i),
                      embedding=np.asarray(emb.embed(t))))

    real = r.retrieve_batch

    def sabotaged(queries, k, fusion=None, tag_filter=None):
        if len(queries) > 1:  # only the coalesced call explodes
            raise QueryError("batch-level failure")
        return real(queries, k, fusion=fusion, tag_filter=tag_filter)

    r.retrieve_batch = sabotaged
    batcher = MicroBatcher(r, max_batch=4, max_wait_ms=40.0)
    try:
        results, errors = {}, {}

        def run(name):
            try:
                results[name] = batcher.query("document content", k=2)
            except Exception as e:  # noqa: BLE001
                errors[name] = e

        threads = [threading.Thread(target=run, args=(f"q{i}",)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # coalesced call failed, but each item recovered individually
        assert not errors, errors
        assert all(results[f"q{i}"] for i in range(3))
    finally:
        batcher.shutdown()


def test_unknown_filter_key_fails_closed(server):
    """A typo'd filter key must be a 400, never a silent no-op filter
    that returns documents the caller meant to exclude."""
    status, data = _post(server + "/query",
                         {"query": "fox", "k": 2, "filter": {"anyof": ["x"]}})
    assert status == 400
    assert "anyof" in data["error"]


def test_bulk_queries_slice_to_max_batch(server):
    """Bulk requests larger than max_batch split into tuned-size device
    dispatches (no giant jit bucket, lock released between slices) with
    results in order."""
    qs = [f"fox number {i}" for i in range(23)]  # > max_batch=8 fixture
    status, data = _post(server + "/query", {"queries": qs, "k": 1})
    assert status == 200
    assert len(data["batches"]) == 23


def test_status_mapping():
    from trueno_rag_tpu.errors import QueryError
    from trueno_rag_tpu.serve import _status_for

    assert _status_for(TimeoutError("queue")) == 503
    assert _status_for(QueryError("bad")) == 400
    assert _status_for(ValueError("bad")) == 400
    assert _status_for(RuntimeError("device wedged")) == 500


# -- pipelined two-phase serving (r5) ----------------------------------------


def _compact_encoder_retriever(n=900, near_ties=True):
    """Compact-tier retriever with a JAX encoder (the two-phase split's
    home config); near-duplicate rows force certification failures so
    the collect side exercises the staged exact patch."""
    import numpy as np

    from trueno_rag_tpu.index import VectorStoreConfig
    from trueno_rag_tpu.models.encoder import EncoderConfig, JaxEncoderEmbedder
    from trueno_rag_tpu.retrieve import HybridRetrieverConfig

    emb = JaxEncoderEmbedder(config=EncoderConfig.tiny())
    retr = HybridRetriever(
        emb,
        config=HybridRetrieverConfig(candidates_per_source=10, fused=True),
        vector_config=VectorStoreConfig(
            dimension=emb.dimension, scan_tier="compact", scan_tile_n=1024,
        ),
    )
    rng = np.random.default_rng(5)
    texts = [f"{CORPUS[i % len(CORPUS)]} variant {i}" for i in range(n)]
    chunks = []
    for i, t in enumerate(texts):
        c = Chunk(document_id="d", content=t, start_offset=0,
                  end_offset=len(t), id=chunk_id_from_int(i))
        e = rng.standard_normal(emb.dimension).astype(np.float32)
        if near_ties and i >= n - 40:  # near-duplicates of row 0
            base = np.asarray(chunks[0].embedding, np.float32)
            e = base + rng.standard_normal(emb.dimension).astype(np.float32) * 1e-6
        c.set_embedding(e)
        chunks.append(c)
    retr.index_batch(chunks)
    return retr


def test_two_phase_submit_collect_matches_inline():
    retr = _compact_encoder_retriever()
    queries = ["fox forests", "tensor matrices", "data models"]
    inline = retr.retrieve_batch(queries, 5)
    handle = retr.retrieve_batch_submit(queries, 5)
    assert handle[0] == "fused_compact"  # the split actually engaged
    collected = retr.retrieve_batch_collect(handle)
    for a, b in zip(inline, collected):
        assert [r.chunk.id for r in a] == [r.chunk.id for r in b]
        for x, y in zip(a, b):
            assert x.fused_score == pytest.approx(y.fused_score, rel=1e-5)
    # the near-tie tail must have exercised the patch path at least once
    assert retr.vector_store.compact_uncertified >= 1


def test_two_phase_falls_back_inline_for_unsplittable_configs(retriever):
    # TF-IDF embedder: no fused program — submit completes inline
    handle = retriever.retrieve_batch_submit(["fox forests"], 3)
    assert handle[0] == "done"
    res = retriever.retrieve_batch_collect(handle)
    assert res and res[0]


def test_pipelined_microbatcher_matches_depth1():
    retr = _compact_encoder_retriever()
    queries = [f"fox forests {i}" for i in range(12)]
    base = MicroBatcher(retr, max_batch=4, max_wait_ms=50.0)
    piped = MicroBatcher(retr, max_batch=4, max_wait_ms=50.0,
                         pipeline_depth=2)
    try:
        want = base.retrieve_batch(queries, 4)

        results = [None] * len(queries)
        threads = []

        def go(i):
            results[i] = piped.query(queries[i], k=4, timeout=60.0)

        for i in range(len(queries)):
            t = threading.Thread(target=go, args=(i,))
            threads.append(t)
            t.start()
        for t in threads:
            t.join(timeout=60)
        for i in range(len(queries)):
            assert results[i] is not None
            assert [r.chunk.id for r in results[i]] == \
                [r.chunk.id for r in want[i][:4]]
        assert piped.queries_served == len(queries)
    finally:
        base.shutdown()
        piped.shutdown()


def test_pipelined_mutation_quiesces_inflight():
    """mutate() must not interleave with a batch between submit and
    collect — the patch would otherwise rescore rows the scan never
    saw. The drain gate also keeps new pipelined submits from starving
    the mutation."""
    import numpy as np

    retr = _compact_encoder_retriever()
    piped = MicroBatcher(retr, max_batch=4, max_wait_ms=20.0,
                         pipeline_depth=3)
    try:
        stop = threading.Event()
        errors = []

        def hammer():
            i = 0
            while not stop.is_set():
                try:
                    piped.query(f"fox forests {i}", k=3, timeout=60.0)
                except Exception as e:  # noqa: BLE001
                    errors.append(e)
                i += 1

        threads = [threading.Thread(target=hammer) for _ in range(3)]
        for t in threads:
            t.start()

        def add_chunk(r):
            c = Chunk(document_id="d", content="fresh ingest row",
                      start_offset=0, end_offset=16,
                      id=chunk_id_from_int(10_000))
            c.set_embedding(np.random.default_rng(0).standard_normal(
                r.embedder.dimension).astype(np.float32))
            r.index_batch([c])
            return len(r.registry)

        for _ in range(3):
            n = piped.mutate(add_chunk)
            assert n >= 901
        stop.set()
        for t in threads:
            t.join(timeout=60)
        assert not errors
        assert piped._inflight == 0
    finally:
        piped.shutdown()
