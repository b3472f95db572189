"""Multi-process serving: SO_REUSEPORT HTTP workers + device IPC.

The workers are real subprocesses running serve_worker.py as a
standalone script (no package import, no JAX); the device side is a
DeviceIPCServer over the shared MicroBatcher. Responses must match the
single-process HTTP surface exactly (same JSON schema, same error
codes) — the topology is an implementation detail of scale."""

import json
import threading
import urllib.error
import urllib.request

import pytest

from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
from trueno_rag_tpu.embed import TfIdfEmbedder
from trueno_rag_tpu.retrieve import HybridRetriever
from trueno_rag_tpu.serve import MicroBatcher, MultiProcessServer

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "machine learning models process large data sets",
    "foxes are clever wild animals living in forests",
    "tensor processing units multiply matrices quickly",
]


def _build_retriever():
    emb = TfIdfEmbedder(32).fit(CORPUS)
    retr = HybridRetriever(emb)
    chunks = []
    for i, t in enumerate(CORPUS):
        c = Chunk(document_id="d", content=t, start_offset=0, end_offset=len(t),
                  metadata=ChunkMetadata(title=f"t{i}"), id=chunk_id_from_int(i))
        c.set_embedding(emb.embed_document(t))
        chunks.append(c)
    retr.index_batch(chunks)
    retr.retrieve_batch(["warmup"], 3)
    return retr


@pytest.fixture(scope="module")
def mp_server():
    retr = _build_retriever()
    batcher = MicroBatcher(retr, max_batch=8, max_wait_ms=2.0)
    srv = MultiProcessServer(batcher, "127.0.0.1", 0, workers=2,
                             index_loader=_build_retriever)
    yield f"http://127.0.0.1:{srv.port}", retr
    srv.stop()
    batcher.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:  # 4xx/5xx still carry JSON bodies
        return e.code, json.loads(e.read())


def test_workers_health(mp_server):
    url, _ = mp_server
    with urllib.request.urlopen(url + "/health", timeout=10) as resp:
        data = json.loads(resp.read())
    assert data["status"] == "ok"
    assert data["chunks"] == 4
    # supervisor state surfaces through the pool (r4: a dead/given-up
    # self-heal must be operator-visible, not a silent daemon death)
    assert data["respawns"] == 0
    assert data["respawn_gave_up"] is None


def test_workers_query_matches_direct_retrieval(mp_server):
    url, retr = mp_server
    status, data = _post(url + "/query", {"query": "clever fox", "k": 2})
    assert status == 200
    assert len(data["results"]) == 2
    direct = retr.retrieve("clever fox", 2)
    # same rows, same scores, full single-process JSON schema
    assert [r["chunk_id"] for r in data["results"]] == [d.chunk.id for d in direct]
    for got, want in zip(data["results"], direct):
        assert got["score"] == pytest.approx(want.best_score())
        assert got["content"] == want.chunk.content
        assert {"score", "dense_score", "sparse_score", "fused_score",
                "rerank_score", "chunk_id", "document_id", "title",
                "content"} == set(got)


def test_workers_batch_query(mp_server):
    url, _ = mp_server
    status, data = _post(url + "/query", {"queries": ["fox", "tensor units"], "k": 1})
    assert status == 200
    assert len(data["batches"]) == 2
    assert "fox" in data["batches"][0][0]["content"]
    assert "tensor" in data["batches"][1][0]["content"].lower()


def test_workers_error_codes(mp_server):
    url, _ = mp_server
    status, data = _post(url + "/query", {"query": "   ", "k": 2})
    assert status == 400 and "error" in data
    status, data = _post(url + "/query", {"k": 2})
    assert status == 400 and "missing" in data["error"]
    status, _ = _post(url + "/nope", {})
    assert status == 404


def test_workers_reload(mp_server):
    url, _ = mp_server
    status, data = _post(url + "/reload", {})
    assert status == 200
    assert data["status"] == "reloaded"
    assert data["chunks"] == 4
    # still serving after the swap
    status, data = _post(url + "/query", {"query": "fox", "k": 1})
    assert status == 200 and len(data["results"]) == 1


def test_workers_exit_when_device_process_dies():
    """Workers must not outlive the device side (verified failure: a
    SIGTERMed parent left workers listening on the port). The lifeline
    connection's EOF — here triggered by DeviceIPCServer.close(), in
    production by the device process dying any way at all — makes each
    worker exit on its own."""
    import time

    retr = _build_retriever()
    batcher = MicroBatcher(retr, max_batch=8, max_wait_ms=2.0)
    srv = MultiProcessServer(batcher, "127.0.0.1", 0, workers=2)
    try:
        assert srv.poll_dead() == []
        srv.ipc.close()  # simulate device-side death
        deadline = time.time() + 10
        while time.time() < deadline and len(srv.poll_dead()) < 2:
            time.sleep(0.1)
        assert len(srv.poll_dead()) == 2
    finally:
        srv.stop()
        batcher.shutdown()


def test_workers_concurrent_queries_coalesce(mp_server):
    url, _ = mp_server
    results = [None] * 12
    def go(i):
        q = "fox forests" if i % 2 else "tensor matrices"
        results[i] = _post(url + "/query", {"query": q, "k": 2})

    threads = [threading.Thread(target=go, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert all(r is not None and r[0] == 200 and len(r[1]["results"]) == 2
               for r in results)
    for i, (_, data) in enumerate(results):
        want = "fox" if i % 2 else "tensor"
        assert want in data["results"][0]["content"].lower()


def test_worker_crash_respawns_automatically():
    """A SIGKILLed worker must be replaced by the supervisor with no
    operator action, and the HTTP surface must keep serving (r2
    verdict: detection without recovery was the gap)."""
    import time

    retr = _build_retriever()
    batcher = MicroBatcher(retr, max_batch=8, max_wait_ms=2.0)
    srv = MultiProcessServer(batcher, "127.0.0.1", 0, workers=2,
                             respawn_interval=0.1)
    url = f"http://127.0.0.1:{srv.port}"
    try:
        victim = srv.procs[0]
        victim.kill()  # simulated crash (OOM-killer class)
        deadline = time.time() + 15
        while time.time() < deadline and srv.respawns < 1:
            time.sleep(0.05)
        assert srv.respawns >= 1, "supervisor never respawned the worker"
        assert srv.poll_dead() == []
        status, data = _post(url + "/query", {"query": "fox", "k": 2})
        assert status == 200 and data["results"]
    finally:
        srv.stop()
        batcher.shutdown()


def test_supervisor_stops_respawning_after_device_death():
    """Once the device side is closed, dead workers must NOT be
    respawned (their lifeline would be dead on arrival)."""
    import time

    retr = _build_retriever()
    batcher = MicroBatcher(retr, max_batch=8, max_wait_ms=2.0)
    srv = MultiProcessServer(batcher, "127.0.0.1", 0, workers=2,
                             respawn_interval=0.1)
    try:
        srv.ipc.close()
        deadline = time.time() + 10
        while time.time() < deadline and len(srv.poll_dead()) < 2:
            time.sleep(0.1)
        assert len(srv.poll_dead()) == 2
        before = srv.respawns
        time.sleep(0.5)
        assert srv.respawns == before
    finally:
        srv.stop()
        batcher.shutdown()


def test_mutation_under_load_no_ghost_rows():
    """Ingest/remove through MicroBatcher.mutate while queries stream
    from other threads: queries never error, and a query issued after
    a remove completes never returns the removed chunk."""
    import time

    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int

    emb = TfIdfEmbedder(32).fit(CORPUS + ["rotating churn chunk data"])
    retr = HybridRetriever(emb)
    chunks = []
    for i, t in enumerate(CORPUS * 3):
        c = Chunk(document_id="d", content=t + f" v{i}", start_offset=0,
                  end_offset=len(t), metadata=ChunkMetadata(),
                  id=chunk_id_from_int(i))
        c.set_embedding(emb.embed_document(c.content))
        chunks.append(c)
    retr.index_batch(chunks)
    batcher = MicroBatcher(retr, max_batch=8, max_wait_ms=1.0)
    errors: list = []
    stop = threading.Event()

    def reader(i):
        while not stop.is_set():
            try:
                batcher.query("fox data matrices", k=4, timeout=30.0)
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                return

    threads = [threading.Thread(target=reader, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    try:
        for round_ in range(10):
            victim = chunks[round_ % len(chunks)]

            def rm(r, cid=victim.id):
                return r.remove(cid)

            assert batcher.mutate(rm)
            res = batcher.query("fox data matrices", k=8, timeout=30.0)
            got_ids = [r.chunk.id for r in res]
            assert victim.id not in got_ids, f"ghost row after remove ({round_})"

            def add(r, c=victim):
                c2 = Chunk(document_id="d", content=c.content, start_offset=0,
                           end_offset=c.end_offset, metadata=ChunkMetadata(),
                           id=c.id)
                c2.set_embedding(emb.embed_document(c.content))
                r.index(c2)
                return True

            assert batcher.mutate(add)
        time.sleep(0.2)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=10)
        batcher.shutdown()
    assert not errors, errors
