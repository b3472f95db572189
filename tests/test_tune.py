"""Serving autotuner: measurement-driven, semantics-preserving."""

import pytest

from trueno_rag_tpu.chunking import RecursiveChunker
from trueno_rag_tpu.document import Document
from trueno_rag_tpu.embed import MockEmbedder
from trueno_rag_tpu.retrieve import HybridRetriever
from trueno_rag_tpu.tune import TuneResult, autotune_serving, calibration_queries

TEXTS = [
    "JAX compiles array programs to TPU via the XLA compiler toolchain.",
    "BM25 ranks documents with term frequency and inverse document frequency.",
    "Hybrid retrieval fuses dense vector search with sparse lexical search.",
    "Context assembly fits retrieved chunks into a model token budget.",
]


@pytest.fixture(scope="module")
def retriever():
    emb = MockEmbedder(dimension=32)
    r = HybridRetriever(emb)
    chunker = RecursiveChunker(chunk_size=64, overlap=8)
    for t in TEXTS * 4:
        doc = Document(t)
        chunks = chunker.chunk(doc)
        emb.embed_chunks(chunks)
        r.index_batch(chunks)
    return r


def test_calibration_queries_use_corpus_terms(retriever):
    qs = calibration_queries(retriever, 8, seed=1)
    assert len(qs) == 8
    corpus_words = set(w for t in TEXTS for w in t.split())
    assert any(w in corpus_words for q in qs for w in q.split())


def test_autotune_picks_a_candidate_and_fills_table(retriever):
    res = autotune_serving(retriever, k=3, batch_sizes=(1, 2, 4), iters=2)
    assert isinstance(res, TuneResult)
    assert res.max_batch in (1, 2, 4)
    assert [p.batch_size for p in res.table] == [1, 2, 4]
    assert all(p.p50_ms > 0 and p.qps > 0 for p in res.table)
    assert res.max_wait_ms == pytest.approx(
        0.3 * next(p for p in res.table if p.batch_size == res.max_batch).p50_ms
    )
    d = res.as_dict()
    assert d["max_batch"] == res.max_batch and len(d["table"]) == 3


def test_autotune_latency_budget_filters(retriever):
    res = autotune_serving(retriever, k=3, batch_sizes=(1, 2), iters=2,
                           latency_budget_ms=1e9)
    assert res.max_batch in (1, 2)
    # impossible budget: falls back to the single fastest point
    res2 = autotune_serving(retriever, k=3, batch_sizes=(1, 2), iters=2,
                            latency_budget_ms=1e-9)
    assert res2.max_batch in (1, 2)


def test_autotune_rejects_bad_inputs(retriever):
    from trueno_rag_tpu.errors import InvalidConfigError

    with pytest.raises(InvalidConfigError):
        autotune_serving(retriever, batch_sizes=())
    with pytest.raises(InvalidConfigError):
        autotune_serving(retriever, batch_sizes=(0,), iters=1)


def test_run_server_auto_wires_tuned_values(retriever, monkeypatch):
    """max_batch='auto' must calibrate and hand the tuned values to the
    MicroBatcher (captured via a stub server so nothing binds a port)."""
    import trueno_rag_tpu.serve as serve_mod

    captured = {}

    class FakeServer:
        def __init__(self, addr, handler):
            captured["addr"] = addr

        def serve_forever(self):
            raise KeyboardInterrupt

        def server_close(self):
            pass

    real_batcher = serve_mod.MicroBatcher

    def spy_batcher(retr, max_batch, max_wait_ms):
        captured["max_batch"] = max_batch
        captured["max_wait_ms"] = max_wait_ms
        return real_batcher(retr, max_batch=max_batch, max_wait_ms=max_wait_ms)

    monkeypatch.setattr(serve_mod, "RagHTTPServer", FakeServer)
    monkeypatch.setattr(serve_mod, "MicroBatcher", spy_batcher)
    import trueno_rag_tpu.tune as tune_mod

    monkeypatch.setattr(
        tune_mod, "autotune_serving",
        lambda r, k=5, latency_budget_ms=None: tune_mod.TuneResult(
            max_batch=16, max_wait_ms=2.5
        ),
    )
    serve_mod.run_server(retriever, port=0, max_batch="auto")
    assert captured["max_batch"] == 16
    assert captured["max_wait_ms"] == 2.5


def test_autotune_sweeps_probe_tiles_on_clustered_store():
    """Clustered stores also tune the probe budget; the winner is
    installed on the live config and the table is reported. Results
    stay exact at every candidate (host patch), so the knob is
    semantics-preserving like the others."""
    import numpy as np

    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.index.vector_store import VectorStoreConfig

    rng = np.random.default_rng(41)
    dim, n = 32, 4096
    centers = rng.standard_normal((4, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    m = centers[np.repeat(np.arange(4), n // 4)] + 0.05 * rng.standard_normal(
        (n, dim)
    ).astype(np.float32)
    emb = MockEmbedder(dimension=dim)
    r = HybridRetriever(
        emb,
        vector_config=VectorStoreConfig(
            dimension=dim, scan_tier="clustered", scan_tile_n=1024,
            cluster_probe_tiles=2,
        ),
    )
    chunks = []
    for i in range(n):
        c = Chunk(document_id="d", content=f"term{i % 37} item {i}",
                  start_offset=0, end_offset=4, metadata=ChunkMetadata(),
                  id=chunk_id_from_int(i))
        c.set_embedding(m[i])
        chunks.append(c)
    r.index_batch(chunks)

    res = autotune_serving(r, k=3, batch_sizes=(1, 2), iters=1,
                           probe_tiles=(1, 2, 4))
    assert res.probe_tiles in (1, 2, 4)
    assert len(res.probe_table) == 3
    assert r.vector_store.config.cluster_probe_tiles == res.probe_tiles
    assert "probe_table" in res.as_dict()


def test_autotune_skips_probe_sweep_on_plain_store(retriever):
    res = autotune_serving(retriever, k=3, batch_sizes=(1, 2), iters=1)
    assert res.probe_tiles is None and res.probe_table == []


def test_calibration_sees_token_retriever_registry():
    """LateInteractionRetriever exposes the store's registry so
    calibration queries sample real corpus words (not the constant
    fallback string)."""
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.models.encoder import EncoderConfig
    from trueno_rag_tpu.models.late_interaction import LateInteractionRetriever

    r = LateInteractionRetriever(config=EncoderConfig.tiny(), max_len=8)
    chunks = [
        Chunk(document_id="d", content=f"quokka{i} marsupial habitat",
              start_offset=0, end_offset=7, metadata=ChunkMetadata(),
              id=chunk_id_from_int(i))
        for i in range(6)
    ]
    r.index_batch(chunks)
    assert r.registry is r.store.registry and len(r.registry) == 6
    qs = calibration_queries(r, 4, seed=0)
    assert any("quokka" in w for q in qs for w in q.split())


def test_autotune_sweeps_token_rescore():
    """A token retriever on a certified tier gets a rescore-budget
    sweep; the winner installs into the store config and results stay
    exact (fail-closed fallback) at every candidate."""
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.index.token_store import TokenStoreConfig
    from trueno_rag_tpu.models.encoder import EncoderConfig
    from trueno_rag_tpu.models.late_interaction import LateInteractionRetriever

    cfg = EncoderConfig.tiny()
    r = LateInteractionRetriever(
        config=cfg, max_len=8,
        store_config=TokenStoreConfig(
            hidden_dim=cfg.hidden_dim, max_tokens=8, scan="tiered",
            scan_kernel="xla",
        ),
    )
    chunks = [
        Chunk(document_id="d", content=f"topic{i % 5} clause {i} of text",
              start_offset=0, end_offset=5, metadata=ChunkMetadata(),
              id=chunk_id_from_int(i))
        for i in range(24)
    ]
    r.index_batch(chunks)
    res = autotune_serving(r, k=3, batch_sizes=(1, 2), iters=1,
                           rescore=(4, 8))
    assert res.rescore in (4, 8)
    assert [p.rescore for p in res.rescore_table] == [4, 8]
    assert r.store.config.rescore == res.rescore
    assert "rescore_table" in res.as_dict()


def test_autotune_skips_rescore_on_exact_token_store():
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.models.encoder import EncoderConfig
    from trueno_rag_tpu.models.late_interaction import LateInteractionRetriever

    cfg = EncoderConfig.tiny()
    r = LateInteractionRetriever(config=cfg, max_len=8)
    chunks = [
        Chunk(document_id="d", content=f"item {i}", start_offset=0,
              end_offset=4, metadata=ChunkMetadata(), id=chunk_id_from_int(i))
        for i in range(6)
    ]
    r.index_batch(chunks)
    res = autotune_serving(r, k=2, batch_sizes=(1,), iters=1)
    assert res.rescore is None and res.rescore_table == []
