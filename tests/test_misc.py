"""Coverage for the smaller surfaces: document model, error taxonomy,
profiling utils, device metrics extras, sharded euclidean, embedder
batch prefixes."""

import numpy as np
import pytest

from trueno_rag_tpu import Document, new_document_id
from trueno_rag_tpu.embed import EmbeddingConfig, MockEmbedder
from trueno_rag_tpu import errors as E


def test_document_builder_chain():
    d = Document("content").with_title("T").with_source("s.txt").with_metadata("k", 1)
    assert d.title == "T" and d.source == "s.txt" and d.metadata["k"] == 1
    d2 = Document.from_dict(d.to_dict())
    assert d2.id == d.id and d2.content == d.content and d2.metadata == d.metadata


def test_document_ids_unique():
    ids = {new_document_id() for _ in range(100)}
    assert len(ids) == 100
    assert Document("a").id != Document("a").id


def test_error_taxonomy_hierarchy():
    for exc in (
        E.EmptyDocumentError,
        E.ChunkTooLargeError(10, 5),
        E.DimensionMismatchError(3, 4),
        E.IndexNotFoundError("x"),
        E.VectorStoreError("x"),
        E.SerializationError("x"),
        E.InvalidConfigError("x"),
        E.QueryError("x"),
        E.EmbeddingError("x"),
    ):
        cls = exc if isinstance(exc, type) else type(exc)
        assert issubclass(cls, E.RagError)
    e = E.DimensionMismatchError(3, 4)
    assert e.expected == 3 and e.actual == 4
    c = E.ChunkTooLargeError(10, 5)
    assert c.size == 10 and c.limit == 5


def test_stage_timer():
    import time

    from trueno_rag_tpu.utils import StageTimer

    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("b"):
        time.sleep(0.005)
    with t.stage("a"):
        time.sleep(0.01)
    totals = t.totals()
    assert totals["a"] > totals["b"] > 0
    rep = t.report()
    assert "a" in rep and "calls" in rep
    t.reset()
    assert t.totals() == {}


def test_device_trace_smoke(tmp_path):
    import jax.numpy as jnp

    from trueno_rag_tpu.utils import device_trace

    with device_trace(str(tmp_path)):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    # trace directory written
    assert any(tmp_path.iterdir())


def test_device_metrics_f1_hitrate():
    from trueno_rag_tpu.metrics import f1_at_k, hit_rate_at_k
    from trueno_rag_tpu.ops.metrics import batched_metrics, pad_ids

    retrieved = [[1, 2, 3], [9, 8]]
    relevant = [[1, 7], [42]]
    dev = batched_metrics(pad_ids(retrieved, 4), pad_ids(relevant, 3), k_values=(3,))
    for i in range(2):
        r = [str(x) for x in retrieved[i]]
        rel = {str(x) for x in relevant[i]}
        assert float(dev["f1@3"][i]) == pytest.approx(f1_at_k(r, rel, 3), abs=1e-6)
        assert float(dev["hit_rate@3"][i]) == pytest.approx(hit_rate_at_k(r, rel, 3))


def test_sharded_euclidean_matches_oracle():
    import jax.numpy as jnp

    from trueno_rag_tpu.ops.dense import dense_topk_oracle
    from trueno_rag_tpu.parallel.mesh import create_mesh
    from trueno_rag_tpu.parallel.sharded import ShardedVectorIndex

    rng = np.random.default_rng(4)
    matrix = rng.standard_normal((96, 16)).astype(np.float32)
    mesh = create_mesh(data=8, model=1)
    idx = ShardedVectorIndex(matrix, mesh, metric="euclidean")
    q = rng.standard_normal((3, 16)).astype(np.float32)
    s, r = idx.search(q, 5)
    s_o, r_o = dense_topk_oracle(q, matrix, np.ones(96, bool), 5, "euclidean")
    np.testing.assert_array_equal(np.asarray(r), r_o)


def test_embedder_batch_prefixes():
    cfg = EmbeddingConfig(query_prefix="q: ", document_prefix="d: ")
    e = MockEmbedder(16, cfg)
    qs = e.embed_queries(["x", "y"])
    ds = e.embed_documents(["x", "y"])
    np.testing.assert_allclose(qs[0], e.embed("q: x"), atol=1e-6)
    np.testing.assert_allclose(ds[1], e.embed("d: y"), atol=1e-6)
    assert not np.allclose(qs[0], ds[0])


def test_cli_semantic_hf_dir(tmp_path):
    """CLI --model accepts a local HF checkpoint directory."""
    import json
    import subprocess
    import sys
    import os

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from safetensors.numpy import save_file

    cfg = dict(vocab_size=64, hidden_size=16, num_hidden_layers=1,
               num_attention_heads=2, intermediate_size=32,
               max_position_embeddings=32, pad_token_id=0, type_vocab_size=2)
    model = transformers.BertModel(transformers.BertConfig(**cfg))
    hf = tmp_path / "hf"
    hf.mkdir()
    save_file({k: v.numpy() for k, v in model.state_dict().items()}, str(hf / "model.safetensors"))
    (hf / "config.json").write_text(json.dumps(cfg))
    (hf / "vocab.txt").write_text("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "fox", "tpu"]))

    corpus = tmp_path / "docs"
    corpus.mkdir()
    (corpus / "a.txt").write_text("the fox and the tpu")
    out = tmp_path / "idx"

    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "trueno_rag_tpu.cli", "index", "--path", str(corpus),
         "--output", str(out), "--embedder", "semantic", "--model", str(hf)],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    q = subprocess.run(
        [sys.executable, "-m", "trueno_rag_tpu.cli", "query", "fox", "--index", str(out)],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert q.returncode == 0, q.stderr
    assert "a.txt" in q.stdout


def test_composite_reranker_duplicate_ids_do_not_double_count():
    """Regression (review r3): member scores for duplicated candidate
    ids accumulated into one entry, letting a duplicate outrank a
    genuinely better unique candidate."""
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.rerank import CompositeReranker
    from trueno_rag_tpu.retrieve import RetrievalResult

    class Fixed:
        def __init__(self, scores):
            self.scores = scores

        def rerank(self, query, candidates, top_k):
            out = []
            for r in candidates:
                rr = RetrievalResult(chunk=r.chunk,
                                     rerank_score=self.scores[r.chunk.id])
                out.append(rr)
            return out[:top_k]

    def res(i):
        c = Chunk(document_id="d", content=f"c{i}", start_offset=0,
                  end_offset=2, metadata=ChunkMetadata(),
                  id=chunk_id_from_int(i))
        return RetrievalResult(chunk=c)

    dup, unique = res(1), res(2)
    scores = {dup.chunk.id: 1.0, unique.chunk.id: 1.5}
    comp = CompositeReranker([Fixed(scores)])
    ranked = comp.rerank("q", [dup, dup, unique], 2)
    assert ranked[0].chunk.id == unique.chunk.id
    assert ranked[0].rerank_score == 1.5 and ranked[1].rerank_score == 1.0
