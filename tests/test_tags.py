"""Tag-filtered retrieval: registry vocabulary, device predicate
parity, exact filtered top-k, hybrid/pipeline wiring."""

import numpy as np
import pytest
import jax.numpy as jnp

from trueno_rag_tpu import Document, MockEmbedder, TagFilter, pipeline_builder
from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
from trueno_rag_tpu.errors import InvalidConfigError, QueryError
from trueno_rag_tpu.index.base import ChunkRegistry, IMPOSSIBLE_BIT, MAX_TAG_BITS
from trueno_rag_tpu.ops.tags import (
    dense_topk_tagged,
    filter_candidates_by_tags,
    tag_pred,
    tag_pred_oracle,
)
from trueno_rag_tpu.retrieve import HybridRetriever


def _chunk(i, content="text", emb=None, dim=16):
    if emb is None:
        emb = np.random.default_rng(i).standard_normal(dim).astype(np.float32)
    return Chunk(document_id="d", content=content, start_offset=0,
                 end_offset=len(content), metadata=ChunkMetadata(),
                 id=chunk_id_from_int(i), embedding=emb)


# -- registry vocabulary ------------------------------------------------------


def test_registry_tag_vocabulary_and_masks():
    reg = ChunkRegistry()
    c = _chunk(1)
    reg.add(c)
    reg.set_tags(c.id, ["lang:en", "src:web"])
    assert sorted(reg.tag_names_of(c.id)) == ["lang:en", "src:web"]
    row = reg.row_of(c.id)
    bits = reg.tags_of_row(row)
    assert bits == (reg.bit_for("lang:en") | reg.bit_for("src:web"))
    assert reg.bit_for("unknown", create=False) is None
    assert reg.mask_for(["lang:en", "missing"]) is None
    host = reg.tags_host(4)
    assert host.dtype == np.int32 and host[row] == bits


def test_registry_tag_vocabulary_cap():
    reg = ChunkRegistry()
    for i in range(MAX_TAG_BITS):
        assert reg.bit_for(f"t{i}") == 1 << i
    with pytest.raises(InvalidConfigError):
        reg.bit_for("one-too-many")
    # bit 31 stays reserved for the impossible-filter marker
    assert all(reg.bit_for(f"t{i}", create=False) != IMPOSSIBLE_BIT
               for i in range(MAX_TAG_BITS))


def test_tags_reset_on_remove_and_reuse():
    reg = ChunkRegistry()
    c = _chunk(1)
    reg.add(c)
    reg.set_tags(c.id, ["a"])
    reg.remove(c.id)
    c2 = _chunk(2)
    row = reg.add(c2)  # recycles the tombstoned row
    assert reg.tags_of_row(row) == 0


# -- device predicate vs oracle ----------------------------------------------


def test_tag_pred_matches_oracle():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2**31, size=64, dtype=np.int64).astype(np.int32)
    for trial in range(20):
        t_all, t_any, t_none = (
            int(rng.integers(0, 16)), int(rng.integers(0, 16)), int(rng.integers(0, 16))
        )
        got = np.asarray(tag_pred(
            jnp.asarray(bits), jnp.int32(t_all), jnp.int32(t_any), jnp.int32(t_none)
        ))
        want = [tag_pred_oracle(int(np.uint32(b)), t_all, t_any, t_none) for b in bits]
        assert got.tolist() == want


def test_dense_topk_tagged_is_exact_filtered_topk():
    rng = np.random.default_rng(1)
    n, d, bq, k = 500, 32, 4, 10
    m = rng.standard_normal((n, d)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    q = rng.standard_normal((bq, d)).astype(np.float32)
    bits = rng.integers(0, 8, size=n).astype(np.int32)
    valid = np.ones(n, bool)
    t_all = np.array([1, 0, 2, 4], np.int32)
    t_any = np.array([0, 6, 0, 0], np.int32)
    t_none = np.array([0, 0, 1, 0], np.int32)
    s_got, r_got = dense_topk_tagged(
        jnp.asarray(q), jnp.asarray(m), jnp.asarray(valid), jnp.asarray(bits),
        jnp.asarray(t_all), jnp.asarray(t_any), jnp.asarray(t_none), k,
    )
    from trueno_rag_tpu.ops.dense import dense_topk_oracle

    for i in range(bq):
        allow = np.array([
            tag_pred_oracle(int(b), int(t_all[i]), int(t_any[i]), int(t_none[i]))
            for b in bits
        ])
        s_ref, r_ref = dense_topk_oracle(q[i : i + 1], m, allow, k)
        np.testing.assert_array_equal(np.asarray(r_got[i]), r_ref[0])


def test_compact_tagged_scan_certified_sets_are_exact_filtered():
    """Tags through the compact scan kernel (masking BEFORE selection):
    certified queries must return exactly the filtered oracle top-k SET,
    no disallowed row may ever appear (certified or not), and a query
    whose allowed set is smaller than k certifies a short result."""
    from trueno_rag_tpu.ops.dense_tiered import (
        dense_topk_compact_bf16r, prepare_residual, prepare_tiered)

    rng = np.random.default_rng(2)
    n, d, bq, k = 4096, 32, 12, 10
    m = rng.standard_normal((n, d)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    q = rng.standard_normal((bq, d)).astype(np.float32)
    bits = rng.integers(0, 8, size=n).astype(np.int32)
    bits[100] |= 8  # exactly one row carries bit3
    valid = np.ones(n, bool)
    t_all = np.zeros(bq, np.int32)
    t_any = np.zeros(bq, np.int32)
    t_none = np.zeros(bq, np.int32)
    t_all[0], t_none[1], t_any[2] = 1, 2, 6
    t_all[3] = 8  # allowed set = {100} < k: the short-result rule
    mb, el, al = prepare_tiered(jnp.asarray(m))
    ri, rs, e2 = prepare_residual(jnp.asarray(m))
    s, r, ok = dense_topk_compact_bf16r(
        jnp.asarray(q), mb, el, al, ri, rs, e2, jnp.asarray(valid), k,
        interpret=True,
        tags=(jnp.asarray(bits), jnp.asarray(t_all), jnp.asarray(t_any),
              jnp.asarray(t_none)),
    )
    s, r, ok = np.asarray(s), np.asarray(r), np.asarray(ok)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    scores = m.astype(np.float64) @ qn.T.astype(np.float64)
    n_cert = 0
    for i in range(bq):
        allow = np.array([
            tag_pred_oracle(int(b), int(t_all[i]), int(t_any[i]), int(t_none[i]))
            for b in bits
        ])
        got = [int(x) for x in r[i] if x >= 0]
        assert all(allow[row] for row in got), i  # no leak, ever
        masked = np.where(allow, scores[:, i], -np.inf)
        want = set(np.argsort(-masked, kind="stable")[: min(k, allow.sum())])
        if ok[i]:
            n_cert += 1
            assert set(got) == want, i
    assert n_cert > 0
    # the short-result query returns exactly its one allowed row
    assert [int(x) for x in r[3] if x >= 0] == [100]
    assert ok[3], "allowed set smaller than k should certify (short rule)"


def test_filter_candidates_compacts_and_orders():
    bits = jnp.asarray(np.array([0b01, 0b10, 0b11, 0b00], np.int32))
    rows = jnp.asarray(np.array([[2, 0, 1, 3, -1]], np.int32))
    scores = jnp.asarray(np.array([[4.0, 3.0, 2.0, 1.0, -np.inf]], np.float32))
    r, s = filter_candidates_by_tags(
        rows, scores, bits,
        jnp.asarray([0b01]), jnp.asarray([0]), jnp.asarray([0]),
    )
    # rows 2 (11) and 0 (01) carry bit0; order stays score desc
    assert np.asarray(r)[0].tolist() == [2, 0, -1, -1, -1]
    assert np.asarray(s)[0][:2].tolist() == [4.0, 3.0]


# -- hybrid + pipeline --------------------------------------------------------


def _tagged_retriever():
    emb = MockEmbedder(dimension=32)
    r = HybridRetriever(emb)
    texts = {
        "en": ["the quick brown fox jumps", "a lazy dog sleeps soundly"],
        "de": ["der schnelle braune fuchs", "ein fauler hund schlaeft"],
    }
    i = 0
    for lang, docs in texts.items():
        for t in docs:
            c = _chunk(i, content=t, emb=np.asarray(emb.embed(t)))
            r.index(c, tags=[f"lang:{lang}", "src:test"])
            i += 1
    return r


def test_hybrid_retrieve_with_tag_filter():
    r = _tagged_retriever()
    res = r.retrieve("quick brown fox", k=4, tag_filter=TagFilter(all=("lang:en",)))
    assert res
    for item in res:
        assert "lang:en" in r.registry.tag_names_of(item.chunk.id)
    # exclude filter
    res = r.retrieve("fox", k=4, tag_filter=TagFilter(none=("lang:en",)))
    for item in res:
        assert "lang:de" in r.registry.tag_names_of(item.chunk.id)


def test_unknown_tag_in_all_returns_empty_known_in_none_is_noop():
    r = _tagged_retriever()
    assert r.retrieve("fox", k=4, tag_filter=TagFilter(all=("nope",))) == []
    res = r.retrieve("fox", k=4, tag_filter=TagFilter(none=("nope",)))
    assert res  # unknown excluded tag excludes nothing


def test_per_query_filters_in_one_batch():
    r = _tagged_retriever()
    out = r.retrieve_batch(
        ["fox", "fox"], k=4,
        tag_filter=[TagFilter(all=("lang:en",)), TagFilter(all=("lang:de",))],
    )
    assert out[0] and out[1]
    assert all("lang:en" in r.registry.tag_names_of(x.chunk.id) for x in out[0])
    assert all("lang:de" in r.registry.tag_names_of(x.chunk.id) for x in out[1])
    with pytest.raises(QueryError):
        r.retrieve_batch(["a", "b", "c"], k=2, tag_filter=[TagFilter()] * 2)


def test_pipeline_tagged_index_and_filtered_query():
    pipe = pipeline_builder().build()
    pipe.index_document(Document("alpha beta gamma delta", title="one"),
                        tags=["tenant:a"])
    pipe.index_document(Document("alpha beta epsilon zeta", title="two"),
                        tags=["tenant:b"])
    res = pipe.query("alpha beta", k=4, tag_filter=TagFilter(all=("tenant:a",)))
    assert res
    reg = pipe.retriever.registry
    assert all("tenant:a" in reg.tag_names_of(x.chunk.id) for x in res)
    ctx = pipe.query_with_context("alpha beta", k=2,
                                  tag_filter=TagFilter(all=("tenant:b",)))
    assert all("two" == c.title for c in ctx.citations)


def test_dense_only_and_sparse_only_filters():
    from trueno_rag_tpu.retrieve import HybridRetrieverConfig

    emb = MockEmbedder(dimension=32)
    for use_dense, use_sparse in ((True, False), (False, True)):
        r = HybridRetriever(
            emb,
            config=HybridRetrieverConfig(use_dense=use_dense, use_sparse=use_sparse),
        )
        for i, (t, lang) in enumerate([("alpha beta", "en"), ("alpha beta", "de")]):
            c = _chunk(100 + i, content=t, emb=np.asarray(emb.embed(t + lang)))
            r.index(c, tags=[f"lang:{lang}"])
        res = r.retrieve("alpha beta", k=2, tag_filter=TagFilter(all=("lang:de",)))
        assert len(res) == 1
        assert "lang:de" in r.registry.tag_names_of(res[0].chunk.id)


def test_tags_round_trip_through_persistence(tmp_path):
    """Filters must keep working after save/load — vocabulary and
    per-row masks travel in the artifact (v1 and streaming v2)."""
    from trueno_rag_tpu.persist import load_index, save_index, save_index_streaming

    r = _tagged_retriever()
    emb = r.embedder
    for name, saver in (("v1", save_index), ("v2", save_index_streaming)):
        path = str(tmp_path / f"idx_{name}.trag")
        saver(path, r, embedder_info={"kind": "mock"})
        loaded, _ = load_index(path, emb)
        res = loaded.retrieve("fox", k=4, tag_filter=TagFilter(all=("lang:de",)))
        assert res, name
        assert all("lang:de" in loaded.registry.tag_names_of(x.chunk.id) for x in res), name
        assert loaded.retrieve("fox", k=4, tag_filter=TagFilter(all=("missing",))) == []


def test_serving_microbatcher_mixes_filtered_and_unfiltered():
    """Concurrent filtered + unfiltered queries coalesce into one
    device batch and each gets its own filter semantics."""
    import threading

    from trueno_rag_tpu.serve import MicroBatcher

    r = _tagged_retriever()
    batcher = MicroBatcher(r, max_batch=8, max_wait_ms=30.0)
    try:
        results = {}

        def run(name, flt):
            results[name] = batcher.query("fox", k=4, tag_filter=flt)

        threads = [
            threading.Thread(target=run, args=("en", TagFilter(all=("lang:en",)))),
            threading.Thread(target=run, args=("de", TagFilter(all=("lang:de",)))),
            threading.Thread(target=run, args=("open", None)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all("lang:en" in r.registry.tag_names_of(x.chunk.id) for x in results["en"])
        assert all("lang:de" in r.registry.tag_names_of(x.chunk.id) for x in results["de"])
        assert results["open"]  # unfiltered sees everything
        langs = {t for x in results["open"] for t in r.registry.tag_names_of(x.chunk.id)}
        assert "lang:en" in langs and "lang:de" in langs
    finally:
        batcher.shutdown()


def test_http_api_accepts_filters():
    import json
    import threading
    import urllib.request

    from http.server import ThreadingHTTPServer

    from trueno_rag_tpu.serve import MicroBatcher, make_handler

    r = _tagged_retriever()
    batcher = MicroBatcher(r, max_batch=4, max_wait_ms=2.0)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(batcher))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        def post(payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/query",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=10) as resp:
                return json.loads(resp.read())

        out = post({"query": "fox", "k": 4, "filter": {"all": ["lang:de"]}})
        assert out["results"]
        assert all("fuchs" in res["content"] or "hund" in res["content"]
                   for res in out["results"])
        out = post({"queries": ["fox", "fox"], "k": 4,
                    "filters": [{"all": ["lang:en"]}, {"all": ["lang:de"]}]})
        assert out["batches"][0] and out["batches"][1]
    finally:
        server.shutdown()
        batcher.shutdown()


def test_sharded_hybrid_tag_filter_matches_single_host():
    """Tag filters on the 8-device sharded index must equal the
    single-host filtered retriever exactly (global rows)."""

    from trueno_rag_tpu.parallel.hybrid import ShardedHybridIndex
    from trueno_rag_tpu.parallel.mesh import create_mesh

    r = _tagged_retriever()
    mesh = create_mesh()
    idx = ShardedHybridIndex(r, mesh)
    flt = TagFilter(all=("lang:de",))
    sharded = idx.search("fox schnelle", k=4, tag_filter=flt)
    single = r.retrieve("fox schnelle", k=4, tag_filter=flt)
    assert [x.chunk.id for x in sharded] == [x.chunk.id for x in single]
    assert sharded  # non-empty
    # incremental refresh propagates new tags
    import numpy as np

    emb = r.embedder
    c = _chunk(99, content="noch ein fuchs text hier", emb=np.asarray(emb.embed("noch ein fuchs text hier")))
    r.index(c, tags=["lang:de"])
    idx.refresh(rows=[r.registry.row_of(c.id)])
    refreshed = idx.search("fuchs", k=6, tag_filter=flt)
    assert any(x.chunk.id == c.id for x in refreshed)


def test_cli_index_query_with_tags(tmp_path):
    """Black-box: index with --tags/--tag-by-dir, query with filters."""
    import json
    import os
    import subprocess
    import sys

    corpus = tmp_path / "corpus"
    (corpus / "animals").mkdir(parents=True)
    (corpus / "tech").mkdir()
    (corpus / "animals" / "fox.txt").write_text(
        "The quick brown fox jumps over the lazy dog in the forest.")
    (corpus / "tech" / "tpu.txt").write_text(
        "Tensor processing units multiply matrices in systolic arrays.")
    out = tmp_path / "idx"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "PYTHONPATH": repo_root, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, "-m", "trueno_rag_tpu.cli", "index",
         "--path", str(corpus), "--output", str(out),
         "--tags", "corpus:test", "--tag-by-dir", "--dimension", "64"],
        capture_output=True, text=True, env=env, timeout=180,
    )
    assert r.returncode == 0, r.stderr
    q = subprocess.run(
        [sys.executable, "-m", "trueno_rag_tpu.cli", "query", "fox matrices",
         "--index", str(out), "--format", "json", "--filter-all", "dir:tech"],
        capture_output=True, text=True, env=env, timeout=180,
    )
    assert q.returncode == 0, q.stderr
    results = json.loads(q.stdout)
    assert results and all("matrices" in res["content"] for res in results)
    q2 = subprocess.run(
        [sys.executable, "-m", "trueno_rag_tpu.cli", "query", "fox",
         "--index", str(out), "--format", "json", "--filter-none", "dir:tech"],
        capture_output=True, text=True, env=env, timeout=180,
    )
    assert q2.returncode == 0, q2.stderr
    results2 = json.loads(q2.stdout)
    assert results2 and all("fox" in res["content"] for res in results2)


def test_fused_encoder_path_with_tag_filter_matches_staged():
    """With a JAX encoder the filter rides the single fused program;
    results must equal the staged (two-dispatch) filtered path."""
    from trueno_rag_tpu.models.encoder import EncoderConfig, JaxEncoderEmbedder
    from trueno_rag_tpu.retrieve import HybridRetrieverConfig

    cfg = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=1,
                        num_heads=2, mlp_dim=64, max_len=24)
    emb = JaxEncoderEmbedder(config=cfg)
    texts = [("quick brown fox jumps", "en"), ("lazy dog sleeps", "en"),
             ("schneller brauner fuchs", "de"), ("fauler hund schlaeft", "de")]

    def build(fused):
        r = HybridRetriever(emb, config=HybridRetrieverConfig(fused=fused))
        for i, (t, lang) in enumerate(texts):
            c = _chunk(50 + i, content=t, emb=np.asarray(emb.embed(t)), dim=32)
            r.index(c, tags=[f"lang:{lang}"])
        return r

    r_fused, r_staged = build(True), build(False)
    flt = TagFilter(all=("lang:de",))
    a = r_fused.retrieve_batch(["fox fuchs", "dog hund"], k=3, tag_filter=flt)
    b = r_staged.retrieve_batch(["fox fuchs", "dog hund"], k=3, tag_filter=flt)
    for qa, qb in zip(a, b):
        assert [x.chunk.id for x in qa] == [x.chunk.id for x in qb]
        assert qa and all(
            "lang:de" in r_fused.registry.tag_names_of(x.chunk.id) for x in qa
        )
