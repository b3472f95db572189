"""Property tests over the device paths: randomized corpora through the
full BM25 device pipeline vs the scalar host oracle, randomized chunker
invariants for the remaining chunkers (reference proptest tier,
property_tests.rs)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from trueno_rag_tpu.chunking import (
    Chunk,
    ChunkMetadata,
    ParagraphChunker,
    SentenceChunker,
    StructuralChunker,
    chunk_id_from_int,
)
from trueno_rag_tpu.document import Document
from trueno_rag_tpu.errors import EmptyDocumentError
from trueno_rag_tpu.index import BM25Index

WORD = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "fox", "data", "index", "rank",
     "query", "model", "tpu", "chip", "the", "of", "and"]
)


@settings(max_examples=15, deadline=None)
@given(
    docs=st.lists(st.lists(WORD, min_size=1, max_size=20).map(" ".join), min_size=1, max_size=12),
    query=st.lists(WORD, min_size=1, max_size=4).map(" ".join),
    data=st.data(),
)
def test_property_bm25_device_matches_oracle(docs, query, data):
    idx = BM25Index()
    for i, text in enumerate(docs):
        idx.add(Chunk(document_id="d", content=text, start_offset=0,
                      end_offset=len(text), metadata=ChunkMetadata(),
                      id=chunk_id_from_int(i)))
    k = data.draw(st.integers(1, 15))
    host = idx.search_host(query, k)
    dev = idx.search(query, k)
    # Tie-tolerant contract: results may differ only among exactly tied
    # scores (cumsum-difference fp noise breaks exact ties into
    # near-ties; the reference's unstable sort gives no tie order
    # either). Every device result must be a legitimate member of the
    # tie-extended host top-k, counts match, scores match pairwise.
    assert len(dev) == len(host)
    for (_, s1), (_, s2) in zip(dev, host):
        assert s1 == pytest.approx(s2, rel=1e-4, abs=1e-5)
    if host:
        full = dict(idx.search_host(query, len(docs)))
        cutoff = host[-1][1]
        for c, s in dev:
            assert c in full
            assert full[c] >= cutoff - 1e-4 * max(1.0, abs(cutoff)), (c, full[c], cutoff)


@settings(max_examples=30, deadline=None)
@given(text=st.text(min_size=1, max_size=800))
def test_property_sentence_chunker_invariants(text):
    ch = SentenceChunker(max_sentences=3, overlap=1)
    doc = Document(text)
    if not text.strip():
        with pytest.raises(EmptyDocumentError):
            ch.chunk(doc)
        return
    chunks = ch.chunk(doc)
    assert chunks
    for c in chunks:
        assert c.content == text[c.start_offset : c.end_offset]
        assert c.content.strip()


@settings(max_examples=30, deadline=None)
@given(
    paras=st.lists(st.text(alphabet="abc XYZ.", min_size=1, max_size=60), min_size=1, max_size=8),
    group=st.integers(1, 4),
)
def test_property_paragraph_chunker_invariants(paras, group):
    text = "\n\n".join(paras)
    doc = Document(text)
    ch = ParagraphChunker(max_paragraphs=group)
    if not text.strip():
        with pytest.raises(EmptyDocumentError):
            ch.chunk(doc)
        return
    chunks = ch.chunk(doc)
    for c in chunks:
        assert c.content == text[c.start_offset : c.end_offset]
    # all non-empty paragraphs covered
    joined = "\n\n".join(c.content for c in chunks)
    for p in paras:
        if p.strip():
            assert p.strip() in joined or p.strip() in text


@settings(max_examples=25, deadline=None)
@given(
    sections=st.lists(
        st.tuples(st.integers(1, 3), st.text(alphabet="ab c", min_size=1, max_size=30),
                  st.text(alphabet="xyz w.", min_size=1, max_size=120)),
        min_size=1, max_size=5,
    )
)
def test_property_structural_chunker_invariants(sections, ):
    text = "\n".join(f"{'#' * lvl} {title.strip() or 'T'}\n{body}" for lvl, title, body in sections)
    doc = Document(text)
    ch = StructuralChunker(max_section_size=80)
    if not text.strip():
        return
    chunks = ch.chunk(doc)
    assert chunks
    for c in chunks:
        assert c.content == text[c.start_offset : c.end_offset]
        assert len(c.content) <= 80 + 50  # max_section + inner overlap


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 60),
    seed=st.integers(0, 5),
    k=st.integers(1, 12),
)
def test_property_dense_store_matches_oracle(n, seed, k):
    from trueno_rag_tpu.index import VectorStore, VectorStoreConfig
    from trueno_rag_tpu.ops.dense import dense_topk_oracle

    rng = np.random.default_rng(seed)
    store = VectorStore(VectorStoreConfig(dimension=16, initial_capacity=8))
    embs = rng.standard_normal((n, 16)).astype(np.float32)
    for i in range(n):
        c = Chunk(document_id="d", content=f"c{i}", start_offset=0, end_offset=2,
                  metadata=ChunkMetadata(), id=chunk_id_from_int(i))
        c.set_embedding(embs[i])
        store.insert(c)
    q = rng.standard_normal(16).astype(np.float32)
    got = store.search(q, k)
    norms = np.linalg.norm(embs, axis=1, keepdims=True)
    normed = embs / np.where(norms == 0, 1, norms)
    s_o, r_o = dense_topk_oracle(q[None, :], normed, np.ones(n, bool), min(k, n))
    want = [(chunk_id_from_int(int(r)), float(s)) for s, r in zip(s_o[0], r_o[0]) if r >= 0]
    assert [c for c, _ in got] == [c for c, _ in want]
    for (_, s1), (_, s2) in zip(got, want):
        assert s1 == pytest.approx(s2, abs=1e-5)


@given(
    bits=st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=40),
    t_all=st.integers(0, 255),
    t_any=st.integers(0, 255),
    t_none=st.integers(0, 255),
)
@settings(max_examples=40, deadline=None)
def test_tag_pred_device_equals_oracle_property(bits, t_all, t_any, t_none):
    import jax.numpy as jnp
    import numpy as np

    from trueno_rag_tpu.ops.tags import tag_pred, tag_pred_oracle

    arr = np.asarray(bits, dtype=np.int64).astype(np.int32)
    got = np.asarray(
        tag_pred(jnp.asarray(arr), jnp.int32(t_all), jnp.int32(t_any), jnp.int32(t_none))
    )
    want = [tag_pred_oracle(int(np.uint32(b)), t_all, t_any, t_none) for b in arr]
    assert got.tolist() == want


@given(
    n=st.integers(2, 30),
    m=st.integers(1, 10),
    d=st.sampled_from([4, 8]),
    thr=st.floats(0.5, 0.999),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=25, deadline=None)
def test_near_duplicates_device_equals_oracle_property(n, m, d, thr, seed):
    import jax.numpy as jnp
    import numpy as np

    from trueno_rag_tpu.ops.dedup import near_duplicates, near_duplicates_oracle

    rng = np.random.default_rng(seed)
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.maximum(np.linalg.norm(corpus, axis=1, keepdims=True), 1e-9)
    valid = rng.random(n) < 0.8
    batch = rng.standard_normal((m, d)).astype(np.float32)
    if m >= 2 and rng.random() < 0.5:
        batch[-1] = batch[0]  # plant an in-batch duplicate
    got = near_duplicates(jnp.asarray(batch), jnp.asarray(corpus),
                          jnp.asarray(valid), threshold=float(np.float32(thr)))
    want = near_duplicates_oracle(batch, corpus, valid, threshold=float(np.float32(thr)))
    got_dup = np.asarray(got[0])
    # scores within an ulp of the threshold may flip is_dup between
    # device/host reduction orders; assert agreement away from the edge
    margin = np.abs(want[2] - np.float32(thr)) > 1e-5
    assert (got_dup[margin] == want[0][margin]).all()
