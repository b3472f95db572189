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
