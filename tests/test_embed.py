"""Embedder tests — mirrors the reference's embed.rs unit + proptest tiers:
determinism, dimension, normalization, prefix asymmetry, TF-IDF fit
semantics, similarity function contracts (embed.rs:310-342,1754-1790)."""

import numpy as np
import pytest
from hypothesis import example, given, settings, strategies as st

from trueno_rag_tpu import Document
from trueno_rag_tpu.chunking import RecursiveChunker
from trueno_rag_tpu.embed import (
    EmbeddingConfig,
    MockEmbedder,
    TfIdfEmbedder,
    cosine_similarity,
    dot_product,
    euclidean_distance,
    l2_normalize,
)
from trueno_rag_tpu.errors import EmbeddingError


def test_mock_deterministic_and_normalized():
    e = MockEmbedder(384)
    v1 = e.embed("hello world")
    v2 = e.embed("hello world")
    np.testing.assert_array_equal(v1, v2)
    assert v1.shape == (384,)
    assert v1.dtype == np.float32
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-5


def test_mock_distinct_texts_differ():
    e = MockEmbedder(64)
    assert not np.allclose(e.embed("aaa"), e.embed("bbb"))


def test_mock_unnormalized_range():
    e = MockEmbedder(128, EmbeddingConfig(normalize=False))
    v = e.embed("text")
    assert np.all(v >= -1.0) and np.all(v <= 1.0)


def test_prefix_asymmetry():
    cfg = EmbeddingConfig(query_prefix="query: ", document_prefix="passage: ")
    e = MockEmbedder(64, cfg)
    q = e.embed_query("dogs")
    d = e.embed_document("dogs")
    plain = e.embed("dogs")
    assert not np.allclose(q, d)
    assert not np.allclose(q, plain)
    np.testing.assert_array_equal(q, e.embed("query: dogs"))


def test_embed_batch_matches_single():
    e = MockEmbedder(32)
    batch = e.embed_batch(["a", "b", "c"])
    assert batch.shape == (3, 32)
    np.testing.assert_allclose(batch[1], e.embed("b"), rtol=1e-6)


def test_embed_chunks_sets_embeddings():
    e = MockEmbedder(48)
    doc = Document("some text here. " * 20)
    chunks = RecursiveChunker(chunk_size=64, overlap=0).chunk(doc)
    e.embed_chunks(chunks)
    for c in chunks:
        assert c.embedding is not None and c.embedding.shape == (48,)


def test_tfidf_requires_fit():
    e = TfIdfEmbedder(16)
    with pytest.raises(EmbeddingError):
        e.embed("anything")


def test_tfidf_fit_and_rank():
    corpus = [
        "the cat sat on the mat",
        "dogs chase the cat",
        "quantum physics of fields",
    ]
    e = TfIdfEmbedder(32).fit(corpus)
    q = e.embed("cat")
    sims = [cosine_similarity(q, e.embed(doc)) for doc in corpus]
    assert sims[0] > sims[2] and sims[1] > sims[2]
    # L2 normalized
    assert abs(np.linalg.norm(e.embed("cat sat")) - 1.0) < 1e-5


def test_tfidf_deterministic_refit():
    corpus = ["alpha beta gamma", "beta gamma delta", "gamma delta epsilon"]
    a = TfIdfEmbedder(8).fit(corpus)
    b = TfIdfEmbedder(8).fit(corpus)
    assert a.vocab == b.vocab
    np.testing.assert_array_equal(a.idf, b.idf)


def test_tfidf_state_dict_roundtrip():
    e = TfIdfEmbedder(8).fit(["one two three", "two three four"])
    e2 = TfIdfEmbedder.from_state_dict(e.state_dict())
    np.testing.assert_allclose(e.embed("two three"), e2.embed("two three"))


def test_similarity_contracts():
    assert cosine_similarity([1, 0], [1, 0]) == pytest.approx(1.0)
    assert cosine_similarity([1, 0], [0, 1]) == pytest.approx(0.0)
    assert cosine_similarity([1, 0], [1, 0, 0]) == 0.0  # len mismatch
    assert cosine_similarity([0, 0], [1, 0]) == 0.0  # zero norm
    assert dot_product([1, 2], [3, 4]) == pytest.approx(11.0)
    assert euclidean_distance([0, 0], [3, 4]) == pytest.approx(5.0)
    assert euclidean_distance([1], [1, 2]) == float("inf")


@settings(max_examples=30, deadline=None)
@given(text=st.text(min_size=0, max_size=200), dim=st.sampled_from([8, 64, 384]))
def test_property_mock_dimension_and_norm(text, dim):
    e = MockEmbedder(dim)
    v = e.embed(text)
    assert v.shape == (dim,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4


@settings(max_examples=30, deadline=None)
@example(vec=[0.0, 4.060484892852498e-22])  # denormal norm: f32 divide drifted
@given(
    vec=st.lists(st.floats(-10, 10, allow_nan=False), min_size=2, max_size=64),
)
def test_property_l2_normalize(vec):
    v = l2_normalize(np.asarray(vec, dtype=np.float32))
    n = np.linalg.norm(v)
    assert n == pytest.approx(1.0, abs=1e-3) or n == pytest.approx(0.0, abs=1e-6)
