"""Ingest-time near-duplicate detection: device/oracle parity and
pipeline integration."""

import numpy as np
import pytest
import jax.numpy as jnp

from trueno_rag_tpu import Document, pipeline_builder
from trueno_rag_tpu.errors import InvalidConfigError
from trueno_rag_tpu.ops.dedup import near_duplicates, near_duplicates_oracle


@pytest.mark.parametrize("seed", [0, 1])
def test_near_duplicates_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    corpus = rng.standard_normal((40, 16)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    valid = np.ones(40, bool)
    valid[5:8] = False
    batch = rng.standard_normal((12, 16)).astype(np.float32)
    batch[3] = corpus[10] * 2.0  # exact duplicate of corpus row 10 (scaled)
    batch[7] = batch[2] + 0.001 * rng.standard_normal(16).astype(np.float32)
    batch[9] = corpus[6] * 1.5  # duplicate of an INVALID row: must not count
    got = near_duplicates(jnp.asarray(batch), jnp.asarray(corpus),
                          jnp.asarray(valid), threshold=0.95)
    want = near_duplicates_oracle(batch, corpus, valid, threshold=0.95)
    np.testing.assert_array_equal(np.asarray(got[0]), want[0])
    np.testing.assert_array_equal(np.asarray(got[1]), want[1])
    np.testing.assert_allclose(np.asarray(got[2]), want[2], atol=1e-5)
    is_dup, dup_of, _ = want
    assert is_dup[3] and dup_of[3] == 10
    assert is_dup[7] and dup_of[7] == -(2 + 2)  # batch entry 2
    assert not is_dup[9]  # tombstoned corpus rows never match


def test_near_duplicates_empty_corpus_and_first_wins():
    rng = np.random.default_rng(2)
    batch = rng.standard_normal((4, 8)).astype(np.float32)
    batch[1] = batch[0]
    got = near_duplicates(jnp.asarray(batch), jnp.zeros((0, 8), np.float32),
                          jnp.zeros((0,), bool), threshold=0.99)
    is_dup = np.asarray(got[0])
    assert not is_dup[0] and is_dup[1]  # first occurrence survives


def test_pipeline_dedup_skips_reingested_document():
    pipe = pipeline_builder().with_dedup(0.97).build()
    doc = Document("alpha beta gamma delta epsilon zeta eta theta")
    n1 = pipe.index_document(doc)
    assert n1 > 0 and pipe.duplicates_skipped == 0
    n2 = pipe.index_document(Document(doc.content))  # same content, new id
    assert n2 == 0
    assert pipe.duplicates_skipped == n1
    assert len(pipe.retriever.registry) == n1
    # distinct content still ingests
    n3 = pipe.index_document(Document("a completely different subject entirely"))
    assert n3 > 0


def test_pipeline_dedup_within_one_bulk_batch_keeps_tags_aligned():
    pipe = pipeline_builder().with_dedup(0.97).build()
    docs = [
        Document("identical content repeated verbatim here"),
        Document("identical content repeated verbatim here"),
        Document("something else entirely different text"),
    ]
    n = pipe.index_documents(docs, tags=[["t:a"], ["t:b"], ["t:c"]])
    assert pipe.duplicates_skipped == 1
    reg = pipe.retriever.registry
    tag_sets = [tuple(reg.tag_names_of(cid)) for cid in reg.ids()]
    # the surviving duplicate carries the FIRST document's tag
    assert ("t:a",) in tag_sets and ("t:c",) in tag_sets
    assert ("t:b",) not in tag_sets
    assert n == len(reg)


def test_builder_rejects_bad_threshold():
    with pytest.raises(InvalidConfigError):
        pipeline_builder().with_dedup(0.0)
    with pytest.raises(InvalidConfigError):
        pipeline_builder().with_dedup(1.5)


def test_dedup_correct_with_dot_metric_unnormalized_rows():
    """Regression (review): with metric='dot' the store keeps raw rows;
    dedup must normalize them for its cosine check — a large-norm
    non-duplicate row must NOT swallow incoming chunks, and a true
    duplicate must still be caught."""
    import numpy as np

    from trueno_rag_tpu import Document, MockEmbedder, RagPipelineBuilder
    from trueno_rag_tpu.index.vector_store import VectorStoreConfig
    from trueno_rag_tpu.rerank import NoOpReranker

    emb = MockEmbedder(dimension=32)
    pipe = (RagPipelineBuilder().with_embedder(emb).with_reranker(NoOpReranker())
            .with_vector_config(VectorStoreConfig(dimension=32, metric="dot"))
            .with_dedup(0.97).build())
    n1 = pipe.index_document(Document("first document about foxes and hounds"))
    assert n1 > 0
    # distinct content: must NOT be flagged (raw rows would inflate sims)
    n2 = pipe.index_document(Document("totally different topic entirely here"))
    assert n2 > 0 and pipe.duplicates_skipped == 0
    # true duplicate still detected
    n3 = pipe.index_document(Document("first document about foxes and hounds"))
    assert n3 == 0 and pipe.duplicates_skipped == n1
