"""Encoder model tests: forward-pass invariants (padding invariance,
pooling, normalization), embedder integration, checkpoint round-trip.
Mirrors the reference's hardware-gated FastEmbedder/Nemotron test tier
(embed.rs:1498-1749): architecture paths run unconditionally on tiny
configs; no weight downloads needed."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trueno_rag_tpu.embed import EmbeddingConfig, PoolingStrategy
from trueno_rag_tpu.models.encoder import (
    EncoderConfig,
    HashTokenizer,
    JaxEncoderEmbedder,
    encoder_forward,
    init_encoder_params,
)

CFG = EncoderConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return init_encoder_params(jax.random.PRNGKey(0), CFG)


def test_forward_shape_and_norm(params):
    ids = jnp.asarray(np.random.default_rng(0).integers(3, CFG.vocab_size, (4, 16), dtype=np.int32))
    out = encoder_forward(params, ids, CFG)
    assert out.shape == (4, CFG.hidden_dim)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-4)


def test_forward_deterministic(params):
    ids = jnp.asarray([[1, 5, 9, 2, 0, 0, 0, 0]], dtype=jnp.int32)
    a = np.asarray(encoder_forward(params, ids, CFG))
    b = np.asarray(encoder_forward(params, ids, CFG))
    np.testing.assert_array_equal(a, b)


def test_padding_invariance(params):
    """Extra PAD tokens must not change the pooled embedding (mask-aware
    attention + pooling)."""
    short = jnp.asarray([[1, 10, 20, 30, 2, 0, 0, 0]], dtype=jnp.int32)
    longer = jnp.pad(short, ((0, 0), (0, 8)))
    a = np.asarray(encoder_forward(params, short, CFG))
    b = np.asarray(encoder_forward(params, longer, CFG))
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_pooling_strategies_differ(params):
    import dataclasses

    ids = jnp.asarray([[1, 10, 20, 30, 40, 2, 0, 0]], dtype=jnp.int32)
    outs = {}
    for pooling in ["mean", "cls", "last_token", "weighted_mean"]:
        cfg = dataclasses.replace(CFG, pooling=pooling)
        outs[pooling] = np.asarray(encoder_forward(params, ids, cfg))
    assert not np.allclose(outs["mean"], outs["cls"])
    assert not np.allclose(outs["mean"], outs["last_token"])
    assert not np.allclose(outs["mean"], outs["weighted_mean"])


def test_unnormalized_config(params):
    import dataclasses

    cfg = dataclasses.replace(CFG, normalize=False)
    ids = jnp.asarray([[1, 7, 2, 0]], dtype=jnp.int32)
    out = np.asarray(encoder_forward(params, ids, cfg))
    assert abs(np.linalg.norm(out[0]) - 1.0) > 1e-3  # not normalized


def test_hash_tokenizer():
    tok = HashTokenizer(vocab_size=512, max_len=32)
    a = tok.encode("hello world")
    b = tok.encode("hello world")
    assert a == b
    assert a[0] == 1 and a[-1] == 2  # CLS ... SEP
    assert all(3 <= t < 512 for t in a[1:-1])
    batch = tok.encode_batch(["one two", "three four five six"])
    assert batch.shape[0] == 2 and batch.shape[1] % 16 == 0
    assert batch.dtype == np.int32


def test_tokenizer_truncation():
    tok = HashTokenizer(vocab_size=512, max_len=8)
    ids = tok.encode("a b c d e f g h i j k l m n o p")
    assert len(ids) <= 8


def test_embedder_integration():
    emb = JaxEncoderEmbedder(config=CFG, seed=0)
    assert emb.dimension == CFG.hidden_dim
    v = emb.embed("the quick brown fox")
    assert v.shape == (CFG.hidden_dim,)
    batch = emb.embed_batch(["a", "b", "c"])
    assert batch.shape == (3, CFG.hidden_dim)
    np.testing.assert_allclose(batch[0], emb.embed("a"), atol=1e-5)
    # same text -> same embedding; different -> different
    np.testing.assert_allclose(emb.embed("x y z"), emb.embed("x y z"), atol=1e-6)
    assert not np.allclose(emb.embed("x"), emb.embed("completely different"))


def test_embedder_prefixes():
    cfg = EmbeddingConfig(query_prefix="q: ", document_prefix="d: ")
    emb = JaxEncoderEmbedder(config=CFG, embedding_config=cfg)
    assert not np.allclose(emb.embed_query("dogs"), emb.embed_document("dogs"))


def test_embedder_pooling_override():
    cfg = EmbeddingConfig(pooling=PoolingStrategy.CLS)
    emb = JaxEncoderEmbedder(config=CFG, embedding_config=cfg)
    assert emb.encoder_config.pooling == "cls"


def test_embedder_in_pipeline():
    from trueno_rag_tpu import Document, RagPipelineBuilder, NoOpReranker, RecursiveChunker

    emb = JaxEncoderEmbedder(config=CFG)
    p = (
        RagPipelineBuilder()
        .with_embedder(emb)
        .with_reranker(NoOpReranker())
        .with_chunker(RecursiveChunker(chunk_size=100, overlap=10))
        .build()
    )
    p.index_document(Document("alpha beta gamma. delta epsilon zeta. " * 5, title="T"))
    res = p.query("alpha beta", k=2)
    assert res and res[0].chunk.metadata.title == "T"


def test_checkpoint_roundtrip(tmp_path, params):
    emb = JaxEncoderEmbedder(config=CFG, params=params, model_name="test-model")
    path = str(tmp_path / "enc.safetensors")
    emb.save_checkpoint(path)
    emb2 = JaxEncoderEmbedder.load_checkpoint(path, config=CFG)
    assert emb2.model_id == "test-model"
    np.testing.assert_allclose(emb.embed("roundtrip"), emb2.embed("roundtrip"), atol=1e-6)
