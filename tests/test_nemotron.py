"""Nemotron-class decoder + cross-encoder tests (tiny configs, real
architecture — unlike the reference whose GGUF path skips attention,
embed.rs:806-841)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trueno_rag_tpu.models.nemotron import (
    NEMOTRON_QUERY_PREFIX,
    NemotronConfig,
    NemotronEmbedder,
    init_nemotron_params,
    nemotron_forward,
)
from trueno_rag_tpu.models.cross_encoder import CrossEncoderReranker
from trueno_rag_tpu.models.encoder import EncoderConfig

CFG = NemotronConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return init_nemotron_params(jax.random.PRNGKey(0), CFG)


def test_forward_shape_and_norm(params):
    ids = jnp.asarray(np.random.default_rng(0).integers(3, CFG.vocab_size, (2, 12), dtype=np.int32))
    out = nemotron_forward(params, ids, CFG)
    assert out.shape == (2, CFG.hidden_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-4)


def test_causality_prefix_invariance(params):
    """Causal attention: hidden state at position t must not depend on
    tokens after t. Pool at the same position with different suffixes."""
    base = [1, 10, 20, 30]
    a = jnp.asarray([base + [0, 0]], dtype=jnp.int32)  # pads after
    b = jnp.asarray([base + [40, 50]], dtype=jnp.int32)  # real tokens after
    # last VALID token of `a` is position 3; forward pools last token, so
    # compare a's pooled state against b truncated at the same position
    b_trunc = jnp.asarray([base], dtype=jnp.int32)
    out_a = np.asarray(nemotron_forward(params, a, CFG))
    out_b = np.asarray(nemotron_forward(params, b_trunc, CFG))
    np.testing.assert_allclose(out_a, out_b, atol=2e-3)


def test_asymmetric_prefixes():
    emb = NemotronEmbedder(config=CFG)
    assert emb.config.query_prefix == NEMOTRON_QUERY_PREFIX
    assert emb.config.document_prefix == ""
    q = emb.embed_query("what is a fox")
    d = emb.embed_document("what is a fox")
    assert not np.allclose(q, d)


def test_model_identity_and_dimension():
    emb = NemotronEmbedder(config=CFG)
    assert emb.model_id == "nvidia/NV-Embed-v2"
    assert emb.dimension == CFG.hidden_dim
    full = NemotronConfig.full()
    assert full.hidden_dim == 4096 and full.max_len == 8192


def test_batching_consistency():
    emb = NemotronEmbedder(config=CFG, batch_size=2)
    texts = [f"document number {i}" for i in range(5)]
    batch = emb.embed_batch(texts)
    assert batch.shape == (5, CFG.hidden_dim)
    single = emb.embed(texts[3])
    np.testing.assert_allclose(batch[3], single, atol=1e-4)


def test_checkpoint_roundtrip(tmp_path):
    emb = NemotronEmbedder(config=CFG)
    p = str(tmp_path / "nem.safetensors")
    emb.save_checkpoint(p)
    emb2 = NemotronEmbedder.load_checkpoint(p, config=CFG)
    np.testing.assert_allclose(emb.embed("same text"), emb2.embed("same text"), atol=1e-6)


# ------------------------------------------------------ cross-encoder ----


def _mk_results():
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.retrieve import RetrievalResult

    texts = ["fox jumps over dog", "pasta recipe with basil", "foxes in the forest"]
    return [
        RetrievalResult(
            chunk=Chunk(
                document_id="d",
                content=t,
                start_offset=0,
                end_offset=len(t),
                metadata=ChunkMetadata(),
                id=chunk_id_from_int(i),
            ),
            fused_score=0.5,
        )
        for i, t in enumerate(texts)
    ]


def test_cross_encoder_shapes_and_protocol():
    rr = CrossEncoderReranker(config=EncoderConfig.tiny())
    cands = _mk_results()
    out = rr.rerank("fox in forest", cands, top_k=2)
    assert len(out) == 2
    assert all(r.rerank_score is not None for r in out)
    assert all(0.0 <= r.rerank_score <= 1.0 for r in out)
    # deterministic
    out2 = rr.rerank("fox in forest", cands, top_k=2)
    assert [r.chunk.id for r in out] == [r.chunk.id for r in out2]


def test_cross_encoder_scores_differ_by_pair():
    rr = CrossEncoderReranker(config=EncoderConfig.tiny())
    s = rr.score_batch("fox", ["fox jumps", "totally different content here"])
    assert s.shape == (2,)
    assert s[0] != s[1]


def test_cross_encoder_in_pipeline():
    from trueno_rag_tpu import Document, RagPipelineBuilder, RecursiveChunker, TfIdfEmbedder

    docs = [Document("alpha beta gamma delta", title="A"), Document("epsilon zeta eta theta", title="B")]
    emb = TfIdfEmbedder(16).fit([d.content for d in docs])
    p = (
        RagPipelineBuilder()
        .with_embedder(emb)
        .with_reranker(CrossEncoderReranker(config=EncoderConfig.tiny()))
        .with_chunker(RecursiveChunker(chunk_size=100, overlap=10))
        .build()
    )
    p.index_documents(docs)
    res = p.query("alpha beta", k=2)
    assert res and res[0].rerank_score is not None


def test_nemotron_in_pipeline():
    from trueno_rag_tpu import Document, NoOpReranker, RagPipelineBuilder, RecursiveChunker

    emb = NemotronEmbedder(config=CFG, batch_size=4)
    p = (
        RagPipelineBuilder()
        .with_embedder(emb)
        .with_reranker(NoOpReranker())
        .with_chunker(RecursiveChunker(chunk_size=120, overlap=10))
        .build()
    )
    p.index_documents([
        Document("alpha beta gamma delta words", title="A"),
        Document("epsilon zeta eta theta words", title="B"),
    ])
    res = p.query("alpha beta", k=2)
    assert res and res[0].rerank_score is None
    assert res[0].fused_score is not None
