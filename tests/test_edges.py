"""Edge-coverage tier: serialization frames, tokenizer options, chunk
dict round-trips, fusion config edge cases, strategy errors."""

import numpy as np
import pytest

from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, ChunkingStrategy, chunk_id_from_int
from trueno_rag_tpu.errors import InvalidConfigError, SerializationError
from trueno_rag_tpu.fusion import FusionStrategy
from trueno_rag_tpu.persist import Compression, deserialize_compressed, serialize_compressed
from trueno_rag_tpu.text import STOPWORDS, tokenize, tokenize_simple


def test_tokenize_options():
    text = "The Fox-Trot: a 2-step dance!"
    assert tokenize(text) == ["fox", "trot", "step", "dance"]
    # keep stopwords
    assert "the" in tokenize(text, stopwords=None)
    # min_len=1 keeps single chars/digits
    assert "2" in tokenize(text, stopwords=None, min_len=1)
    assert tokenize_simple("A-B c") == ["a", "b", "c"]
    assert "the" in STOPWORDS and "fox" not in STOPWORDS


def test_chunk_dict_roundtrip_with_embedding():
    c = Chunk(
        document_id="doc",
        content="hello world",
        start_offset=0,
        end_offset=11,
        metadata=ChunkMetadata(title="T", headers=["H"], page=2, custom={"k": 1}),
        id=chunk_id_from_int(5),
    )
    c.set_embedding(np.arange(4, dtype=np.float32))
    c2 = Chunk.from_dict(c.to_dict())
    assert c2.id == c.id and c2.content == c.content
    assert c2.metadata.headers == ["H"] and c2.metadata.page == 2
    np.testing.assert_array_equal(c2.embedding, c.embedding)
    # token estimate floor
    assert Chunk("d", "ab", 0, 2).token_estimate() >= 1


def test_chunking_strategy_unknown_kind():
    with pytest.raises(InvalidConfigError):
        ChunkingStrategy("bogus", {}).build()
    with pytest.raises(InvalidConfigError):
        ChunkingStrategy.semantic().build()  # needs an embedder


def test_serialize_none_codec_frame():
    blob = serialize_compressed({"x": 1}, Compression.NONE)
    assert deserialize_compressed(blob) == {"x": 1}


def test_deserialize_truncated_payload():
    blob = serialize_compressed({"x": "y" * 100})
    with pytest.raises(SerializationError):
        deserialize_compressed(blob[: len(blob) // 2])


def test_fusion_device_param_mapping():
    assert FusionStrategy.rrf(30).device_param == 30.0
    assert FusionStrategy.linear(0.7).device_param == 0.7
    assert FusionStrategy.convex(0.2).device_param == 0.2
    assert FusionStrategy.dbsf().device_param == 0.0


def test_fusion_empty_lists():
    for strat in [FusionStrategy.rrf(), FusionStrategy.linear(0.5),
                  FusionStrategy.dbsf(), FusionStrategy.union(),
                  FusionStrategy.intersection()]:
        assert strat.fuse([], []) == []
    assert FusionStrategy.rrf().fuse([(1, 0.5)], []) == [(1, pytest.approx(1 / 61))]
    assert FusionStrategy.intersection().fuse([(1, 0.5)], []) == []


def test_registry_recycles_rows_and_replaces():
    from trueno_rag_tpu.index import ChunkRegistry

    reg = ChunkRegistry()
    a = Chunk("d", "a", 0, 1, id=chunk_id_from_int(1))
    b = Chunk("d", "b", 0, 1, id=chunk_id_from_int(2))
    r_a = reg.add(a)
    r_b = reg.add(b)
    assert reg.remove(a.id) == r_a
    c = Chunk("d", "c", 0, 1, id=chunk_id_from_int(3))
    assert reg.add(c) == r_a  # freed row recycled
    # re-adding an existing id keeps the row, swaps the chunk
    b2 = Chunk("d", "b-new", 0, 5, id=chunk_id_from_int(2))
    assert reg.add(b2) == r_b
    assert reg.get_chunk(b.id).content == "b-new"
    assert reg.id_of(999) is None and reg.chunk_of(999) is None


def test_blockwise_topk_small_and_padded():
    import jax.numpy as jnp

    from trueno_rag_tpu.ops.dense import blockwise_topk

    # N smaller than one block, k larger than N
    scores = jnp.asarray([[0.5, 0.9, -jnp.inf, 0.1]])
    s, r = blockwise_topk(scores, k=6)
    s, r = np.asarray(s[0]), np.asarray(r[0])
    assert list(r[:3]) == [1, 0, 3]
    assert np.isneginf(s[3:]).all()
    assert (r[3:] == -1).all()


def test_dense_topk_approx_checked_matches_oracle():
    """Certified-approx selection must equal the exact path: random
    corpora, tombstones, and adversarial boundary ties (fail-closed)."""
    import numpy as np
    import jax.numpy as jnp

    from trueno_rag_tpu.ops.dense import (
        dense_topk,
        dense_topk_approx,
        dense_topk_approx_checked,
    )

    rng = np.random.default_rng(7)
    for n, d, bq, k in ((5000, 48, 6, 10), (1000, 32, 3, 50), (300, 16, 2, 7)):
        m = rng.standard_normal((n, d)).astype(np.float32)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        q = rng.standard_normal((bq, d)).astype(np.float32)
        valid = np.ones(n, bool)
        valid[n // 7 : n // 5] = False
        s_c, r_c, _ = dense_topk_approx_checked(
            jnp.asarray(q), jnp.asarray(m), jnp.asarray(valid), k
        )
        s_x, r_x = dense_topk(jnp.asarray(q), jnp.asarray(m), jnp.asarray(valid), k)
        np.testing.assert_array_equal(np.asarray(r_c), np.asarray(r_x))
        np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_x), rtol=0, atol=0)

    # adversarial: duplicated rows create exact ties at the boundary;
    # certification must fail rather than mis-order
    m = rng.standard_normal((1000, 24)).astype(np.float32)
    m[400:420] = m[0]
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    q = jnp.asarray(m[0][None, :].copy())
    valid = jnp.ones(1000, bool)
    s_t, r_t, ok = dense_topk_approx(q, jnp.asarray(m), valid, 5)
    assert not bool(np.asarray(ok).all())  # ties defeat the strict certificate
    s_c, r_c, fb = dense_topk_approx_checked(q, jnp.asarray(m), valid, 5)
    assert fb
    s_x, r_x = dense_topk(q, jnp.asarray(m), valid, 5)
    np.testing.assert_array_equal(np.asarray(r_c), np.asarray(r_x))
