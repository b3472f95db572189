"""Sharded MaxSim retrieval on the 8-virtual-device mesh: exact parity
with the host oracle and the single-chip TokenVectorStore."""

import numpy as np
import pytest

from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
from trueno_rag_tpu.index import TokenStoreConfig, TokenVectorStore
from trueno_rag_tpu.ops.maxsim import maxsim_scan_oracle
from trueno_rag_tpu.ops.tags import tag_pred_oracle
from trueno_rag_tpu.parallel.maxsim import ShardedTokenIndex
from trueno_rag_tpu.parallel.mesh import create_mesh


def build(n, lt, h, b, lq, seed, ragged=True):
    rng = np.random.default_rng(seed)
    tok = rng.standard_normal((n, lt, h)).astype(np.float32)
    tok /= np.linalg.norm(tok, axis=2, keepdims=True)
    if ragged:
        lens = rng.integers(1, lt + 1, size=n)
        tm = np.arange(lt)[None, :] < lens[:, None]
    else:
        tm = np.ones((n, lt), bool)
    q = rng.standard_normal((b, lq, h)).astype(np.float32)
    q /= np.linalg.norm(q, axis=2, keepdims=True)
    qm = np.ones((b, lq), bool)
    valid = np.ones(n, bool)
    valid[n // 6 : n // 4] = False
    return tok, tm, q, qm, valid


@pytest.mark.parametrize("n", [491, 512])  # non-divisible + divisible by 8
def test_sharded_maxsim_matches_oracle(n):
    tok, tm, q, qm, valid = build(n, 5, 16, 4, 3, seed=n)
    mesh = create_mesh(data=8, model=1)
    idx = ShardedTokenIndex(tok, tm, mesh, valid=valid, tokens_normalized=True)
    s, r = idx.search(q, qm, k=9)
    s_o, r_o = maxsim_scan_oracle(q, qm, tok, tm, valid, 9)
    np.testing.assert_array_equal(r, r_o)
    finite = np.isfinite(s_o)
    np.testing.assert_allclose(s[finite], s_o[finite], atol=1e-5, rtol=1e-5)


def test_sharded_maxsim_tagged_matches_filtered_oracle():
    tok, tm, q, qm, valid = build(300, 4, 16, 3, 3, seed=3)
    rng = np.random.default_rng(0)
    tags = rng.integers(0, 8, size=300).astype(np.int32)  # bits 0-2
    mesh = create_mesh(data=8, model=1)
    idx = ShardedTokenIndex(
        tok, tm, mesh, valid=valid, tokens_normalized=True, tags=tags
    )
    t_all = np.array([1, 0, 2], np.int32)  # per-query require-all words
    t_any = np.array([0, 4, 0], np.int32)
    t_none = np.array([0, 0, 1], np.int32)
    s, r = idx.search_tagged(q, t_all, t_any, t_none, qm, k=7)
    for b in range(3):
        allowed = valid & np.array(
            [tag_pred_oracle(int(t), int(t_all[b]), int(t_any[b]), int(t_none[b]))
             for t in tags]
        )
        s_o, r_o = maxsim_scan_oracle(
            q[b : b + 1], qm[b : b + 1], tok, tm, allowed, 7
        )
        np.testing.assert_array_equal(r[b], r_o[0])


def test_sharded_matches_single_chip_store():
    rng = np.random.default_rng(5)
    store = TokenVectorStore(
        TokenStoreConfig(hidden_dim=12, max_tokens=4, initial_capacity=8)
    )
    for i in range(100):
        l = int(rng.integers(1, 5))
        t = rng.standard_normal((l, 12)).astype(np.float32)
        c = Chunk(document_id="d", content=f"c{i}", start_offset=0, end_offset=2,
                  metadata=ChunkMetadata(title=""), id=chunk_id_from_int(i))
        store.insert(c, t)
    store.remove(chunk_id_from_int(17))
    mesh = create_mesh(data=8, model=1)
    idx = ShardedTokenIndex.from_token_store(store, mesh)
    q = rng.standard_normal((2, 3, 12)).astype(np.float32)
    s_sh, r_sh = idx.search(q, None, k=6)
    s_1c, r_1c = store.search_arrays(q, None, 6)
    np.testing.assert_array_equal(r_sh, r_1c)
    finite = np.isfinite(s_1c)
    np.testing.assert_allclose(s_sh[finite], s_1c[finite], atol=1e-5, rtol=1e-5)


def test_sharded_bf16_storage_matches_bf16_store():
    rng = np.random.default_rng(6)
    store = TokenVectorStore(
        TokenStoreConfig(hidden_dim=8, max_tokens=3,
                         storage_dtype="bfloat16", initial_capacity=8)
    )
    for i in range(64):
        c = Chunk(document_id="d", content=f"c{i}", start_offset=0, end_offset=2,
                  metadata=ChunkMetadata(title=""), id=chunk_id_from_int(i))
        store.insert(c, rng.standard_normal((3, 8)).astype(np.float32))
    mesh = create_mesh(data=8, model=1)
    idx = ShardedTokenIndex.from_token_store(store, mesh)
    q = rng.standard_normal((2, 2, 8)).astype(np.float32)
    s_sh, r_sh = idx.search(q, None, k=5)
    s_1c, r_1c = store.search_arrays(q, None, 5)
    np.testing.assert_array_equal(r_sh, r_1c)


def test_sharded_tiered_bf16_storage_zero_copy():
    """bf16 storage + tiered scan on the mesh must build the zero-copy
    pack (the tier's replica IS the sharded primary) and stay exact vs
    the oracle over the upcast stored values."""
    tok, tm, q, qm, valid = build(280, 4, 16, 3, 3, seed=21)
    mesh = create_mesh(data=8, model=1)
    idx = ShardedTokenIndex(
        tok, tm, mesh, valid=valid, tokens_normalized=True,
        storage_dtype="bfloat16", scan="tiered", rescore=64,
    )
    assert idx._tier[0] is idx.tokens  # aliased, not a per-shard copy
    s, r = idx.search(q, qm, k=7)
    import jax.numpy as jnp

    tok16 = np.asarray(jnp.asarray(tok, jnp.bfloat16), np.float32)
    # oracle over the stored bf16 values, with the index's row padding
    n_pad = idx.valid.shape[0]
    tok_p = np.zeros((n_pad, *tok.shape[1:]), np.float32)
    tok_p[: tok.shape[0]] = tok16
    tm_p = np.zeros((n_pad, tm.shape[1]), bool)
    tm_p[: tm.shape[0]] = tm
    v_p = np.zeros(n_pad, bool)
    v_p[: valid.shape[0]] = valid
    s_o, r_o = maxsim_scan_oracle(q, qm, tok_p, tm_p, v_p, 7)
    np.testing.assert_array_equal(r, r_o)


def test_sharded_k_exceeds_corpus():
    tok, tm, q, qm, valid = build(20, 3, 8, 2, 2, seed=9)
    mesh = create_mesh(data=8, model=1)
    idx = ShardedTokenIndex(tok, tm, mesh, valid=valid, tokens_normalized=True)
    s, r = idx.search(q, qm, k=30)
    s_o, r_o = maxsim_scan_oracle(q, qm, tok, tm, valid, 30)
    np.testing.assert_array_equal(r, r_o)


# ---------------------------------------------------------------------------
# sharded tiered (fused-kernel) scan
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [491, 512])
def test_sharded_tiered_matches_oracle(n):
    """The fused bf16 tier on the mesh: results (certified OR patched
    by the exact fallback) must equal the full-corpus oracle; on unit
    random tokens the quantization width is far below score gaps, so
    most queries should certify rather than fall back."""
    tok, tm, q, qm, valid = build(n, 5, 16, 4, 3, seed=n + 7)
    mesh = create_mesh(data=8, model=1)
    idx = ShardedTokenIndex(
        tok, tm, mesh, valid=valid, tokens_normalized=True,
        scan="tiered", rescore=64,
    )
    s, r = idx.search(q, qm, k=9)
    s_o, r_o = maxsim_scan_oracle(q, qm, tok, tm, valid, 9)
    np.testing.assert_array_equal(r, r_o)
    finite = np.isfinite(s_o)
    np.testing.assert_allclose(s[finite], s_o[finite], atol=1e-5, rtol=1e-5)
    assert idx.uncertified < 4, "expected mostly certified on random data"


def test_sharded_tiered_tagged_matches_filtered_oracle():
    tok, tm, q, qm, valid = build(300, 4, 16, 3, 3, seed=11)
    rng = np.random.default_rng(1)
    tags = rng.integers(0, 8, size=300).astype(np.int32)
    mesh = create_mesh(data=8, model=1)
    idx = ShardedTokenIndex(
        tok, tm, mesh, valid=valid, tokens_normalized=True, tags=tags,
        scan="tiered", rescore=64,
    )
    t_all = np.array([1, 0, 2], np.int32)
    t_any = np.array([0, 4, 0], np.int32)
    t_none = np.array([0, 0, 1], np.int32)
    s, r = idx.search_tagged(q, t_all, t_any, t_none, qm, k=7)
    for b in range(3):
        allowed = valid & np.array(
            [tag_pred_oracle(int(t), int(t_all[b]), int(t_any[b]),
                             int(t_none[b]))
             for t in tags]
        )
        s_o, r_o = maxsim_scan_oracle(
            q[b : b + 1], qm[b : b + 1], tok, tm, allowed, 7
        )
        np.testing.assert_array_equal(r[b : b + 1], r_o)


def test_sharded_tiered_from_store_matches_single_chip():
    """from_token_store(scan="tiered") must serve the same rankings as
    the single-chip tiered store (both provably the exact scan)."""
    n, lt, h = 200, 4, 16
    rng = np.random.default_rng(5)
    store = TokenVectorStore(TokenStoreConfig(
        hidden_dim=h, max_tokens=lt, scan="tiered", rescore=32
    ))
    for i in range(n):
        c = Chunk(
            document_id="d", content=f"c{i}", start_offset=0,
            end_offset=2, metadata=ChunkMetadata(title=""),
            id=chunk_id_from_int(i),
        )
        store.insert(c, rng.standard_normal((lt, h)).astype(np.float32))
    q = rng.standard_normal((3, 3, h)).astype(np.float32)
    s1, r1 = store.search_arrays(q, None, 8)
    mesh = create_mesh(data=8, model=1)
    idx = ShardedTokenIndex.from_token_store(
        store, mesh, scan="tiered", rescore=32
    )
    s2, r2 = idx.search(q, None, k=8)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_allclose(s1, s2, atol=1e-5, rtol=1e-5)


def test_from_token_store_unnormalized_store_parity():
    """A normalize=False store keeps RAW token values; the sharded
    snapshot must serve them untouched (regression: from_token_store
    passed tokens_normalized=store.config.normalize, silently
    normalizing the corpus of a non-normalizing store)."""
    rng = np.random.default_rng(11)
    store = TokenVectorStore(
        TokenStoreConfig(hidden_dim=8, max_tokens=3, normalize=False,
                         initial_capacity=8)
    )
    for i in range(48):
        # widely varying norms so normalization would visibly reorder
        t = rng.standard_normal((3, 8)).astype(np.float32)
        t *= float(rng.uniform(0.1, 10.0))
        c = Chunk(document_id="d", content=f"c{i}", start_offset=0,
                  end_offset=2, metadata=ChunkMetadata(title=""),
                  id=chunk_id_from_int(i))
        store.insert(c, t)
    mesh = create_mesh(data=8, model=1)
    idx = ShardedTokenIndex.from_token_store(store, mesh)
    q = rng.standard_normal((2, 2, 8)).astype(np.float32)
    s_sh, r_sh = idx.search(q, None, k=6)
    s_1c, r_1c = store.search_arrays(q, None, 6)
    np.testing.assert_array_equal(r_sh, r_1c)
    finite = np.isfinite(s_1c)
    np.testing.assert_allclose(s_sh[finite], s_1c[finite], atol=1e-5,
                               rtol=1e-5)
