"""TokenVectorStore + LateInteractionRetriever: the multi-vector index
layer must keep VectorStore's contracts (registry rows, tombstones,
ordered valid hits) and both scan tiers must agree with the MaxSim
oracle over the STORED token values."""

import numpy as np
import pytest
import jax.numpy as jnp

from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
from trueno_rag_tpu.errors import (
    DimensionMismatchError,
    InvalidConfigError,
    VectorStoreError,
)
from trueno_rag_tpu.index import TokenStoreConfig, TokenVectorStore
from trueno_rag_tpu.models import LateInteractionRetriever
from trueno_rag_tpu.ops.maxsim import maxsim_scan_oracle


def mk_chunk(i: int, content: str = "") -> Chunk:
    text = content or f"chunk number {i}"
    return Chunk(
        document_id=f"doc{i % 3}",
        content=text,
        start_offset=0,
        end_offset=len(text),
        metadata=ChunkMetadata(title=f"t{i}"),
        id=chunk_id_from_int(i),
    )


def rand_tokens(rng, l, h, normed=True):
    t = rng.standard_normal((l, h)).astype(np.float32)
    if normed:
        t /= np.linalg.norm(t, axis=1, keepdims=True)
    return t


def build_store(n=40, h=16, lt=6, seed=0, **cfg):
    rng = np.random.default_rng(seed)
    store = TokenVectorStore(
        TokenStoreConfig(hidden_dim=h, max_tokens=lt, initial_capacity=8, **cfg)
    )
    mats = []
    for i in range(n):
        l = int(rng.integers(1, lt + 1))
        mats.append(rand_tokens(rng, l, h))
        store.insert(mk_chunk(i), mats[-1])
    return store, mats, rng


def oracle_hits(store, q, k):
    """Oracle over the store's own host state (query normalized the
    same way search_arrays does)."""
    q = q / np.where(
        np.linalg.norm(q, axis=1, keepdims=True) > 0,
        np.linalg.norm(q, axis=1, keepdims=True), 1.0)
    s, r = maxsim_scan_oracle(
        q[None],
        np.ones((1, q.shape[0]), bool),
        store._host,
        store._t_mask,
        store._valid,
        k,
    )
    out = []
    for sc, row in zip(s[0], r[0]):
        if row >= 0:
            out.append((store.registry.id_of(int(row)), float(sc)))
    return out



def assert_hits_equal(got, expected):
    """Row/id order must match EXACTLY; scores to float tolerance (the
    device and host sum in different orders at the last ulp)."""
    assert [cid for cid, _ in got] == [cid for cid, _ in expected]
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in expected], atol=1e-5, rtol=1e-5
    )


def test_config_validation():
    with pytest.raises(InvalidConfigError):
        TokenStoreConfig(storage_dtype="fp8")
    with pytest.raises(InvalidConfigError):
        TokenStoreConfig(scan="plaid")
    with pytest.raises(InvalidConfigError):
        TokenStoreConfig(t_hits=0)


def test_insert_validation():
    store = TokenVectorStore(TokenStoreConfig(hidden_dim=8, max_tokens=4))
    with pytest.raises(DimensionMismatchError):
        store.insert(mk_chunk(0), np.zeros((3, 5), np.float32))
    with pytest.raises(VectorStoreError):
        store.insert(mk_chunk(0), np.zeros((0, 8), np.float32))
    # batch validates before mutating
    good = mk_chunk(1)
    with pytest.raises(DimensionMismatchError):
        store.insert_many(
            [good, mk_chunk(2)],
            [np.ones((2, 8), np.float32), np.ones((2, 5), np.float32)],
        )
    assert len(store) == 0


def test_search_matches_oracle_exact_scan():
    store, _, rng = build_store(n=50, h=16, lt=6, seed=1)
    q = rand_tokens(rng, 4, 16)
    hits = store.search_tokens(q, 7)
    assert_hits_equal(hits, oracle_hits(store, q, 7))
    # scores descend; ties (if any) by row asc is the oracle's order
    scores = [s for _, s in hits]
    assert scores == sorted(scores, reverse=True)


def test_search_matches_oracle_token_tier_with_fallback():
    store, _, rng = build_store(n=60, h=16, lt=5, seed=2, scan="token",
                                t_hits=16, rescore=12)
    q = rand_tokens(rng, 3, 16)
    hits = store.search_tokens(q, 8)
    assert_hits_equal(hits, oracle_hits(store, q, 8))  # fallback keeps it exact


def test_token_tier_counts_uncertified():
    # tiny rescore on a concentrated corpus forces fallback
    rng = np.random.default_rng(3)
    store = TokenVectorStore(
        TokenStoreConfig(hidden_dim=8, max_tokens=3, scan="token",
                         t_hits=2, rescore=2)
    )
    base = rand_tokens(rng, 3, 8)
    for i in range(30):
        t = base + 0.01 * rng.standard_normal((3, 8)).astype(np.float32)
        store.insert(mk_chunk(i), t)
    q = base[:2] + 0.01 * rng.standard_normal((2, 8)).astype(np.float32)
    hits = store.search_tokens(q, 2)
    assert_hits_equal(hits, oracle_hits(store, q, 2))
    assert store.uncertified >= 1


def test_remove_tombstones_and_recycles():
    store, _, rng = build_store(n=10, h=8, lt=4, seed=4)
    victim = mk_chunk(3)
    assert store.remove(victim.id)
    assert not store.remove(victim.id)
    assert len(store) == 9
    q = rand_tokens(rng, 2, 8)
    assert victim.id not in [cid for cid, _ in store.search_tokens(q, 10)]
    # reinsert recycles the freed row
    cap_before = store._host.shape[0]
    store.insert(mk_chunk(99), rand_tokens(rng, 3, 8))
    assert store._host.shape[0] == cap_before
    assert len(store) == 10


def test_capacity_growth_preserves_content():
    store, _, rng = build_store(n=40, h=8, lt=4, seed=5)  # initial cap 8
    q = rand_tokens(rng, 2, 8)
    assert_hits_equal(store.search_tokens(q, 5), oracle_hits(store, q, 5))


def test_bf16_storage_exact_over_stored_values():
    rng = np.random.default_rng(6)
    store = TokenVectorStore(
        TokenStoreConfig(hidden_dim=16, max_tokens=4,
                         storage_dtype="bfloat16", initial_capacity=8)
    )
    for i in range(25):
        store.insert(mk_chunk(i), rand_tokens(rng, 4, 16))
    q = rand_tokens(rng, 3, 16)
    hits = store.search_tokens(q, 6)
    # oracle over the bf16 UPCAST of what the store normalized/stored
    host_bf16 = np.asarray(
        jnp.asarray(store._host, jnp.bfloat16), np.float32
    )
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    s, r = maxsim_scan_oracle(
        qn[None], np.ones((1, 3), bool), host_bf16, store._t_mask,
        store._valid, 6,
    )
    expected = [
        (store.registry.id_of(int(row)), float(sc))
        for sc, row in zip(s[0], r[0]) if row >= 0
    ]
    assert [cid for cid, _ in hits] == [cid for cid, _ in expected]


def test_allowed_rows_filter():
    store, _, rng = build_store(n=20, h=8, lt=3, seed=7)
    q = rand_tokens(rng, 2, 8)
    allowed = np.zeros((store._host.shape[0],), bool)
    keep_rows = [store.registry.row_of(mk_chunk(i).id) for i in (2, 5, 11)]
    for r in keep_rows:
        allowed[r] = True
    scores, rows = store.search_arrays(q[None], None, 10, allowed_rows=allowed)
    got = {int(r) for r in rows[0] if r >= 0}
    assert got == set(keep_rows)
    with pytest.raises(VectorStoreError):
        store.search_arrays(q[None], None, 5, allowed_rows=np.ones(3, bool))


def test_truncation_to_max_tokens():
    store = TokenVectorStore(TokenStoreConfig(hidden_dim=8, max_tokens=3))
    t = np.eye(5, 8, dtype=np.float32)  # 5 tokens, cap 3
    store.insert(mk_chunk(0), t)
    assert store._t_mask[0].sum() == 3


def test_empty_store_and_k_zero():
    store = TokenVectorStore(TokenStoreConfig(hidden_dim=8, max_tokens=3))
    assert store.search_tokens(np.ones((2, 8), np.float32), 5) == []
    store.insert(mk_chunk(0), np.ones((2, 8), np.float32))
    assert store.search_tokens(np.ones((2, 8), np.float32), 0) == []


# ---------------------------------------------------------------------------
# retriever
# ---------------------------------------------------------------------------

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "machine learning models require training data",
    "retrieval augmented generation combines search with language models",
    "deep neural networks learn hierarchical features",
    "a lazy afternoon nap under the summer sun",
    "data pipelines move information between systems",
    "token level late interaction scores fine grained evidence",
    "tensor processing units excel at dense matrix math",
]


def build_retriever(**store_kw):
    retr = LateInteractionRetriever(max_len=16, seed=0,
                                    store_config=None if not store_kw else None)
    if store_kw:
        from trueno_rag_tpu.index import TokenStoreConfig as TSC
        retr = LateInteractionRetriever(
            max_len=16, seed=0,
            store_config=TSC(hidden_dim=retr.config.hidden_dim,
                             max_tokens=16, **store_kw),
        )
    chunks = [mk_chunk(i, t) for i, t in enumerate(CORPUS)]
    retr.index_batch(chunks)
    return retr, chunks


def test_retriever_self_retrieval():
    """Querying with an indexed chunk's exact text must rank that chunk
    first: cosine MaxSim of a text against itself is the per-token
    maximum (1.0 per real token)."""
    retr, chunks = build_retriever()
    for i in (0, 3, 6):
        results = retr.retrieve(CORPUS[i], 3)
        assert results[0].chunk.id == chunks[i].id
        assert results[0].dense_score is not None


def test_retriever_batch_matches_single():
    retr, _ = build_retriever()
    batch = retr.retrieve_batch([CORPUS[1], CORPUS[4]], 4)
    single1 = retr.retrieve(CORPUS[1], 4)
    assert [r.chunk.id for r in batch[0]] == [r.chunk.id for r in single1]
    assert len(batch) == 2


def test_retriever_token_tier_is_exact():
    exact, _ = build_retriever()
    pruned, _ = build_retriever(scan="token", t_hits=8, rescore=8)
    for q in ("lazy dog", "training neural models", CORPUS[7]):
        a = [r.chunk.id for r in exact.retrieve(q, 5)]
        b = [r.chunk.id for r in pruned.retrieve(q, 5)]
        assert a == b


def test_retriever_mismatched_store_dim_rejected():
    from trueno_rag_tpu.index import TokenStoreConfig as TSC

    with pytest.raises(InvalidConfigError):
        LateInteractionRetriever(
            max_len=8, store_config=TSC(hidden_dim=999, max_tokens=8)
        )


def test_retriever_empty_and_no_queries():
    retr = LateInteractionRetriever(max_len=8)
    assert retr.retrieve("anything", 5) == []
    assert retr.retrieve_batch([], 5) == []


# ---------------------------------------------------------------------------
# persistence
# ---------------------------------------------------------------------------

from trueno_rag_tpu.persist import load_token_index, save_token_index  # noqa: E402
from trueno_rag_tpu.errors import IndexNotFoundError, SerializationError  # noqa: E402


def test_token_index_roundtrip_exact(tmp_path):
    retr, chunks = build_retriever()
    retr.store.registry.set_tags(chunks[0].id, ["alpha"])
    path = str(tmp_path / "tok.trag")
    stats = save_token_index(path, retr)
    assert stats["chunks"] == len(CORPUS)
    loaded = load_token_index(path, params=retr.params)
    # stored token bytes are identical -> device results identical
    q_tok, q_mask = retr._encode([CORPUS[2], "lazy sun"])
    s0, r0 = retr.store.search_arrays(q_tok, q_mask, 5)
    s1, r1 = loaded.store.search_arrays(q_tok, q_mask, 5)
    np.testing.assert_array_equal(r0, r1)
    np.testing.assert_array_equal(s0, s1)
    # retriever-level parity (same encoder params supplied)
    a = [r.chunk.id for r in retr.retrieve(CORPUS[5], 4)]
    b = [r.chunk.id for r in loaded.retrieve(CORPUS[5], 4)]
    assert a == b
    # tags survive
    assert "alpha" in loaded.store.registry.tag_names_of(chunks[0].id)


def test_token_index_roundtrip_after_remove(tmp_path):
    retr, chunks = build_retriever()
    retr.store.remove(chunks[3].id)
    path = str(tmp_path / "tok.trag")
    assert save_token_index(path, retr)["chunks"] == len(CORPUS) - 1
    loaded = load_token_index(path, params=retr.params)
    assert len(loaded) == len(CORPUS) - 1
    assert loaded.store.get(chunks[3].id) is None


def test_token_index_scan_override(tmp_path):
    retr, _ = build_retriever()
    path = str(tmp_path / "tok.trag")
    save_token_index(path, retr)
    loaded = load_token_index(path, params=retr.params, scan="token")
    assert loaded.store.config.scan == "token"
    assert [r.chunk.id for r in loaded.retrieve(CORPUS[0], 3)] == [
        r.chunk.id for r in retr.retrieve(CORPUS[0], 3)
    ]


def test_token_index_load_errors(tmp_path):
    with pytest.raises(IndexNotFoundError):
        load_token_index(str(tmp_path / "missing.trag"))
    # a hybrid artifact is not a token artifact
    from trueno_rag_tpu.persist import serialize_compressed

    bad = tmp_path / "bad.trag"
    bad.write_bytes(serialize_compressed({"format": "something-else"}))
    with pytest.raises(SerializationError):
        load_token_index(str(bad))


def test_retriever_tag_filter_every_scan_tier():
    """tag_filter resolves to an allowed-row mask that joins the scan's
    validity mask — every tier (exact, tiered/fused, token) must return
    only allowed chunks, ranked exactly as an unfiltered search over
    the allowed subset."""
    from trueno_rag_tpu.retrieve import TagFilter

    for kw in ({}, {"scan": "tiered", "rescore": 16},
               {"scan": "tiered", "rescore": 16, "scan_kernel": "xla"},
               {"scan": "token", "t_hits": 32, "rescore": 16}):
        retr, chunks = build_retriever(**kw)
        for i, c in enumerate(chunks):
            retr.store.registry.set_tags(
                c.id, ["even"] if i % 2 == 0 else ["odd"]
            )
        got = retr.retrieve(CORPUS[2], 4, tag_filter=TagFilter(all=("odd",)))
        odd_ids = {c.id for i, c in enumerate(chunks) if i % 2 == 1}
        assert got, f"no results for {kw}"
        assert all(r.chunk.id in odd_ids for r in got), kw
        # parity with brute force over the allowed subset: the filtered
        # top-1 must be the best odd chunk by unfiltered ranking order
        full = retr.retrieve(CORPUS[2], len(chunks))
        best_odd = next(r.chunk.id for r in full if r.chunk.id in odd_ids)
        assert got[0].chunk.id == best_odd, kw


def test_retriever_tag_filter_batch_groups_and_unknown():
    """Per-query filters group by distinct word triple; an unknown tag
    in `all` matches nothing (reference filter semantics)."""
    from trueno_rag_tpu.retrieve import TagFilter

    retr, chunks = build_retriever(scan="tiered", rescore=16)
    for i, c in enumerate(chunks):
        retr.store.registry.set_tags(c.id, ["even"] if i % 2 == 0 else ["odd"])
    outs = retr.retrieve_batch(
        [CORPUS[0], CORPUS[1], CORPUS[2]], 3,
        tag_filter=[TagFilter(all=("even",)), None,
                    TagFilter(all=("nosuchtag",))],
    )
    even_ids = {c.id for i, c in enumerate(chunks) if i % 2 == 0}
    assert outs[0] and all(r.chunk.id in even_ids for r in outs[0])
    assert outs[1]  # unfiltered
    assert outs[2] == []  # impossible filter -> empty


def test_retriever_ensure_ready_warms_tier():
    retr, _ = build_retriever(scan="tiered", rescore=16)
    retr.ensure_ready()
    assert retr.store._tier is not None
