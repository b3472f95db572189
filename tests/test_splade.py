"""Learned-sparse (SPLADE-class) retrieval: head-math oracle parity,
weighted block-gather scoring vs the scalar oracle, index mutation
semantics, tag filtering, training smoke, persistence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
from trueno_rag_tpu.errors import VectorStoreError
from trueno_rag_tpu.index.learned_sparse import LearnedSparseIndex
from trueno_rag_tpu.models.encoder import _RESERVED, EncoderConfig
from trueno_rag_tpu.models.splade import (
    SpladeRetriever,
    init_splade_params,
    splade_activations,
    splade_head,
    splade_head_oracle,
    splade_topt,
)
from trueno_rag_tpu.ops.bm25 import (
    BLOCK_LEN,
    pack_weighted_blocks,
    weighted_topk_blocks,
)


def mk_chunk(i, text="t"):
    return Chunk(document_id="d", content=text, start_offset=0, end_offset=1,
                 metadata=ChunkMetadata(title=""), id=chunk_id_from_int(i))


# ---------------------------------------------------------------------------
# model head
# ---------------------------------------------------------------------------


def test_splade_head_matches_oracle():
    cfg = EncoderConfig.tiny()
    params = init_splade_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    states = rng.standard_normal((3, 5, cfg.hidden_dim)).astype(np.float32)
    mask = np.ones((3, 5), bool)
    mask[1, 3:] = False
    dev = np.asarray(splade_head(params, jnp.asarray(states), jnp.asarray(mask)))
    orc = splade_head_oracle(params, states, mask)
    np.testing.assert_allclose(dev, orc, atol=2e-5, rtol=2e-5)


def test_splade_activations_nonneg_reserved_zero_padding_inert():
    cfg = EncoderConfig.tiny()
    params = init_splade_params(jax.random.PRNGKey(1), cfg)
    ids = np.array([[5, 9, 17, 0, 0, 0, 0, 0]], np.int32)  # 0 = PAD
    acts = np.asarray(splade_activations(params, jnp.asarray(ids), cfg))
    assert (acts >= 0.0).all()
    assert (acts[:, :_RESERVED] == 0.0).all()
    # extending padding must not change the activations (padding tokens
    # are masked out of the max-pool)
    ids2 = np.pad(ids, ((0, 0), (0, 8)))
    acts2 = np.asarray(splade_activations(params, jnp.asarray(ids2), cfg))
    np.testing.assert_allclose(acts, acts2, atol=1e-6)


def test_splade_topt_contract():
    acts = jnp.asarray(
        np.array([[0.0, 0.5, 0.0, 2.0, 0.0, 0.1]], np.float32)
    )
    terms, w = splade_topt(acts, 4)
    # weight desc; only positive activations live; padding slots -1/0
    assert terms[0, 0] == 3 and terms[0, 1] == 1 and terms[0, 2] == 5
    assert terms[0, 3] == -1 and w[0, 3] == 0.0
    np.testing.assert_allclose(np.asarray(w[0, :3]), [2.0, 0.5, 0.1])


# ---------------------------------------------------------------------------
# weighted block scoring vs the scalar oracle
# ---------------------------------------------------------------------------


def random_index(n_rows=120, vocab=40, seed=0, per_row=6, hot_term=True):
    """An index where term 0 (when hot_term) has >2·BLOCK_LEN postings
    so its slots span multiple blocks."""
    rng = np.random.default_rng(seed)
    idx = LearnedSparseIndex()
    chunks, terms, weights = [], [], []
    for i in range(n_rows):
        t = rng.choice(vocab, size=per_row, replace=False).astype(np.int64)
        if hot_term:
            t[0] = 0  # every row carries term 0 -> posting list n_rows long
        w = rng.uniform(0.05, 2.0, size=per_row).astype(np.float32)
        chunks.append(mk_chunk(i))
        terms.append(t)
        weights.append(w)
    idx.add_batch(chunks, np.stack(terms), np.stack(weights))
    return idx


@pytest.mark.parametrize("n_rows", [40, 600])  # 600 > 2*BLOCK_LEN postings
def test_weighted_search_matches_host_oracle(n_rows):
    idx = random_index(n_rows=n_rows, seed=n_rows)
    rng = np.random.default_rng(1)
    B, T = 5, 8
    q_terms = rng.integers(-1, 40, size=(B, T)).astype(np.int32)
    q_w = rng.uniform(0.0, 1.5, size=(B, T)).astype(np.float32)
    q_w[0, :] = 0.0  # all-zero query: no hits
    s, r = idx.search_arrays(q_terms, q_w, k=12)
    for i in range(B):
        oracle = idx.search_host(q_terms[i], q_w[i], 12)
        got = [(int(rr), float(ss)) for ss, rr in zip(s[i], r[i]) if rr >= 0]
        assert [g[0] for g in got] == [o[0] for o in oracle], f"query {i}"
        np.testing.assert_allclose(
            [g[1] for g in got], [o[1] for o in oracle], rtol=2e-4, atol=1e-5
        )


def test_weighted_search_tie_order_row_asc():
    idx = LearnedSparseIndex()
    # three rows with identical single-term expansions -> exact ties
    idx.add_batch(
        [mk_chunk(i) for i in range(3)],
        np.full((3, 1), 7, np.int64),
        np.ones((3, 1), np.float32),
    )
    s, r = idx.search_arrays(
        np.array([[7]], np.int32), np.array([[1.0]], np.float32), k=3
    )
    assert list(r[0]) == [0, 1, 2]


def test_weighted_search_allowed_rows_filter():
    idx = random_index(n_rows=64, seed=3)
    rng = np.random.default_rng(4)
    q_terms = rng.integers(0, 40, size=(2, 6)).astype(np.int32)
    q_w = rng.uniform(0.1, 1.0, size=(2, 6)).astype(np.float32)
    cap = idx.capacity_rows
    # per-query filters: query 0 sees even rows, query 1 odd rows
    allowed = np.zeros((2, cap), bool)
    allowed[0, 0::2] = True
    allowed[1, 1::2] = True
    s, r = idx.search_arrays(q_terms, q_w, k=10, allowed_rows=allowed)
    assert (r[0][r[0] >= 0] % 2 == 0).all()
    assert (r[1][r[1] >= 0] % 2 == 1).all()
    # exactness: equals the oracle restricted to allowed rows
    for i in range(2):
        oracle = [
            (row, sc)
            for row, sc in idx.search_host(q_terms[i], q_w[i], cap)
            if allowed[i, row]
        ][:10]
        got = [int(rr) for rr in r[i] if rr >= 0]
        assert got == [o[0] for o in oracle]


def test_pack_weighted_blocks_layout():
    rows = np.arange(BLOCK_LEN + 3, dtype=np.int32)
    w = np.linspace(0.1, 1.0, BLOCK_LEN + 3).astype(np.float32)
    table = np.asarray(pack_weighted_blocks(rows, w))
    assert table.shape == (2, 2, BLOCK_LEN)
    np.testing.assert_allclose(table[0, 0], rows[:BLOCK_LEN].astype(np.float32))
    np.testing.assert_allclose(table[1, 1, :3], w[BLOCK_LEN:])
    assert (table[1, 1, 3:] == 0).all()


def test_weighted_topk_blocks_empty_slots():
    """Sentinel slots (hi == 0) contribute nothing; an all-sentinel
    query returns no hits."""
    table = pack_weighted_blocks(np.array([0, 1], np.int32),
                                 np.array([1.0, 1.0], np.float32))
    bids = jnp.zeros((1, 2), jnp.int32)
    lo = jnp.zeros((1, 2), jnp.int32)
    hi = jnp.zeros((1, 2), jnp.int32)
    qw = jnp.ones((1, 2), jnp.float32)
    s, r = weighted_topk_blocks(bids, lo, hi, qw, table, k=3)
    assert (np.asarray(r) == -1).all()


# ---------------------------------------------------------------------------
# index mutation semantics
# ---------------------------------------------------------------------------


def test_remove_and_replace_clear_postings():
    idx = LearnedSparseIndex()
    idx.add(mk_chunk(0), np.array([3, 4], np.int64), np.array([1.0, 2.0], np.float32))
    idx.add(mk_chunk(1), np.array([3], np.int64), np.array([0.5], np.float32))
    assert len(idx) == 2
    # replacement: chunk 0 drops term 4, gains term 9
    idx.add(mk_chunk(0), np.array([3, 9], np.int64), np.array([1.0, 1.0], np.float32))
    assert len(idx) == 2
    s, r = idx.search_arrays(
        np.array([[4]], np.int32), np.array([[1.0]], np.float32), k=4
    )
    assert (np.asarray(r) == -1).all(), "stale posting after replacement"
    assert idx.remove(chunk_id_from_int(1))
    s, r = idx.search_arrays(
        np.array([[3]], np.int32), np.array([[1.0]], np.float32), k=4
    )
    live = [int(x) for x in r[0] if x >= 0]
    assert live == [0]
    assert not idx.remove(chunk_id_from_int(1))


def test_negative_weight_rejected():
    idx = LearnedSparseIndex()
    with pytest.raises(VectorStoreError):
        idx.add(mk_chunk(0), np.array([3], np.int64), np.array([-0.5], np.float32))


def test_state_dict_round_trip():
    idx = random_index(n_rows=30, seed=9)
    clone = LearnedSparseIndex(registry=idx.registry)
    clone.load_state_dict(idx.state_dict())
    q = np.array([[0, 5, 11]], np.int32)
    w = np.array([[1.0, 0.3, 0.7]], np.float32)
    s0, r0 = idx.search_arrays(q, w, k=8)
    s1, r1 = clone.search_arrays(q, w, k=8)
    np.testing.assert_array_equal(r0, r1)
    np.testing.assert_allclose(s0, s1, rtol=1e-6)


# ---------------------------------------------------------------------------
# retriever end to end
# ---------------------------------------------------------------------------


def corpus_texts():
    return [
        "jax compiles programs for the tpu accelerator",
        "bm25 ranks documents by term frequency statistics",
        "the pallas kernel language targets tpu hardware",
        "paragraph chunking splits documents on blank lines",
        "contrastive training aligns query and document vectors",
        "zstd compression shrinks persisted index artifacts",
    ]


def test_splade_retriever_end_to_end():
    retr = SpladeRetriever(seed=0, doc_top=64, query_top=16)
    chunks = [mk_chunk(i, t) for i, t in enumerate(corpus_texts())]
    retr.index_batch(chunks)
    assert len(retr) == len(chunks)
    res = retr.retrieve("tpu kernel hardware", k=3)
    assert res and all(r.sparse_score > 0 for r in res)
    # batch path == single path
    batch = retr.retrieve_batch(["tpu kernel hardware", "zstd artifacts"], k=3)
    assert [r.chunk.id for r in batch[0]] == [r.chunk.id for r in res]
    # tag filter: restrict to even chunks, results stay within
    for i in range(0, len(chunks), 2):
        retr.registry.set_tags(chunks[i].id, ["even"])
    from trueno_rag_tpu.retrieve import TagFilter

    filt = retr.retrieve("tpu kernel hardware", k=4, tag_filter=TagFilter(all=["even"]))
    assert filt, "filtered retrieval returned nothing"
    even_ids = {chunks[i].id for i in range(0, len(chunks), 2)}
    assert all(r.chunk.id in even_ids for r in filt)
    # filtered ranking == unfiltered ranking restricted to allowed ids
    unfilt = retr.retrieve("tpu kernel hardware", k=len(chunks))
    expect = [r.chunk.id for r in unfilt if r.chunk.id in even_ids][:4]
    assert [r.chunk.id for r in filt] == expect


def test_splade_retriever_empty_and_k0():
    retr = SpladeRetriever(seed=0)
    assert retr.retrieve("anything", k=5) == []
    retr.index(mk_chunk(0, "some text here"))
    assert retr.retrieve("some text", k=0) == []


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def test_splade_training_learns_and_sparsifies():
    """~40 steps on a tiny synthetic task: CE falls, retrieval of the
    paired doc improves, and raising the FLOPS weight shrinks the live
    expansion width (the regularizer does its job)."""
    from trueno_rag_tpu.models.encoder import HashTokenizer
    from trueno_rag_tpu.train.contrastive import (
        TrainState,
        create_optimizer,
        splade_contrastive_loss,
        splade_train_step,
    )

    cfg = EncoderConfig.tiny()
    tok = HashTokenizer(cfg.vocab_size, 16)
    words = [f"w{i}" for i in range(32)]
    pairs = [(f"{words[i]} {words[(i + 1) % 32]}",
              f"{words[i]} {words[(i + 1) % 32]} {words[(i + 2) % 32]}")
             for i in range(16)]
    q_ids = jnp.asarray(tok.encode_batch([q for q, _ in pairs]))
    d_ids = jnp.asarray(tok.encode_batch([d for _, d in pairs]))

    params = init_splade_params(jax.random.PRNGKey(0), cfg)
    tx = create_optimizer(learning_rate=3e-4)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    import functools

    step = jax.jit(functools.partial(
        splade_train_step, tx=tx, config=cfg, lambda_q=1e-3, lambda_d=1e-3
    ))
    loss0, m0 = splade_contrastive_loss(state.params, q_ids, d_ids, cfg,
                                        lambda_q=1e-3, lambda_d=1e-3)
    for _ in range(40):
        state, metrics = step(state, q_ids, d_ids)
    assert float(metrics["loss"]) < float(loss0)
    assert float(metrics["accuracy"]) >= float(m0["accuracy"])
    assert np.isfinite(float(metrics["flops_q"]))
    # stronger FLOPS pressure => sparser activations after training
    hi = jax.jit(functools.partial(
        splade_train_step, tx=tx, config=cfg, lambda_q=5e-2, lambda_d=5e-2
    ))
    state_hi = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    for _ in range(40):
        state_hi, m_hi = hi(state_hi, q_ids, d_ids)
    assert float(m_hi["nnz_d"]) < float(metrics["nnz_d"])


# ---------------------------------------------------------------------------
# persistence artifact
# ---------------------------------------------------------------------------


def test_splade_index_artifact_round_trip(tmp_path):
    from trueno_rag_tpu.persist import load_splade_index, save_splade_index

    retr = SpladeRetriever(seed=3, doc_top=48, query_top=12)
    chunks = [mk_chunk(i, t) for i, t in enumerate(corpus_texts())]
    retr.index_batch(chunks)
    retr.registry.set_tags(chunks[0].id, ["even"])
    path = str(tmp_path / "splade.trag")
    stats = save_splade_index(path, retr)
    assert stats["chunks"] == len(chunks) and stats["postings"] > 0
    loaded = load_splade_index(path, seed=3)
    q = "tpu kernel hardware"
    a = [(r.chunk.id, r.sparse_score) for r in retr.retrieve(q, 4)]
    b = [(r.chunk.id, r.sparse_score) for r in loaded.retrieve(q, 4)]
    assert a == b, "scores/order changed across the artifact round-trip"
    from trueno_rag_tpu.retrieve import TagFilter

    fa = [r.chunk.id for r in retr.retrieve(q, 4, tag_filter=TagFilter(all=["even"]))]
    fb = [r.chunk.id for r in loaded.retrieve(q, 4, tag_filter=TagFilter(all=["even"]))]
    assert fa == fb, "tag state lost across the round-trip"


def test_splade_artifact_rejects_wrong_format(tmp_path):
    from trueno_rag_tpu.errors import IndexNotFoundError, SerializationError
    from trueno_rag_tpu.persist import load_splade_index, save_token_index
    from trueno_rag_tpu.models.late_interaction import LateInteractionRetriever

    with pytest.raises(IndexNotFoundError):
        load_splade_index(str(tmp_path / "missing.trag"))
    other = LateInteractionRetriever(seed=0, max_len=8)
    other.index(mk_chunk(0, "text"))
    p = str(tmp_path / "token.trag")
    save_token_index(p, other)
    with pytest.raises(SerializationError):
        load_splade_index(p)


# ---------------------------------------------------------------------------
# sharded composition
# ---------------------------------------------------------------------------


def test_sharded_learned_sparse_matches_single_host():
    from trueno_rag_tpu.parallel.mesh import create_mesh
    from trueno_rag_tpu.parallel.sparse import ShardedLearnedSparse

    idx = random_index(n_rows=530, vocab=60, seed=12)  # ragged across 8 shards
    mesh = create_mesh(data=8, model=1)
    sh = ShardedLearnedSparse(idx, mesh)
    assert sh.max_shard_postings < sh.total_postings, "postings not sharded"
    rng = np.random.default_rng(13)
    q_terms = rng.integers(-1, 60, size=(4, 7)).astype(np.int32)
    q_w = rng.uniform(0.0, 1.2, size=(4, 7)).astype(np.float32)
    s1, r1 = idx.search_arrays(q_terms, q_w, k=9)
    s8, r8 = sh.search_arrays(q_terms, q_w, k=9)
    np.testing.assert_array_equal(np.asarray(r8), r1)
    finite = np.isfinite(s1)
    np.testing.assert_allclose(
        np.asarray(s8)[finite], s1[finite], rtol=2e-4, atol=1e-6
    )


def test_sharded_learned_sparse_tie_order_and_empty_query():
    from trueno_rag_tpu.parallel.mesh import create_mesh
    from trueno_rag_tpu.parallel.sparse import ShardedLearnedSparse

    idx = LearnedSparseIndex()
    # identical expansions across shard boundaries -> global row-asc ties
    idx.add_batch(
        [mk_chunk(i) for i in range(16)],
        np.full((16, 1), 5, np.int64),
        np.ones((16, 1), np.float32),
    )
    mesh = create_mesh(data=8, model=1)
    sh = ShardedLearnedSparse(idx, mesh)
    q = np.array([[5], [-1]], np.int32)
    w = np.array([[1.0], [1.0]], np.float32)
    s, r = sh.search_arrays(q, w, k=5)
    assert list(np.asarray(r)[0]) == [0, 1, 2, 3, 4]
    assert (np.asarray(r)[1] == -1).all()


def test_splade_score_norm_cosine_and_validation():
    """score_norm='cosine' trains through normalized logits (the
    from-scratch recipe); unknown values raise."""
    import functools

    from trueno_rag_tpu.errors import InvalidConfigError
    from trueno_rag_tpu.models.encoder import HashTokenizer
    from trueno_rag_tpu.train.contrastive import (
        TrainState,
        create_optimizer,
        splade_contrastive_loss,
        splade_train_step,
    )

    cfg = EncoderConfig.tiny()
    tok = HashTokenizer(cfg.vocab_size, 16)
    q_ids = jnp.asarray(tok.encode_batch(["alpha beta", "gamma delta"]))
    d_ids = jnp.asarray(tok.encode_batch(["alpha beta x", "gamma delta y"]))
    params = init_splade_params(jax.random.PRNGKey(0), cfg)
    loss_c, m_c = splade_contrastive_loss(
        params, q_ids, d_ids, cfg, temperature=0.05, score_norm="cosine")
    assert np.isfinite(float(loss_c))
    with pytest.raises(InvalidConfigError, match="score_norm"):
        splade_contrastive_loss(params, q_ids, d_ids, cfg, score_norm="zscore")
    tx = create_optimizer(3e-4)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(functools.partial(
        splade_train_step, tx=tx, config=cfg, temperature=0.05,
        score_norm="cosine"))
    for _ in range(10):
        state, m = step(state, q_ids, d_ids)
    assert np.isfinite(float(m["loss"]))


def test_fit_splade_objective_with_kwargs():
    """fit(objective='splade') + objective_kwargs drives the SPLADE
    step end to end (create_train_state kind='splade')."""
    from trueno_rag_tpu.chunking import Chunk
    from trueno_rag_tpu.models.encoder import HashTokenizer
    from trueno_rag_tpu.train.contrastive import create_train_state
    from trueno_rag_tpu.train.loop import fit

    cfg = EncoderConfig.tiny()
    tok = HashTokenizer(cfg.vocab_size, 16)
    chunks = [
        Chunk(document_id="d", content=f"one two {i}. three four {i}.",
              start_offset=0, end_offset=10)
        for i in range(8)
    ]
    state, tx = create_train_state(jax.random.PRNGKey(0), cfg, kind="splade")
    res = fit(state, tx, cfg, tok, chunks, steps=3, batch_size=4,
              eval_every=2, objective="splade", temperature=0.05,
              objective_kwargs={"score_norm": "cosine", "lambda_q": 5e-3,
                                "lambda_d": 1e-3})
    assert res.best_metric >= 0.0
    # encoder-kind params are rejected by the splade objective
    from trueno_rag_tpu.errors import InvalidConfigError

    state2, tx2 = create_train_state(jax.random.PRNGKey(0), cfg)
    with pytest.raises(InvalidConfigError, match="splade"):
        fit(state2, tx2, cfg, tok, chunks, steps=1, objective="splade")
    with pytest.raises(InvalidConfigError, match="kind"):
        create_train_state(jax.random.PRNGKey(0), cfg, kind="nope")
