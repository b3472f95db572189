"""Training tests: loss decreases over steps, checkpoint round-trip,
resume continues from the saved step."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trueno_rag_tpu.models.encoder import EncoderConfig
from trueno_rag_tpu.train.checkpoint import load_train_state, save_train_state
from trueno_rag_tpu.train.contrastive import (
    contrastive_loss,
    create_train_state,
    train_step,
)

CFG = EncoderConfig(vocab_size=64, hidden_dim=32, num_layers=1, num_heads=2, mlp_dim=64, max_len=12)


def _batch(seed=0, b=8, t=12):
    rng = np.random.default_rng(seed)
    q = rng.integers(3, 64, (b, t), dtype=np.int32)
    # positives share most tokens with their query
    d = q.copy()
    d[:, -2:] = rng.integers(3, 64, (b, 2), dtype=np.int32)
    return jnp.asarray(q), jnp.asarray(d)


def test_loss_decreases_over_steps():
    state, tx = create_train_state(jax.random.PRNGKey(0), CFG, learning_rate=1e-3)
    step = jax.jit(functools.partial(train_step, tx=tx, config=CFG))
    q, d = _batch()
    first = None
    for i in range(12):
        state, metrics = step(state, q, d)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first, (first, last)
    assert int(state.step) == 12


def test_accuracy_metric_bounded():
    state, tx = create_train_state(jax.random.PRNGKey(1), CFG)
    q, d = _batch(1)
    loss, metrics = contrastive_loss(state.params, q, d, CFG)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0


def test_checkpoint_roundtrip_and_resume(tmp_path):
    state, tx = create_train_state(jax.random.PRNGKey(0), CFG, learning_rate=1e-3)
    step = jax.jit(functools.partial(train_step, tx=tx, config=CFG))
    q, d = _batch()
    for _ in range(3):
        state, _ = step(state, q, d)

    path = str(tmp_path / "ckpt")
    save_train_state(path, state)
    template, _ = create_train_state(jax.random.PRNGKey(0), CFG, learning_rate=1e-3)
    restored = load_train_state(path, template=template)
    assert int(restored.step) == 3
    for k in state.params:
        np.testing.assert_allclose(np.asarray(restored.params[k]), np.asarray(state.params[k]))

    # resume: stepping the restored state matches stepping the original
    s1, m1 = step(state, q, d)
    s2, m2 = step(restored, q, d)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    assert int(s2.step) == 4


def test_load_missing_checkpoint(tmp_path):
    from trueno_rag_tpu.errors import SerializationError

    with pytest.raises(SerializationError):
        load_train_state(str(tmp_path / "missing"))


def test_ict_and_crop_pairs():
    import random

    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.train.data import PairBatcher, crop_pairs, ict_pairs

    chunks = [
        Chunk(document_id="d", content=t, start_offset=0, end_offset=len(t),
              metadata=ChunkMetadata(), id=chunk_id_from_int(i))
        for i, t in enumerate([
            "First sentence here. Second sentence follows. Third one closes.",
            "Alpha beta gamma delta epsilon zeta eta theta iota kappa.",
        ])
    ]
    rng = random.Random(0)
    stream = ict_pairs(chunks, rng)
    for _ in range(5):
        q, p = next(stream)
        assert q.strip() and p.strip()
        assert q not in p  # the query sentence is removed from the passage

    stream = crop_pairs(chunks, rng)
    q, p = next(stream)
    assert q and p

    from trueno_rag_tpu.models.encoder import HashTokenizer

    batcher = PairBatcher(HashTokenizer(256, 64), batch_size=4, max_len=32)
    q_ids, d_ids = next(batcher.batches(ict_pairs(chunks, rng)))
    assert q_ids.shape[0] == 4 and q_ids.shape == d_ids.shape
    assert q_ids.dtype == np.int32


def test_pair_streams_raise_on_ineligible_corpus():
    """A corpus with no chunk eligible for the pair recipe must RAISE,
    not rejection-sample forever (reachable: fit(evalset=custom) skips
    the probe guard that tests the same condition)."""
    import random

    import pytest

    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.errors import InvalidConfigError
    from trueno_rag_tpu.train.data import crop_pairs, ict_pairs

    chunks = [
        Chunk(document_id="d", content="one short sentence only",
              start_offset=0, end_offset=23, metadata=ChunkMetadata(),
              id=chunk_id_from_int(0))
    ]
    rng = random.Random(0)
    with pytest.raises(InvalidConfigError):
        next(ict_pairs(chunks, rng))
    with pytest.raises(InvalidConfigError):
        next(crop_pairs(chunks, rng, min_words=4))


def test_train_on_ict_pairs_end_to_end():
    """A few steps of real training on ICT pairs from real chunks:
    loss finite and decreasing-ish, params move."""
    import functools
    import random

    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
    from trueno_rag_tpu.models.encoder import HashTokenizer
    from trueno_rag_tpu.train.data import PairBatcher, ict_pairs

    texts = [
        f"Topic {i} sentence one explains things. Topic {i} sentence two adds detail. "
        f"A third sentence about topic {i} concludes." for i in range(8)
    ]
    chunks = [
        Chunk(document_id="d", content=t, start_offset=0, end_offset=len(t),
              metadata=ChunkMetadata(), id=chunk_id_from_int(i))
        for i, t in enumerate(texts)
    ]
    state, tx = create_train_state(jax.random.PRNGKey(0), CFG, learning_rate=1e-3)
    step = jax.jit(functools.partial(train_step, tx=tx, config=CFG))
    batcher = PairBatcher(HashTokenizer(CFG.vocab_size, CFG.max_len), batch_size=8, max_len=CFG.max_len)
    stream = batcher.batches(ict_pairs(chunks, random.Random(0)))
    losses = []
    for _ in range(6):
        q_ids, d_ids = next(stream)
        state, metrics = step(state, jnp.asarray(q_ids), jnp.asarray(d_ids))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def _corpus_chunks(n=10):
    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int

    texts = [
        f"Subject {i} alpha fact describes the {i} widget. Subject {i} beta "
        f"fact measures the {i} gadget. Subject {i} gamma fact closes it."
        for i in range(n)
    ]
    return [
        Chunk(document_id="d", content=t, start_offset=0, end_offset=len(t),
              metadata=ChunkMetadata(), id=chunk_id_from_int(i))
        for i, t in enumerate(texts)
    ]


def test_build_ict_evalset_rows_and_heldout_queries():
    from trueno_rag_tpu.train.loop import build_ict_evalset

    chunks = _corpus_chunks(10)
    es = build_ict_evalset(chunks, n_queries=6, seed=3)
    assert len(es.queries) == 6 and len(es.relevant) == 6
    for q, rel in zip(es.queries, es.relevant):
        assert len(rel) == 1 and 0 <= rel[0] < 10
        assert q in chunks[rel[0]].content  # the probe comes from its chunk


def test_evaluate_retrieval_perfect_for_identical_queries():
    """If the probe text IS the chunk text, exact dense retrieval must
    rank its own row first → recall@1 == 1 regardless of weights."""
    from trueno_rag_tpu.models.encoder import HashTokenizer
    from trueno_rag_tpu.train.loop import EvalSet, evaluate_retrieval

    # CFG's 64-slot hash vocab can collide the distinguishing tokens,
    # creating exact score ties that legitimately cost recall@1 under
    # the row-asc tie-break; a wider vocab makes the probe airtight
    cfg = EncoderConfig(vocab_size=2048, hidden_dim=32, num_layers=1,
                        num_heads=2, mlp_dim=64, max_len=24)
    chunks = _corpus_chunks(8)
    texts = [c.content for c in chunks]
    state, _ = create_train_state(jax.random.PRNGKey(1), cfg, learning_rate=1e-3)
    es = EvalSet(queries=list(texts), relevant=[[i] for i in range(len(texts))])
    scores = evaluate_retrieval(
        state.params, cfg, HashTokenizer(cfg.vocab_size, cfg.max_len), texts, es, k=5
    )
    assert scores["recall@1"] == 1.0
    assert scores["mrr"] == 1.0


def test_fit_eval_driven_selection(tmp_path):
    """fit() must return the best-evaluating state and write the best
    checkpoint; history records baseline + periodic evals."""
    import os

    from trueno_rag_tpu.models.encoder import HashTokenizer
    from trueno_rag_tpu.train.loop import fit

    chunks = _corpus_chunks(10)
    state, tx = create_train_state(jax.random.PRNGKey(0), CFG, learning_rate=1e-3)
    tok = HashTokenizer(CFG.vocab_size, CFG.max_len)
    res = fit(
        state, tx, CFG, tok, chunks,
        steps=4, batch_size=8, eval_every=2, eval_queries=8, k=5,
        select_metric="recall@5", checkpoint_dir=str(tmp_path), seed=0,
    )
    assert len(res.history) == 3  # baseline + steps 2 and 4
    assert res.best_metric >= max(h["recall@5"] for h in res.history) - 1e-9
    assert res.best_step in {int(h["step"]) for h in res.history}
    assert res.best_checkpoint and os.path.exists(res.best_checkpoint)
    # the returned state is the best one: re-evaluating it reproduces best_metric
    from trueno_rag_tpu.train.loop import build_ict_evalset, evaluate_retrieval

    es = build_ict_evalset(chunks, 8, seed=1)
    re_scores = evaluate_retrieval(res.state.params, CFG, tok,
                                   [c.content for c in chunks], es, k=5)
    assert np.isfinite(re_scores["recall@5"])


def test_fit_uses_supplied_heldout_evalset_and_corpus():
    """Regression (quality_eval round 2): fit()'s self-ICT probes are
    exact substrings of their chunk, so an untrained bag-of-words-ish
    encoder saturates them at step 0 and best-state selection never
    leaves the initialization. A caller-supplied held-out evalset +
    eval corpus must drive selection instead."""
    from trueno_rag_tpu.models.encoder import HashTokenizer
    from trueno_rag_tpu.train.loop import EvalSet, fit

    chunks = _corpus_chunks(10)
    eval_corpus = ["held out doc about alpha", "held out doc about beta"]
    es = EvalSet(queries=["alpha", "beta"], relevant=[[0], [1]])
    state, tx = create_train_state(jax.random.PRNGKey(0), CFG, learning_rate=1e-3)
    tok = HashTokenizer(CFG.vocab_size, CFG.max_len)
    res = fit(
        state, tx, CFG, tok, chunks,
        steps=2, batch_size=8, eval_every=2, k=2,
        select_metric="recall@2", evalset=es, eval_corpus=eval_corpus,
        seed=0,
    )
    # history evaluated against the 2-doc held-out corpus: recall is over
    # the supplied relevant rows, and every eval ran (baseline + step 2).
    assert len(res.history) == 2
    for h in res.history:
        assert 0.0 <= h["recall@2"] <= 1.0
    # k was clamped to the 2-row eval corpus, not the 10-chunk train set
    assert res.best_metric == max(h["recall@2"] for h in res.history)


def test_fit_rejects_unknown_pair_kind_and_metric():
    from trueno_rag_tpu.errors import InvalidConfigError
    from trueno_rag_tpu.models.encoder import HashTokenizer
    from trueno_rag_tpu.train.loop import fit

    chunks = _corpus_chunks(6)
    state, tx = create_train_state(jax.random.PRNGKey(0), CFG, learning_rate=1e-3)
    tok = HashTokenizer(CFG.vocab_size, CFG.max_len)
    with pytest.raises(InvalidConfigError):
        fit(state, tx, CFG, tok, chunks, steps=1, pair_kind="nope")
    with pytest.raises(InvalidConfigError):
        fit(state, tx, CFG, tok, chunks, steps=1, eval_every=1,
            eval_queries=4, select_metric="recall@999")


def test_fit_raises_taxonomy_error_on_probe_free_corpus():
    """Regression (review): single-sentence corpora cannot build ICT
    probes; fit must raise InvalidConfigError, not crash in concatenate."""
    from trueno_rag_tpu.errors import InvalidConfigError
    from trueno_rag_tpu.models.encoder import HashTokenizer
    from trueno_rag_tpu.train.loop import EvalSet, evaluate_retrieval, fit

    chunks = _corpus_chunks(4)
    for c in chunks:
        c.content = "single sentence only"
    state, tx = create_train_state(jax.random.PRNGKey(0), CFG, learning_rate=1e-3)
    tok = HashTokenizer(CFG.vocab_size, CFG.max_len)
    with pytest.raises(InvalidConfigError):
        fit(state, tx, CFG, tok, chunks, steps=1, eval_every=1, eval_queries=4)
    with pytest.raises(InvalidConfigError):
        evaluate_retrieval(state.params, CFG, tok, ["text"],
                           EvalSet(queries=[], relevant=[]), k=3)


def test_remat_matches_non_remat_gradients():
    """config.remat must not change numerics — same loss, near-equal
    grads (it only changes WHEN activations are computed)."""
    import dataclasses

    from trueno_rag_tpu.train.contrastive import contrastive_loss

    cfg = CFG
    cfg_r = dataclasses.replace(CFG, remat=True)
    state, _ = create_train_state(jax.random.PRNGKey(0), cfg, learning_rate=1e-3)
    q, d = _batch(3)

    def loss_of(c):
        def f(p):
            return contrastive_loss(p, q, d, c)[0]
        return jax.value_and_grad(f)(state.params)

    l0, g0 = loss_of(cfg)
    l1, g1 = loss_of(cfg_r)
    assert float(l0) == pytest.approx(float(l1), rel=1e-6)
    for k in g0:
        np.testing.assert_allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                                   rtol=2e-3, atol=2e-5)


def test_maxsim_contrastive_loss_finite_and_learns_shape():
    """The MaxSim objective: loss finite, grads flow, and a step on a
    trivially-aligned batch reduces the loss (token-level InfoNCE)."""
    import functools

    from trueno_rag_tpu.train.contrastive import (
        maxsim_contrastive_loss,
        maxsim_train_step,
    )

    rng = np.random.default_rng(0)
    q_ids = jnp.asarray(rng.integers(3, CFG.vocab_size, size=(8, 8), dtype=np.int32))
    d_ids = jnp.asarray(rng.integers(3, CFG.vocab_size, size=(8, 12), dtype=np.int32))
    state, tx = create_train_state(jax.random.PRNGKey(0), CFG, learning_rate=1e-3)
    loss0, m0 = maxsim_contrastive_loss(state.params, q_ids, d_ids, CFG)
    assert np.isfinite(float(loss0))
    step = jax.jit(functools.partial(maxsim_train_step, tx=tx, config=CFG))
    s = state
    for _ in range(8):
        s, metrics = step(s, q_ids, d_ids)
    loss1, _ = maxsim_contrastive_loss(s.params, q_ids, d_ids, CFG)
    assert float(loss1) < float(loss0), (float(loss0), float(loss1))


def test_fit_objective_maxsim_runs_and_selects():
    """fit(objective='maxsim') trains through the MaxSim score and
    evaluates retrieval with MaxSim (mode-matched selection)."""
    from trueno_rag_tpu.models.encoder import HashTokenizer
    from trueno_rag_tpu.train.loop import fit

    chunks = _corpus_chunks(10)
    state, tx = create_train_state(jax.random.PRNGKey(0), CFG, learning_rate=1e-3)
    tok = HashTokenizer(CFG.vocab_size, CFG.max_len)
    res = fit(
        state, tx, CFG, tok, chunks,
        steps=2, batch_size=8, eval_every=2, eval_queries=6, k=5,
        select_metric="recall@5", seed=0, objective="maxsim",
    )
    assert len(res.history) == 2  # baseline + step 2
    assert all(np.isfinite(h["recall@5"]) for h in res.history)


def test_fit_rejects_unknown_objective():
    from trueno_rag_tpu.errors import InvalidConfigError
    from trueno_rag_tpu.models.encoder import HashTokenizer
    from trueno_rag_tpu.train.loop import fit

    chunks = _corpus_chunks(6)
    state, tx = create_train_state(jax.random.PRNGKey(0), CFG)
    tok = HashTokenizer(CFG.vocab_size, CFG.max_len)
    with pytest.raises(InvalidConfigError):
        fit(state, tx, CFG, tok, chunks, steps=1, objective="plaid")


def test_evaluate_retrieval_maxsim_mode_matches_tier():
    """mode='maxsim' rows come from the exact MaxSim scan — spot-check
    that a corpus chunk retrieves itself at rank 1."""
    from trueno_rag_tpu.models.encoder import HashTokenizer
    from trueno_rag_tpu.train.loop import EvalSet, evaluate_retrieval

    chunks = _corpus_chunks(8)
    texts = [c.content for c in chunks]
    state, _ = create_train_state(jax.random.PRNGKey(0), CFG)
    tok = HashTokenizer(CFG.vocab_size, CFG.max_len)
    es = EvalSet(queries=[texts[3]], relevant=[[3]])
    scores = evaluate_retrieval(state.params, CFG, tok, texts, es, k=3,
                                mode="maxsim")
    assert scores["recall@3"] == 1.0

    from trueno_rag_tpu.errors import InvalidConfigError

    with pytest.raises(InvalidConfigError):
        evaluate_retrieval(state.params, CFG, tok, texts, es, k=3, mode="plaid")
