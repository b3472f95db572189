"""Cross-encoder → retriever distillation: objective math on synthetic
score tensors, the teacher slate helper, and end-to-end student
training (dense and SPLADE) that must reproduce the teacher's slate
rankings. No reference counterpart (the reference has no training;
rerank.rs:124-191 is a term-overlap mock)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trueno_rag_tpu.errors import InvalidConfigError, QueryError
from trueno_rag_tpu.models.encoder import EncoderConfig, HashTokenizer
from trueno_rag_tpu.train.contrastive import TrainState, create_optimizer, create_train_state
from trueno_rag_tpu.train.distill import (
    distill_objective,
    distill_step,
    teacher_slate_scores,
)

CFG = EncoderConfig.tiny()


# ------------------------------------------------------ objective math ----


def test_kl_zero_when_distributions_match():
    t = jnp.asarray([[2.0, 1.0, 0.0], [0.0, 3.0, 1.0]])
    loss, m = distill_objective(t, t, "kl", temperature_s=1.0, temperature_t=1.0)
    assert float(loss) == pytest.approx(0.0, abs=1e-6)
    assert float(m["agreement"]) == 1.0
    # temperature-scaled copies are still the same distribution
    loss2, _ = distill_objective(2.0 * t, t, "kl",
                                 temperature_s=2.0, temperature_t=1.0)
    assert float(loss2) == pytest.approx(0.0, abs=1e-6)


def test_kl_positive_and_agreement():
    t = jnp.asarray([[5.0, 0.0], [0.0, 5.0]])
    s = jnp.asarray([[0.0, 5.0], [0.0, 5.0]])  # first slate disagrees
    loss, m = distill_objective(s, t, "kl", temperature_s=1.0, temperature_t=1.0)
    assert float(loss) > 0.0
    assert float(m["agreement"]) == pytest.approx(0.5)


def test_margin_mse_shift_invariant():
    t = jnp.asarray([[2.0, 1.0, -1.0]])
    s = t + 7.5  # per-slate constant shift: identical margins
    loss, _ = distill_objective(s, t, "margin_mse",
                                temperature_s=1.0, temperature_t=1.0)
    assert float(loss) == pytest.approx(0.0, abs=1e-6)
    loss2, _ = distill_objective(t * 0.5, t, "margin_mse",
                                 temperature_s=1.0, temperature_t=2.0)
    assert float(loss2) == pytest.approx(0.0, abs=1e-6)  # τ_t rescales teacher


def test_unknown_objective_and_student_rejected():
    t = jnp.zeros((2, 3))
    with pytest.raises(InvalidConfigError):
        distill_objective(t, t, "huber")
    state, tx = create_train_state(jax.random.PRNGKey(0), CFG)
    with pytest.raises(InvalidConfigError):
        distill_step(state, jnp.zeros((2, 8), jnp.int32),
                     jnp.zeros((2, 3, 8), jnp.int32), t, tx, CFG,
                     student="tfidf")


def test_teacher_gradient_is_stopped():
    t = jnp.asarray([[1.0, 0.0]])

    def f(teacher):
        loss, _ = distill_objective(jnp.asarray([[0.5, 0.2]]), teacher, "kl")
        return loss

    g = jax.grad(f)(t)
    assert float(jnp.abs(g).max()) == 0.0


# ------------------------------------------------------ teacher helper ----


def test_teacher_slate_scores_shapes_and_errors():
    from trueno_rag_tpu.models.cross_encoder import CrossEncoderReranker

    ce = CrossEncoderReranker(config=CFG, seed=5, max_len=32)
    queries = ["alpha beta", "gamma delta"]
    slates = [["alpha beta gamma", "unrelated words"],
              ["gamma delta epsilon", "other text"]]
    scores = teacher_slate_scores(ce, queries, slates)
    assert scores.shape == (2, 2)
    np.testing.assert_allclose(
        scores[0], np.asarray(ce.score_batch(queries[0], slates[0])),
        rtol=1e-6,
    )
    with pytest.raises(QueryError):
        teacher_slate_scores(ce, queries, slates[:1])
    with pytest.raises(QueryError):
        teacher_slate_scores(ce, queries, [slates[0], slates[1][:1]])


# ----------------------------------------------- end-to-end distillation ----


def _slate_data(seed=0, b=8, c=4, t=16):
    """Fixed synthetic slates + a random-teacher target the student can
    overfit: the assertion is that DISTILLATION transfers the teacher's
    (arbitrary) slate rankings, not that the rankings are 'right'."""
    rng = np.random.default_rng(seed)
    tok = HashTokenizer(CFG.vocab_size, t)
    words = [f"w{i}" for i in range(40)]
    queries = [" ".join(rng.choice(words, size=4, replace=False)) for _ in range(b)]
    slates = [
        [" ".join(rng.choice(words, size=6, replace=False)) for _ in range(c)]
        for _ in range(b)
    ]
    q_ids = tok.encode_batch(queries)
    cand_rows = tok.encode_batch([txt for s in slates for txt in s])
    width = max(q_ids.shape[1], cand_rows.shape[1])
    q_ids = np.pad(q_ids, ((0, 0), (0, width - q_ids.shape[1])))
    cand_rows = np.pad(cand_rows, ((0, 0), (0, width - cand_rows.shape[1])))
    teacher = rng.normal(size=(b, c)).astype(np.float32) * 2.0
    return (jnp.asarray(q_ids), jnp.asarray(cand_rows.reshape(b, c, width)),
            jnp.asarray(teacher))


@pytest.mark.parametrize("student,objective", [
    ("dense", "kl"),
    ("dense", "margin_mse"),
    ("splade", "kl"),
])
def test_distillation_learns_teacher_ranking(student, objective):
    q_ids, cand_ids, teacher = _slate_data()
    if student == "splade":
        from trueno_rag_tpu.models.splade import init_splade_params

        params = init_splade_params(jax.random.PRNGKey(0), CFG)
        tx = create_optimizer(5e-3)
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))
    else:
        state, tx = create_train_state(jax.random.PRNGKey(0), CFG,
                                       learning_rate=5e-3)
    step = jax.jit(functools.partial(
        distill_step, tx=tx, config=CFG, objective=objective,
        student=student,
        # bounded scores need a soft target to chase under margin_mse
        temperature_t=4.0 if objective == "margin_mse" else 1.0,
    ))
    first = None
    metrics = {}
    for _ in range(60):
        state, metrics = step(state, query_ids=q_ids, cand_ids=cand_ids,
                              teacher_scores=teacher)
        if first is None:
            first = {k: float(v) for k, v in metrics.items()}
    last = {k: float(v) for k, v in metrics.items()}
    assert last["loss"] < 0.5 * first["loss"], (student, objective, first, last)
    assert last["agreement"] >= max(first["agreement"], 0.75), \
        (student, objective, first, last)


def test_margin_mse_single_candidate_slate_rejected():
    """C=1 slates would mean-reduce a [B, 0] margin array to NaN loss
    and NaN gradients with no error (ADVICE r2) — reject instead."""
    from trueno_rag_tpu.errors import InvalidConfigError
    from trueno_rag_tpu.train.distill import distill_objective

    one = jnp.ones((4, 1), jnp.float32)
    with pytest.raises(InvalidConfigError, match="margin_mse"):
        distill_objective(one, one, objective="margin_mse")
