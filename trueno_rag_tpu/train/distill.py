"""Cross-encoder → retriever distillation.

Knowledge distillation closes most of the quality gap between joint
(cross-encoder) scoring and factorized retrieval: a teacher scores each
query against a candidate slate once, and the student (dense bi-encoder
or SPLADE-class learned-sparse) trains to reproduce the teacher's
per-slate score DISTRIBUTION rather than a binary positive label. The
reference has no training at all (its cross-encoder is a term-overlap
mock, rerank.rs:124-191); this module is the capability extension that
makes the framework's rerankers teachers for its retrievers.

Objectives (both standard):

- ``kl`` — KL(softmax(teacher/τ_t) ‖ softmax(student/τ_s)) per slate.
  Scale-free: only the teacher's relative preferences matter, which is
  the right default when teacher logits and student cosines live on
  different scales.
- ``margin_mse`` — MSE between teacher and student score margins vs the
  slate's first slot (the Margin-MSE recipe). Transfers calibrated
  score GAPS, but assumes the two score scales are comparable; use
  ``temperature_t`` to bring the teacher into the student's range.

All slate scoring is one MXU matmul per batch; the losses jit cleanly
and follow the same sharding contract as
:func:`trueno_rag_tpu.train.contrastive.train_step` (batch ``P("data")``,
params per ``encoder_param_specs``).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from trueno_rag_tpu.models.encoder import EncoderConfig, encoder_forward
from trueno_rag_tpu.train.contrastive import TrainState

OBJECTIVES = ("kl", "margin_mse")


def distill_objective(
    student: jax.Array,  # [B, C] student slate scores
    teacher: jax.Array,  # [B, C] teacher slate scores (fixed)
    objective: str = "kl",
    temperature_s: float = 0.05,
    temperature_t: float = 1.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Pure slate-distillation objective over precomputed score tensors
    (the testable core; the loss wrappers below plug in live student
    scores). Teacher scores are treated as constants."""
    teacher = jax.lax.stop_gradient(teacher)
    if objective == "kl":
        t_logp = jax.nn.log_softmax(teacher / temperature_t, axis=1)
        s_logp = jax.nn.log_softmax(student / temperature_s, axis=1)
        t_p = jnp.exp(t_logp)
        kl = jnp.sum(t_p * (t_logp - s_logp), axis=1)  # [B]
        loss = jnp.mean(kl)
    elif objective == "margin_mse":
        if student.shape[1] < 2:
            from trueno_rag_tpu.errors import InvalidConfigError

            raise InvalidConfigError(
                "margin_mse needs a slate of >= 2 candidates per query "
                f"(got C={student.shape[1]}); the [B, 0] margin array "
                "would mean-reduce to NaN loss/gradients"
            )
        s_m = student[:, :1] - student[:, 1:]  # [B, C-1]
        t_m = (teacher[:, :1] - teacher[:, 1:]) / temperature_t
        loss = jnp.mean((s_m - t_m) ** 2)
    else:
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(
            f"unknown distillation objective: {objective!r}"
        )
    agreement = jnp.mean(
        (jnp.argmax(student, axis=1) == jnp.argmax(teacher, axis=1)).astype(
            jnp.float32
        )
    )
    return loss, {"loss": loss, "agreement": agreement}


def _slate_scores(params, query_ids, cand_ids, config):
    """Student bi-encoder slate scores: ``[B, C]`` cosine of the query
    against each of its C candidates (encoder_forward L2-normalizes)."""
    b, c, t = cand_ids.shape
    q = encoder_forward(params, query_ids, config)  # [B, H]
    d = encoder_forward(params, cand_ids.reshape(b * c, t), config)
    d = d.reshape(b, c, -1)
    return jnp.einsum("bh,bch->bc", q, d, preferred_element_type=jnp.float32)


def dense_distill_loss(
    params: Dict[str, jax.Array],
    query_ids: jax.Array,  # [B, T]
    cand_ids: jax.Array,  # [B, C, T] per-query candidate slates
    teacher_scores: jax.Array,  # [B, C]
    config: EncoderConfig,
    objective: str = "kl",
    temperature_s: float = 0.05,
    temperature_t: float = 1.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    s = _slate_scores(params, query_ids, cand_ids, config)
    return distill_objective(
        s, teacher_scores, objective, temperature_s, temperature_t
    )


def splade_distill_loss(
    params: Dict[str, jax.Array],
    query_ids: jax.Array,  # [B, T]
    cand_ids: jax.Array,  # [B, C, T]
    teacher_scores: jax.Array,  # [B, C]
    config: EncoderConfig,
    objective: str = "kl",
    temperature_s: float = 1.0,
    temperature_t: float = 1.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Distill into the learned-sparse student: slate scores are the
    dense activation dots (sparsification stays inference-only, exactly
    like splade_contrastive_loss). Combine with the FLOPS regularizer
    by summing this loss with the regularizer terms from a contrastive
    step if index cost matters during distillation."""
    from trueno_rag_tpu.models.encoder import _token_states
    from trueno_rag_tpu.models.splade import splade_head

    b, c, t = cand_ids.shape
    qs, qm = _token_states(params, query_ids, config)
    q_act = splade_head(params, qs, qm)  # [B, V]
    ds, dm = _token_states(params, cand_ids.reshape(b * c, t), config)
    d_act = splade_head(params, ds, dm).reshape(b, c, -1)
    s = jnp.einsum("bv,bcv->bc", q_act, d_act, preferred_element_type=jnp.float32)
    return distill_objective(
        s, teacher_scores, objective, temperature_s, temperature_t
    )


def distill_step(
    state: TrainState,
    query_ids: jax.Array,
    cand_ids: jax.Array,
    teacher_scores: jax.Array,
    tx: optax.GradientTransformation,
    config: EncoderConfig,
    objective: str = "kl",
    temperature_s: float = 0.05,
    temperature_t: float = 1.0,
    student: str = "dense",
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One optimizer step distilling teacher slate scores into the
    ``dense`` or ``splade`` student. Same jit/sharding contract as
    :func:`trueno_rag_tpu.train.contrastive.train_step`."""
    if student not in ("dense", "splade"):
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(f"unknown distillation student: {student!r}")
    loss = dense_distill_loss if student == "dense" else splade_distill_loss

    def loss_fn(p):
        return loss(
            p, query_ids, cand_ids, teacher_scores, config,
            objective, temperature_s, temperature_t,
        )

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_opt_state, state.step + 1), metrics


def teacher_slate_scores(
    reranker,
    queries: Sequence[str],
    slates: Sequence[Sequence[str]],
) -> np.ndarray:
    """Score each query's candidate slate with a cross-encoder teacher
    (:class:`trueno_rag_tpu.models.cross_encoder.CrossEncoderReranker`
    or anything with ``score_batch(query, contents)``) → ``[B, C]``
    f32. Host-side; cache the result — the teacher forward is the
    expensive part of distillation and never needs gradients."""
    if len(queries) != len(slates):
        from trueno_rag_tpu.errors import QueryError

        raise QueryError(
            f"got {len(slates)} slates for {len(queries)} queries"
        )
    widths = {len(s) for s in slates}
    if len(widths) > 1:
        from trueno_rag_tpu.errors import QueryError

        raise QueryError(f"ragged slates: widths {sorted(widths)}")
    out = np.zeros((len(queries), next(iter(widths), 0)), np.float32)
    for i, (q, slate) in enumerate(zip(queries, slates)):
        out[i] = np.asarray(reranker.score_batch(q, list(slate)))
    return out
