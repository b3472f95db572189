"""InfoNCE contrastive training for the JAX retrieval encoder.

Standard bi-encoder recipe: encode a batch of (query, document) pairs,
score all pairs with one MXU matmul, and cross-entropy against the
diagonal in both directions (symmetric InfoNCE). In-batch negatives
mean the effective negative count equals the *global* batch size, so
data-parallel training wants the logits computed over the full gathered
document set — under ``jit`` over a mesh, GSPMD inserts exactly that
all-gather from the sharding annotations; no hand-written collectives.

All matmuls run in the encoder's bf16 compute dtype; the loss and
softmax statistics accumulate in float32.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from trueno_rag_tpu.models.encoder import EncoderConfig, encoder_forward, init_encoder_params


class TrainState(NamedTuple):
    params: Dict[str, jax.Array]
    opt_state: optax.OptState
    step: jax.Array


def create_optimizer(learning_rate: float = 2e-5, weight_decay: float = 0.01) -> optax.GradientTransformation:
    return optax.adamw(learning_rate, weight_decay=weight_decay)


def create_train_state(
    rng: jax.Array,
    config: EncoderConfig,
    learning_rate: float = 2e-5,
    kind: str = "encoder",
) -> Tuple[TrainState, optax.GradientTransformation]:
    """``kind="encoder"`` initializes the bi-encoder trunk;
    ``kind="splade"`` adds the tied-embedding MLM expansion head on top
    (required by splade_train_step / fit(objective="splade"))."""
    if kind == "splade":
        from trueno_rag_tpu.models.splade import init_splade_params

        params = init_splade_params(rng, config)
    elif kind == "encoder":
        params = init_encoder_params(rng, config)
    else:
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(
            f"unknown train-state kind {kind!r} (encoder|splade)"
        )
    tx = create_optimizer(learning_rate)
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)), tx


def contrastive_loss(
    params: Dict[str, jax.Array],
    query_ids: jax.Array,  # [B, T]
    doc_ids: jax.Array,  # [B, T]
    config: EncoderConfig,
    temperature: float = 0.05,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Symmetric InfoNCE with in-batch negatives."""
    q = encoder_forward(params, query_ids, config)  # [B, H] f32, L2-normed
    d = encoder_forward(params, doc_ids, config)
    logits = (q @ d.T) / temperature  # [B, B]
    labels = jnp.arange(logits.shape[0])
    loss_qd = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_dq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    loss = 0.5 * (jnp.mean(loss_qd) + jnp.mean(loss_dq))
    accuracy = jnp.mean(jnp.argmax(logits, axis=1) == labels)
    return loss, {"loss": loss, "accuracy": accuracy}


def maxsim_contrastive_loss(
    params: Dict[str, jax.Array],
    query_ids: jax.Array,  # [B, Tq]
    doc_ids: jax.Array,  # [B, Td]
    config: EncoderConfig,
    temperature: float = 0.05,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """InfoNCE with in-batch negatives scored by MaxSim over L2-normed
    token states (the ColBERT training recipe). The pooled objective
    trains the MEAN vector; token states under it are NOT organized for
    token-level matching — measured: MaxSim retrieval over a
    pooled-trained trunk reached only 0.41 recall@10 where the pooled
    path reached 0.92 (tools/quality_eval.py, round 2). Training
    through the MaxSim score itself is what makes the late-interaction
    tier (ops/maxsim.py, index/token_store.py) retrieve well.

    One-directional CE (query over documents): MaxSim is asymmetric —
    the d→q score is a different quantity, so the symmetric term of the
    pooled loss has no analog here."""
    from trueno_rag_tpu.models.encoder import encoder_token_states

    q_tok, q_mask = encoder_token_states(params, query_ids, config)
    d_tok, d_mask = encoder_token_states(params, doc_ids, config)

    def l2(x):
        n = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.where(n == 0.0, 1.0, n)

    q_tok, d_tok = l2(q_tok), l2(d_tok)
    sim = jnp.einsum(
        "bqh,cth->bqct", q_tok, d_tok, preferred_element_type=jnp.float32
    )  # [B, Tq, B, Td]
    sim = jnp.where(d_mask[None, None, :, :], sim, -jnp.inf)
    best = jnp.max(sim, axis=3)  # [B, Tq, B]
    best = jnp.where(q_mask[:, :, None] & jnp.isfinite(best), best, 0.0)
    # normalize by query length so short probes aren't low-logit (the
    # scale, not the ranking, feeds the softmax temperature)
    n_q = jnp.maximum(jnp.sum(q_mask, axis=1, keepdims=True), 1)
    logits = jnp.sum(best, axis=1) / n_q / temperature  # [B, B]
    labels = jnp.arange(logits.shape[0])
    loss = jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    )
    accuracy = jnp.mean(jnp.argmax(logits, axis=1) == labels)
    return loss, {"loss": loss, "accuracy": accuracy}


def maxsim_train_step(
    state: TrainState,
    query_ids: jax.Array,
    doc_ids: jax.Array,
    tx: optax.GradientTransformation,
    config: EncoderConfig,
    temperature: float = 0.05,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One optimizer step on the MaxSim objective (see train_step for
    the sharding contract)."""

    def loss_fn(p):
        return maxsim_contrastive_loss(p, query_ids, doc_ids, config, temperature)

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_opt_state, state.step + 1), metrics


def train_step(
    state: TrainState,
    query_ids: jax.Array,
    doc_ids: jax.Array,
    tx: optax.GradientTransformation,
    config: EncoderConfig,
    temperature: float = 0.05,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One optimizer step. jit this (with ``static_argnums`` for tx and
    config, or via functools.partial) over a mesh with the batch sharded
    ``P("data")`` and params sharded per
    :func:`trueno_rag_tpu.parallel.mesh.encoder_param_specs`."""

    def loss_fn(p):
        return contrastive_loss(p, query_ids, doc_ids, config, temperature)

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_opt_state, state.step + 1), metrics


def splade_contrastive_loss(
    params: Dict[str, jax.Array],
    query_ids: jax.Array,  # [B, Tq]
    doc_ids: jax.Array,  # [B, Td]
    config: EncoderConfig,
    temperature: float = 1.0,
    lambda_q: float = 5e-4,
    lambda_d: float = 1e-4,
    score_norm: str = "none",
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """InfoNCE over learned-sparse activation dots + the FLOPS
    regularizer — the SPLADE training recipe as one jitted step.

    The score is the DENSE [B, B] activation dot (sparsification is an
    inference-time step; training through the dense dot lets gradient
    flow to every vocab dimension). The FLOPS term
    ``Σ_v (mean_b w(x)_bv)²`` penalizes the expected posting cost of
    each vocab dimension, driving activations sparse and balanced —
    the knob that trades expansion richness for index size/scan cost
    (λ_q > λ_d by convention: query expansion is paid per query).
    Metrics report the live expansion widths so training logs show
    sparsity converging.

    ``score_norm="cosine"`` L2-normalizes the activations INSIDE the
    logits (inference still scores raw dots). The raw-dot objective is
    the published recipe for warm-starting from a pretrained LM; from
    a RANDOM init its logit scale swings over training (measured r3
    lab: loss 28→14→0.2→6.6 oscillation, and the activations stay
    ~60% dense so top-T truncation destroys retrieval — 0.68 vs 0.86
    sparsified recall@10 on the cross-lexical harness). Use
    score_norm="cosine" + temperature≈0.05 + lr 3e-4 when training
    from scratch (tools/quality_eval.py is the pinned reproduction)."""
    from trueno_rag_tpu.models.encoder import _token_states
    from trueno_rag_tpu.models.splade import splade_head

    if score_norm not in ("none", "cosine"):
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(
            f"unknown score_norm {score_norm!r} (none|cosine)"
        )
    qs, qm = _token_states(params, query_ids, config)
    ds, dm = _token_states(params, doc_ids, config)
    q_act = splade_head(params, qs, qm)  # [B, V] >= 0
    d_act = splade_head(params, ds, dm)
    if score_norm == "cosine":
        def _l2(x):
            norm = jnp.linalg.norm(x, axis=1, keepdims=True)
            return x / jnp.where(norm == 0.0, 1.0, norm)

        q_s, d_s = _l2(q_act), _l2(d_act)
    else:
        q_s, d_s = q_act, d_act
    logits = (
        jnp.dot(q_s, d_s.T, preferred_element_type=jnp.float32)
        / temperature
    )  # [B, B]
    labels = jnp.arange(logits.shape[0])
    ce = jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    )
    flops_q = jnp.sum(jnp.mean(q_act, axis=0) ** 2)
    flops_d = jnp.sum(jnp.mean(d_act, axis=0) ** 2)
    loss = ce + lambda_q * flops_q + lambda_d * flops_d
    accuracy = jnp.mean(jnp.argmax(logits, axis=1) == labels)
    return loss, {
        "loss": loss,
        "ce": ce,
        "accuracy": accuracy,
        "flops_q": flops_q,
        "flops_d": flops_d,
        "nnz_q": jnp.mean(jnp.sum(q_act > 0.0, axis=1).astype(jnp.float32)),
        "nnz_d": jnp.mean(jnp.sum(d_act > 0.0, axis=1).astype(jnp.float32)),
    }


def splade_train_step(
    state: TrainState,
    query_ids: jax.Array,
    doc_ids: jax.Array,
    tx: optax.GradientTransformation,
    config: EncoderConfig,
    temperature: float = 1.0,
    lambda_q: float = 5e-4,
    lambda_d: float = 1e-4,
    score_norm: str = "none",
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One optimizer step on the SPLADE objective (see train_step for
    the sharding contract; state.params must come from
    init_splade_params so the head exists)."""

    def loss_fn(p):
        return splade_contrastive_loss(
            p, query_ids, doc_ids, config, temperature, lambda_q, lambda_d,
            score_norm,
        )

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_opt_state, state.step + 1), metrics
