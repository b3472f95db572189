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
) -> Tuple[TrainState, optax.GradientTransformation]:
    params = init_encoder_params(rng, config)
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
