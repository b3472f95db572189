"""Training checkpoint/resume.

The reference's checkpoint story is index snapshots only (SURVEY §5);
training needs its own: params + optimizer state + step, saved with
orbax (the standard JAX checkpointing library) so sharded arrays
restore onto whatever mesh the resuming process uses.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from trueno_rag_tpu.errors import SerializationError
from trueno_rag_tpu.train.contrastive import TrainState


def save_train_state(path: str, state: TrainState) -> None:
    """Save params/opt_state/step under ``path`` (a directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    # device arrays -> host so restore never needs the original topology
    host_state = jax.tree.map(lambda x: np.asarray(x), state._asdict())
    ckptr.save(path, host_state, force=True)


def load_train_state(path: str, template: Optional[TrainState] = None) -> TrainState:
    """Restore a TrainState. ``template`` (an initialized state with the
    right structure) guides pytree reconstruction when provided."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not os.path.exists(path):
        raise SerializationError(f"no checkpoint at {path}")
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        item = jax.tree.map(lambda x: np.asarray(x), template._asdict())
        restored = ckptr.restore(path, item=item)
    else:
        restored = ckptr.restore(path)
    return TrainState(**restored)
