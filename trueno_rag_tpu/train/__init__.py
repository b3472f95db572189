"""Training: contrastive fine-tuning of the retrieval encoders.

The reference's only trainable component is TF-IDF ``fit``
(embed.rs:219-254). A TPU-native retrieval framework owns its encoder
quality too: :mod:`trueno_rag_tpu.train.contrastive` implements
in-batch-negative InfoNCE training (the standard recipe behind
MiniLM/BGE-class retrieval encoders), sharded data-parallel over the
mesh's ``data`` axis with optional tensor parallelism on ``model``.
"""

from trueno_rag_tpu.train.contrastive import (
    TrainState,
    contrastive_loss,
    create_train_state,
    train_step,
)
from trueno_rag_tpu.train.loop import (
    EvalSet,
    FitResult,
    build_ict_evalset,
    evaluate_retrieval,
    fit,
)

__all__ = [
    "TrainState",
    "contrastive_loss",
    "create_train_state",
    "train_step",
    "EvalSet",
    "FitResult",
    "build_ict_evalset",
    "evaluate_retrieval",
    "fit",
]
