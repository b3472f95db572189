"""Neural encoder models — JAX forward passes for query/document embedding.

The reference reaches real models through third-party runtimes: ONNX via
fastembed (embed.rs:419-532) and GGUF via realizar (embed.rs:639-907,
which *skips attention entirely*). Here the models are first-class JAX
programs:

- :mod:`trueno_rag_tpu.models.encoder` — MiniLM/BGE-class bidirectional
  transformer encoder (384/768-d), mean/cls/last-token/weighted-mean
  pooling, bf16 compute on the MXU.
- :mod:`trueno_rag_tpu.models.nemotron` — Nemotron-class decoder-style
  asymmetric embedder (last-token pooling + RMSNorm + L2; the reference's
  instruction prefix), with *real* attention — more faithful than the
  reference's passthrough layers.
- :mod:`trueno_rag_tpu.models.cross_encoder` — neural cross-encoder
- :mod:`trueno_rag_tpu.models.late_interaction` — ColBERT-style MaxSim
  reranking over shared-trunk token states
  reranker scoring (query, passage) pairs on device.

Weights: this environment has no network egress, so constructors default
to deterministic random initialization (seeded) and accept local
checkpoint paths; `save_checkpoint`/`load_checkpoint` round-trip the
param pytree. The embedding *pipeline* (tokenize → forward → pool →
normalize) is identical either way.
"""

from trueno_rag_tpu.models.encoder import (
    EncoderConfig,
    HashTokenizer,
    JaxEncoderEmbedder,
    encoder_forward,
    init_encoder_params,
)
from trueno_rag_tpu.models.nemotron import (
    NEMOTRON_QUERY_PREFIX,
    NemotronConfig,
    NemotronEmbedder,
    init_nemotron_params,
    nemotron_forward,
)
from trueno_rag_tpu.models.cross_encoder import (
    CrossEncoderReranker,
    cross_encoder_scores,
    init_cross_encoder_params,
)
from trueno_rag_tpu.models.late_interaction import (
    LateInteractionReranker,
    LateInteractionRetriever,
    late_interaction_scores,
    maxsim,
)
from trueno_rag_tpu.models.splade import (
    SpladeEncoder,
    SpladeRetriever,
    init_splade_params,
    splade_activations,
)
from trueno_rag_tpu.models.hf_import import (
    load_hf_bert_encoder,
    load_hf_cross_encoder,
    load_hf_rotary_encoder,
)
from trueno_rag_tpu.models.tokenization import WordPieceTokenizer

__all__ = [
    "EncoderConfig",
    "HashTokenizer",
    "JaxEncoderEmbedder",
    "encoder_forward",
    "init_encoder_params",
    "NEMOTRON_QUERY_PREFIX",
    "NemotronConfig",
    "NemotronEmbedder",
    "init_nemotron_params",
    "nemotron_forward",
    "CrossEncoderReranker",
    "LateInteractionReranker",
    "LateInteractionRetriever",
    "late_interaction_scores",
    "maxsim",
    "SpladeEncoder",
    "SpladeRetriever",
    "init_splade_params",
    "splade_activations",
    "cross_encoder_scores",
    "init_cross_encoder_params",
    "load_hf_bert_encoder",
    "load_hf_cross_encoder",
    "load_hf_rotary_encoder",
    "WordPieceTokenizer",
]
