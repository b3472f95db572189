"""Contrastive fine-tuning of the retrieval encoder on its own corpus
(Inverse Cloze Task pairs), data-parallel over the available devices,
with checkpointing.

Run: PYTHONPATH=. PALLAS_AXON_POOL_IPS= python examples/training.py
"""

import functools
import random
import tempfile

import jax
import jax.numpy as jnp

from trueno_rag_tpu import Document, RecursiveChunker
from trueno_rag_tpu.models.encoder import EncoderConfig, HashTokenizer
from trueno_rag_tpu.train import create_train_state, fit, train_step
from trueno_rag_tpu.train.checkpoint import load_train_state
from trueno_rag_tpu.train.data import PairBatcher, ict_pairs

CORPUS = [
    "Dense retrieval encodes queries and passages into one vector space. "
    "Similar meanings land close together. Cosine similarity ranks them.",
    "BM25 weights terms by frequency and rarity. It rewards exact matches. "
    "Inverted indexes make it fast.",
    "TPUs multiply matrices in systolic arrays. HBM feeds the compute units. "
    "Batching keeps the hardware busy.",
    "Chunking splits documents into retrievable pieces. Overlap preserves "
    "context. Offsets map chunks back to sources.",
]


def main() -> None:
    config = EncoderConfig(vocab_size=2048, hidden_dim=128, num_layers=2,
                           num_heads=4, mlp_dim=256, max_len=64)
    state, tx = create_train_state(jax.random.PRNGKey(0), config, learning_rate=5e-4)

    chunker = RecursiveChunker(chunk_size=200, overlap=20)
    chunks = [c for text in CORPUS for c in chunker.chunk(Document(text))]
    tokenizer = HashTokenizer(config.vocab_size, config.max_len)

    # Eval-driven fit: retrieval quality (recall on held-out ICT probes
    # against the live index) picks the checkpoint, not the loss curve.
    with tempfile.TemporaryDirectory() as tmp:
        result = fit(
            state, tx, config, tokenizer, chunks,
            steps=20, batch_size=16, eval_every=10, eval_queries=8, k=3,
            select_metric="recall@3", checkpoint_dir=tmp, seed=0, log=print,
        )
        print(f"best recall@3={result.best_metric:.3f} at step {result.best_step}; "
              f"checkpoint: {result.best_checkpoint}")
        template, _ = create_train_state(jax.random.PRNGKey(0), config, learning_rate=5e-4)
        restored = load_train_state(result.best_checkpoint, template=template)
        print(f"best-checkpoint round-trip OK (step {int(restored.step)})")

    # The raw step loop is still available for custom schedules:
    step = jax.jit(functools.partial(train_step, tx=tx, config=config))
    batcher = PairBatcher(tokenizer, batch_size=16, max_len=config.max_len)
    stream = batcher.batches(ict_pairs(chunks, random.Random(0)))
    q_ids, d_ids = next(stream)
    _, metrics = step(result.state, jnp.asarray(q_ids), jnp.asarray(d_ids))
    print(f"one more manual step: loss={float(metrics['loss']):.4f}")


if __name__ == "__main__":
    main()
