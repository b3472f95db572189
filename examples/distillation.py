"""Cross-encoder → retriever distillation.

A cross-encoder teacher scores candidate slates once; the dense student
trains to reproduce the teacher's slate score distribution (KL). After
distillation the student's slate rankings agree with the teacher's —
joint-scoring quality at factorized-retrieval cost.
Run: PYTHONPATH=. JAX_PLATFORMS=cpu python examples/distillation.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

if not jax.config.jax_platforms:
    jax.config.update("jax_platforms", "cpu")

from trueno_rag_tpu.models.cross_encoder import CrossEncoderReranker
from trueno_rag_tpu.models.encoder import EncoderConfig, HashTokenizer
from trueno_rag_tpu.train.contrastive import create_train_state
from trueno_rag_tpu.train.distill import distill_step, teacher_slate_scores

cfg = EncoderConfig.tiny()
rng = np.random.default_rng(0)

# --- 1. slates: each query gets C candidates; the teacher scores them ------
words = [f"term{i}" for i in range(60)]
B, C = 8, 4
queries = [" ".join(rng.choice(words, size=4, replace=False)) for _ in range(B)]
slates = [
    [" ".join(rng.choice(words, size=6, replace=False)) for _ in range(C)]
    for _ in range(B)
]
teacher = CrossEncoderReranker(config=cfg, seed=5, max_len=32)
t_scores = teacher_slate_scores(teacher, queries, slates)  # [B, C], cached
# standardize each slate: an untrained teacher's raw logits are nearly
# flat, and KL against a flat target teaches nothing — per-slate
# z-scoring (equivalently, picking temperature_t per slate) keeps the
# teacher's PREFERENCES and gives the student a sharp distribution
t_scores = (t_scores - t_scores.mean(axis=1, keepdims=True)) / (
    t_scores.std(axis=1, keepdims=True) + 1e-6)
print(f"teacher scored {B} slates x {C} candidates")

# --- 2. tokenize for the student ------------------------------------------
tok = HashTokenizer(cfg.vocab_size, 16)
q_ids = tok.encode_batch(queries)
c_rows = tok.encode_batch([t for s in slates for t in s])
width = max(q_ids.shape[1], c_rows.shape[1])
q_ids = np.pad(q_ids, ((0, 0), (0, width - q_ids.shape[1])))
c_ids = np.pad(c_rows, ((0, 0), (0, width - c_rows.shape[1]))).reshape(B, C, width)

# --- 3. distill (KL over slate distributions) ------------------------------
state, tx = create_train_state(jax.random.PRNGKey(0), cfg, learning_rate=5e-3)
step = jax.jit(functools.partial(distill_step, tx=tx, config=cfg,
                                 objective="kl", student="dense"))
first = None
metrics = {}
for i in range(60):
    state, metrics = step(state, query_ids=jnp.asarray(q_ids),
                          cand_ids=jnp.asarray(c_ids),
                          teacher_scores=jnp.asarray(t_scores))
    if first is None:
        first = {k: float(v) for k, v in metrics.items()}
last = {k: float(v) for k, v in metrics.items()}
print(f"step 1:  loss={first['loss']:.4f} agreement={first['agreement']:.2f}")
print(f"step 60: loss={last['loss']:.4f} agreement={last['agreement']:.2f}")
assert last["loss"] < first["loss"]
assert last["agreement"] >= max(first["agreement"], 0.75)
print("distillation example OK")
