"""Round-3 quality lab: hyperparameter/recipe search for the SPLADE and
MaxSim training rows of tools/quality_eval.py (run manually; not a CI
gate). Findings get encoded back into the package defaults + QUALITY.md.

Run: PYTHONPATH=.:$PYTHONPATH PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       python -u tools/lab_quality_r3.py
"""

from __future__ import annotations

import functools
import random
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tools.quality_eval import (
    build_corpus,
    eval_maxsim,
    eval_splade_product_path,
)


def splade_loss_variant(params, q_ids, d_ids, config, *, norm, temp,
                        lambda_q, lambda_d):
    from trueno_rag_tpu.models.encoder import _token_states
    from trueno_rag_tpu.models.splade import splade_head

    qs, qm = _token_states(params, q_ids, config)
    ds, dm = _token_states(params, d_ids, config)
    q_act = splade_head(params, qs, qm)
    d_act = splade_head(params, ds, dm)
    if norm == "cosine":
        def l2(x):
            n = jnp.linalg.norm(x, axis=1, keepdims=True)
            return x / jnp.where(n == 0.0, 1.0, n)

        logits = jnp.dot(l2(q_act), l2(d_act).T) / temp
    else:
        logits = jnp.dot(q_act, d_act.T) / temp
    labels = jnp.arange(logits.shape[0])
    ce = jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    )
    flops_q = jnp.sum(jnp.mean(q_act, axis=0) ** 2)
    flops_d = jnp.sum(jnp.mean(d_act, axis=0) ** 2)
    loss = ce + lambda_q * flops_q + lambda_d * flops_d
    acc = jnp.mean(jnp.argmax(logits, axis=1) == labels)
    nnz_d = jnp.mean(jnp.sum(d_act > 0.0, axis=1).astype(jnp.float32))
    return loss, {"loss": loss, "ce": ce, "accuracy": acc, "nnz_d": nnz_d}


def run_splade_variant(name, *, norm, temp, lr, lambda_q, lambda_d, steps,
                       batch, train_chunks, index_chunks, valset, evalset,
                       config, tokenizer):
    from trueno_rag_tpu.models.splade import init_splade_params
    from trueno_rag_tpu.train.data import PairBatcher, ict_pairs
    from trueno_rag_tpu.train.loop import evaluate_retrieval

    rng = random.Random(3)
    params = init_splade_params(jax.random.PRNGKey(0), config)
    tx = optax.adamw(lr, weight_decay=0.01)
    opt = tx.init(params)
    batcher = PairBatcher(tokenizer, batch_size=batch, max_len=32)
    stream = batcher.batches(ict_pairs(train_chunks, rng))
    texts = [c.content for c in index_chunks]

    @jax.jit
    def step(params, opt, q_ids, d_ids):
        (_, m), g = jax.value_and_grad(
            functools.partial(
                splade_loss_variant, config=config, norm=norm, temp=temp,
                lambda_q=lambda_q, lambda_d=lambda_d,
            ), has_aux=True)(params, q_ids=q_ids, d_ids=d_ids)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, m

    t0 = time.time()
    best = None
    best_val = -1.0
    for i in range(steps):
        q_ids, d_ids = next(stream)
        params, opt, m = step(params, opt, jnp.asarray(q_ids), jnp.asarray(d_ids))
        if (i + 1) % 300 == 0 or i + 1 == steps:
            val = evaluate_retrieval(params, config, tokenizer, texts,
                                     valset, k=10, mode="splade")
            marker = ""
            if val["recall@10"] > best_val:
                best_val = val["recall@10"]
                best = jax.tree.map(np.asarray, params)
                marker = " *"
            print(f"  [{name}] step {i+1}: loss={float(m['loss']):.3f} "
                  f"acc={float(m['accuracy']):.2f} nnz_d={float(m['nnz_d']):.0f} "
                  f"val(untrunc)={val['recall@10']:.3f}{marker} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    params = jax.tree.map(jnp.asarray, best)
    sparse = eval_splade_product_path(params, config, index_chunks, evalset)
    print(f"  [{name}] TEST sparsified recall@10={sparse['recall@10']:.3f} "
          f"mrr={sparse['mrr']:.3f}", flush=True)
    return sparse["recall@10"]


def main():
    from trueno_rag_tpu.models.encoder import EncoderConfig, HashTokenizer
    from trueno_rag_tpu.train.contrastive import create_train_state
    from trueno_rag_tpu.train.loop import fit

    train_chunks, index_chunks, valset, evalset = build_corpus()
    config = EncoderConfig(vocab_size=4096, hidden_dim=128, num_layers=2,
                           num_heads=4, mlp_dim=256, max_len=32)
    tokenizer = HashTokenizer(config.vocab_size, config.max_len)
    texts = [c.content for c in index_chunks]

    common = dict(train_chunks=train_chunks, index_chunks=index_chunks,
                  valset=valset, evalset=evalset, config=config,
                  tokenizer=tokenizer)

    print("== SPLADE recipe search ==", flush=True)
    run_splade_variant("cos-t0.05-lr3e4", norm="cosine", temp=0.05, lr=3e-4,
                       lambda_q=5e-3, lambda_d=1e-3, steps=1500, batch=16,
                       **common)
    run_splade_variant("raw-t1-lr3e4", norm="none", temp=1.0, lr=3e-4,
                       lambda_q=5e-3, lambda_d=1e-3, steps=1500, batch=16,
                       **common)

    print("== MaxSim warm start ==", flush=True)
    state, tx = create_train_state(jax.random.PRNGKey(0), config)
    result = fit(state, tx, config, tokenizer, train_chunks,
                 steps=1200, batch_size=32, max_len=32, eval_every=200,
                 k=10, seed=3, evalset=valset, eval_corpus=texts)
    pooled = result.state.params
    m = eval_maxsim(pooled, config, tokenizer, texts, evalset)
    print(f"  pooled-trained maxsim eval: {m['recall@10']:.3f}", flush=True)

    from trueno_rag_tpu.train.contrastive import TrainState, create_optimizer

    tx2 = create_optimizer(2e-5)
    warm = TrainState(result.state.params, tx2.init(result.state.params),
                      jnp.zeros((), jnp.int32))
    result_m = fit(warm, tx2, config, tokenizer, train_chunks,
                   steps=800, batch_size=32, max_len=32, eval_every=200,
                   k=10, seed=3, evalset=valset, eval_corpus=texts,
                   objective="maxsim",
                   log=lambda s: print("  " + s, flush=True))
    m2 = eval_maxsim(result_m.state.params, config, tokenizer, texts, evalset)
    print(f"  warm-started maxsim-trained eval: {m2['recall@10']:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
