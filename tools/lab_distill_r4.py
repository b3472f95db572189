"""Round-4 distillation lab: slate-composition / step-count search for
the distillation row of tools/quality_eval.py (r3 verdict weak #6: the
0.349 student has headroom — try hard-negative slates, more steps).
Run manually; findings get encoded back into run_distillation.

Run: PYTHONPATH=.:$PYTHONPATH PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       python -u tools/lab_distill_r4.py
"""

from __future__ import annotations

import functools
import pickle
import random as _random
import time

import numpy as np

CACHE = "/tmp/lab_distill_teacher.pkl"


def get_teacher():
    import jax

    from tools.quality_eval import build_corpus
    from trueno_rag_tpu.models.encoder import EncoderConfig, HashTokenizer
    from trueno_rag_tpu.train.contrastive import create_train_state
    from trueno_rag_tpu.train.loop import fit

    train_chunks, index_chunks, valset, evalset = build_corpus()
    texts = [c.content for c in index_chunks]
    config = EncoderConfig(vocab_size=4096, hidden_dim=128, num_layers=2,
                           num_heads=4, mlp_dim=256, max_len=32)
    tokenizer = HashTokenizer(config.vocab_size, config.max_len)
    try:
        with open(CACHE, "rb") as f:
            params = pickle.load(f)
        print("teacher: cache hit", flush=True)
    except FileNotFoundError:
        state, tx = create_train_state(jax.random.PRNGKey(0), config)
        result = fit(state, tx, config, tokenizer, train_chunks,
                     steps=1200, batch_size=32, max_len=32, eval_every=200,
                     k=10, seed=3, evalset=valset, eval_corpus=texts,
                     log=lambda m: print("  " + m, flush=True))
        import jax as _jax

        params = _jax.tree.map(np.asarray, result.state.params)
        with open(CACHE, "wb") as f:
            pickle.dump(params, f)
    return params, config, tokenizer, train_chunks, valset, evalset, texts


def distill_variant(name, teacher, *, steps=1000, slate=8, plan=("top", 4),
                    lr=1e-4, seed=5):
    """plan: tuple list like (("top",2),("hard",3),("rand",3)) — hard
    negatives sample uniformly from teacher ranks [n_top, 32)."""
    import jax
    import jax.numpy as jnp

    from trueno_rag_tpu.models.encoder import EncoderConfig, HashTokenizer
    from trueno_rag_tpu.train.contrastive import create_train_state
    from trueno_rag_tpu.train.distill import distill_step
    from trueno_rag_tpu.train.loop import _encode_texts, evaluate_retrieval
    from trueno_rag_tpu.chunking import split_sentences

    (t_params, t_config, t_tok, train_chunks, valset, evalset, texts) = teacher
    rng = _random.Random(seed)
    s_config = EncoderConfig(vocab_size=t_config.vocab_size, hidden_dim=64,
                             num_layers=1, num_heads=2, mlp_dim=128,
                             max_len=t_config.max_len)
    s_tok = HashTokenizer(s_config.vocab_size, s_config.max_len)
    state, tx = create_train_state(jax.random.PRNGKey(seed), s_config,
                                   learning_rate=lr)

    doc_texts = [c.content for c in train_chunks]
    d_mat = np.asarray(_encode_texts(t_params, t_config, t_tok, doc_texts))
    queries = []
    for c in train_chunks:
        spans = split_sentences(c.content)
        s, e = spans[rng.randrange(len(spans))]
        queries.append(c.content[s:e].strip())
    q_mat = np.asarray(_encode_texts(t_params, t_config, t_tok, queries))
    sims = q_mat @ d_mat.T
    n_docs = sims.shape[1]
    ranked = np.argsort(-sims, axis=1)

    if isinstance(plan[0], str):
        plan = (plan,)
    parts = []
    used = 0
    for kind, cnt in plan:
        if kind == "top":
            parts.append(ranked[:, :cnt])
            used = max(used, cnt)
        elif kind == "hard":
            hard = np.stack([
                ranked[qi, rng.sample(range(used, min(32, n_docs)), cnt)]
                for qi in range(len(queries))
            ])
            parts.append(hard)
        else:
            parts.append(np.stack([
                rng.sample(range(n_docs), cnt) for _ in range(len(queries))
            ]).astype(np.int64))
    top = np.concatenate(parts, axis=1)
    teacher_scores = np.take_along_axis(sims, top, axis=1)

    step_fn = jax.jit(functools.partial(
        distill_step, tx=tx, config=s_config, objective="kl",
        temperature_t=0.05))
    ids_q = s_tok.encode_batch(queries)
    ids_d = s_tok.encode_batch(doc_texts)
    n = len(queries)
    best, best_metric = None, -1.0
    t0 = time.perf_counter()
    for i in range(steps):
        pick = [rng.randrange(n) for _ in range(32)]
        state, metrics = step_fn(
            state, jnp.asarray(ids_q[pick]),
            jnp.asarray(np.stack([ids_d[top[p]] for p in pick])),
            jnp.asarray(teacher_scores[pick]))
        if (i + 1) % 200 == 0:
            val = evaluate_retrieval(state.params, s_config, s_tok, texts,
                                     valset, k=10)
            if val["recall@10"] > best_metric:
                best_metric = val["recall@10"]
                best = jax.tree.map(np.asarray, state.params)
    final = evaluate_retrieval(best if best is not None else state.params,
                               s_config, s_tok, texts, evalset, k=10)
    print(f"{name:32s} recall@10={final['recall@10']:.3f} "
          f"ndcg@10={final['ndcg@10']:.3f} mrr={final['mrr']:.3f} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)
    return final


def main():
    teacher = get_teacher()
    distill_variant("baseline top4+rand4 1000", teacher,
                    plan=(("top", 4), ("rand", 4)), steps=1000)
    distill_variant("hard top2+hard3+rand3 1000", teacher,
                    plan=(("top", 2), ("hard", 3), ("rand", 3)), steps=1000)
    distill_variant("hard top2+hard3+rand3 2000", teacher,
                    plan=(("top", 2), ("hard", 3), ("rand", 3)), steps=2000)
    distill_variant("hard lr3e-4 2000", teacher,
                    plan=(("top", 2), ("hard", 3), ("rand", 3)), steps=2000,
                    lr=3e-4)
    distill_variant("baseline lr3e-4 2000", teacher,
                    plan=(("top", 4), ("rand", 4)), steps=2000, lr=3e-4)


if __name__ == "__main__":
    main()
