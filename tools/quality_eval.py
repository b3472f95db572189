"""Retrieval-quality evaluation: trained encoder vs the untrained and
hash baselines (QUALITY.md's reproducing script).

The reference's embedder story is pretrained models producing
semantically meaningful vectors (reference: embed.rs:419-532 fastembed
ONNX download). This image ships no pretrained checkpoints and has no
egress, so semantic capability is demonstrated the only honest way
available: TRAIN the JAX encoder with the in-repo contrastive loop on
a corpus whose structure is learnable but invisible to lexical
matching, and measure retrieval with the device metrics evaluator.

Corpus construction — the eval REQUIRES cross-lexical generalization:
- each topic's vocabulary splits into halves A and B;
- TRAINING docs mix A+B sentences (ICT pairs link the halves through
  co-occurrence);
- the INDEXED eval corpus uses A words ONLY; eval queries use B words
  ONLY, relevant = the indexed docs of the query's topic.
A query shares ZERO tokens with every relevant document, so any
bag-of-lexical-features model — the hash MockEmbedder, or an untrained
encoder whose random word vectors only match on shared tokens — sits
at chance. Only an encoder that has LEARNED that A- and B-words of a
topic co-occur can bridge the gap; that is what contrastive training
provides, and what this table demonstrates.

Run: PYTHONPATH=.:$PYTHONPATH PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       python -u tools/quality_eval.py          (or: make quality)
"""

from __future__ import annotations

import random


def build_corpus(n_topics=32, train_docs=8, index_docs=4, half_words=15,
                 sent_words=6, sents_per_doc=3, queries_per_topic=3,
                 val_queries_per_topic=2, seed=0):
    """Returns (train_chunks, index_chunks, val EvalSet, test EvalSet).

    Validation and test probes are built the same way (B-word queries
    against the A-word index) from independent draws — fit() uses the
    validation set for best-state selection; the test set is only ever
    scored, never selected on.
    """
    from trueno_rag_tpu.chunking import Chunk
    from trueno_rag_tpu.train.loop import EvalSet

    rng = random.Random(seed)

    def mk_chunk(topic, words_pool, n_sents):
        sents = [
            " ".join(rng.sample(words_pool, sent_words)) + "."
            for _ in range(n_sents)
        ]
        text = " ".join(sents)
        return Chunk(document_id=f"topic{topic}", content=text,
                     start_offset=0, end_offset=len(text))

    train_chunks, index_chunks = [], []
    test = EvalSet(queries=[], relevant=[])
    val = EvalSet(queries=[], relevant=[])
    for t in range(n_topics):
        a = [f"t{t:02d}a{j:02d}" for j in range(half_words)]
        b = [f"t{t:02d}b{j:02d}" for j in range(half_words)]
        for _ in range(train_docs):
            train_chunks.append(mk_chunk(t, a + b, sents_per_doc))
        rows = []
        for _ in range(index_docs):
            rows.append(len(index_chunks))
            index_chunks.append(mk_chunk(t, a, sents_per_doc))
        for dst, n in ((test, queries_per_topic), (val, val_queries_per_topic)):
            for _ in range(n):
                dst.queries.append(" ".join(rng.sample(b, sent_words)))
                dst.relevant.append(list(rows))
    return train_chunks, index_chunks, val, test


def eval_embedder(embed_fn, chunk_texts, evalset, k=10):
    """Generic evaluation: any texts->[N,d] encoder against the probes."""
    import jax.numpy as jnp
    import numpy as np

    from trueno_rag_tpu.ops.dense import dense_topk
    from trueno_rag_tpu.ops.metrics import batched_metrics

    matrix = jnp.asarray(np.asarray(embed_fn(chunk_texts), dtype=np.float32))
    qvecs = jnp.asarray(np.asarray(embed_fn(evalset.queries), dtype=np.float32))
    valid = jnp.ones((matrix.shape[0],), bool)
    _, rows = dense_topk(qvecs, matrix, valid, k, "cosine")
    width = max(len(r) for r in evalset.relevant)
    rel = np.full((len(evalset.relevant), width), -1, np.int32)
    for i, r in enumerate(evalset.relevant):
        rel[i, : len(r)] = r
    per_q = batched_metrics(rows, jnp.asarray(rel), k_values=(1, 5, k))
    return {name: float(jnp.mean(v)) for name, v in per_q.items()}


def eval_maxsim(params, config, tokenizer, chunk_texts, evalset, k=10):
    """Late-interaction evaluation: the SAME trunk's per-token states,
    scored with exact full-corpus MaxSim (ops/maxsim.maxsim_scan_topk)
    instead of pooled cosine — the quality check that the multi-vector
    tier's fine-grained matching preserves what training learned."""
    import jax.numpy as jnp
    import numpy as np

    from trueno_rag_tpu.models.late_interaction import _l2_tokens, _token_states_jit
    from trueno_rag_tpu.ops.maxsim import maxsim_scan_topk
    from trueno_rag_tpu.ops.metrics import batched_metrics

    ids = tokenizer.encode_batch(chunk_texts)
    tok, mask = _token_states_jit(params, jnp.asarray(ids), config)
    tok = _l2_tokens(tok)
    qids = tokenizer.encode_batch(evalset.queries)
    q_tok, q_mask = _token_states_jit(params, jnp.asarray(qids), config)
    q_tok = _l2_tokens(q_tok)
    valid = jnp.ones((tok.shape[0],), bool)
    _, rows = maxsim_scan_topk(q_tok, q_mask, tok, mask, valid, k, 128)
    width = max(len(r) for r in evalset.relevant)
    rel = np.full((len(evalset.relevant), width), -1, np.int32)
    for i, r in enumerate(evalset.relevant):
        rel[i, : len(r)] = r
    per_q = batched_metrics(rows, jnp.asarray(rel), k_values=(1, 5, k))
    return {name: float(jnp.mean(v)) for name, v in per_q.items()}


def eval_rows_metrics(rows_per_query, evalset, k=10):
    """Metrics from precomputed candidate-row lists (product-path evals
    that already ran retrieval: BM25, sparsified SPLADE, tri-hybrid)."""
    import jax.numpy as jnp
    import numpy as np

    from trueno_rag_tpu.ops.metrics import batched_metrics

    q = len(evalset.queries)
    rows = np.full((q, k), -1, np.int32)
    for i, r in enumerate(rows_per_query):
        r = list(r)[:k]
        rows[i, : len(r)] = r
    width = max(len(r) for r in evalset.relevant)
    rel = np.full((q, width), -1, np.int32)
    for i, r in enumerate(evalset.relevant):
        rel[i, : len(r)] = r
    per_q = batched_metrics(jnp.asarray(rows), jnp.asarray(rel),
                            k_values=(1, 5, k))
    return {name: float(jnp.mean(v)) for name, v in per_q.items()}


def eval_bm25(index_chunks, evalset, k=10):
    """Classic BM25 over the indexed corpus — the lexical baseline the
    learned-sparse family must beat on zero-overlap probes."""
    from trueno_rag_tpu.index.bm25 import BM25Index

    idx = BM25Index()
    idx.add_batch(index_chunks)
    row_of = {c.id: i for i, c in enumerate(index_chunks)}
    rows = []
    for qtext in evalset.queries:
        hits = idx.search_host(qtext, k)
        rows.append([row_of[cid] for cid, _ in hits])
    return eval_rows_metrics(rows, evalset, k)


def eval_splade_product_path(params, config, index_chunks, evalset, k=10,
                             doc_top=128, query_top=32):
    """Sparsified learned-sparse retrieval through the REAL product
    path: SpladeEncoder top-T expansions -> LearnedSparseIndex postings
    -> weighted scoring (what serving runs, truncation included)."""
    from trueno_rag_tpu.index.learned_sparse import LearnedSparseIndex
    from trueno_rag_tpu.models.splade import SpladeEncoder

    enc = SpladeEncoder(config=config, params=params,
                        max_len=config.max_len, doc_top=doc_top,
                        query_top=query_top)
    li = LearnedSparseIndex()
    texts = [c.content for c in index_chunks]
    terms, weights = enc.expand_documents(texts)
    li.add_batch(index_chunks, terms, weights)  # rows allocate 0..n-1
    q_terms, q_w = enc.expand_queries(list(evalset.queries))
    rows = []
    for i in range(len(evalset.queries)):
        hits = li.search_host(q_terms[i], q_w[i], k)
        rows.append([r for r, _ in hits])
    return eval_rows_metrics(rows, evalset, k)


def build_tri_corpus(n_topics=32, index_docs=4, half_words=15,
                     exact_words=6, sent_words=6, sents_per_doc=3,
                     probes_per_topic=2, seed=17):
    """Complementarity corpus for the tri-hybrid eval, reusing the
    cross-lexical training vocabulary (the SAME trained dense/SPLADE
    models score it zero-shot):

    - index docs: topic A-words plus the topic's X exact-match tokens
      (X never occurs in TRAINING data, so no learned model can bridge
      to it);
    - SEMANTIC probes: B-words only — learned models bridge B->A,
      BM25 sits at chance;
    - LEXICAL probes: X-tokens only — BM25 matches exactly, learned
      models sit at chance.

    No single source can do well on both halves; fusion can. This is
    the quality claim behind hybrid retrieval (retrieve.rs:175-220),
    measured instead of asserted.
    """
    import random as _random

    from trueno_rag_tpu.chunking import Chunk
    from trueno_rag_tpu.train.loop import EvalSet

    rng = _random.Random(seed)
    index_chunks = []
    probes = EvalSet(queries=[], relevant=[])
    kinds = []  # parallel to probes.queries: "semantic" | "lexical"
    for t in range(n_topics):
        a = [f"t{t:02d}a{j:02d}" for j in range(half_words)]
        b = [f"t{t:02d}b{j:02d}" for j in range(half_words)]
        x = [f"t{t:02d}x{j:02d}" for j in range(exact_words)]
        rows = []
        for _ in range(index_docs):
            sents = [
                " ".join(rng.sample(a, sent_words)) + "."
                for _ in range(sents_per_doc)
            ]
            sents.append(" ".join(x) + ".")
            text = " ".join(sents)
            rows.append(len(index_chunks))
            index_chunks.append(Chunk(document_id=f"topic{t}", content=text,
                                      start_offset=0, end_offset=len(text)))
        for _ in range(probes_per_topic):
            probes.queries.append(" ".join(rng.sample(b, sent_words)))
            probes.relevant.append(list(rows))
            kinds.append("semantic")
            probes.queries.append(" ".join(rng.sample(x, min(4, exact_words))))
            probes.relevant.append(list(rows))
            kinds.append("lexical")
    return index_chunks, probes, kinds


def eval_tri_hybrid(dense_params, dense_config, splade_params,
                    index_chunks, probes, k=10):
    """Dense + BM25 + learned-sparse through HybridRetriever (the
    product surface), per-source and fused — returns
    {source: metrics}. Sources toggle via the retriever config flags,
    exactly how a user would A/B them."""
    from trueno_rag_tpu.fusion import FusionStrategy
    from trueno_rag_tpu.models.encoder import JaxEncoderEmbedder
    from trueno_rag_tpu.models.splade import SpladeEncoder
    from trueno_rag_tpu.retrieve import HybridRetriever, HybridRetrieverConfig

    emb = JaxEncoderEmbedder(config=dense_config, params=dense_params)
    cfg = HybridRetrieverConfig(candidates_per_source=32,
                                fusion=FusionStrategy.rrf(60.0))
    retr = HybridRetriever(emb, config=cfg)
    emb.embed_chunks(index_chunks)
    retr.index_batch(index_chunks)
    retr.attach_learned_sparse(SpladeEncoder(
        config=dense_config, params=splade_params,
        max_len=dense_config.max_len))
    row_of = {c.id: i for i, c in enumerate(index_chunks)}

    def run(use_dense, use_sparse, use_learned):
        retr.config.use_dense = use_dense
        retr.config.use_sparse = use_sparse
        retr.config.use_learned = use_learned
        out = retr.retrieve_batch(list(probes.queries), k)
        rows = [[row_of[r.chunk.id] for r in res] for res in out]
        return eval_rows_metrics(rows, probes, k)

    return {
        "dense only": run(True, False, False),
        "bm25 only": run(False, True, False),
        "learned only": run(False, False, True),
        "tri-hybrid (rrf)": run(True, True, True),
    }


def run_distillation(teacher_params, teacher_config, tokenizer,
                     train_chunks, valset, evalset, eval_texts,
                     steps=1000, batch=32, slate=8, seed=5):
    """Teacher->student distillation lift: a SMALLER student trained
    only on teacher slate scores (train/distill.py KL) vs its
    undistilled twin. Returns (student metrics untrained, distilled).

    Slates are the teacher's own top-C training docs per ICT query —
    the standard dense-teacher distillation recipe; the student never
    sees a label, only the teacher's score distribution.

    Recipe (r4 lab, tools/lab_distill_r4.py): the r3 student's 0.349
    recall@10 was a LEARNING-RATE artifact, not a slate problem —
    lr 1e-4 @ 1000 steps 0.349, lr 3e-4 0.682, **lr 1e-3 0.982** (same
    steps; the 1L/64d student then beats the teacher's own 0.917 dense
    row on this task). Hard-negative slates (teacher ranks 3-32 mixed
    in) measured WORSE than top-4+random-4 at every lr tried (0.279 vs
    0.349 at 1e-4, 0.797 vs 0.862 at 3e-4/2000) — on this corpus the
    random half's spread of teacher scores is the signal, and
    mid-rank hards flatten it back toward the same-topic plateau."""
    import functools
    import random as _random

    import jax
    import jax.numpy as jnp
    import numpy as np

    from trueno_rag_tpu.models.encoder import EncoderConfig, HashTokenizer
    from trueno_rag_tpu.train.contrastive import create_train_state
    from trueno_rag_tpu.train.distill import distill_step
    from trueno_rag_tpu.train.loop import _encode_texts, evaluate_retrieval

    rng = _random.Random(seed)
    s_config = EncoderConfig(
        vocab_size=teacher_config.vocab_size, hidden_dim=64, num_layers=1,
        num_heads=2, mlp_dim=128, max_len=teacher_config.max_len,
    )
    s_tokenizer = HashTokenizer(s_config.vocab_size, s_config.max_len)
    state, tx = create_train_state(jax.random.PRNGKey(seed), s_config,
                                   learning_rate=1e-3)
    untrained = evaluate_retrieval(state.params, s_config, s_tokenizer,
                                   eval_texts, evalset, k=10)

    # teacher encodes the train corpus once; per-query slates = its own
    # top-C rows (teacher scores, not labels, supervise the student)
    doc_texts = [c.content for c in train_chunks]
    d_mat = np.asarray(_encode_texts(teacher_params, teacher_config,
                                     tokenizer, doc_texts))
    queries = []
    for c in train_chunks:
        from trueno_rag_tpu.chunking import split_sentences

        spans = split_sentences(c.content)
        s, e = spans[rng.randrange(len(spans))]
        queries.append(c.content[s:e].strip())
    q_mat = np.asarray(_encode_texts(teacher_params, teacher_config,
                                     tokenizer, queries))
    sims = q_mat @ d_mat.T  # teacher slate scores, [Q, N]
    # Slates mix the teacher's top docs with RANDOM docs: a pure top-C
    # slate on this corpus is all same-topic positives with near-equal
    # teacher scores — a flat distribution that teaches the student
    # nothing (measured r3: 0.104 vs 0.094 untrained). The random half
    # supplies the negatives whose teacher scores carry the topic
    # structure.
    n_docs = sims.shape[1]
    n_top = max(1, slate // 2)
    top_part = np.argsort(-sims, axis=1)[:, :n_top]  # [Q, n_top]
    rand_part = np.stack([
        rng.sample(range(n_docs), slate - n_top) for _ in range(len(queries))
    ]).astype(np.int64)
    top = np.concatenate([top_part, rand_part], axis=1)  # [Q, C]
    teacher_scores = np.take_along_axis(sims, top, axis=1)  # [Q, C]

    step_fn = jax.jit(functools.partial(
        distill_step, tx=tx, config=s_config, objective="kl",
        temperature_t=0.05,  # teacher cosines share the student's scale
    ))
    ids_q = s_tokenizer.encode_batch(queries)
    ids_d = s_tokenizer.encode_batch(doc_texts)
    n = len(queries)
    best = None
    best_metric = -1.0
    for i in range(steps):
        pick = [rng.randrange(n) for _ in range(batch)]
        qb = ids_q[pick]
        cb = np.stack([ids_d[top[p]] for p in pick])  # [B, C, T]
        tb = teacher_scores[pick]
        state, metrics = step_fn(state, jnp.asarray(qb), jnp.asarray(cb),
                                 jnp.asarray(tb))
        if (i + 1) % 100 == 0:
            val = evaluate_retrieval(state.params, s_config, s_tokenizer,
                                     eval_texts, valset, k=10)
            print(f"  distill step {i + 1}: loss={float(metrics['loss']):.4f} "
                  f"agree={float(metrics['agreement']):.2f} "
                  f"val recall@10={val['recall@10']:.3f}")
            if val["recall@10"] > best_metric:
                best_metric = val["recall@10"]
                best = jax.tree.map(np.asarray, state.params)
    distilled = evaluate_retrieval(best if best is not None else state.params,
                                   s_config, s_tokenizer, eval_texts,
                                   evalset, k=10)
    return untrained, distilled


def main() -> None:
    import functools

    import jax

    from trueno_rag_tpu.embed import MockEmbedder
    from trueno_rag_tpu.models.encoder import EncoderConfig, HashTokenizer
    from trueno_rag_tpu.train.contrastive import create_train_state
    from trueno_rag_tpu.train.loop import _encode_texts, fit

    train_chunks, index_chunks, valset, evalset = build_corpus()
    texts = [c.content for c in index_chunks]
    print(f"train corpus: {len(train_chunks)} chunks; eval index: "
          f"{len(texts)} chunks; {len(evalset.queries)} zero-overlap test "
          f"probes (+{len(valset.queries)} validation)")

    config = EncoderConfig(
        vocab_size=4096, hidden_dim=128, num_layers=2, num_heads=4,
        mlp_dim=256, max_len=32,
    )
    tokenizer = HashTokenizer(config.vocab_size, config.max_len)

    results = []

    def record(name, m):
        results.append((name, m))
        print(f"{name:24s} recall@10={m['recall@10']:.3f} "
              f"ndcg@10={m['ndcg@10']:.3f} mrr={m['mrr']:.3f}")

    mock = MockEmbedder(dimension=128)
    record("hash (MockEmbedder)", eval_embedder(mock.embed_batch, texts, evalset))

    state, tx = create_train_state(jax.random.PRNGKey(0), config)

    def enc(params):
        return functools.partial(_encode_texts, params, config, tokenizer)

    record("encoder, untrained", eval_embedder(enc(state.params), texts, evalset))

    # Best-state selection runs on the held-out VALIDATION task (the
    # same cross-lexical construction, independent query draws): the
    # default self-ICT probes are exact substrings, which an untrained
    # encoder saturates at step 0 — selection would never leave the
    # initialization (measured: trained == untrained row, round 2).
    result = fit(
        state, tx, config, tokenizer, train_chunks,
        steps=1200, batch_size=32, max_len=32, eval_every=200,
        k=10, seed=3, evalset=valset, eval_corpus=texts,
        log=lambda msg: print("  " + msg),
    )
    record("encoder, trained (ICT)",
           eval_embedder(enc(result.state.params), texts, evalset))
    trained_pooled = results[-1][1]["recall@10"]

    # the MaxSim (late-interaction) tier: untrained baseline, the
    # pooled-trained trunk (measures objective mismatch), and a trunk
    # trained THROUGH the MaxSim score (the ColBERT recipe)
    record("maxsim, untrained",
           eval_maxsim(state.params, config, tokenizer, texts, evalset))
    record("maxsim, pooled-trained",
           eval_maxsim(result.state.params, config, tokenizer, texts, evalset))

    # WARM-STARTED from the pooled-trained trunk (the ColBERT recipe:
    # late interaction fine-tunes an already-semantic encoder; from a
    # cold init token-level InfoNCE reached only 0.633 in 1200 steps,
    # r3 lab — warm-started it passes the dense row in 800)
    import jax.numpy as jnp

    from trueno_rag_tpu.train.contrastive import TrainState, create_optimizer

    tx_m = create_optimizer(2e-5)
    warm = TrainState(result.state.params, tx_m.init(result.state.params),
                      jnp.zeros((), jnp.int32))
    result_m = fit(
        warm, tx_m, config, tokenizer, train_chunks,
        steps=800, batch_size=32, max_len=32, eval_every=200,
        k=10, seed=3, evalset=valset, eval_corpus=texts,
        objective="maxsim",
        log=lambda msg: print("  " + msg),
    )
    record("maxsim, maxsim-trained (warm)",
           eval_maxsim(result_m.state.params, config, tokenizer, texts, evalset))
    trained_maxsim = results[-1][1]["recall@10"]
    assert trained_maxsim > results[-3][1]["recall@10"] + 0.2, (
        "MaxSim-objective training failed to beat the untrained MaxSim tier")
    assert trained_maxsim > trained_pooled, (
        f"late interaction failed to beat the single-vector dense row: "
        f"{trained_maxsim} vs {trained_pooled}")

    trained = trained_pooled
    baseline = max(results[0][1]["recall@10"], results[1][1]["recall@10"])
    assert trained > baseline + 0.2, (
        f"training failed to beat the baselines: {trained} vs {baseline}")
    print(f"\ntrained beats best baseline by {trained - baseline:+.3f} recall@10")

    # ---- learned-sparse (SPLADE) family vs the BM25 lexical baseline ----
    print("\n== learned-sparse family (cross-lexical probes) ==")
    record("bm25 (lexical)", eval_bm25(index_chunks, evalset))
    bm25_recall = results[-1][1]["recall@10"]
    state_s, tx_s = create_train_state(jax.random.PRNGKey(0), config,
                                       learning_rate=3e-4, kind="splade")
    record("splade, untrained (sparsified)",
           eval_splade_product_path(state_s.params, config, index_chunks,
                                    evalset))
    splade_untrained = results[-1][1]["recall@10"]
    # the from-scratch recipe (r3 lab, splade_contrastive_loss
    # docstring): cosine-normalized logits, temp 0.05, lr 3e-4 —
    # raw-dot InfoNCE from random init oscillates and stays ~60% dense,
    # so top-T truncation destroys retrieval (0.68 vs 0.86 recall@10)
    result_s = fit(
        state_s, tx_s, config, tokenizer, train_chunks,
        steps=1500, batch_size=16, max_len=32, eval_every=300,
        k=10, seed=3, evalset=valset, eval_corpus=texts,
        objective="splade", temperature=0.05,
        objective_kwargs={"score_norm": "cosine", "lambda_q": 5e-3,
                          "lambda_d": 1e-3},
        log=lambda msg: print("  " + msg),
    )
    record("splade, trained (sparsified)",
           eval_splade_product_path(result_s.state.params, config,
                                    index_chunks, evalset))
    splade_trained = results[-1][1]["recall@10"]
    assert splade_trained > bm25_recall + 0.2, (
        f"trained SPLADE failed to beat BM25 on zero-overlap probes: "
        f"{splade_trained} vs {bm25_recall}")
    assert splade_trained > splade_untrained + 0.2, (
        f"SPLADE training produced no retrieval lift: "
        f"{splade_trained} vs {splade_untrained}")

    # ---- tri-hybrid: fusion must beat every single source ----
    print("\n== tri-hybrid complementarity (semantic + exact-match probes) ==")
    tri_chunks, tri_probes, kinds = build_tri_corpus()
    n_sem = sum(1 for kk in kinds if kk == "semantic")
    print(f"tri corpus: {len(tri_chunks)} chunks; {n_sem} semantic + "
          f"{len(kinds) - n_sem} lexical probes")
    tri = eval_tri_hybrid(result.state.params, config,
                          result_s.state.params, tri_chunks, tri_probes)
    for name, m in tri.items():
        record("tri: " + name, m)
    singles = [tri[s]["recall@10"]
               for s in ("dense only", "bm25 only", "learned only")]
    tri_fused = tri["tri-hybrid (rrf)"]["recall@10"]
    assert tri_fused > max(singles) + 0.1, (
        f"tri-hybrid fusion failed to beat the best single source: "
        f"{tri_fused} vs {max(singles)}")

    # ---- distillation: teacher -> smaller student ----
    print("\n== distillation (teacher: trained encoder; student: 1L/64d) ==")
    unt, dist = run_distillation(result.state.params, config, tokenizer,
                                 train_chunks, valset, evalset, texts)
    record("student 1L/64d, untrained", unt)
    record("student 1L/64d, distilled", dist)
    # r4 recipe (lr 1e-3) reaches ~0.98; assert a wide margin over the
    # untrained twin AND absolute quality near the teacher's dense row
    assert dist["recall@10"] > unt["recall@10"] + 0.2, (
        f"distillation produced no retrieval lift: "
        f"{dist['recall@10']} vs {unt['recall@10']}")
    assert dist["recall@10"] > 0.8, (
        f"distilled student regressed from the r4 recipe "
        f"(lr 1e-3, ~0.98 recall@10): {dist['recall@10']}")

    print("\n== summary (QUALITY.md table) ==")
    print("| system | recall@10 | ndcg@10 | MRR |")
    print("|---|---|---|---|")
    for name, m in results:
        print(f"| {name} | {m['recall@10']:.3f} | {m['ndcg@10']:.3f} "
              f"| {m['mrr']:.3f} |")


if __name__ == "__main__":
    main()
