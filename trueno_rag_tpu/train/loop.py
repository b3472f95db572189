"""Eval-driven training loop: contrastive fit with retrieval-quality
checkpoint selection.

Closes the training loop the reference never had (SURVEY §2.3: its only
trainable component is TF-IDF ``fit``, embed.rs:219-254): train the JAX
encoder on unsupervised pairs from its own corpus, periodically measure
*retrieval* quality — encode the corpus, run the exact dense top-k,
score recall/NDCG/MRR on held-out pseudo-queries with the device
metrics evaluator — and keep the checkpoint that retrieves best. Loss
going down is not the objective; recall@k going up is.

Everything numeric runs on device: the corpus re-encode is a batched
forward, retrieval is :func:`trueno_rag_tpu.ops.dense.dense_topk`, and
the metric fleet is one :func:`trueno_rag_tpu.ops.metrics.batched_metrics`
program. Host code only moves strings and floats-for-logging.
"""

from __future__ import annotations

import functools
import random
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from trueno_rag_tpu.chunking import Chunk, split_sentences
from trueno_rag_tpu.models.encoder import EncoderConfig, encoder_forward
from trueno_rag_tpu.ops.dense import dense_topk
from trueno_rag_tpu.ops.metrics import batched_metrics
from trueno_rag_tpu.train.contrastive import (
    TrainState,
    maxsim_train_step,
    splade_train_step,
    train_step,
)
from trueno_rag_tpu.train.data import PairBatcher, crop_pairs, ict_pairs


@dataclass
class EvalSet:
    """Held-out retrieval probes: ``queries[i]`` should retrieve corpus
    row ``relevant[i]`` (row indices into the chunk list)."""

    queries: List[str]
    relevant: List[List[int]]


def build_ict_evalset(
    chunks: Sequence[Chunk], n_queries: int, seed: int = 0
) -> EvalSet:
    """Sample one sentence per distinct chunk as a pseudo-query whose
    relevant set is exactly that chunk's row — the ICT construction,
    held out as an evaluation probe (the full chunk text stays in the
    index, so this measures sentence→context retrieval)."""
    rng = random.Random(seed)
    rows = [i for i, c in enumerate(chunks) if len(split_sentences(c.content)) >= 2]
    rng.shuffle(rows)
    queries: List[str] = []
    relevant: List[List[int]] = []
    for row in rows[:n_queries]:
        spans = split_sentences(chunks[row].content)
        s, e = spans[rng.randrange(len(spans))]
        q = chunks[row].content[s:e].strip()
        if q:
            queries.append(q)
            relevant.append([row])
    return EvalSet(queries=queries, relevant=relevant)


def _encode_texts(
    params, config: EncoderConfig, tokenizer, texts: Sequence[str], batch: int = 64
) -> jax.Array:
    """Batched fixed-shape forward: every slice pads to (batch,
    max_len) so the whole eval uses ONE compiled program."""
    out = []
    for lo in range(0, len(texts), batch):
        ids = tokenizer.encode_batch(texts[lo : lo + batch])
        ids = np.pad(
            ids,
            ((0, batch - ids.shape[0]), (0, max(0, config.max_len - ids.shape[1]))),
        )[:, : config.max_len]
        out.append(encoder_forward(params, jnp.asarray(ids), config))
    return jnp.concatenate(out, axis=0)[: len(texts)]


def _encode_token_states(
    params, config: EncoderConfig, tokenizer, texts: Sequence[str], batch: int = 64
):
    """Batched fixed-shape TOKEN-state forward → ([N, T, H] f32 L2-normed,
    [N, T] mask) — the multi-vector sibling of :func:`_encode_texts`."""
    from trueno_rag_tpu.models.encoder import encoder_token_states

    toks, masks = [], []
    for lo in range(0, len(texts), batch):
        ids = tokenizer.encode_batch(texts[lo : lo + batch])
        ids = np.pad(
            ids,
            ((0, batch - ids.shape[0]), (0, max(0, config.max_len - ids.shape[1]))),
        )[:, : config.max_len]
        t, m = encoder_token_states(params, jnp.asarray(ids), config)
        n = jnp.linalg.norm(t, axis=-1, keepdims=True)
        toks.append(t / jnp.where(n == 0.0, 1.0, n))
        masks.append(m)
    tok = jnp.concatenate(toks, axis=0)[: len(texts)]
    mask = jnp.concatenate(masks, axis=0)[: len(texts)]
    return tok, mask


def _maxsim_eval_rows(
    params, config, tokenizer, chunk_texts, evalset, k, encode_batch
):
    from trueno_rag_tpu.ops.maxsim import maxsim_scan_topk

    tok, mask = _encode_token_states(params, config, tokenizer, chunk_texts, encode_batch)
    q_tok, q_mask = _encode_token_states(
        params, config, tokenizer, evalset.queries, encode_batch
    )
    valid = jnp.ones((tok.shape[0],), bool)
    _, rows = maxsim_scan_topk(
        q_tok, q_mask, tok, mask, valid, min(k, tok.shape[0]), 128
    )
    return rows


def _splade_eval_rows(
    params, config, tokenizer, chunk_texts, evalset, k, encode_batch
):
    """Top-k rows under the UNTRUNCATED learned-sparse score (the dense
    activation dot splade_contrastive_loss trains through). The
    sparsified product path (SpladeEncoder top-T expansions + the
    posting index) approximates this; tools/quality_eval.py measures
    both and shows the truncation gap."""
    from trueno_rag_tpu.models.splade import splade_activations

    def acts(texts):
        out = []
        for lo in range(0, len(texts), encode_batch):
            ids = tokenizer.encode_batch(texts[lo : lo + encode_batch])
            ids = np.pad(
                ids,
                ((0, encode_batch - ids.shape[0]),
                 (0, max(0, config.max_len - ids.shape[1]))),
            )[:, : config.max_len]
            out.append(splade_activations(params, jnp.asarray(ids), config))
        return jnp.concatenate(out, axis=0)[: len(texts)]

    d_act = acts(chunk_texts)  # [N, V]
    q_act = acts(list(evalset.queries))  # [Q, V]
    scores = jnp.dot(q_act, d_act.T, preferred_element_type=jnp.float32)
    _, rows = jax.lax.top_k(scores, min(k, d_act.shape[0]))
    return rows


def evaluate_retrieval(
    params,
    config: EncoderConfig,
    tokenizer,
    chunk_texts: Sequence[str],
    evalset: EvalSet,
    k: int = 10,
    metric: str = "cosine",
    encode_batch: int = 64,
    mode: str = "pooled",
) -> Dict[str, float]:
    """Encode corpus + probes, exact top-k, fleet metrics → means.

    ``mode="pooled"`` scores pooled cosine (dense_topk);
    ``mode="maxsim"`` scores exact late-interaction MaxSim over the
    trunk's L2-normed token states (the matching eval for the MaxSim
    training objective); ``mode="splade"`` scores the untruncated
    learned-sparse activation dot (the matching eval for
    fit(objective="splade") — params need the SPLADE head)."""
    if not evalset.queries or not chunk_texts:
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(
            "evaluation needs a non-empty corpus and at least one probe "
            "query (ICT probes require chunks with >= 2 sentences)"
        )
    if mode == "maxsim":
        rows = _maxsim_eval_rows(
            params, config, tokenizer, chunk_texts, evalset, k, encode_batch
        )
    elif mode == "splade":
        rows = _splade_eval_rows(
            params, config, tokenizer, chunk_texts, evalset, k, encode_batch
        )
    elif mode == "pooled":
        matrix = _encode_texts(params, config, tokenizer, chunk_texts, encode_batch)
        qvecs = _encode_texts(params, config, tokenizer, evalset.queries, encode_batch)
        valid = jnp.ones((matrix.shape[0],), bool)
        _, rows = dense_topk(qvecs, matrix, valid, min(k, matrix.shape[0]), metric)
    else:
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(f"unknown eval mode {mode!r} (pooled|maxsim|splade)")
    width = max(1, max(len(r) for r in evalset.relevant))
    rel = np.full((len(evalset.relevant), width), -1, np.int32)
    for i, r in enumerate(evalset.relevant):
        rel[i, : len(r)] = r
    per_q = batched_metrics(rows, jnp.asarray(rel), k_values=(1, min(5, k), k))
    return {name: float(jnp.mean(v)) for name, v in per_q.items()}


@dataclass
class FitResult:
    state: TrainState
    history: List[Dict[str, float]] = field(default_factory=list)
    best_metric: float = float("-inf")
    best_step: int = -1
    best_checkpoint: Optional[str] = None


def fit(
    state: TrainState,
    tx,
    config: EncoderConfig,
    tokenizer,
    chunks: Sequence[Chunk],
    *,
    steps: int = 200,
    batch_size: int = 32,
    max_len: Optional[int] = None,
    eval_every: int = 50,
    eval_queries: int = 64,
    k: int = 10,
    select_metric: str = "recall@10",
    pair_kind: str = "ict",
    objective: str = "pooled",
    temperature: float = 0.05,
    checkpoint_dir: Optional[str] = None,
    seed: int = 0,
    log: Optional[Callable[[str], None]] = None,
    evalset: Optional[EvalSet] = None,
    eval_corpus: Optional[Sequence[str]] = None,
    objective_kwargs: Optional[Dict[str, float]] = None,
) -> FitResult:
    """Train with periodic retrieval evaluation; keep the best state.

    ``select_metric`` names any key of :func:`evaluate_retrieval`'s
    output (recall@k / ndcg@k / mrr / map / ...). When
    ``checkpoint_dir`` is set, the best state is saved to
    ``<checkpoint_dir>/best`` as it improves (orbax, resumable with
    :func:`trueno_rag_tpu.train.checkpoint.load_train_state`).

    ``evalset``/``eval_corpus`` supply a held-out validation retrieval
    task (probes + the texts they retrieve against; ``eval_corpus``
    defaults to the training chunks). Supply one whenever the training
    corpus admits trivial lexical retrieval: the default self-ICT
    probes are exact substrings of their positive chunk, so any
    bag-of-words-ish encoder — including an UNTRAINED one with random
    word vectors — can saturate them at step 0, and best-state
    selection would then never leave the initialization (this is a
    measured failure mode, see tools/quality_eval.py).

    ``objective_kwargs`` forwards extra keyword arguments to the
    objective's train step (e.g. the from-scratch SPLADE recipe:
    ``{"score_norm": "cosine", "lambda_q": 5e-3, "lambda_d": 1e-3}``
    with ``temperature=0.05`` — see splade_contrastive_loss).

    Returns a :class:`FitResult` whose ``state`` is the BEST-evaluating
    state seen (not necessarily the last) — eval-driven selection, the
    part the loss curve cannot do.
    """
    rng = random.Random(seed)
    if objective not in ("pooled", "maxsim", "splade"):
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(f"unknown objective {objective!r} (pooled|maxsim|splade)")
    pair_fn = {"ict": ict_pairs, "crop": crop_pairs}.get(pair_kind)
    if pair_fn is None:
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(f"unknown pair_kind {pair_kind!r} (ict|crop)")
    batcher = PairBatcher(
        tokenizer, batch_size=batch_size, max_len=max_len or config.max_len
    )
    stream = batcher.batches(pair_fn(chunks, rng))
    if evalset is None:
        evalset = build_ict_evalset(chunks, eval_queries, seed=seed + 1)
    if not evalset.queries:
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(
            "no evaluation probes could be built: the corpus has no "
            "chunks with >= 2 sentences (ICT needs a sentence to hold "
            "out); use longer chunks or pair_kind='crop' with a custom "
            "EvalSet via evaluate_retrieval"
        )
    chunk_texts = list(eval_corpus) if eval_corpus is not None else [
        c.content for c in chunks
    ]
    if objective == "splade" and "splade_vocab_bias" not in state.params:
        from trueno_rag_tpu.errors import InvalidConfigError

        raise InvalidConfigError(
            "objective='splade' needs SPLADE-head params — build the "
            "state with create_train_state(..., kind='splade')"
        )
    base_step = {
        "pooled": train_step,
        "maxsim": maxsim_train_step,
        "splade": splade_train_step,
    }[objective]
    step_fn = jax.jit(
        functools.partial(base_step, tx=tx, config=config,
                          temperature=temperature,
                          **(objective_kwargs or {}))
    )

    result = FitResult(state=state)
    best_params_host = None

    def maybe_eval(current: TrainState) -> None:
        nonlocal best_params_host
        scores = evaluate_retrieval(
            current.params, config, tokenizer, chunk_texts, evalset, k=k,
            mode=objective if objective in ("maxsim", "splade") else "pooled",
        )
        scores["step"] = float(int(current.step))
        result.history.append(scores)
        if log:
            shown = {m: round(scores[m], 4) for m in (select_metric, "mrr") if m in scores}
            log(f"eval @ step {int(current.step)}: {shown}")
        value = scores.get(select_metric)
        if value is None:
            from trueno_rag_tpu.errors import InvalidConfigError

            raise InvalidConfigError(
                f"select_metric {select_metric!r} not produced; have {sorted(scores)}"
            )
        if value > result.best_metric:
            result.best_metric = value
            result.best_step = int(current.step)
            best_params_host = jax.tree.map(np.asarray, current._asdict())
            if checkpoint_dir is not None:
                from trueno_rag_tpu.train.checkpoint import save_train_state

                path = f"{checkpoint_dir}/best"
                save_train_state(path, current)
                result.best_checkpoint = path

    maybe_eval(state)  # baseline: untrained retrieval quality
    for i in range(steps):
        q_ids, d_ids = next(stream)
        state, metrics = step_fn(state, jnp.asarray(q_ids), jnp.asarray(d_ids))
        if (i + 1) % eval_every == 0 or i + 1 == steps:
            if log:
                log(
                    f"step {int(state.step)}: loss={float(metrics['loss']):.4f} "
                    f"acc={float(metrics['accuracy']):.2f}"
                )
            maybe_eval(state)

    if best_params_host is not None:
        result.state = TrainState(**jax.tree.map(jnp.asarray, best_params_host))
    else:
        result.state = state
    return result
