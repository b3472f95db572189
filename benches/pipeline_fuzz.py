"""Randomized end-to-end pipeline fuzzer.

Hammers the full framework with random configurations, corpora, queries
and mutations, checking invariants the unit suites also pin — but in
arbitrary combination:

- every result's chunk content is an exact substring of its document
- result counts respect k; scores finite; best_score priority holds
- remove() really removes across both stores
- persistence round-trips preserve rankings
- batch == sequence of singles

Run: PYTHONPATH=.:$PYTHONPATH python benches/pipeline_fuzz.py [--rounds 30] [--seed 0]
Exits non-zero on the first violated invariant with a repro seed.
"""

from __future__ import annotations

import argparse
import math
import random
import sys
import tempfile


WORDS = (
    "fox dog data model index query chunk vector sparse dense tpu matrix "
    "rank fusion score learn the of and with for über naïve 中文 emoji🦀"
).split()


def random_doc(rng: random.Random):
    from trueno_rag_tpu import Document

    n_sent = rng.randint(1, 12)
    sents = []
    for _ in range(n_sent):
        sents.append(" ".join(rng.choices(WORDS, k=rng.randint(1, 14))) + rng.choice([".", "!", "?"]))
    sep = rng.choice([" ", "\n", "\n\n"])
    return Document(sep.join(sents), title=f"t{rng.random():.4f}")


def one_round(seed: int) -> None:
    from trueno_rag_tpu import (
        ChunkingStrategy,
        FusionStrategy,
        LexicalReranker,
        MockCrossEncoderReranker,
        MockEmbedder,
        NoOpReranker,
        RagPipelineBuilder,
        TfIdfEmbedder,
    )
    from trueno_rag_tpu.persist import load_index, save_index
    from trueno_rag_tpu.retrieve import HybridRetrieverConfig

    rng = random.Random(seed)
    docs = [random_doc(rng) for _ in range(rng.randint(1, 25))]

    if rng.random() < 0.5:
        embedder = MockEmbedder(rng.choice([16, 48, 384]))
    else:
        embedder = TfIdfEmbedder(rng.choice([8, 32, 128])).fit([d.content for d in docs])

    strategy = rng.choice([
        ChunkingStrategy.recursive(rng.randint(32, 400), rng.randint(0, 16)),
        ChunkingStrategy.fixed_size(rng.randint(32, 400), rng.randint(0, 16)),
        ChunkingStrategy.sentence(rng.randint(1, 6), 0),
        ChunkingStrategy.paragraph(rng.randint(1, 4)),
        ChunkingStrategy.structural(rng.randint(100, 500)),
    ])
    fusion = rng.choice([
        FusionStrategy.rrf(rng.uniform(1, 100)),
        FusionStrategy.linear(rng.random()),
        FusionStrategy.convex(rng.random()),
        FusionStrategy.dbsf(),
        FusionStrategy.union(),
        FusionStrategy.intersection(),
    ])
    from trueno_rag_tpu import MMRReranker

    reranker = rng.choice([
        NoOpReranker(), LexicalReranker(), MockCrossEncoderReranker(),
        MMRReranker(lambda_=rng.random()),
    ])
    builder = (
        RagPipelineBuilder()
        .with_embedder(embedder)
        .with_reranker(reranker)
        .with_chunker(strategy.build(embedder))
        .with_fusion(fusion)
        .with_retriever_config(
            HybridRetrieverConfig(candidates_per_source=rng.randint(1, 60), fusion=fusion)
        )
    )
    use_dedup = rng.random() < 0.3
    if use_dedup:
        builder = builder.with_dedup(rng.uniform(0.9, 0.999))
    pipe = builder.build()
    tag_pool = ["lang:en", "lang:de", "tenant:a", "tenant:b", "src:web"]
    use_tags = rng.random() < 0.5
    if use_tags:
        doc_tags = [rng.sample(tag_pool, rng.randint(0, 3)) for _ in docs]
        pipe.index_documents(docs, tags=doc_tags)
    else:
        pipe.index_documents(docs)
    if use_dedup:
        # re-ingesting the same documents must index zero new chunks
        before = len(pipe.retriever.registry)
        n_again = pipe.index_document(docs[0])
        assert n_again == 0, (seed, "re-ingested doc not deduped")
        assert len(pipe.retriever.registry) == before
    doc_by_id = {d.id: d for d in docs}

    if use_tags:
        from trueno_rag_tpu import TagFilter

        reg = pipe.retriever.registry
        for _ in range(2):
            f = TagFilter(
                all=tuple(rng.sample(tag_pool, rng.randint(0, 2))),
                none=tuple(rng.sample(tag_pool, rng.randint(0, 1))),
            )
            fq = " ".join(rng.choices(WORDS, k=3))
            res_f = pipe.query(fq, rng.randint(1, 8), tag_filter=f)
            for r in res_f:
                names = set(reg.tag_names_of(r.chunk.id))
                assert set(f.all) <= names, (seed, "filter all violated")
                assert not (set(f.none) & names), (seed, "filter none violated")
            # determinism: identical call returns identical ids
            res_f2 = pipe.query(fq, len(res_f) or 1, tag_filter=f)
            assert [r.chunk.id for r in res_f] == [r.chunk.id for r in res_f2][: len(res_f)], (
                seed, "filtered query nondeterministic")

    queries = [" ".join(rng.choices(WORDS, k=rng.randint(1, 6))) for _ in range(rng.randint(1, 5))]
    k = rng.randint(1, 12)

    batch = pipe.query_batch(queries, k)
    for q, results in zip(queries, batch):
        single = pipe.query(q, k)
        assert [r.chunk.id for r in single] == [r.chunk.id for r in results], "batch != single"
        assert len(results) <= k, "k overflow"
        for r in results:
            doc = doc_by_id[r.chunk.document_id]
            assert r.chunk.content == doc.content[r.chunk.start_offset : r.chunk.end_offset], "offset drift"
            assert math.isfinite(r.best_score()), "non-finite score"

    ctx = pipe.query_with_context(queries[0], k)
    assert ctx.total_tokens <= pipe.assembler.config.max_tokens
    for cit in ctx.citations:
        assert cit.id >= 1

    # mutation: remove a random chunk and assert it vanishes
    ids = pipe.retriever.registry.ids()
    if ids and rng.random() < 0.8:
        victim = rng.choice(ids)
        assert pipe.retriever.remove(victim)
        for q in queries:
            res = pipe.retriever.retrieve(q, k)
            assert victim not in [r.chunk.id for r in res], "removed chunk returned"

    # persistence round-trip preserves rankings
    if rng.random() < 0.5:
        with tempfile.TemporaryDirectory() as tmp:
            path = f"{tmp}/fuzz.trag"
            save_index(path, pipe.retriever)
            restored, _ = load_index(path, embedder)
            for q in queries:
                a = [r.chunk.content for r in pipe.retriever.retrieve(q, k)]
                b = [r.chunk.content for r in restored.retrieve(q, k)]
                assert a == b, "persistence changed ranking"


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rounds", type=int, default=30)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    for i in range(args.rounds):
        seed = args.seed + i
        try:
            one_round(seed)
            print(f"round {i} (seed={seed}) ok", flush=True)
        except AssertionError as e:
            print(f"INVARIANT VIOLATED at seed={seed}: {e}", flush=True)
            sys.exit(1)
    print(f"all {args.rounds} rounds clean")


if __name__ == "__main__":
    main()
