"""Query preprocessing: HyDE, multi-query expansion, intent analysis.

The reference ships this subsystem as dead code (preprocess.rs is not in
its module tree); here it is live and wired into the pipeline — variant
queries retrieve as ONE device batch.

Run: PYTHONPATH=. python examples/query_preprocessing.py
"""

from trueno_rag_tpu import Document, LexicalReranker, RagPipelineBuilder, TfIdfEmbedder
from trueno_rag_tpu.preprocess import (
    ChainedPreprocessor,
    HydePreprocessor,
    KeywordExpander,
    MultiQueryPreprocessor,
    QueryAnalyzer,
    SynonymExpander,
)

DOCS = [
    Document("To repair a failing index, rebuild the postings and verify checksums.", title="Repairs"),
    Document("Dense embeddings capture meaning; sparse keywords capture exact matches.", title="Retrieval"),
    Document("Configuration lives in dataclasses; settings serialize to msgpack.", title="Config"),
]


def main() -> None:
    # expansion preview
    mq = MultiQueryPreprocessor(SynonymExpander())
    print("synonym variants:", mq.preprocess("fix the config error"))
    kw = MultiQueryPreprocessor(KeywordExpander())
    print("keyword variants:", kw.preprocess("how to fix the broken index"))
    hyde = HydePreprocessor(augment=True)
    print("hyde:", hyde.preprocess("what is dense retrieval"))

    # intent analysis
    analyzer = QueryAnalyzer()
    for q in ["how to install this", "what is BM25", "fix crash on startup", "rust vs go"]:
        a = analyzer.analyze(q)
        print(f"{q!r:32s} -> {a.intent.value:16s} conf={a.confidence:.2f} kw={a.keywords}")

    # wired into the pipeline: synonym expansion finds the 'Repairs' doc
    # for a query that shares no keywords with it ('fix' -> 'repair')
    emb = TfIdfEmbedder(64).fit([d.content for d in DOCS])
    pipe = (
        RagPipelineBuilder()
        .with_embedder(emb)
        .with_reranker(LexicalReranker())
        .with_preprocessor(ChainedPreprocessor([mq, hyde], max_total=6))
        .build()
    )
    pipe.index_documents(DOCS)
    results = pipe.query("fix the failing index", k=2)
    print("\npipeline with preprocessing:")
    for r in results:
        print(f"  [{r.best_score():.3f}] {r.chunk.metadata.title}: {r.chunk.content[:60]}")


if __name__ == "__main__":
    main()
