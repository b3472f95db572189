"""IR metrics sweep over fusion strategies — the BASELINE.json
`metrics_evaluation` config: recall/MRR/NDCG@10 over RRF/Linear/DBSF/
Convex fusion.

Mirrors the reference's examples/metrics_evaluation.rs.

Run: PYTHONPATH=. python examples/metrics_evaluation.py
"""

from trueno_rag_tpu import (
    AggregatedMetrics,
    Document,
    FusionStrategy,
    NoOpReranker,
    RagPipelineBuilder,
    RecursiveChunker,
    RetrievalMetrics,
    TfIdfEmbedder,
)

CORPUS = {
    "bm25": "BM25 scores documents with term frequency and idf weighting.",
    "dense": "Dense embeddings rank passages by cosine similarity in vector space.",
    "fusion": "Rank fusion merges dense and sparse result lists into one ranking.",
    "chunking": "Chunking splits long documents into overlapping retrievable pieces.",
    "rerank": "Cross-encoder rerankers rescore candidate passages jointly with the query.",
    "metrics": "Recall, precision, NDCG and MRR quantify retrieval quality.",
    "tpu": "TPUs accelerate batched matrix multiplication for embedding models.",
    "citation": "Assembled context carries numbered citations back to source chunks.",
}

# (query, relevant doc keys)
EVAL_SET = [
    ("how does bm25 weight terms", {"bm25"}),
    ("vector similarity ranking", {"dense"}),
    ("merging result lists", {"fusion"}),
    ("splitting documents for retrieval", {"chunking"}),
    ("measuring retrieval quality", {"metrics"}),
    ("rescoring candidates with the query", {"rerank"}),
]


def main() -> None:
    docs = {key: Document(text, title=key) for key, text in CORPUS.items()}
    embedder = TfIdfEmbedder(128).fit([d.content for d in docs.values()])

    for fusion in [
        FusionStrategy.rrf(60.0),
        FusionStrategy.linear(0.5),
        FusionStrategy.dbsf(),
        FusionStrategy.convex(0.3),
    ]:
        pipeline = (
            RagPipelineBuilder()
            .with_embedder(embedder)
            .with_reranker(NoOpReranker())
            .with_chunker(RecursiveChunker(chunk_size=512, overlap=0))
            .with_fusion(fusion)
            .build()
        )
        pipeline.index_documents(list(docs.values()))
        chunk_doc = {  # chunk id -> doc key
            c_id: key
            for key, d in docs.items()
            for c_id in [
                pipeline.retriever.registry.get_chunk(cid).id
                for cid in pipeline.retriever.registry.ids()
                if pipeline.retriever.registry.get_chunk(cid).document_id == d.id
            ]
        }

        per_query = []
        for query, relevant_keys in EVAL_SET:
            results = pipeline.query(query, k=10)
            retrieved = [r.chunk.id for r in results]
            relevant = {cid for cid, key in chunk_doc.items() if key in relevant_keys}
            per_query.append(RetrievalMetrics.compute(retrieved, relevant, k_values=[1, 5, 10]))
        agg = AggregatedMetrics.aggregate(per_query)
        print(
            f"{fusion.kind:<8s} recall@10={agg.mean_recall[10]:.3f} "
            f"ndcg@10={agg.mean_ndcg[10]:.3f} mrr={agg.mean_mrr:.3f} map={agg.mean_map:.3f}"
        )


if __name__ == "__main__":
    main()
