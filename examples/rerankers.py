"""The reranker tiers side by side: lexical, neural cross-encoder,
late-interaction MaxSim, and MMR diversity selection.

Run: PYTHONPATH=. JAX_PLATFORMS=cpu python examples/rerankers.py
"""

from trueno_rag_tpu import (
    Document,
    LexicalReranker,
    MMRReranker,
    MockEmbedder,
    RagPipelineBuilder,
)
from trueno_rag_tpu.models import CrossEncoderReranker, LateInteractionReranker
from trueno_rag_tpu.models.encoder import EncoderConfig

DOCS = [
    Document("Systolic arrays stream partial sums through a grid of "
             "multiply-accumulate units, feeding the matrix engine.", title="mxu"),
    Document("Systolic arrays stream partial sums through a grid of "
             "multiply-accumulate cells, feeding the matrix engine!", title="mxu-dup"),
    Document("Inverted indexes map every term to its posting list so "
             "sparse retrieval touches only matching documents.", title="bm25"),
    Document("Rank fusion merges dense and sparse candidate lists into "
             "one ordering, usually with reciprocal rank weighting.", title="fusion"),
]

QUERY = "how does the matrix engine multiply"
CFG = EncoderConfig(vocab_size=1024, hidden_dim=32, num_layers=1,
                    num_heads=2, mlp_dim=64, max_len=48)


def main() -> None:
    rerankers = {
        "lexical": LexicalReranker(),
        "cross-encoder": CrossEncoderReranker(config=CFG),
        "late-interaction": LateInteractionReranker(config=CFG),
        "mmr(0.5)": MMRReranker(lambda_=0.5),
    }
    for name, rr in rerankers.items():
        pipe = (RagPipelineBuilder()
                .with_embedder(MockEmbedder(64))
                .with_reranker(rr)
                .build())
        for d in DOCS:
            pipe.index_document(d)
        res = pipe.query(QUERY, k=3)
        order = ", ".join(f"{r.chunk.metadata.title}({r.rerank_score:.2f})"
                          if r.rerank_score is not None else r.chunk.metadata.title
                          for r in res)
        print(f"{name:16s} → {order}")


if __name__ == "__main__":
    main()
