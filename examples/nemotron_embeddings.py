"""Nemotron-class asymmetric embeddings.

Mirrors the reference's examples/nemotron_embeddings.rs: instruction-
prefixed queries vs plain passages, last-token pooling, L2-normalized
4096-d output. The reference needs a GGUF file via NEMOTRON_MODEL_PATH
(and then skips the transformer layers anyway, embed.rs:806-841); here
the real decoder runs — use the tiny config for a demo, the full config
plus a checkpoint for production.

Run: PYTHONPATH=. python examples/nemotron_embeddings.py
"""

import numpy as np

from trueno_rag_tpu.embed import cosine_similarity
from trueno_rag_tpu.models import NemotronConfig, NemotronEmbedder


def main() -> None:
    embedder = NemotronEmbedder(config=NemotronConfig.tiny())
    print(f"model: {embedder.model_id} ({embedder.dimension}-d demo config; full = 4096-d)")
    print(f"query prefix: {embedder.config.query_prefix!r}")

    passages = [
        "The mitochondria is the powerhouse of the cell.",
        "Interest rates influence bond prices inversely.",
        "Transformers use attention to mix token information.",
    ]
    doc_embs = embedder.embed_documents(passages)
    q = embedder.embed_query("how do neural networks share information between tokens")
    sims = [cosine_similarity(q, d) for d in doc_embs]
    order = np.argsort(sims)[::-1]
    print("\nranked passages:")
    for i in order:
        print(f"  [{sims[i]: .4f}] {passages[i]}")


if __name__ == "__main__":
    main()
