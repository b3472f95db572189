"""Late-interaction (MaxSim / ColBERT-style) retrieval and reranking.

Every chunk is stored as a MATRIX of token vectors and scored by
``MaxSim(q, D) = Σᵢ maxⱼ ⟨qᵢ, dⱼ⟩`` — the quality band between
bi-encoder retrieval and cross-encoder reranking. The reference has no
multi-vector retrieval at all (its dense path is one vector per chunk,
index.rs:321-437); here it is a first-class corpus-scale tier:

1. `LateInteractionReranker` — rerank a candidate list by MaxSim.
2. `LateInteractionRetriever` over a `TokenVectorStore` — full-corpus
   MaxSim search: the exact blockwise scan, then `scan="tiered"`, which
   streams a bf16 replica through a fused Pallas kernel (the
   query-token × doc-token interaction never leaves VMEM) and exactly
   rescores the best-bounded chunks from primary storage. Certified
   results are PROVABLY the exact full-corpus top-k; misses fall back
   to the exact scan automatically.
3. The same store snapshotted onto a device mesh
   (`ShardedTokenIndex(scan="tiered")`): per-shard fused scans, a k·s
   ICI candidate merge, and a composed global certificate.

Run: PYTHONPATH=. PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python examples/late_interaction.py
"""

import jax

if len(jax.devices()) < 8:  # virtualize 8 CPU devices if needed
    from jax.extend.backend import clear_backends

    clear_backends()
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from trueno_rag_tpu import Document, RecursiveChunker
from trueno_rag_tpu.index.token_store import TokenStoreConfig
from trueno_rag_tpu.models.late_interaction import (
    LateInteractionReranker,
    LateInteractionRetriever,
)
from trueno_rag_tpu.parallel.maxsim import ShardedTokenIndex
from trueno_rag_tpu.parallel.mesh import create_mesh

TOPICS = [
    "tensor processing units multiply matrices in systolic arrays",
    "harbor seals haul out on sandbars at low tide",
    "sourdough starters need regular flour feedings",
    "interval certificates prove a pruned scan exact",
]


def main() -> None:
    docs = [
        Document(
            f"{TOPICS[i % 4]} — passage {i} adds detail number {i * 7 % 13}.",
            title=f"doc{i}",
        )
        for i in range(120)
    ]
    chunker = RecursiveChunker(chunk_size=200, overlap=0)
    chunks = [c for d in docs for c in chunker.chunk(d)]

    # -- 1. MaxSim as a reranker over any candidate list ------------------
    reranker = LateInteractionReranker(max_len=48, seed=0)
    scores = reranker.score_batch(
        "how do TPUs multiply matrices", [c.content for c in chunks[:8]]
    )
    print(f"reranker MaxSim scores (8 candidates): "
          f"best={float(scores.max()):.3f}")

    # -- 2. full-corpus MaxSim retrieval: exact vs the fused tier ---------
    def build(scan: str) -> LateInteractionRetriever:
        r = LateInteractionRetriever(
            store_config=TokenStoreConfig(
                hidden_dim=64, max_tokens=24, scan=scan, rescore=48,
            ),
            max_len=48,
            seed=0,
        )
        r.index_batch(chunks)
        return r

    exact = build("exact")
    tiered = build("tiered")  # scan_kernel="fused" is the default
    query = "certified exactness for pruned scans"
    ids_e = [h.chunk.id for h in exact.retrieve(query, k=5)]
    ids_t = [h.chunk.id for h in tiered.retrieve(query, k=5)]
    assert ids_e == ids_t, "tiered results must equal the exact scan"
    print(f"tiered == exact top-5: True "
          f"(uncertified fallbacks: {tiered.store.uncertified})")

    # -- 3. the same store on a device mesh, tier + global certificate ----
    mesh = create_mesh(data=8, model=1)
    idx = ShardedTokenIndex.from_token_store(
        tiered.store, mesh, scan="tiered", rescore=48
    )
    q_tok, q_mask = tiered._encode([query])
    s, r = idx.search(np.asarray(q_tok), np.asarray(q_mask), k=5)
    ids_sh = [tiered.store.registry.id_of(int(x)) for x in r[0] if x >= 0]
    assert ids_sh == ids_e, "sharded tier must match the single-chip scan"
    print(f"sharded tiered top-5 matches single-chip: True "
          f"(mesh={dict(mesh.shape)}, "
          f"uncertified: {idx.uncertified})")


if __name__ == "__main__":
    main()
