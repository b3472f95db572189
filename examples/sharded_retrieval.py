"""Multi-chip corpus sharding — runnable without TPU hardware on a
virtual 8-device CPU mesh.

Run: PYTHONPATH=. PALLAS_AXON_POOL_IPS= python examples/sharded_retrieval.py
"""

import jax

if len(jax.devices()) < 8:  # virtualize 8 CPU devices if needed
    from jax.extend.backend import clear_backends

    clear_backends()
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_platforms", "cpu")

from trueno_rag_tpu import Document, NoOpReranker, RagPipelineBuilder, TfIdfEmbedder
from trueno_rag_tpu.parallel import ShardedHybridIndex, create_mesh


def main() -> None:
    docs = [
        Document(f"Document {i} discusses {'foxes and forests' if i % 3 == 0 else 'tensor hardware'} "
                 f"with {'dense vectors' if i % 2 == 0 else 'sparse keywords'}.", title=f"doc{i}")
        for i in range(64)
    ]
    emb = TfIdfEmbedder(64).fit([d.content for d in docs])
    pipe = RagPipelineBuilder().with_embedder(emb).with_reranker(NoOpReranker()).build()
    pipe.index_documents(docs)

    mesh = create_mesh()  # all devices on the data axis
    print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")
    sharded = ShardedHybridIndex(pipe.retriever, mesh)

    for q in ["foxes in forests", "tensor hardware sparse"]:
        single = pipe.retriever.retrieve(q, 3)
        multi = sharded.search(q, 3)
        agree = [r.chunk.id for r in single] == [r.chunk.id for r in multi]
        print(f"\n{q!r} (sharded == single-host: {agree})")
        for r in multi:
            print(f"  [{r.fused_score:.4f}] {r.chunk.metadata.title}: {r.chunk.content[:60]}")


if __name__ == "__main__":
    main()
