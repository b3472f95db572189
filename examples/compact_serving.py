"""The compact tier: serve a corpus with NO fp32 matrix on the device.

At 10M chunks x 384 dims the fp32 embedding matrix alone is 15 GB —
more than a v5e chip's HBM. `VectorStoreConfig(scan_tier="compact")`
keeps only a bf16 copy plus an int8 residual correction (3 bytes per
element, 11.5 GB at that scale) and still returns PROVABLY exact top-k
row SETS: an interval certificate checks, per query, that every
returned row's true score beats every excluded row's. Uncertified
queries are patched from the host fp32 copy.

This demo runs the same machinery at toy scale, then shards the
compact replicas over a virtual 8-device mesh (the pod-scale shape:
~80M chunks on a v5e-8 at 3 B/element/chip).

Run: PYTHONPATH=. PALLAS_AXON_POOL_IPS= python examples/compact_serving.py
"""

import jax

if len(jax.devices()) < 8:  # virtualize 8 CPU devices if needed
    from jax.extend.backend import clear_backends

    clear_backends()
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from trueno_rag_tpu import Document, NoOpReranker, RagPipelineBuilder, TfIdfEmbedder, VectorStoreConfig
from trueno_rag_tpu.parallel.compact import ShardedCompactIndex
from trueno_rag_tpu.parallel.mesh import create_mesh


def main() -> None:
    docs = [
        Document(
            f"Chunk {i} about {'retrieval pipelines' if i % 3 == 0 else 'tensor hardware'} "
            f"and {'certified scans' if i % 2 == 0 else 'hybrid fusion'}.",
            title=f"doc{i}",
        )
        for i in range(96)
    ]
    emb = TfIdfEmbedder(64).fit([d.content for d in docs])

    # -- single-chip: a pipeline whose vector store never holds fp32 ------
    pipe = (
        RagPipelineBuilder()
        .with_embedder(emb)
        .with_reranker(NoOpReranker())
        .with_vector_config(VectorStoreConfig(dimension=64, scan_tier="compact"))
        .build()
    )
    pipe.index_documents(docs)
    store = pipe.retriever.vector_store
    for q in ["certified retrieval pipelines", "tensor hardware fusion"]:
        results = pipe.query(q, k=3)
        print(f"{q!r}:")
        for r in results:
            print(f"  [{r.best_score():.4f}] {r.chunk.metadata.title}: {r.chunk.content[:58]}")
    print(f"compact store: {store.compact_uncertified} uncertified -> "
          f"{store.compact_candidate_patched} settled exactly from the scan's "
          f"own candidate rows (containment certificate), "
          f"{store.compact_gemm_patched} via the full-matrix fallback; "
          f"{len(store)} chunks, no fp32 on device\n")

    # -- pod shape: shard the 3 B/element replicas over the mesh ----------
    mesh = create_mesh()
    rng = np.random.default_rng(0)
    matrix = rng.standard_normal((8192, 64)).astype(np.float32)
    idx = ShardedCompactIndex(matrix, mesh, tile_n=128)
    queries = matrix[:4] + 0.01 * rng.standard_normal((4, 64)).astype(np.float32)
    scores, rows, certified = idx.search(queries, k=5)
    rows = np.asarray(rows)
    print(f"sharded compact over {dict(mesh.shape)}: "
          f"top-1 rows {rows[:, 0].tolist()} (expect [0, 1, 2, 3]), "
          f"{idx.uncertified} patched ({idx.candidate_patched} from the "
          f"gathered candidate union, {idx.gemm_patched} via the GEMM)")
    per_chip = (idx.m_bf16.nbytes + idx.r_i8.nbytes) // mesh.shape["data"]
    print(f"per-chip replica bytes: {per_chip:,} "
          f"(= 3 B/element x {matrix.shape[0] // mesh.shape['data']:,} rows x 64 dims)")


if __name__ == "__main__":
    main()
