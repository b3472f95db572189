"""Multi-host ingest: each host builds only its shard (local vocab,
local postings, local embeddings); the controller merges EXACT global
statistics and assembles the serving index without the corpus ever
existing on one machine. Runnable without hardware on a virtual
8-device CPU mesh.

Run: PYTHONPATH=.:$PYTHONPATH PALLAS_AXON_POOL_IPS= python examples/multihost_ingest.py
"""

import jax

if len(jax.devices()) < 8:  # virtualize 8 CPU devices if needed
    from jax.extend.backend import clear_backends

    clear_backends()
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from trueno_rag_tpu import MockEmbedder
from trueno_rag_tpu.chunking import Chunk
from trueno_rag_tpu.parallel import ShardedHybridIndex, create_mesh
from trueno_rag_tpu.parallel.ingest import build_shard
from trueno_rag_tpu.persist import deserialize_compressed, serialize_compressed

TOPICS = ["volcanic geology", "tensor hardware", "deep sea biology",
          "medieval trade routes"]


def main() -> None:
    mesh = create_mesh(data=4, model=2)
    shards = mesh.shape["data"]
    embedder = MockEmbedder(dimension=64)
    rps = 32  # rows per shard

    # --- on each ingest host: tokenize + embed ONLY its documents -------
    payloads, blocks, chunk_lists = [], [], []
    for host in range(shards):
        texts = [
            f"Shard {host} document {i} covering {TOPICS[host]} with "
            f"detail level {i} and keyword topic{host}"
            for i in range(rps)
        ]
        chunks = [
            Chunk(document_id=f"host{host}", content=t, start_offset=0,
                  end_offset=len(t), id=f"h{host}c{i}")
            for i, t in enumerate(texts)
        ]
        embedder.embed_chunks(chunks)
        blocks.append(np.asarray([c.embedding for c in chunks], np.float32))
        # the wire form a real pod ships over DCN/disk
        payloads.append(serialize_compressed(
            build_shard(texts, n_rows=rps).to_payload()
        ))
        chunk_lists.append(chunks)
    print(f"{shards} shard builds, payload bytes: "
          f"{[len(p) for p in payloads]}")

    # --- on the controller: exact merge + per-shard device placement ----
    idx = ShardedHybridIndex.from_shard_builds(
        embedder,
        blocks,
        [deserialize_compressed(p) for p in payloads],
        mesh,
        chunks_per_shard=chunk_lists,
    )
    print(f"sharded BM25: {idx.sparse.total_postings} postings total, "
          f"max shard {idx.sparse.max_shard_postings} "
          f"(memory per chip = total/shards)")

    for q in ["volcanic geology detail", "medieval trade keyword topic3"]:
        print(f"\n{q!r}")
        for r in idx.search(q, 3):
            print(f"  [{r.fused_score:.4f}] {r.chunk.id}: {r.chunk.content[:60]}")


if __name__ == "__main__":
    main()
