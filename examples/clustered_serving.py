"""Cluster-pruned serving: interactive-latency exact search at scale.

`scan_tier="clustered"` reorders the corpus by balanced k-means so each
storage tile is a cluster with a certified score bound; a query scans
only the few tiles that can matter, and certified results are PROVABLY
the exact top-k over the full corpus (pruning misses fail closed to an
exact host patch — results never degrade, only the latency win does).

Runs on CPU in interpret mode for demonstration; the latency win is a
TPU property (see benches/clustered_bench.py).

Run: PYTHONPATH=.:$PYTHONPATH PALLAS_AXON_POOL_IPS= python examples/clustered_serving.py
"""

import numpy as np

from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
from trueno_rag_tpu.index import VectorStore, VectorStoreConfig

TOPICS = ["volcanoes", "tpu kernels", "deep sea", "medieval trade"]


def main() -> None:
    rng = np.random.default_rng(0)
    dim, per_topic = 64, 1500
    centers = rng.standard_normal((len(TOPICS), dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    store = VectorStore(VectorStoreConfig(
        dimension=dim,
        scan_tier="clustered",     # k-means tiles + certified pruning
        scan_tile_n=1024,
        cluster_probe_tiles=2,     # scan at most 2·B tiles per batch
    ))
    plain = VectorStore(VectorStoreConfig(dimension=dim))

    chunks = []
    for t, topic in enumerate(TOPICS):
        for i in range(per_topic):
            emb = centers[t] + 0.05 * rng.standard_normal(dim).astype(np.float32)
            c = Chunk(document_id=topic, content=f"{topic} article {i}",
                      start_offset=0, end_offset=10, metadata=ChunkMetadata(),
                      id=chunk_id_from_int(t * per_topic + i), embedding=emb.tolist())
            chunks.append(c)
    store.insert_many(chunks)
    plain.insert_many(chunks)
    print(f"indexed {len(chunks)} chunks across {len(TOPICS)} topics")

    for t, topic in enumerate(TOPICS[:2]):
        q = centers[t]
        got = store.search(q, 3)
        want = plain.search(q, 3)
        exact = [g[0] for g in got] == [w[0] for w in want]
        print(f"\nquery near {topic!r} (pruned == exact fp32: {exact})")
        for cid, score in got:
            print(f"  [{score:.4f}] {store.registry.get_chunk(cid).content}")
    print(f"\nuncertified (host-patched) queries: {store.compact_uncertified}")
    print("certified queries returned PROVABLY exact sets while scanning "
          f"~{store.config.cluster_probe_tiles} of "
          f"{len(store._cluster[3])} tiles each")


if __name__ == "__main__":
    main()
