"""Multi-chip parallelism: meshes, shardings, and distributed retrieval.

The reference is strictly single-process with zero parallelism
(SURVEY §2.13); this package is where the TPU framework earns its scale:

- :mod:`trueno_rag_tpu.parallel.mesh` — mesh construction and
  PartitionSpec vocabularies ("data" shards corpora/batches, "model"
  shards encoder weights).
- :mod:`trueno_rag_tpu.parallel.sharded` — corpus-sharded dense top-k:
  each chip scans its HBM-resident shard, computes a local top-k, and
  the k-way merge rides an ICI all-gather (the north-star design in
  BASELINE.json).
"""

from trueno_rag_tpu.parallel.clustered import ShardedClusteredIndex
from trueno_rag_tpu.parallel.compact import ShardedCompactIndex
from trueno_rag_tpu.parallel.hybrid import ShardedHybridIndex
from trueno_rag_tpu.parallel.mesh import create_mesh, encoder_param_specs
from trueno_rag_tpu.parallel.maxsim import (
    ShardedTokenIndex,
    sharded_maxsim_topk,
    sharded_maxsim_topk_scan16_fused,
)
from trueno_rag_tpu.parallel.sharded import ShardedVectorIndex, sharded_dense_topk

__all__ = [
    "create_mesh",
    "encoder_param_specs",
    "sharded_dense_topk",
    "ShardedVectorIndex",
    "ShardedTokenIndex",
    "sharded_maxsim_topk",
    "sharded_maxsim_topk_scan16_fused",
    "ShardedHybridIndex",
    "ShardedCompactIndex",
    "ShardedClusteredIndex",
]
