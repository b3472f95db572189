"""Indexes: device-resident dense vector store and hybrid-sparse BM25.

The reference keeps both indexes as host HashMaps (index.rs). Here the
numeric state lives on device (HBM) and the string/id state lives on
host, bridged by a shared :class:`ChunkRegistry` that assigns dense
int32 row ids so the dense and sparse candidate lists can be fused on
device without id translation.
"""

from trueno_rag_tpu.index.base import ChunkRegistry, SparseIndex
from trueno_rag_tpu.index.bm25 import BM25Index
from trueno_rag_tpu.index.learned_sparse import LearnedSparseIndex
from trueno_rag_tpu.index.token_store import TokenStoreConfig, TokenVectorStore
from trueno_rag_tpu.index.vector_store import DistanceMetric, VectorStore, VectorStoreConfig

__all__ = [
    "ChunkRegistry",
    "SparseIndex",
    "BM25Index",
    "LearnedSparseIndex",
    "VectorStore",
    "VectorStoreConfig",
    "DistanceMetric",
    "TokenStoreConfig",
    "TokenVectorStore",
]
