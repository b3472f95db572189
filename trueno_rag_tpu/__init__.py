"""trueno_rag_tpu — a TPU-native Retrieval-Augmented-Generation framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
``trueno-rag`` (Rust reference, see /root/reference): document chunking,
pluggable embedders, hybrid dense+BM25 retrieval, rank fusion, reranking,
context assembly with citations, IR evaluation metrics, compressed index
persistence, query preprocessing and a CLI.

Architecture (TPU-first, not a port):

- Host-side Python owns strings: chunking, tokenization, pipeline
  orchestration, persistence, CLI.
- Device-side JAX/XLA/Pallas owns all numerics: query encoding, dense
  scoring + top-k over an HBM-resident ``[N, d]`` embedding matrix, BM25
  scoring over a device-resident CSR postings store, rank fusion and
  rerank scoring — compiled into a single XLA program per query batch.
- Corpora shard across chips along the row (chunk) dimension with
  ``jax.sharding.NamedSharding``; each chip computes a local top-k and
  results merge over ICI.

Public API mirrors the reference's flat re-export surface
(reference: src/lib.rs:98-113).
"""

from trueno_rag_tpu.errors import (
    ChunkTooLargeError,
    DimensionMismatchError,
    EmbeddingError,
    EmptyDocumentError,
    IndexNotFoundError,
    InvalidConfigError,
    QueryError,
    RagError,
    SerializationError,
    VectorStoreError,
)
from trueno_rag_tpu.document import Document, new_document_id
from trueno_rag_tpu.chunking import (
    Chunk,
    ChunkMetadata,
    Chunker,
    ChunkingStrategy,
    FixedSizeChunker,
    ParagraphChunker,
    RecursiveChunker,
    SemanticChunker,
    SentenceChunker,
    StructuralChunker,
    chunk_id_from_int,
    new_chunk_id,
)

from trueno_rag_tpu.embed import (
    Embedder,
    EmbeddingConfig,
    MockEmbedder,
    PoolingStrategy,
    TfIdfEmbedder,
    cosine_similarity,
    dot_product,
    euclidean_distance,
)
from trueno_rag_tpu.fusion import FusionStrategy
from trueno_rag_tpu.index import (
    BM25Index,
    ChunkRegistry,
    DistanceMetric,
    SparseIndex,
    VectorStore,
    VectorStoreConfig,
)
from trueno_rag_tpu.metrics import AggregatedMetrics, RetrievalMetrics
from trueno_rag_tpu.pipeline import (
    AssembledContext,
    AssemblyStrategy,
    Citation,
    ContextAssembler,
    ContextAssemblerConfig,
    ContextChunk,
    RagPipeline,
    RagPipelineBuilder,
    RagPipelineConfig,
    pipeline_builder,
)
from trueno_rag_tpu.rerank import (
    CompositeReranker,
    LexicalReranker,
    MMRReranker,
    MockCrossEncoderReranker,
    NoOpReranker,
    Reranker,
)
from trueno_rag_tpu.retrieve import (
    TagFilter,
    DenseRetriever,
    HybridRetriever,
    HybridRetrieverConfig,
    RetrievalResult,
    SparseRetriever,
)
from trueno_rag_tpu.preprocess import (
    ChainedPreprocessor,
    HydePreprocessor,
    KeywordExpander,
    MultiQueryPreprocessor,
    PassthroughPreprocessor,
    QueryAnalysis,
    QueryAnalyzer,
    QueryIntent,
    SynonymExpander,
)
from trueno_rag_tpu.preprocess_adaptive import AdaptivePreprocessor

__version__ = "0.2.0"

__all__ = [
    "RagError",
    "EmptyDocumentError",
    "ChunkTooLargeError",
    "DimensionMismatchError",
    "IndexNotFoundError",
    "VectorStoreError",
    "SerializationError",
    "InvalidConfigError",
    "QueryError",
    "EmbeddingError",
    "Document",
    "new_document_id",
    "Chunk",
    "ChunkMetadata",
    "Chunker",
    "ChunkingStrategy",
    "RecursiveChunker",
    "FixedSizeChunker",
    "SemanticChunker",
    "StructuralChunker",
    "ParagraphChunker",
    "SentenceChunker",
    "new_chunk_id",
    "chunk_id_from_int",
    # embed
    "Embedder",
    "EmbeddingConfig",
    "PoolingStrategy",
    "MockEmbedder",
    "TfIdfEmbedder",
    "cosine_similarity",
    "dot_product",
    "euclidean_distance",
    # index
    "BM25Index",
    "ChunkRegistry",
    "DistanceMetric",
    "SparseIndex",
    "VectorStore",
    "VectorStoreConfig",
    # fusion / retrieve / rerank
    "FusionStrategy",
    "DenseRetriever",
    "HybridRetriever",
    "HybridRetrieverConfig",
    "RetrievalResult",
    "TagFilter",
    "SparseRetriever",
    "CompositeReranker",
    "LexicalReranker",
    "MMRReranker",
    "MockCrossEncoderReranker",
    "NoOpReranker",
    "Reranker",
    # pipeline
    "AssembledContext",
    "AssemblyStrategy",
    "Citation",
    "ContextAssembler",
    "ContextAssemblerConfig",
    "ContextChunk",
    "RagPipeline",
    "RagPipelineBuilder",
    "RagPipelineConfig",
    "pipeline_builder",
    # metrics
    "RetrievalMetrics",
    "AggregatedMetrics",
    # preprocessing
    "AdaptivePreprocessor",
    "ChainedPreprocessor",
    "HydePreprocessor",
    "KeywordExpander",
    "MultiQueryPreprocessor",
    "PassthroughPreprocessor",
    "QueryAnalysis",
    "QueryAnalyzer",
    "QueryIntent",
    "SynonymExpander",
    "__version__",
]
