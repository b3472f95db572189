"""Shared index infrastructure: the chunk-id ↔ device-row registry and
the SparseIndex protocol (reference: trait SparseIndex, index.rs:8-28).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Protocol, Sequence, Tuple, runtime_checkable

from trueno_rag_tpu.chunking import Chunk


class ChunkRegistry:
    """Assigns each chunk a stable dense int32 row id.

    Device arrays (embedding matrix, BM25 doc-length vector) are indexed
    by row; host code maps rows back to chunk ids/objects. Rows of
    removed chunks become tombstones and are recycled for later inserts
    (the mutable-corpus answer to immutable device arrays — SURVEY §7.3).

    When a :class:`VectorStore` and a :class:`BM25Index` share one
    registry (as in HybridRetriever) their candidate rows coincide, so
    fusion runs on device with raw int rows.
    """

    def __init__(self) -> None:
        self._id_to_row: Dict[str, int] = {}
        self._row_to_id: List[Optional[str]] = []
        self._chunks: List[Optional[Chunk]] = []
        self._free: List[int] = []

    def __len__(self) -> int:
        return len(self._id_to_row)

    @property
    def capacity_rows(self) -> int:
        """Rows ever allocated (including tombstones)."""
        return len(self._row_to_id)

    def add(self, chunk: Chunk) -> int:
        """Register a chunk; returns its row. Re-adding an existing id
        replaces the stored chunk and keeps the row."""
        existing = self._id_to_row.get(chunk.id)
        if existing is not None:
            self._chunks[existing] = chunk
            return existing
        row = self._free.pop() if self._free else len(self._row_to_id)
        if row == len(self._row_to_id):
            self._row_to_id.append(chunk.id)
            self._chunks.append(chunk)
        else:
            self._row_to_id[row] = chunk.id
            self._chunks[row] = chunk
        self._id_to_row[chunk.id] = row
        return row

    def row_of(self, chunk_id: str) -> Optional[int]:
        return self._id_to_row.get(chunk_id)

    def id_of(self, row: int) -> Optional[str]:
        if 0 <= row < len(self._row_to_id):
            return self._row_to_id[row]
        return None

    def chunk_of(self, row: int) -> Optional[Chunk]:
        if 0 <= row < len(self._chunks):
            return self._chunks[row]
        return None

    def get_chunk(self, chunk_id: str) -> Optional[Chunk]:
        row = self._id_to_row.get(chunk_id)
        return None if row is None else self._chunks[row]

    def remove(self, chunk_id: str) -> Optional[int]:
        """Tombstone a chunk; returns the freed row (or None)."""
        row = self._id_to_row.pop(chunk_id, None)
        if row is None:
            return None
        self._row_to_id[row] = None
        self._chunks[row] = None
        self._free.append(row)
        return row

    def ids(self) -> List[str]:
        return list(self._id_to_row.keys())


@runtime_checkable
class SparseIndex(Protocol):
    """Protocol mirror of the reference's ``trait SparseIndex``
    (index.rs:8-28)."""

    def add(self, chunk: Chunk) -> None: ...

    def add_batch(self, chunks: Sequence[Chunk]) -> None: ...

    def search(self, query: str, k: int) -> List[Tuple[str, float]]: ...

    def remove(self, chunk_id: str) -> bool: ...

    def __len__(self) -> int: ...

    def is_empty(self) -> bool: ...
