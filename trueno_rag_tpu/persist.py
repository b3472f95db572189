"""Persistence: compressed index artifacts and model checkpoints.

Capability-equivalent to the reference's ``src/compressed.rs`` (LZ4/ZSTD
codecs compressed.rs:13-65, generic serialize/deserialize
compressed.rs:71-90, BM25 snapshot round-trip compressed.rs:92-108) and
the CLI's ``index.json`` format (main.rs:134-154) — extended to cover
what the reference defers: the dense embedding matrix persists too
(VectorStore compression is "future work" in the reference,
compressed.rs:9-10).

Design: one artifact = msgpack payload (chunks, BM25 state, config,
embedder identity) with the embedding matrix as raw float32 bytes,
wrapped in a codec frame ``MAGIC | codec | compressed-payload``.
Codecs: ``zstd`` (default, ~4-6x on index data), ``lz4`` (system
liblz4 via ctypes, lz4_flex-compatible framing, probed at runtime) and
``zlib`` (stdlib fallback). Model checkpoints use safetensors.
"""

from __future__ import annotations

import enum
import os
import zlib
from typing import Any, Dict, Optional, Tuple

import msgpack
import numpy as np

from trueno_rag_tpu.chunking import Chunk
from trueno_rag_tpu.errors import SerializationError

try:
    import zstandard as _zstd

    _HAS_ZSTD = True
except ImportError:  # pragma: no cover
    _HAS_ZSTD = False

MAGIC = b"TRAGv1\x00"
MAGIC2 = b"TRAGv2\x00"  # streaming container: header + framed matrix


class Compression(str, enum.Enum):
    """Codec selection (reference: Compression::{Lz4, Zstd},
    compressed.rs:13-65). Zstd is the default like the reference's
    production recommendation; LZ4 binds the system liblz4 via ctypes
    in the reference's exact lz4_flex prepend-size wire format
    (trueno_rag_tpu/_lz4.py) and is probed at runtime; Zlib is the
    always-available stdlib fallback."""

    NONE = "none"
    ZLIB = "zlib"
    ZSTD = "zstd"
    LZ4 = "lz4"

    def compress(self, data: bytes, level: Optional[int] = None) -> bytes:
        if not data:
            return b""  # empty in -> empty out (reference contract)
        if self is Compression.NONE:
            return data
        if self is Compression.ZLIB:
            return zlib.compress(data, level if level is not None else 6)
        if self is Compression.LZ4:
            from trueno_rag_tpu import _lz4

            return _lz4.compress(data)
        if self is Compression.ZSTD:
            if not _HAS_ZSTD:
                raise SerializationError("zstandard not available")
            return _zstd.ZstdCompressor(level=level if level is not None else 3).compress(data)
        raise SerializationError(f"unknown codec {self}")

    def decompress(self, data: bytes) -> bytes:
        if not data:
            return b""
        if self is Compression.NONE:
            return data
        if self is Compression.ZLIB:
            return zlib.decompress(data)
        if self is Compression.LZ4:
            from trueno_rag_tpu import _lz4

            return _lz4.decompress(data)
        if self is Compression.ZSTD:
            if not _HAS_ZSTD:
                raise SerializationError("zstandard not available")
            return _zstd.ZstdDecompressor().decompress(data)
        raise SerializationError(f"unknown codec {self}")

    @property
    def is_available(self) -> bool:
        if self is Compression.LZ4:
            from trueno_rag_tpu import _lz4

            return _lz4.available()
        if self is Compression.ZSTD:
            return _HAS_ZSTD
        return True


def default_compression() -> Compression:
    return Compression.ZSTD if _HAS_ZSTD else Compression.ZLIB


# ---------------------------------------------------------------------------
# Generic compressed (de)serialization (reference: compressed.rs:71-90)
# ---------------------------------------------------------------------------


def serialize_compressed(obj: Any, codec: Optional[Compression] = None) -> bytes:
    """msgpack + codec with a self-describing frame."""
    codec = codec or default_compression()
    try:
        payload = msgpack.packb(obj, use_bin_type=True)
    except (TypeError, ValueError) as e:
        raise SerializationError(f"cannot serialize: {e}") from e
    return MAGIC + codec.value.encode() + b"\x00" + codec.compress(payload)


def deserialize_compressed(data: bytes) -> Any:
    if not data.startswith(MAGIC):
        raise SerializationError("bad magic: not a trueno_rag_tpu artifact")
    rest = data[len(MAGIC) :]
    sep = rest.index(b"\x00")
    codec = Compression(rest[:sep].decode())
    try:
        return msgpack.unpackb(codec.decompress(rest[sep + 1 :]), raw=False, strict_map_key=False)
    except Exception as e:
        raise SerializationError(f"cannot deserialize: {e}") from e


# ---------------------------------------------------------------------------
# Index artifacts
# ---------------------------------------------------------------------------


def _tag_wire(reg, ordered_ids) -> Dict[str, Any]:
    vocab, rows = reg.tag_state(ordered_ids)
    return {"vocab": vocab, "rows": rows}


def _chunk_to_wire(c: Chunk) -> Dict[str, Any]:
    d = c.to_dict()
    d.pop("embedding", None)  # embeddings travel in the matrix, not per chunk
    return d


def save_index(path: str, retriever, embedder_info: Optional[Dict[str, Any]] = None,
               codec: Optional[Compression] = None) -> Dict[str, Any]:
    """Persist a HybridRetriever (registry + dense matrix + BM25 state).

    Returns a stats dict (raw/compressed sizes). The embedding matrix is
    stored row-aligned with the registry so load reconstructs identical
    device rows — scores round-trip exactly.
    """
    reg = retriever.registry
    store = retriever.vector_store
    rows = []
    chunks = []
    for cid in reg.ids():
        row = reg.row_of(cid)
        rows.append(row)
        chunks.append(_chunk_to_wire(reg.get_chunk(cid)))
    matrix = store._host[rows] if rows else np.zeros((0, store.dimension), np.float32)
    payload = {
        "format": "trueno-rag-tpu-index",
        "version": 1,
        "dimension": store.dimension,
        "metric": store.config.metric,
        "chunks": chunks,
        "embeddings_raw": np.ascontiguousarray(matrix, dtype=np.float32).tobytes(),
        "bm25": retriever.sparse_index.state_dict(),
        "bm25_rows": {str(reg.row_of(cid)): i for i, cid in enumerate(reg.ids())},
        "retriever_config": {
            "candidates_per_source": retriever.config.candidates_per_source,
            "fusion": retriever.config.fusion.to_dict(),
            "use_dense": retriever.config.use_dense,
            "use_sparse": retriever.config.use_sparse,
        },
        "embedder": embedder_info or {},
        "tags": _tag_wire(reg, reg.ids()),
    }
    if getattr(store, "_cluster", None) is not None and not store._dirty:
        # Clustered tier (ops/clustered.py): persist the k-means layout
        # so a load with scan_tier="clustered" skips re-clustering.
        # ONLY when the store is clean — a mutation since the last
        # clustered build leaves `_cluster` describing stale rows, and
        # a load consuming it would scan against unsound radii / miss
        # the mutated rows entirely while still certifying (the same
        # reason _mark_dirty voids the in-memory preset). Dirty stores
        # save without the layout; the loader re-clusters.
        # `order` entries are STORE rows; the artifact re-inserts chunks
        # in saved order (saved index i -> loaded row i), so remap store
        # row -> saved index. Tombstoned/hole entries become -1.
        saved_of_row = {row: i for i, row in enumerate(rows)}
        order = np.asarray(store._cluster[0])
        order_saved = np.asarray(
            [saved_of_row.get(int(r), -1) if r >= 0 else -1 for r in order],
            dtype=np.int32,
        )
        cent_j, radii_j = store._cluster[2], store._cluster[3]
        payload["cluster"] = {
            "tile": int(order.shape[0] // len(np.asarray(radii_j))),
            "order": order_saved.tobytes(),
            "centroids": np.asarray(cent_j, dtype=np.float32).tobytes(),
            "centroids_dim": int(np.asarray(cent_j).shape[1]),
            "radii": np.asarray(radii_j, dtype=np.float32).tobytes(),
        }
    blob = serialize_compressed(payload, codec)
    with open(path, "wb") as f:
        f.write(blob)
    raw = len(payload["embeddings_raw"]) + sum(len(c["content"]) for c in chunks)
    return {"compressed_bytes": len(blob), "raw_bytes_estimate": raw, "chunks": len(chunks)}


def _loaded_vector_config(dimension: int, scan_tier: Optional[str]):
    """VectorStoreConfig for a loaded artifact: ``scan_tier`` engages a
    reduced-precision certified tier on the rebuilt store (serve a
    multi-million-chunk artifact with `"auto"`/`"bf16"`/`"compact"`
    without touching code — the CLI's ``--scan-tier``)."""
    if scan_tier is None:
        return None
    from trueno_rag_tpu.index.vector_store import VectorStoreConfig

    return VectorStoreConfig(dimension=dimension, scan_tier=scan_tier)


def load_index(path: str, embedder, codec: Optional[Compression] = None,
               scan_tier: Optional[str] = None):
    """Rebuild a HybridRetriever from a saved artifact. ``embedder`` is
    supplied by the caller (embedder identity travels in the artifact's
    ``embedder`` dict for the CLI to reconstruct — main.rs:442-477).
    ``scan_tier`` configures the rebuilt VectorStore's scan tier
    (default fp32)."""
    from trueno_rag_tpu.fusion import FusionStrategy
    from trueno_rag_tpu.retrieve import HybridRetriever, HybridRetrieverConfig

    if not os.path.exists(path):
        from trueno_rag_tpu.errors import IndexNotFoundError

        raise IndexNotFoundError(f"no index at {path}")
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC2))
        if magic == MAGIC2:  # v2 streaming container
            return _load_index_streaming(f, embedder, scan_tier=scan_tier)
        payload = deserialize_compressed(magic + f.read())
    if payload.get("format") != "trueno-rag-tpu-index":
        raise SerializationError("not a trueno-rag-tpu index artifact")

    rcfg = payload["retriever_config"]
    config = HybridRetrieverConfig(
        candidates_per_source=rcfg["candidates_per_source"],
        fusion=FusionStrategy.from_dict(rcfg["fusion"]),
        use_dense=rcfg["use_dense"],
        use_sparse=rcfg["use_sparse"],
    )
    retr = HybridRetriever(
        embedder, config=config,
        vector_config=_loaded_vector_config(payload["dimension"], scan_tier),
    )
    dim = payload["dimension"]
    n = len(payload["chunks"])
    matrix = np.frombuffer(payload["embeddings_raw"], dtype=np.float32).reshape(n, dim)
    # Re-insert in saved order so registry rows match the BM25 state's rows.
    for i, cd in enumerate(payload["chunks"]):
        chunk = Chunk.from_dict(cd)
        chunk.set_embedding(matrix[i])
        retr.vector_store.insert(chunk)
    # BM25 state referenced original rows; saved order IS row order here
    # because insert() allocates rows 0..n-1 in sequence.
    row_remap = {int(r): i for r, i in payload["bm25_rows"].items()}
    bm25_state = payload["bm25"]
    bm25_state["postings"] = {
        t: {str(row_remap[int(r)]): tf for r, tf in plist.items()}
        for t, plist in bm25_state["postings"].items()
    }
    bm25_state["doc_len"] = {str(row_remap[int(r)]): l for r, l in bm25_state["doc_len"].items()}
    retr.sparse_index.load_state_dict(bm25_state)
    tags = payload.get("tags")
    if tags:
        retr.registry.load_tag_state(tags["vocab"], tags["rows"])
    cluster = payload.get("cluster")
    if cluster and scan_tier == "clustered":
        # saved index i == loaded row i (sequential inserts above), so
        # the saved order IS the loaded order; installed AFTER inserts
        # (each insert clears the preset via _mark_dirty)
        d = cluster["centroids_dim"]
        # adopt the artifact's tile size — the layout is tile-coupled
        # and the preset only consumes on an exact tile match
        retr.vector_store.config.scan_tile_n = max(
            int(cluster["tile"]),
            128,  # config floor; prepare tiles are >= the kernel's 1024
        )
        retr.vector_store._cluster_preset = {
            "tile": int(cluster["tile"]),
            "order": np.frombuffer(cluster["order"], dtype=np.int32),
            "centroids": np.frombuffer(
                cluster["centroids"], dtype=np.float32
            ).reshape(-1, d),
            "radii": np.frombuffer(cluster["radii"], dtype=np.float32),
        }
    return retr, payload.get("embedder", {})


# ---------------------------------------------------------------------------
# Streaming index artifacts (multi-GB indexes; constant memory)
# ---------------------------------------------------------------------------


def _index_header(retriever, embedder_info):
    """The v1 payload minus the embedding matrix (which streams as
    frames); returns (header dict, row-ordered chunk-id list)."""
    reg = retriever.registry
    store = retriever.vector_store
    ids = list(reg.ids())
    header = {
        "format": "trueno-rag-tpu-index",
        "version": 2,
        "dimension": store.dimension,
        "metric": store.config.metric,
        "chunks": [_chunk_to_wire(reg.get_chunk(cid)) for cid in ids],
        "bm25": retriever.sparse_index.state_dict(),
        "bm25_rows": {str(reg.row_of(cid)): i for i, cid in enumerate(ids)},
        "retriever_config": {
            "candidates_per_source": retriever.config.candidates_per_source,
            "fusion": retriever.config.fusion.to_dict(),
            "use_dense": retriever.config.use_dense,
            "use_sparse": retriever.config.use_sparse,
        },
        "embedder": embedder_info or {},
        "tags": _tag_wire(reg, ids),
    }
    return header, ids


def save_index_streaming(
    path: str,
    retriever,
    embedder_info: Optional[Dict[str, Any]] = None,
    codec: Optional[Compression] = None,
    frame_rows: int = 65536,
) -> Dict[str, Any]:
    """Persist a HybridRetriever with the embedding matrix written as
    independent compressed frames of ``frame_rows`` rows each.

    Unlike :func:`save_index` (one monolithic msgpack blob — fine at
    MBs, 3x peak memory at GBs), this streams: peak memory is one frame
    regardless of corpus size, and frames decompress independently on
    load. Layout::

        MAGIC2 | codec\\0 | u64 header_len | compressed header |
        { u64 comp_len | u64 raw_len | compressed rows }*

    :func:`load_index` reads both formats transparently.
    """
    codec = codec or default_compression()
    header, ids = _index_header(retriever, embedder_info)
    reg = retriever.registry
    store = retriever.vector_store
    n = len(ids)
    header["n_rows"] = n
    header["frame_rows"] = frame_rows
    hdr_c = codec.compress(msgpack.packb(header, use_bin_type=True))
    total_c = 0
    with open(path, "wb") as f:
        f.write(MAGIC2 + codec.value.encode() + b"\x00")
        f.write(len(hdr_c).to_bytes(8, "little"))
        f.write(hdr_c)
        for lo in range(0, n, frame_rows):
            hi = min(lo + frame_rows, n)
            rows = [reg.row_of(cid) for cid in ids[lo:hi]]
            block = np.ascontiguousarray(store._host[rows], dtype=np.float32)
            raw = block.tobytes()
            comp = codec.compress(raw)
            f.write(len(comp).to_bytes(8, "little"))
            f.write(len(raw).to_bytes(8, "little"))
            f.write(comp)
            total_c += len(comp)
    return {
        "compressed_bytes": os.path.getsize(path),
        "matrix_frames": -(-n // frame_rows) if n else 0,
        "matrix_compressed_bytes": total_c,
        "chunks": n,
    }


def _load_index_streaming(f, embedder, scan_tier: Optional[str] = None):
    """Resume after MAGIC2: codec id, compressed header, matrix frames."""
    from trueno_rag_tpu.fusion import FusionStrategy
    from trueno_rag_tpu.retrieve import HybridRetriever, HybridRetrieverConfig

    codec_bytes = b""
    while True:
        ch = f.read(1)
        if not ch:
            raise SerializationError("truncated artifact (codec id)")
        if ch == b"\x00":
            break
        codec_bytes += ch
    codec = Compression(codec_bytes.decode())
    hdr_len = int.from_bytes(f.read(8), "little")
    header = msgpack.unpackb(codec.decompress(f.read(hdr_len)), raw=False, strict_map_key=False)
    if header.get("format") != "trueno-rag-tpu-index":
        raise SerializationError("not a trueno-rag-tpu index artifact")
    rcfg = header["retriever_config"]
    config = HybridRetrieverConfig(
        candidates_per_source=rcfg["candidates_per_source"],
        fusion=FusionStrategy.from_dict(rcfg["fusion"]),
        use_dense=rcfg["use_dense"],
        use_sparse=rcfg["use_sparse"],
    )
    dim = header["dimension"]
    retr = HybridRetriever(
        embedder, config=config,
        vector_config=_loaded_vector_config(dim, scan_tier),
    )
    n = header["n_rows"]
    loaded = 0
    chunk_dicts = header["chunks"]
    while loaded < n:
        comp_len = int.from_bytes(f.read(8), "little")
        raw_len = int.from_bytes(f.read(8), "little")
        raw = codec.decompress(f.read(comp_len))
        if len(raw) != raw_len:
            raise SerializationError("corrupt matrix frame")
        block = np.frombuffer(raw, dtype=np.float32).reshape(-1, dim)
        for r in range(block.shape[0]):
            chunk = Chunk.from_dict(chunk_dicts[loaded + r])
            chunk.set_embedding(block[r])
            retr.vector_store.insert(chunk)
        loaded += block.shape[0]
    row_remap = {int(r): i for r, i in header["bm25_rows"].items()}
    bm25_state = header["bm25"]
    bm25_state["postings"] = {
        t: {str(row_remap[int(r)]): tf for r, tf in plist.items()}
        for t, plist in bm25_state["postings"].items()
    }
    bm25_state["doc_len"] = {str(row_remap[int(r)]): l for r, l in bm25_state["doc_len"].items()}
    retr.sparse_index.load_state_dict(bm25_state)
    tags = header.get("tags")
    if tags:
        retr.registry.load_tag_state(tags["vocab"], tags["rows"])
    return retr, header.get("embedder", {})


# ---------------------------------------------------------------------------
# Model checkpoints (safetensors)
# ---------------------------------------------------------------------------


def save_params(path: str, params: Dict[str, Any], meta: Optional[Dict[str, str]] = None) -> None:
    from safetensors.numpy import save_file

    flat = {k: np.asarray(v) for k, v in params.items()}
    save_file(flat, path, metadata={k: str(v) for k, v in (meta or {}).items()})


def load_params(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, str]]:
    from safetensors import safe_open
    from safetensors.numpy import load_file

    if not os.path.exists(path):
        raise SerializationError(f"no checkpoint at {path}")
    params = load_file(path)
    with safe_open(path, framework="numpy") as f:
        meta = dict(f.metadata() or {})
    return params, meta
