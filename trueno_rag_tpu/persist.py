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
    try:
        sep = rest.index(b"\x00")
        codec = Compression(rest[:sep].decode())
    except (ValueError, UnicodeDecodeError) as e:
        raise SerializationError(f"corrupt codec frame: {e}") from e
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


def _cluster_wire(store, rows) -> Optional[Dict[str, Any]]:
    """Clustered tier (ops/clustered.py): the k-means layout, remapped
    to saved-chunk order, so a load with scan_tier="clustered" skips
    re-clustering. ONLY when the store is clean — a mutation since the
    last clustered build leaves `_cluster` describing stale rows, and a
    load consuming it would scan against unsound radii / miss the
    mutated rows entirely while still certifying (the same reason
    _mark_dirty voids the in-memory preset). `order` entries are STORE
    rows; the artifact re-inserts chunks in saved order (saved index i
    -> loaded row i), so remap store row -> saved index; tombstones and
    holes become -1."""
    if getattr(store, "_cluster", None) is None or store._dirty:
        return None
    saved_of_row = {row: i for i, row in enumerate(rows)}
    order = np.asarray(store._cluster[0])
    order_saved = np.asarray(
        [saved_of_row.get(int(r), -1) if r >= 0 else -1 for r in order],
        dtype=np.int32,
    )
    cent_j, radii_j = store._cluster[2], store._cluster[3]
    return {
        "tile": int(order.shape[0] // len(np.asarray(radii_j))),
        "order": order_saved.tobytes(),
        "centroids": np.asarray(cent_j, dtype=np.float32).tobytes(),
        "centroids_dim": int(np.asarray(cent_j).shape[1]),
        "radii": np.asarray(radii_j, dtype=np.float32).tobytes(),
    }


def _learned_wire(retriever, rows) -> Optional[Dict[str, Any]]:
    """Learned-sparse (tri-hybrid) expansions as a ragged CSR aligned
    with the saved chunk order — weight bytes round-trip exactly, so
    scores after load are identical. Encoder weights travel separately
    (:func:`save_params`), like every other artifact's model split
    (main.rs:442-477)."""
    li = getattr(retriever, "learned_index", None)
    if li is None:
        return None
    enc = retriever.learned_encoder
    indptr = [0]
    terms: list = []
    weights: list = []
    for row in rows:
        ts = li._row_terms.get(row, ())
        terms.extend(int(t) for t in ts)
        weights.extend(li._postings[int(t)][row] for t in ts)
        indptr.append(len(terms))
    return {
        "encoder": {
            "max_len": enc.max_len,
            "doc_top": enc.doc_top,
            "query_top": enc.query_top,
            # encoder IDENTITY: seed (None for externally-supplied
            # params) + a weights fingerprint — load_index refuses to
            # re-attach a query encoder whose fingerprint disagrees
            # (mismatched expansions score as noise, silently)
            "seed": getattr(enc, "seed", None),
            "params_fingerprint": enc.params_fingerprint(),
        },
        "indptr": np.asarray(indptr, np.int64).tobytes(),
        "terms": np.asarray(terms, np.int32).tobytes(),
        "weights": np.asarray(weights, np.float32).tobytes(),
    }


def _build_header(retriever, embedder_info) -> tuple:
    """Everything an index artifact carries EXCEPT the embedding matrix
    (shared by the monolithic v1 and streaming v2 writers) → (header,
    row-ordered chunk ids, their store rows)."""
    reg = retriever.registry
    store = retriever.vector_store
    ids = list(reg.ids())
    rows = [reg.row_of(cid) for cid in ids]
    header = {
        "format": "trueno-rag-tpu-index",
        "dimension": store.dimension,
        "metric": store.config.metric,
        # layout choices the load must not silently downgrade: a bf16rr
        # store reloaded at the default bf16r would serve with the wide
        # (~2e-5) certificate interval its owner explicitly paid 4 B/elem
        # to escape
        "compact_scan": store.config.compact_scan,
        "chunks": [_chunk_to_wire(reg.get_chunk(cid)) for cid in ids],
        "bm25": retriever.sparse_index.state_dict(),
        "bm25_rows": {str(r): i for i, r in enumerate(rows)},
        "retriever_config": {
            "candidates_per_source": retriever.config.candidates_per_source,
            "fusion": retriever.config.fusion.to_dict(),
            "use_dense": retriever.config.use_dense,
            "use_sparse": retriever.config.use_sparse,
            "use_learned": retriever.config.use_learned,
        },
        "embedder": embedder_info or {},
        "tags": _tag_wire(reg, ids),
    }
    cluster = _cluster_wire(store, rows)
    if cluster is not None:
        header["cluster"] = cluster
    learned = _learned_wire(retriever, rows)
    if learned is not None:
        header["learned"] = learned
    return header, ids, rows


def _atomic_writer(path: str):
    """Write to path+'.tmp' then os.replace: a crash/full-disk mid-write
    must not destroy the previous good artifact (open(path, 'wb')
    truncates it immediately)."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        tmp = path + ".tmp"
        try:
            with open(tmp, "wb") as f:
                yield f
            os.replace(tmp, path)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise

    return cm()


def save_index(path: str, retriever, embedder_info: Optional[Dict[str, Any]] = None,
               codec: Optional[Compression] = None) -> Dict[str, Any]:
    """Persist a HybridRetriever (registry + dense matrix + BM25 state).

    Returns a stats dict (raw/compressed sizes). The embedding matrix is
    stored row-aligned with the registry so load reconstructs identical
    device rows — scores round-trip exactly. The write is atomic
    (tmp + rename).
    """
    store = retriever.vector_store
    payload, ids, rows = _build_header(retriever, embedder_info)
    payload["version"] = 1
    matrix = store._host[rows] if rows else np.zeros((0, store.dimension), np.float32)
    payload["embeddings_raw"] = np.ascontiguousarray(matrix, dtype=np.float32).tobytes()
    blob = serialize_compressed(payload, codec)
    with _atomic_writer(path) as f:
        f.write(blob)
    raw = len(payload["embeddings_raw"]) + sum(
        len(c["content"]) for c in payload["chunks"]
    )
    return {"compressed_bytes": len(blob), "raw_bytes_estimate": raw, "chunks": len(ids)}


def _loaded_vector_config(dimension: int, scan_tier: Optional[str], metric: str,
                          compact_scan: Optional[str] = None):
    """VectorStoreConfig for a loaded artifact: restores the saved
    ``metric`` (a dot-metric index reloaded as the default cosine would
    silently re-normalize every row) and the saved ``compact_scan``
    layout (a bf16rr store must not downgrade to bf16r's wide interval),
    and engages ``scan_tier`` (serve a multi-million-chunk artifact with
    `"auto"`/`"bf16"`/`"compact"`/`"clustered"` without touching code —
    the CLI's ``--scan-tier``)."""
    from trueno_rag_tpu.index.vector_store import VectorStoreConfig

    kw = {"dimension": dimension, "metric": metric}
    if scan_tier is not None:
        kw["scan_tier"] = scan_tier
    if compact_scan is not None:  # absent in pre-r5 artifacts
        kw["compact_scan"] = compact_scan
    return VectorStoreConfig(**kw)


def _retriever_from_header(header, embedder, scan_tier):
    """Rebuild the empty retriever from an artifact header (shared by
    the v1 and v2 loaders)."""
    from trueno_rag_tpu.fusion import FusionStrategy
    from trueno_rag_tpu.retrieve import HybridRetriever, HybridRetrieverConfig

    if header.get("format") != "trueno-rag-tpu-index":
        raise SerializationError("not a trueno-rag-tpu index artifact")
    rcfg = header["retriever_config"]
    config = HybridRetrieverConfig(
        candidates_per_source=rcfg["candidates_per_source"],
        fusion=FusionStrategy.from_dict(rcfg["fusion"]),
        use_dense=rcfg["use_dense"],
        use_sparse=rcfg["use_sparse"],
        use_learned=rcfg.get("use_learned", True),
    )
    return HybridRetriever(
        embedder, config=config,
        vector_config=_loaded_vector_config(
            header["dimension"], scan_tier, header.get("metric", "cosine"),
            header.get("compact_scan"),
        ),
    )


def _insert_block(retr, chunk_dicts, block: np.ndarray, start: int) -> None:
    """Bulk-insert one matrix block's chunks (vectorized insert_many —
    per-chunk insert() measured ~17 µs each, tens of seconds at 1M).
    Sequential registration keeps row i == saved index i, which the
    BM25 remap depends on."""
    chunks = []
    for r in range(block.shape[0]):
        chunk = Chunk.from_dict(chunk_dicts[start + r])
        chunk.set_embedding(block[r])
        chunks.append(chunk)
    retr.vector_store.insert_many(chunks)


def _finish_load(retr, header, scan_tier, learned_encoder=None):
    """BM25 state remap + tags + clustered preset + learned-sparse
    postings (shared by both loaders; saved order IS row order because
    inserts allocate rows 0..n-1 in sequence)."""
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
    cluster = header.get("cluster")
    if cluster and scan_tier == "clustered":
        # installed AFTER inserts (each insert clears the preset via
        # _mark_dirty); adopt the artifact's tile size — the layout is
        # tile-coupled and the preset only consumes on an exact match
        d = cluster["centroids_dim"]
        retr.vector_store.config.scan_tile_n = max(int(cluster["tile"]), 128)
        retr.vector_store._cluster_preset = {
            "tile": int(cluster["tile"]),
            "order": np.frombuffer(cluster["order"], dtype=np.int32),
            "centroids": np.frombuffer(
                cluster["centroids"], dtype=np.float32
            ).reshape(-1, d),
            "radii": np.frombuffer(cluster["radii"], dtype=np.float32),
        }
    learned = header.get("learned")
    if learned is not None and learned_encoder is not None:
        # encoder-identity gate: the artifact's postings are the SAVED
        # encoder's document expansions; a query encoder with different
        # weights (other seed, trained vs untrained) scores them as
        # noise with no error — refuse rather than degrade silently
        saved_fp = (learned.get("encoder") or {}).get("params_fingerprint")
        if saved_fp is not None:
            got_fp = learned_encoder.params_fingerprint()
            if got_fp != saved_fp:
                from trueno_rag_tpu.errors import InvalidConfigError

                raise InvalidConfigError(
                    "learned_encoder does not match this artifact's "
                    f"learned-sparse model (saved fingerprint {saved_fp}, "
                    f"supplied {got_fp}); rebuild the encoder with the "
                    "original seed/params (read_index_info()['learned'])"
                )
        # restore the saved expansions VERBATIM (no re-encoding — weight
        # bytes round-trip, so learned scores are identical after load)
        from trueno_rag_tpu.index.learned_sparse import LearnedSparseIndex

        indptr = np.frombuffer(learned["indptr"], np.int64)
        li = LearnedSparseIndex(registry=retr.registry)
        li.load_rows(
            [retr.registry.chunk_of(i) for i in range(len(indptr) - 1)],
            indptr,
            np.frombuffer(learned["terms"], np.int32),
            np.frombuffer(learned["weights"], np.float32),
        )
        retr.learned_encoder = learned_encoder
        retr.learned_index = li
    return retr


def read_index_info(path: str) -> Dict[str, Any]:
    """Artifact metadata WITHOUT rebuilding the index: embedder
    identity, dimension, metric, chunk count, format version — for
    callers (the CLI) that must construct the embedder BEFORE calling
    :func:`load_index`. Handles both the monolithic v1 blob and the v2
    streaming container (whose matrix frames are never read)."""
    if not os.path.exists(path):
        from trueno_rag_tpu.errors import IndexNotFoundError

        raise IndexNotFoundError(f"no index at {path}")
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC2))
        if magic == MAGIC2:
            codec, header = _read_streaming_header(f)
            payload = header
        else:
            payload = deserialize_compressed(magic + f.read())
    if payload.get("format") != "trueno-rag-tpu-index":
        raise SerializationError("not a trueno-rag-tpu index artifact")
    return {
        "embedder": payload.get("embedder", {}),
        "dimension": payload.get("dimension"),
        "metric": payload.get("metric", "cosine"),
        "version": payload.get("version", 1),
        "chunks": payload.get("chunks", []),
        # tri-hybrid artifacts: the learned-sparse expansion config, so
        # callers can rebuild the SpladeEncoder BEFORE load_index
        "learned": (payload.get("learned") or {}).get("encoder"),
    }


def load_index(path: str, embedder, codec: Optional[Compression] = None,
               scan_tier: Optional[str] = None, learned_encoder=None):
    """Rebuild a HybridRetriever from a saved artifact. ``embedder`` is
    supplied by the caller (embedder identity travels in the artifact's
    ``embedder`` dict for the CLI to reconstruct — main.rs:442-477; use
    :func:`read_index_info` to peek without loading). ``scan_tier``
    configures the rebuilt VectorStore's scan tier (default fp32).

    ``learned_encoder``: a SpladeEncoder re-attaching a saved learned-
    sparse (tri-hybrid) section — pass the SAME encoder identity
    (seed/params) the index was built with (peek its expansion config
    via ``read_index_info()['learned']``). Postings restore verbatim;
    without an encoder the artifact loads as a plain two-source hybrid.
    """
    if not os.path.exists(path):
        from trueno_rag_tpu.errors import IndexNotFoundError

        raise IndexNotFoundError(f"no index at {path}")
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC2))
        if magic == MAGIC2:  # v2 streaming container
            return _load_index_streaming(
                f, embedder, scan_tier=scan_tier,
                learned_encoder=learned_encoder,
            )
        payload = deserialize_compressed(magic + f.read())
    retr = _retriever_from_header(payload, embedder, scan_tier)
    dim = payload["dimension"]
    n = len(payload["chunks"])
    matrix = np.frombuffer(payload["embeddings_raw"], dtype=np.float32).reshape(n, dim)
    _insert_block(retr, payload["chunks"], matrix, 0)
    _finish_load(retr, payload, scan_tier, learned_encoder=learned_encoder)
    return retr, payload.get("embedder", {})


# ---------------------------------------------------------------------------
# Streaming index artifacts (multi-GB indexes; constant memory)
# ---------------------------------------------------------------------------


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
    load. The write is atomic (tmp + rename). Layout::

        MAGIC2 | codec\\0 | u64 header_len | compressed header |
        { u64 comp_len | u64 raw_len | compressed rows }*

    :func:`load_index` reads both formats transparently.
    """
    codec = codec or default_compression()
    header, ids, id_rows = _build_header(retriever, embedder_info)
    header["version"] = 2
    store = retriever.vector_store
    n = len(ids)
    header["n_rows"] = n
    header["frame_rows"] = frame_rows
    hdr_c = codec.compress(msgpack.packb(header, use_bin_type=True))
    total_c = 0
    with _atomic_writer(path) as f:
        f.write(MAGIC2 + codec.value.encode() + b"\x00")
        f.write(len(hdr_c).to_bytes(8, "little"))
        f.write(hdr_c)
        for lo in range(0, n, frame_rows):
            hi = min(lo + frame_rows, n)
            block = np.ascontiguousarray(
                store._host[id_rows[lo:hi]], dtype=np.float32
            )
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


def _read_exact(f, nbytes: int, what: str) -> bytes:
    """Read exactly nbytes or raise — a short read means a truncated
    artifact, and treating it as zero-length data would parse garbage
    (or, for zero-row frames, loop forever)."""
    data = f.read(nbytes)
    if len(data) != nbytes:
        raise SerializationError(f"truncated artifact ({what})")
    return data


def _read_streaming_header(f):
    """After MAGIC2: parse (codec, header dict)."""
    codec_bytes = b""
    while True:
        ch = f.read(1)
        if not ch:
            raise SerializationError("truncated artifact (codec id)")
        if ch == b"\x00":
            break
        codec_bytes += ch
    try:
        codec = Compression(codec_bytes.decode())
    except ValueError as e:
        raise SerializationError(f"unknown codec id: {e}") from e
    hdr_len = int.from_bytes(_read_exact(f, 8, "header length"), "little")
    header = msgpack.unpackb(
        codec.decompress(_read_exact(f, hdr_len, "header")),
        raw=False, strict_map_key=False,
    )
    return codec, header


def _load_index_streaming(f, embedder, scan_tier: Optional[str] = None,
                          learned_encoder=None):
    """Resume after MAGIC2: codec id, compressed header, matrix frames."""
    codec, header = _read_streaming_header(f)
    retr = _retriever_from_header(header, embedder, scan_tier)
    dim = header["dimension"]
    n = header["n_rows"]
    loaded = 0
    chunk_dicts = header["chunks"]
    while loaded < n:
        comp_len = int.from_bytes(_read_exact(f, 8, "frame length"), "little")
        raw_len = int.from_bytes(_read_exact(f, 8, "frame length"), "little")
        raw = codec.decompress(_read_exact(f, comp_len, "matrix frame"))
        if len(raw) != raw_len:
            raise SerializationError("corrupt matrix frame")
        block = np.frombuffer(raw, dtype=np.float32).reshape(-1, dim)
        if block.shape[0] == 0:
            # a zero-row frame can never advance `loaded` — fail rather
            # than spin forever on a boundary-truncated artifact
            raise SerializationError("empty matrix frame (truncated artifact?)")
        _insert_block(retr, chunk_dicts, block, loaded)
        loaded += block.shape[0]
    _finish_load(retr, header, scan_tier, learned_encoder=learned_encoder)
    return retr, header.get("embedder", {})


# ---------------------------------------------------------------------------
# Token (late-interaction) index artifacts
# ---------------------------------------------------------------------------


def save_token_index(
    path: str, retriever, codec: Optional[Compression] = None
) -> Dict[str, Any]:
    """Persist a LateInteractionRetriever's token store (chunks + the
    ``[M, Lt, H]`` token matrix + masks + tags + store config). Token
    bytes round-trip exactly (the loader bypasses re-normalization), so
    MaxSim scores and certificates are identical after load. Encoder
    weights travel separately (:func:`save_params`), mirroring how
    :func:`save_index` leaves embedder identity to the caller
    (main.rs:442-477). Atomic write (tmp + rename)."""
    store = retriever.store
    reg = store.registry
    cfg = store.config
    ids = [
        cid
        for cid in reg.ids()
        if reg.row_of(cid) is not None and store._valid[reg.row_of(cid)]
    ]
    rows = [reg.row_of(cid) for cid in ids]
    tok = (
        np.ascontiguousarray(store._host[rows], dtype=np.float32)
        if rows
        else np.zeros((0, cfg.max_tokens, cfg.hidden_dim), np.float32)
    )
    tm = (
        np.ascontiguousarray(store._t_mask[rows])
        if rows
        else np.zeros((0, cfg.max_tokens), bool)
    )
    payload = {
        "format": "trueno-rag-tpu-token-index",
        "version": 1,
        "store_config": {
            "hidden_dim": cfg.hidden_dim,
            "max_tokens": cfg.max_tokens,
            "storage_dtype": cfg.storage_dtype,
            "scan": cfg.scan,
            "scan_dtype": cfg.scan_dtype,
            "scan_kernel": cfg.scan_kernel,
            "t_hits": cfg.t_hits,
            "rescore": cfg.rescore,
            "scan_block": cfg.scan_block,
            "normalize": cfg.normalize,
        },
        "encoder": {"max_len": retriever.max_len},
        "chunks": [_chunk_to_wire(reg.get_chunk(cid)) for cid in ids],
        "tokens_raw": tok.tobytes(),
        "t_mask_raw": np.packbits(tm).tobytes() if len(rows) else b"",
        "tags": _tag_wire(reg, ids),
    }
    blob = serialize_compressed(payload, codec)
    with _atomic_writer(path) as f:
        f.write(blob)
    return {
        "compressed_bytes": len(blob),
        "raw_bytes_estimate": tok.nbytes,
        "chunks": len(ids),
    }


def load_token_index(
    path: str,
    encoder_config=None,
    params: Optional[Dict[str, Any]] = None,
    seed: int = 0,
    scan: Optional[str] = None,
):
    """Rebuild a LateInteractionRetriever from :func:`save_token_index`.
    The encoder identity (config/params/seed) is supplied by the caller
    like :func:`load_index`'s embedder; ``scan`` overrides the stored
    scan-tier choice."""
    if not os.path.exists(path):
        from trueno_rag_tpu.errors import IndexNotFoundError

        raise IndexNotFoundError(f"no token index at {path}")
    with open(path, "rb") as f:
        payload = deserialize_compressed(f.read())
    if payload.get("format") != "trueno-rag-tpu-token-index":
        from trueno_rag_tpu.errors import SerializationError

        raise SerializationError(
            f"not a token-index artifact: {payload.get('format')!r}"
        )
    from trueno_rag_tpu.index.token_store import TokenStoreConfig
    from trueno_rag_tpu.models.late_interaction import LateInteractionRetriever

    sc = dict(payload["store_config"])
    if scan is not None:
        sc["scan"] = scan
    store_config = TokenStoreConfig(**sc)
    retr = LateInteractionRetriever(
        config=encoder_config,
        params=params,
        seed=seed,
        max_len=int(payload["encoder"]["max_len"]),
        store_config=store_config,
    )
    chunk_dicts = payload["chunks"]
    m = len(chunk_dicts)
    lt, h = store_config.max_tokens, store_config.hidden_dim
    tok = np.frombuffer(payload["tokens_raw"], dtype=np.float32).reshape(m, lt, h)
    tm = (
        np.unpackbits(
            np.frombuffer(payload["t_mask_raw"], dtype=np.uint8),
            count=m * lt,
        )
        .astype(bool)
        .reshape(m, lt)
        if m
        else np.zeros((0, lt), bool)
    )
    chunks = [Chunk.from_dict(d) for d in chunk_dicts]
    retr.store.load_rows(chunks, tok.copy(), tm)
    tags = payload.get("tags")
    if tags:
        retr.store.registry.load_tag_state(tags["vocab"], tags["rows"])
    return retr


# ---------------------------------------------------------------------------
# Learned-sparse (SPLADE) index artifacts
# ---------------------------------------------------------------------------


def save_splade_index(
    path: str, retriever, codec: Optional[Compression] = None
) -> Dict[str, Any]:
    """Persist a SpladeRetriever's posting index (chunks + per-chunk
    expansions as a ragged CSR + tags + expansion config). Weights
    round-trip exactly (f32 bytes), so scores after load are identical.
    Encoder weights travel separately (:func:`save_params`), like every
    other index artifact (main.rs:442-477's embedder-identity split).
    Atomic write (tmp + rename)."""
    idx = retriever.index_store
    reg = idx.registry
    ids = [
        cid
        for cid in reg.ids()
        if (row := reg.row_of(cid)) is not None and row in idx._row_terms
    ]
    rows = [reg.row_of(cid) for cid in ids]
    indptr = [0]
    terms: list = []
    weights: list = []
    for row in rows:
        ts = idx._row_terms[row]
        terms.extend(int(t) for t in ts)
        weights.extend(idx._postings[int(t)][row] for t in ts)
        indptr.append(len(terms))
    enc = retriever.encoder
    payload = {
        "format": "trueno-rag-tpu-splade-index",
        "version": 1,
        "encoder": {
            "max_len": enc.max_len,
            "doc_top": enc.doc_top,
            "query_top": enc.query_top,
        },
        "chunks": [_chunk_to_wire(reg.get_chunk(cid)) for cid in ids],
        "indptr": np.asarray(indptr, np.int64).tobytes(),
        "terms": np.asarray(terms, np.int32).tobytes(),
        "weights": np.asarray(weights, np.float32).tobytes(),
        "tags": _tag_wire(reg, ids),
    }
    blob = serialize_compressed(payload, codec)
    with _atomic_writer(path) as f:
        f.write(blob)
    return {
        "compressed_bytes": len(blob),
        "postings": len(terms),
        "chunks": len(ids),
    }


def load_splade_index(
    path: str,
    encoder_config=None,
    params: Optional[Dict[str, Any]] = None,
    seed: int = 0,
):
    """Rebuild a SpladeRetriever from :func:`save_splade_index`. The
    encoder identity (config/params/seed) is supplied by the caller —
    pass the SAME seed/params the index was built with, or its
    expansions no longer match the index's."""
    if not os.path.exists(path):
        from trueno_rag_tpu.errors import IndexNotFoundError

        raise IndexNotFoundError(f"no splade index at {path}")
    with open(path, "rb") as f:
        payload = deserialize_compressed(f.read())
    if payload.get("format") != "trueno-rag-tpu-splade-index":
        from trueno_rag_tpu.errors import SerializationError

        raise SerializationError(
            f"not a splade-index artifact: {payload.get('format')!r}"
        )
    from trueno_rag_tpu.models.splade import SpladeRetriever

    enc = payload["encoder"]
    retr = SpladeRetriever(
        config=encoder_config,
        params=params,
        seed=seed,
        max_len=int(enc["max_len"]),
        doc_top=int(enc["doc_top"]),
        query_top=int(enc["query_top"]),
    )
    chunks = [Chunk.from_dict(d) for d in payload["chunks"]]
    indptr = np.frombuffer(payload["indptr"], np.int64)
    terms = np.frombuffer(payload["terms"], np.int32)
    weights = np.frombuffer(payload["weights"], np.float32)
    retr.index_store.load_rows(chunks, indptr, terms, weights)
    tags = payload.get("tags")
    if tags:
        retr.registry.load_tag_state(tags["vocab"], tags["rows"])
    return retr


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
