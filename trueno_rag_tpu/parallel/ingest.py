"""Multi-host ingest: shard-local BM25 builds merged into exact global
sharded indexes.

The single-host ingest path (BM25Index / HybridRetriever →
ShardedHybridIndex) tops out where ONE host can hold and tokenize the
whole corpus. At pod scale each host should ingest only its own row
range — the reference has no distribution story at all (SURVEY §2.13);
this module supplies the TPU-pod one:

1. **Shard-local build** (:func:`build_shard`): each host tokenizes its
   documents into a :class:`ShardBuild` — local vocabulary, local CSR
   postings, local doc lengths. Runs the native C++ bulk builder when
   available (same path as BM25Index.add_batch). The build is a plain
   dict of numpy arrays + strings (:meth:`ShardBuild.to_payload`), so
   it ships over DCN/disk with `persist.serialize`.
2. **Exact merge** (:func:`merge_shard_stats` +
   :meth:`~trueno_rag_tpu.parallel.sparse.ShardedBM25.from_shard_builds`):
   documents partition across shards, so every (term, doc) posting
   lives on exactly one shard and global statistics are sums —
   ``df(term) = Σ local df``, ``N = Σ local docs``,
   ``avgdl = Σ total_len / N``. idf is recomputed from the GLOBAL df
   with the exact float64→f32 recipe of
   ``BM25Index._refresh_snapshot`` (index/bm25.py:217-218), and the
   per-posting Okapi contributions are packed with those global stats
   — scores are bit-identical to a single-host build of the same
   corpus (parity-asserted in tests/test_multihost_ingest.py).
3. **Dense side**: each host's embedding block places directly onto
   its shard's devices
   (:meth:`~trueno_rag_tpu.parallel.sharded.ShardedVectorIndex.from_shard_matrices`)
   — the full [N, d] matrix never exists on any single host.

Row space: shard ``i`` of ``s`` owns global rows
``[i·rps, (i+1)·rps)`` where ``rps`` is the common per-shard capacity —
the same contiguous partition ShardedVectorIndex/ShardedBM25 use, so
hybrid fusion needs no row translation.

Reference scoring semantics: index.rs:30-280 (Okapi BM25 with +1
smoothing, score>0 filter); the distribution plan is BASELINE.json's
(the reference is single-node).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from trueno_rag_tpu.errors import InvalidConfigError
from trueno_rag_tpu.text import STOPWORDS, tokenize


@dataclass
class ShardBuild:
    """One host's shard-local BM25 build.

    ``terms`` are this shard's vocabulary (ids = positions); ``indptr``
    is the local CSR over those ids; ``rows`` are SHARD-LOCAL row ids
    (``global = shard_index · rps + local``); ``doc_len`` is dense per
    local row (0 = no document). Postings within a term are
    row-ascending, matching both the native export (rows are added in
    order) and the Python snapshot's sorted plists.
    """

    terms: List[str]
    indptr: np.ndarray  # [T+1] int64
    rows: np.ndarray  # [P] int32, shard-local
    tfs: np.ndarray  # [P] float32
    doc_len: np.ndarray  # [n_rows] float32
    n_docs: int
    total_len: int
    n_rows: int

    def to_payload(self) -> Dict[str, object]:
        """msgpack/`persist.serialize_compressed`-ready dict (the
        DCN/disk wire form): arrays ship as raw little-endian bytes
        with an explicit dtype, like persist.py's matrix frames."""
        return {
            "version": 1,
            # explicit little-endian dtypes: a future dtype change or a
            # big-endian producer must fail loudly on load, not parse
            # into garbage postings
            "dtypes": {"indptr": "<i8", "rows": "<i4", "tfs": "<f4",
                       "doc_len": "<f4"},
            "terms": list(self.terms),
            "indptr": np.ascontiguousarray(self.indptr, dtype="<i8").tobytes(),
            "rows": np.ascontiguousarray(self.rows, dtype="<i4").tobytes(),
            "tfs": np.ascontiguousarray(self.tfs, dtype="<f4").tobytes(),
            "doc_len": np.ascontiguousarray(self.doc_len, dtype="<f4").tobytes(),
            "n_docs": int(self.n_docs),
            "total_len": int(self.total_len),
            "n_rows": int(self.n_rows),
        }

    @classmethod
    def from_payload(cls, payload: Dict[str, object]) -> "ShardBuild":
        from trueno_rag_tpu.errors import SerializationError

        expected = {"indptr": "<i8", "rows": "<i4", "tfs": "<f4",
                    "doc_len": "<f4"}
        declared = payload.get("dtypes", expected)
        if dict(declared) != expected:
            raise SerializationError(
                f"ShardBuild payload declares dtypes {declared}, "
                f"this build expects {expected}"
            )

        def arr(key: str, dtype) -> np.ndarray:
            v = payload[key]
            if isinstance(v, (bytes, bytearray)):
                return np.frombuffer(v, dtype=dtype)
            return np.asarray(v, dtype=dtype)

        return cls(
            terms=list(payload["terms"]),
            indptr=arr("indptr", "<i8"),
            rows=arr("rows", "<i4"),
            tfs=arr("tfs", "<f4"),
            doc_len=arr("doc_len", "<f4"),
            n_docs=int(payload["n_docs"]),
            total_len=int(payload["total_len"]),
            n_rows=int(payload["n_rows"]),
        )


def build_shard(
    texts: Sequence[str],
    n_rows: Optional[int] = None,
    stopwords=STOPWORDS,
    min_token_len: int = 2,
    use_native: Optional[bool] = None,
) -> ShardBuild:
    """Tokenize one shard's documents into a :class:`ShardBuild`.

    ``texts[i]`` occupies shard-local row ``i``; ``n_rows`` reserves a
    larger local row space (capacity) when the shard is not full.
    ``use_native=None`` auto-detects the C++ bulk builder
    (trueno_rag_tpu.native) and falls back to the Python tokenizer;
    both produce identical builds (parity-tested).
    """
    n_docs = len(texts)
    cap = n_docs if n_rows is None else int(n_rows)
    if cap < n_docs:
        raise InvalidConfigError(
            f"n_rows={cap} smaller than the {n_docs} documents provided"
        )

    native = None
    if use_native is not False:
        try:
            from trueno_rag_tpu.native import NativeBM25Builder, native_available

            if native_available():
                native = NativeBM25Builder(
                    min_token_len=min_token_len, stopwords=stopwords
                )
        except Exception:
            if use_native is True:
                raise
    if use_native is True and native is None:
        raise InvalidConfigError(
            "use_native=True but the native builder is unavailable"
        )

    if native is not None:
        counts = (
            native.add_batch(np.arange(n_docs, dtype=np.int64), list(texts))
            if n_docs
            else np.zeros(0, np.int32)
        )
        export = native.export()
        doc_len = np.zeros(max(cap, 1), dtype=np.float32)
        doc_len[export["doc_len_rows"]] = export["doc_len_vals"]
        return ShardBuild(
            terms=list(export["terms"]),
            indptr=np.asarray(export["indptr"], dtype=np.int64),
            rows=np.asarray(export["rows"], dtype=np.int32),
            tfs=np.asarray(export["tfs"], dtype=np.float32),
            doc_len=doc_len[:max(cap, 1)],
            n_docs=n_docs,
            total_len=int(counts.sum()),
            n_rows=cap,
        )

    # Python path: same accumulation as BM25Index.add without a registry
    postings: Dict[str, Dict[int, int]] = {}
    doc_len = np.zeros(max(cap, 1), dtype=np.float32)
    total_len = 0
    for row, text in enumerate(texts):
        toks = tokenize(text, stopwords=stopwords, min_len=min_token_len)
        doc_len[row] = len(toks)
        total_len += len(toks)
        tf: Dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        for term, count in tf.items():
            postings.setdefault(term, {})[row] = count
    terms = sorted(postings.keys())
    sizes = [len(postings[t]) for t in terms]
    indptr = np.zeros(len(terms) + 1, dtype=np.int64)
    np.cumsum(sizes, out=indptr[1:])
    p = int(indptr[-1])
    rows = np.zeros(p, dtype=np.int32)
    tfs = np.zeros(p, dtype=np.float32)
    for ti, t in enumerate(terms):
        lo = int(indptr[ti])
        for j, (row, tf_v) in enumerate(sorted(postings[t].items())):
            rows[lo + j] = row
            tfs[lo + j] = tf_v
    return ShardBuild(
        terms=terms, indptr=indptr, rows=rows, tfs=tfs,
        doc_len=doc_len, n_docs=n_docs, total_len=total_len, n_rows=cap,
    )


def assemble_row_sharded(blocks: Sequence[np.ndarray], mesh, axis: str):
    """Assemble a global device array partitioned as ``P(axis, None, …)``
    from per-shard host blocks WITHOUT materializing the full array on
    this host: each block device_puts straight onto its shard's
    device(s) and :func:`jax.make_array_from_single_device_arrays`
    stitches the global view. Peak host memory is ONE shard block —
    the point of multi-host ingest. (On a real multi-process pod each
    process holds only its own block and calls
    ``jax.make_array_from_process_local_data`` with the same sharding;
    this single-process form is the simulation of that on the virtual
    mesh and the real thing on one host driving several chips.)

    All blocks must share a shape; dim 0 concatenates across shards.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = mesh.shape[axis]
    if len(blocks) != s:
        raise InvalidConfigError(
            f"got {len(blocks)} shard blocks for a {s}-shard '{axis}' axis"
        )
    bshape = blocks[0].shape
    if bshape[0] == 0:
        raise InvalidConfigError(
            "shard blocks have zero rows — build the index after the "
            "first documents arrive (an empty sharded index has no "
            "row space to partition)"
        )
    for blk in blocks:
        if blk.shape != bshape:
            raise InvalidConfigError(
                f"shard blocks must share a shape, got {blk.shape} vs {bshape}"
            )
    shape = (s * bshape[0],) + tuple(bshape[1:])
    sharding = NamedSharding(mesh, P(axis, *([None] * (len(bshape) - 1))))
    bufs = []
    for dev, idx in sharding.addressable_devices_indices_map(shape).items():
        start = idx[0].start or 0
        bufs.append(jax.device_put(blocks[start // bshape[0]], dev))
    return jax.make_array_from_single_device_arrays(shape, sharding, bufs)


def merge_shard_stats(
    builds: Sequence[ShardBuild],
) -> Tuple[List[str], Dict[str, int], np.ndarray, int, float]:
    """Exact global statistics from shard-local builds →
    ``(terms, vocab, idf [G] f32, n_docs, avgdl)``.

    Documents partition across shards, so per-term document frequency
    is the SUM of local posting counts (each (term, doc) pair exists on
    exactly one shard), and avgdl is the global length total over the
    global doc count. idf reproduces ``BM25Index._refresh_snapshot``
    exactly: float64 ``ln((N − df + 0.5)/(df + 0.5) + 1)`` cast to f32,
    with the same ``max(df, 1)`` guard (index/bm25.py:216-218).
    Global term ids are sorted (the Python snapshot's order) — queries
    look terms up by string, so the id order never leaks.
    """
    df_by_term: Dict[str, int] = {}
    n_docs = 0
    total_len = 0
    for b in builds:
        local_df = np.diff(b.indptr)
        for t, c in zip(b.terms, local_df):
            df_by_term[t] = df_by_term.get(t, 0) + int(c)
        n_docs += b.n_docs
        total_len += b.total_len
    terms = sorted(df_by_term.keys())
    vocab = {t: i for i, t in enumerate(terms)}
    n = max(n_docs, 1)
    df = np.maximum(
        np.asarray([df_by_term[t] for t in terms], dtype=np.float64), 1.0
    )
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0).astype(np.float32)
    if idf.size == 0:
        idf = np.zeros(1, dtype=np.float32)
    avgdl = total_len / n_docs if n_docs else 0.0
    return terms, vocab, idf, n_docs, avgdl
