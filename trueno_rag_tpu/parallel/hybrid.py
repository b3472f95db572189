"""Pod-scale hybrid serving: sharded dense + sharded sparse + fusion.

The BASELINE.json north star: a hybrid (dense+BM25) index whose memory
footprint scales as total/s per chip on BOTH sides. The ``[N, d]``
embedding matrix shards row-wise; the BM25 postings shard by DOCUMENT
over the same contiguous row partition (parallel/sparse.py) — at the
10M-chunk north star with ~100 postings/chunk, a replicated block table
would be ~8 GB on every chip (4x the dense shard; VERDICT r1 weak #2),
while the document shard is total/s with scores bit-identical to the
single-host path (global df/avgdl baked into contributions at build).

Query plan (one jitted program per source per batch):

  dense:   replicated queries → per-shard MXU scan → local top-k →
           ICI all-gather merge (exact)
  sparse:  per-shard BM25 block-gather over the shard's own postings →
           local top-k → the same k·s ICI merge (exact)
  fuse:    any of the six strategies over the two padded candidate sets
  output:  global (rows, scores) top-k

``sparse_mode="replicated"`` keeps the round-1 layout (single-host
snapshot arrays) — the right call for small corpora where one chip's
worth of postings is trivial and per-shard slot compilation costs more
than it saves.

Built once from a :class:`~trueno_rag_tpu.retrieve.HybridRetriever`
snapshot (or artifacts); serving-oriented and immutable — mutate the
single-host retriever and rebuild/refresh shards.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from trueno_rag_tpu.fusion import FusionStrategy
from trueno_rag_tpu.ops.fusion import fuse_topk
from trueno_rag_tpu.parallel.sharded import ShardedVectorIndex
from trueno_rag_tpu.parallel.sparse import ShardedBM25
from trueno_rag_tpu.retrieve import RetrievalResult


class ShardedHybridIndex:
    """Read-optimized multi-chip hybrid index."""

    def __init__(
        self,
        retriever,
        mesh: Mesh,
        fusion: Optional[FusionStrategy] = None,
        candidates_per_source: Optional[int] = None,
        sparse_mode: str = "sharded",
        dense_mode: str = "fp32",
    ) -> None:
        if sparse_mode not in ("sharded", "replicated"):
            from trueno_rag_tpu.errors import InvalidConfigError

            raise InvalidConfigError(f"unknown sparse_mode {sparse_mode!r}")
        if dense_mode not in ("fp32", "compact", "clustered"):
            from trueno_rag_tpu.errors import InvalidConfigError

            raise InvalidConfigError(f"unknown dense_mode {dense_mode!r}")
        self.dense_mode = dense_mode
        self.mesh = mesh
        self.registry = retriever.registry
        self.embedder = retriever.embedder
        self.fusion = fusion or retriever.config.fusion
        self.candidates = candidates_per_source or retriever.config.candidates_per_source
        self.sparse_mode = sparse_mode

        store = retriever.vector_store
        self._store = store
        self.dense = self._build_dense()
        self._tags_version_seen = self.registry.tags_version
        sparse = retriever.sparse_index
        sparse._refresh_snapshot()
        self._bm25 = sparse
        self._snap = sparse._snap
        self.sparse = (
            ShardedBM25(sparse, mesh) if sparse_mode == "sharded" else None
        )
        # tri-hybrid: a retriever with a learned-sparse source shards it
        # by document like BM25 (parallel/sparse.ShardedLearnedSparse);
        # queries then fuse three candidate sets N-way
        self.learned = None
        self.learned_encoder = None
        # gated on config.use_learned exactly like the single-host
        # retrieve_batch — otherwise the mesh would tri-fuse while the
        # host path returns two-source results (a parity break)
        self._learned_index = (
            getattr(retriever, "learned_index", None)
            if retriever.config.use_learned else None
        )
        if self._learned_index is not None and len(self._learned_index) > 0:
            from trueno_rag_tpu.parallel.sparse import ShardedLearnedSparse

            self.learned = ShardedLearnedSparse(self._learned_index, mesh)
            self.learned_encoder = retriever.learned_encoder

    def _build_dense(self):
        store = self._store
        if self.dense_mode == "compact":
            # 3 B/element per chip, certified-set global merge; tag
            # filters ride the scan kernel — see parallel/compact.py
            from trueno_rag_tpu.parallel.compact import ShardedCompactIndex

            return ShardedCompactIndex(
                store._host,
                self.mesh,
                metric=store.config.metric,
                valid=store._valid,
                rows_normalized=True,  # VectorStore normalizes at insert
                tags=self.registry.tags_host(store._host.shape[0]),
                # follow the store's configured compact layout: bf16rr
                # (two residual levels, near-100% device certification)
                # shards at 4 B/elem; bf16/int8 single-chip variants
                # have no sharded scan — they compose as bf16r
                layout=(
                    "bf16rr"
                    if store.config.compact_scan == "bf16rr" else "bf16r"
                ),
            )
        if self.dense_mode == "clustered":
            # per-shard cluster-pruned scans + the same composed global
            # certificate — the pod latency tier (parallel/clustered.py)
            from trueno_rag_tpu.parallel.clustered import ShardedClusteredIndex

            return ShardedClusteredIndex(
                store._host,
                self.mesh,
                metric=store.config.metric,
                valid=store._valid,
                rows_normalized=True,
                tile_n=max(store.config.scan_tile_n, 1024),
                probe_tiles=store.config.cluster_probe_tiles,
                fetch=store.config.cluster_fetch,
                tags=self.registry.tags_host(store._host.shape[0]),
            )
        return ShardedVectorIndex(
            store._host,
            self.mesh,
            metric=store.config.metric,
            valid=store._valid,
            rows_normalized=True,  # VectorStore normalizes at insert
            tags=self.registry.tags_host(store._host.shape[0]),
        )

    @classmethod
    def from_shard_builds(
        cls,
        embedder,
        dense_blocks: Sequence[np.ndarray],
        sparse_builds: Sequence[object],
        mesh: Mesh,
        chunks_per_shard: Optional[Sequence[Sequence[object]]] = None,
        fusion: Optional[FusionStrategy] = None,
        candidates_per_source: Optional[int] = None,
        axis: str = "data",
        k1: float = 1.2,
        b: float = 0.75,
        rows_normalized: bool = False,
        stopwords=None,
        min_token_len: int = 2,
    ) -> "ShardedHybridIndex":
        """Multi-host ingest: assemble the serving index from per-host
        artifacts — shard ``i`` contributes its embedding block
        ``dense_blocks[i]`` ([n_i, d] f32), its BM25
        :class:`~trueno_rag_tpu.parallel.ingest.ShardBuild` (or
        ``to_payload()`` dict), and optionally its chunk objects. The
        full corpus (matrix OR postings) never exists on one host; see
        parallel/ingest.py for the build/merge contract.

        Row space: shard ``i``'s documents occupy global rows
        ``[i·rps, i·rps + n_i)`` with ``rps = max n_i`` — every shard
        except the last must be full so registry rows stay dense
        (chunk metadata is host-small; a per-host registry service is
        the real-pod variant). The result is a read-optimized serving
        artifact: mutate by rebuilding from new shard builds
        (:meth:`refresh` raises).
        """
        from trueno_rag_tpu.errors import InvalidConfigError
        from trueno_rag_tpu.index.base import ChunkRegistry
        from trueno_rag_tpu.retrieve import HybridRetrieverConfig

        s = mesh.shape[axis]
        if len(dense_blocks) != s or len(sparse_builds) != s:
            raise InvalidConfigError(
                f"need exactly {s} dense blocks and sparse builds for a "
                f"{s}-shard '{axis}' axis"
            )
        dense_blocks = [np.asarray(blk, dtype=np.float32) for blk in dense_blocks]
        sizes = [blk.shape[0] for blk in dense_blocks]
        rps = max(sizes)
        for i, n_i in enumerate(sizes[:-1]):
            if n_i != rps:
                raise InvalidConfigError(
                    f"shard {i} has {n_i} rows but shard capacity is {rps}; "
                    "only the LAST shard may be partial (registry rows must "
                    "stay dense)"
                )

        cfg = HybridRetrieverConfig()
        self = cls.__new__(cls)
        self.dense_mode = "fp32"
        self.sparse_mode = "sharded"
        self.mesh = mesh
        self.embedder = embedder
        self.fusion = fusion or cfg.fusion
        self.candidates = candidates_per_source or cfg.candidates_per_source
        self._store = None
        self._bm25 = None
        self._snap = None
        self._rep_tags = None
        self.learned = None
        self.learned_encoder = None
        self._learned_index = None

        self.registry = ChunkRegistry()
        if chunks_per_shard is not None:
            if len(chunks_per_shard) != s:
                raise InvalidConfigError(
                    f"got {len(chunks_per_shard)} chunk lists for {s} shards"
                )
            for i, (cs, n_i) in enumerate(zip(chunks_per_shard, sizes)):
                if len(cs) != n_i:
                    raise InvalidConfigError(
                        f"shard {i} has {len(cs)} chunks but {n_i} dense rows"
                    )
            flat = [c for cs in chunks_per_shard for c in cs]
            self.registry.add_batch(flat)

        tags_host = self.registry.tags_host(max(rps * s, 1))
        self.dense = ShardedVectorIndex.from_shard_matrices(
            dense_blocks,
            mesh,
            metric="cosine",
            axis=axis,
            rows_normalized=rows_normalized,
            tags=[tags_host[i * rps : i * rps + n_i] for i, n_i in enumerate(sizes)],
        )
        self.sparse = ShardedBM25.from_shard_builds(
            sparse_builds, mesh, axis=axis, k1=k1, b=b,
            stopwords=stopwords, min_token_len=min_token_len,
            rows_per_shard=rps,
        )
        self._tags_version_seen = self.registry.tags_version
        return self

    def refresh(self, rows: Optional[Sequence[int]] = None) -> None:
        """Propagate retriever mutations to the sharded replicas.

        ``rows`` — the chunk rows that changed (insert/replace/remove)
        since the last build/refresh: the dense side scatters just those
        rows into the sharded matrix (KBs over ICI, not the GB-scale
        matrix). ``rows=None`` or rows beyond the sharded capacity
        rebuild the dense shards outright. The BM25 snapshot re-derives
        and re-replicates either way — its arrays are ~100x smaller than
        the dense matrix (8 B/posting) and its CSR layout shifts
        globally on any posting change.
        """
        if self._store is None:
            from trueno_rag_tpu.errors import InvalidConfigError

            raise InvalidConfigError(
                "this index was assembled from shard builds (multi-host "
                "ingest) and is immutable — rebuild from new shard builds"
            )
        store_host = self._store._host
        if rows is not None:
            rows = np.asarray(sorted(set(int(r) for r in rows)), dtype=np.int32)
        if self.dense_mode in ("compact", "clustered"):
            # replica prep is row-local so a scatter path is possible
            # (and clustered layouts couple rows to clusters), but the
            # read-optimized shards just rebuild (the mutable store is
            # the single-chip VectorStore)
            if rows is None or rows.size:
                self.dense = self._build_dense()
                self._rep_tags = None
                self._tags_version_seen = self.registry.tags_version
        elif (
            rows is None
            or rows.size == 0
            or (rows.size and int(rows.max()) >= self.dense.matrix.shape[0])
        ):
            if rows is None or rows.size:
                self.dense = ShardedVectorIndex(
                    store_host,
                    self.mesh,
                    metric=self._store.config.metric,
                    valid=self._store._valid,
                    rows_normalized=True,
                    tags=self.registry.tags_host(store_host.shape[0]),
                )
                self._rep_tags = None
                self._tags_version_seen = self.registry.tags_version
        else:
            self.dense.update_rows(
                rows, store_host[rows], self._store._valid[rows],
                rows_normalized=True,
                tags=self.registry.tags_host(store_host.shape[0])[rows],
            )
            self._rep_tags = None
            self._tags_version_seen = self.registry.tags_version
        self._bm25._refresh_snapshot()
        self._snap = self._bm25._snap
        if self.sparse_mode == "sharded":
            self.sparse = ShardedBM25(self._bm25, self.mesh)
        if self._learned_index is not None and len(self._learned_index) > 0:
            from trueno_rag_tpu.parallel.sparse import ShardedLearnedSparse

            self.learned = ShardedLearnedSparse(self._learned_index, self.mesh)

    def _refresh_tags_if_stale(self) -> None:
        """Tag edits since the last build/refresh re-upload the tag
        arrays ONCE (version-keyed); filtered searches never ship the
        O(N) masks per batch."""
        if self.registry.tags_version == self._tags_version_seen:
            return
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self.dense_mode in ("compact", "clustered"):
            self.dense.set_tags(
                self.registry.tags_host(self._store._host.shape[0])
            )
        else:
            n_pad = self.dense.matrix.shape[0]
            t = self.registry.tags_host(n_pad)
            self.dense.tags = jax.device_put(
                t, NamedSharding(self.mesh, P(self.dense.axis))
            )
        self._rep_tags = None
        self._tags_version_seen = self.registry.tags_version

    def _replicated_tags(self):
        """Replicated per-row tag bits for the BM25 candidate filter
        (cached; candidates carry GLOBAL rows so a replicated copy is
        the cheap correct layout for the [B, cand] gather)."""
        cached = getattr(self, "_rep_tags", None)
        if cached is not None:
            return cached
        import numpy as np

        self._rep_tags = jnp.asarray(
            self.registry.tags_host(max(self.registry.capacity_rows, 1))
        )
        return self._rep_tags

    def search_arrays(self, queries: Sequence[str], k: int,
                      tag_filter=None) -> Tuple[jax.Array, jax.Array]:
        """Batched hybrid search → global ``(rows, scores) [B, k]``.
        ``tag_filter``: a TagFilter (or one per query) — the dense
        predicate evaluates shard-locally (no extra communication);
        BM25 candidates filter before fusion."""
        cand = self.candidates
        qvecs = self.embedder.embed_queries(list(queries))
        masks = None
        if tag_filter is not None:
            from trueno_rag_tpu.retrieve import resolve_tag_filters

            self._refresh_tags_if_stale()
            masks = resolve_tag_filters(self.registry, tag_filter, len(queries))
        if self.dense_mode in ("compact", "clustered"):
            d_scores, d_rows, _ok = self.dense.search(
                np.asarray(qvecs, dtype=np.float32), cand, tag_masks=masks
            )  # host patch covers uncertified per keep_host
        else:
            d_scores, d_rows = self.dense.search(
                np.asarray(qvecs, dtype=np.float32), cand, tag_masks=masks
            )

        if self.sparse is not None:
            s_scores, s_rows = self.sparse.search_arrays(list(queries), cand)
        else:
            s_scores, s_rows = self._bm25.search_arrays(list(queries), cand)
        if masks is not None:
            from trueno_rag_tpu.ops.tags import filter_candidates_by_tags

            s_rows, s_scores = filter_candidates_by_tags(
                jnp.asarray(s_rows), jnp.asarray(s_scores), self._replicated_tags(),
                jnp.asarray(masks[0]), jnp.asarray(masks[1]), jnp.asarray(masks[2]),
            )
        if self.learned is not None:
            # tri-hybrid on the mesh: expand once host-side, score the
            # document-sharded expansion postings, merge over ICI, and
            # fuse all three candidate sets N-way. Tag filters drop
            # disallowed learned candidates post-top-k (the BM25
            # treatment here; the single-host path's exact allowed-mask
            # rides the op — selective filters can differ in the tail).
            l_scores, l_rows = self.learned.search_arrays(
                *self.learned_encoder.expand_queries(list(queries)), cand
            )
            if masks is not None:
                from trueno_rag_tpu.ops.tags import filter_candidates_by_tags

                l_rows, l_scores = filter_candidates_by_tags(
                    jnp.asarray(l_rows), jnp.asarray(l_scores),
                    self._replicated_tags(),
                    jnp.asarray(masks[0]), jnp.asarray(masks[1]),
                    jnp.asarray(masks[2]),
                )
            from trueno_rag_tpu.ops.fusion import fuse_topk_many

            weights = (
                tuple(self.fusion.resolve_weights(3))
                if self.fusion.kind in ("linear", "convex") else ()
            )
            f_rows, f_scores = fuse_topk_many(
                (jnp.asarray(d_rows), jnp.asarray(s_rows), jnp.asarray(l_rows)),
                (jnp.asarray(d_scores), jnp.asarray(s_scores),
                 jnp.asarray(l_scores)),
                kind=self.fusion.kind, param=self.fusion.device_param,
                weights=weights,
            )
        else:
            f_rows, f_scores = fuse_topk(
                d_rows, d_scores, s_rows, s_scores,
                kind=self.fusion.kind, param=self.fusion.device_param,
            )
        return f_rows[:, :k], f_scores[:, :k]

    def search(self, query: str, k: int,
               tag_filter=None) -> List[RetrievalResult]:
        rows, scores = self.search_arrays([query], k, tag_filter=tag_filter)
        out: List[RetrievalResult] = []
        for row, score in zip(np.asarray(rows[0]), np.asarray(scores[0])):
            if row < 0:
                continue
            chunk = self.registry.chunk_of(int(row))
            if chunk is not None:
                out.append(RetrievalResult(chunk=chunk, fused_score=float(score)))
        return out
