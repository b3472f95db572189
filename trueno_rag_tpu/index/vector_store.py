"""Dense vector store: HBM-resident ``[N, d]`` embedding matrix.

Capability-equivalent to the reference's ``VectorStore``
(reference: index.rs:321-437 — a ``HashMap<ChunkId, Vec<f32>>`` scanned
with scalar loops per query) redesigned for TPU:

- Embeddings live in one capacity-padded device matrix; inserts write a
  host mirror and the device copy refreshes lazily (one transfer per
  mutation batch, not per chunk).
- Cosine metric L2-normalizes rows **once at insert**, so query scoring
  is a single MXU matmul (query normalization happens in the kernel).
- Capacity grows by doubling over power-of-two buckets so jitted search
  recompiles O(log N) times over an index build, not per insert.
- Removal tombstones the row (mask False + zero row) and recycles it
  through the shared :class:`~trueno_rag_tpu.index.base.ChunkRegistry`.

Validation matches the reference: inserting a chunk without an
embedding raises :class:`VectorStoreError`; a wrong-size embedding
raises :class:`DimensionMismatchError` (index.rs:359-375).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from trueno_rag_tpu.chunking import Chunk
from trueno_rag_tpu.errors import DimensionMismatchError, InvalidConfigError, VectorStoreError
from trueno_rag_tpu.index.base import ChunkRegistry
from trueno_rag_tpu.ops.dense import dense_topk


class DistanceMetric:
    COSINE = "cosine"
    EUCLIDEAN = "euclidean"
    DOT_PRODUCT = "dot"

    ALL = (COSINE, EUCLIDEAN, DOT_PRODUCT)


@functools.partial(jax.jit, donate_argnums=(0,))
def _tier_slab_write(dest, part, lo):
    """Donated slab write for streamed replica builds: XLA reuses
    ``dest``'s buffer, so a full-matrix build never holds two copies of
    a replica in HBM. Module-level so the jit cache survives across
    stores and builds (2 shapes per build: full slabs + the remainder)."""
    idx = (lo,) + (jnp.int32(0),) * (dest.ndim - 1)
    return jax.lax.dynamic_update_slice(dest, part, idx)


@dataclass
class VectorStoreConfig:
    """Mirror of the reference's config (index.rs:282-319). The
    reference also carries hnsw_m/ef_* fields that nothing reads — this
    store is exact brute-force by design (SURVEY §0.2), so they have no
    equivalent here."""

    dimension: int = 384
    metric: str = DistanceMetric.COSINE
    initial_capacity: int = 1024
    # Device storage dtype. "float32" (default) keeps exact parity with
    # the scalar oracle. "bfloat16" halves HBM bytes and read time —
    # the right trade at multi-million-chunk scale — at ~1e-3 relative
    # score error (rankings of well-separated corpora are stable;
    # exact-tie behavior is not guaranteed). Scores always accumulate
    # in float32 either way.
    storage_dtype: str = "float32"
    # Certified reduced-precision scan tier (ops/dense_tiered.py):
    # "none" (default) scores in fp32; "bf16"/"int8" maintain a
    # quantized replica that one fused Pallas pass scans with rigorous
    # upper bounds, exact-rescoring only the selected candidates —
    # results stay EXACTLY equal to the fp32 path (uncertified queries
    # fall back per-query), unlike storage_dtype="bfloat16" which is
    # approximate. "auto" engages the bf16 tier once the corpus passes
    # ``scan_tier_auto_rows`` (measured crossover on v5e: the Pallas
    # scan carries ~1.4 ms fixed overhead, so the fp32 matmul wins
    # below ~400k rows and the certified scan wins above — 15.5 ms vs
    # 19.8 ms per 256-query batch at 1M, 256/256 certified). Requires
    # float32 storage and cosine/dot metric.
    scan_tier: str = "none"
    # Corpus size at which scan_tier="auto" switches fp32 -> bf16 tier.
    scan_tier_auto_rows: int = 400_000
    # scan_tier="compact": certified top-k SETS with NO fp32 matrix in
    # HBM — the single-chip answer to corpora the fp32 tiers cannot
    # hold (10M×384 is 15 GB fp32 alone on a 16 GB v5e). Certified
    # queries return the PROVABLY exact top-k SET by true scores
    # (scores bf16-rescored, ≤ ~1e-3); uncertified queries are patched
    # from the host fp32 matrix per ``compact_fallback``. Hybrid
    # retrieval runs STAGED (compact dense scan + BM25 + device fusion
    # — HybridRetriever.retrieve_batch switches automatically), and tag
    # filters ride the scan kernel (certified exact-FILTERED sets;
    # filter-aware host patch). The encoder-fused one-program path
    # serves compact stores too (r4,
    # ops/hybrid.fused_hybrid_query_compact); only tag-filtered fused
    # queries and clustered layouts stay on the staged path.
    #
    # Host fp32 rows feed the replica build in slabs of
    # ``compact_prep_rows`` so the transient fp32 upload stays bounded
    # (1M rows × 384 ≈ 1.5 GB) instead of materializing the whole
    # matrix on device. Slabs stream into PREALLOCATED device replicas
    # via donated updates — peak HBM is the final replicas plus ONE
    # slab's parts, so a 10.5M bf16r build (~12 GB) fits one v5e chip.
    compact_prep_rows: int = 1 << 20
    # Where the slab prep (bf16 cast + residual quantization + norms)
    # runs during a full replica build:
    # - "auto": on the host CPU backend when the accelerator is a
    #   tunneled remote (platform "axon" — shipping prepared bf16+int8
    #   parts is 3 B/element vs 6 for raw fp32 over a ~40 MB/s link),
    #   on the device otherwise (PCIe upload is cheap and the chip
    #   preps a 1M slab in ms).
    # - "device" / "host": force either. The prep code is the SAME
    #   jitted function either way (ops/dense_tiered.prepare_*), so the
    #   certificate arrays are always self-consistent with the stored
    #   replica bytes; incremental row updates always prep on device.
    compact_build: str = "auto"
    # Compact-tier storage layout (see ops/dense_tiered.py's compact
    # header for the measured interval/gap analysis):
    # - "bf16r" (default): bf16 scan+rescore copy + int8 residual
    #   correction — 3 B/element (11.5 GB at 10M×384), certificate
    #   interval ~2e-5; certifies the large majority even of random
    #   corpora at 1M (dense_topk_compact_bf16r).
    # - "bf16rr": bf16 copy + TWO int8 residual levels — 4 B/element
    #   (r5): the rescore interval collapses to ~1.5e-6 (vs bf16r's
    #   ~2e-5), the ceiling short of f64. For corpora ≤ ~8M×384 rows
    #   per chip (16.1 GB at 10.5M does NOT fit one v5e) or sharded
    #   meshes; near-tie-dense corpora certify on-device where bf16r
    #   rides the host patch (dense_topk_compact_bf16rr).
    # - "bf16": ONE bf16 array — 2 B/element (7.7 GB at 10M×384),
    #   interval ~1.7e-3; certifies only well-separated corpora
    #   (dense_topk_compact_bf16). The minimum-memory option.
    # - "int8": int8 scan copy + bf16 rescore copy, 3 B/element —
    #   halves scan stream bytes but keeps the ~1.7e-3 rescore
    #   interval; strictly worse certification than "bf16r" at equal
    #   footprint (dense_topk_compact).
    compact_scan: str = "bf16r"
    # "host": re-run uncertified queries on the host fp32 matrix with
    # float64 accumulation (true-score top-k — the same order the
    # certificate proves for certified queries); "none": return the
    # best-effort device result and only count it (compact_uncertified).
    compact_fallback: str = "host"
    # DEVICE retry before the host fallback: re-scan just the
    # uncertified queries with a widened selection (margin_tiles x4,
    # every emitted candidate residual-rescored instead of the
    # rescore_rows trim, t_top 8). Queries still uncertified after the
    # retry carry a RECORDED error bound (compact_uncertified_bound):
    # the max margin by which any non-returned row could beat a
    # returned one, i.e. the provable worst-case score error of the
    # best-effort result.
    #
    # Default None = AUTO: the retry runs only when
    # ``compact_fallback != "host"`` — there its value is the tightened
    # recorded bound. With the host fallback the retry is a net LOSS:
    # the r4 containment patch resolves uncertified queries exactly
    # from the primary pass's candidate rows (a ~W-row host f64
    # rescore, microseconds), while the widened retry costs a second
    # full corpus scan and at 10.5M random rescued only 3/49 failures
    # (benches/compact_retry_bench.py — the remaining misses are TRUE
    # near-ties below the residual interval, which no device pass at
    # this storage precision can resolve but the exact host rescore
    # settles trivially). Set True/False to force either way.
    compact_retry: bool | None = None
    # Candidate-row trim for the tiered rescore (ops/dense_tiered.py
    # rescore_rows); None rescores all block candidates. 96 is the
    # measured best at 1M for both kernels: the exclusion threshold is
    # governed by the selection margin (rank k+margin+1), so trimming
    # to 96 explicit rows (threshold rank 97) is certification-neutral
    # while cutting the scattered fp32 gather in half (8.8 vs 9.5 ms
    # e2e with the tile kernel).
    scan_rescore_rows: int | None = 96
    # Scan kernel generation: "tile" = the v2 tile kernels
    # (scan_select_v2 / scan_select_int8_v2: per-1024-row-tile candidate
    # rows emitted in-kernel; 8x smaller selection grid, measured 8.4 vs
    # 9.8 ms at 1M/B=256/k=50, 256/256 certified) or "block" = the
    # per-128-block v1 kernels.
    scan_kernel: str = "tile"
    # Tile kernel: candidate rows kept per 1024-row tile. 3 measured
    # fastest at k<=64 (8.23 ms); 4 is the default — collisions that
    # defeat certification (> t_top of the true top candidates in one
    # tile) grow with k, and the fp32 fallback covers the remainder.
    scan_t_top: int = 4
    # Tile kernel: selected tiles beyond k. 32 is the measured floor
    # for 256/256 certification at 1M (16 certified only 180/256: the
    # (k+margin+1)-th tile-max threshold lands within the bf16 bound
    # width of the k-th score).
    scan_margin_tiles: int = 32
    # Per-128-row-block candidate slots in the v1 (block) kernel. 2 is
    # the measured-best at >=400k rows; in-block collisions that defeat
    # certification are ~0.2%/query at 400k and vanish beyond; the
    # per-query fp32 fallback covers them.
    scan_block_top: int = 2
    # Corpus rows per kernel grid step (8192 overflows VMEM at d=384).
    scan_tile_n: int = 4096
    # scan_tier="clustered": the compact bf16r layout REORDERED by
    # balanced k-means so each storage tile is a cluster with a sound
    # centroid+radius bound (ops/clustered.py). Small-batch queries
    # scan only the probed tile union and the unscanned tiles' max
    # bound joins the exclusion threshold — certified sets keep the
    # full-corpus exact contract; uncertified queries host-patch per
    # compact_fallback. The latency tier for interactive serving on
    # clustered (i.e. real) corpora; the streaming tiers remain the
    # large-batch throughput path. Read-optimized, but not read-only:
    # bounded mutations fold into the existing layout with widened
    # radii (cluster_incremental_limit below); past the drift budget —
    # or on bulk mutation — the next query re-clusters (host/device
    # k-means — seconds at 1M).
    cluster_probe_tiles: int = 16
    # "gather" scans an XLA copy of the union (~3x its bytes, no
    # custom-kernel risk); "dma" scans the selected tiles in place via
    # the scalar-prefetch kernel (exactly the union's bytes). "auto"
    # picks dma on accelerators and gather on CPU — measured on v5e at
    # 1M×384 B=8 (r3, v3 kernels): dma 3.52 ms vs gather 9.32 ms (the
    # copy costs more than it saves), and dma is the only fetch that
    # beats the full compact stream (3.91 ms — v3 made the full scan
    # fast enough that the clustered margin at 1M is now 1.11x; the
    # tier's value concentrates at 10M+, where the full stream is
    # ~24 ms and probed tiles stay ~constant).
    cluster_fetch: str = "auto"
    cluster_kmeans_iters: int = 8
    # Incremental clustered maintenance: a bounded set of mutated rows
    # is folded into the EXISTING layout (updates widen their tile's
    # radius in place; inserts fill holes in their best-scoring tile;
    # removals become holes) instead of re-running k-means over the
    # corpus — seconds at 1M, ~20 s at 10M. Soundness is never at
    # stake (radii only widen, so the tile bound stays a true upper
    # bound and certified sets keep the full-corpus exact contract);
    # what drifts is pruning SELECTIVITY, so once more than this
    # fraction of live rows has been incrementally placed since the
    # last full k-means, the next refresh re-clusters. 0 disables the
    # incremental path (every mutation re-clusters, the pre-existing
    # behavior).
    cluster_incremental_limit: float = 0.1

    def __post_init__(self) -> None:
        if self.dimension <= 0:
            raise InvalidConfigError("dimension must be positive")
        if self.metric not in DistanceMetric.ALL:
            raise InvalidConfigError(f"unknown metric {self.metric!r}")
        if self.initial_capacity <= 0:
            raise InvalidConfigError("initial_capacity must be positive")
        if self.storage_dtype not in ("float32", "bfloat16"):
            raise InvalidConfigError(f"unknown storage_dtype {self.storage_dtype!r}")
        if self.scan_tier not in ("none", "auto", "bf16", "int8", "compact", "clustered"):
            raise InvalidConfigError(f"unknown scan_tier {self.scan_tier!r}")
        if self.cluster_fetch not in ("auto", "gather", "dma"):
            raise InvalidConfigError(f"unknown cluster_fetch {self.cluster_fetch!r}")
        if self.cluster_probe_tiles < 1:
            raise InvalidConfigError("cluster_probe_tiles must be >= 1")
        if not 0.0 <= self.cluster_incremental_limit <= 1.0:
            raise InvalidConfigError(
                "cluster_incremental_limit must be in [0, 1]"
            )
        if self.compact_fallback not in ("host", "none"):
            raise InvalidConfigError(
                f"unknown compact_fallback {self.compact_fallback!r}"
            )
        if self.compact_prep_rows < 1024:
            raise InvalidConfigError("compact_prep_rows must be >= 1024")
        if self.compact_build not in ("auto", "device", "host"):
            raise InvalidConfigError(f"unknown compact_build {self.compact_build!r}")
        if self.compact_scan not in ("bf16r", "bf16rr", "bf16", "int8"):
            raise InvalidConfigError(f"unknown compact_scan {self.compact_scan!r}")
        if self.scan_tile_n <= 0 or self.scan_tile_n % 128 != 0:
            raise InvalidConfigError("scan_tile_n must be a positive multiple of 128")
        if self.scan_block_top < 1:
            raise InvalidConfigError("scan_block_top must be >= 1")
        if self.scan_kernel not in ("tile", "block"):
            raise InvalidConfigError(f"unknown scan_kernel {self.scan_kernel!r}")
        if self.scan_t_top < 1:
            raise InvalidConfigError("scan_t_top must be >= 1")
        if self.scan_margin_tiles < 0:
            raise InvalidConfigError("scan_margin_tiles must be >= 0")
        if self.scan_kernel == "tile" and self.scan_tile_n % 1024 != 0:
            raise InvalidConfigError(
                "scan_kernel='tile' needs scan_tile_n to be a multiple of 1024")
        if self.scan_rescore_rows is not None and self.scan_rescore_rows < 1:
            raise InvalidConfigError("scan_rescore_rows must be None or >= 1")
        if self.scan_tier_auto_rows < 0:
            raise InvalidConfigError("scan_tier_auto_rows must be >= 0")
        if self.scan_tier != "none":
            if self.storage_dtype != "float32":
                raise InvalidConfigError(
                    "scan_tier requires float32 storage (the exact rescore "
                    "reads full-precision rows)"
                )
            if self.metric == DistanceMetric.EUCLIDEAN:
                raise InvalidConfigError("scan_tier supports cosine/dot metrics only")


class VectorStore:
    def __init__(
        self,
        config: Optional[VectorStoreConfig] = None,
        registry: Optional[ChunkRegistry] = None,
    ) -> None:
        self.config = config or VectorStoreConfig()
        # When the registry is shared (hybrid retrieval) its lifecycle is
        # owned by the sharer; a private registry is tombstoned directly.
        self._owns_registry = registry is None
        self.registry = ChunkRegistry() if registry is None else registry
        cap = self.config.initial_capacity
        self._host = np.zeros((cap, self.config.dimension), dtype=np.float32)
        self._valid = np.zeros((cap,), dtype=bool)
        self._device_matrix = None  # lazily refreshed jnp copy
        self._device_valid = None
        self._dirty = True
        self._dirty_rows: set = set()  # None-tracking: full re-upload when unbounded
        self._count = 0
        self._tier = None  # scan-tier replica arrays (lazily prepared)
        # which tier's LAYOUT the replica arrays are in: a config
        # scan_tier switch (e.g. clustered -> compact) must rebuild —
        # reusing a cluster-PERMUTED _tier under the compact path would
        # return permuted row ids as if they were original rows
        self._tier_built_for = None
        self._cluster = None  # clustered tier: (order, order_j, cent_j, radii_j)
        self._cluster_inv = None  # lazily built row -> permuted pos (int64)
        self._cluster_incremental = 0  # rows placed since the last full k-means
        # persisted clustering (persist.py): consumed by the FIRST
        # clustered build, discarded by ANY mutation — stale radii would
        # be unsound bounds, so the guard is absolute
        self._cluster_preset = None
        self.tier_fallbacks = 0  # queries re-run on fp32 (observability)
        self.compact_uncertified = 0  # compact-tier queries past the certificate
        self.compact_retry_certified = 0  # rescued by the widened device retry
        # provable worst-case score error of best-effort results: the
        # max over still-uncertified queries of (exclusion upper bound −
        # min selected lower bound); inf when a retry-pass failure mode
        # (selector miss, tie) voided the bound entirely
        self.compact_uncertified_bound = 0.0
        # containment-patch observability: queries resolved exactly from
        # the candidate rows alone vs. queries that needed the full
        # host-matrix GEMM (containment certificate failed)
        self.compact_candidate_patched = 0
        self.compact_gemm_patched = 0

    # -- mutation ------------------------------------------------------------

    def validate_chunk(self, chunk: Chunk) -> None:
        """Raise exactly what :meth:`insert` would, WITHOUT mutating
        anything — callers that write to several stores (the hybrid
        retriever's BM25-then-dense order) validate first so a bad
        chunk fails atomically instead of half-indexing."""
        if chunk.embedding is None:
            raise VectorStoreError(f"chunk {chunk.id} has no embedding")
        emb = np.asarray(chunk.embedding, dtype=np.float32)
        if emb.shape != (self.config.dimension,):
            raise DimensionMismatchError(self.config.dimension, int(emb.shape[-1]) if emb.ndim else 0)

    def insert(self, chunk: Chunk) -> None:
        self.validate_chunk(chunk)
        emb = np.asarray(chunk.embedding, dtype=np.float32)
        row = self.registry.add(chunk)
        self._ensure_capacity(row + 1)
        if self.config.metric == DistanceMetric.COSINE:
            n = float(np.linalg.norm(emb))
            if n > 0.0:
                emb = emb / n
        if not self._valid[row]:
            self._count += 1
        self._host[row] = emb
        self._valid[row] = True
        self._mark_dirty(row)

    def insert_many(self, chunks: Sequence[Chunk]) -> None:
        """Bulk insert — one vectorized pass instead of per-chunk numpy.

        Per-chunk :meth:`insert` pays a `np.linalg.norm` + division +
        row write per call (~17 µs each — 0.8 s of a 1.9 s 50k-chunk
        ingest, profiled); here validation builds one [M, d] matrix and
        the normalize/write/count steps are single array ops.
        Validation runs BEFORE any mutation, so a bad chunk leaves the
        store untouched (stronger than the loop's partial-insert)."""
        if not chunks:
            return
        d = self.config.dimension
        emb_list = [chunk.embedding for chunk in chunks]
        try:
            # One C-level pass: ~10x faster than a per-chunk
            # asarray+check+row-write loop (measured 1.0 s -> ~0.1 s at
            # 100k x 384 — the loop was the largest index_batch cost
            # after the native BM25 build). Uniform-but-wrong shapes
            # surface via the single check below; ragged/None inputs
            # throw here and are re-diagnosed per chunk for the precise
            # error the loop used to raise.
            embs = np.asarray(emb_list, dtype=np.float32)
            if embs.ndim != 2 or embs.shape != (len(chunks), d):
                raise ValueError
        except (ValueError, TypeError):
            for chunk in chunks:
                if chunk.embedding is None:
                    raise VectorStoreError(f"chunk {chunk.id} has no embedding")
                emb = np.asarray(chunk.embedding, dtype=np.float32)
                if emb.shape != (d,):
                    raise DimensionMismatchError(
                        d, int(emb.shape[-1]) if emb.ndim else 0
                    )
            raise VectorStoreError("embeddings could not be stacked")
        rows = np.asarray(self.registry.add_batch(chunks), dtype=np.int64)
        self._ensure_capacity(int(rows.max()) + 1)
        if self.config.metric == DistanceMetric.COSINE:
            # einsum row-norms measured 4x faster than np.linalg.norm
            # at [50k, 384] (10 vs 43 ms; no abs/copy pass)
            norms = np.sqrt(np.einsum("ij,ij->i", embs, embs))[:, None]
            embs /= np.where(norms > 0.0, norms, 1.0)
        # duplicate ids in one batch share a row; count each row once
        # (numpy fancy assignment keeps the LAST write, matching the
        # sequential loop's replace semantics)
        uniq = np.unique(rows)
        self._count += int(np.count_nonzero(~self._valid[uniq]))
        self._host[rows] = embs
        self._valid[rows] = True
        self._dirty = True
        # mutated rows void a persisted clustering exactly as
        # _mark_dirty does for the per-chunk paths: a post-load BULK
        # insert otherwise left the preset alive, and the first
        # clustered build consumed a layout in which the new rows exist
        # in NO tile — invisible to every query, yet still certified
        self._cluster_preset = None
        if self._dirty_rows is not None:
            if len(self._dirty_rows) + len(uniq) > max(64, self._host.shape[0] // 20):
                self._dirty_rows = None  # full re-upload beats scatter
            else:
                self._dirty_rows.update(int(r) for r in uniq)

    def remove(self, chunk_id: str) -> bool:
        row = self.registry.row_of(chunk_id)
        if row is None or not self._valid[row]:
            return False
        if self._owns_registry:
            self.registry.remove(chunk_id)
        self._host[row] = 0.0
        self._valid[row] = False
        self._count -= 1
        self._mark_dirty(row)
        return True

    def _mark_dirty(self, row: int) -> None:
        self._dirty = True
        self._cluster_preset = None  # mutated rows void persisted radii
        if self._dirty_rows is not None:
            self._dirty_rows.add(row)
            # beyond ~5% of capacity a full upload is cheaper than scatter
            if len(self._dirty_rows) > max(64, self._host.shape[0] // 20):
                self._dirty_rows = None

    def _ensure_capacity(self, needed: int) -> None:
        cap = self._host.shape[0]
        if needed <= cap:
            return
        while cap < needed:
            cap *= 2
        host = np.zeros((cap, self.config.dimension), dtype=np.float32)
        host[: self._host.shape[0]] = self._host
        valid = np.zeros((cap,), dtype=bool)
        valid[: self._valid.shape[0]] = self._valid
        self._host, self._valid = host, valid
        self._dirty = True
        self._dirty_rows = None  # capacity changed: full re-upload

    # -- device state ----------------------------------------------------------

    def _refresh_device(self) -> None:
        if self._effective_tier() == "compact":
            self._refresh_device_compact()
            return
        if self._effective_tier() == "clustered":
            self._refresh_device_clustered()
            return
        if (
            not self._dirty
            and self._device_matrix is not None
            and self._tier_built_for == self._effective_tier()
        ):
            return
        dtype16 = self.config.storage_dtype == "bfloat16"
        if (
            self._device_matrix is not None
            and self._dirty_rows  # bounded, non-empty row set
            and self._device_matrix.shape[0] == self._host.shape[0]
        ):
            # Incremental: ship only the changed rows and scatter them in
            # on device — a full matrix is GBs at production scale, the
            # delta is KBs (mutable-corpus answer, SURVEY §7.3).
            rows = np.fromiter(self._dirty_rows, dtype=np.int32)
            updates = jnp.asarray(self._host[rows])
            if dtype16:
                updates = updates.astype(jnp.bfloat16)
            rows_j = jnp.asarray(rows)
            self._device_matrix = self._device_matrix.at[rows_j].set(updates)
            self._device_valid = self._device_valid.at[rows_j].set(
                jnp.asarray(self._valid[rows])
            )
            self._refresh_tier(rows_j=rows_j, updates=updates)
        else:
            matrix = jnp.asarray(self._host)
            if dtype16:
                matrix = matrix.astype(jnp.bfloat16)
            self._device_matrix = matrix
            self._device_valid = jnp.asarray(self._valid)
            self._refresh_tier()
        self._dirty = False
        self._dirty_rows = set()

    def _refresh_device_compact(self) -> None:
        """Compact tier: the fp32 matrix NEVER resides in HBM. The
        replicas (bf16 scan+rescore copy, plus the int8 scan copy under
        ``compact_scan="int8"``, with their residual norms) build
        slab-wise from host rows; mutations scatter only the changed
        rows' re-prepared replicas."""
        if (
            not self._dirty
            and self._tier is not None
            and self._tier_built_for == "compact"
        ):
            return
        from trueno_rag_tpu.ops import dense_tiered as dt

        def prep(m):
            parts = dt.prepare_tiered(m)
            if self.config.compact_scan == "bf16r":
                parts = parts + dt.prepare_residual(m)
            elif self.config.compact_scan == "bf16rr":
                parts = parts + dt.prepare_residual2(m)
            elif self.config.compact_scan == "int8":
                parts = parts + dt.prepare_int8(m)
            return parts

        self._device_matrix = None  # the whole point of this tier
        self._cluster = None  # compact layout is ROW order, not clustered
        if (
            self._tier is not None
            and self._tier_built_for == "compact"
            and self._dirty_rows  # bounded, non-empty row set
            and self._tier[0].shape[0] == self._host.shape[0]
        ):
            rows = np.fromiter(self._dirty_rows, dtype=np.int32)
            updates = jnp.asarray(self._host[rows])
            rows_j = jnp.asarray(rows)
            parts = prep(updates)
            self._tier = tuple(
                full.at[rows_j].set(part) for full, part in zip(self._tier, parts)
            )
            self._device_valid = self._device_valid.at[rows_j].set(
                jnp.asarray(self._valid[rows])
            )
        else:
            self._tier = self._stream_build_tier(prep)
            self._device_valid = jnp.asarray(self._valid)
        self._tier_built_for = "compact"
        self._dirty = False
        self._dirty_rows = set()

    def _stream_build_tier(self, prep):
        """Full compact replica build, streamed: host fp32 rows are
        prepped slab-by-slab and written into PREALLOCATED device
        arrays through donated dynamic_update_slice, so peak HBM is
        the final replicas plus one slab's parts. (The previous
        concatenate build held every slab's parts AND the concatenated
        copy live simultaneously — a transient 2x that cannot fit a
        10.5M bf16r build (~12 GB replicas) on a 16 GB chip.)

        Per ``compact_build``, the slab prep itself runs either on the
        accelerator (upload raw fp32, 6 B/element) or on the host CPU
        backend (upload prepared bf16+int8 parts, 3 B/element — wins
        when the device link is a slow tunnel). Either way it is the
        same jitted prep, so every certificate array is computed from
        the exact replica bytes it will sit next to."""
        n = self._host.shape[0]
        step = self.config.compact_prep_rows
        if n <= step:
            return tuple(prep(jnp.asarray(self._host)))
        mode = self.config.compact_build
        host_prep = mode == "host" or (
            mode == "auto" and jax.default_backend() == "axon"
        )
        cpu = None
        if host_prep:
            try:
                cpu = jax.devices("cpu")[0]
            except RuntimeError:
                host_prep = False  # no host backend registered
        prep_j = jax.jit(prep)  # one wrapper: 2 compiles/build, not per-slab
        dests = None
        for lo in range(0, n, step):
            slab = self._host[lo : lo + step]
            if host_prep:
                with jax.default_device(cpu):
                    parts = [np.asarray(p) for p in prep_j(jnp.asarray(slab))]
                parts = [jnp.asarray(p) for p in parts]
            else:
                parts = list(prep_j(jnp.asarray(slab)))
            if dests is None:
                dests = [
                    jnp.zeros((n,) + p.shape[1:], p.dtype) for p in parts
                ]
            dests = [
                _tier_slab_write(d, p, jnp.int32(lo))
                for d, p in zip(dests, parts)
            ]
        return tuple(dests)

    def _refresh_device_clustered(self) -> None:
        """Clustered tier: the compact bf16r replicas in the balanced-
        k-means layout, plus per-tile centroid/radius bounds
        (ops/clustered.py). The permutation couples every row to its
        cluster; bounded mutations fold into the existing layout via
        :meth:`_try_incremental_clustered` (radii only widen — sound),
        anything past the drift budget re-clusters and rebuilds."""
        if (
            not self._dirty
            and self._tier is not None
            and self._cluster is not None
            and self._tier_built_for == "clustered"
        ):
            return
        from trueno_rag_tpu.ops import clustered as cl
        from trueno_rag_tpu.ops import dense_tiered as dt

        tile = max(self.config.scan_tile_n, 1024)
        if self._try_incremental_clustered(tile):
            self._dirty = False
            self._dirty_rows = set()
            return
        # Opportunistic device build: when a FRESH fp32 device matrix is
        # already resident (e.g. a tier switch from a matmul tier), the
        # k-means, permutation and replica prep all run on-device —
        # zero host→device matrix traffic (the host path re-ships the
        # corpus slab-wise: PCIe cost locally, minutes-per-GB over a
        # tunnel). Soundness is identical (prepare_clustered_device
        # widens for its on-chip f32 radii). bf16-storage matrices are
        # excluded: radii must bound the exact f32 row values.
        dev_m = self._device_matrix
        dev_fresh = (
            dev_m is not None
            and not self._dirty
            and dev_m.dtype == jnp.float32
            and dev_m.shape[0] == self._host.shape[0]
        )
        preset = self._cluster_preset
        self._cluster_preset = None
        if preset is not None and preset.get("tile") == tile:
            # a persisted clustering for EXACTLY this host state (any
            # mutation since load cleared it via _mark_dirty) and this
            # tile size — skips the k-means on load
            order = np.asarray(preset["order"], dtype=np.int32)
            cent = np.asarray(preset["centroids"], dtype=np.float32)
            radii = np.asarray(preset["radii"], dtype=np.float32)
        elif dev_fresh:
            order, cent, radii = cl.prepare_clustered_device(
                dev_m, tile_n=tile, metric=self.config.metric,
                iters=self.config.cluster_kmeans_iters,
                valid=self._valid,  # capacity padding must not join tiles
            )
        else:
            order, cent, radii = cl.prepare_clustered(
                self._host, tile_n=tile, metric=self.config.metric,
                iters=self.config.cluster_kmeans_iters,
                valid=self._valid,  # capacity padding must not join tiles
            )
        vp = cl.apply_cluster_order(self._valid, order, fill=False)
        step = self.config.compact_prep_rows
        slabs = []
        if dev_fresh:
            # permute slab-wise: the FULL permuted f32 copy never exists
            # (two f32 corpora at once caps the tier at ~2M on a 16 GB
            # chip; gathering each slab straight from the unpermuted
            # matrix peaks at f32 + one slab + the replicas instead)
            for lo in range(0, len(order), step):
                m = cl.apply_cluster_order_device(dev_m, order[lo : lo + step])
                slabs.append(dt.prepare_tiered(m) + dt.prepare_residual(m))
            self._device_matrix = None  # no fp32 in HBM (compact contract)
            dev_m = None  # free the f32 corpus before the concat
        else:
            mp = cl.apply_cluster_order(self._host, order)
            self._device_matrix = None  # no fp32 in HBM (compact contract)
            for lo in range(0, mp.shape[0], step):
                m = jnp.asarray(mp[lo : lo + step])
                slabs.append(dt.prepare_tiered(m) + dt.prepare_residual(m))
        self._tier = tuple(
            part[0] if len(part) == 1 else jnp.concatenate(part, axis=0)
            for part in zip(*slabs)
        )
        self._device_valid = jnp.asarray(vp)
        self._cluster = (
            order, jnp.asarray(order), jnp.asarray(cent), jnp.asarray(radii)
        )
        self._cluster_inv = None  # rebuilt lazily by the incremental path
        self._cluster_incremental = 0  # fresh k-means: drift budget resets
        self._cluster_version = getattr(self, "_cluster_version", 0) + 1
        self._tier_built_for = "clustered"
        self._dirty = False
        self._dirty_rows = set()

    def _try_incremental_clustered(self, tile: int) -> bool:
        """Fold a bounded set of mutated rows into the EXISTING clustered
        layout instead of re-running k-means over the corpus (seconds at
        1M, ~20 s at 10M): removals become holes, in-place updates keep
        their slot, new rows fill a hole in their best-scoring tile —
        and every touched tile's radius WIDENS to the slack-covered f64
        distance of the new value, so ``R_c ≥ ‖x − µ_c‖`` still holds
        for every live member and the query-side bound
        ``U_c = q·µ_c + ‖q‖·R_c`` stays a true upper bound. Certified
        sets keep the full-corpus exact contract (ops/clustered.py);
        what drifts is pruning SELECTIVITY (wider radii prune fewer
        tiles) and the in-tile block interleave heuristic (hole slots
        are arbitrary) — both cost scanned tiles / certificate hit
        rate, never correctness. ``cluster_incremental_limit`` caps the
        drift: past that fraction of live rows the caller re-clusters.

        Returns False — caller runs the full k-means build — when the
        budget is exhausted, a new row finds no hole anywhere, the
        dirty set is unbounded (capacity growth, bulk mutation), or no
        clustered layout exists yet. On False, NO state was mutated
        (placement runs on copies and applies only after every row has
        a slot)."""
        if (
            self.config.cluster_incremental_limit <= 0.0
            or self._cluster is None
            or self._tier is None
            or self._tier_built_for != "clustered"
            or not self._dirty_rows  # None (unbounded) or empty
        ):
            return False
        order_np, order_j, cent_j, radii_j = self._cluster
        if self._tier[0].shape[0] != len(order_np):
            return False
        dirty = sorted(self._dirty_rows)
        budget = int(self.config.cluster_incremental_limit * max(self._count, 1))
        if self._cluster_incremental + len(dirty) > budget:
            return False
        from trueno_rag_tpu.ops.dense_tiered import _BOUND_EPS, _BOUND_SLACK

        order = order_np.copy()
        radii = np.asarray(radii_j).copy()
        cent = np.asarray(cent_j)
        if self._cluster_inv is not None and len(self._cluster_inv) == self._host.shape[0]:
            inv = self._cluster_inv.copy()
        else:
            inv = np.full(self._host.shape[0], -1, dtype=np.int64)
            live = order >= 0
            inv[order[live]] = np.flatnonzero(live)
        by_tile: dict = {}
        for p in np.flatnonzero(order < 0)[::-1]:  # pop() -> lowest pos first
            by_tile.setdefault(int(p) // tile, []).append(int(p))

        sets: list = []  # (permuted pos, original row): replica rewrites
        clears: list = []  # permuted positions that become holes
        new_rows: list = []
        for r in dirty:
            p = int(inv[r])
            alive = bool(self._valid[r])
            if p >= 0 and not alive:  # removal: hole; radius stays sound
                order[p] = -1
                inv[r] = -1
                by_tile.setdefault(p // tile, []).append(p)
                clears.append(p)
            elif p >= 0:  # in-place update: same slot, widened radius
                sets.append((p, r))
            elif alive:
                new_rows.append(r)
            # else: inserted and removed between refreshes — never placed
        if new_rows:
            xs = self._host[new_rows]  # [M, d] f32
            # same shifted-dot preference as the build's assignment
            # (argmin ‖x−µ‖² == argmax x·µ − ‖µ‖²/2); quality-only
            sc = xs @ cent.T - 0.5 * np.einsum("td,td->t", cent, cent)[None, :]
            pref = np.argsort(-sc, axis=1, kind="stable")
            for i, r in enumerate(new_rows):
                pos = -1
                for c in pref[i]:
                    lst = by_tile.get(int(c))
                    if lst:
                        pos = lst.pop()
                        break
                if pos < 0:
                    return False  # every tile full: re-cluster
                order[pos] = r
                inv[r] = pos
                sets.append((pos, r))
        # widen radii over the EXACT stored f32 values (f64 math, the
        # same slack form the host build publishes)
        for pos, r in sets:
            c = pos // tile
            diff = self._host[r].astype(np.float64) - cent[c].astype(np.float64)
            need = np.float32(
                float(np.sqrt((diff * diff).sum())) * _BOUND_SLACK + _BOUND_EPS
            )
            if need > radii[c]:
                radii[c] = need

        # -- apply (host copies are complete; device scatters follow) ------
        from trueno_rag_tpu.ops import dense_tiered as dt

        if clears:  # BEFORE sets: a cleared hole may be refilled this batch
            cl_j = jnp.asarray(np.asarray(clears, dtype=np.int32))
            self._device_valid = self._device_valid.at[cl_j].set(False)
        if sets:
            pos_arr = np.asarray([p for p, _ in sets], dtype=np.int32)
            row_arr = np.asarray([r for _, r in sets], dtype=np.int64)
            upd = jnp.asarray(self._host[row_arr])
            parts = dt.prepare_tiered(upd) + dt.prepare_residual(upd)
            pos_j = jnp.asarray(pos_arr)
            self._tier = tuple(
                full.at[pos_j].set(part)
                for full, part in zip(self._tier, parts)
            )
            self._device_valid = self._device_valid.at[pos_j].set(True)
        touched = np.asarray(
            [p for p, _ in sets] + clears, dtype=np.int32
        )
        if len(touched):
            t_j = jnp.asarray(touched)
            order_j = order_j.at[t_j].set(jnp.asarray(order[touched]))
        self._cluster = (order, order_j, cent_j, jnp.asarray(radii))
        self._cluster_inv = inv
        self._cluster_incremental += len(dirty)
        self._cluster_version = getattr(self, "_cluster_version", 0) + 1
        return True

    def _effective_tier(self) -> str:
        """Resolve "auto": the bf16 tier only pays past the measured
        crossover (the fused scan's fixed invocation cost beats the
        fp32 matmul's O(N) advantage around ~400k rows on v5e)."""
        tier = self.config.scan_tier
        if tier == "auto":
            return "bf16" if self._count >= self.config.scan_tier_auto_rows else "none"
        return tier

    @property
    def supports_tagged_scan(self) -> bool:
        """True when :meth:`search_arrays` accepts ``tag_masks`` — the
        filter predicate rides the scan kernel (compact/clustered tier,
        or the bf16 tile tier). The retriever uses this to keep filtered
        queries on the fast tier instead of the full fp32 tagged scan."""
        tier = self._effective_tier()
        return tier in ("compact", "clustered") or (
            tier == "bf16" and self.config.scan_kernel == "tile"
        )

    @property
    def is_compact(self) -> bool:
        """True when this store holds no fp32 device matrix (compact or
        clustered tier) — callers that need ``device_matrix`` (the
        one-dispatch encoder-fused programs) must take a staged path
        instead; hybrid and tag-filtered queries stage automatically."""
        return self._effective_tier() in ("compact", "clustered")

    def _refresh_tier(self, rows_j=None, updates=None) -> None:
        """Maintain the scan-tier replica. The quantization/residual math
        is row-local, so incremental mutations prepare ONLY the changed
        rows and scatter them into the replica arrays."""
        tier = self._effective_tier()
        self._tier_built_for = tier
        if tier == "none":
            self._tier = None
            return
        from trueno_rag_tpu.ops import dense_tiered as dt

        prepare = dt.prepare_tiered if tier == "bf16" else dt.prepare_int8
        if rows_j is None or self._tier is None or self._cluster is not None:
            # full prepare (also after a layout switch away from
            # clustered: a permuted replica cannot be scatter-updated)
            self._cluster = None
            self._tier = prepare(self._device_matrix)
            return
        parts = prepare(updates)
        self._tier = tuple(
            full.at[rows_j].set(part) for full, part in zip(self._tier, parts)
        )

    @property
    def device_matrix(self) -> jnp.ndarray:
        """The ``[capacity, d]`` device matrix (cosine rows normalized)."""
        if self.is_compact:
            raise InvalidConfigError(
                f"scan_tier={self._effective_tier()!r} holds no fp32 device "
                "matrix (that is its memory contract); the encoder-fused "
                "one-program path needs scan_tier='bf16'/'int8' or a sharded "
                "deployment (hybrid and tag-filtered queries run staged "
                "automatically)"
            )
        self._refresh_device()
        return self._device_matrix

    @property
    def device_valid(self) -> jnp.ndarray:
        self._refresh_device()
        return self._device_valid

    def ensure_ready(self) -> None:
        """Apply any pending mutations to the device state NOW instead
        of on the next query — serving processes call this after an
        ingest/refresh window so the first live query doesn't pay the
        tier rebuild (for the clustered tier that is milliseconds on
        the incremental path but a full k-means past its budget)."""
        self._refresh_device()

    # -- queries -----------------------------------------------------------------

    def search_arrays(
        self, queries: np.ndarray, k: int, tag_masks=None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Device-level search: ``[B, d]`` queries → ``(scores, rows) [B, k]``.
        Stays on device; use from the fused one-program query path.

        ``tag_masks`` = per-query ``(t_all [B], t_any [B], t_none [B])``
        int32 filter words (see :func:`trueno_rag_tpu.retrieve.resolve_tag_filters`)
        — supported where the filter rides the scan kernel: the COMPACT
        tier (certified exact-filtered sets; filter-aware host patch)
        and the bf16 TILE tier (exact filtered results; uncertified
        queries fall back to the tagged fp32 scan per query). Other
        configurations route tag filters through
        :func:`trueno_rag_tpu.ops.tags.dense_topk_tagged` in the
        retriever instead (see :attr:`supports_tagged_scan`)."""
        self._refresh_device()
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, dtype=np.float32)))
        if q.shape[-1] != self.config.dimension:
            raise DimensionMismatchError(self.config.dimension, int(q.shape[-1]))
        k_eff = min(k, self._host.shape[0])
        if tag_masks is not None and not self.supports_tagged_scan:
            raise InvalidConfigError(
                "search_arrays(tag_masks=...) rides the scan kernel — "
                "compact tier or bf16 tile tier only; other tiers filter "
                "via ops.tags.dense_topk_tagged"
            )
        if self._tier is not None:
            import jax

            from trueno_rag_tpu.ops import dense_tiered as dt

            # Pallas TPU kernels need interpret mode off-TPU (tests/CPU)
            interpret = jax.devices()[0].platform not in ("tpu", "axon")
            if self._effective_tier() == "clustered":
                from trueno_rag_tpu.ops import clustered as cl

                order_np, order_j, cent_j, radii_j = self._cluster
                tags = None
                if tag_masks is not None:
                    tags = (
                        self._device_tag_bits_clustered(order_np),
                        jnp.asarray(np.asarray(tag_masks[0], np.int32)),
                        jnp.asarray(np.asarray(tag_masks[1], np.int32)),
                        jnp.asarray(np.asarray(tag_masks[2], np.int32)),
                    )
                host_fb_cl = self.config.compact_fallback == "host"
                out = cl.dense_topk_compact_bf16r_clustered(
                    q, *self._tier, self._device_valid, k_eff,
                    cent_j, radii_j,
                    return_candidates=host_fb_cl,
                    probe_tiles=self.config.cluster_probe_tiles,
                    row_map=order_j,  # results in ORIGINAL row ids
                    metric=self.config.metric, interpret=interpret,
                    # concentrated top-k needs t_top >= k
                    # (ops/clustered.py) — and the hybrid retriever
                    # stages with candidates_per_source (12 default), so
                    # size t_top to the REQUEST, not a constant, or
                    # certification fails on exactly the concentrated
                    # corpora this tier targets and every query pays the
                    # host patch. The +4 RUNNER-UP SLACK matters just as
                    # much: the exclusion threshold for a tile's
                    # unemitted rows is its t_top-th candidate's bf16
                    # upper bound (~±1.7e-3), so at t_top == k any
                    # corpus whose (k+1)-th row sits within that
                    # interval of the k-th — e.g. k+2 near-duplicates
                    # of the query — certified 0/8 (measured); emitting
                    # a few extra candidates rescores the runners-up in
                    # fp32 (interval ~1e-5) and the same corpus
                    # certifies. The kernel's per-SEL-tile pool is 16
                    # (2 per 128-block × 8 blocks): k > 12 loses slack
                    # and k > 16 concentrated in one tile cannot
                    # certify (host patch covers).
                    t_top=min(max(self.config.scan_t_top, 8, k_eff + 4), 16),
                    margin_tiles=self.config.scan_margin_tiles,
                    tile_n=max(self.config.scan_tile_n, 1024),
                    fetch=cl.resolve_cluster_fetch(self.config.cluster_fetch),
                    tags=tags,
                )
                scores, rows, ok = out[:3]
                ok_np = np.asarray(ok)
                if not ok_np.all():
                    self.compact_uncertified += int((~ok_np).sum())
                    if host_fb_cl:
                        # containment patch (the pruned-tile bound is
                        # folded into the returned threshold, so the
                        # candidate set provably contains the exact
                        # top-k whenever thr < the exact k-th score);
                        # full GEMM only for containment failures
                        s_np, r_np, unresolved = self._host_candidate_patch(
                            np.asarray(q), np.asarray(scores),
                            np.asarray(rows), ok_np, k_eff,
                            np.asarray(out[3]), np.asarray(out[4]),
                            tag_masks=tag_masks, resolve_rest=False,
                        )
                        if len(unresolved):
                            gm = np.ones_like(ok_np)
                            gm[unresolved] = False
                            s_np, r_np = self._host_exact_patch(
                                np.asarray(q), s_np, r_np, gm, k_eff,
                                tag_masks=tag_masks,
                            )
                            self.compact_gemm_patched += len(unresolved)
                        scores, rows = s_np, r_np
                        self.tier_fallbacks += 1
                return jnp.asarray(scores), jnp.asarray(rows)
            if self._effective_tier() == "compact":
                compact = {
                    "bf16r": dt.dense_topk_compact_bf16r,
                    "bf16rr": dt.dense_topk_compact_bf16rr,
                    "bf16": dt.dense_topk_compact_bf16,
                    "int8": dt.dense_topk_compact,
                }[self.config.compact_scan]
                tags = None
                if tag_masks is not None:
                    tags = (
                        self._device_tag_bits(),
                        jnp.asarray(np.asarray(tag_masks[0], np.int32)),
                        jnp.asarray(np.asarray(tag_masks[1], np.int32)),
                        jnp.asarray(np.asarray(tag_masks[2], np.int32)),
                    )
                host_fb = self.config.compact_fallback == "host"
                out = compact(
                    q, *self._tier, self._device_valid, k_eff,
                    metric=self.config.metric, interpret=interpret,
                    rescore_rows=self.config.scan_rescore_rows,
                    t_top=self.config.scan_t_top,
                    margin_tiles=self.config.scan_margin_tiles,
                    tile_n=self.config.scan_tile_n,
                    tags=tags,
                    # candidate rows + tile threshold feed the
                    # containment patch; kept on device (intermediates
                    # anyway) and fetched only for uncertified queries
                    return_candidates=host_fb,
                )
                scores, rows, ok = out[:3]
                ok_np = np.asarray(ok)
                retry = self.config.compact_retry
                # AUTO (None): under the host fallback the cheap exact
                # candidate patch runs FIRST and the widened retry is
                # reserved for its containment failures; under
                # fallback="none" the retry is the only tightening step
                retry_all = retry is True or (retry is None and not host_fb)
                if not ok_np.all():
                    # grouped async fetch of everything the host stages
                    # consume — per-array np.asarray paid one device
                    # sync (a full RTT on tunneled links) per array
                    fetch = (scores, rows) + (
                        (out[3], out[4]) if host_fb else ()
                    )
                    fetch = jax.device_get(fetch)
                    scores, rows = fetch[0], fetch[1]
                    if retry_all:
                        scores, rows, ok_np = self._compact_device_retry(
                            q, scores, rows, ok_np,
                            k_eff, tag_masks, interpret,
                        )
                if not ok_np.all():
                    self.compact_uncertified += int((~ok_np).sum())
                    if host_fb:
                        scores, rows = self._compact_exact_patch(
                            q, np.asarray(scores), np.asarray(rows),
                            ok_np, k_eff, fetch[2],
                            fetch[3], tag_masks, interpret,
                            containment_retry=retry is not False,
                        )
                        self.tier_fallbacks += 1
                return jnp.asarray(scores), jnp.asarray(rows)
            if self._effective_tier() == "bf16" and self.config.scan_kernel == "tile":
                tags = None
                if tag_masks is not None:
                    tags = (
                        self._device_tag_bits(),
                        jnp.asarray(np.asarray(tag_masks[0], np.int32)),
                        jnp.asarray(np.asarray(tag_masks[1], np.int32)),
                        jnp.asarray(np.asarray(tag_masks[2], np.int32)),
                    )
                scores, rows, fell_back = dt.dense_topk_tiered2_checked(
                    q, self._device_matrix, *self._tier, self._device_valid,
                    k_eff, metric=self.config.metric, interpret=interpret,
                    rescore_rows=self.config.scan_rescore_rows,
                    t_top=self.config.scan_t_top,
                    margin_tiles=self.config.scan_margin_tiles,
                    tile_n=self.config.scan_tile_n,
                    tags=tags,
                )
            elif self._effective_tier() == "int8" and self.config.scan_kernel == "tile":
                scores, rows, fell_back = dt.dense_topk_int8_tiered2_checked(
                    q, self._device_matrix, *self._tier, self._device_valid,
                    k_eff, metric=self.config.metric, interpret=interpret,
                    rescore_rows=self.config.scan_rescore_rows,
                    t_top=self.config.scan_t_top,
                    margin_tiles=self.config.scan_margin_tiles,
                    tile_n=self.config.scan_tile_n,
                )
            else:
                checked = (
                    dt.dense_topk_tiered_checked
                    if self._effective_tier() == "bf16"
                    else dt.dense_topk_int8_checked
                )
                scores, rows, fell_back = checked(
                    q, self._device_matrix, *self._tier, self._device_valid,
                    k_eff, metric=self.config.metric, interpret=interpret,
                    rescore_rows=self.config.scan_rescore_rows,
                    block_top=self.config.scan_block_top,
                    tile_n=self.config.scan_tile_n,
                )
            if fell_back:
                self.tier_fallbacks += 1
            return scores, rows
        scores, rows = dense_topk(q, self._device_matrix, self._device_valid, k_eff, self.config.metric)
        return scores, rows

    def _device_tag_bits(self) -> jnp.ndarray:
        """Capacity-sized device copy of the registry's per-row tag
        words, cached against the registry's tags_version (compact-tier
        filtered search streams it through the scan kernel)."""
        cached = getattr(self, "_tag_bits_cache", None)
        version = self.registry.tags_version
        n = self._host.shape[0]
        if cached is not None and cached[0] == version and cached[1].shape[0] == n:
            return cached[1]
        bits = jnp.asarray(self.registry.tags_host(n))
        self._tag_bits_cache = (version, bits)
        return bits

    def _device_tag_bits_clustered(self, order: np.ndarray) -> jnp.ndarray:
        """Clustered-layout device copy of the registry's tag words
        (the kernel streams PERMUTED rows, so the bits permute too);
        cached against (tags_version, cluster build)."""
        from trueno_rag_tpu.ops.clustered import apply_cluster_order

        version = (self.registry.tags_version,
                   getattr(self, "_cluster_version", 0))
        cached = getattr(self, "_tag_bits_clustered_cache", None)
        if cached is not None and cached[0] == version:
            return cached[1]
        bits = apply_cluster_order(
            self.registry.tags_host(self._host.shape[0]), order, fill=0
        )
        bits = jnp.asarray(bits)
        self._tag_bits_clustered_cache = (version, bits)
        return bits

    def _compact_device_retry(self, q, scores, rows, ok_np, k,
                              tag_masks=None, interpret=False,
                              return_candidates=False):
        """Widened device re-scan of just the uncertified compact-tier
        queries (see ``compact_retry``): margin_tiles x4 (>= 128), every
        emitted candidate rescored (no ``rescore_rows`` trim), t_top 8.
        The trim threshold and the tile margin are the two ±bf16-scan-
        bound quantities that dominate certificate misses; the widened
        pass replaces both with residual-corrected intervals. Returns
        (scores, rows, ok) with rescued queries merged in; for queries
        that STILL fail, records the provable worst-case score error in
        ``compact_uncertified_bound`` (bf16r only — the other layouts
        don't expose bounds)."""
        from trueno_rag_tpu.ops import dense_tiered as dt

        bad = np.flatnonzero(~ok_np)
        b = len(bad)
        bpad = 8
        while bpad < b:
            bpad *= 2  # bucketed retry batch: bounded recompiles
        q_np = np.asarray(q, np.float32)
        q_bad = np.zeros((bpad, q_np.shape[1]), np.float32)
        q_bad[:b] = q_np[bad]
        tags = None
        if tag_masks is not None:
            def sub(m):
                return jnp.asarray(np.pad(
                    np.asarray(m, np.int32)[bad], (0, bpad - b)
                ))

            # padded slots carry all-zero masks (match everything) —
            # their results are discarded below
            tags = (self._device_tag_bits(), sub(tag_masks[0]),
                    sub(tag_masks[1]), sub(tag_masks[2]))
        kwargs = dict(
            metric=self.config.metric, interpret=interpret,
            rescore_rows=None,
            t_top=max(8, self.config.scan_t_top),
            margin_tiles=max(128, 4 * self.config.scan_margin_tiles),
            tile_n=self.config.scan_tile_n,
            tags=tags,
        )
        bound = None
        cand_full = thr_full = None
        if self.config.compact_scan in ("bf16r", "bf16rr"):
            rr = self.config.compact_scan == "bf16rr"
            fn = dt.dense_topk_compact_bf16rr if rr else dt.dense_topk_compact_bf16r
            out2 = fn(
                jnp.asarray(q_bad), *self._tier, self._device_valid, k,
                return_bounds=True, return_candidates=return_candidates,
                **kwargs,
            )
            s2, r2, ok2, err2, rhs2 = out2[:5]
            if return_candidates:
                # scatter the retry's candidates back to full-batch
                # alignment for a second containment patch: the widened
                # margin-128 threshold sits far below the primary's, so
                # containment usually holds where the primary's failed
                c2, t2 = np.asarray(out2[5])[:b], np.asarray(out2[6])[:b]
                cand_full = np.full((len(ok_np), c2.shape[1]), -1, np.int64)
                thr_full = np.full((len(ok_np),), np.inf, np.float64)
                cand_full[bad] = c2
                thr_full[bad] = t2
            s2n, err2n = np.asarray(s2)[:b], np.asarray(err2)[:b]
            rhs2n = np.asarray(rhs2)[:b]
            sel_lower = np.where(
                np.isneginf(s2n), np.inf, s2n - err2n
            ).min(axis=1)
            bound = np.maximum(rhs2n - np.where(
                np.isinf(sel_lower), -np.inf, sel_lower), 0.0)
        else:
            compact = {
                "bf16": dt.dense_topk_compact_bf16,
                "int8": dt.dense_topk_compact,
            }[self.config.compact_scan]
            s2, r2, ok2 = compact(
                jnp.asarray(q_bad), *self._tier, self._device_valid, k,
                **kwargs,
            )
        ok2_np = np.asarray(ok2)[:b]
        s2n, r2n = np.asarray(s2)[:b], np.asarray(r2)[:b]
        scores, rows = scores.copy(), rows.copy()
        fixed = bad[ok2_np]
        scores[fixed] = s2n[ok2_np]
        rows[fixed] = r2n[ok2_np]
        # the widened pass's result is usually the better best-effort
        # answer even where uncertified (tighter intervals, wider
        # selection) — but a concentrated corpus can overflow the
        # per-tile candidate pool and come back SHORTER than the
        # primary pass, so only adopt it when it found at least as
        # many valid rows
        still_m = ~ok2_np
        better = (r2n >= 0).sum(axis=1) >= (rows[bad] >= 0).sum(axis=1)
        adopt = still_m & better
        scores[bad[adopt]] = s2n[adopt]
        rows[bad[adopt]] = r2n[adopt]
        self.compact_retry_certified += int(ok2_np.sum())
        if bound is not None and still_m.any():
            # a non-adopted (shorter) widened result leaves the primary
            # best-effort in place, whose error the bounds don't cover
            b_vals = np.where(better, bound, np.inf)[still_m]
            self.compact_uncertified_bound = max(
                self.compact_uncertified_bound, float(np.max(b_vals))
            )
        out_ok = ok_np.copy()
        out_ok[fixed] = True
        if return_candidates:
            return scores, rows, out_ok, cand_full, thr_full
        return scores, rows, out_ok

    def _compact_exact_patch(self, q, scores, rows, ok_np, k, cand, thr,
                             tag_masks=None, interpret=False,
                             containment_retry=True):
        """Staged exact resolution of uncertified compact queries, in
        strictly increasing cost order (measured at 10.5M random,
        benches/exact_patch_probe.py: 52/256 uncertified → 45 resolved
        by stage 1 at ~5 ms/query host work, 7 by stage 2's widened
        threshold, 0 reached stage 3):

        1. candidate patch — exact f64 rescore of the primary pass's
           ~W candidate rows where the containment certificate holds;
        2. widened device retry (margin ×4, no trim, t_top 8) WITH its
           own candidates — either certifies outright or its far lower
           tile threshold restores containment for another patch;
        3. streamed full-matrix host GEMM (the former default, now the
           last resort — counted in ``compact_gemm_patched``)."""
        q_np = np.asarray(q)
        scores, rows, unresolved = self._host_candidate_patch(
            q_np, scores, rows, ok_np, k, cand, thr,
            tag_masks=tag_masks, resolve_rest=False)
        if (len(unresolved) and containment_retry
                and self.config.compact_scan in ("bf16r", "bf16rr")):
            nok = np.ones_like(ok_np)
            nok[unresolved] = False
            scores, rows, nok2, cand2, thr2 = self._compact_device_retry(
                q, scores, rows, nok, k, tag_masks, interpret,
                return_candidates=True)
            unresolved = np.flatnonzero(~nok2)
            if len(unresolved):
                scores, rows, unresolved = self._host_candidate_patch(
                    q_np, scores, rows, nok2, k, cand2, thr2,
                    tag_masks=tag_masks, resolve_rest=False)
        if len(unresolved):
            gm = np.ones_like(ok_np)
            gm[unresolved] = False
            scores, rows = self._host_exact_patch(
                q_np, scores, rows, gm, k, tag_masks=tag_masks)
            self.compact_gemm_patched += len(unresolved)
        return scores, rows

    def _host_candidate_patch(self, q, scores, rows, ok_np, k,
                              cand_rows, cand_thr, tag_masks=None,
                              resolve_rest=True):
        """Exact patch for uncertified compact queries via the
        CONTAINMENT certificate — the r4 replacement for the full-matrix
        host GEMM as the default uncertified path.

        ``cand_rows [B, W]`` / ``cand_thr [B]`` come from the primary
        device pass (``return_candidates=True``): the scan's tile-level
        threshold is a sound upper bound on the TRUE score of every row
        outside the candidate set. The host rescores JUST the candidate
        rows in f64 (exact true-score order, (desc, row asc) ties —
        identical semantics to :meth:`_host_exact_patch`); if the k-th
        exact candidate score strictly beats the threshold, the exact
        top-k set provably lies inside the candidates and the patched
        result carries the full exact contract at O(W·d) host cost.
        Near-tie certificate failures — the dominant failure mode at
        10M+ scale, where rank-k gaps sit below the residual interval —
        always resolve here, because exact scores have no interval slop
        (measured at 10.5M random: 45/52 of the primary pass's
        uncertified queries, benches/exact_patch_probe.py). Containment
        failures (genuinely missed tiles: thr ≥ s_k, or a fail-closed
        +inf threshold) fall through to the streamed full-matrix GEMM —
        or, with ``resolve_rest=False``, are RETURNED as the third
        element so the caller can try a widened device retry's
        candidate set first (search_arrays does; the retry's margin-128
        threshold usually restores containment)."""
        bad = np.flatnonzero(~ok_np)
        n = self._host.shape[0]
        scores = scores.copy()
        rows = rows.copy()
        # One vectorized pass over the bad queries (the per-query loop
        # measured ~5 ms/query at W=328 — the gather+einsum form is
        # ~20x cheaper and the patch must stay negligible next to the
        # ~25 ms device batch):
        cr = np.asarray(cand_rows, np.int64)[bad]  # [B', W]
        live = (cr >= 0) & (cr < n)
        cr_safe = np.where(live, cr, 0)
        live &= self._valid[cr_safe]
        if tag_masks is not None:
            # defensive re-filter (the kernel already masked disallowed
            # rows out of the candidate stream)
            tag_bits = self.registry.tags_host(n)
            t_all = np.asarray(tag_masks[0], np.int32)[bad, None]
            t_any = np.asarray(tag_masks[1], np.int32)[bad, None]
            t_none = np.asarray(tag_masks[2], np.int32)[bad, None]
            bits = tag_bits[cr_safe]
            allowed = (bits & t_all) == t_all
            allowed &= (t_any == 0) | ((bits & t_any) != 0)
            allowed &= (bits & t_none) == 0
            live &= allowed
        # duplicate candidate rows (sentinel collisions) keep the first
        # occurrence only — row-sorted neighbors mark the rest. Dead
        # slots all sort to the SAME int64-max padding value, so the
        # dup check must ignore them or the slow defensive loop below
        # would run on every patch
        pad_v = np.iinfo(np.int64).max
        srt = np.sort(np.where(live, cr, pad_v), axis=1)
        eq = (srt[:, 1:] == srt[:, :-1]) & (srt[:, 1:] != pad_v)
        if eq.any():
            for bi in range(cr.shape[0]):
                seen = set()
                for wi in range(cr.shape[1]):
                    if not live[bi, wi]:
                        continue
                    r = int(cr[bi, wi])
                    if r in seen:
                        live[bi, wi] = False
                    else:
                        seen.add(r)
        qv = q[bad].astype(np.float64)
        if self.config.metric == DistanceMetric.COSINE:
            nrm = np.linalg.norm(qv, axis=1, keepdims=True)
            qv = qv / np.where(nrm == 0.0, 1.0, nrm)
        gathered = self._host[cr_safe].astype(np.float64)  # [B', W, d]
        s = np.einsum("bwd,bd->bw", gathered, qv)
        s[~live] = -np.inf
        # (score desc, row asc) within candidates; dead slots last
        sort_rows = np.where(live, cr, np.iinfo(np.int64).max)
        kk = min(k, cr.shape[1])  # starved selections can have W < k
        order = np.lexsort((sort_rows, -s), axis=-1)[:, :kk]
        top_s = np.take_along_axis(s, order, axis=1)
        top_r = np.take_along_axis(cr_safe, order, axis=1)
        if kk < k:
            pad = ((0, 0), (0, k - kk))
            top_s = np.pad(top_s, pad, constant_values=-np.inf)
            top_r = np.pad(top_r, pad, constant_values=0)
        n_live = live.sum(axis=1)
        thr_b = np.asarray(cand_thr, np.float64)[bad]
        s_k = top_s[:, -1] if k > 0 else np.full(len(bad), -np.inf)
        # containment: every non-candidate row provably below the k-th
        # exact candidate score; short allowed sets need thr == -inf
        contained = np.where(
            n_live >= k, thr_b < s_k, np.isneginf(thr_b)
        )
        dead = np.isneginf(top_s)
        top_r = np.where(dead, -1, top_r)
        top_s32 = top_s.astype(np.float32)
        top_s32[dead] = -np.inf
        fixed = bad[contained]
        scores[fixed] = top_s32[contained]
        rows[fixed] = top_r[contained]
        self.compact_candidate_patched += int(contained.sum())
        unresolved = bad[~contained]
        if not resolve_rest:
            return scores, rows, unresolved
        if len(unresolved):
            gemm_mask = np.ones_like(ok_np)
            gemm_mask[unresolved] = False
            scores, rows = self._host_exact_patch(
                q, scores, rows, gemm_mask, k, tag_masks=tag_masks
            )
            self.compact_gemm_patched += len(unresolved)
        return scores, rows

    def _host_exact_patch(self, q, scores, rows, ok_np, k, tag_masks=None):
        """Re-run uncertified compact-tier queries on the HOST fp32
        matrix with float64 accumulation — true-score top-k with the
        (score desc, row asc) tie rule, the same ordering the device
        certificate proves for certified queries. Streams the matrix in
        ``compact_prep_rows`` slabs so no f64 copy materializes.
        ``tag_masks`` applies the same per-query filter the device scan
        enforced, so patched results stay exact FILTERED top-k."""
        bad = np.flatnonzero(~ok_np)
        tag_bits = None
        if tag_masks is not None:  # predicate semantics: ops/tags.py::tag_pred
            tag_bits = self.registry.tags_host(self._host.shape[0])
            t_all = np.asarray(tag_masks[0], np.int32)[bad]
            t_any = np.asarray(tag_masks[1], np.int32)[bad]
            t_none = np.asarray(tag_masks[2], np.int32)[bad]
        qs = q[bad].astype(np.float64)
        if self.config.metric == DistanceMetric.COSINE:
            norms = np.linalg.norm(qs, axis=1, keepdims=True)
            qs = qs / np.where(norms == 0.0, 1.0, norms)
        step = self.config.compact_prep_rows
        best_s = np.full((len(bad), k), -np.inf)
        best_r = np.full((len(bad), k), -1, dtype=np.int64)
        for lo in range(0, self._host.shape[0], step):
            slab = self._host[lo : lo + step]
            vmask = self._valid[lo : lo + step]
            s = slab.astype(np.float64) @ qs.T  # [rows, B] f64 accumulation
            s[~vmask] = -np.inf
            if tag_bits is not None:
                bits = tag_bits[lo : lo + step][:, None]  # [rows, 1]
                allowed = (bits & t_all[None]) == t_all[None]
                allowed &= (t_any[None] == 0) | ((bits & t_any[None]) != 0)
                allowed &= (bits & t_none[None]) == 0
                s[~allowed] = -np.inf
            r = np.arange(lo, lo + slab.shape[0], dtype=np.int64)
            cat_s = np.concatenate([best_s, s.T], axis=1)
            cat_r = np.concatenate([best_r, np.broadcast_to(r, (len(bad), len(r)))], axis=1)
            # merge with (score desc, row asc): row asc is the natural
            # order of ties under a stable sort on -score alone only
            # within each slab, so sort on both keys explicitly
            order = np.lexsort((cat_r, -cat_s), axis=-1)
            take = order[:, :k]
            best_s = np.take_along_axis(cat_s, take, axis=1)
            best_r = np.take_along_axis(cat_r, take, axis=1)
        best_r[np.isneginf(best_s)] = -1
        scores = scores.copy()
        rows = rows.copy()
        scores[bad] = best_s.astype(np.float32)
        rows[bad] = best_r.astype(rows.dtype)
        return scores, rows

    def search(self, query: Sequence[float], k: int) -> List[Tuple[str, float]]:
        """Host-facing search: returns ``[(chunk_id, score)]`` sorted
        (score desc, row asc), only valid hits (like index.rs:386-412)."""
        if len(self) == 0 or k <= 0:
            return []
        scores, rows = self.search_arrays(np.asarray(query, dtype=np.float32)[None, :], k)
        return self._hydrate(np.asarray(scores[0]), np.asarray(rows[0]))

    def _hydrate(self, scores: np.ndarray, rows: np.ndarray) -> List[Tuple[str, float]]:
        out: List[Tuple[str, float]] = []
        for s, r in zip(scores, rows):
            if r < 0:
                continue
            cid = self.registry.id_of(int(r))
            if cid is not None:
                out.append((cid, float(s)))
        return out

    # -- accessors ---------------------------------------------------------------

    def get(self, chunk_id: str) -> Optional[Chunk]:
        return self.registry.get_chunk(chunk_id)

    def __len__(self) -> int:
        return self._count

    def is_empty(self) -> bool:
        return self._count == 0

    @property
    def dimension(self) -> int:
        return self.config.dimension
