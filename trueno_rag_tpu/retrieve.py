"""Retrievers: hybrid dense+sparse with on-device fusion.

Capability-equivalent to the reference's ``src/retrieve.rs``:
``RetrievalResult`` with the four-score model and ``best_score``
priority (retrieve.rs:11-76), ``HybridRetrieverConfig``
(retrieve.rs:78-100), ``HybridRetriever`` (retrieve.rs:102-263) and the
``DenseRetriever``/``SparseRetriever`` conveniences
(retrieve.rs:265-341).

TPU-native query plan (one logical program, no host round-trips between
stages): embed query (host hash / device encoder) → dense matmul top-C
and BM25 scatter top-C over the *shared row space* (both stores use one
:class:`ChunkRegistry`) → device fusion over the padded candidate
arrays → final top-k → a single hydration step back on host. The
reference instead hops HashMaps between each stage (retrieve.rs:175-220).

Batched retrieval (``retrieve_batch``) amortizes compilation and device
dispatch across queries — the unit of work the TPU actually wants.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from trueno_rag_tpu.chunking import Chunk
from trueno_rag_tpu.embed import Embedder
from trueno_rag_tpu.errors import QueryError
from trueno_rag_tpu.fusion import FusionStrategy
from trueno_rag_tpu.index import BM25Index, ChunkRegistry, VectorStore, VectorStoreConfig

# ---------------------------------------------------------------------------
# RetrievalResult (reference: retrieve.rs:11-76)
# ---------------------------------------------------------------------------


@dataclass
class RetrievalResult:
    """A retrieved chunk plus its per-source scores.

    ``learned_score`` extends the reference's four-score model with the
    learned-sparse (SPLADE-class) source when one is attached to the
    retriever; it ranks after ``sparse_score`` in ``best_score``."""

    chunk: Chunk
    dense_score: Optional[float] = None
    sparse_score: Optional[float] = None
    fused_score: Optional[float] = None
    rerank_score: Optional[float] = None
    learned_score: Optional[float] = None

    def best_score(self) -> float:
        """Priority: rerank > fused > dense > sparse > learned > 0.0
        (reference: retrieve.rs:60-76, extended with the learned source)."""
        for s in (self.rerank_score, self.fused_score, self.dense_score,
                  self.sparse_score, self.learned_score):
            if s is not None:
                return s
        return 0.0

    def with_rerank_score(self, score: float) -> "RetrievalResult":
        self.rerank_score = score
        return self


@dataclass
class HybridRetrieverConfig:
    """Reference defaults: 50 candidates per source, RRF(60) fusion,
    both sources enabled (retrieve.rs:78-100)."""

    candidates_per_source: int = 50
    fusion: FusionStrategy = field(default_factory=FusionStrategy.rrf)
    use_dense: bool = True
    use_sparse: bool = True
    # learned-sparse third source; effective only after
    # HybridRetriever.attach_learned_sparse() installs one
    use_learned: bool = True
    # None = auto: JAX-encoder embedders route through the fully fused
    # one-XLA-program path (encoder+dense+BM25+fusion); False forces the
    # staged path; True raises for non-JAX embedders.
    fused: Optional[bool] = None


# ---------------------------------------------------------------------------
# HybridRetriever (reference: retrieve.rs:102-263)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TagFilter:
    """Metadata filter over chunk tags (strings; see
    :meth:`ChunkRegistry.set_tags`): results must carry ALL of ``all``,
    at least one of ``any`` (when non-empty), and NONE of ``none``.
    Resolution to 32-bit masks happens per dispatch; an unknown tag in
    ``all`` matches nothing (empty results); an unknown tag in ``any``
    matches nothing itself but KNOWN alternatives still match (only an
    all-unknown ``any`` empties the results); an unknown tag in
    ``none`` is a no-op."""

    all: Tuple[str, ...] = ()
    any: Tuple[str, ...] = ()
    none: Tuple[str, ...] = ()


def resolve_tag_filters(registry, tag_filter, b: int):
    """Resolve TagFilter(s) to three int32 mask arrays of length
    ``b``. Unknown-tag semantics (OR/AND-consistent): an unknown tag in
    ``all`` makes the filter impossible (the reserved bit-31 marker
    matches no chunk); an unknown tag in ``any`` simply matches nothing
    — the KNOWN alternatives still match — and only an all-unknown
    ``any`` is impossible; unknown tags in ``none`` exclude nothing."""
    from trueno_rag_tpu.index.base import IMPOSSIBLE_BIT

    filters = (
        list(tag_filter) if isinstance(tag_filter, (list, tuple))
        else [tag_filter] * b
    )
    if len(filters) != b:
        raise QueryError(f"got {len(filters)} tag filters for {b} queries")
    t_all = np.zeros((b,), np.int64)
    t_any = np.zeros((b,), np.int64)
    t_none = np.zeros((b,), np.int64)
    for i, f in enumerate(filters):
        if f is None:
            continue
        impossible = False
        for t in f.all:
            bit = registry.bit_for(t, create=False)
            if bit is None:
                impossible = True
                break
            t_all[i] |= bit
        if not impossible and f.any:
            known = [registry.bit_for(t, create=False) for t in f.any]
            known = [x for x in known if x is not None]
            if not known:
                impossible = True
            else:
                for x in known:
                    t_any[i] |= x
        for t in f.none:
            bit = registry.bit_for(t, create=False)
            if bit is not None:
                t_none[i] |= bit
        if impossible:
            t_all[i] = IMPOSSIBLE_BIT
            t_any[i] = 0
            t_none[i] = 0
    # int64 -> int32 bit patterns (bit 31 wraps to the sign bit)
    return (t_all.astype(np.uint32).astype(np.int32),
            t_any.astype(np.uint32).astype(np.int32),
            t_none.astype(np.uint32).astype(np.int32))


class HybridRetriever:
    """Owns a VectorStore + BM25Index over one shared row registry."""

    def __init__(
        self,
        embedder: Embedder,
        config: Optional[HybridRetrieverConfig] = None,
        vector_config: Optional[VectorStoreConfig] = None,
    ) -> None:
        self.embedder = embedder
        self.config = config or HybridRetrieverConfig()
        self.registry = ChunkRegistry()
        vcfg = vector_config or VectorStoreConfig(dimension=embedder.dimension)
        self.vector_store = VectorStore(vcfg, registry=self.registry)
        self.sparse_index = BM25Index(registry=self.registry)
        # optional learned-sparse (SPLADE-class) third source
        self.learned_encoder = None
        self.learned_index = None
        self._learned_encode_batch = 128

    def attach_learned_sparse(self, encoder, encode_batch: int = 128) -> None:
        """Install a SPLADE-class expansion encoder (e.g.
        :class:`trueno_rag_tpu.models.splade.SpladeEncoder`) as a THIRD
        candidate source. Queries then fuse dense + BM25 + learned-
        sparse candidates in one N-way device fusion
        (:func:`trueno_rag_tpu.ops.fusion.fuse_topk_many`); results
        carry the extra score in ``learned_score``. Chunks already
        indexed are expanded and back-filled now; later ``index``/
        ``index_batch`` calls feed all three stores. The reference has
        no learned-sparse retrieval (its only sparse path is BM25,
        index.rs:30-280); this is the tri-hybrid extension over it."""
        from trueno_rag_tpu.index.learned_sparse import LearnedSparseIndex

        self.learned_encoder = encoder
        self.learned_index = LearnedSparseIndex(registry=self.registry)
        self._learned_encode_batch = int(encode_batch)
        live = [
            c for c in (
                self.registry.chunk_of(r)
                for r in range(self.registry.capacity_rows)
            ) if c is not None
        ]
        if live:
            self._learned_add(live)

    def _learned_add(self, chunks: Sequence[Chunk]) -> None:
        eb = self._learned_encode_batch
        for lo in range(0, len(chunks), eb):
            batch = chunks[lo:lo + eb]
            terms, w = self.learned_encoder.expand_documents(
                [c.content for c in batch]
            )
            self.learned_index.add_batch(batch, terms, w)

    # -- indexing -------------------------------------------------------------

    def index(self, chunk: Chunk, tags: Optional[Sequence[str]] = None) -> None:
        """Add a chunk to both stores (reference: retrieve.rs:156-164).
        The chunk must already carry an embedding.

        Order matters: the sparse index goes FIRST — replacing an
        existing chunk id requires re-tokenizing the OLD content to
        clear its postings, and inserting into the vector store swaps
        the new chunk into the shared registry. The embedding is
        validated BEFORE either store mutates, so a bad chunk fails
        atomically instead of leaving a BM25-only half-index."""
        self.vector_store.validate_chunk(chunk)
        self.sparse_index.add(chunk)
        self.vector_store.insert(chunk)
        if self.learned_index is not None:
            self._learned_add([chunk])
        if tags is not None:
            self.registry.set_tags(chunk.id, tags)

    def index_batch(self, chunks: Sequence[Chunk], tags: Optional[Sequence[str]] = None) -> None:
        # Bulk sparse path engages the native C++ builder (one FFI call);
        # sparse before dense for the same replacement-ordering reason
        # as index(); validation first for the same atomicity reason.
        for chunk in chunks:
            self.vector_store.validate_chunk(chunk)
        self.sparse_index.add_batch(chunks)
        self.vector_store.insert_many(chunks)
        if self.learned_index is not None:
            self._learned_add(list(chunks))
        if tags is not None:
            for chunk in chunks:
                self.registry.set_tags(chunk.id, tags)

    def remove(self, chunk_id: str) -> bool:
        """Remove from both stores and free the shared row."""
        found_sparse = self.sparse_index.remove(chunk_id)
        found_dense = self.vector_store.remove(chunk_id)
        found_learned = (
            self.learned_index.remove(chunk_id)
            if self.learned_index is not None else False
        )
        if found_dense or found_sparse or found_learned:
            self.registry.remove(chunk_id)
        return found_dense or found_sparse or found_learned

    # -- tag filters -----------------------------------------------------------

    def _filter_masks(self, tag_filter, b: int):
        return resolve_tag_filters(self.registry, tag_filter, b)

    def _device_tag_bits(self, n_rows: int):
        """Capacity-sized device copy of the per-row tag masks —
        delegated to the vector store's version-keyed cache (one host
        build + one upload per tags edit, not two; the store's capacity
        equals every call site's n_rows by construction)."""
        del n_rows  # the store's capacity IS the row space
        return self.vector_store._device_tag_bits()

    def ensure_ready(self) -> None:
        """Apply pending mutations to the device state NOW instead of on
        the next query — serving processes call this after an ingest or
        reload window so the first live request doesn't pay the device
        upload / tier rebuild (for the clustered tier that can be a full
        k-means; for BM25 a CSR snapshot rebuild). The serve layer's
        ``/reload`` warms the incoming retriever with this before the
        atomic swap."""
        self.vector_store.ensure_ready()
        self.sparse_index.ensure_ready()
        if self.learned_index is not None:
            self.learned_index.ensure_ready()
        self.vector_store._device_tag_bits()  # lazy per-row tag masks

    # -- retrieval ---------------------------------------------------------------

    def retrieve(self, query: str, k: int,
                 fusion: Optional[FusionStrategy] = None,
                 tag_filter: Optional[TagFilter] = None) -> List[RetrievalResult]:
        return self.retrieve_batch([query], k, fusion=fusion, tag_filter=tag_filter)[0]

    def retrieve_batch(self, queries: Sequence[str], k: int,
                       fusion: Optional[FusionStrategy] = None,
                       tag_filter=None) -> List[List[RetrievalResult]]:
        """Hybrid retrieval for a query batch.

        Candidate generation and fusion run on device over shared rows;
        hydration maps the final top-k rows back to chunks exactly once
        (the reference hydrates through the dense store per result,
        retrieve.rs:203-217).

        ``fusion`` overrides the configured strategy for this dispatch
        only (used by intent-conditioned fusion routing) — candidate
        generation is unchanged, so the override is semantics-equivalent
        to reconfiguring the retriever for one call.
        """
        if not queries:
            return []
        if any(not q.strip() for q in queries):
            raise QueryError("empty query")
        use_dense = self.config.use_dense
        use_sparse = self.config.use_sparse
        use_learned = (
            self.learned_index is not None
            and self.config.use_learned
            and len(self.learned_index) > 0
        )
        if not use_dense and not use_sparse and not use_learned:
            raise QueryError("all retrieval sources disabled")
        if self.config.fused is True and use_learned:
            raise QueryError(
                "fused=True is the two-source one-program path; the "
                "learned-sparse source serves the staged tri-hybrid "
                "(leave fused=None or set use_learned=False)"
            )
        if self.config.fused is True and not (use_dense and use_sparse):
            # the explicit-fused contract raises loudly everywhere else
            # (non-JAX embedder, compact store) — a disabled source must
            # not silently degrade it to the staged path; config errors
            # surface regardless of corpus state
            raise QueryError(
                "fused=True requires BOTH sources (use_dense and "
                "use_sparse); disable fused or enable the source"
            )
        if len(self.registry) == 0:
            return [[] for _ in queries]
        cand = self.config.candidates_per_source
        fusion_strategy = fusion or self.config.fusion
        if use_dense and use_sparse and not use_learned and self.config.fused is not False:
            from trueno_rag_tpu.models.encoder import JaxEncoderEmbedder

            if isinstance(self.embedder, JaxEncoderEmbedder):
                if self.config.fused is True:
                    if self.vector_store._effective_tier() == "clustered":
                        # the fused compact program reads the UNPERMUTED
                        # compact replicas; the clustered layout stages
                        raise QueryError(
                            "fused=True is not available on "
                            "scan_tier='clustered' (leave fused=None; "
                            "the staged path serves it)"
                        )
                    if (self.vector_store.is_compact
                            and tag_filter is not None):
                        raise QueryError(
                            "fused=True on a compact store does not "
                            "support tag filters; leave fused=None "
                            "(the staged compact path serves filters)"
                        )
                    return self.retrieve_batch_fused(
                        queries, k, fusion=fusion, tag_filter=tag_filter
                    )
                # fused=None (auto): the one-program fused path scans
                # the fp32 matrix — right below the tier crossover; once
                # a scan tier is engaged (bf16 past scan_tier_auto_rows,
                # or compact) the staged tiered hybrid below is faster
                # (the certified scan beats the fp32 matmul by ~2.4x at
                # 1M) with identical results.
                self.sparse_index._refresh_snapshot()
                if (
                    self.vector_store._effective_tier() == "none"
                    and self.sparse_index._snap["blocks"] is not None
                ):
                    # auto only: when the corpus outgrew the block-table
                    # BM25 layout (>= 2**24 rows), the staged path below
                    # serves the query instead of raising the explicit
                    # fused=True contract error
                    return self.retrieve_batch_fused(
                        queries, k, fusion=fusion, tag_filter=tag_filter
                    )
            elif self.config.fused is True:
                raise QueryError("fused=True requires a JaxEncoderEmbedder")

        b = len(queries)
        # Bucket the batch dimension to a power of two so serving at
        # arbitrary batch sizes compiles O(log B) programs, not one per B.
        b_pad = 1
        while b_pad < b:
            b_pad *= 2
        if use_dense:
            qvecs = np.asarray(self.embedder.embed_queries(queries), dtype=np.float32)
            if b_pad != b:
                qvecs = np.pad(qvecs, ((0, b_pad - b), (0, 0)))
        if use_sparse:
            padded_queries = list(queries) + ["\0"] * (b_pad - b)

        masks = None
        if tag_filter is not None:
            masks = self._filter_masks(tag_filter, b)
            if b_pad != b:  # dummy padded queries: unconstrained masks
                masks = tuple(
                    np.pad(m, (0, b_pad - b)) for m in masks
                )

        staged_tier = self.vector_store._effective_tier() != "none" and (
            masks is None or self.vector_store.supports_tagged_scan
        )
        if use_dense and use_sparse and staged_tier and not use_learned:
            # Tiered store: stage the hybrid — certified dense scan
            # (exact: checked fallback on the bf16/int8 tiers, host
            # patch on compact) + BM25 + device fusion on the candidate
            # arrays. One extra dispatch vs the one-program path, but
            # the tier scan beats the fp32 matmul ~2.4x at 1M; results
            # are identical (on compact, RRF is rank-based so a
            # within-certified-set order swap can perturb fusion only
            # when fallback="none"). Tag filters ride the scan kernels
            # where supported (compact, bf16 tile).
            import jax.numpy as jnp

            from trueno_rag_tpu.ops.fusion import fuse_topk

            d_scores, d_rows = self.vector_store.search_arrays(
                qvecs, cand, tag_masks=masks
            )
            s_scores, s_rows = self.sparse_index.search_arrays(padded_queries, cand)
            if masks is not None:
                # BM25 candidates filter post-top-k, same contract as the
                # tagged one-dispatch path (ops/tags.py) — slots spent on
                # disallowed rows are not refilled
                from trueno_rag_tpu.ops.tags import filter_candidates_by_tags

                bits = self.vector_store._device_tag_bits()
                s_rows, s_scores = filter_candidates_by_tags(
                    jnp.asarray(s_rows), jnp.asarray(s_scores), bits,
                    jnp.asarray(masks[0]), jnp.asarray(masks[1]),
                    jnp.asarray(masks[2]),
                )
            f_rows, f_scores = fuse_topk(
                jnp.asarray(d_rows), jnp.asarray(d_scores),
                jnp.asarray(s_rows), jnp.asarray(s_scores),
                kind=fusion_strategy.kind, param=fusion_strategy.device_param,
            )
        elif use_dense and use_sparse and not use_learned:
            # one device dispatch for dense + BM25 + fusion
            from trueno_rag_tpu.ops.hybrid import (
                hybrid_query_arrays,
                hybrid_query_arrays_segments,
            )

            import jax.numpy as jnp

            self.sparse_index._refresh_snapshot()
            snap = self.sparse_index._snap
            self.vector_store._refresh_device()
            if snap["blocks"] is not None and masks is not None:
                from trueno_rag_tpu.ops.tags import hybrid_query_arrays_tagged

                bids, blo, bhi = self.sparse_index._gather_blocks(padded_queries)
                dm = self.vector_store.device_matrix
                f_rows, f_scores, d_rows, d_scores, s_rows, s_scores = (
                    hybrid_query_arrays_tagged(
                        jnp.asarray(qvecs),
                        dm,
                        self.vector_store.device_valid,
                        self._device_tag_bits(dm.shape[0]),
                        jnp.asarray(masks[0]), jnp.asarray(masks[1]),
                        jnp.asarray(masks[2]),
                        jnp.asarray(bids), jnp.asarray(blo), jnp.asarray(bhi),
                        snap["blocks"],
                        cand=cand,
                        metric=self.vector_store.config.metric,
                        fusion_kind=fusion_strategy.kind,
                        fusion_param=fusion_strategy.device_param,
                    )
                )
            elif snap["blocks"] is not None:
                bids, blo, bhi = self.sparse_index._gather_blocks(padded_queries)
                f_rows, f_scores, d_rows, d_scores, s_rows, s_scores = hybrid_query_arrays(
                    jnp.asarray(qvecs),
                    self.vector_store.device_matrix,
                    self.vector_store.device_valid,
                    jnp.asarray(bids), jnp.asarray(blo), jnp.asarray(bhi),
                    snap["blocks"],
                    cand=cand,
                    metric=self.vector_store.config.metric,
                    fusion_kind=fusion_strategy.kind,
                    fusion_param=fusion_strategy.device_param,
                )
            elif masks is not None:
                raise QueryError(
                    "tag filters are not supported on the segment BM25 path "
                    "(corpora past the f32-exact block range)"
                )
            else:  # rows past the f32-exact block range: segment path
                starts, lens = self.sparse_index._gather_segments(padded_queries)
                f_rows, f_scores, d_rows, d_scores, s_rows, s_scores = (
                    hybrid_query_arrays_segments(
                        jnp.asarray(qvecs),
                        self.vector_store.device_matrix,
                        self.vector_store.device_valid,
                        jnp.asarray(starts), jnp.asarray(lens),
                        self.sparse_index._get_packed(), snap["avgdl"],
                        cand=cand,
                        metric=self.vector_store.config.metric,
                        fusion_kind=fusion_strategy.kind,
                        fusion_param=fusion_strategy.device_param,
                        k1=self.sparse_index.k1,
                        b=self.sparse_index.b,
                    )
                )
        elif use_dense and not use_learned:
            d_scores, d_rows = self._dense_candidates(qvecs, cand, masks)
            f_rows, f_scores = d_rows, d_scores
        elif use_sparse and not use_learned:
            s_scores, s_rows = self._sparse_candidates(padded_queries, cand, masks)
            f_rows, f_scores = s_rows, s_scores
        else:
            # learned-sparse source active: tri-hybrid. Fast path = ONE
            # jitted program (dense + BM25 + learned + N-way fusion,
            # ops.hybrid.tri_query_arrays) when all three sources run
            # unfiltered on the fp32/block-table layouts; otherwise the
            # staged per-source path below (tiers, filters, subsets).
            import jax.numpy as jnp

            from trueno_rag_tpu.ops.fusion import fuse_topk_many

            tri = (
                self._tri_one_dispatch(qvecs, padded_queries, cand,
                                       fusion_strategy)
                if use_dense and use_sparse and masks is None else None
            )
            if tri is not None:
                (f_rows, f_scores, d_rows, d_scores,
                 s_rows, s_scores, l_rows, l_scores) = tri
            else:
                lists = []
                if use_dense:
                    d_scores, d_rows = self._dense_candidates(qvecs, cand, masks)
                    lists.append((d_rows, d_scores))
                if use_sparse:
                    s_scores, s_rows = self._sparse_candidates(
                        padded_queries, cand, masks
                    )
                    lists.append((s_rows, s_scores))
                l_scores, l_rows = self._learned_candidates(
                    list(queries) + ["\0"] * (b_pad - b), cand, masks
                )
                lists.append((jnp.asarray(l_rows), jnp.asarray(l_scores)))
                if len(lists) == 1:
                    f_rows, f_scores = l_rows, l_scores
                else:
                    weights = (
                        tuple(fusion_strategy.resolve_weights(len(lists)))
                        if fusion_strategy.kind in ("linear", "convex") else ()
                    )
                    f_rows, f_scores = fuse_topk_many(
                        tuple(jnp.asarray(r) for r, _ in lists),
                        tuple(jnp.asarray(s) for _, s in lists),
                        kind=fusion_strategy.kind,
                        param=fusion_strategy.device_param,
                        weights=weights,
                    )

        f_rows = np.asarray(f_rows)
        f_scores = np.asarray(f_scores)
        d_maps = self._score_maps(d_rows, d_scores) if use_dense else [{}] * b
        s_maps = self._score_maps(s_rows, s_scores) if use_sparse else [{}] * b
        l_maps = self._score_maps(l_rows, l_scores) if use_learned else [{}] * b

        out: List[List[RetrievalResult]] = []
        n_sources = int(use_dense) + int(use_sparse) + int(use_learned)
        fused_is_real = n_sources >= 2
        for i in range(b):
            results: List[RetrievalResult] = []
            for row, score in zip(f_rows[i], f_scores[i]):
                if row < 0 or len(results) >= k:
                    continue
                chunk = self.registry.chunk_of(int(row))
                if chunk is None:
                    continue
                results.append(
                    RetrievalResult(
                        chunk=chunk,
                        dense_score=d_maps[i].get(int(row)),
                        sparse_score=s_maps[i].get(int(row)),
                        fused_score=float(score) if fused_is_real else None,
                        learned_score=l_maps[i].get(int(row)),
                    )
                )
            out.append(results)
        return out

    def _tri_one_dispatch(self, qvecs, padded_queries, cand: int,
                          fusion_strategy):
        """ONE-dispatch tri-hybrid candidates
        (:func:`trueno_rag_tpu.ops.hybrid.tri_query_arrays`) when every
        prerequisite holds: fp32 device matrix (no scan tier engaged),
        block-table BM25 layout, no tag filters (caller-checked), all
        three sources on. Returns None to fall back to the staged
        per-source path. Set ``retriever._tri_fused_dispatch = False``
        to force staging (A/B harnesses)."""
        if not getattr(self, "_tri_fused_dispatch", True):
            return None
        if not self.config.fused:
            # same documented switch the two-source path honors:
            # fused=False forces the staged per-source path (A/B runs)
            return None
        if self.vector_store._effective_tier() != "none":
            return None
        self.sparse_index._refresh_snapshot()
        snap = self.sparse_index._snap
        if snap["blocks"] is None:
            return None
        import jax.numpy as jnp

        from trueno_rag_tpu.ops.hybrid import tri_query_arrays

        self.vector_store._refresh_device()
        self.learned_index._refresh_snapshot()
        bids, blo, bhi = self.sparse_index._gather_blocks(padded_queries)
        q_terms, q_w = self.learned_encoder.expand_queries(list(padded_queries))
        lb, ll, lh, lw = self.learned_index._gather_blocks(
            np.asarray(q_terms), np.asarray(q_w)
        )
        weights = (
            tuple(fusion_strategy.resolve_weights(3))
            if fusion_strategy.kind in ("linear", "convex") else ()
        )
        return tri_query_arrays(
            jnp.asarray(qvecs),
            self.vector_store.device_matrix,
            self.vector_store.device_valid,
            jnp.asarray(bids), jnp.asarray(blo), jnp.asarray(bhi),
            snap["blocks"],
            jnp.asarray(lb), jnp.asarray(ll), jnp.asarray(lh),
            jnp.asarray(lw), self.learned_index._snap["blocks"],
            cand=cand,
            metric=self.vector_store.config.metric,
            fusion_kind=fusion_strategy.kind,
            fusion_param=fusion_strategy.device_param,
            fusion_weights=weights,
        )

    # -- per-source candidate stages (shared by the single-source and the
    # -- learned tri-hybrid paths) ----------------------------------------

    def _dense_candidates(self, qvecs, cand: int, masks):
        """Dense top-C candidates with the tag filter routed the same
        way the dense-only path always did: riding the scan kernel
        where supported, ops.tags.dense_topk_tagged otherwise."""
        if masks is not None and self.vector_store.supports_tagged_scan:
            # the filter rides the scan kernel (compact: certified
            # exact-filtered sets + filter-aware host patch; bf16
            # tile tier: exact with per-query tagged-fp32 fallback)
            return self.vector_store.search_arrays(qvecs, cand, tag_masks=masks)
        if masks is not None:
            import jax.numpy as jnp

            from trueno_rag_tpu.ops.tags import dense_topk_tagged

            self.vector_store._refresh_device()
            dm = self.vector_store.device_matrix
            return dense_topk_tagged(
                jnp.asarray(qvecs), dm, self.vector_store.device_valid,
                self._device_tag_bits(dm.shape[0]),
                jnp.asarray(masks[0]), jnp.asarray(masks[1]),
                jnp.asarray(masks[2]),
                min(cand, len(self.registry)),
                self.vector_store.config.metric,
            )
        return self.vector_store.search_arrays(qvecs, cand)

    def _sparse_candidates(self, padded_queries, cand: int, masks):
        """BM25 top-C candidates; tag filters drop disallowed rows
        post-top-k (slots are not refilled — same contract as the
        tagged one-dispatch path, ops/tags.py)."""
        s_scores, s_rows = self.sparse_index.search_arrays(padded_queries, cand)
        if masks is not None:
            import jax.numpy as jnp

            from trueno_rag_tpu.ops.tags import filter_candidates_by_tags

            bits = self._device_tag_bits(max(self.registry.capacity_rows, 1))
            s_rows, s_scores = filter_candidates_by_tags(
                jnp.asarray(s_rows), jnp.asarray(s_scores), bits,
                jnp.asarray(masks[0]), jnp.asarray(masks[1]),
                jnp.asarray(masks[2]),
            )
        return s_scores, s_rows

    def _learned_candidates(self, texts, cand: int, masks):
        """Learned-sparse top-C candidates; the allowed-row mask rides
        the weighted scoring op itself, so the filtered top-k is exact
        (not over-fetch-and-drop)."""
        q_terms, q_w = self.learned_encoder.expand_queries(texts)
        allowed = None
        if masks is not None:
            t_all, t_any, t_none = masks
            bits = self.registry.tag_bits_array(self.learned_index.capacity_rows)
            allowed = np.stack([
                ((bits & t_all[i]) == t_all[i])
                & ((t_any[i] == 0) | ((bits & t_any[i]) != 0))
                & ((bits & t_none[i]) == 0)
                for i in range(len(texts))
            ])
        return self.learned_index.search_arrays(
            q_terms, q_w, cand, allowed_rows=allowed
        )

    @staticmethod
    def _score_maps(rows, scores) -> List[Dict[int, float]]:
        rows = np.asarray(rows)
        scores = np.asarray(scores)
        maps: List[Dict[int, float]] = []
        for i in range(rows.shape[0]):
            maps.append(
                {int(r): float(s) for r, s in zip(rows[i], scores[i]) if r >= 0}
            )
        return maps

    def retrieve_batch_submit(self, queries: Sequence[str], k: int,
                              fusion: Optional[FusionStrategy] = None,
                              tag_filter=None):
        """Two-phase retrieval, phase 1: dispatch the device program and
        return WITHOUT waiting for results. Pass the returned handle to
        :meth:`retrieve_batch_collect` to fetch + exact-patch + hydrate.

        The split exists so a serving loop can overlap batch N's host
        work (the staged exact patch reads ``VectorStore._host`` in
        f64) with batch N+1's device scan — see
        :class:`trueno_rag_tpu.serve.MicroBatcher` ``pipeline_depth``.
        Contract: do not mutate the index between submit and collect
        (the patch must rescore the same rows the scan saw; the serve
        layer's ``mutate`` gate enforces this).

        The split applies on the fused compact path (JAX encoder +
        compact bf16r store, no tag filters). Every other configuration
        completes inline here and collect just unwraps the result, so
        callers can pipeline unconditionally."""
        from trueno_rag_tpu.models.encoder import JaxEncoderEmbedder

        splittable = (
            self.config.fused is not False
            and self.config.use_dense and self.config.use_sparse
            and self.learned_index is None
            and tag_filter is None
            and bool(queries)
            and len(self.registry) > 0
            and self.vector_store.is_compact
            and self.vector_store.config.compact_scan == "bf16r"
            and isinstance(self.embedder, JaxEncoderEmbedder)
        )
        if splittable:
            if any(not q.strip() for q in queries):
                raise QueryError("empty query")
            pre = self._fused_preamble(queries)
            out, ctx = self._fused_compact_submit(
                queries, k, *pre[:4], pre[4], fusion, None
            )
            return ("fused_compact", out, ctx)
        return (
            "done",
            self.retrieve_batch(queries, k, fusion=fusion,
                                tag_filter=tag_filter),
            None,
        )

    def retrieve_batch_collect(self, handle) -> List[List[RetrievalResult]]:
        """Two-phase retrieval, phase 2: host side of a
        :meth:`retrieve_batch_submit` dispatch (fetch, staged exact
        patch, hydration)."""
        kind, payload, ctx = handle
        if kind == "done":
            return payload
        return self._fused_compact_collect(payload, ctx)

    def _fused_preamble(self, queries: Sequence[str]):
        """Host half of the fused dispatch: tokenize (batch bucketed to
        a power of two), refresh the BM25 snapshot, and assemble the
        block gather lists. Returns (token_ids, bids, blo, bhi, snap)."""
        emb = self.embedder
        token_ids = emb.tokenizer.encode_batch(
            [emb.config.query_prefix + q for q in queries]
        )
        b_pad = 1  # power-of-two batch bucket (see retrieve_batch)
        while b_pad < len(queries):
            b_pad *= 2
        if b_pad != token_ids.shape[0]:
            token_ids = np.pad(token_ids, ((0, b_pad - token_ids.shape[0]), (0, 0)))
        self.sparse_index._refresh_snapshot()
        snap = self.sparse_index._snap
        if snap["blocks"] is None:
            raise QueryError(
                "fused path requires the block-table BM25 layout "
                "(corpus rows must stay below 2**24); use the staged path"
            )
        bids, blo, bhi = self.sparse_index._gather_blocks(
            list(queries) + ["\0"] * (b_pad - len(queries))
        )
        return token_ids, bids, blo, bhi, snap

    def retrieve_batch_fused(self, queries: Sequence[str], k: int,
                             fusion: Optional[FusionStrategy] = None,
                             tag_filter=None) -> List[List[RetrievalResult]]:
        """Fully fused query path (requires a JAX encoder embedder):
        tokenization and BM25 gather-list assembly on host, then ONE
        jitted program — encoder forward + dense scan + BM25 + fusion +
        top-k (:func:`trueno_rag_tpu.ops.hybrid.fused_hybrid_query`)."""
        from trueno_rag_tpu.models.encoder import JaxEncoderEmbedder
        from trueno_rag_tpu.ops.hybrid import fused_hybrid_query

        if not isinstance(self.embedder, JaxEncoderEmbedder):
            raise QueryError("fused path requires a JaxEncoderEmbedder")
        if not queries:
            return []
        if any(not q.strip() for q in queries):
            raise QueryError("empty query")
        if len(self.registry) == 0:
            return [[] for _ in queries]
        import jax.numpy as jnp

        emb = self.embedder
        token_ids, bids, blo, bhi, snap = self._fused_preamble(queries)
        b_pad = token_ids.shape[0]  # power-of-two batch bucket
        if self.vector_store.is_compact:
            return self._retrieve_batch_fused_compact(
                queries, k, token_ids, bids, blo, bhi, snap, fusion,
                tag_filter,
            )
        if tag_filter is not None:
            from trueno_rag_tpu.ops.tags import fused_hybrid_query_tagged

            masks = self._filter_masks(tag_filter, len(queries))
            if b_pad != len(queries):
                masks = tuple(np.pad(m, (0, b_pad - len(queries))) for m in masks)
            dm = self.vector_store.device_matrix
            f_rows, f_scores, d_rows, d_scores, s_rows, s_scores = (
                fused_hybrid_query_tagged(
                    emb.params,
                    jnp.asarray(token_ids),
                    dm,
                    self.vector_store.device_valid,
                    self._device_tag_bits(dm.shape[0]),
                    jnp.asarray(masks[0]), jnp.asarray(masks[1]),
                    jnp.asarray(masks[2]),
                    jnp.asarray(bids), jnp.asarray(blo), jnp.asarray(bhi),
                    snap["blocks"],
                    encoder_config=emb.encoder_config,
                    cand=self.config.candidates_per_source,
                    k=k,
                    metric=self.vector_store.config.metric,
                    fusion_kind=(fusion or self.config.fusion).kind,
                    fusion_param=(fusion or self.config.fusion).device_param,
                )
            )
        else:
            f_rows, f_scores, d_rows, d_scores, s_rows, s_scores = fused_hybrid_query(
                emb.params,
                jnp.asarray(token_ids),
                self.vector_store.device_matrix,
                self.vector_store.device_valid,
                jnp.asarray(bids), jnp.asarray(blo), jnp.asarray(bhi),
                snap["blocks"],
                encoder_config=emb.encoder_config,
                cand=self.config.candidates_per_source,
                k=k,
                metric=self.vector_store.config.metric,
                fusion_kind=(fusion or self.config.fusion).kind,
                fusion_param=(fusion or self.config.fusion).device_param,
            )
        f_rows = np.asarray(f_rows)
        f_scores = np.asarray(f_scores)
        d_maps = self._score_maps(d_rows, d_scores)
        s_maps = self._score_maps(s_rows, s_scores)
        out: List[List[RetrievalResult]] = []
        for i in range(len(queries)):
            results: List[RetrievalResult] = []
            for row, score in zip(f_rows[i], f_scores[i]):
                if row < 0:
                    continue
                chunk = self.registry.chunk_of(int(row))
                if chunk is not None:
                    results.append(
                        RetrievalResult(
                            chunk=chunk,
                            dense_score=d_maps[i].get(int(row)),
                            sparse_score=s_maps[i].get(int(row)),
                            fused_score=float(score),
                        )
                    )
            out.append(results)
        return out

    def _retrieve_batch_fused_compact(self, queries, k, token_ids, bids,
                                      blo, bhi, snap, fusion, tag_filter):
        """Fused one-program path over the COMPACT store (r4): encoder
        forward + certified compact scan + BM25 + fusion + top-k in one
        dispatch (:func:`trueno_rag_tpu.ops.hybrid.fused_hybrid_query_compact`
        — no fp32 matrix in HBM). Uncertified queries keep the exact
        contract: their dense candidates resolve through the staged
        exact patch (containment → widened retry → GEMM) using the
        program's own encoder outputs and candidate returns, and ONLY
        those queries re-fuse on the host fusion oracle — certified
        queries never leave the device program."""
        out, ctx = self._fused_compact_submit(
            queries, k, token_ids, bids, blo, bhi, snap, fusion, tag_filter
        )
        return self._fused_compact_collect(out, ctx)

    def _fused_compact_submit(self, queries, k, token_ids, bids, blo,
                              bhi, snap, fusion, tag_filter):
        """DEVICE half of the fused compact retrieval: one program
        dispatch, no host sync. Returns (device outputs, ctx) for
        :meth:`_fused_compact_collect` — the seam the pipelined serving
        loop uses to overlap batch N's host patch with batch N+1's
        device scan (r4 verdict #2)."""
        import jax
        import jax.numpy as jnp

        from trueno_rag_tpu.ops.hybrid import fused_hybrid_query_compact

        if tag_filter is not None:
            raise QueryError(
                "the fused compact path does not support tag filters; "
                "use the staged path (fused=None)"
            )
        emb = self.embedder
        store = self.vector_store
        if store.config.compact_scan != "bf16r":
            # fused_hybrid_query_compact takes the 6-array bf16r tier
            # positionally; the bf16 (3-array) and int8 (7-array)
            # layouts would misalign its signature
            raise QueryError(
                "the fused compact path requires compact_scan='bf16r' "
                f"(store has {store.config.compact_scan!r}); "
                "use the staged path (fused=None)"
            )
        store._refresh_device()  # materialize the compact replicas
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
        cand = self.config.candidates_per_source
        strategy = fusion or self.config.fusion
        out = fused_hybrid_query_compact(
            emb.params, jnp.asarray(token_ids), *store._tier,
            store._device_valid, jnp.asarray(bids), jnp.asarray(blo),
            jnp.asarray(bhi), snap["blocks"],
            encoder_config=emb.encoder_config, cand=cand, k=k,
            metric=store.config.metric, fusion_kind=strategy.kind,
            fusion_param=strategy.device_param,
            tile_n=store.config.scan_tile_n, interpret=interpret,
        )
        return out, (list(queries), k, cand, strategy, interpret)

    def _fused_compact_collect(self, out, ctx):
        """HOST half of the fused compact retrieval: grouped result
        fetch, staged exact patch for uncertified queries (reads the
        real ``VectorStore._host``), host re-fusion of patched rows,
        hydration. Touches no device state besides fetching ``out`` and
        dispatching the bounded patch retry."""
        import jax

        queries, k, cand, strategy, interpret = ctx
        store = self.vector_store
        (f_rows_d, f_scores_d, d_rows_d, d_scores_d, s_rows_d, s_scores_d,
         ok_d, cand_rows_d, thr_d, qvecs_d) = out
        b = len(queries)
        # ONE grouped async fetch of the arrays every batch consumes
        # (~200 KB at B=256) — per-array np.asarray paid a device sync
        # per array, which over a tunneled link is a full RTT each. The
        # patch inputs (cand_rows/thr/qvecs — ~4x the bytes) transfer
        # ONLY when certification failed for some query.
        f_rows, f_scores, d_rows, d_scores, s_rows, s_scores, ok_np = (
            jax.device_get((f_rows_d, f_scores_d, d_rows_d, d_scores_d,
                            s_rows_d, s_scores_d, ok_d))
        )
        # writable copies: the patch below re-fuses rows in place
        f_rows = np.array(f_rows)
        f_scores = np.array(f_scores)
        ok_np = ok_np[:b]
        d_maps = self._score_maps(d_rows, d_scores)
        s_maps = self._score_maps(s_rows, s_scores)
        if not ok_np.all():
            cand_rows, thr, qvecs = jax.device_get(
                (cand_rows_d, thr_d, qvecs_d)
            )
            store.compact_uncertified += int((~ok_np).sum())
            pad = d_rows.shape[0] - b
            ok_pad = np.concatenate([ok_np, np.ones(pad, bool)])
            d_s_np, d_r_np = store._compact_exact_patch(
                qvecs, d_scores,
                d_rows, ok_pad, cand,
                cand_rows, thr,
                None, interpret,
                containment_retry=store.config.compact_retry is not False,
            )
            store.tier_fallbacks += 1
            # re-fuse ONLY the patched queries with the host oracle
            # (exact reference fusion semantics over the exact dense
            # list + the device BM25 list)
            s_rows_np = s_rows
            s_scores_np = s_scores
            for qi in np.flatnonzero(~ok_np):
                dense_list = [
                    (int(r), float(s))
                    for r, s in zip(d_r_np[qi], d_s_np[qi]) if r >= 0
                ]
                sparse_list = [
                    (int(r), float(s))
                    for r, s in zip(s_rows_np[qi], s_scores_np[qi]) if r >= 0
                ]
                fused = strategy.fuse(dense_list, sparse_list)[:k]
                f_rows[qi, :] = -1
                f_scores[qi, :] = float("-inf")
                for j, (rid, sc) in enumerate(fused):
                    f_rows[qi, j] = rid
                    f_scores[qi, j] = sc
                d_maps[qi] = dict(dense_list)
        out_res: List[List[RetrievalResult]] = []
        for i in range(b):
            results: List[RetrievalResult] = []
            for row, score in zip(f_rows[i], f_scores[i]):
                if row < 0:
                    continue
                chunk = self.registry.chunk_of(int(row))
                if chunk is not None:
                    results.append(
                        RetrievalResult(
                            chunk=chunk,
                            dense_score=d_maps[i].get(int(row)),
                            sparse_score=s_maps[i].get(int(row)),
                            fused_score=float(score),
                        )
                    )
            out_res.append(results)
        return out_res

    def retrieve_dense(self, query: str, k: int) -> List[RetrievalResult]:
        """Vector-only retrieval (reference: retrieve.rs:225-240)."""
        qvec = self.embedder.embed_query(query)
        hits = self.vector_store.search(qvec, k)
        return [
            RetrievalResult(chunk=self.vector_store.get(cid), dense_score=s)
            for cid, s in hits
            if self.vector_store.get(cid) is not None
        ]

    def retrieve_sparse(self, query: str, k: int) -> List[RetrievalResult]:
        """BM25-only retrieval (reference: retrieve.rs:242-257)."""
        hits = self.sparse_index.search(query, k)
        return [
            RetrievalResult(chunk=self.registry.get_chunk(cid), sparse_score=s)
            for cid, s in hits
            if self.registry.get_chunk(cid) is not None
        ]

    def __len__(self) -> int:
        return len(self.registry)


# ---------------------------------------------------------------------------
# Single-source conveniences (reference: retrieve.rs:265-341)
# ---------------------------------------------------------------------------


class DenseRetriever:
    def __init__(self, embedder: Embedder, vector_config: Optional[VectorStoreConfig] = None) -> None:
        self.embedder = embedder
        self.store = VectorStore(vector_config or VectorStoreConfig(dimension=embedder.dimension))

    def index(self, chunk: Chunk) -> None:
        self.store.insert(chunk)

    def index_batch(self, chunks: Sequence[Chunk]) -> None:
        self.store.insert_many(chunks)

    def retrieve(self, query: str, k: int) -> List[RetrievalResult]:
        qvec = self.embedder.embed_query(query)
        return [
            RetrievalResult(chunk=self.store.get(cid), dense_score=s)
            for cid, s in self.store.search(qvec, k)
        ]

    def __len__(self) -> int:
        return len(self.store)


class SparseRetriever:
    """BM25-only retriever with its own chunk registry, so sparse-only
    deployments work standalone (reference: retrieve.rs:299-341)."""

    def __init__(self) -> None:
        self.index_ = BM25Index()

    def index(self, chunk: Chunk) -> None:
        self.index_.add(chunk)

    def index_batch(self, chunks: Sequence[Chunk]) -> None:
        self.index_.add_batch(chunks)

    def retrieve(self, query: str, k: int) -> List[RetrievalResult]:
        return [
            RetrievalResult(chunk=self.index_.registry.get_chunk(cid), sparse_score=s)
            for cid, s in self.index_.search(query, k)
        ]

    def __len__(self) -> int:
        return len(self.index_)
