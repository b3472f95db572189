"""Learned-sparse posting index: host-mutable integer-term postings
with weighted device block-gather scoring.

The sibling of :class:`~trueno_rag_tpu.index.bm25.BM25Index` for
SPLADE-class expansion models (`models/splade.py`). Differences that
matter:

- terms are MODEL-VOCABULARY INTEGERS, not surface strings — the
  expansion model owns tokenization/expansion, the index only stores
  (term_id → {row: weight});
- the per-posting payload is a learned f32 weight, not a term
  frequency; scoring is ``Σ_t q_w[t] · d_w[d, t]`` with the query-side
  weight applied on device (`ops/bm25.weighted_topk_blocks`), so the
  block table is reusable across queries;
- there is no df/avgdl statistics machinery — the model learned its own
  term weighting at training time.

Same execution plan as BM25 otherwise: host mutates dicts, a CSR
snapshot + block table pushes to device lazily on the dirty flag, and
`search_host` is the scalar oracle tests pin the device path against.
The reference has no learned-sparse retrieval at all (index.rs:30-280
is its only sparse path).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from trueno_rag_tpu.chunking import Chunk
from trueno_rag_tpu.errors import VectorStoreError
from trueno_rag_tpu.index.base import ChunkRegistry
from trueno_rag_tpu.ops.bm25 import BLOCK_LEN, bucket_len


class LearnedSparseIndex:
    def __init__(self, registry: Optional[ChunkRegistry] = None) -> None:
        self._owns_registry = registry is None
        self.registry = ChunkRegistry() if registry is None else registry
        # term_id -> {row: weight}
        self._postings: Dict[int, Dict[int, float]] = {}
        # row -> term ids indexed for that row (O(terms) removal)
        self._row_terms: Dict[int, np.ndarray] = {}
        self._dirty = True
        self._snap = None

    # -- mutation ------------------------------------------------------------

    def add(self, chunk: Chunk, terms: np.ndarray, weights: np.ndarray) -> None:
        """Store one chunk's expansion — ``terms [T] int32`` /
        ``weights [T] f32`` with the ``-1``-term / non-positive-weight
        slots ignored (the splade_topt convention). Negative weights on
        live terms are rejected: the candidate-space segment-sum
        scoring is only exact for non-negative contributions."""
        self.add_batch([chunk], np.asarray(terms)[None], np.asarray(weights)[None])

    def add_batch(
        self,
        chunks: Sequence[Chunk],
        terms: np.ndarray,  # [N, T] int32
        weights: np.ndarray,  # [N, T] f32
    ) -> None:
        terms = np.asarray(terms, np.int64)
        weights = np.asarray(weights, np.float32)
        if terms.shape != weights.shape or terms.shape[0] != len(chunks):
            raise VectorStoreError("terms/weights shapes do not match chunks")
        live_neg = (terms >= 0) & (weights < 0.0)
        if live_neg.any():
            raise VectorStoreError(
                "learned-sparse weights must be non-negative "
                "(segment-sum scoring exactness)"
            )
        # replacement clears the old expansion first (the registry swap
        # would otherwise strand the previous postings)
        for c in chunks:
            row = self.registry.row_of(c.id)
            if row is not None and row in self._row_terms:
                self._remove_row(row)
        rows = self.registry.add_batch(list(chunks))
        for i, row in enumerate(rows):
            live = (terms[i] >= 0) & (weights[i] > 0.0)
            t_live = terms[i][live]
            w_live = weights[i][live]
            # a duplicated term id keeps its max weight (defensive; the
            # top-k sparsifier never emits duplicates)
            for t, w in zip(t_live.tolist(), w_live.tolist()):
                plist = self._postings.setdefault(int(t), {})
                prev = plist.get(row)
                plist[row] = float(w) if prev is None else max(prev, float(w))
            self._row_terms[row] = np.unique(t_live)
        self._dirty = True

    def load_rows(
        self,
        chunks: Sequence[Chunk],
        indptr: np.ndarray,  # [M+1] int64 — per-chunk expansion extents
        terms: np.ndarray,  # [P] int32
        weights: np.ndarray,  # [P] f32
    ) -> None:
        """Bulk-restore a ragged-CSR expansion set (the persistence load
        path): O(P) dict writes, weight bytes untouched. Rows allocate
        sequentially on a fresh registry, so saved order == row order."""
        indptr = np.asarray(indptr, np.int64)
        terms = np.asarray(terms, np.int64)
        weights = np.asarray(weights, np.float32)
        if len(indptr) != len(chunks) + 1 or int(indptr[-1]) != len(terms):
            raise VectorStoreError("indptr does not match chunks/terms")
        if len(terms) != len(weights):
            raise VectorStoreError("terms/weights lengths differ")
        rows = self.registry.add_batch(list(chunks))
        for i, row in enumerate(rows):
            lo, hi = int(indptr[i]), int(indptr[i + 1])
            if row in self._row_terms:  # duplicate id within the restore
                self._remove_row(row)
            for j in range(lo, hi):
                self._postings.setdefault(int(terms[j]), {})[row] = float(weights[j])
            self._row_terms[row] = np.unique(terms[lo:hi])
        self._dirty = True

    def _remove_row(self, row: int) -> None:
        for t in self._row_terms.pop(row, ()):  # noqa: B020
            plist = self._postings.get(int(t))
            if plist is not None:
                plist.pop(row, None)
                if not plist:
                    del self._postings[int(t)]  # empty-term GC

    def remove(self, chunk_id: str) -> bool:
        row = self.registry.row_of(chunk_id)
        if row is None or row not in self._row_terms:
            return False
        self._remove_row(row)
        if self._owns_registry:
            self.registry.remove(chunk_id)
        self._dirty = True
        return True

    def __len__(self) -> int:
        return len(self._row_terms)

    def is_empty(self) -> bool:
        return not self._row_terms

    @property
    def capacity_rows(self) -> int:
        return self.registry.capacity_rows

    # -- device snapshot -------------------------------------------------------

    def ensure_ready(self) -> None:
        self._refresh_snapshot()

    def _refresh_snapshot(self) -> None:
        if not self._dirty and self._snap is not None:
            return
        from trueno_rag_tpu.ops.bm25 import pack_weighted_blocks

        term_ids = sorted(self._postings.keys())
        tindex = {t: i for i, t in enumerate(term_ids)}
        sizes = [len(self._postings[t]) for t in term_ids]
        indptr = np.zeros(len(term_ids) + 1, dtype=np.int64)
        np.cumsum(sizes, out=indptr[1:])
        total = int(indptr[-1])
        rows = np.zeros(max(total, 1), dtype=np.int32)
        w = np.zeros(max(total, 1), dtype=np.float32)
        for t in term_ids:
            lo = indptr[tindex[t]]
            plist = sorted(self._postings[t].items())  # row-asc determinism
            for j, (row, wt) in enumerate(plist):
                rows[lo + j] = row
                w[lo + j] = wt
        self._snap = {
            "tindex": tindex,
            "indptr": indptr,
            "blocks": pack_weighted_blocks(rows, w),
        }
        self._dirty = False

    def _gather_blocks(self, q_terms: np.ndarray, q_weights: np.ndarray):
        """Compile expanded queries into (block, lo, hi, weight) slots
        over the block table — BLOCK_LEN-aligned like BM25's
        _gather_blocks, plus the slot's query weight (a term spanning
        several blocks repeats its weight per slot)."""
        snap = self._snap
        indptr = snap["indptr"]
        tindex = snap["tindex"]
        sentinel = int(indptr[-1]) // BLOCK_LEN  # always-masked padding block
        per_query: List[List[Tuple[int, int, int, float]]] = []
        max_slots = 1
        for terms, weights in zip(q_terms, q_weights):
            slots: List[Tuple[int, int, int, float]] = []
            for t, wq in zip(terms.tolist(), weights.tolist()):
                if t < 0 or wq <= 0.0:
                    continue
                tid = tindex.get(int(t))
                if tid is None:
                    continue
                t_lo, t_hi = int(indptr[tid]), int(indptr[tid + 1])
                if t_hi <= t_lo:
                    continue
                for blk in range(t_lo // BLOCK_LEN, (t_hi - 1) // BLOCK_LEN + 1):
                    base = blk * BLOCK_LEN
                    slots.append(
                        (blk, max(t_lo - base, 0), min(t_hi - base, BLOCK_LEN), wq)
                    )
            per_query.append(slots)
            max_slots = max(max_slots, len(slots))
        S = bucket_len(max_slots, minimum=64)  # compile-key floor (bm25.py)
        B = len(per_query)
        bids = np.full((B, S), sentinel, dtype=np.int32)
        lo = np.zeros((B, S), dtype=np.int32)
        hi = np.zeros((B, S), dtype=np.int32)
        qw = np.zeros((B, S), dtype=np.float32)
        for i, slots in enumerate(per_query):
            for j, (blk, l, h, wq) in enumerate(slots[:S]):
                bids[i, j] = blk
                lo[i, j] = l
                hi[i, j] = h
                qw[i, j] = wq
        return bids, lo, hi, qw

    def search_arrays(
        self,
        q_terms: np.ndarray,  # [B, T] int32 (-1 invalid)
        q_weights: np.ndarray,  # [B, T] f32
        k: int,
        allowed_rows: Optional[np.ndarray] = None,  # [N] or [B, N] bool
    ):
        """Device-level batched search → ``(scores [B,k] f32,
        rows [B,k] i32)`` with the (score desc, row asc) / ``-1`` /
        ``-inf`` contract; only scores > 0 return (no shared expansion
        term ⇒ not a hit). ``allowed_rows`` rides the scoring op —
        exact filtered top-k."""
        from trueno_rag_tpu.ops.bm25 import weighted_topk_blocks

        self._refresh_snapshot()
        bids, lo, hi, qw = self._gather_blocks(
            np.asarray(q_terms), np.asarray(q_weights)
        )
        allowed = None
        if allowed_rows is not None:
            allowed = jnp.asarray(np.asarray(allowed_rows, bool))
        s, r = weighted_topk_blocks(
            jnp.asarray(bids), jnp.asarray(lo), jnp.asarray(hi),
            jnp.asarray(qw), self._snap["blocks"], k=k, allowed=allowed,
        )
        return np.asarray(s), np.asarray(r)

    def search_host(
        self,
        q_terms: np.ndarray,  # [T] int32
        q_weights: np.ndarray,  # [T] f32
        k: int,
    ) -> List[Tuple[int, float]]:
        """Scalar oracle: candidate union → per-row weighted sum →
        score>0 filter → (score desc, row asc) → truncate. Returns
        (row, score) pairs."""
        cand: Dict[int, float] = {}
        for t, wq in zip(np.asarray(q_terms).tolist(), np.asarray(q_weights).tolist()):
            if t < 0 or wq <= 0.0:
                continue
            for row, wd in self._postings.get(int(t), {}).items():
                cand[row] = cand.get(row, 0.0) + wq * wd
        ranked = sorted(
            ((r, s) for r, s in cand.items() if s > 0.0),
            key=lambda kv: (-kv[1], kv[0]),
        )
        return ranked[:k]

    # -- persistence hooks -----------------------------------------------------

    def state_dict(self) -> Dict[str, object]:
        return {
            "postings": {
                str(t): {str(r): float(w) for r, w in p.items()}
                for t, p in self._postings.items()
            },
            "row_terms": {
                str(r): [int(t) for t in ts] for r, ts in self._row_terms.items()
            },
        }

    def load_state_dict(self, d: Dict[str, object]) -> None:
        self._postings = {
            int(t): {int(r): float(w) for r, w in p.items()}
            for t, p in d["postings"].items()
        }
        self._row_terms = {
            int(r): np.asarray(sorted(ts), dtype=np.int64)
            for r, ts in d["row_terms"].items()
        }
        self._dirty = True
