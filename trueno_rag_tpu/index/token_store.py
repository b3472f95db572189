"""Multi-vector (late-interaction) token index: a device-resident
``[N, Lt, H]`` per-chunk token-embedding store with exact MaxSim top-k
search and an optional certified token-pruned tier.

The reference has no multi-vector retrieval of any kind (its dense path
is one vector per chunk scanned brute-force, index.rs:321-437); this is
a TPU-native capability extension — ColBERT-class retrieval where the
interaction is MXU matmuls over a padded token tensor instead of a
pointer-chasing inverted token index. It mirrors
:class:`~trueno_rag_tpu.index.vector_store.VectorStore`'s contracts:

- a shared :class:`~trueno_rag_tpu.index.base.ChunkRegistry` maps chunk
  ids to stable dense rows; removed rows become tombstones and recycle;
- search returns ``(score desc, row asc)``-ordered valid hits;
- the device replica refreshes lazily on mutation;
- every device op has a host oracle and the pruned tier is
  certified-exact with per-query fallback (``ops/maxsim.py``).

Storage cost is inherently ``Lt``× the single-vector store — this tier
exists for the quality band between bi-encoder retrieval and
cross-encoder reranking, at corpus sizes where ``N·Lt·H`` tokens fit
HBM (bf16 storage halves that; exactness is then defined over the
stored bf16 values, the framework's storage-dtype contract).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from trueno_rag_tpu.chunking import Chunk
from trueno_rag_tpu.errors import (
    DimensionMismatchError,
    InvalidConfigError,
    VectorStoreError,
)
from trueno_rag_tpu.index.base import ChunkRegistry
from trueno_rag_tpu.ops.maxsim import (
    maxsim_scan_topk,
    maxsim_topk_int8,
    maxsim_topk_int8_fused,
    maxsim_topk_scan16,
    maxsim_topk_scan16_fused,
    maxsim_topk_token_pruned,
    prepare_maxsim_int8,
    prepare_maxsim_scan16,
    prepare_maxsim_self16,
)


@dataclass
class TokenStoreConfig:
    """Configuration for :class:`TokenVectorStore`.

    ``scan`` picks the search strategy:

    - ``"exact"`` (default): blockwise full MaxSim scan — linear in the
      corpus, MXU-bound, always exact.
    - ``"token"``: the certified token-pruned tier
      (ops/maxsim.maxsim_topk_token_pruned) — exact top-``t_hits``
      token matches generate candidates and a sound exclusion
      threshold; certified queries are provably the full-corpus exact
      top-k, uncertified queries re-run on the exact scan
      (fail-closed; counted in :attr:`TokenVectorStore.uncertified`).
    - ``"tiered"``: the certified quantized-scan tier
      (ops/maxsim.maxsim_topk_scan16 / maxsim_topk_int8) — the scan
      streams a bf16 or int8 replica (2x/4x fewer bytes than the fp32
      exact scan, which is bandwidth-bound), candidates are exactly
      rescored from PRIMARY storage, and the certificate keeps the
      primary dtype's exactness contract; uncertified queries fall
      back to the exact scan. ``scan_dtype`` picks the replica:
      ``"auto"`` (default) resolves to int8 when the primary storage
      is already bf16 (the only dtype that still cuts bytes) and bf16
      otherwise.
    """

    hidden_dim: int = 384
    max_tokens: int = 32
    # "float32" | "bfloat16" — the device storage dtype. bf16 halves
    # HBM; search and certificates are then exact over the STORED bf16
    # values (upcast to f32 in all score math).
    storage_dtype: str = "float32"
    scan: str = "exact"
    scan_dtype: str = "auto"  # tiered replica: auto | bfloat16 | int8
    # "fused" routes the bf16 tiered scan through the Pallas kernel
    # (ops/pallas/maxsim_scan.py — the interaction tensor never leaves
    # VMEM; interpret-mode off-TPU); "xla" keeps the blockwise lax.scan
    # program. The certificate contract is identical either way (the
    # fused bound is slightly wider: it quantizes the query too).
    scan_kernel: str = "fused"
    t_hits: int = 256
    rescore: int = 256
    scan_block: int = 512
    initial_capacity: int = 256
    # L2-normalize tokens at insert (cosine MaxSim, the ColBERT v1
    # choice). Zero tokens stay zero.
    normalize: bool = True

    def __post_init__(self) -> None:
        if self.storage_dtype not in ("float32", "bfloat16"):
            raise InvalidConfigError(
                f"storage_dtype must be float32|bfloat16, got {self.storage_dtype!r}"
            )
        if self.scan not in ("exact", "token", "tiered"):
            raise InvalidConfigError(
                f"scan must be exact|token|tiered, got {self.scan!r}"
            )
        if self.scan_dtype not in ("auto", "bfloat16", "int8"):
            raise InvalidConfigError(
                f"scan_dtype must be auto|bfloat16|int8, got {self.scan_dtype!r}"
            )
        if self.scan_kernel not in ("fused", "xla"):
            raise InvalidConfigError(
                f"scan_kernel must be fused|xla, got {self.scan_kernel!r}"
            )
        if self.rescore < 1 or self.t_hits < 1:
            raise InvalidConfigError("t_hits and rescore must be positive")

    def resolved_scan_dtype(self) -> str:
        """The tiered replica dtype ``"auto"`` resolves to: int8 when
        the primary storage is already bf16 (a bf16 replica would read
        the same bytes as the exact scan), bf16 otherwise."""
        if self.scan_dtype != "auto":
            return self.scan_dtype
        return "int8" if self.storage_dtype == "bfloat16" else "bfloat16"


class TokenVectorStore:
    def __init__(
        self,
        config: Optional[TokenStoreConfig] = None,
        registry: Optional[ChunkRegistry] = None,
    ) -> None:
        self.config = config or TokenStoreConfig()
        self._owns_registry = registry is None
        self.registry = ChunkRegistry() if registry is None else registry
        cap = self.config.initial_capacity
        lt, h = self.config.max_tokens, self.config.hidden_dim
        self._host = np.zeros((cap, lt, h), dtype=np.float32)
        self._t_mask = np.zeros((cap, lt), dtype=bool)
        self._valid = np.zeros((cap,), dtype=bool)
        self._count = 0
        self._dirty = True
        self._dev = None  # (tokens, t_mask, valid) device replicas
        self._tier = None  # tiered-scan replica pack (lazy)
        self.uncertified = 0  # pruned-tier queries past the certificate

    # -- mutation ------------------------------------------------------------

    def _check_tokens(self, chunk_id: str, tokens: np.ndarray) -> np.ndarray:
        t = np.asarray(tokens, dtype=np.float32)
        if t.ndim != 2 or t.shape[1] != self.config.hidden_dim:
            raise DimensionMismatchError(
                self.config.hidden_dim, int(t.shape[-1]) if t.ndim else 0
            )
        if t.shape[0] == 0:
            raise VectorStoreError(f"chunk {chunk_id} has no token vectors")
        return t[: self.config.max_tokens]

    def insert(
        self,
        chunk: Chunk,
        tokens: np.ndarray,  # [L, H] float
        mask: Optional[np.ndarray] = None,  # [L] bool; default all-true
    ) -> None:
        """Store ``chunk`` with its per-token vectors. ``L`` beyond
        ``max_tokens`` is truncated (the tokenizer-side cap); shorter
        rows are padding-masked."""
        t = self._check_tokens(chunk.id, tokens)
        m = (
            np.ones((t.shape[0],), bool)
            if mask is None
            else np.asarray(mask, bool)[: self.config.max_tokens][: t.shape[0]]
        )
        if self.config.normalize:
            norms = np.sqrt(np.einsum("ij,ij->i", t, t))[:, None]
            t = t / np.where(norms > 0.0, norms, 1.0)
        row = self.registry.add(chunk)
        self._ensure_capacity(row + 1)
        if not self._valid[row]:
            self._count += 1
        self._host[row] = 0.0
        self._host[row, : t.shape[0]] = t
        self._t_mask[row] = False
        self._t_mask[row, : m.shape[0]] = m
        self._valid[row] = True
        self._dirty = True

    def insert_many(
        self,
        chunks: Sequence[Chunk],
        token_mats: Sequence[np.ndarray],
        masks: Optional[Sequence[np.ndarray]] = None,
    ) -> None:
        if len(chunks) != len(token_mats):
            raise VectorStoreError("chunks and token_mats lengths differ")
        if masks is not None and len(masks) != len(chunks):
            raise VectorStoreError("masks length differs from chunks")
        # validate everything before any mutation (atomic like
        # VectorStore.insert_many)
        for c, t in zip(chunks, token_mats):
            self._check_tokens(c.id, t)
        for i, (c, t) in enumerate(zip(chunks, token_mats)):
            self.insert(c, t, None if masks is None else masks[i])

    def load_rows(
        self,
        chunks: Sequence[Chunk],
        tokens: np.ndarray,  # [M, Lt, H] float32 (already normalized)
        t_mask: np.ndarray,  # [M, Lt] bool
    ) -> None:
        """Bulk-restore pre-normalized rows (the persistence load path):
        token bytes round-trip EXACTLY — no re-normalization, whose
        sqrt/divide rounding would perturb stored values. Rows allocate
        sequentially, so saved index i == store row i on a fresh
        store."""
        tokens = np.asarray(tokens, np.float32)
        t_mask = np.asarray(t_mask, bool)
        lt, h = self.config.max_tokens, self.config.hidden_dim
        if tokens.shape != (len(chunks), lt, h) or t_mask.shape != (len(chunks), lt):
            raise VectorStoreError("token/mask shapes do not match the config")
        rows = np.asarray(self.registry.add_batch(list(chunks)), dtype=np.int64)
        self._ensure_capacity(int(rows.max()) + 1 if len(rows) else 0)
        uniq = np.unique(rows)
        self._count += int(np.count_nonzero(~self._valid[uniq]))
        self._host[rows] = tokens
        self._t_mask[rows] = t_mask
        self._valid[rows] = True
        self._dirty = True

    def remove(self, chunk_id: str) -> bool:
        row = self.registry.row_of(chunk_id)
        if row is None or not self._valid[row]:
            return False
        if self._owns_registry:
            self.registry.remove(chunk_id)
        self._host[row] = 0.0
        self._t_mask[row] = False
        self._valid[row] = False
        self._count -= 1
        self._dirty = True
        return True

    def _ensure_capacity(self, rows: int) -> None:
        cap = self._host.shape[0]
        if rows <= cap:
            return
        new_cap = max(cap * 2, rows)
        lt, h = self.config.max_tokens, self.config.hidden_dim
        host = np.zeros((new_cap, lt, h), dtype=np.float32)
        host[:cap] = self._host
        tm = np.zeros((new_cap, lt), dtype=bool)
        tm[:cap] = self._t_mask
        valid = np.zeros((new_cap,), dtype=bool)
        valid[:cap] = self._valid
        self._host, self._t_mask, self._valid = host, tm, valid
        self._dirty = True

    # -- device replica --------------------------------------------------------

    def _device(self):
        if self._dirty or self._dev is None:
            dtype = jnp.bfloat16 if self.config.storage_dtype == "bfloat16" else jnp.float32
            self._dev = (
                jnp.asarray(self._host, dtype=dtype),
                jnp.asarray(self._t_mask),
                jnp.asarray(self._valid),
            )
            self._dirty = False
            self._tier = None  # replica follows the primary
        return self._dev

    def _device_tier(self):
        """Lazy tiered-scan replica pack, rebuilt on-device whenever the
        primary replica refreshes. The pack quantizes the STORED values
        (bf16 primary → the residuals are measured against bf16), so
        the tier's certificate is exact over primary storage."""
        tokens, t_mask, _ = self._device()
        if self._tier is None:
            if self.config.resolved_scan_dtype() == "int8":
                self._tier = ("int8",) + tuple(
                    prepare_maxsim_int8(tokens, t_mask)
                )
            elif self.config.storage_dtype == "bfloat16":
                # bf16 primary + bf16 tier: the replica IS the primary
                # (zero residual, no corpus-scale copy) — only the norm
                # bound is computed
                e_max, n_max = prepare_maxsim_self16(tokens, t_mask)
                self._tier = ("bfloat16", tokens, e_max, n_max)
            else:
                self._tier = ("bfloat16",) + tuple(
                    prepare_maxsim_scan16(tokens, t_mask)
                )
        return self._tier

    # -- search ------------------------------------------------------------------

    def search_arrays(
        self,
        q_tok: np.ndarray,  # [B, Lq, H] float32
        q_mask: Optional[np.ndarray] = None,  # [B, Lq] bool
        k: int = 10,
        allowed_rows: Optional[np.ndarray] = None,  # [cap] bool extra filter
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched MaxSim top-k → ``(scores [B,k] f32, rows [B,k] i32)``
        with the framework's ``-1``/``-inf`` invalid-slot convention.
        ``allowed_rows`` (e.g. a resolved tag filter) joins the
        tombstone mask, so both tiers search the FILTERED corpus
        exactly."""
        q = np.asarray(q_tok, np.float32)
        if q.ndim != 3 or q.shape[2] != self.config.hidden_dim:
            raise DimensionMismatchError(
                self.config.hidden_dim, int(q.shape[-1]) if q.ndim else 0
            )
        if self.config.normalize:
            norms = np.sqrt(np.einsum("bij,bij->bi", q, q))[:, :, None]
            q = q / np.where(norms > 0.0, norms, 1.0)
        b, lq = q.shape[0], q.shape[1]
        qm = (
            np.ones((b, lq), bool) if q_mask is None else np.asarray(q_mask, bool)
        )
        tokens, t_mask, valid = self._device()
        if allowed_rows is not None:
            allowed = np.asarray(allowed_rows, bool)
            if allowed.shape[0] != self._host.shape[0]:
                raise VectorStoreError(
                    "allowed_rows must cover the store's capacity rows"
                )
            valid = jnp.logical_and(valid, jnp.asarray(allowed))
        qd, qmd = jnp.asarray(q), jnp.asarray(qm)

        if self.config.scan == "token":
            s, r, cert = maxsim_topk_token_pruned(
                qd, qmd, tokens, t_mask, valid, k,
                t_hits=self.config.t_hits,
                rescore=max(self.config.rescore, k),
            )
            s, r = self._patch_uncertified(
                s, r, cert, qd, qmd, tokens, t_mask, valid, k
            )
        elif self.config.scan == "tiered":
            tier = self._device_tier()
            fused = self.config.scan_kernel == "fused"
            if fused:
                import jax

                # Pallas TPU kernels need interpret mode off-TPU
                interpret = jax.devices()[0].platform not in ("tpu", "axon")
            if tier[0] == "int8":
                _, tok8, s_tok, e_max, n_max = tier
                if fused:
                    s, r, cert = maxsim_topk_int8_fused(
                        qd, qmd, tokens, t_mask, tok8, s_tok, e_max,
                        n_max, valid, k,
                        rescore=max(self.config.rescore, k),
                        interpret=interpret,
                    )
                else:
                    s, r, cert = maxsim_topk_int8(
                        qd, qmd, tokens, t_mask, tok8, s_tok, e_max,
                        n_max, valid, k,
                        rescore=max(self.config.rescore, k),
                        block=self.config.scan_block,
                    )
            else:
                _, tok16, e_max, n_max = tier
                if fused:
                    s, r, cert = maxsim_topk_scan16_fused(
                        qd, qmd, tokens, t_mask, tok16, e_max, n_max,
                        valid, k, rescore=max(self.config.rescore, k),
                        interpret=interpret,
                    )
                else:
                    s, r, cert = maxsim_topk_scan16(
                        qd, qmd, tokens, t_mask, tok16, e_max, n_max,
                        valid, k, rescore=max(self.config.rescore, k),
                        block=self.config.scan_block,
                    )
            s, r = self._patch_uncertified(
                s, r, cert, qd, qmd, tokens, t_mask, valid, k
            )
        else:
            s, r = maxsim_scan_topk(
                qd, qmd, tokens, t_mask, valid, k, self.config.scan_block
            )
        return np.asarray(s), np.asarray(r)

    def _patch_uncertified(
        self, s, r, cert, qd, qmd, tokens, t_mask, valid, k
    ):
        """Fail-closed: uncertified queries re-run on the exact scan
        (certified results are provably identical to it); misses are
        counted in :attr:`uncertified`."""
        cert_np = np.asarray(cert)
        if not cert_np.all():
            self.uncertified += int((~cert_np).sum())
            s_e, r_e = maxsim_scan_topk(
                qd, qmd, tokens, t_mask, valid, k, self.config.scan_block
            )
            s = jnp.where(cert[:, None], s, s_e)
            r = jnp.where(cert[:, None], r, r_e)
        return s, r

    def search_tokens(
        self, q_tok: np.ndarray, k: int, q_mask: Optional[np.ndarray] = None
    ) -> List[Tuple[str, float]]:
        """Single-query host-facing search → ``[(chunk_id, score)]``,
        valid hits only, (score desc, row asc)."""
        if self._count == 0 or k <= 0:
            return []
        qm = None if q_mask is None else np.asarray(q_mask, bool)[None, :]
        scores, rows = self.search_arrays(
            np.asarray(q_tok, np.float32)[None], qm, k
        )
        return self._hydrate(scores[0], rows[0])

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
    def hidden_dim(self) -> int:
        return self.config.hidden_dim
