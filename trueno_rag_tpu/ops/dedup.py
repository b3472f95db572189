"""Near-duplicate detection for ingest: one MXU pass instead of
pairwise host loops.

Corpora scraped at scale carry near-identical chunks (mirrored pages,
boilerplate, re-crawls); duplicates waste index memory and crowd result
lists with the same content. The reference has no dedup anywhere. Here
detection is two matmuls on device:

- **within the incoming batch**: ``sim = E·Eᵀ``; a chunk duplicates an
  EARLIER batch entry when similarity ≥ threshold (strictly-upper
  triangle, so the first occurrence always survives and transitive
  chains collapse onto their earliest member);
- **against the existing corpus**: ``E·Mᵀ`` masked by the valid rows,
  max+argmax per incoming chunk.

Cost is one [M, N+M] score pass per ingest batch — ingest-time only,
never on the query path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = float("-inf")


@functools.partial(jax.jit, static_argnames=("threshold", "rows_normalized"))
def near_duplicates(
    embeddings: jax.Array,  # [M, d] f32 (rows need not be normalized)
    matrix: jax.Array,  # [N, d] corpus (N may be 0)
    valid_mask: jax.Array,  # [N] bool
    threshold: float = 0.97,
    rows_normalized: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """→ ``(is_dup [M] bool, dup_of [M] int32, score [M] f32)``.

    ``dup_of`` is the corpus ROW of the duplicate (or ``-(j+2)`` when
    the duplicate is batch entry j — callers map it back; -1 = not a
    duplicate). Similarity is COSINE regardless of the store's scoring
    metric (duplication is about content direction, not magnitude):
    incoming embeddings normalize here; pass
    ``rows_normalized=False`` when the corpus rows are raw (the
    VectorStore only pre-normalizes under the cosine metric)."""
    m = embeddings.shape[0]
    norms = jnp.linalg.norm(embeddings, axis=1, keepdims=True)
    e = embeddings / jnp.where(norms == 0.0, 1.0, norms)

    # vs existing corpus
    if matrix.shape[0] > 0:
        if not rows_normalized:
            mn = jnp.linalg.norm(matrix, axis=1, keepdims=True)
            matrix = matrix / jnp.where(mn == 0.0, 1.0, mn)
        sim_c = jnp.dot(e, matrix.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        sim_c = jnp.where(valid_mask[None, :], sim_c, NEG_INF)
        best_c = jnp.max(sim_c, axis=1)
        row_c = jnp.argmax(sim_c, axis=1).astype(jnp.int32)
    else:
        best_c = jnp.full((m,), NEG_INF)
        row_c = jnp.full((m,), -1, jnp.int32)

    # within the batch: earlier entries win (strict upper triangle)
    sim_b = jnp.dot(e, e.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    ii = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    sim_b = jnp.where(jj < ii, sim_b, NEG_INF)  # only earlier entries
    best_b = jnp.max(sim_b, axis=1)
    row_b = jnp.argmax(sim_b, axis=1).astype(jnp.int32)

    use_corpus = best_c >= best_b
    score = jnp.maximum(best_c, best_b)
    dup_of = jnp.where(use_corpus, row_c, -(row_b + 2))
    is_dup = score >= threshold
    dup_of = jnp.where(is_dup, dup_of, -1)
    score = jnp.where(jnp.isneginf(score), 0.0, score)
    return is_dup, dup_of, score


def near_duplicates_oracle(embeddings, matrix, valid_mask, threshold=0.97,
                           rows_normalized=True):
    """Scalar NumPy oracle (same earlier-entry-wins semantics)."""
    e = np.asarray(embeddings, np.float32).copy()
    norms = np.linalg.norm(e, axis=1, keepdims=True)
    e = e / np.where(norms == 0.0, 1.0, norms)
    mat = np.asarray(matrix, np.float32)
    if not rows_normalized and len(mat):
        mn = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.where(mn == 0.0, 1.0, mn)
    valid = np.asarray(valid_mask, bool)
    m = len(e)
    is_dup = np.zeros(m, bool)
    dup_of = np.full(m, -1, np.int32)
    score = np.zeros(m, np.float32)
    for i in range(m):
        best, who = NEG_INF, -1
        for r in range(len(mat)):
            if valid[r]:
                s = float(e[i] @ mat[r])
                if s > best:
                    best, who = s, r
        for j in range(i):
            s = float(e[i] @ e[j])
            if s > best:
                best, who = s, -(j + 2)
        if best != NEG_INF:
            score[i] = best
            if best >= threshold:
                is_dup[i] = True
                dup_of[i] = who
    return is_dup, dup_of, score
