"""Pallas kernel parity tests (interpret mode on CPU; the jnp blockwise
path is the oracle — same contract as the real-TPU spot check)."""

import numpy as np
import pytest
import jax.numpy as jnp

from trueno_rag_tpu.ops.dense import dense_topk
from trueno_rag_tpu.ops.pallas.dense_score import pallas_available, pallas_dense_topk


@pytest.mark.parametrize(
    "n,d,b,k",
    [(1000, 64, 5, 13), (4096, 128, 16, 50), (300, 32, 3, 7), (128, 384, 1, 5)],
)
def test_pallas_dense_matches_xla(n, d, b, k):
    rng = np.random.default_rng(n)
    matrix = rng.standard_normal((n, d)).astype(np.float32)
    matrix /= np.linalg.norm(matrix, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[n // 10 : n // 5] = False
    s_p, r_p = pallas_dense_topk(
        jnp.asarray(q), jnp.asarray(matrix), jnp.asarray(valid), k, "cosine", interpret=True
    )
    s_x, r_x = dense_topk(jnp.asarray(q), jnp.asarray(matrix), jnp.asarray(valid), k, "cosine")
    np.testing.assert_array_equal(np.asarray(r_p), np.asarray(r_x))
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x), atol=1e-5, rtol=1e-5)


def test_pallas_dot_metric():
    rng = np.random.default_rng(1)
    matrix = rng.standard_normal((512, 32)).astype(np.float32)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    valid = np.ones(512, bool)
    s_p, r_p = pallas_dense_topk(
        jnp.asarray(q), jnp.asarray(matrix), jnp.asarray(valid), 9, "dot", interpret=True
    )
    s_x, r_x = dense_topk(jnp.asarray(q), jnp.asarray(matrix), jnp.asarray(valid), 9, "dot")
    np.testing.assert_array_equal(np.asarray(r_p), np.asarray(r_x))


def test_pallas_rejects_euclidean():
    with pytest.raises(ValueError):
        pallas_dense_topk(
            jnp.zeros((1, 8)), jnp.zeros((16, 8)), jnp.ones(16, bool), 2, "euclidean", interpret=True
        )


def test_pallas_available_reports_platform():
    assert pallas_available() in (True, False)  # CPU in tests -> False
