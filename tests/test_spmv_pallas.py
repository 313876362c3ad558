"""Pallas ELL SpMV parity tests (interpret mode)."""

import numpy as np

import jax.numpy as jnp

from matternet_rs_tpu.ops import csr
from matternet_rs_tpu.ops.pallas import spmv_ell as pk


def _graph(n=300, density=0.05, seed=0):
    rng = np.random.default_rng(seed)
    W = rng.random((n, n)) * (rng.random((n, n)) > 1 - density)
    W = np.maximum(W, W.T)
    np.fill_diagonal(W, 0.0)
    return W


def test_spmv_matches_dense():
    W = _graph()
    g = csr.SparseGraph.from_dense(W)
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.normal(size=(300, 8)).astype(np.float32))
    got = np.asarray(pk.spmv_ell_pallas(g.indices, g.weights, X, interpret=True))
    want = W.astype(np.float32) @ np.asarray(X)
    assert np.allclose(got, want, atol=1e-4)


def test_laplacian_spmv_matches_dense():
    W = _graph(seed=2)
    g = csr.SparseGraph.from_dense(W)
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.normal(size=(300, 4)).astype(np.float32))
    L = np.diag(W.sum(1)) - W
    got = np.asarray(
        pk.laplacian_spmv_ell_pallas(g.indices, g.weights, X, interpret=True)
    )
    assert np.allclose(got, L.astype(np.float32) @ np.asarray(X), atol=1e-4)


def test_spmv_odd_shapes_padding():
    """Non-multiple rows/k/m exercise all three padding paths."""
    W = _graph(n=137, seed=4)
    g = csr.SparseGraph.from_dense(W)
    rng = np.random.default_rng(5)
    X = jnp.asarray(rng.normal(size=(137, 3)).astype(np.float32))
    got = np.asarray(pk.spmv_ell_pallas(g.indices, g.weights, X, interpret=True))
    want = W.astype(np.float32) @ np.asarray(X)
    assert got.shape == (137, 3)
    assert np.allclose(got, want, atol=1e-4)
