"""LOBPCG eigensolver tests."""

import numpy as np
import pytest

from matternet_rs_tpu.graph import GraphParams
from matternet_rs_tpu.ops import eigensolver as es
from matternet_rs_tpu.ops import laplacian as lap


def _laplacian(n=100, seed=0):
    rng = np.random.default_rng(seed)
    W = np.maximum(rng.random((n, n)) - 0.9, 0)
    W = (W + W.T) / 2
    np.fill_diagonal(W, 0.0)
    return np.diag(W.sum(1)) - W


def test_lobpcg_matches_dense_eigh():
    L = _laplacian()
    vals_ref, _ = es.eigsh_dense(L, 5)
    vals, vecs = es.lobpcg_smallest(L, 5, iters=80)
    assert np.allclose(vals, vals_ref, atol=1e-3)
    # Residual check: ‖Lv - λv‖ small for each pair.
    for i in range(5):
        r = L @ vecs[:, i] - vals[i] * vecs[:, i]
        assert np.linalg.norm(r) < 1e-2


def test_lobpcg_orthonormal_eigenvectors():
    L = _laplacian(seed=1)
    _, vecs = es.lobpcg_smallest(L, 4, iters=80)
    G = vecs.T @ vecs
    assert np.allclose(G, np.eye(4), atol=1e-3)


def test_lobpcg_deterministic():
    L = _laplacian(seed=2)
    v1, _ = es.lobpcg_smallest(L, 3, iters=60, seed=7)
    v2, _ = es.lobpcg_smallest(L, 3, iters=60, seed=7)
    assert np.allclose(v1, v2)


def test_spectral_embedding_separates_components():
    """Two disconnected cliques → embedding separates them linearly."""
    n = 20
    W = np.zeros((n, n))
    W[:10, :10] = 1.0
    W[10:, 10:] = 1.0
    np.fill_diagonal(W, 0.0)
    L = np.diag(W.sum(1)) - W
    emb = es.spectral_embedding(L, 1, iters=100)
    # Nullspace of a 2-component graph is 2-dim; after dropping one trivial
    # vector the next is piecewise-constant: same sign within components.
    a, b = emb[:10, 0], emb[10:, 0]
    assert (np.sign(a) == np.sign(a[0])).all()
    assert (np.sign(b) == np.sign(b[0])).all()
    assert np.sign(a[0]) != np.sign(b[0])


def test_spectral_embedding_on_built_graph():
    rng = np.random.default_rng(3)
    nodes = rng.normal(size=(40, 16)).astype(np.float32)
    gl = lap.build_laplacian_matrix(
        nodes, GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    )
    emb = es.spectral_embedding(np.asarray(gl.matrix), 4, iters=60)
    assert emb.shape == (40, 4)
    assert np.isfinite(emb).all()


def test_lobpcg_clustered_spectrum_with_nullspace():
    """Disconnected graph (8 components ⇒ 8 exact-zero eigenvalues) plus a
    tight cluster of nonzero eigenvalues: LOBPCG must recover BOTH groups —
    the round-1 implementation collapsed everything into the nullspace."""
    import numpy as np
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    n_blocks, per = 8, 48
    n = n_blocks * per
    W = np.zeros((n, n), np.float32)
    for b in range(n_blocks):
        s = b * per
        blk = rng.random((per, per)).astype(np.float32) * 0.5
        blk = np.triu(blk, 1)
        W[s:s+per, s:s+per] = blk + blk.T
    L = np.diag(W.sum(1)).astype(np.float32) - W

    from matternet_rs_tpu.ops import eigensolver as eig

    k = 12
    vals_d, _ = eig.eigsh_dense(L, k)
    vals_l, _ = eig.lobpcg_smallest(jnp.asarray(L), k, iters=100, seed=0)
    err = np.abs(vals_l - vals_d) / (np.abs(vals_d) + 1e-2)
    assert float(err.max()) < 5e-3, (vals_l, vals_d)
    # The nullspace really is 8-dimensional and found as ~0.
    assert np.all(np.abs(vals_l[:8]) < 1e-4)
    assert np.all(vals_l[8:] > 0.1)


def test_lobpcg_sparse_operator_matches_dense_path():
    """The ELL sparse-operator route returns the same eigenpairs as the
    dense route on the same Laplacian (F ≳ 4k regime contract)."""
    from matternet_rs_tpu.graph import GraphParams
    from matternet_rs_tpu.ops import laplacian as lap_ops
    from matternet_rs_tpu.ops.csr import ell_from_dense_laplacian

    rng = np.random.default_rng(7)
    X = rng.normal(size=(160, 12)).astype(np.float32)
    params = GraphParams(eps=1.0, k=8, topk=8, sparsity_check=False)
    gl = lap.build_laplacian_matrix(np.asarray(X), params)
    v_dense, _ = es.lobpcg_smallest(gl.matrix, 5, iters=120, seed=0)
    v_sparse, vec_sparse = es.lobpcg_smallest(gl.ell(), 5, iters=120, seed=0)
    np.testing.assert_allclose(v_sparse, v_dense, atol=5e-3)
    assert vec_sparse.shape == (160, 5)


def test_lobpcg_k_clamped_to_n():
    L = np.diag([0.0, 1.0, 2.0]).astype(np.float32)
    vals, vecs = es.lobpcg_smallest(L, 10, iters=50)
    assert len(vals) == 3 and vecs.shape == (3, 3)
    np.testing.assert_allclose(np.sort(vals), [0.0, 1.0, 2.0], atol=1e-4)


def test_lobpcg_nullspace_multiplicity_disconnected():
    """c disconnected components → c (near-)zero eigenvalues."""
    import scipy.linalg  # noqa: F401  (guard: not available → skip)
    blocks = []
    rng = np.random.default_rng(1)
    for _ in range(3):
        W = np.abs(rng.normal(size=(8, 8))).astype(np.float32)
        W = (W + W.T) / 2
        np.fill_diagonal(W, 0)
        blocks.append(np.diag(W.sum(1)) - W)
    L = np.zeros((24, 24), np.float32)
    for i, b in enumerate(blocks):
        L[i * 8 : (i + 1) * 8, i * 8 : (i + 1) * 8] = b
    vals, _ = es.lobpcg_smallest(L, 5, iters=200, seed=0)
    assert (np.abs(vals[:3]) < 1e-3).all(), vals
    assert vals[3] > 1e-2


def test_eigsh_dense_agrees_with_numpy():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(20, 20))
    A = ((A + A.T) / 2).astype(np.float32)
    vals, vecs = es.eigsh_dense(A, 6)
    ref = np.sort(np.linalg.eigvalsh(A.astype(np.float64)))[:6]
    np.testing.assert_allclose(vals, ref, atol=1e-4)
    # Residual check: ‖Av - λv‖ small.
    for j in range(6):
        r = A @ vecs[:, j] - vals[j] * vecs[:, j]
        assert np.linalg.norm(r) < 1e-2
