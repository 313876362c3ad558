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
