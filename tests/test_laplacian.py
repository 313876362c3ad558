"""Laplacian spectral property tests.

Ports the reference invariants (surfface-core/src/tests/test_random.rs:
130-807, test_laplacian.rs:16-257): row sums ≈ 0 for unnormalized L,
symmetry, eigenvalue bounds λ ∈ [0, 2] for L_sym, nullspace on the constant
vector, sparsity monotone in k, normalized-vs-unnormalized same topology.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from matternet_rs_tpu.graph import GraphParams
from matternet_rs_tpu.ops import laplacian as lap
from matternet_rs_tpu.utils.fixtures import make_gaussian_blob


PARAMS = GraphParams(eps=0.9, k=5, topk=5, p=2.0, sigma=None,
                     normalise=False, sparsity_check=False)


def _nodes(n=24, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, 12)).astype(np.float32)


def test_unnormalized_row_sums_zero():
    gl = lap.build_laplacian_matrix(_nodes(), PARAMS)
    m = np.asarray(gl.matrix)
    assert np.allclose(m.sum(axis=1), 0.0, atol=1e-4)


def test_symmetry():
    gl = lap.build_laplacian_matrix(_nodes(seed=1), PARAMS)
    m = np.asarray(gl.matrix)
    assert np.allclose(m, m.T, atol=1e-5)


def test_diagonal_nonnegative():
    gl = lap.build_laplacian_matrix(_nodes(seed=2), PARAMS)
    assert (np.diag(np.asarray(gl.matrix)) >= -1e-6).all()


def test_constant_vector_in_nullspace():
    gl = lap.build_laplacian_matrix(_nodes(seed=3), PARAMS)
    ones = jnp.ones(gl.matrix.shape[0])
    assert np.allclose(np.asarray(gl.multiply_vector(ones)), 0.0, atol=1e-4)


def test_unnormalized_psd():
    gl = lap.build_laplacian_matrix(_nodes(seed=4), PARAMS)
    eig = np.linalg.eigvalsh(np.asarray(gl.matrix, np.float64))
    assert eig.min() >= -1e-4


def test_sym_normalized_eigs_in_0_2():
    W = lap.build_adjacency(jnp.asarray(_nodes(seed=5)), PARAMS)
    Ls = np.asarray(lap.sym_normalized_laplacian(W), np.float64)
    eig = np.linalg.eigvalsh(Ls)
    # Isolated nodes contribute eigenvalue exactly 1 (identity row).
    assert eig.min() >= -1e-4
    assert eig.max() <= 2.0 + 1e-4


def test_normalized_vs_unnormalized_same_topology():
    W = lap.build_adjacency(jnp.asarray(_nodes(seed=6)), PARAMS)
    L = np.asarray(lap.laplacian_from_adjacency(W))
    Ls = np.asarray(lap.sym_normalized_laplacian(W))
    off = ~np.eye(L.shape[0], dtype=bool)
    assert ((np.abs(L[off]) > 1e-9) == (np.abs(Ls[off]) > 1e-9)).all()


def test_sparsity_decreases_with_topk():
    nodes = _nodes(n=40, seed=7)
    sparsities = []
    for topk in (2, 5, 10):
        p = GraphParams(eps=1.0, k=topk, topk=topk, p=2.0,
                        normalise=False, sparsity_check=False)
        gl = lap.build_laplacian_matrix(nodes, p)
        sparsities.append(gl.sparsity(tol=1e-9))
    assert sparsities[0] >= sparsities[1] >= sparsities[2]


def test_eps_filters_edges():
    nodes = _nodes(n=30, seed=8)
    p_tight = GraphParams(eps=0.05, k=8, topk=8, p=2.0, sparsity_check=False)
    p_loose = GraphParams(eps=1.0, k=8, topk=8, p=2.0, sparsity_check=False)
    nnz_tight = lap.build_laplacian_matrix(nodes, p_tight).nnz(tol=1e-9)
    nnz_loose = lap.build_laplacian_matrix(nodes, p_loose).nnz(tol=1e-9)
    assert nnz_tight <= nnz_loose


def test_weights_bounded_by_kernel():
    """All adjacency weights obey w = 1/(1+(d/σ)^p) ≤ 1."""
    W = np.asarray(lap.build_adjacency(jnp.asarray(_nodes(seed=9)), PARAMS))
    assert (W >= 0).all() and (W <= 1.0 + 1e-6).all()


def test_sparsity_check_raises():
    # 2 far-apart groups with eps tiny → nearly empty graph → too sparse.
    nodes = _nodes(n=30, seed=10)
    p = GraphParams(eps=1e-9, k=3, topk=3, p=2.0, sparsity_check=True)
    with pytest.raises(ValueError, match="too sparse"):
        lap.build_laplacian_matrix(nodes, p)


def test_from_k_cluster_shapes():
    """Feature-space Laplacian from [C, F] centroids is F×F
    (graph.rs:193-249)."""
    data = make_gaussian_blob(60, 0.5)
    centroids = np.asarray(data[:8], np.float32)       # pretend 8 centroids
    gl = lap.build_laplacian_from_k_cluster(
        centroids, GraphParams(eps=1.0, k=5, topk=5, sparsity_check=False),
        n_items=60,
    )
    assert gl.matrix.shape == (10, 10)   # F = 10 for gaussian blob
    assert gl.nnodes == 60


def test_spectral_laplacian_square():
    gl = lap.build_laplacian_matrix(_nodes(seed=11), PARAMS)
    signals = lap.build_spectral_laplacian(gl, n_items=24)
    assert signals.shape == gl.matrix.shape
    s = np.asarray(signals)
    assert np.allclose(s, s.T, atol=1e-5)


def test_statistics_and_verify():
    gl = lap.build_laplacian_matrix(_nodes(seed=12), PARAMS)
    stats = gl.statistics()
    assert stats["nnodes"] == 24
    assert stats["max_degree"] >= stats["mean_degree"] >= stats["min_degree"]
    props = gl.verify_properties()
    assert props["symmetric"] and props["row_sums_zero"] and props["diag_nonneg"]


def test_nullspace_dim_equals_components():
    """Disconnected graph: L has one zero eigenvalue per component
    (test_random.rs nullspace invariant)."""
    rng = np.random.default_rng(20)
    # Two far-apart node groups; eps small enough that no cross edges form.
    a = rng.normal(size=(10, 8)).astype(np.float32)
    b = -a + rng.normal(scale=0.01, size=(10, 8)).astype(np.float32)
    nodes = np.concatenate([a, b])
    p = GraphParams(eps=0.3, k=6, topk=6, sparsity_check=False)
    gl = lap.build_laplacian_matrix(nodes, p)
    eig = np.linalg.eigvalsh(np.asarray(gl.matrix, np.float64))
    n_zero = int((np.abs(eig) < 1e-5).sum())
    # Count actual connected components of the built adjacency.
    W = np.asarray(gl.adjacency()) > 1e-12
    seen = np.zeros(len(W), bool)
    comps = 0
    for s in range(len(W)):
        if seen[s]:
            continue
        comps += 1
        stack = [s]
        while stack:
            u = stack.pop()
            if seen[u]:
                continue
            seen[u] = True
            stack.extend(np.nonzero(W[u])[0].tolist())
    assert n_zero == comps


def test_lsym_diagonal_one_for_connected():
    """L_sym diagonal is exactly 1 for connected nodes, 0 for isolated
    (surfface-core laplacian normalize path)."""
    W = lap.build_adjacency(jnp.asarray(_nodes(seed=21)), PARAMS)
    Ls = np.asarray(lap.sym_normalized_laplacian(W))
    deg = np.asarray(W).sum(1)
    for i in range(len(deg)):
        if deg[i] > 1e-9:
            assert Ls[i, i] == pytest.approx(1.0, abs=1e-5)
