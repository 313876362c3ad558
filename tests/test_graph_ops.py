"""GraphLaplacian operations suite — the reference's graph.rs op coverage
(src_legacy/tests/test_graph_factory.rs:9-415): SpMV vs dense, Rayleigh
bounds, neighbor/adjacency extraction, degrees, statistics, validation on
corrupted matrices, and the ELL roundtrip.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from matternet_rs_tpu.graph import GraphFactory, GraphLaplacian, GraphParams
from matternet_rs_tpu.ops import laplacian as lap_ops
from matternet_rs_tpu.utils.fixtures import make_gaussian_blob


@pytest.fixture(scope="module")
def gl():
    data = make_gaussian_blob(120, 0.5).astype(np.float32)
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    cents = data[:24]
    return lap_ops.build_laplacian_from_k_cluster(
        jnp.asarray(cents), params, n_items=len(data)
    )


def test_multiply_vector_matches_dense(gl):
    n = gl.shape[0]
    rng = np.random.default_rng(0)
    x = rng.normal(size=n).astype(np.float32)
    got = np.asarray(gl.multiply_vector(jnp.asarray(x)))
    want = np.asarray(gl.matrix, np.float64) @ x
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_rayleigh_zero_on_constant(gl):
    ones = jnp.ones(gl.shape[0])
    assert float(gl.rayleigh_quotient(ones)) == pytest.approx(0.0, abs=1e-5)


def test_rayleigh_nonnegative_and_bounded(gl):
    rng = np.random.default_rng(1)
    max_deg = float(np.asarray(gl.degrees()).max())
    for _ in range(10):
        x = jnp.asarray(rng.normal(size=gl.shape[0]).astype(np.float32))
        r = float(gl.rayleigh_quotient(x))
        # 0 ≤ R(x) ≤ 2·max_degree for L = D − W with nonneg weights.
        assert -1e-5 <= r <= 2 * max_deg + 1e-4


def test_rayleigh_zero_vector_safe(gl):
    assert float(gl.rayleigh_quotient(jnp.zeros(gl.shape[0]))) == 0.0


def test_adjacency_properties(gl):
    W = np.asarray(gl.adjacency())
    assert np.allclose(W, W.T, atol=1e-5)
    assert (W >= 0).all()
    assert np.allclose(np.diag(W), 0.0)


def test_laplacian_reconstructs_from_adjacency(gl):
    W = np.asarray(gl.adjacency(), np.float64)
    L = np.diag(W.sum(1)) - W
    np.testing.assert_allclose(np.asarray(gl.matrix), L, atol=1e-4)


def test_degrees_are_adjacency_row_sums(gl):
    W = np.asarray(gl.adjacency(), np.float64)
    np.testing.assert_allclose(
        np.asarray(gl.degrees()), W.sum(1), rtol=1e-4, atol=1e-5
    )


def test_neighbors_of_symmetric_and_no_self(gl):
    n = gl.shape[0]
    for i in range(n):
        nb = gl.neighbors_of(i)
        assert i not in nb
        for j in nb:
            assert i in gl.neighbors_of(int(j)), f"{i}->{j} not mutual"


def test_neighbors_bounded_by_capacity(gl):
    # Symmetrization can exceed k slightly (max(W, Wᵀ) unions directions),
    # but never beyond 2k (reference laplacian.rs:297-348 semantics).
    k = gl.graph_params.k
    for i in range(gl.shape[0]):
        assert len(gl.neighbors_of(i)) <= 2 * k


def test_statistics_keys_and_sanity(gl):
    s = gl.statistics()
    assert s["nnodes"] == gl.shape[0]
    assert 0 < s["nnz"] <= gl.shape[0] ** 2
    assert 0.0 <= s["sparsity"] < 1.0
    assert s["min_degree"] >= 0.0
    assert s["min_degree"] <= s["mean_degree"] <= s["max_degree"]


def test_verify_properties_ok(gl):
    v = gl.verify_properties()
    assert v["symmetric"] and v["row_sums_zero"] and v["diag_nonneg"]


def test_verify_properties_detects_asymmetry(gl):
    m = np.asarray(gl.matrix).copy()
    m[0, 1] += 0.5
    bad = GraphLaplacian(
        matrix=jnp.asarray(m), init_data=gl.init_data,
        nnodes=gl.nnodes, graph_params=gl.graph_params,
    )
    assert not bad.verify_properties()["symmetric"]


def test_verify_properties_detects_bad_row_sums(gl):
    m = np.asarray(gl.matrix).copy()
    m[2, 2] += 1.0
    bad = GraphLaplacian(
        matrix=jnp.asarray(m), init_data=gl.init_data,
        nnodes=gl.nnodes, graph_params=gl.graph_params,
    )
    v = bad.verify_properties()
    assert not v["row_sums_zero"]


def test_nnz_tolerance_monotone(gl):
    assert gl.nnz(0.0) >= gl.nnz(1e-3) >= gl.nnz(1.0)


def test_sparsity_of_exact():
    m = jnp.asarray(np.diag([1.0, 2.0, 0.0, 3.0]).astype(np.float32))
    assert GraphLaplacian.sparsity_of(m) == pytest.approx(1 - 3 / 16)


def test_ell_spmv_matches_dense(gl):
    from matternet_rs_tpu.ops.csr import laplacian_spmv_ell

    ell = gl.ell()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=gl.shape[0]).astype(np.float32))
    got = np.asarray(laplacian_spmv_ell(ell.indices, ell.weights, x))
    want = np.asarray(gl.matrix, np.float64) @ np.asarray(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # And the dense roundtrip is exact.
    np.testing.assert_allclose(
        np.asarray(ell.to_dense()), np.asarray(gl.matrix), atol=1e-6
    )


def test_ell_cache_reused(gl):
    assert gl.ell() is gl.ell()


def test_factory_matches_direct_build():
    data = make_gaussian_blob(60, 0.5).astype(np.float32)
    cents = data[:12]
    gl_f = GraphFactory.build_laplacian_matrix_from_k_cluster(
        cents, eps=1.0, k=5, topk=5, p=2.0, n_items=len(data)
    )
    params = GraphParams(eps=1.0, k=5, topk=5, p=2.0, sigma=None,
                         normalise=False, sparsity_check=False)
    gl_d = lap_ops.build_laplacian_from_k_cluster(
        jnp.asarray(cents), params, n_items=len(data)
    )
    np.testing.assert_allclose(
        np.asarray(gl_f.matrix), np.asarray(gl_d.matrix), atol=1e-6
    )


def test_spectral_laplacian_is_square_symmetric():
    from matternet_rs_tpu.core import ArrowSpace

    data = make_gaussian_blob(60, 0.5).astype(np.float32)
    aspace = ArrowSpace.from_items(data)
    params = GraphParams(eps=1.0, k=5, topk=5, sparsity_check=False)
    gl = lap_ops.build_laplacian_from_k_cluster(
        jnp.asarray(data[:12]), params, n_items=len(data)
    )
    GraphFactory.build_spectral_laplacian(aspace, gl)
    S = np.asarray(aspace.signals)
    assert S.shape[0] == S.shape[1] == data.shape[1]
    assert np.allclose(S, S.T, atol=1e-4)
