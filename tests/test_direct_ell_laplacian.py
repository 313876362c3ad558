"""Direct-ELL graph construction (VERDICT r2 #6): the O(n·k)-memory build
must reproduce the dense builder's Laplacian exactly — same kNN candidates,
eps filter, kernel weights, inline sparsification, union symmetrization —
without ever materializing [n, n].

Reference semantics: /root/reference/src_legacy/laplacian.rs:122-419 (the
dense path is already parity-tested against the f64 oracle; here we pin the
direct path to the dense path).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from matternet_rs_tpu.graph import GraphLaplacian, GraphParams
from matternet_rs_tpu.ops import laplacian as lap_ops


def _rand_nodes(n, p, seed=0):
    rng = np.random.default_rng(seed)
    # Clustered profiles so the graph has structure (not all-pairs-close).
    centers = rng.normal(size=(8, p)) * 2.0
    return (
        centers[rng.integers(0, 8, n)] + rng.normal(size=(n, p))
    ).astype(np.float32)


PARAM_GRID = [
    # (eps, topk, p, sigma, normalise) — spans sparsify on/off, kernel
    # shapes, and the standardized-columns path.
    (1.0, 6, 2.0, None, False),
    (0.5, 4, 2.0, 0.7, False),
    (1.0, 16, 3.0, None, False),     # high degree → sparsify active
    (0.8, 8, 2.0, None, True),
    (0.05, 6, 2.0, None, False),     # tight eps → most candidates invalid
]


@pytest.mark.parametrize("eps,topk,p,sigma,normalise", PARAM_GRID)
def test_direct_ell_matches_dense_builder(eps, topk, p, sigma, normalise):
    nodes = _rand_nodes(500, 24, seed=3)
    params = GraphParams(eps=eps, k=topk, topk=topk, p=p, sigma=sigma,
                         normalise=normalise, sparsity_check=False)
    dense_gl = lap_ops.build_laplacian_matrix(nodes, params)
    ell_gl = lap_ops.build_laplacian_ell(
        nodes, params, reverse_k=nodes.shape[0] - 1
    )
    assert ell_gl.is_ell_backed
    L_dense = np.asarray(dense_gl.matrix)
    L_ell = np.asarray(ell_gl.dense())
    # Identical topology…
    assert np.array_equal(np.abs(L_dense) > 1e-12, np.abs(L_ell) > 1e-12)
    # …and identical values (same HIGHEST-precision matmul + same kernel
    # arithmetic; scatter-order differences only, so tiny fp tolerance).
    np.testing.assert_allclose(L_ell, L_dense, rtol=0, atol=1e-5)


def test_direct_ell_auto_reverse_matches_dense_union():
    """Default reverse_k (auto): the reverse capacity grows until no
    in-edge is dropped, so the union symmetrization is EXACT — the ELL
    adjacency equals the dense builder's with no hand-tuned capacity."""
    nodes = _rand_nodes(400, 16, seed=5)
    params = GraphParams(eps=1.0, k=4, topk=4, sparsity_check=False)
    dense_gl = lap_ops.build_laplacian_matrix(nodes, params)
    ell_gl = lap_ops.build_laplacian_ell(nodes, params)
    W_dense = np.asarray(dense_gl.adjacency())
    W_ell = np.asarray(ell_gl.adjacency())
    assert np.array_equal(W_dense > 1e-12, W_ell > 1e-12)
    np.testing.assert_allclose(W_ell, W_dense, atol=1e-5)


def test_direct_ell_pinned_reverse_capacity_reports_drops():
    """Pinned reverse_k = 2·topk: any dropped reverse edge must be
    reported, and kept edges must be the highest-weight ones."""
    nodes = _rand_nodes(400, 16, seed=5)
    params = GraphParams(eps=1.0, k=4, topk=4, sparsity_check=False)
    dense_gl = lap_ops.build_laplacian_matrix(nodes, params)
    ell_gl = lap_ops.build_laplacian_ell(nodes, params, reverse_k=8)
    W_dense = np.asarray(dense_gl.adjacency())
    W_ell = np.asarray(ell_gl.adjacency())
    # Every ELL edge exists in the dense union with the same weight.
    nz = W_ell > 0
    np.testing.assert_allclose(W_ell[nz], W_dense[nz], atol=1e-5)
    # Any missing edge is a reverse-capacity drop on a row that is full.
    missing = (W_dense > 1e-12) & ~nz
    if missing.any():
        e = ell_gl.ell()
        full_rows = np.asarray((e.weights > 0).sum(axis=1)) == e.weights.shape[1]
        assert all(full_rows[i] or full_rows[j] for i, j in zip(*np.nonzero(missing)))


def test_direct_ell_normalized_matches_dense_sym():
    nodes = _rand_nodes(300, 20, seed=9)
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    dense_gl = lap_ops.build_laplacian_matrix(nodes, params, normalized=True)
    ell_gl = lap_ops.build_laplacian_ell(
        nodes, params, normalized=True, reverse_k=nodes.shape[0] - 1
    )
    np.testing.assert_allclose(
        np.asarray(ell_gl.dense()), np.asarray(dense_gl.matrix), atol=1e-5
    )
    # L_sym diagonal is 1 for connected rows.
    d = np.asarray(ell_gl.ell().diag)
    assert np.allclose(d, 1.0)


def test_build_laplacian_matrix_routes_large_n(monkeypatch):
    """Beyond DIRECT_ELL_N the public builder returns an ELL-backed graph
    whose λ scoring matches the dense path."""
    from matternet_rs_tpu.ops import taumode as tm_ops

    monkeypatch.setattr(lap_ops, "DIRECT_ELL_N", 256)
    nodes = _rand_nodes(400, 24, seed=11)
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    gl = lap_ops.build_laplacian_matrix(nodes, params)
    assert gl.is_ell_backed
    dense_gl = lap_ops.build_laplacian_matrix(nodes[:255], params)
    assert not dense_gl.is_ell_backed

    X = _rand_nodes(64, 400, seed=12)
    lam_ell = np.asarray(
        tm_ops.taumode_lambdas_auto(jnp.asarray(X), gl.ell(), tm_ops.TAU_MEDIAN)
    )
    ref_gl = lap_ops.build_laplacian_ell(nodes, params)
    lam_dense_graph = np.asarray(
        tm_ops.taumode_lambdas_auto(
            jnp.asarray(X), jnp.asarray(ref_gl.dense()), tm_ops.TAU_MEDIAN
        )
    )
    # Same graph, different operator paths (ELL edge scan vs dense
    # matmuls): f32 accumulation-order tolerance.
    np.testing.assert_allclose(lam_ell, lam_dense_graph, rtol=1e-2, atol=1e-5)


def test_ell_backed_graph_container_ops():
    """GraphLaplacian surface on an ELL-backed graph: shape, nnz/sparsity,
    degrees, neighbors, multiply_vector, verify_properties."""
    nodes = _rand_nodes(300, 20, seed=21)
    params = GraphParams(eps=1.0, k=5, topk=5, sparsity_check=False)
    gl = lap_ops.build_laplacian_ell(nodes, params, reverse_k=299)
    dense_gl = lap_ops.build_laplacian_matrix(nodes, params)

    assert gl.shape == dense_gl.shape
    assert gl.nnz(tol=1e-12) == dense_gl.nnz(tol=1e-12)
    assert gl.sparsity(tol=1e-12) == pytest.approx(
        dense_gl.sparsity(tol=1e-12), abs=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(gl.degrees()), np.asarray(dense_gl.degrees()), atol=1e-5
    )
    i = 7
    np.testing.assert_array_equal(gl.neighbors_of(i), dense_gl.neighbors_of(i))
    x = np.random.default_rng(0).normal(size=(300,)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(gl.multiply_vector(jnp.asarray(x))),
        np.asarray(dense_gl.multiply_vector(jnp.asarray(x))),
        atol=1e-4,
    )
    props = gl.verify_properties()
    assert props["symmetric"] and props["row_sums_zero"] and props["diag_nonneg"]
    stats = gl.statistics()
    assert stats["nnodes"] == 300 and stats["nnz"] == gl.nnz()


def test_tiled_knn_matches_full_topk():
    """The lax.map row-tiling is numerically identical to the one-shot
    dense top-k (same matmul row-slices)."""
    nodes = _rand_nodes(513, 24, seed=31)   # deliberately not tile-aligned
    nd_t, idx_t = lap_ops._knn_dense_tiled(
        jnp.asarray(nodes), topk=8, normalise=False, row_tile=128
    )
    from matternet_rs_tpu.ops import distance as dist_ops

    d = np.array(dist_ops.rectified_cosine_distance(jnp.asarray(nodes)))
    np.fill_diagonal(d, np.inf)
    idx_ref = np.argsort(d, axis=1, kind="stable")[:, :8]
    nd_ref = np.take_along_axis(d, idx_ref, axis=1)
    np.testing.assert_allclose(np.asarray(nd_t), nd_ref, atol=1e-6)
    # Indices may differ only on exact distance ties.
    same = np.asarray(idx_t) == idx_ref
    ties = np.isclose(np.asarray(nd_t), nd_ref, atol=1e-6)
    assert np.all(same | ties)


def test_direct_ell_auto_grows_to_exact_requirement_on_hub(caplog):
    """Hub corpus (one row is everyone's nearest neighbor → in-degree
    ≈ n−1 ≫ 2·topk): the auto capacity must jump to the EXACT global
    requirement in one retry (``_ell_reverse_required``), log the
    growth, and reproduce the dense union with zero drops."""
    import logging

    rng = np.random.default_rng(2)
    n, p = 120, 64
    hub = np.ones(p, np.float32)
    # Spokes: strong hub component + near-orthogonal noise, so under the
    # rectified-cosine metric every spoke's nearest neighbor is the hub
    # while spoke↔spoke distances are materially larger.
    sats = (hub[None, :] + rng.normal(0, 0.9, (n - 1, p))).astype(np.float32)
    nodes = np.concatenate([hub[None, :] * 2.0, sats])
    params = GraphParams(eps=1.0, k=4, topk=4, sparsity_check=False)
    dense_gl = lap_ops.build_laplacian_matrix(nodes, params)
    with caplog.at_level(logging.INFO, logger="matternet_rs_tpu.ops.laplacian"):
        ell_gl = lap_ops.build_laplacian_ell(nodes, params)
    W_dense = np.asarray(dense_gl.adjacency())
    W_ell = np.asarray(ell_gl.adjacency())
    # The hub's in-degree must actually exceed the 2·topk default for
    # this fixture to exercise the growth path at all.
    in_deg_hub = int((W_dense[:, 0] > 1e-12).sum())
    assert in_deg_hub > 8, f"fixture too weak: hub in-degree {in_deg_hub}"
    assert any("auto reverse capacity grew" in r.message for r in caplog.records)
    # Exact union symmetrization: identical support and weights.
    assert np.array_equal(W_dense > 1e-12, W_ell > 1e-12)
    np.testing.assert_allclose(W_ell, W_dense, atol=1e-5)
    # Capacity is the minimal exact requirement, not a power-of-two
    # overshoot: slots = topk forward + required reverse.
    e = ell_gl.ell()
    assert e.weights.shape[1] - 4 <= max(in_deg_hub, 9)
