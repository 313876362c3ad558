"""Mesh-sharded kNN graph build: ring-kNN exactness vs the single-device
scan, sharded-ELL Laplacian parity vs the dense single-device builder
(incl. normalise and inline-sparsification paths), and distributed LOBPCG
vs the dense eigensolver. SURVEY §5 distributed-backend row / BASELINE
"mesh-sharded graph build" north star.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matternet_rs_tpu.graph import GraphParams
from matternet_rs_tpu.ops import knn as knn_ops
from matternet_rs_tpu.ops import laplacian as lap_ops
from matternet_rs_tpu.parallel import make_mesh, make_mesh_2d
from matternet_rs_tpu.parallel.knn_graph import (
    distributed_knn,
    distributed_knn_ell_laplacian,
    distributed_lobpcg,
)
from matternet_rs_tpu.parallel.mesh import shard_items

N, F, K = 96, 16, 6


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(5, F)) * 3.0
    return (centers[rng.integers(0, 5, N)] + rng.normal(size=(N, F))).astype(
        np.float32
    )


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_ring_knn_matches_single_device(data, mesh):
    Xs = shard_items(mesh, jnp.asarray(data))
    d_dist, d_ids = distributed_knn(mesh, Xs, N, K)
    s_dist, s_ids = knn_ops.knn(jnp.asarray(data), jnp.asarray(data), K + 1)
    # single-device knn includes self at distance 0 — drop it.
    s_dist, s_ids = np.asarray(s_dist), np.asarray(s_ids)
    d_dist, d_ids = np.asarray(d_dist)[:N], np.asarray(d_ids)[:N]
    for i in range(N):
        mask = s_ids[i] != i
        np.testing.assert_array_equal(d_ids[i], s_ids[i][mask][:K])
        np.testing.assert_allclose(
            d_dist[i], s_dist[i][mask][:K], rtol=1e-5, atol=1e-6
        )


def test_ring_knn_pad_rows_empty(data, mesh):
    X91 = jnp.asarray(data[:91])            # pads to 96 on 8 devices
    Xs = shard_items(mesh, X91)
    d_dist, d_ids = distributed_knn(mesh, Xs, 91, K)
    d_ids = np.asarray(d_ids)
    assert (d_ids[91:] == -1).all()
    assert (d_ids[:91] < 91).all()
    assert np.isinf(np.asarray(d_dist)[91:]).all()


@pytest.mark.parametrize(
    "params",
    [
        GraphParams(eps=1.0, k=K, topk=K, sparsity_check=False),
        GraphParams(eps=0.4, k=K, topk=K, sparsity_check=False),  # eps filter
        GraphParams(eps=1.0, k=K, topk=K, normalise=True, sparsity_check=False),
        GraphParams(eps=1.0, k=16, topk=16, sparsity_check=False),  # sparsify on
    ],
    ids=["base", "tight-eps", "normalise", "sparsified"],
)
def test_ell_laplacian_matches_dense_build(data, mesh, params):
    Xs = shard_items(mesh, jnp.asarray(data))
    ell = distributed_knn_ell_laplacian(
        mesh, Xs, N, params, reverse_k=N
    )
    L_dist = ell.to_dense()
    L_ref = np.asarray(
        lap_ops.build_laplacian_matrix(jnp.asarray(data), params).matrix,
        np.float64,
    )
    assert ell.dropped_reverse_edges == 0
    np.testing.assert_allclose(L_dist, L_ref, rtol=1e-4, atol=1e-5)


def test_ell_laplacian_2d_mesh_matches_1d(data):
    params = GraphParams(eps=1.0, k=K, topk=K, sparsity_check=False)
    m1, m2 = make_mesh(8), make_mesh_2d(2, 4)
    e1 = distributed_knn_ell_laplacian(
        m1, shard_items(m1, jnp.asarray(data)), N, params
    )
    e2 = distributed_knn_ell_laplacian(
        m2, shard_items(m2, jnp.asarray(data)), N, params
    )
    np.testing.assert_allclose(e1.to_dense(), e2.to_dense(), atol=1e-6)


def test_ell_laplacian_pad_rows_isolated(data, mesh):
    params = GraphParams(eps=1.0, k=K, topk=K, sparsity_check=False)
    Xs = shard_items(mesh, jnp.asarray(data[:91]))
    ell = distributed_knn_ell_laplacian(mesh, Xs, 91, params)
    diag = np.asarray(ell.diag)
    assert (diag[91:] > 1e5).all()          # PAD_DIAG pushes them upward
    ids = np.asarray(ell.indices)
    assert (ids[91:] == -1).all()


def test_reverse_cap_reports_drops(mesh):
    """A hub row with in-degree > reverse_k must report dropped edges."""
    rng = np.random.default_rng(1)
    hub = np.ones(F, np.float32)
    sats = (hub[None, :] + rng.normal(0, 0.01, (N - 1, F))).astype(np.float32)
    X = np.concatenate([hub[None, :], sats])
    params = GraphParams(eps=1.0, k=3, topk=3, sparsity_check=False)
    ell = distributed_knn_ell_laplacian(
        mesh, shard_items(mesh, jnp.asarray(X)), N, params, reverse_k=2
    )
    # every satellite points at ~the hub cluster: with reverse capacity 2
    # the hub MUST overflow, and the psum'd counter must say so.
    assert ell.dropped_reverse_edges > 0
    ids = np.asarray(ell.indices)
    assert ids.shape[1] == 3 + 2            # topk fwd + reverse_k slots


def test_reverse_cap_auto_reaches_zero_drops(mesh):
    """``reverse_k="auto"`` raises the capacity until nothing is dropped —
    the symmetric-operator precondition for exact eigensolving — and the
    result must equal an explicit over-capacity build row for row."""
    rng = np.random.default_rng(1)
    hub = np.ones(F, np.float32)
    sats = (hub[None, :] + rng.normal(0, 0.01, (N - 1, F))).astype(np.float32)
    X = np.concatenate([hub[None, :], sats])
    params = GraphParams(eps=1.0, k=3, topk=3, sparsity_check=False)
    Xs = shard_items(mesh, jnp.asarray(X))
    ell = distributed_knn_ell_laplacian(
        mesh, Xs, N, params, reverse_k="auto"
    )
    assert ell.dropped_reverse_edges == 0
    # The dense operator must be exactly symmetric.
    L = ell.to_dense()
    np.testing.assert_allclose(L, L.T, atol=0.0)
    # And identical to a build whose explicit capacity can't overflow.
    ell_big = distributed_knn_ell_laplacian(
        mesh, Xs, N, params, reverse_k=N
    )
    np.testing.assert_allclose(L, ell_big.to_dense(), atol=0.0)


def test_distributed_lobpcg_matches_dense(data, mesh):
    from matternet_rs_tpu.ops.eigensolver import eigsh_dense

    params = GraphParams(eps=1.0, k=8, topk=8, sparsity_check=False)
    Xs = shard_items(mesh, jnp.asarray(data))
    ell = distributed_knn_ell_laplacian(mesh, Xs, N, params, reverse_k=N)
    assert ell.dropped_reverse_edges == 0
    k_eig = 6
    vals, vecs = distributed_lobpcg(mesh, ell, k_eig, iters=150, seed=0)
    dvals, _ = eigsh_dense(ell.to_dense(), k_eig)
    np.testing.assert_allclose(vals, dvals, atol=5e-3)
    assert vecs.shape == (N, k_eig)


def test_distributed_lobpcg_embedding_separates_clusters(mesh):
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(4, F)) * 6.0
    labels = rng.integers(0, 4, N)
    X = (centers[labels] + 0.3 * rng.normal(size=(N, F))).astype(np.float32)
    params = GraphParams(eps=0.8, k=8, topk=8, sparsity_check=False)
    ell = distributed_knn_ell_laplacian(
        mesh, shard_items(mesh, jnp.asarray(X)), N, params, reverse_k=N
    )
    _, vecs = distributed_lobpcg(mesh, ell, 6, iters=150, seed=0)
    emb = vecs[:, 1:]
    d = ((emb[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    nn = d.argmin(1)
    agree = (labels[nn] == labels).mean()
    assert agree > 0.9, f"embedding 1-NN label agreement {agree}"
