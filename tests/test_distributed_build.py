"""Distributed-build tests: block shard placement (no host concat),
psum-reduced Lloyd clustering, and the full mesh build path.

Covers VERDICT missing #2 (decentralized distributed build): nothing
N-sized is materialized on one host, clustering runs as device-local
assignment + psum reduction, and results are deterministic across mesh
shapes (the functional-JAX analogue of the reference's parallel-determinism
suite, src_legacy/subgraphs/tests/test_subg_parallel.rs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matternet_rs_tpu.graph import GraphParams
from matternet_rs_tpu.parallel import (
    distributed_lloyd,
    make_mesh,
    make_mesh_2d,
    shard_items_from_blocks,
)
from matternet_rs_tpu.parallel.index import ShardedArrowSpace


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    n, f = 4096, 24
    centers = rng.normal(size=(5, f)) * 4.0
    labels = rng.integers(0, 5, n)
    X = (centers[labels] + rng.normal(size=(n, f))).astype(np.float32)
    return X, labels


def _shards(X):
    n = X.shape[0]
    return [X[: n // 3], X[n // 3 : (2 * n) // 3 + 57], X[(2 * n) // 3 + 57 :]]


# ---------------------------------------------------------------------------
# shard_items_from_blocks
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_blocks_roundtrip_uneven_shards(data, ndev):
    X, _ = data
    mesh = make_mesh(ndev)
    Xs = shard_items_from_blocks(mesh, _shards(X))
    got = np.asarray(Xs)
    np.testing.assert_array_equal(got[: X.shape[0]], X)
    assert np.all(got[X.shape[0]:] == 0.0)      # zero padding
    assert Xs.shape[0] % ndev == 0


def test_blocks_roundtrip_2d_mesh(data):
    X, _ = data
    mesh = make_mesh_2d(2, 4)
    Xs = shard_items_from_blocks(mesh, _shards(X))
    np.testing.assert_array_equal(np.asarray(Xs)[: X.shape[0]], X)
    # Each device owns exactly one contiguous block.
    assert len(Xs.sharding.device_set) == 8


def test_blocks_rejects_mismatched_feature_dims():
    mesh = make_mesh(2)
    with pytest.raises(ValueError, match="equal F"):
        shard_items_from_blocks(
            mesh, [np.zeros((4, 3), np.float32), np.zeros((4, 5), np.float32)]
        )


# ---------------------------------------------------------------------------
# distributed_lloyd
# ---------------------------------------------------------------------------


def test_distributed_lloyd_recovers_cluster_structure(data):
    X, labels = data
    mesh = make_mesh(8)
    Xs = shard_items_from_blocks(mesh, _shards(X))
    cents, counts, assign = distributed_lloyd(mesh, Xs, X.shape[0], k=8, iters=15)
    assert counts.sum() == X.shape[0]            # padded rows not counted
    # Every non-empty centroid is label-pure (clusters may split under
    # over-clustering, but never mix — the blobs are well separated).
    a = np.asarray(assign)[: X.shape[0]]
    for c in range(8):
        members = labels[a == c]
        if members.size:
            _, freq = np.unique(members, return_counts=True)
            assert freq.max() / freq.sum() > 0.95


@pytest.mark.parametrize("mesh_shape", [(2,), (8,), (2, 4)])
def test_distributed_lloyd_deterministic_across_mesh_shapes(data, mesh_shape):
    X, _ = data
    mesh_ref = make_mesh(4)
    Xs_ref = shard_items_from_blocks(mesh_ref, _shards(X))
    cents_ref, counts_ref, _ = distributed_lloyd(
        mesh_ref, Xs_ref, X.shape[0], k=6, iters=8
    )
    mesh = (
        make_mesh(mesh_shape[0])
        if len(mesh_shape) == 1
        else make_mesh_2d(*mesh_shape)
    )
    Xs = shard_items_from_blocks(mesh, _shards(X))
    cents, counts, _ = distributed_lloyd(mesh, Xs, X.shape[0], k=6, iters=8)
    np.testing.assert_array_equal(counts, counts_ref)
    np.testing.assert_allclose(cents, cents_ref, atol=1e-4)


def test_distributed_lloyd_padded_rows_do_not_pollute(data):
    X, _ = data
    # 100 rows over 8 devices → 28 padded zero rows; a centroid near the
    # origin would attract them if the mask failed.
    Xsmall = X[:100] + 10.0                       # shift data away from 0
    mesh = make_mesh(8)
    Xs = shard_items_from_blocks(mesh, [Xsmall])
    cents, counts, _ = distributed_lloyd(mesh, Xs, 100, k=3, iters=10)
    assert counts.sum() == 100
    # No centroid collapsed to the zero padding.
    assert np.linalg.norm(cents, axis=1).min() > 1.0


# ---------------------------------------------------------------------------
# distributed_build end-to-end
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dbuilt(data):
    X, _ = data
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    sa = ShardedArrowSpace.distributed_build(
        _shards(X), params, k_clusters=10, n_devices=8
    )
    return X, sa


def test_distributed_build_self_query(dbuilt):
    X, sa = dbuilt
    for i in (0, 7, 4000):
        res = sa.search(X[i], k=5)
        assert res[0][0] == i


def test_distributed_build_energy_query(dbuilt):
    X, sa = dbuilt
    res = sa.search_energy(X[11], k=5)
    assert res[0][0] == 11
    # Ascending λ-distance.
    scores = [s for _, s in res]
    assert scores == sorted(scores)


def test_distributed_build_lambda_stats_on_device(dbuilt):
    X, sa = dbuilt
    lam = np.asarray(sa.lambdas)[: X.shape[0]]
    assert lam.min() >= 0.0 and lam.max() <= 1.0
    assert np.isclose(lam.min(), 0.0, atol=1e-6)
    assert np.isclose(lam.max(), 1.0, atol=1e-6)
    assert sa.range_lambdas > 0


def test_distributed_build_deterministic_across_mesh_shapes(data, dbuilt):
    X, sa8 = dbuilt
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    sa2 = ShardedArrowSpace.distributed_build(
        _shards(X), params, k_clusters=10, mesh=make_mesh_2d(2, 4)
    )
    lam8 = np.asarray(sa8.lambdas)[: X.shape[0]]
    lam2 = np.asarray(sa2.lambdas)[: X.shape[0]]
    np.testing.assert_allclose(lam8, lam2, atol=1e-5)
    r8 = sa8.search(X[33], k=10)
    r2 = sa2.search(X[33], k=10)
    assert [i for i, _ in r8] == [i for i, _ in r2]


def test_from_shards_never_concatenates(monkeypatch, data):
    """Guard: the no-concat contract of the distributed ingest path."""
    X, _ = data
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    sa = ShardedArrowSpace.distributed_build(
        _shards(X), params, k_clusters=10, n_devices=4
    )

    n_total = X.shape[0]
    real_concat = np.concatenate

    def guarded(arrays, *args, **kwargs):
        out = real_concat(arrays, *args, **kwargs)
        # Per-device block assembly (bounded) is fine; materializing the
        # whole dataset on the host is the failure mode being guarded.
        assert out.shape[0] < n_total, (
            "host-side global concatenate of all shards is forbidden"
        )
        return out

    import matternet_rs_tpu.parallel.index as idx_mod

    monkeypatch.setattr(idx_mod.np, "concatenate", guarded)
    sa2 = ShardedArrowSpace.from_shards(_shards(X), sa.gl, n_devices=4)
    assert sa2.n_items == X.shape[0]
