"""ShardedArrowSpace tests: distributed build + query vs single-device."""

import numpy as np
import pytest

import jax

from matternet_rs_tpu.builder import ArrowSpaceBuilder
from matternet_rs_tpu.parallel.index import ShardedArrowSpace
from matternet_rs_tpu.utils.fixtures import make_gaussian_blob


@pytest.fixture(scope="module")
def built():
    data = make_gaussian_blob(200, 0.4).astype(np.float32)
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 6)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=12, radius=4.0)
        .with_deterministic_clustering(True)
    )
    aspace, gl = b.build(data)
    return aspace, gl, data


def test_from_arrowspace_search_matches(built):
    aspace, gl, data = built
    sharded = ShardedArrowSpace.from_arrowspace(aspace, gl, n_devices=4)
    q = data[42]
    q_lam = aspace.prepare_query_item(q, gl)
    single = aspace.search_lambda_aware(q, q_lam, 8)
    dist = sharded.search(q, 8, query_lambda=q_lam)
    assert [i for i, _ in single] == [i for i, _ in dist]
    for (_, s1), (_, s2) in zip(single, dist):
        assert s1 == pytest.approx(s2, abs=1e-5)


def test_from_shards_matches_single_device_build(built):
    aspace, gl, data = built
    # Distributed λ build from 4 raw shards against the same graph.
    shards = np.array_split(data, 4)
    sharded = ShardedArrowSpace.from_shards(shards, gl, aspace.taumode, n_devices=4)
    lam_single = np.asarray(aspace.lambdas)
    lam_dist = np.asarray(sharded.lambdas)[: len(data)]
    assert np.allclose(lam_dist, lam_single, atol=1e-5)
    assert sharded.min_lambdas == pytest.approx(aspace.min_lambdas, abs=1e-5)
    assert sharded.range_lambdas == pytest.approx(aspace.range_lambdas, abs=1e-5)


def test_query_lambda_consistency(built):
    aspace, gl, data = built
    sharded = ShardedArrowSpace.from_arrowspace(aspace, gl, n_devices=8)
    for i in (0, 99):
        assert sharded.prepare_query_lambda(data[i]) == pytest.approx(
            aspace.prepare_query_item(data[i], gl), abs=1e-5
        )


def test_search_cache_reuse(built):
    aspace, gl, data = built
    sharded = ShardedArrowSpace.from_arrowspace(aspace, gl, n_devices=2)
    sharded.search(data[0], 5)
    sharded.search(data[1], 5)
    assert len(sharded._search_cache) == 1     # one compile per k


def test_multislice_index_search(built):
    from matternet_rs_tpu.parallel.mesh import make_mesh_2d

    aspace, gl, data = built
    mesh = make_mesh_2d(2, 4)
    sharded = ShardedArrowSpace.from_arrowspace(aspace, gl, mesh=mesh)
    q = data[7]
    q_lam = aspace.prepare_query_item(q, gl)
    single = aspace.search_lambda_aware(q, q_lam, 6)
    dist = sharded.search(q, 6, query_lambda=q_lam)
    assert [i for i, _ in single] == [i for i, _ in dist]


def test_from_shards_multislice_mesh(built):
    from matternet_rs_tpu.parallel.mesh import make_mesh_2d

    aspace, gl, data = built
    mesh = make_mesh_2d(2, 4)
    shards = np.array_split(data, 8)
    sharded = ShardedArrowSpace.from_shards(shards, gl, aspace.taumode, mesh=mesh)
    lam_single = np.asarray(aspace.lambdas)
    lam_dist = np.asarray(sharded.lambdas)[: len(data)]
    assert np.allclose(lam_dist, lam_single, atol=1e-5)
    q = data[17]
    q_lam = aspace.prepare_query_item(q, gl)
    single = aspace.search_lambda_aware(q, q_lam, 6)
    dist = sharded.search(q, 6, query_lambda=q_lam)
    assert [i for i, _ in single] == [i for i, _ in dist]
