"""Mesh-sharded build + distributed top-k merge tests on the 8-device
virtual CPU mesh (conftest forces xla_force_host_platform_device_count=8).

Determinism requirement (SURVEY §5): same seed ⇒ identical results across
mesh shapes; sharded search must equal the single-device scan exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matternet_rs_tpu.core import ArrowSpace
from matternet_rs_tpu.graph import GraphParams
from matternet_rs_tpu.ops import laplacian as lap
from matternet_rs_tpu.ops import search as search_ops
from matternet_rs_tpu.ops import taumode as tm
from matternet_rs_tpu.parallel import (
    make_mesh,
    replicate,
    shard_items,
    sharded_search_lambda_aware,
    sharded_taumode_lambdas,
)
from matternet_rs_tpu.utils.fixtures import make_gaussian_blob


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    data = make_gaussian_blob(96, 0.4).astype(np.float32)
    params = GraphParams(eps=1.0, k=5, topk=5, sparsity_check=False)
    gl = lap.build_laplacian_from_k_cluster(data[:10], params, n_items=len(data))
    return data, gl


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_sharded_lambdas_match_single_device(setup, ndev):
    data, gl = setup
    mesh = make_mesh(ndev)
    Xs = shard_items(mesh, jnp.asarray(data))
    Ls = replicate(mesh, gl.matrix)
    lam_sharded = np.asarray(
        sharded_taumode_lambdas(mesh, Xs, Ls, tm.TAU_MEDIAN)
    )[: len(data)]
    lam_single = np.asarray(tm.taumode_lambdas(jnp.asarray(data), gl.matrix))
    assert np.allclose(lam_sharded, lam_single, atol=1e-5)


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_search_matches_single_device(setup, ndev):
    data, gl = setup
    aspace = ArrowSpace.from_items(data)
    aspace.compute_taumode(gl)

    mesh = make_mesh(ndev)
    Xs = shard_items(mesh, aspace.data)
    norms = shard_items(mesh, aspace.norms)
    lams = shard_items(mesh, aspace.lambdas)

    q = data[11]
    q_lambda = aspace.prepare_query_item(q, gl)

    idx_d, sc_d = sharded_search_lambda_aware(
        mesh, Xs, norms, lams, q, q_lambda, k=10
    )
    idx_s, sc_s = search_ops.search_lambda_aware(
        aspace.data, aspace.norms, aspace.lambdas,
        jnp.asarray(q), jnp.float32(q_lambda), 10,
    )
    assert np.allclose(np.asarray(sc_d), np.asarray(sc_s), atol=1e-5)
    assert list(np.asarray(idx_d)) == list(np.asarray(idx_s))


def test_sharded_search_deterministic_across_mesh_shapes(setup):
    data, gl = setup
    aspace = ArrowSpace.from_items(data)
    aspace.compute_taumode(gl)
    q = data[3]
    q_lambda = aspace.prepare_query_item(q, gl)

    results = []
    for ndev in (2, 4, 8):
        mesh = make_mesh(ndev)
        idx, _ = sharded_search_lambda_aware(
            mesh,
            shard_items(mesh, aspace.data),
            shard_items(mesh, aspace.norms),
            shard_items(mesh, aspace.lambdas),
            q, q_lambda, k=7,
        )
        results.append(list(np.asarray(idx)))
    assert results[0] == results[1] == results[2]


def test_padding_rows_never_returned(setup):
    """96 items on 7 devices → padding; padded rows must not appear."""
    data, gl = setup
    aspace = ArrowSpace.from_items(data)
    aspace.compute_taumode(gl)
    mesh = make_mesh(7)
    idx, sc = sharded_search_lambda_aware(
        mesh,
        shard_items(mesh, aspace.data),
        shard_items(mesh, aspace.norms),
        shard_items(mesh, aspace.lambdas),
        data[0], aspace.prepare_query_item(data[0], gl), k=20,
    )
    idx = np.asarray(idx)
    assert (idx < len(data)).all()
    assert np.isfinite(np.asarray(sc)).all()


def test_multislice_search_matches_single_device(setup):
    """2-slice × 4-chip mesh: hierarchical ICI→DCN merge is exact."""
    from matternet_rs_tpu.parallel.mesh import make_mesh_2d
    from matternet_rs_tpu.parallel.search import make_multislice_search
    from matternet_rs_tpu.parallel import shard_items

    data, gl = setup
    aspace = ArrowSpace.from_items(data)
    aspace.compute_taumode(gl)
    mesh = make_mesh_2d(2, 4)
    Xs = shard_items(mesh, aspace.data)
    norms = shard_items(mesh, aspace.norms)
    lams = shard_items(mesh, aspace.lambdas)

    q = data[21]
    q_lambda = aspace.prepare_query_item(q, gl)
    search = make_multislice_search(mesh, len(data), 9)
    idx_d, sc_d = search(
        Xs, norms, lams, jnp.asarray(q), jnp.float32(q_lambda), jnp.float32(0.7)
    )
    idx_s, sc_s = search_ops.search_lambda_aware(
        aspace.data, aspace.norms, aspace.lambdas,
        jnp.asarray(q), jnp.float32(q_lambda), 9,
    )
    assert list(np.asarray(idx_d)) == list(np.asarray(idx_s))
    assert np.allclose(np.asarray(sc_d), np.asarray(sc_s), atol=1e-5)


def test_distributed_initialize_single_process():
    from matternet_rs_tpu.parallel.distributed import initialize

    info = initialize()      # no-op single-process path
    assert info["process_count"] == 1
    assert info["global_device_count"] >= 1


def test_sharded_search_stress_20k():
    """Larger-N distributed exactness stress (test_subg_parallel.rs
    parallel-stress analogue for the mesh path)."""
    from matternet_rs_tpu.parallel.index import ShardedArrowSpace
    from matternet_rs_tpu.ops import taumode as tmod

    rng = np.random.default_rng(31)
    data = rng.normal(size=(20_000, 32)).astype(np.float32)
    params = GraphParams(eps=1.0, k=5, topk=5, sparsity_check=False)
    gl = lap.build_laplacian_from_k_cluster(data[:16], params, n_items=len(data))
    aspace = ArrowSpace.from_items(data)
    aspace.compute_taumode(gl)

    sharded = ShardedArrowSpace.from_arrowspace(aspace, gl, n_devices=8)
    for qi in (0, 9999, 19999):
        q = data[qi]
        q_lam = aspace.prepare_query_item(q, gl)
        single = aspace.search_lambda_aware(q, q_lam, 10)
        dist = sharded.search(q, 10, query_lambda=q_lam)
        assert [i for i, _ in single] == [i for i, _ in dist]


def test_sharded_batch_search_tilemax_routing_exact():
    """Per-shard tilemax routing (shard rows ≥ TILEMAX_MIN_N): the
    distributed batch search must stay exact vs the flat per-shard
    selection — same (ids, scores) on tie-free data."""
    from matternet_rs_tpu.parallel.search import make_sharded_search_batch

    ndev = 2
    n_local = search_ops.TILEMAX_MIN_N
    n, f, b, k = ndev * n_local, 8, 4, 10
    rng = np.random.default_rng(5)
    X = rng.standard_normal((n, f)).astype(np.float32)
    lams = rng.random(n).astype(np.float32)
    Q = X[rng.integers(0, n, b)] + 0.01 * rng.standard_normal((b, f)).astype(
        np.float32
    )
    q_lams = rng.random(b).astype(np.float32)

    mesh = make_mesh(ndev)
    Xs = shard_items(mesh, X)
    norms = shard_items(mesh, np.linalg.norm(X, axis=1).astype(np.float32))
    lams_s = shard_items(mesh, lams)
    fn = make_sharded_search_batch(mesh, n, k)
    gi, gs = fn(Xs, norms, lams_s, jnp.asarray(Q), jnp.asarray(q_lams),
                jnp.float32(0.7))

    # Serial ground truth through the same scoring block.
    scores = np.asarray(
        search_ops._batched_scores(
            jnp.asarray(X), jnp.asarray(np.linalg.norm(X, axis=1)
                                        .astype(np.float32)),
            jnp.asarray(lams), jnp.asarray(Q), jnp.asarray(q_lams),
            jnp.float32(0.7),
        )
    )
    for qi in range(b):
        order = np.argsort(-scores[qi], kind="stable")[:k]
        np.testing.assert_array_equal(np.asarray(gi)[qi], order)
        # Per-shard matmuls accumulate in a different order than the
        # whole-corpus ground-truth matmul — scores agree to f32 ulps.
        np.testing.assert_allclose(
            np.asarray(gs)[qi], scores[qi][order], rtol=0, atol=1e-6
        )
