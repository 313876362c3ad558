"""Direct coverage for public APIs only exercised indirectly elsewhere
(found by a tests-reference sweep): ArrowItem/ArrowSpace accessors,
EnergyParams presets, CentroidState regularization
(surfface-core test_centroid.rs:147-180 classes), SF-GRASS class API
(src_legacy test_sparsification.rs behaviors at class granularity),
energy motif subgraphs, mesh helpers, profiling trace, backend probes.
"""

import numpy as np
import pytest

import jax.numpy as jnp


def test_arrow_item_euclidean_and_get_item():
    from matternet_rs_tpu.core import ArrowItem, ArrowSpace

    a = ArrowItem([0.0, 3.0], 0.1)
    b = ArrowItem([4.0, 0.0], 0.2)
    assert a.euclidean_distance(b) == pytest.approx(5.0)
    sp = ArrowSpace.from_items(np.eye(3, dtype=np.float32))
    sp.lambdas = jnp.asarray([0.1, 0.2, 0.3])
    row, lam = sp.get_item(1)
    np.testing.assert_array_equal(row, [0.0, 1.0, 0.0])
    assert lam == pytest.approx(0.2)


def test_energy_params_large_dataset_preset():
    from matternet_rs_tpu import energymaps as em
    from matternet_rs_tpu.builder import ArrowSpaceBuilder

    b = ArrowSpaceBuilder().with_lambda_graph(1.0, 6)
    p = em.EnergyParams.large_dataset(b)
    assert p.optical_tokens == 100
    assert p.steps == 3
    assert p.split_quantile == pytest.approx(0.92)
    assert p.neighbor_k >= b.lambda_k or p.neighbor_k >= 15


def test_centroid_state_regularize_variances():
    from matternet_rs_tpu.pipeline.centroid import CentroidState

    st = CentroidState(
        means=jnp.zeros((3, 2)),
        variances=jnp.asarray([[0.0, 5.0], [1e-9, 0.5], [10.0, 2.0]]),
        counts=jnp.asarray([1, 2, 3]),
    )
    reg = st.regularize_variances(eps=0.01, min_var=0.1, max_var=3.0)
    v = np.asarray(reg.variances)
    assert v.min() >= 0.1 and v.max() <= 3.0
    # original untouched (functional)
    assert float(np.asarray(st.variances).max()) == 10.0


def test_sfgrass_class_api_matches_function():
    from matternet_rs_tpu import sparsification as sp

    rng = np.random.default_rng(0)
    n = 40
    W = np.abs(rng.normal(size=(n, n)))
    W = (W + W.T) / 2
    np.fill_diagonal(W, 0.0)

    s = sp.SfGrassSparsifier(0.9).with_target_ratio(0.5)
    assert s.target_ratio == pytest.approx(0.5)
    out = s.sparsify_adjacency(W)
    # per-row keep ≈ half the edges, ≥1 per node
    kept = (out > 0).sum(1)
    orig = (W > 1e-12).sum(1)
    assert (kept >= 1).all()
    assert (kept <= np.ceil(orig * 0.5) + 1).all()
    # ratio clamps to [0.1, 1.0]
    assert sp.SfGrassSparsifier(5.0).target_ratio == pytest.approx(1.0)
    assert sp.SfGrassSparsifier(0.0).target_ratio == pytest.approx(0.1)


def test_energy_motif_subgraphs_map_items():
    from matternet_rs_tpu import energymaps as em
    from matternet_rs_tpu.builder import ArrowSpaceBuilder
    from matternet_rs_tpu.subgraphs import SubgraphConfig, spot_subg_motives
    from matternet_rs_tpu.utils.fixtures import make_gaussian_cliques_multi

    data = make_gaussian_cliques_multi(150, 0.4, 3, 12, seed=9).astype(
        np.float32
    )
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 5)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=18, radius=25.0)
        .with_dims_reduction(True)
        .with_seed(4)
    )
    aspace, gl = b.build_energy(
        data, em.EnergyParams(optical_tokens=16, neighbor_k=5, candidate_m=10)
    )
    subs = spot_subg_motives(gl, aspace, SubgraphConfig())
    for sg in subs:
        # item indices valid and consistent with the centroid map
        assert all(0 <= i < len(data) for i in sg.item_indices)
        assert sg.laplacian.shape[0] == sg.laplacian.shape[1]


def test_pad_to_mesh_and_backend_probe():
    from matternet_rs_tpu import backend
    from matternet_rs_tpu.parallel import make_mesh
    from matternet_rs_tpu.parallel.mesh import pad_to_mesh

    mesh = make_mesh(8)
    assert pad_to_mesh(16, mesh) == 16
    assert pad_to_mesh(17, mesh) == 24
    assert backend.is_tpu_available() in (True, False)   # CPU test env
    backend.print_backend_info()                          # must not raise


def test_device_trace_writes_profile(tmp_path):
    import jax

    from matternet_rs_tpu.utils.profiling import device_trace

    with device_trace(str(tmp_path)):
        jax.block_until_ready(jnp.ones(8) * 2.0)
    # The profiler must have produced a plugins/profile dir.
    produced = list(tmp_path.rglob("*"))
    assert produced, "no trace output written"


def test_mm_fast_matches_mm_shape():
    from matternet_rs_tpu.ops._mm import mm, mm_fast

    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    hi = np.asarray(mm(a, b))
    fa = np.asarray(mm_fast(a, b))
    assert fa.shape == hi.shape
    np.testing.assert_allclose(fa, hi, rtol=2e-2, atol=2e-2)  # bf16-grade


def test_lambda_aware_scores_range():
    from matternet_rs_tpu.ops.search import lambda_aware_scores

    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.normal(size=(30, 8)).astype(np.float32))
    norms = jnp.sqrt(jnp.sum(X * X, axis=-1))
    lams = jnp.asarray(rng.random(30), jnp.float32)
    s = np.asarray(
        lambda_aware_scores(
            X, norms, lams, X[0], jnp.float32(0.5), jnp.float32(0.7)
        )
    )
    assert s.shape == (30,)
    assert (s <= 1.0 + 1e-6).all() and (s >= -1.0 - 1e-6).all()


def test_item_mutation_family():
    """cluster_of / set_item / scale_item / mul_items / recompute_lambdas /
    drop_data (core.rs:672-1130 parity)."""
    from matternet_rs_tpu.builder import ArrowSpaceBuilder
    from matternet_rs_tpu.utils.fixtures import make_gaussian_blob

    data = make_gaussian_blob(100, 0.4).astype(np.float32)
    aspace, gl = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 5)
        .with_cluster_params(max_clusters=8, radius=5.0)
        .with_sparsity_check(False)
        .build(data)
    )
    # cluster_of: valid id or None, consistent with the assignments array.
    c = aspace.cluster_of(3)
    assert c is None or 0 <= c < aspace.n_clusters
    assert aspace.cluster_of(10**6) is None

    lam_before = np.asarray(aspace.lambdas).copy()

    # Scaling an item is λ-invariant (Rayleigh/G scale-free) but must go
    # through the recompute path without error.
    aspace.scale_item(5, 2.0, gl)
    np.testing.assert_allclose(np.asarray(aspace.data[5]), 2.0 * data[5], rtol=1e-6)

    # mul_items: item 7 becomes the elementwise product with item 8.
    aspace.mul_items(7, 8, gl)
    np.testing.assert_allclose(
        np.asarray(aspace.data[7]), data[7] * data[8], rtol=1e-5
    )
    lam_after = np.asarray(aspace.lambdas)
    assert lam_after.shape == lam_before.shape
    assert np.isfinite(lam_after).all()

    # set_item validates shape.
    with pytest.raises(ValueError, match="shape"):
        aspace.set_item(0, np.ones(3, np.float32))

    # drop_data frees the matrix but keeps λ + metadata.
    aspace.drop_data()
    assert aspace.data.shape == (0, aspace.nfeatures)
    assert np.asarray(aspace.lambdas).shape == (100,)


def test_mst_is_connected():
    from matternet_rs_tpu.pipeline.centroid import CentroidState
    from matternet_rs_tpu.pipeline.mst import MSTConfig, MSTStage

    rng = np.random.default_rng(3)
    st = CentroidState(
        means=jnp.asarray(rng.normal(size=(12, 6)).astype(np.float32)),
        variances=jnp.ones((12, 6)) * 0.5,
        counts=jnp.ones(12, jnp.int32),
    )
    out = MSTStage(MSTConfig()).execute(st)
    assert out.is_connected()


def test_empty_with_projection_paths():
    """Reconstruction seam (core.rs:485-560): projection restored from the
    typed config map; extra_reduced_dim rejected; None path works."""
    from matternet_rs_tpu.core import ArrowSpace

    proj = {
        "projection_original_dim": 64,
        "reduced_dim": 16,
        "projection_seed": 7,
        "extra_reduced_dim": False,
    }
    sp = ArrowSpace.empty_with_projection(proj, nrows=100, ncols=64)
    assert sp.nitems == 100 and sp.nfeatures == 64
    assert sp.projection is not None
    assert sp.projection.original_dim == 64
    assert sp.projection.reduced_dim == 16
    # Same seed → same projected output as a fresh ImplicitProjection.
    from matternet_rs_tpu.reduction import ImplicitProjection

    q = np.ones(64, np.float32)
    np.testing.assert_allclose(
        np.asarray(sp.projection.project(q)),
        np.asarray(ImplicitProjection(64, 16, 7).project(q)),
        atol=1e-6,
    )

    with pytest.raises(ValueError, match="extra dim"):
        ArrowSpace.empty_with_projection(
            {**proj, "extra_reduced_dim": True}, 10, 64
        )

    none_sp = ArrowSpace.empty_with_projection(
        {"projection_original_dim": None, "extra_reduced_dim": False}, 5, 8
    )
    assert none_sp.projection is None
