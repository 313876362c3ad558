"""Surfface staged pipeline tests (A→B0→B1→B2→C→D).

Ports the reference per-stage suites: test_mst.rs (tree properties, trunk,
DFS determinism), test_smoothing.rs (variance reduction, forward/backward
consistency, trunk-aware), test_laplacian.rs / test_random.rs (L_sym
spectral bounds), test_spectral.rs (Rayleigh on known eigenvector, Dirichlet
uniform, zero-vector safety, full C→D integration), test_preflight.rs
(normalization trigger/skip, zero-variance detection, variance clamp,
presets, magnitude stats, direction preservation — the
test_preflight_* classes below). test_centroid.rs classes are split
between the CentroidState fixtures here (moments, thickness weighting
through MST) and tests/test_api_surface.py (regularize_variances,
feature transpose).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from matternet_rs_tpu.pipeline import (
    CentroidState,
    ClusteringConfig,
    ClusteringStage,
    LaplacianConfig,
    LaplacianStage,
    MSTConfig,
    MSTStage,
    PipelineConfig,
    PreflightConfig,
    PreflightStage,
    SmoothingConfig,
    SmoothingStage,
    TauMode,
    build,
    compute_tau,
)
from matternet_rs_tpu.pipeline import spectral
from matternet_rs_tpu.pipeline.mst import THICKNESS_NONE, SQEUCLIDEAN
from matternet_rs_tpu.pipeline.smoothing import TRUNK_AWARE
from matternet_rs_tpu.utils.fixtures import make_gaussian_blob


@pytest.fixture(scope="module")
def state():
    rng = np.random.default_rng(0)
    means = rng.normal(size=(12, 6)).astype(np.float32)
    variances = rng.uniform(0.05, 0.5, size=(12, 6)).astype(np.float32)
    counts = rng.integers(1, 20, 12)
    return CentroidState(
        means=jnp.asarray(means),
        variances=jnp.asarray(variances),
        counts=jnp.asarray(counts, jnp.int32),
    )


# --- Stage A ---------------------------------------------------------------


def test_stage_a_radius_gating():
    data = make_gaussian_blob(200, 0.3).astype(np.float32)
    out = ClusteringStage(
        ClusteringConfig(max_clusters=50, radius_threshold=16.0, batch_size=64)
    ).execute(data)
    c = out.state.num_centroids
    assert 3 <= c <= 50
    assert (out.assignments >= 0).all()       # stage A always assigns
    assert out.assignments.max() < c
    # Welford variances finite and positive.
    v = np.asarray(out.state.variances)
    assert np.isfinite(v).all() and (v >= 0).all()


def test_stage_a_budget_force_assign():
    data = make_gaussian_blob(150, 1.0).astype(np.float32)
    out = ClusteringStage(
        ClusteringConfig(max_clusters=4, radius_threshold=1.0, batch_size=32)
    ).execute(data)
    assert out.state.num_centroids <= 4
    assert (out.assignments >= 0).all()


def test_stage_a_projection_trigger():
    rng = np.random.default_rng(1)
    data = rng.normal(size=(300, 1200)).astype(np.float32)
    out = ClusteringStage(
        ClusteringConfig(max_clusters=20, radius_threshold=2500.0,
                         projection_threshold=1000, batch_size=128)
    ).execute(data)
    assert out.projection is not None
    assert out.working_dim < 1200
    assert out.state.feature_dim == out.working_dim


# --- Stage B0 --------------------------------------------------------------


def test_preflight_normalizes_on_high_ratio():
    means = np.ones((5, 4), np.float32)
    means[0] *= 100.0                       # ratio 100 > threshold 10
    st = CentroidState.from_clustering(means, np.ones(5, np.int64))
    out = PreflightStage().execute(st)
    assert out.was_normalized
    norms = np.linalg.norm(np.asarray(out.normalized_centroids), axis=1)
    assert np.allclose(norms, 1.0, atol=1e-5)


def test_preflight_skips_normalization_when_uniform():
    means = np.random.default_rng(2).normal(size=(6, 4)).astype(np.float32)
    means /= np.linalg.norm(means, axis=1, keepdims=True)
    st = CentroidState.from_clustering(means, np.ones(6, np.int64))
    out = PreflightStage().execute(st)
    assert not out.was_normalized


def test_preflight_variance_clamp():
    means = np.random.default_rng(3).normal(size=(4, 5)).astype(np.float32)
    st = CentroidState(
        means=jnp.asarray(means),
        variances=jnp.asarray(
            np.array([[0.0, 1e-9, 1e5, 1.0, 0.5]] * 4, np.float32)
        ),
        counts=jnp.ones(4, jnp.int32),
    )
    cfg = PreflightConfig()
    out = PreflightStage(cfg).execute(st)
    v = np.asarray(out.variances)
    assert (v >= cfg.variance_min).all() and (v <= cfg.variance_max).all()


def test_preflight_zero_variance_detection():
    means = np.random.default_rng(4).normal(size=(4, 5)).astype(np.float32)
    var = np.full((4, 5), 0.1, np.float32)
    var[:, 2] = 1e-9
    st = CentroidState(
        means=jnp.asarray(means), variances=jnp.asarray(var),
        counts=jnp.ones(4, jnp.int32),
    )
    out = PreflightStage().execute(st)
    assert 2 in out.zero_variance_features.tolist()


# --- Stage B1 --------------------------------------------------------------


def test_mst_tree_properties(state):
    out = MSTStage(MSTConfig(k_neighbors=6)).execute(state)
    c = state.num_centroids
    assert out.nodes_in_mst == c
    assert len(out.mst_edges) == c - 1          # tree
    assert len(out.centroid_order) == c
    assert sorted(out.centroid_order.tolist()) == list(range(c))


def test_mst_trunk_is_path(state):
    out = MSTStage(MSTConfig(k_neighbors=6)).execute(state)
    trunk = out.trunk_nodes.tolist()
    assert len(trunk) >= 2
    mst_pairs = {(e.u, e.v) for e in out.mst_edges} | {
        (e.v, e.u) for e in out.mst_edges
    }
    for a, b in zip(trunk[:-1], trunk[1:]):
        assert (a, b) in mst_pairs


def test_mst_deterministic(state):
    o1 = MSTStage().execute(state)
    o2 = MSTStage().execute(state)
    assert o1.centroid_order.tolist() == o2.centroid_order.tolist()
    assert o1.total_weight == pytest.approx(o2.total_weight)


def test_mst_metric_variants(state):
    for metric in ("bhattacharyya", "euclidean", "sqeuclidean"):
        out = MSTStage(MSTConfig(distance_metric=metric)).execute(state)
        assert len(out.mst_edges) == state.num_centroids - 1


def test_mst_thickness_weighting_changes_cost(state):
    none = MSTStage(
        MSTConfig(thickness_weight=THICKNESS_NONE, distance_metric=SQEUCLIDEAN)
    ).execute(state)
    mean = MSTStage(
        MSTConfig(thickness_weight="mean", distance_metric=SQEUCLIDEAN)
    ).execute(state)
    assert none.total_weight != pytest.approx(mean.total_weight)


def test_mst_prototype_skips_trunk(state):
    out = MSTStage(MSTConfig.prototype()).execute(state)
    assert len(out.trunk_nodes) == 0


# --- Stage B2 --------------------------------------------------------------


@pytest.fixture(scope="module")
def mst_out(state):
    return MSTStage(MSTConfig(k_neighbors=6)).execute(state)


def test_kalman_smoothed_var_leq_filtered(state, mst_out):
    out = SmoothingStage().execute(state, mst_out)
    sv = np.asarray(out.smoothed_variances)
    fv = np.asarray(out.filtered_variances)
    assert (sv <= fv + 1e-5).all()


def test_kalman_variance_reduction_positive(state, mst_out):
    out = SmoothingStage().execute(state, mst_out)
    assert out.variance_reduction > 0.0


def test_kalman_gains_in_unit_interval(state, mst_out):
    out = SmoothingStage().execute(state, mst_out)
    assert len(out.smoothing_gains) == state.num_centroids - 1
    assert (out.smoothing_gains >= 0.0).all()
    assert (out.smoothing_gains <= 1.0).all()


def test_kalman_aggressive_smoother_than_conservative(state, mst_out):
    """Aggressive config must deviate more from the raw observations."""
    order = mst_out.centroid_order
    raw = np.asarray(state.means)[order]
    cons = np.asarray(
        SmoothingStage(SmoothingConfig.conservative()).execute(state, mst_out).smoothed_means
    )
    aggr = np.asarray(
        SmoothingStage(SmoothingConfig.aggressive()).execute(state, mst_out).smoothed_means
    )
    assert np.abs(aggr - raw).mean() > np.abs(cons - raw).mean()


def test_kalman_trunk_aware_runs(state, mst_out):
    out = SmoothingStage(SmoothingConfig.trunk_aware(0.1)).execute(state, mst_out)
    assert out.summary()
    assert np.isfinite(np.asarray(out.smoothed_means)).all()


def test_kalman_deterministic(state, mst_out):
    o1 = SmoothingStage().execute(state, mst_out)
    o2 = SmoothingStage().execute(state, mst_out)
    assert np.allclose(
        np.asarray(o1.smoothed_means), np.asarray(o2.smoothed_means)
    )


# --- Stage C ---------------------------------------------------------------


def test_stage_c_lsym_properties(state):
    out = LaplacianStage(LaplacianConfig(k_neighbors=5)).execute(state)
    L = np.asarray(out.matrix, np.float64)
    assert L.shape == (6, 6)
    assert np.allclose(L, L.T, atol=1e-5)
    eig = np.linalg.eigvalsh(L)
    assert eig.min() >= -1e-4 and eig.max() <= 2.0 + 1e-4


def test_stage_c_unnormalized_row_sums(state):
    out = LaplacianStage(
        LaplacianConfig(k_neighbors=5, normalize=False)
    ).execute(state)
    L = np.asarray(out.matrix)
    assert np.allclose(L.sum(axis=1), 0.0, atol=1e-4)


def test_stage_c_sparsity_monotone_in_k(state):
    nnz = [
        LaplacianStage(LaplacianConfig(k_neighbors=k)).execute(state).nnz
        for k in (1, 3, 5)
    ]
    assert nnz[0] <= nnz[1] <= nnz[2]


# --- Stage D ---------------------------------------------------------------


def test_stage_d_rayleigh_on_known_eigenvector():
    # Path graph P3: L = [[1,-1,0],[-1,2,-1],[0,-1,1]]; eigenpair (1, [1,0,-1]).
    L = jnp.asarray(
        [[1.0, -1.0, 0.0], [-1.0, 2.0, -1.0], [0.0, -1.0, 1.0]]
    )
    x = jnp.asarray([[1.0, 0.0, -1.0]])
    r = spectral.rayleigh_quotient_batch(L, x)
    assert float(r[0]) == pytest.approx(1.0, abs=1e-5)


def test_stage_d_dirichlet_uniform_vector_zero():
    L = jnp.asarray(
        [[1.0, -1.0, 0.0], [-1.0, 2.0, -1.0], [0.0, -1.0, 1.0]]
    )
    X = jnp.asarray([[2.0, 2.0, 2.0], [1.0, 5.0, 1.0]])
    g = np.asarray(spectral.dirichlet_dispersion_batch(L, X))
    assert g[0] == pytest.approx(0.0, abs=1e-6)  # constant vector: no edge energy
    assert 0.0 <= g[1] <= 1.0


def test_stage_d_zero_vector_safe():
    L = jnp.eye(4)
    lam = spectral.compute_lambdas(L, jnp.zeros((3, 4)))
    assert np.isfinite(lam).all()


# --- τ from λ distribution -------------------------------------------------


def test_compute_tau_modes():
    lam = [0.1, 0.2, 0.3, 0.4, 0.5]
    assert compute_tau(lam, TauMode.median()) == pytest.approx(0.3)
    assert compute_tau(lam, TauMode.mean()) == pytest.approx(0.3)
    assert compute_tau(lam, TauMode.fixed(0.7)) == pytest.approx(0.7)
    assert compute_tau(lam, TauMode.percentile(1.0)) == pytest.approx(0.5)
    # upper median for even length (taumode.rs:55-58)
    assert compute_tau([0.1, 0.2, 0.3, 0.4], TauMode.median()) == pytest.approx(0.3)
    # floor
    assert compute_tau([-1.0, -2.0], TauMode.mean()) == pytest.approx(1e-9)


# --- Full chain ------------------------------------------------------------


def test_full_pipeline_end_to_end():
    data = make_gaussian_blob(150, 0.4).astype(np.float32)
    cfg = PipelineConfig(
        clustering=ClusteringConfig(max_clusters=20, radius_threshold=16.0,
                                    batch_size=64),
    )
    result = build(data, cfg)
    assert result.lambdas.shape == (150,)
    assert np.isfinite(result.lambdas).all()
    assert result.tau >= 1e-9
    assert result.laplacian.n_features == 10
    assert result.kalman.variance_reduction > -1.0
    assert set(result.timings) == {
        "A:clustering", "B0:preflight", "B1:mst", "B2:kalman",
        "C:laplacian", "D:spectral",
    }


def test_pipeline_save_load_roundtrip(tmp_path):
    from matternet_rs_tpu.pipeline.run import save_result, load_result_arrays

    data = make_gaussian_blob(100, 0.4).astype(np.float32)
    cfg = PipelineConfig(
        clustering=ClusteringConfig(max_clusters=12, radius_threshold=16.0),
    )
    result = build(data, cfg)
    save_result(result, tmp_path, "p")
    arrays = load_result_arrays(tmp_path, "p")
    assert np.allclose(arrays["means"], np.asarray(result.state.means), atol=1e-6)
    assert np.allclose(arrays["lambdas"], result.lambdas, atol=1e-9)
    assert (arrays["order"] == result.mst.centroid_order).all()


def test_kalman_last_step_smoothed_equals_filtered(state, mst_out):
    """RTS: at t = C-1 the smoothed estimate IS the filtered estimate."""
    out = SmoothingStage().execute(state, mst_out)
    assert np.allclose(
        np.asarray(out.smoothed_means)[-1],
        np.asarray(out.filtered_means)[-1],
        atol=1e-6,
    )
    assert np.allclose(
        np.asarray(out.smoothed_variances)[-1],
        np.asarray(out.filtered_variances)[-1],
        atol=1e-6,
    )


def test_kalman_trunk_factor_one_equals_identity(state, mst_out):
    """TrunkAware with factor 1.0 degenerates to the Identity model."""
    ident = SmoothingStage(SmoothingConfig()).execute(state, mst_out)
    trunk1 = SmoothingStage(SmoothingConfig.trunk_aware(1.0)).execute(state, mst_out)
    assert np.allclose(
        np.asarray(ident.smoothed_means), np.asarray(trunk1.smoothed_means),
        atol=1e-6,
    )


def test_kalman_damped_shrinks_toward_zero(state, mst_out):
    """Damped(α<1) predictions pull the trajectory toward the origin."""
    from matternet_rs_tpu.pipeline.smoothing import DAMPED

    damped = SmoothingStage(
        SmoothingConfig(transition_model=DAMPED, damping=0.5)
    ).execute(state, mst_out)
    ident = SmoothingStage(SmoothingConfig()).execute(state, mst_out)
    assert np.abs(np.asarray(damped.smoothed_means)).mean() <= np.abs(
        np.asarray(ident.smoothed_means)
    ).mean() + 1e-6


def test_config_presets():
    """Preset constructors carry the reference's documented values
    (preflight.rs:49-73, mst.rs:88-108, smoothing_chain.rs:78-110)."""
    c = PreflightConfig.conservative()
    assert c.magnitude_threshold == 5.0 and c.variance_max == 50.0
    s = PreflightConfig.strict()
    assert s.remove_zero_variance
    m = MSTConfig.high_dimensional()
    assert m.k_neighbors == 16
    p = MSTConfig.prototype()
    assert not p.compute_trunk
    sc = SmoothingConfig.conservative()
    assert sc.process_noise == 0.1 and sc.observation_noise == 0.01
    sa = SmoothingConfig.aggressive()
    assert sa.process_noise == 0.001 and sa.observation_noise == 1.0


def test_full_pipeline_deterministic():
    """Same input ⇒ identical stage outputs across runs (determinism-as-
    race-detection, SURVEY §5)."""
    data = make_gaussian_blob(100, 0.4).astype(np.float32)
    cfg = PipelineConfig(
        clustering=ClusteringConfig(max_clusters=12, radius_threshold=16.0),
    )
    r1 = build(data, cfg)
    r2 = build(data, cfg)
    assert np.allclose(r1.lambdas, r2.lambdas)
    assert (r1.mst.centroid_order == r2.mst.centroid_order).all()
    assert np.allclose(
        np.asarray(r1.state.means), np.asarray(r2.state.means)
    )


def test_pipeline_stage_d_mesh_bit_identical():
    """build(mesh=...) shards stage D over the mesh; λ must be
    bit-identical to the single-device run (zero-comm DP + psum'd
    Dirichlet total)."""
    from matternet_rs_tpu import pipeline
    from matternet_rs_tpu.parallel import make_mesh
    from matternet_rs_tpu.utils.fixtures import make_gaussian_blob

    data = make_gaussian_blob(300, 0.5).astype(np.float32)
    cfg = pipeline.PipelineConfig()
    single = pipeline.build(data, cfg)
    meshed = pipeline.build(data, cfg, mesh=make_mesh(8))
    np.testing.assert_allclose(meshed.lambdas, single.lambdas, atol=1e-6)
    assert meshed.tau == pytest.approx(single.tau)


def test_preflight_presets_and_magnitude_stats():
    """conservative()/strict() presets (preflight.rs:49-73) and the
    MagnitudeStats fields the reference reports (preflight.rs:77-97)."""
    from matternet_rs_tpu.pipeline.preflight import (
        MagnitudeStats,
        PreflightConfig,
        PreflightStage,
    )

    cons = PreflightConfig.conservative()
    assert cons.magnitude_threshold == pytest.approx(5.0)
    assert cons.variance_max == pytest.approx(50.0)
    strict = PreflightConfig.strict()
    assert strict.remove_zero_variance is True

    ms = MagnitudeStats(min_norm=1.0, max_norm=20.0, mean_norm=5.0,
                        variance_ratio=20.0)
    assert ms.needs_normalization(10.0)
    assert not ms.needs_normalization(25.0)

    # Conservative preset normalizes at a ratio the default would pass.
    rng = np.random.default_rng(4)
    means = rng.normal(size=(10, 6)).astype(np.float32)
    means[0] *= 8.0                       # ratio ~8: between 5 and 10
    st = CentroidState(
        means=jnp.asarray(means),
        variances=jnp.ones((10, 6), jnp.float32),
        counts=jnp.ones(10, jnp.int32),
    )
    out_default = PreflightStage(PreflightConfig()).execute(st)
    out_cons = PreflightStage(cons).execute(st)
    assert out_cons.was_normalized or not out_default.was_normalized
    s = out_cons.magnitude_stats
    assert s.max_norm >= s.mean_norm >= s.min_norm > 0
    if out_cons.was_normalized:
        norms = np.linalg.norm(np.asarray(out_cons.normalized_centroids), axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_preflight_strict_removes_zero_variance_features():
    from matternet_rs_tpu.pipeline.preflight import (
        PreflightConfig,
        PreflightStage,
    )

    rng = np.random.default_rng(5)
    means = rng.normal(size=(8, 5)).astype(np.float32)
    var = rng.uniform(0.5, 1.0, (8, 5)).astype(np.float32)
    var[:, 2] = 0.0                       # dead feature
    st = CentroidState(
        means=jnp.asarray(means), variances=jnp.asarray(var),
        counts=jnp.ones(8, jnp.int32),
    )
    out = PreflightStage(PreflightConfig.strict()).execute(st)
    assert 2 in out.zero_variance_features.tolist()
    # Clamp floor applied everywhere.
    assert float(np.asarray(out.variances).min()) >= 1e-4 - 1e-9
