"""Clustering + heuristics tests (ports src_legacy/tests/test_clustering.rs
and surfface-core/src/tests/test_clustering.rs behaviours)."""

import numpy as np
import pytest

from matternet_rs_tpu import clustering as clus
from matternet_rs_tpu.sampling import make_sampler
from matternet_rs_tpu.utils.fixtures import (
    make_energy_test_dataset,
    make_gaussian_blob,
    make_gaussian_cliques_multi,
)


def test_kmeans_separates_clusters():
    data = make_energy_test_dataset(200, 16, seed=1)
    a, cents = clus.kmeans_lloyd(data, 5, max_iter=30, seed=7)
    assert len(cents) == 5
    assert len(np.unique(a)) == 5
    # Centers should land near the five true cluster centers.
    for cid in range(5):
        c = np.zeros(16)
        c[0] = cid * 10.0
        c[1] = (cid % 2) * 10.0
        assert np.sqrt(((cents - c) ** 2).sum(1)).min() < 2.0


def test_kmeans_deterministic_same_seed():
    data = make_gaussian_blob(60, 0.4)
    a1, c1 = clus.kmeans_lloyd(data, 4, seed=11)
    a2, c2 = clus.kmeans_lloyd(data, 4, seed=11)
    assert (a1 == a2).all()
    assert np.allclose(c1, c2)


def test_ch_score_true_partition_beats_random():
    data = make_energy_test_dataset(200, 16, seed=9)
    true_labels = np.repeat(np.arange(5), 40)
    rng = np.random.default_rng(0)
    random_labels = rng.integers(0, 5, 200)
    ch_true = clus.calinski_harabasz_score(data, true_labels, 5)
    ch_rand = clus.calinski_harabasz_score(data, random_labels, 5)
    assert ch_true > ch_rand * 10


def test_ch_score_degenerate_zero():
    data = np.random.default_rng(0).normal(size=(20, 4))
    assert clus.calinski_harabasz_score(data, np.zeros(20, int), 1) == 0.0
    assert clus.calinski_harabasz_score(data, np.arange(20), 20) == 0.0


def test_intrinsic_dimension_line_vs_space():
    rng = np.random.default_rng(5)
    t = rng.random(200)
    line = np.stack([t, 2 * t, -t, 0.5 * t], axis=1) + rng.normal(
        0, 1e-4, (200, 4)
    )
    full = rng.normal(size=(200, 4))
    id_line = clus.estimate_intrinsic_dimension(line, seed=1)
    id_full = clus.estimate_intrinsic_dimension(full, seed=1)
    assert id_line <= 2
    assert id_full >= 3


def test_intrinsic_dimension_tiny_dataset():
    assert clus.estimate_intrinsic_dimension(np.zeros((5, 8)), seed=0) == 2


def test_optimal_k_regime():
    data = make_gaussian_cliques_multi(300, 0.5, 5, 10, seed=9)
    k_opt, radius, id_est = clus.compute_optimal_k(data, seed=42)
    assert 2 <= k_opt <= 17        # k_max = √300 ≈ 17
    assert radius > 0
    assert 1 <= id_est <= 10


def test_threshold_identical_points_fallback():
    data = np.ones((30, 6))
    r = clus.compute_threshold_from_pilot(data, 3, seed=0)
    assert r >= 1e-6   # minimum-radius fallback, no NaN/0


def test_incremental_radius_gating():
    data = make_gaussian_blob(90, 0.3)
    out = clus.incremental_clustering(data, max_clusters=30, radius=4.0)
    assert 3 <= len(out.centroids) <= 30
    assert out.sizes.sum() >= len(out.centroids)
    # all assignments valid or -1
    assert out.assignments.max() < len(out.centroids)


def test_incremental_respects_max_clusters():
    data = make_gaussian_blob(100, 1.0)
    out = clus.incremental_clustering(data, max_clusters=5, radius=0.5)
    assert len(out.centroids) <= 5


def test_incremental_first_row_is_first_centroid():
    data = make_gaussian_blob(50, 0.3)
    out = clus.incremental_clustering(data, max_clusters=10, radius=4.0)
    assert np.allclose(out.centroids[0], data[0], atol=2.0)  # moved by online mean


def test_incremental_batched_same_regime():
    data = make_gaussian_blob(3000, 0.3).astype(np.float32)
    seq = clus.incremental_clustering(data, 20, 4.0, deterministic=True)
    bat = clus.incremental_clustering(
        data, 20, 4.0, deterministic=False, batch_size=512
    )
    # Same centroid-count regime (not bit-identical — reference parallel mode
    # is nondeterministic too).
    assert abs(len(seq.centroids) - len(bat.centroids)) <= max(
        3, len(seq.centroids) // 2
    )


def test_incremental_with_sampler_keeps_fewer():
    data = make_gaussian_blob(2000, 0.4)
    s = make_sampler("simple", 0.5, seed=1)
    out = clus.incremental_clustering(data, 20, 4.0, sampler=s)
    kept, discarded = s.get_stats()
    assert kept + discarded == 2000
    assert 0.35 < kept / 2000 < 0.65


def test_density_adaptive_sampler_rates():
    s = make_sampler("density_adaptive", 0.5, seed=2)
    p_near = s.keep_probs(np.array([0.01]), 10, 100)[0]
    p_far = s.keep_probs(np.array([100.0]), 10, 100)[0]
    assert p_far > p_near   # far points kept more often


def test_nearest_centroid():
    cents = np.array([[0.0, 0.0], [10.0, 0.0]])
    i, d2 = clus.nearest_centroid(np.array([9.0, 0.0]), cents)
    assert i == 1
    assert d2 == pytest.approx(1.0)


def test_sampler_seed_determinism():
    """Same seed ⇒ identical keep decisions (improvement over the
    reference's OS-entropy samplers)."""
    s1 = make_sampler("simple", 0.5, seed=3)
    s2 = make_sampler("simple", 0.5, seed=3)
    d1 = [s1.should_keep(1.0, 5, 10) for _ in range(50)]
    d2 = [s2.should_keep(1.0, 5, 10) for _ in range(50)]
    assert d1 == d2


# ---------------------------------------------------------------------------
# Deepened heuristics coverage (reference test_clus.rs:25-574)
# ---------------------------------------------------------------------------


def test_intrinsic_dimension_plane():
    """A 2-D manifold embedded in 10-D estimates ID ≈ 2 (Two-NN)."""
    rng = np.random.default_rng(3)
    uv = rng.normal(size=(400, 2))
    basis = rng.normal(size=(2, 10))
    X = (uv @ basis).astype(np.float32)
    est = clus.estimate_intrinsic_dimension(X, seed=0)
    assert 1 <= est <= 4, f"plane ID estimate {est}"


def test_intrinsic_dimension_full_space_higher_than_line():
    rng = np.random.default_rng(4)
    line = (np.outer(rng.normal(size=300), np.ones(10))
            + rng.normal(0, 1e-3, (300, 10))).astype(np.float32)
    full = rng.normal(size=(300, 10)).astype(np.float32)
    assert clus.estimate_intrinsic_dimension(
        full, seed=0
    ) > clus.estimate_intrinsic_dimension(line, seed=0)


def test_optimal_k_more_clusters_detected():
    """optimal-k tracks the true cluster count once above the k_min floor
    (reference clustering.rs:106-129 bounds k_min at 8 for this N/F)."""
    def blobs(n_c, seed):
        rng = np.random.default_rng(seed)
        centers = rng.normal(size=(n_c, 12)) * 30.0
        return (centers[rng.integers(0, n_c, 600)]
                + rng.normal(size=(600, 12))).astype(np.float32)

    k3, _, _ = clus.compute_optimal_k(blobs(3, 0), seed=0)
    k12, _, _ = clus.compute_optimal_k(blobs(12, 0), seed=0)
    assert k3 <= 9, f"3 blobs detected k={k3}"
    assert k12 >= 11, f"12 blobs detected k={k12}"


def test_optimal_k_deterministic():
    rng = np.random.default_rng(5)
    X = rng.normal(size=(300, 8)).astype(np.float32)
    a = clus.compute_optimal_k(X, seed=7)
    b = clus.compute_optimal_k(X, seed=7)
    assert a == b


def test_threshold_zero_variance_features():
    """Zero-variance columns must not produce NaN/0 radius."""
    rng = np.random.default_rng(6)
    X = rng.normal(size=(200, 6)).astype(np.float32)
    X[:, 2] = 3.0
    X[:, 5] = 0.0
    r = clus.compute_threshold_from_pilot(X, 4, seed=0)
    assert np.isfinite(r) and r > 0


def test_threshold_scales_with_spread():
    rng = np.random.default_rng(7)
    X = rng.normal(size=(200, 6)).astype(np.float32)
    r1 = clus.compute_threshold_from_pilot(X, 4, seed=0)
    r2 = clus.compute_threshold_from_pilot(10.0 * X, 4, seed=0)
    assert r2 > 2 * r1


def test_kmeans_handles_k_larger_than_unique_points():
    X = np.repeat(np.eye(3, 8, dtype=np.float32), 4, axis=0)
    a, c = clus.kmeans_lloyd(X, 8, seed=0)
    assert c.shape[0] <= 8 and len(a) == 12
    assert np.isfinite(c).all()


def test_ch_score_increases_with_separation():
    rng = np.random.default_rng(8)
    a0 = np.concatenate([np.zeros(100, int), np.ones(100, int)])
    close = np.concatenate([
        rng.normal(0, 1, (100, 5)), rng.normal(1, 1, (100, 5))
    ]).astype(np.float32)
    far = np.concatenate([
        rng.normal(0, 1, (100, 5)), rng.normal(20, 1, (100, 5))
    ]).astype(np.float32)
    assert clus.calinski_harabasz_score(
        far, a0, 2
    ) > clus.calinski_harabasz_score(close, a0, 2)


def test_incremental_outliers_marked_minus_one():
    """Rows farther than the relaxed radius after saturation stay -1."""
    rng = np.random.default_rng(9)
    X = np.concatenate([
        rng.normal(0, 0.05, (50, 4)),
        rng.normal(50.0, 0.05, (1, 4)),      # far outlier
    ]).astype(np.float32)
    out = clus.incremental_clustering(X, max_clusters=1, radius=1.0)
    assert out.assignments[-1] == -1
    assert (out.assignments[:50] == 0).all()


def test_incremental_sizes_match_assignments():
    rng = np.random.default_rng(10)
    X = rng.normal(size=(300, 6)).astype(np.float32)
    out = clus.incremental_clustering(X, max_clusters=12, radius=2.0)
    for c in range(out.centroids.shape[0]):
        assert out.sizes[c] == (out.assignments == c).sum()


def test_incremental_centroids_near_member_mean():
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(4, 6)) * 10
    X = (centers[rng.integers(0, 4, 400)]
         + rng.normal(0, 0.3, (400, 6))).astype(np.float32)
    out = clus.incremental_clustering(X, max_clusters=4, radius=10.0)
    for c in range(out.centroids.shape[0]):
        members = X[out.assignments == c]
        if len(members) > 5:
            d = np.linalg.norm(out.centroids[c] - members.mean(0))
            assert d < 1.0, f"centroid {c} drifted {d}"
