"""Extended clustering tests — ports the reference assertion classes from
``/root/reference/src_legacy/tests/test_clustering.rs`` that round-2's
``test_clustering.py`` did not yet cover:

* k-means edge cases (k>n, k=0, single row, empty-cluster recovery,
  early-stop on identical rows)            — test_clustering.rs:620-672
* step1 k-bounds regimes                   — test_clustering.rs:176-210
* threshold-from-pilot variants            — test_clustering.rs:302-409
* optimal-k regimes (minimum viable, high-dim, mixed-scale, degenerate,
  single feature, seed consistency, README example)
                                           — test_clustering.rs:524-766
* builder cluster overrides (manual K, radius tightness, dense mesh)
                                           — test_clustering.rs:917-1177
* fast clustering via early JL projection  — test_clustering.rs:768-915
"""

from __future__ import annotations

import time

import numpy as np
import pytest

from matternet_rs_tpu import ArrowSpaceBuilder
from matternet_rs_tpu import clustering as clus
from matternet_rs_tpu.core import TauMode


# ---------------------------------------------------------------------------
# k-means edge cases (test_clustering.rs:620-672)
# ---------------------------------------------------------------------------


def test_kmeans_k_greater_than_n_clamps():
    rows = np.array([[1.0], [2.0]], np.float32)
    a, c = clus.kmeans_lloyd(rows, 5, 10, 128)
    assert len(a) == 2
    assert c.shape[0] <= 2
    assert all(x < 2 for x in a)


def test_kmeans_k_equals_n():
    rows = np.array([[0.0, 0.0], [5.0, 5.0], [10.0, 0.0]], np.float32)
    a, c = clus.kmeans_lloyd(rows, 3, 20, 7)
    # With k=n and well-separated points each point gets its own cluster.
    assert len(set(a.tolist())) == 3


def test_kmeans_k_equals_zero_rejected():
    rows = np.array([[1.0], [2.0]], np.float32)
    # The reference panics (test_clustering.rs:630-638); we surface a clean
    # Python error rather than a device fault.
    with pytest.raises(Exception):
        clus.kmeans_lloyd(rows, 0, 10, 128)


def test_kmeans_single_row():
    rows = np.array([[1.0, 2.0]], np.float32)
    a, _ = clus.kmeans_lloyd(rows, 3, 10, 128)
    assert len(a) == 1
    assert a[0] == 0


def test_kmeans_empty_cluster_recovery():
    # Two near-duplicate points + one far point, k=3: some cluster will be
    # empty or near-empty; assignments must stay in-bounds regardless.
    rows = np.array(
        [[0.0, 0.0], [0.001, 0.001], [100.0, 100.0]], np.float32
    )
    a, _ = clus.kmeans_lloyd(rows, 3, 20, 128)
    assert len(a) == 3
    assert all(x < 3 for x in a)


def test_kmeans_convergence_identical_rows():
    rows = np.full((20, 2), 5.0, np.float32)
    a, _ = clus.kmeans_lloyd(rows, 3, 100, 128)
    assert len(a) == 20
    assert len(set(a.tolist())) == 1, "identical rows must share one cluster"


# ---------------------------------------------------------------------------
# step1 bounds (test_clustering.rs:176-210)
# ---------------------------------------------------------------------------


def test_step1_bounds_small_dataset():
    rows = np.ones((10, 1), np.float32)
    k_min, k_max, _ = clus.step1_bounds(rows, 42)
    assert k_min >= 2
    assert k_max >= k_min
    assert k_max <= 10


def test_step1_bounds_large_n_small_f():
    rows = np.zeros((1000, 5), np.float32)
    k_min, k_max, _ = clus.step1_bounds(rows, 42)
    assert k_min <= k_max
    assert k_max <= 1000 // 10, "k_max should respect the N/10 constraint"


def test_step1_bounds_high_dimensional():
    rows = np.zeros((50, 100), np.float32)
    k_min, k_max, _ = clus.step1_bounds(rows, 42)
    assert k_min >= 2
    assert k_max <= 25, "k_max should not exceed N/2"


# ---------------------------------------------------------------------------
# threshold from pilot (test_clustering.rs:302-409)
# ---------------------------------------------------------------------------


def _two_blobs(n_per, f, sep, scale, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(0.0, scale, (n_per, f))
    b = rng.normal(sep, scale, (n_per, f))
    return np.concatenate([a, b]).astype(np.float32)


def test_threshold_from_pilot_two_clusters():
    X = _two_blobs(25, 4, sep=10.0, scale=0.3)
    thr = clus.compute_threshold_from_pilot(X, 2, 42)
    assert np.isfinite(thr) and thr > 0
    # Must gate within-cluster (squared ~ f*scale²) vs inter-cluster
    # (squared ~ f*sep²) distances.
    assert thr < 4 * 10.0 ** 2


def test_threshold_from_pilot_large_variance():
    # Widely spread single line of points: the radius must come out
    # meaningfully large (test_clustering.rs:326-343 asserts only > 1.0 —
    # the inter-centroid fallback regime makes a monotone
    # variance-vs-radius relation intentionally NOT hold).
    noise = (np.arange(100, dtype=np.float32) - 50.0) * 0.5
    X = np.stack([noise, noise], axis=1)
    thr = clus.compute_threshold_from_pilot(X, 3, 42)
    assert thr > 1.0


def test_threshold_from_pilot_single_point_per_cluster():
    X = np.array([[0.0, 0.0], [5.0, 5.0], [10.0, 0.0]], np.float32)
    thr = clus.compute_threshold_from_pilot(X, 3, 42)
    assert np.isfinite(thr) and thr > 0


def test_threshold_very_tight_clusters_small():
    # Near-zero within-cluster spread: the fallback keys off the minimum
    # inter-centroid distance (test_clustering.rs:389-409).
    X = _two_blobs(20, 3, sep=8.0, scale=1e-4, seed=3)
    thr = clus.compute_threshold_from_pilot(X, 2, 42)
    min_inter_sq = 3 * 8.0 ** 2
    assert 0 < thr < min_inter_sq


# ---------------------------------------------------------------------------
# optimal-k regimes (test_clustering.rs:524-766)
# ---------------------------------------------------------------------------


def test_optimal_k_minimum_viable_dataset():
    X = np.array(
        [[0.0, 0.0], [0.1, 0.1], [10.0, 10.0], [10.1, 10.1]], np.float32
    )
    k, radius, ident = clus.compute_optimal_k(X, 42)
    assert k >= 2
    assert radius > 0
    assert ident <= 2


def test_optimal_k_very_high_dimensional():
    rng = np.random.default_rng(11)
    X = rng.random((50, 100)).astype(np.float32)
    k, radius, _ = clus.compute_optimal_k(X, 42)
    assert 2 <= k <= 25
    assert radius > 0


def test_optimal_k_mixed_scale_features():
    rng = np.random.default_rng(12)
    X = rng.random((100, 4)).astype(np.float32)
    X[:, 0] *= 1000.0          # one huge-scale feature
    X[:, 3] *= 0.001           # one tiny-scale feature
    k, radius, _ = clus.compute_optimal_k(X, 42)
    assert k >= 2
    assert np.isfinite(radius) and radius > 0


def test_optimal_k_degenerate_identical():
    X = np.full((40, 6), 3.0, np.float32)
    k, radius, _ = clus.compute_optimal_k(X, 42)
    assert k >= 2            # bounds still apply
    assert radius > 0        # fallback keeps the radius usable


def test_optimal_k_single_feature():
    rng = np.random.default_rng(13)
    X = np.sort(rng.random((60, 1)).astype(np.float32), axis=0)
    k, radius, _ = clus.compute_optimal_k(X, 42)
    assert k >= 1
    assert radius > 0


def test_optimal_k_consistent_with_seed():
    X = np.array(
        [[0.0, 0.0], [0.1, 0.1], [5.0, 5.0], [5.1, 5.1]], np.float32
    )
    k1, r1, id1 = clus.compute_optimal_k(X, 42)
    k2, r2, id2 = clus.compute_optimal_k(X, 42)
    assert k1 == k2
    assert abs(r1 - r2) < r1 * 0.5
    assert id1 == id2


def test_optimal_k_readme_example():
    # Two diagonal line segments far apart (test_clustering.rs:749-766).
    t = np.arange(50, dtype=np.float32) * 0.1
    rows = np.concatenate(
        [np.stack([t, t], 1), np.stack([10 + t, 10 + t], 1)]
    )
    k, radius, _ = clus.compute_optimal_k(rows, 42)
    assert k >= 2
    assert radius > 0


# ---------------------------------------------------------------------------
# builder cluster overrides (test_clustering.rs:917-1177)
# ---------------------------------------------------------------------------


def _uniform_rows(n, f, seed=0):
    return np.random.default_rng(seed).random((n, f)).astype(np.float32)


def test_with_cluster_max_clusters_override():
    rows = _uniform_rows(500, 50, seed=21)

    auto = (
        ArrowSpaceBuilder()
        .with_lambda_graph(0.5, 10, 2.0)
        .with_synthesis(TauMode.median())
        .with_seed(42)
        .with_sparsity_check(False)
    )
    aspace_auto, _ = auto.build(rows)
    assert aspace_auto.n_clusters < 50, "heuristic K should stay modest"

    manual = (
        ArrowSpaceBuilder()
        .with_lambda_graph(0.5, 10, 2.0)
        .with_synthesis(TauMode.median())
        .with_cluster_params(max_clusters=100, radius=0.8)
        .with_sparsity_check(False)
    )
    aspace_manual, _ = manual.build(rows)
    assert aspace_manual.n_clusters == 100, "manual override must be exact"

    lam = np.asarray(aspace_manual.lambdas)
    assert lam.max() - lam.min() > 0.5, "rich topology ⇒ wide λ spread"


def test_with_cluster_radius_tightness():
    # 5 well-separated tight clusters in 20 dims.
    rng = np.random.default_rng(31)
    rows = np.concatenate(
        [
            c * 5.0
            + rng.uniform(-0.3, 0.3, (50, 20)).astype(np.float32)
            for c in range(5)
        ]
    ).astype(np.float32)

    loose = (
        ArrowSpaceBuilder()
        .with_lambda_graph(0.5, 10, 2.0)
        .with_cluster_params(max_clusters=10, radius=50.0)
        .with_sparsity_check(False)
    )
    aspace_loose, _ = loose.build(rows)

    tight = (
        ArrowSpaceBuilder()
        .with_lambda_graph(0.5, 10, 2.0)
        .with_cluster_params(max_clusters=15, radius=2.0)
        .with_sparsity_check(False)
    )
    aspace_tight, _ = tight.build(rows)

    assert aspace_tight.n_clusters >= aspace_loose.n_clusters
    assert aspace_tight.n_clusters >= 5, "tight radius should find all blobs"
    assert abs(aspace_loose.cluster_radius - 50.0) < 0.1
    assert abs(aspace_tight.cluster_radius - 2.0) < 0.1


def test_dense_mesh_topology():
    rows = _uniform_rows(200, 100, seed=41)
    target_k, tight_radius = 50, 0.7

    builder = (
        ArrowSpaceBuilder()
        .with_lambda_graph(0.5, 10, 2.0)
        .with_cluster_params(max_clusters=target_k, radius=tight_radius)
        .with_dims_reduction(True, 0.2)
        .with_synthesis(TauMode.median())
        .with_sparsity_check(False)
    )
    aspace, _ = builder.build(rows)

    assert aspace.n_clusters == target_k
    assert abs(aspace.cluster_radius - tight_radius) < 0.01

    lam = np.asarray(aspace.lambdas)
    assert lam.max() - lam.min() > 0.5
    near_zero = int((lam < 0.01).sum())
    assert near_zero < 5, f"dense mesh should minimize λ≈0 items ({near_zero})"


# ---------------------------------------------------------------------------
# fast clustering — early JL projection (test_clustering.rs:768-915)
# ---------------------------------------------------------------------------


def test_fast_clustering_reduces_before_clustering():
    # Sparse one-hot rows in 4096 dims: clustering must happen in the
    # JL-reduced space, not the raw one.
    n, f = 200, 4096
    rows = np.zeros((n, f), np.float32)
    rows[np.arange(n), np.arange(n) % f] = 1.0

    b = (
        ArrowSpaceBuilder()
        .with_dims_reduction(True, 0.3)
        .with_seed(123)
        .with_sparsity_check(False)
    )
    t0 = time.time()
    aspace, cents = b.start_clustering_dim_reduce(rows)
    elapsed = time.time() - t0

    assert elapsed < 120, f"fast clustering took too long: {elapsed:.1f}s"
    assert aspace.projection is not None
    assert aspace.reduced_dim is not None and aspace.reduced_dim < f
    assert cents.shape[1] == aspace.reduced_dim, "centroids live in r-space"
    assert 0 < cents.shape[0] < n
    # The ArrowSpace keeps the ORIGINAL rows (builder.rs:323).
    assert aspace.data.shape == (n, f)


def test_fast_clustering_preserves_pairwise_distances():
    # JL lemma: projection is linear, so parallel vectors stay parallel
    # (cosine distance exactly preserved) and random-pair L2 distances are
    # preserved within the ε band.
    rng = np.random.default_rng(7)
    r0 = rng.standard_normal(5000).astype(np.float32)
    rows = np.stack([r0, 0.5 * r0, rng.standard_normal(5000).astype(np.float32)])

    b = (
        ArrowSpaceBuilder()
        .with_dims_reduction(True, 0.2)
        .with_seed(42)
        .with_cluster_params(max_clusters=2, radius=1e6)
        .with_sparsity_check(False)
    )
    aspace, _ = b.start_clustering_dim_reduce(rows)
    proj = aspace.projection
    assert proj is not None

    p = np.asarray(proj.project(rows))
    cos = lambda a, b: 1.0 - float(
        np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    )
    # Parallel pair: exactly zero cosine distance before AND after.
    assert cos(rows[0], rows[1]) < 1e-6
    assert cos(p[0], p[1]) < 1e-5
    # Random pair: JL with ε=0.2 → L2 preserved within ~25%.
    d_orig = float(np.linalg.norm(rows[0] - rows[2]))
    d_red = float(np.linalg.norm(p[0] - p[2]))
    assert abs(d_red - d_orig) / d_orig < 0.25


def test_fast_clustering_huge_dims_completes():
    # Dorothea-style sparse binary data at very high F; scaled from the
    # reference's 100k dims to keep CI time bounded — the blocked
    # projection path exercised is identical.
    n, f = 100, 16384
    rng = np.random.default_rng(17)
    rows = np.zeros((n, f), np.float32)
    for i in range(n):
        rows[i, rng.integers(0, f, 10)] = 1.0

    b = (
        ArrowSpaceBuilder()
        .with_dims_reduction(True, 0.3)
        .with_seed(99)
        .with_cluster_params(max_clusters=16, radius=0.5)
        .with_sparsity_check(False)
    )
    t0 = time.time()
    aspace, cents = b.start_clustering_dim_reduce(rows)
    elapsed = time.time() - t0
    assert elapsed < 180, f"huge-F fast clustering too slow: {elapsed:.1f}s"
    assert aspace.reduced_dim is not None and aspace.reduced_dim <= f // 2
    assert cents.shape[0] > 0


def test_fast_clustering_no_reduction_fallback():
    # F ≤ 1000: the early-projection path must fall through to raw-space
    # clustering with no projection stored (builder.rs:316-318).
    rows = _uniform_rows(120, 512, seed=5)
    b = (
        ArrowSpaceBuilder()
        .with_dims_reduction(True, 0.3)
        .with_seed(7)
        .with_cluster_params(max_clusters=8, radius=1e6)
        .with_sparsity_check(False)
    )
    aspace, cents = b.start_clustering_dim_reduce(rows)
    assert aspace.projection is None
    assert aspace.reduced_dim is None
    assert cents.shape[1] == 512
