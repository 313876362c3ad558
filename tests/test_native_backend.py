"""Native runtime + backend dispatch + CSR tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matternet_rs_tpu import backend, native
from matternet_rs_tpu import clustering as clus
from matternet_rs_tpu.ops import csr
from matternet_rs_tpu.sampling import make_sampler
from matternet_rs_tpu.utils.fixtures import make_gaussian_blob


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain)"
)


def test_native_matches_python_sequential():
    data = make_gaussian_blob(500, 0.3).astype(np.float32)
    cents, asg, counts, m2 = native.incremental_cluster(data, 15, 4.0, "legacy")
    out = clus._incremental_sequential(data, 15, 4.0, None)
    assert np.allclose(cents, out.centroids, atol=1e-5)
    assert (asg == out.assignments).all()
    assert (counts == out.sizes).all()


def test_native_stage_a_always_assigns():
    data = make_gaussian_blob(300, 1.0).astype(np.float32)
    cents, asg, counts, m2 = native.incremental_cluster(data, 5, 1.0, "stage_a")
    assert len(cents) <= 5
    assert (asg >= 0).all()            # stage A force-assigns
    assert counts.sum() == 300


def test_native_welford_variance_sane():
    rng = np.random.default_rng(0)
    data = rng.normal(3.0, 0.5, size=(1000, 4)).astype(np.float32)
    cents, asg, counts, m2 = native.incremental_cluster(data, 1, 1e9, "stage_a")
    var = m2[0] / counts[0]
    assert np.allclose(var, 0.25, atol=0.05)    # σ² = 0.25


def test_native_blocked_scan_fuzz_matches_python_sequential():
    """The native scan precomputes a block of item distances against the
    block-start centroid state and refreshes stale columns after each
    decision (native/clustering.cpp). That schedule must be EXACTLY
    sequential: fuzz random shapes/caps/radii — including coordinate-
    quantized data that manufactures near-ties at the radius thresholds —
    and pin assignments item-for-item against the Python sequential
    reference (itself decision-parity-tested vs src_legacy/clustering.rs
    semantics)."""
    rng = np.random.default_rng(123)
    for _ in range(15):
        n = int(rng.integers(50, 1200))
        f = int(rng.integers(2, 160))
        cap = int(rng.integers(2, 48))
        X = rng.normal(scale=rng.uniform(0.1, 3.0), size=(n, f)).astype(np.float32)
        if rng.random() < 0.3:
            X = np.round(X, 1)          # quantized coords → exact-tie pressure
        radius = float(rng.uniform(0.5, 3.0) * f * 0.1)
        cents, asg, counts, _ = native.incremental_cluster(X, cap, radius, "legacy")
        out = clus._incremental_sequential(X, cap, radius, None)
        assert (asg == out.assignments).all()
        assert len(cents) == len(out.centroids)
        assert np.allclose(cents, out.centroids, atol=1e-5)
        assert (counts == out.sizes).all()


def test_native_keep_mask():
    data = make_gaussian_blob(400, 0.3).astype(np.float32)
    keep = np.zeros(400, np.uint8)
    keep[::2] = 1
    cents, asg, counts, _ = native.incremental_cluster(data, 20, 4.0, "legacy", keep)
    assert (asg[1::2] == -1).all()     # skipped rows never assigned


def test_incremental_clustering_uses_native_with_simple_sampler():
    data = make_gaussian_blob(2000, 0.4).astype(np.float32)
    s = make_sampler("simple", 0.5, seed=1)
    out = clus.incremental_clustering(data, 20, 4.0, sampler=s)
    kept, discarded = s.get_stats()
    assert kept + discarded == 2000
    assert (out.assignments[out.assignments >= 0] < len(out.centroids)).all()


def test_native_nearest_centroid_batch():
    cents = np.array([[0.0, 0.0], [10.0, 0.0]], np.float64)
    idx, d2 = native.nearest_centroid_batch(
        np.array([[9.0, 0.0], [1.0, 0.0]], np.float32), cents
    )
    assert idx.tolist() == [1, 0]
    assert d2[0] == pytest.approx(1.0)


# --- backend dispatch ------------------------------------------------------


def test_backend_info_and_dispatch():
    info = backend.backend_info()
    assert info["device_count"] >= 1
    assert backend.get_device("cpu").platform == "cpu"
    out = backend.dispatch(lambda: jnp.ones(3).sum(), prefer="cpu")
    assert float(out) == 3.0


# --- CSR / ELL -------------------------------------------------------------


def test_sparse_graph_from_edges_laplacian():
    edges = [(0, 1, 1.0), (1, 2, 2.0), (0, 1, 0.5)]   # dup keeps max
    g = csr.SparseGraph.from_edges(edges, 3)
    L = np.asarray(g.to_laplacian_dense())
    assert L[0, 1] == pytest.approx(-1.0)
    assert L[1, 2] == pytest.approx(-2.0)
    assert np.allclose(L.sum(axis=1), 0.0, atol=1e-6)


def test_ell_spmv_matches_dense():
    rng = np.random.default_rng(2)
    W = rng.random((12, 12)) * (rng.random((12, 12)) > 0.6)
    W = np.maximum(W, W.T)
    np.fill_diagonal(W, 0.0)
    g = csr.SparseGraph.from_dense(W)
    x = jnp.asarray(rng.normal(size=12).astype(np.float32))
    got = np.asarray(csr.spmv_ell(g.indices, g.weights, x))
    want = W.astype(np.float32) @ np.asarray(x)
    assert np.allclose(got, want, atol=1e-4)
    # Laplacian SpMV
    L = np.diag(W.sum(1)) - W
    gotL = np.asarray(csr.laplacian_spmv_ell(g.indices, g.weights, x))
    assert np.allclose(gotL, L.astype(np.float32) @ np.asarray(x), atol=1e-4)


def test_ell_spmv_matrix_rhs():
    rng = np.random.default_rng(3)
    W = rng.random((8, 8)) * (rng.random((8, 8)) > 0.5)
    W = np.maximum(W, W.T); np.fill_diagonal(W, 0.0)
    g = csr.SparseGraph.from_dense(W)
    X = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    got = np.asarray(csr.spmv_ell(g.indices, g.weights, X))
    assert np.allclose(got, W.astype(np.float32) @ np.asarray(X), atol=1e-4)


def test_python_fallback_when_native_unavailable(monkeypatch):
    """The clustering entry points must work without the native library."""
    from matternet_rs_tpu import native as native_mod
    from matternet_rs_tpu import clustering as clus2
    from matternet_rs_tpu.pipeline.clustering import ClusteringConfig, ClusteringStage

    monkeypatch.setattr(native_mod, "incremental_cluster", lambda *a, **k: None)

    data = make_gaussian_blob(300, 0.3).astype(np.float32)
    out = clus2.incremental_clustering(data, 15, 4.0, deterministic=True)
    assert 3 <= len(out.centroids) <= 15

    stage_out = ClusteringStage(
        ClusteringConfig(max_clusters=15, radius_threshold=16.0, batch_size=64)
    ).execute(data)
    assert stage_out.state.num_centroids <= 15
    assert (stage_out.assignments >= 0).all()


def test_on_device_context():
    with backend.on_device("cpu"):
        x = jnp.ones(4) + 1
    assert float(x.sum()) == 8.0


def test_stage_a_fallback_bit_identical_to_native(monkeypatch):
    """The Python stage-A fallback must produce the SAME clustering as the
    native scan (it used to batch-snapshot assign and silently diverge on
    toolchain-free hosts)."""
    from matternet_rs_tpu import native as native_mod
    from matternet_rs_tpu.pipeline.clustering import (
        ClusteringConfig,
        ClusteringStage,
    )

    data = make_gaussian_blob(400, 0.5).astype(np.float32)
    cfg = ClusteringConfig(max_clusters=12, radius_threshold=10.0)
    with_native = ClusteringStage(cfg).execute(data)
    assert native_mod.get_lib() is not None, "native lib expected in CI"

    monkeypatch.setattr(native_mod, "incremental_cluster", lambda *a, **k: None)
    fallback = ClusteringStage(cfg).execute(data)

    np.testing.assert_array_equal(
        with_native.assignments, fallback.assignments
    )
    np.testing.assert_allclose(
        np.asarray(with_native.state.means),
        np.asarray(fallback.state.means), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(with_native.state.variances),
        np.asarray(fallback.state.variances), rtol=1e-4, atol=1e-5,
    )


def test_legacy_fallback_matches_native_with_sampler(monkeypatch):
    """Legacy-mode fallback with a SimpleRandomSampler keeps the SAME rows
    as the native path (one shared keep mask, counted once)."""
    from matternet_rs_tpu import clustering as clus2
    from matternet_rs_tpu import native as native_mod
    from matternet_rs_tpu.sampling import make_sampler

    data = make_gaussian_blob(500, 0.4).astype(np.float32)

    s1 = make_sampler("simple", 0.6, seed=9)
    native_out = clus2.incremental_clustering(
        data, 10, 5.0, sampler=s1, deterministic=True
    )
    n_decided_native = s1.stats.sampled + s1.stats.discarded

    monkeypatch.setattr(native_mod, "incremental_cluster", lambda *a, **k: None)
    s2 = make_sampler("simple", 0.6, seed=9)
    fb_out = clus2.incremental_clustering(
        data, 10, 5.0, sampler=s2, deterministic=True
    )
    # Same RNG consumption → same kept rows → identical clustering; stats
    # counted exactly once per row on both paths.
    assert s2.stats.sampled + s2.stats.discarded == n_decided_native == 500
    np.testing.assert_array_equal(native_out.assignments, fb_out.assignments)
    np.testing.assert_allclose(
        native_out.centroids, fb_out.centroids, rtol=1e-5, atol=1e-6
    )
