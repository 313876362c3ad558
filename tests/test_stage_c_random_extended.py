"""Stage-C Laplacian randomized/structural tests — ports the remaining
assertion classes from ``/root/reference/surfface-core/src/tests/
test_random.rs`` not yet covered by ``test_pipeline.py``: off-diagonal
sign (:277-297), degree non-negativity (:299-308), diagonal semantics
(:210-256), spectral bounds per dataset (:330-391), nullspace (:393-453),
multi-clique sparsity (:455-482), k=1 tree-like graphs (:512-529), weight
threshold (:531-558), zero-variance regularizer rescue (:560-611), high-k
near-complete graphs (:613-638), and the dataset-driven structural suites
(:690-807)."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from matternet_rs_tpu.pipeline import (
    CentroidState,
    LaplacianConfig,
    LaplacianStage,
)
from matternet_rs_tpu.utils.fixtures import (
    make_energy_test_dataset,
    make_gaussian_blob,
    make_gaussian_hd,
    make_moons_hd,
)


def _state_from_rows(rows: np.ndarray, var_scale=0.3, seed=25, max_rows=24) -> CentroidState:
    """Reference helper port (test_random.rs:34-57): dataset rows become
    centroid means directly, with random variances in [1e-4, var_scale] —
    keeps the feature-profile Bhattacharyya weights in a comparable range
    (clustered blob centroids have profile distances so large the weights
    underflow, which is why the reference seeds states from raw rows)."""
    rows = np.asarray(rows, np.float32)[:max_rows]
    rng = np.random.default_rng(seed)
    c, f = rows.shape
    return CentroidState(
        means=jnp.asarray(rows),
        variances=jnp.asarray(
            rng.uniform(1e-4, var_scale, (c, f)).astype(np.float32)
        ),
        counts=jnp.asarray(rng.integers(10, 100, c), jnp.int32),
    )


def _rand_state(c, f, seed=0) -> CentroidState:
    rng = np.random.default_rng(seed)
    return CentroidState(
        means=jnp.asarray(rng.normal(0, 1, (c, f)).astype(np.float32)),
        variances=jnp.asarray(rng.uniform(0.05, 0.5, (c, f)).astype(np.float32)),
        counts=jnp.asarray(rng.integers(1, 20, c), jnp.int32),
    )


# ---------------------------------------------------------------------------
# entry-sign / diagonal / degree semantics
# ---------------------------------------------------------------------------


def test_off_diagonal_entries_non_positive():
    for normalize in (True, False):
        out = LaplacianStage(
            LaplacianConfig(k_neighbors=5, normalize=normalize)
        ).execute(_rand_state(8, 12))
        L = np.asarray(out.matrix)
        off = L - np.diag(np.diag(L))
        assert (off <= 1e-6).all(), "Laplacian off-diagonals must be ≤ 0"


def test_degrees_vector_non_negative():
    out = LaplacianStage(LaplacianConfig(k_neighbors=5)).execute(_rand_state(8, 12))
    assert (out.degrees >= 0).all()
    assert np.isfinite(out.degrees).all()


def test_normalized_diagonal_is_one_for_connected():
    out = LaplacianStage(
        LaplacianConfig(k_neighbors=5, normalize=True)
    ).execute(_rand_state(8, 12, seed=1))
    L = np.asarray(out.matrix)
    d = np.diag(L)
    connected = out.degrees > 1e-9
    np.testing.assert_allclose(d[connected], 1.0, atol=1e-4)


def test_unnormalized_diagonal_equals_degree():
    out = LaplacianStage(
        LaplacianConfig(k_neighbors=5, normalize=False)
    ).execute(_rand_state(8, 12, seed=2))
    L = np.asarray(out.matrix)
    np.testing.assert_allclose(np.diag(L), out.degrees, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# spectral bounds + nullspace per dataset
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "data",
    [
        make_gaussian_blob(200, 0.4),
        make_moons_hd(200, 0.1, 0.05, 10, 7),
        make_gaussian_hd(150, 0.5),
    ],
    ids=["blob", "moons", "gaussian_hd"],
)
def test_spectral_bounds_normalized(data):
    state = _state_from_rows(data, var_scale=0.5)
    out = LaplacianStage(LaplacianConfig(k_neighbors=5, normalize=True)).execute(state)
    assert out.nnz > 0, "graph must be non-trivial for the bounds to mean anything"
    L = np.asarray(out.matrix, np.float64)
    L = 0.5 * (L + L.T)
    eig = np.linalg.eigvalsh(L)
    assert eig.min() > -1e-4, f"λ_min={eig.min()}"
    assert eig.max() < 2.0 + 1e-3, f"λ_max={eig.max()}"


def test_nullspace_normalized_connected_graph():
    # Connected graph: exactly one ≈0 eigenvalue with eigvec ∝ √d.
    state = _rand_state(6, 10, seed=3)
    out = LaplacianStage(
        LaplacianConfig(k_neighbors=9, normalize=True)
    ).execute(state)
    L = np.asarray(out.matrix, np.float64)
    L = 0.5 * (L + L.T)
    eig, vec = np.linalg.eigh(L)
    if (out.degrees > 1e-9).all():
        assert eig[0] < 1e-4
        sqrt_d = np.sqrt(out.degrees)
        v = vec[:, 0]
        cos = abs(np.dot(v, sqrt_d)) / (np.linalg.norm(v) * np.linalg.norm(sqrt_d))
        assert cos > 0.99, "nullspace eigvec must align with √degree"


def test_unnormalized_constant_vector_in_nullspace():
    state = _rand_state(8, 12, seed=4)
    out = LaplacianStage(
        LaplacianConfig(k_neighbors=11, normalize=False)
    ).execute(state)
    L = np.asarray(out.matrix, np.float64)
    ones = np.ones(L.shape[0])
    assert np.abs(L @ ones).max() < 1e-3, "L·1 must vanish (row sums zero)"


# ---------------------------------------------------------------------------
# topology-shaping knobs
# ---------------------------------------------------------------------------


def test_sparsity_increases_with_smaller_k():
    state = _rand_state(10, 24, seed=5)
    sparsities = [
        LaplacianStage(LaplacianConfig(k_neighbors=k)).execute(state).sparsity
        for k in (2, 8, 20)
    ]
    assert sparsities[0] >= sparsities[1] >= sparsities[2]


def test_k_neighbors_one_produces_tree_like_graph():
    state = _rand_state(8, 16, seed=6)
    out = LaplacianStage(LaplacianConfig(k_neighbors=1)).execute(state)
    f = out.n_features
    # Each feature contributes one directed edge; after symmetrization the
    # off-diagonal nnz is ≤ 2·F (tree/forest regime).
    off_nnz = out.nnz - int((np.abs(np.diag(np.asarray(out.matrix))) > 1e-12).sum())
    assert off_nnz <= 2 * f


def test_weight_threshold_reduces_nnz():
    state = _rand_state(10, 24, seed=7)
    loose = LaplacianStage(
        LaplacianConfig(k_neighbors=8, weight_threshold=1e-9)
    ).execute(state)
    tight = LaplacianStage(
        LaplacianConfig(k_neighbors=8, weight_threshold=0.5)
    ).execute(state)
    assert tight.nnz <= loose.nnz


def test_variance_regularizer_prevents_nan_in_degenerate_case():
    c, f = 5, 10
    means = (np.arange(c * f).reshape(c, f) % f).astype(np.float32) / f
    state = CentroidState(
        means=jnp.asarray(means),
        variances=jnp.zeros((c, f), jnp.float32),      # degenerate
        counts=jnp.full(c, 10, jnp.int32),
    )
    out = LaplacianStage(
        LaplacianConfig(k_neighbors=3, variance_regularizer=1e-4)
    ).execute(state)
    assert np.isfinite(out.degrees).all()
    assert np.isfinite(np.asarray(out.matrix)).all()


def test_high_k_approaches_fully_connected():
    state = _rand_state(6, 10, seed=8)
    out = LaplacianStage(
        LaplacianConfig(k_neighbors=9, normalize=True)
    ).execute(state)
    assert out.sparsity < 0.8, f"k=F-1 should be near-complete: {out.sparsity:.2f}"


def test_summary_string_is_non_empty():
    out = LaplacianStage(LaplacianConfig(k_neighbors=3)).execute(_rand_state(5, 8))
    s = out.summary()
    assert "LaplacianOutput" in s and "nnz" in s


# ---------------------------------------------------------------------------
# dataset-driven structural suites (test_random.rs:690-807)
# ---------------------------------------------------------------------------


def test_gaussian_blob_10d_structural_invariants():
    state = _state_from_rows(make_gaussian_blob(15, 0.5), var_scale=0.3, seed=25, max_rows=15)
    out = LaplacianStage(LaplacianConfig(k_neighbors=4)).execute(state)
    L = np.asarray(out.matrix)
    assert out.n_features == state.feature_dim
    assert np.allclose(L, L.T, atol=1e-5)
    assert out.nnz > 0
    assert 0.0 <= out.sparsity <= 1.0


def test_gaussian_hd_100d_completes():
    state = _state_from_rows(make_gaussian_hd(12, 1.5), var_scale=0.5, seed=26, max_rows=12)
    out = LaplacianStage(LaplacianConfig(k_neighbors=5)).execute(state)
    assert np.isfinite(np.asarray(out.matrix)).all()
    assert out.n_features == state.feature_dim


def test_moons_two_cluster_structure():
    data = make_moons_hd(20, 0.1, 0.05, 12, 11)
    state = _state_from_rows(data, var_scale=0.4, seed=27, max_rows=20)
    out = LaplacianStage(LaplacianConfig(k_neighbors=4, normalize=True)).execute(state)
    L = np.asarray(out.matrix, np.float64)
    eig = np.linalg.eigvalsh(0.5 * (L + L.T))
    # Two-manifold data: spectrum stays in the normalized band and the
    # Fiedler value is small relative to the bulk.
    assert eig.min() > -1e-4 and eig.max() < 2.0 + 1e-3
    if len(eig) > 4:
        assert eig[1] < np.median(eig)


def test_energy_dataset_produces_valid_laplacian():
    data = make_energy_test_dataset(20, 32, seed=9)
    state = _state_from_rows(data, var_scale=0.4, seed=28, max_rows=20)
    out = LaplacianStage(LaplacianConfig(k_neighbors=6)).execute(state)
    assert np.isfinite(np.asarray(out.matrix)).all()
    assert (out.degrees >= 0).all()
    # Manifold data must yield a mostly-connected feature graph.
    connected_frac = float((out.degrees > 1e-9).mean())
    assert connected_frac > 0.5
