"""Extended Kalman-RTS smoothing tests — ports the reference assertion
classes from ``/root/reference/surfface-core/src/tests/test_smoothing.rs``
that ``test_pipeline.py`` did not yet cover: variance reduction
(:122-160), count preservation (:162-177), the smoothness/total-variation
property (:179-205), single-centroid identity (:262-299), forward/backward
RTS consistency (:380-447), disconnected-MST robustness (:479-509), and
config-variant ordering (:511-527)."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from matternet_rs_tpu.pipeline import (
    CentroidState,
    SmoothingConfig,
    SmoothingStage,
)
from matternet_rs_tpu.pipeline.mst import Edge, MSTOutput
from matternet_rs_tpu.pipeline.smoothing import TRUNK_AWARE


def create_noisy_centroids(c: int, f: int, noise: float, seed=0) -> CentroidState:
    """A smooth underlying trajectory + iid Gaussian noise (the reference's
    ``create_noisy_centroids`` helper, test_smoothing.rs:20-60)."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0.0, 3.0, c, dtype=np.float32)[:, None]
    base = np.sin(t + np.arange(f, dtype=np.float32)[None, :])
    means = base + rng.normal(0.0, noise, (c, f)).astype(np.float32)
    variances = rng.uniform(0.1, 0.4, (c, f)).astype(np.float32)
    counts = rng.integers(1, 20, c)
    return CentroidState(
        means=jnp.asarray(means, jnp.float32),
        variances=jnp.asarray(variances),
        counts=jnp.asarray(counts, jnp.int32),
    )


def create_linear_mst(c: int) -> MSTOutput:
    """Path graph 0-1-…-(c-1) in identity order (test_smoothing.rs:63-90)."""
    edges = [
        Edge(u=i, v=i + 1, distance=1.0, thickness_u=1.0, thickness_v=1.0, cost=1.0)
        for i in range(c - 1)
    ]
    return MSTOutput(
        candidate_edges=[],
        mst_edges=edges,
        centroid_order=np.arange(c),
        trunk_nodes=np.array([], np.int64),
        trunk_edges=set(),
        thickness=np.ones(c, np.float32),
        total_weight=float(len(edges)),
        nodes_in_mst=c,
    )


def test_kalman_reduces_variance():
    state = create_noisy_centroids(10, 3, 0.5)
    out = SmoothingStage(SmoothingConfig()).execute(state, create_linear_mst(10))
    assert 0.0 < out.variance_reduction < 1.0
    raw_mean = float(np.mean(np.asarray(state.variances)))
    smooth_mean = float(np.mean(np.asarray(out.smoothed_variances)))
    assert smooth_mean < raw_mean


def test_kalman_preserves_counts():
    state = create_noisy_centroids(5, 2, 0.3)
    out = SmoothingStage().execute(state, create_linear_mst(5))
    # Identity MST order ⇒ counts pass through unchanged.
    assert np.asarray(out.counts).tolist() == np.asarray(state.counts).tolist()


def test_kalman_smoothness_property():
    state = create_noisy_centroids(20, 1, 1.0, seed=2)
    out = SmoothingStage(SmoothingConfig.aggressive()).execute(
        state, create_linear_mst(20)
    )
    tv = lambda v: float(np.abs(np.diff(v[:, 0])).sum())
    raw_tv = tv(np.asarray(state.means))
    smooth_tv = tv(np.asarray(out.smoothed_means))
    assert smooth_tv < raw_tv, f"TV must drop: raw={raw_tv:.3f} smooth={smooth_tv:.3f}"


def test_kalman_single_centroid():
    state = create_noisy_centroids(1, 3, 0.2)
    mst = MSTOutput(
        candidate_edges=[], mst_edges=[], centroid_order=np.array([0]),
        trunk_nodes=np.array([], np.int64), trunk_edges=set(),
        thickness=np.array([1.0], np.float32), total_weight=0.0, nodes_in_mst=1,
    )
    out = SmoothingStage().execute(state, mst)
    np.testing.assert_allclose(
        np.asarray(out.smoothed_means), np.asarray(state.means), atol=1e-5
    )
    assert len(out.smoothing_gains) == 0


def test_kalman_forward_backward_consistency():
    c, f = 8, 2
    state = create_noisy_centroids(c, f, 0.4, seed=3)
    out = SmoothingStage().execute(state, create_linear_mst(c))

    fv = np.asarray(out.filtered_variances)
    sv = np.asarray(out.smoothed_variances)
    # RTS optimality: P_smooth ≤ P_filt elementwise.
    assert (sv <= fv + 1e-5).all()

    raw = np.asarray(state.means)
    fm = np.asarray(out.filtered_means)
    sm = np.asarray(out.smoothed_means)
    lo = np.minimum(raw, fm) - 1.0
    hi = np.maximum(raw, fm) + 1.0
    assert (sm >= lo).all() and (sm <= hi).all()

    # Smoothed trajectory is more consistent: lower std of step diffs.
    step_std = lambda m: float(np.std(np.diff(m, axis=0)))
    assert step_std(sm) <= step_std(fm) + 1e-5


def test_kalman_disconnected_mst():
    c = 5
    state = create_noisy_centroids(c, 2, 0.3, seed=4)
    mst = MSTOutput(
        candidate_edges=[],
        mst_edges=[Edge(0, 1, 1.0, 1.0, 1.0, 1.0)],
        centroid_order=np.arange(c),
        trunk_nodes=np.array([], np.int64),
        trunk_edges=set(),
        thickness=np.ones(c, np.float32),
        total_weight=1.0,
        nodes_in_mst=2,
    )
    out = SmoothingStage().execute(state, mst)
    assert np.isfinite(out.variance_reduction)
    assert out.to_centroid_state().num_centroids == c


def test_kalman_config_variants():
    default = SmoothingConfig()
    conservative = SmoothingConfig.conservative()
    aggressive = SmoothingConfig.aggressive()
    trunk = SmoothingConfig.trunk_aware(0.5)
    assert conservative.observation_noise < default.observation_noise
    assert aggressive.observation_noise > default.observation_noise
    assert aggressive.process_noise < default.process_noise
    assert trunk.transition_model == TRUNK_AWARE


def test_kalman_variance_bounds_respected():
    # Floor/ceiling clamps hold even under extreme inputs
    # (test_smoothing.rs:301-358 numerical-stability class).
    c, f = 6, 2
    rng = np.random.default_rng(5)
    state = CentroidState(
        means=jnp.asarray(rng.normal(0, 1e3, (c, f)).astype(np.float32)),
        variances=jnp.asarray(
            np.full((c, f), 1e8, np.float32)
        ),
        counts=jnp.ones(c, jnp.int32),
    )
    cfg = SmoothingConfig()
    out = SmoothingStage(cfg).execute(state, create_linear_mst(c))
    sv = np.asarray(out.smoothed_variances)
    assert np.isfinite(sv).all()
    assert (sv <= cfg.variance_ceiling + 1e-3).all()
    assert (sv >= cfg.variance_floor - 1e-9).all()
