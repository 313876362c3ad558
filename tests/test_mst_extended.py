"""Remaining Stage-B1 MST reference test classes.

Ports of surfface-core/src/tests/test_mst.rs:9-467 classes not already
covered by tests/test_pipeline.py: the linear-chain fixture, the
thickness-weight function sweep, the k_neighbors candidate-graph bound,
per-edge property/helper invariants, and total-weight consistency.
"""

import numpy as np
import pytest

from matternet_rs_tpu.pipeline.centroid import CentroidState
from matternet_rs_tpu.pipeline.mst import (
    THICKNESS_GEOMETRIC,
    THICKNESS_MAX,
    THICKNESS_MEAN,
    THICKNESS_MIN,
    THICKNESS_NONE,
    Edge,
    MSTConfig,
    MSTStage,
)


def _state(means, variances=None, initial_variance=0.1):
    means = np.asarray(means, np.float32)
    st = CentroidState.from_clustering(
        means, np.ones(len(means), np.int64), initial_variance
    )
    if variances is not None:
        import jax.numpy as jnp

        st.variances = jnp.asarray(np.asarray(variances, np.float32))
    return st


def test_mst_basic_linear_chain():
    # test_mst.rs:9-47 — five collinear centroids: C-1 edges, full order,
    # thickness for every centroid.
    means = [[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0], [4.0, 0.0]]
    out = MSTStage().execute(_state(means))
    assert len(out.mst_edges) == 4, "MST should have C-1 edges"
    assert len(out.centroid_order) == 5, "order should cover all centroids"
    assert len(out.thickness) == 5
    # A chain's MST connects consecutive nodes — each edge spans distance 1
    # in euclidean terms; check no edge skips a node (endpoints adjacent).
    out_e = MSTStage(MSTConfig(distance_metric="euclidean")).execute(
        _state(means)
    )
    for e in out_e.mst_edges:
        assert abs(e.u - e.v) == 1, f"chain MST edge skips nodes: {e.u}-{e.v}"


def test_thickness_weight_functions():
    # test_mst.rs:274-328 — every φ(t_i, t_j) variant yields a full MST
    # with positive total weight on the 4-centroid fixture.
    means = np.ones((4, 3), np.float32)
    variances = np.array(
        [[0.5] * 3, [1.0] * 3, [0.2] * 3, [0.8] * 3], np.float32
    )
    for weight in (
        THICKNESS_MEAN,
        THICKNESS_MIN,
        THICKNESS_MAX,
        THICKNESS_GEOMETRIC,
        THICKNESS_NONE,
    ):
        cfg = MSTConfig(thickness_weight=weight, k_neighbors=3)
        out = MSTStage(cfg).execute(_state(means, variances))
        assert len(out.mst_edges) == 3, f"MST should have 3 edges for {weight}"
        assert out.total_weight > 0.0, f"total weight positive for {weight}"


def test_thickness_weight_closed_forms():
    # The φ functions themselves (mst.rs:60-75): cost = d·φ(t_i, t_j).
    d, ti, tj = 2.0, 0.5, 0.8
    expect = {
        THICKNESS_MEAN: d * (ti + tj) / 2.0,
        THICKNESS_MIN: d * min(ti, tj),
        THICKNESS_MAX: d * max(ti, tj),
        THICKNESS_GEOMETRIC: d * float(np.sqrt(ti * tj)),
        THICKNESS_NONE: d,
    }
    for weight, want in expect.items():
        stage = MSTStage(MSTConfig(thickness_weight=weight))
        got = stage._edge_cost(d, ti, tj)
        assert got == pytest.approx(want, rel=1e-6), weight


def test_mst_k_neighbors_parameter():
    # test_mst.rs:329-365 — candidate graph has ~k directed edges per node
    # and the MST still spans.
    rng = np.random.default_rng(7)
    means = rng.uniform(0.0, 1.0, size=(10, 5)).astype(np.float32)
    for k in (2, 4, 8):
        out = MSTStage(MSTConfig(k_neighbors=k)).execute(_state(means))
        avg_edges = len(out.candidate_edges) / 10.0
        assert 0.8 * k <= avg_edges <= 1.2 * k, (
            f"~{k} edges/node expected, got {avg_edges:.1f}"
        )
        assert len(out.mst_edges) == 9, "MST should have 9 edges"


def test_mst_edge_properties():
    # test_mst.rs:399-441 — positive costs, non-negative distances,
    # positive thicknesses, and the Edge helper methods.
    rng = np.random.default_rng(3)
    means = rng.uniform(0.0, 1.0, size=(5, 3)).astype(np.float32)
    out = MSTStage().execute(_state(means))
    for e in out.mst_edges:
        assert e.cost > 0.0
        assert e.distance >= 0.0
        assert e.thickness_u > 0.0 and e.thickness_v > 0.0
        assert e.contains(e.u) and e.contains(e.v)
        assert e.other(e.u) == e.v
        assert e.other(e.v) == e.u
    probe = Edge(1, 2, 1.0, 0.1, 0.1, 1.0)
    assert not probe.contains(0)
    assert probe.other(0) is None


def test_mst_total_weight_consistency():
    # test_mst.rs:442-467 — total_weight equals the sum of MST edge costs.
    rng = np.random.default_rng(11)
    means = rng.uniform(0.0, 1.0, size=(7, 4)).astype(np.float32)
    out = MSTStage().execute(_state(means))
    manual = sum(e.cost for e in out.mst_edges)
    assert out.total_weight == pytest.approx(manual, abs=1e-4)


def test_dfs_ordering_completeness():
    # test_mst.rs:211-243 — the 1-D ordering is a permutation of all nodes.
    rng = np.random.default_rng(5)
    means = rng.normal(size=(12, 6)).astype(np.float32)
    out = MSTStage().execute(_state(means))
    order = out.centroid_order.tolist()
    assert sorted(order) == list(range(12))
    assert len(set(order)) == 12


# ---------------------------------------------------------------------------
# CentroidState unit classes (surfface-core/src/tests/test_centroid.rs)
# ---------------------------------------------------------------------------


def test_centroid_manual_conversion():
    # test_centroid.rs:44-112 — means/variances/counts preserved verbatim.
    means = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], np.float32)
    st = CentroidState.from_clustering(means, np.array([4, 2, 9]), 0.25)
    np.testing.assert_allclose(np.asarray(st.means), means)
    np.testing.assert_allclose(np.asarray(st.variances), 0.25)
    assert np.asarray(st.counts).tolist() == [4, 2, 9]
    assert st.num_centroids == 3 and st.feature_dim == 2


def test_centroid_thickness():
    # test_centroid.rs:113-132 — thickness = trace(P)/F per centroid.
    means = np.zeros((2, 3), np.float32)
    st = _state(means, variances=[[0.1, 0.2, 0.3], [1.0, 2.0, 3.0]])
    np.testing.assert_allclose(
        np.asarray(st.get_thickness()), [0.2, 2.0], rtol=1e-6
    )


def test_centroid_feature_space_transpose():
    # test_centroid.rs:133-146 — [C, F] → [F, C] views.
    means = np.arange(6, dtype=np.float32).reshape(2, 3)
    st = _state(means, variances=means + 10.0)
    np.testing.assert_allclose(np.asarray(st.to_feature_nodes()), means.T)
    np.testing.assert_allclose(
        np.asarray(st.get_feature_variances()), means.T + 10.0
    )


def test_centroid_regularize_variances():
    # test_centroid.rs:147-165 — (var + ε) clamped to [min, max]; returns a
    # new functional state.
    means = np.zeros((1, 4), np.float32)
    st = _state(means, variances=[[0.0, 0.5, 5.0, 1e-9]])
    reg = st.regularize_variances(eps=1e-3, min_var=0.01, max_var=2.0)
    np.testing.assert_allclose(
        np.asarray(reg.variances), [[0.01, 0.501, 2.0, 0.01]], rtol=1e-5
    )
    # original untouched (functional semantics)
    np.testing.assert_allclose(
        np.asarray(st.variances)[0, 2], 5.0, rtol=1e-6
    )
