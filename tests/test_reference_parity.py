"""End-to-end ranking-parity harness: TPU build vs the NumPy f64 oracle.

The oracle (matternet_rs_tpu/oracle.py) is an independent double-precision
port of the reference's exact legacy pipeline (per-node kNN scans, two-pass
dispersion, full-scan ranking — src_legacy/{laplacian,taumode,core}.rs).
These tests run it side by side with the TPU build and assert:

* identical graph topology (nonzero pattern of W),
* λ agreement within f32 tolerance,
* exact top-10 result-set equality and Kendall-τ ≥ 0.99 over top-50,
* query-λ preparation parity,
* full-build (clustering included) equivalence.

This is the rebuild's analogue of the reference's staged-vs-monolithic and
cross-pipeline equivalence suites (src_legacy/tests/test_eigenmaps.rs:105-429).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from matternet_rs_tpu import oracle
from matternet_rs_tpu.builder import ArrowSpaceBuilder
from matternet_rs_tpu.core import TauMode
from matternet_rs_tpu.graph import GraphParams
from matternet_rs_tpu.ops import laplacian as lap_ops
from matternet_rs_tpu.ops import taumode as tau_ops


def _clustered_rows(n, f, n_centers=8, seed=1, spread=3.0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_centers, f)) * spread
    return (centers[rng.integers(0, n_centers, n)] + rng.normal(size=(n, f))).astype(
        np.float32
    ), rng


def _sample_centroids(rows, c, seed=0):
    rng = np.random.default_rng(seed)
    n = rows.shape[0]
    return np.stack(
        [rows[rng.choice(n, 20, replace=False)].mean(0) for _ in range(c)]
    ).astype(np.float32)


def _kendall_tau(order_a, order_b):
    """Kendall-τ between two rankings restricted to their common items."""
    common = [i for i in order_a if i in set(order_b)]
    ra = {i: r for r, i in enumerate(order_a)}
    rb = {i: r for r, i in enumerate(order_b)}
    xs = [ra[i] for i in common]
    ys = [rb[i] for i in common]
    n = len(common)
    if n < 2:
        return 1.0
    concordant = discordant = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (xs[i] - xs[j]) * (ys[i] - ys[j])
            if s > 0:
                concordant += 1
            elif s < 0:
                discordant += 1
    denom = concordant + discordant
    return 1.0 if denom == 0 else (concordant - discordant) / denom


# ---------------------------------------------------------------------------
# Oracle self-consistency: the vectorized fast path equals the reference scan
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode,param", [("median", 0.0), ("mean", 0.0),
                                        ("fixed", 0.3), ("percentile", 0.75)])
def test_oracle_fast_lambdas_match_scan(mode, param):
    rows, _ = _clustered_rows(120, 24, seed=3)
    cents = _sample_centroids(rows, 16, seed=4)
    _, L = oracle.build_laplacian_from_centroids(cents, 0.9, 6, 2.0, None, False)
    scan = oracle.taumode_lambdas(rows, L, mode, param)
    fast = oracle.taumode_lambdas_fast(rows, L, mode, param)
    np.testing.assert_allclose(fast, scan, rtol=0, atol=1e-12)


def test_oracle_dispersion_matches_tpu_direct():
    rows, _ = _clustered_rows(40, 16, seed=5)
    cents = _sample_centroids(rows, 12, seed=6)
    _, L = oracle.build_laplacian_from_centroids(cents, 0.9, 5, 2.0, None, False)
    for row in rows[:10]:
        g_or = oracle.item_dispersion(row, L)
        g_tpu = float(tau_ops.item_dispersion(jnp.asarray(row), jnp.asarray(L, jnp.float32)))
        assert abs(g_or - g_tpu) < 1e-5


# ---------------------------------------------------------------------------
# Graph topology + λ parity (fixed centroids isolate the graph/λ stages)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("normalise", [False, True])
@pytest.mark.parametrize("eps,topk", [(0.9, 8), (0.5, 5)])
def test_graph_topology_identical(normalise, eps, topk):
    rows, _ = _clustered_rows(400, 48, seed=11)
    cents = _sample_centroids(rows, 40, seed=12)
    params = GraphParams(eps=eps, k=topk, topk=topk, p=2.0, sigma=None,
                         normalise=normalise, sparsity_check=False)
    W_tpu = np.asarray(lap_ops.build_adjacency(jnp.asarray(cents).T, params))
    W_or = oracle.build_adjacency(cents.T, eps, topk, 2.0, None, normalise)
    t_tpu, t_or = W_tpu > 0, W_or > 0
    assert (t_tpu ^ t_or).sum() == 0, "graph topology diverged"
    # Weights agree at f32 resolution on the common support.
    np.testing.assert_allclose(
        np.where(t_tpu, W_tpu, 0.0), np.where(t_or, W_or, 0.0), atol=5e-6
    )


@pytest.mark.parametrize("taumode,otau", [
    (TauMode.median(), ("median", 0.0)),
    (TauMode.mean(), ("mean", 0.0)),
    (TauMode.percentile(0.9), ("percentile", 0.9)),
])
def test_lambda_parity_f32_tolerance(taumode, otau):
    rows, _ = _clustered_rows(600, 48, seed=21)
    cents = _sample_centroids(rows, 40, seed=22)
    params = GraphParams(eps=0.9, k=8, topk=8, p=2.0, sigma=None,
                         normalise=False, sparsity_check=False)
    gl = lap_ops.build_laplacian_from_k_cluster(jnp.asarray(cents), params, n_items=len(rows))
    raw_tpu = np.asarray(
        tau_ops.taumode_lambdas(jnp.asarray(rows), gl.matrix, taumode.mode, taumode.param)
    )
    oi = oracle.build_index(rows, cents, eps=0.9, topk=8, tau_mode=otau[0],
                            tau_param=otau[1], fast_lambdas=True)
    np.testing.assert_allclose(raw_tpu, oi.raw_lambdas, atol=2e-5)


# ---------------------------------------------------------------------------
# End-to-end ranking parity: full build (clustering → graph → λ → search)
# ---------------------------------------------------------------------------


def _parity_build(n=1000, f=64, seed=1, alpha=0.7):
    rows, rng = _clustered_rows(n, f, seed=seed)
    sub = rows[:200]
    radius = float(
        np.quantile(np.sum((sub[:, None] - sub[None, :]) ** 2, -1), 0.05)
    )
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(0.9, 8, 2.0, None)
        .with_cluster_params(max_clusters=48, radius=radius)
        .with_seed(7)
        .with_deterministic_clustering(True)
        .with_sampling(None)
    )
    aspace, gl = b.build(rows)
    oc_cents, _ = oracle.incremental_clustering(rows, b.cluster_max_clusters, b.cluster_radius)
    oi = oracle.build_index(
        rows, oc_cents, eps=b.lambda_eps, topk=b.lambda_topk, p=b.lambda_p,
        sigma=b.lambda_sigma, normalise=b.normalise, fast_lambdas=True,
    )
    return rows, rng, aspace, gl, oi, alpha


def test_full_build_ranking_parity():
    rows, rng, aspace, gl, oi, alpha = _parity_build()

    # Same clustering regime and λ values.
    assert aspace.n_clusters == len(oi.centroids)
    np.testing.assert_allclose(np.asarray(aspace.lambdas), oi.lambdas, atol=2e-5)

    # Ranking parity over perturbed-item queries.
    n = rows.shape[0]
    queries = rows[rng.choice(n, 20, replace=False)] + 0.1 * rng.normal(
        size=(20, rows.shape[1])
    ).astype(np.float32)
    exact_matches = 0
    for q in queries.astype(np.float32):
        ql_tpu = aspace.prepare_query_item(q, gl)
        ql_or = oi.prepare_query(q)
        assert abs(ql_tpu - ql_or) < 1e-4, "query-λ preparation diverged"

        top10_tpu = {i for i, _ in aspace.search_lambda_aware(q, ql_tpu, 10, alpha)}
        top10_or = {i for i, _ in oi.search(q, 10, alpha)}
        exact_matches += top10_tpu == top10_or

        order_tpu = [i for i, _ in aspace.search_lambda_aware(q, ql_tpu, 50, alpha)]
        order_or = [i for i, _ in oi.search(q, 50, alpha)]
        assert _kendall_tau(order_tpu, order_or) >= 0.99

    assert exact_matches >= 19, f"only {exact_matches}/20 exact top-10 set matches"


def test_full_build_ranking_parity_alpha_095():
    rows, rng, aspace, gl, oi, _ = _parity_build(seed=2)
    n = rows.shape[0]
    queries = rows[rng.choice(n, 10, replace=False)]
    for q in queries.astype(np.float32):
        ql = aspace.prepare_query_item(q, gl)
        top10_tpu = {i for i, _ in aspace.search_lambda_aware(q, ql, 10, 0.95)}
        top10_or = {i for i, _ in oi.search(q, 10, 0.95)}
        assert len(top10_tpu & top10_or) >= 9


def test_oracle_recall_matches_tpu_recall():
    """The λ-blend's recall vs pure-cosine ground truth is a *property of the
    formula*, not of the implementation: the oracle (= the reference's exact
    algorithm) and the TPU build must score the same recall@10. This resolves
    BASELINE.md's 'reference would match by design' claim with a measurement.
    """
    rows, rng, aspace, gl, oi, alpha = _parity_build(n=1200, seed=3)
    n = rows.shape[0]
    q_idx = rng.choice(n, 25, replace=False)
    queries = (rows[q_idx] + 0.05 * rng.normal(size=(25, rows.shape[1]))).astype(np.float32)

    # Pure-cosine ground truth (f64).
    Xn = rows.astype(np.float64)
    Xn /= np.maximum(np.linalg.norm(Xn, axis=1, keepdims=True), 1e-12)

    def recall(top10_fn):
        hits = total = 0
        for q in queries:
            qn = q.astype(np.float64)
            qn /= max(np.linalg.norm(qn), 1e-12)
            gt = set(np.argsort(-(Xn @ qn), kind="stable")[:10].tolist())
            got = top10_fn(q)
            hits += len(gt & got)
            total += 10
        return hits / total

    r_tpu = recall(
        lambda q: {
            i for i, _ in aspace.search_lambda_aware(
                q, aspace.prepare_query_item(q, gl), 10, alpha
            )
        }
    )
    r_or = recall(lambda q: {i for i, _ in oi.search(q, 10, alpha)})
    assert abs(r_tpu - r_or) <= 0.02, (r_tpu, r_or)


def test_sigma_and_p_variants_parity():
    rows, _ = _clustered_rows(300, 32, seed=31)
    cents = _sample_centroids(rows, 24, seed=32)
    for sigma, p in [(0.1, 2.0), (0.5, 1.0), (None, 3.0)]:
        params = GraphParams(eps=0.9, k=6, topk=6, p=p, sigma=sigma,
                             normalise=False, sparsity_check=False)
        W_tpu = np.asarray(lap_ops.build_adjacency(jnp.asarray(cents).T, params))
        W_or = oracle.build_adjacency(cents.T, 0.9, 6, p, sigma, False)
        assert ((W_tpu > 0) ^ (W_or > 0)).sum() == 0
        np.testing.assert_allclose(W_tpu, W_or, atol=5e-6)


# ---------------------------------------------------------------------------
# Energy-pipeline parity: TPU build vs the f64 oracle
# ---------------------------------------------------------------------------


def test_energy_pipeline_parity():
    """End-to-end energy-build parity: optical compression, diffusion +
    dispersion split, energy Laplacian, sub-centroid λ, item assignment,
    and the λ-distance search all match the f64 oracle (random projections
    are shared inputs — parity is over the math given identical
    projections, SURVEY §7.3)."""
    from matternet_rs_tpu import energymaps as em
    from matternet_rs_tpu.reduction import ImplicitProjection
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    rows = make_energy_test_dataset(400, 96, seed=6).astype(np.float32)
    b = (
        ArrowSpaceBuilder()
        .with_seed(11)
        .with_lambda_graph(1.0, 6)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=60, radius=25.0)
        .with_dims_reduction(True)
        .with_sampling(None)
        .with_expected_items(len(rows))
    )
    aspace, gl_energy = b.build_energy(rows)
    p = em.EnergyParams.from_builder(b)

    # Oracle build from the same stage-1 state: identical clustering scan,
    # then the SAME materialized projection matrices.
    oc_cents, _ = oracle.incremental_clustering(
        rows, b.cluster_max_clusters, b.cluster_radius
    )
    proj = None
    if aspace.projection is not None:
        proj = np.asarray(aspace.projection.matrix(), np.float64)
        oc_cents = oc_cents @ proj
    fdim = oc_cents.shape[1]
    proj2d = np.asarray(
        ImplicitProjection(fdim, 2, b.clustering_seed or 0).matrix(), np.float64
    )
    oi = oracle.build_energy_index(
        rows, oc_cents,
        eps=b.lambda_eps, k=b.lambda_k, topk=b.lambda_topk,
        optical_tokens=p.optical_tokens, trim_quantile=p.trim_quantile,
        eta=p.eta, steps=p.steps, split_quantile=p.split_quantile,
        neighbor_k=p.neighbor_k, split_tau=p.split_tau,
        proj2d=proj2d, projection=proj, normalise=b.normalise,
    )

    # Sub-centroid state matches.
    sc_tpu = np.asarray(aspace.sub_centroids)
    assert sc_tpu.shape == oi.sub_centroids.shape, (
        sc_tpu.shape, oi.sub_centroids.shape,
    )
    np.testing.assert_allclose(sc_tpu, oi.sub_centroids, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(aspace.subcentroid_lambdas), oi.subcentroid_lambdas, atol=2e-4
    )

    # Item → sub-centroid assignment matches (boundary ties may flip a few).
    agree = float(np.mean(np.asarray(aspace.centroid_map) == oi.centroid_map))
    assert agree >= 0.99, f"centroid_map agreement {agree}"

    # Search parity on self-queries and perturbed queries.
    rng = np.random.default_rng(4)
    for qi in rng.integers(0, len(rows), 8):
        q = rows[qi]
        res_tpu = [i for i, _ in em.search_energy(aspace, q, gl_energy, 10)]
        res_or = [i for i, _ in oi.search(q, 10, projection=proj)]
        assert res_tpu[0] == res_or[0]
        assert len(set(res_tpu) & set(res_or)) >= 9, (res_tpu, res_or)


# ---------------------------------------------------------------------------
# Staged pipeline (B0 → D) parity vs the f64 staged oracle
# ---------------------------------------------------------------------------


def test_staged_pipeline_parity():
    """The surfface staged chain matches the independent f64 port stage by
    stage from a shared stage-A state: preflight decision + arrays, MST
    edges + traversal order, RTS-smoothed state, Stage-C L_sym topology and
    values, Stage-D λ."""
    from matternet_rs_tpu import oracle_staged as osg
    from matternet_rs_tpu.pipeline.centroid import CentroidState
    from matternet_rs_tpu.pipeline.clustering import ClusteringConfig, ClusteringStage
    from matternet_rs_tpu.pipeline.laplacian import LaplacianConfig, LaplacianStage
    from matternet_rs_tpu.pipeline.mst import MSTConfig, MSTStage
    from matternet_rs_tpu.pipeline.preflight import PreflightConfig, PreflightStage
    from matternet_rs_tpu.pipeline.smoothing import SmoothingConfig, SmoothingStage
    from matternet_rs_tpu.pipeline import spectral

    rows, _ = _clustered_rows(400, 24, seed=9, spread=4.0)
    a_out = ClusteringStage(
        ClusteringConfig(max_clusters=24, radius_threshold=30.0)
    ).execute(rows)
    means = np.asarray(a_out.state.means, np.float64)
    variances = np.asarray(a_out.state.variances, np.float64)

    # --- TPU chain from the shared state ---------------------------------
    b0 = PreflightStage(PreflightConfig()).execute(a_out.state)
    state = CentroidState(
        means=b0.normalized_centroids, variances=b0.variances,
        counts=a_out.state.counts,
    )
    mst = MSTStage(MSTConfig()).execute(state)
    kal = SmoothingStage(SmoothingConfig()).execute(state, mst)
    lap = LaplacianStage(LaplacianConfig()).execute(kal.to_centroid_state())
    lam_tpu = spectral.compute_lambdas(lap.matrix, jnp.asarray(rows))

    # --- Oracle chain ------------------------------------------------------
    res = osg.run_staged(means, variances, rows)

    # B0: same normalization decision and arrays.
    assert res.was_normalized == b0.was_normalized
    np.testing.assert_allclose(
        np.asarray(b0.normalized_centroids), res.preflight_means, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(b0.variances), res.preflight_vars, atol=1e-6)

    # B1: identical MST edge set (undirected) and traversal order.
    tpu_edges = {frozenset((e.u, e.v)) for e in mst.mst_edges}
    or_edges = {frozenset((u, v)) for u, v, _ in res.mst.mst_edges}
    assert tpu_edges == or_edges
    np.testing.assert_array_equal(mst.centroid_order, res.mst.centroid_order)
    assert abs(mst.total_weight - res.mst.total_weight) < 1e-4 * max(
        res.mst.total_weight, 1.0
    )

    # B2: smoothed state matches at f32 tolerance.
    np.testing.assert_allclose(
        np.asarray(kal.smoothed_means), res.smoothed_means, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(kal.smoothed_variances), res.smoothed_vars, atol=1e-5
    )

    # C: identical topology, values at f32 tolerance.
    L_tpu = np.asarray(lap.matrix)
    assert ((np.abs(L_tpu) > 1e-9) ^ (np.abs(res.L) > 1e-9)).sum() == 0
    np.testing.assert_allclose(L_tpu, res.L, atol=1e-4)

    # D: λ parity for every item.
    np.testing.assert_allclose(lam_tpu, res.lambdas, atol=5e-4, rtol=1e-3)


def test_staged_pipeline_parity_trunk_aware_sqeuclidean():
    """Config variants: squared-Euclidean MST metric + trunk-aware RTS."""
    from matternet_rs_tpu import oracle_staged as osg
    from matternet_rs_tpu.pipeline.centroid import CentroidState
    from matternet_rs_tpu.pipeline.clustering import ClusteringConfig, ClusteringStage
    from matternet_rs_tpu.pipeline.mst import MSTConfig, MSTStage
    from matternet_rs_tpu.pipeline.preflight import PreflightConfig, PreflightStage
    from matternet_rs_tpu.pipeline.smoothing import SmoothingConfig, SmoothingStage

    rows, _ = _clustered_rows(300, 16, seed=12, spread=4.0)
    a_out = ClusteringStage(
        ClusteringConfig(max_clusters=20, radius_threshold=30.0)
    ).execute(rows)
    b0 = PreflightStage(PreflightConfig()).execute(a_out.state)
    state = CentroidState(
        means=b0.normalized_centroids, variances=b0.variances,
        counts=a_out.state.counts,
    )
    cfg = MSTConfig(distance_metric="sqeuclidean", thickness_weight="geometric_mean")
    mst = MSTStage(cfg).execute(state)
    kal = SmoothingStage(SmoothingConfig.trunk_aware(0.3)).execute(state, mst)

    res_mst = osg.mst_stage(
        np.asarray(b0.normalized_centroids, np.float64),
        np.asarray(b0.variances, np.float64),
        distance_metric="sqeuclidean", thickness_weight="geometric_mean",
    )
    assert {frozenset((e.u, e.v)) for e in mst.mst_edges} == {
        frozenset((u, v)) for u, v, _ in res_mst.mst_edges
    }
    np.testing.assert_array_equal(mst.centroid_order, res_mst.centroid_order)

    order = res_mst.centroid_order
    trunk_flags = np.zeros(len(order), bool)
    for t in range(1, len(order)):
        trunk_flags[t] = (int(order[t - 1]), int(order[t])) in res_mst.trunk_edges
    sm, sv = osg.kalman_rts(
        np.asarray(b0.normalized_centroids, np.float64)[order],
        np.asarray(b0.variances, np.float64)[order],
        trunk_flags, transition_model="trunk_aware", trunk_factor=0.3,
    )
    np.testing.assert_allclose(np.asarray(kal.smoothed_means), sm, atol=1e-4)
    np.testing.assert_allclose(np.asarray(kal.smoothed_variances), sv, atol=1e-5)


def test_hybrid_search_parity():
    """Hybrid search (λ-top-k ∪ high-cos ∪ semantic-top-1 with cosine
    precedence) matches the oracle item-for-item (core.rs:1197-1323)."""
    rows, rng, aspace, gl, oi, _ = _parity_build(n=800, seed=5)
    n = rows.shape[0]
    # Include exact self-queries (cos = 1 > 0.9999 exercises the
    # high-semantic branch) and perturbed ones.
    q_ids = rng.choice(n, 6, replace=False)
    queries = np.concatenate(
        [rows[q_ids], rows[q_ids] + 0.05 * rng.normal(size=(6, rows.shape[1])).astype(np.float32)]
    )
    for q in queries.astype(np.float32):
        ql = aspace.prepare_query_item(q, gl)
        res_tpu = aspace.search_lambda_aware_hybrid(q, ql, 10)
        res_or = oracle.search_lambda_aware_hybrid(
            rows, oi.lambdas, q, oi.prepare_query(q), 10, 0.7
        )
        ids_tpu = [i for i, _ in res_tpu]
        ids_or = [i for i, _ in res_or]
        assert ids_tpu[0] == ids_or[0]
        assert len(set(ids_tpu) & set(ids_or)) >= len(ids_or) - 1, (
            ids_tpu, ids_or,
        )


def test_sorted_index_band_query_parity():
    """Band query and expanding-window k-nearest over the sorted-λ index
    match the oracle port of sorted_index.rs (both the host and the
    device-resident index variants)."""
    from matternet_rs_tpu.index.sorted import DeviceSortedLambdas, SortedLambdas

    rng = np.random.default_rng(13)
    lam = rng.random(500).astype(np.float32)
    host = SortedLambdas.build_from(lam)
    dev = DeviceSortedLambdas.build_from(lam)

    for q, k, p in ((0.5, 10, 2.0), (0.03, 5, 1.0), (0.97, 20, 3.0)):
        expect = oracle.sorted_band_query(lam, q, k, p)
        got_h = host.range_bylambda(q, k, p)
        got_d = dev.range_bylambda(q, k, p)
        assert [i for i, _ in got_h] == [i for i, _ in expect]
        assert [i for i, _ in got_d] == [i for i, _ in expect]
        np.testing.assert_allclose(
            [v for _, v in got_h], [v for _, v in expect], atol=1e-6
        )

        expect_k = oracle.k_nearest_by_lambda(lam, q, k, p)
        got_k = host.k_nearest_by_lambda(q, k, p)
        assert [i for i, _ in got_k] == [i for i, _ in expect_k]
