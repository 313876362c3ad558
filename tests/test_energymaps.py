"""EnergyMaps pipeline tests (ports src_legacy/tests/test_energy_builder.rs
and test_energy_search.rs behaviours: build variants, self-retrieval,
no-cosine-dependence, λ distribution)."""

import numpy as np
import pytest

from matternet_rs_tpu import energymaps as em
from matternet_rs_tpu.builder import ArrowSpaceBuilder
from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset


def energy_builder(**kw) -> ArrowSpaceBuilder:
    b = ArrowSpaceBuilder().with_lambda_graph(1.0, 5).with_sparsity_check(False)
    b.with_cluster_params(max_clusters=30, radius=16.0)
    b.with_deterministic_clustering(True)
    b.with_dims_reduction(True)
    b.with_seed(11)
    for k, v in kw.items():
        setattr(b, k, v)
    return b


@pytest.fixture(scope="module")
def built():
    data = make_energy_test_dataset(200, 32, seed=5).astype(np.float32)
    b = energy_builder()
    params = em.EnergyParams(optical_tokens=20, neighbor_k=5, candidate_m=10)
    aspace, gl = b.build_energy(data, params)
    return aspace, gl, data


def test_energy_build_populates_fields(built):
    aspace, gl, data = built
    assert aspace.sub_centroids is not None
    assert aspace.subcentroid_lambdas is not None
    assert aspace.centroid_map is not None
    assert aspace.item_norms is not None
    assert gl.energy
    lam = np.asarray(aspace.lambdas)
    assert lam.shape == (200,)
    assert (lam >= 0).all() and (lam <= 1).all()


def test_energy_item_lambdas_come_from_subcentroids(built):
    aspace, _, _ = built
    sc_lams = np.asarray(aspace.subcentroid_lambdas)
    lam = np.asarray(aspace.lambdas)
    cmap = np.asarray(aspace.centroid_map)
    assert np.allclose(lam, sc_lams[cmap], atol=1e-6)


def test_energy_search_self_retrieval(built):
    aspace, gl, data = built
    hits = 0
    for i in (0, 50, 120, 199):
        res = em.search_energy(aspace, data[i], gl, k=10)
        assert len(res) == 10
        # Energy search is λ-cluster-grained: the query's own sub-centroid
        # group must be ranked first (distance 0 block).
        if any(j == i for j, _ in res):
            hits += 1
        assert res[0][1] <= res[-1][1]      # ascending distance
    assert hits >= 1


def test_energy_search_distances_nonnegative(built):
    aspace, gl, data = built
    res = em.search_energy(aspace, data[10], gl, k=5)
    for _, d in res:
        assert d >= -1e-9


def test_energy_requires_dims_reduction():
    data = make_energy_test_dataset(80, 16, seed=1).astype(np.float32)
    b = energy_builder(use_dims_reduction=False)
    with pytest.raises(ValueError, match="dim reduction"):
        b.build_energy(data)


def test_energy_rejects_spectral():
    data = make_energy_test_dataset(80, 16, seed=1).astype(np.float32)
    b = energy_builder(prebuilt_spectral=True)
    with pytest.raises(ValueError, match="Spectral"):
        b.build_energy(data)


# --- optical compression ---------------------------------------------------


def test_optical_compression_respects_budget():
    rng = np.random.default_rng(3)
    cents = rng.normal(size=(100, 16)).astype(np.float32)
    out = em.optical_compress_centroids(cents, 25, 0.1)
    assert out.shape[1] == 16
    assert out.shape[0] <= 100
    assert out.shape[0] >= 25       # budget filled (pool + top-up)


def test_optical_compression_skip_when_budget_large():
    rng = np.random.default_rng(4)
    cents = rng.normal(size=(10, 8)).astype(np.float32)
    out = em.optical_compress_centroids(cents, 50, 0.1)
    assert np.allclose(out, cents)


def test_adaptive_tokens_rule():
    assert em.EnergyParams.compute_adaptive_tokens(1000) == 100    # clamped
    assert em.EnergyParams.compute_adaptive_tokens(10_000) == 200
    assert em.EnergyParams.compute_adaptive_tokens(313_841) == 1120 or \
        em.EnergyParams.compute_adaptive_tokens(313_841) == 1119
    assert em.EnergyParams.compute_adaptive_tokens(10_000_000) == 2000


# --- diffusion + split -----------------------------------------------------


def test_diffusion_smooths_and_split_adds_rows():
    rng = np.random.default_rng(6)
    cents = rng.normal(size=(30, 12)).astype(np.float32)
    b = energy_builder()
    l0 = em.bootstrap_centroid_laplacian(cents, b)
    assert l0.matrix.shape == (12, 12)
    p = em.EnergyParams(optical_tokens=None, steps=3, neighbor_k=5)
    subs = em.diffuse_and_split_subcentroids(cents, l0, p)
    assert subs.shape[1] == 12
    assert subs.shape[0] >= 30      # splits add rows


def test_node_energy_and_dispersion_ranges():
    rng = np.random.default_rng(7)
    cents = rng.normal(size=(20, 10)).astype(np.float32)
    b = energy_builder()
    l0 = em.bootstrap_centroid_laplacian(cents, b)
    lam, gini = em.node_energy_and_dispersion(cents, l0, 5)
    assert (lam >= 0).all()
    assert ((gini >= 0) & (gini <= 1)).all()


def test_adaptive_weights_complementary():
    from matternet_rs_tpu.core import ArrowSpace

    aspace = ArrowSpace.from_items(np.ones((3, 4), np.float32))
    aspace.range_lambdas = 0.8
    wl, wd = em.adaptive_energy_weights(aspace)
    assert wl == pytest.approx(0.5 + 1.5 * 0.8)
    assert wl + wd == pytest.approx(2.5)


def test_energy_query_projection_highdim():
    """Energy search with active JL projection accepts original-dim queries
    (improvement over the reference's silent zip-truncation)."""
    rng = np.random.default_rng(9)
    data = make_energy_test_dataset(300, 128, seed=7).astype(np.float32)
    b = energy_builder()
    b.with_cluster_params(max_clusters=40, radius=120.0)
    aspace, gl = b.build_energy(
        data, em.EnergyParams(optical_tokens=20, neighbor_k=5)
    )
    if aspace.projection is None:
        pytest.skip("projection not triggered")
    # Original-dim query works; wrong-dim raises cleanly.
    res = em.search_energy(aspace, data[10], gl, k=5)
    assert len(res) == 5
    with pytest.raises(ValueError, match="dimension"):
        aspace.prepare_query_item(np.ones(33, np.float32), gl)


def test_search_energy_adaptive(built):
    aspace, gl, data = built
    res = em.search_energy_adaptive(aspace, data[30], gl, k=5)
    assert len(res) == 5
    dists = [d for _, d in res]
    assert dists == sorted(dists)
    assert res[0][0] == 30     # self-query: zero feature distance + own λ


def test_gaussian_hd_fixture_build():
    """make_gaussian_hd (100-D, 3 clusters + outliers) end-to-end."""
    from matternet_rs_tpu.utils.fixtures import make_gaussian_hd
    from matternet_rs_tpu import eigenmaps

    data = make_gaussian_hd(150, 0.5).astype(np.float32)
    assert data.shape == (150, 100)
    b = (ArrowSpaceBuilder().with_lambda_graph(1.0, 6).with_sparsity_check(False)
         .with_cluster_params(max_clusters=12, radius=30.0)
         .with_deterministic_clustering(True))
    aspace, gl = b.build(data)
    res = eigenmaps.search(aspace, data[99], gl, 5)
    assert res[0][0] == 99


# ---------------------------------------------------------------------------
# Deepened build-variant coverage (test_energy_builder.rs:14-410)
# ---------------------------------------------------------------------------


def test_centroid_map_all_items_valid(built):
    aspace, _, data = built
    cm = np.asarray(aspace.centroid_map)
    assert cm.shape[0] == data.shape[0]
    S = aspace.sub_centroids.shape[0]
    assert cm.min() >= 0 and cm.max() < S


def test_item_norms_cached_and_correct(built):
    aspace, _, data = built
    norms = np.asarray(aspace.item_norms)
    np.testing.assert_allclose(
        norms, np.linalg.norm(data, axis=1), rtol=1e-4, atol=1e-4
    )


def test_subcentroid_lambdas_normalized(built):
    aspace, _, _ = built
    sl = np.asarray(aspace.subcentroid_lambdas)
    assert sl.min() >= 0.0 and sl.max() <= 1.0
    assert len(np.unique(sl)) > 1, "sub-centroid λ degenerate"


def test_high_resolution_preset_builds_more_subcentroids():
    data = make_energy_test_dataset(200, 32, seed=5).astype(np.float32)
    b1, b2 = energy_builder(), energy_builder()
    a_def, _ = b1.build_energy(
        data, em.EnergyParams(optical_tokens=20, neighbor_k=5, candidate_m=10)
    )
    hi = em.EnergyParams.high_resolution(b2)
    hi.optical_tokens = 20
    a_hi, _ = b2.build_energy(data, hi)
    # High-resolution splits a larger dispersion quantile → ≥ as many
    # sub-centroids (reference EnergyParams::high_resolution semantics).
    assert a_hi.sub_centroids.shape[0] >= a_def.sub_centroids.shape[0]


def test_energy_build_deterministic():
    data = make_energy_test_dataset(150, 24, seed=6).astype(np.float32)
    outs = []
    for _ in range(2):
        b = energy_builder()
        p = em.EnergyParams(optical_tokens=16, neighbor_k=4, candidate_m=8)
        aspace, _ = b.build_energy(data, p)
        outs.append(
            (np.asarray(aspace.sub_centroids), np.asarray(aspace.lambdas))
        )
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_energy_search_k_exceeds_n(built):
    aspace, gl, data = built
    res = em.search_energy(aspace, data[0], gl, k=10 * len(data))
    assert len(res) == len(data)


def test_energy_search_deterministic(built):
    aspace, gl, data = built
    a = em.search_energy(aspace, data[3], gl, 10)
    b = em.search_energy(aspace, data[3], gl, 10)
    assert a == b


def test_diffusion_more_steps_smoother():
    """Heat diffusion monotonically reduces the Dirichlet energy of the
    row profiles against the feature graph (energymaps.rs:485-520)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    X = rng.normal(size=(30, 8)).astype(np.float32)
    b = energy_builder()
    l0 = em.bootstrap_centroid_laplacian(X, b)     # [F, F] feature graph
    L = np.asarray(l0.matrix, np.float64)

    def dirichlet(Y):
        return float(np.trace(Y @ L @ Y.T))

    Y1 = np.asarray(
        em._diffusion_kernel(jnp.asarray(X), l0.matrix, 0.1, jnp.zeros(2))
    ).astype(np.float64)
    Y2 = np.asarray(
        em._diffusion_kernel(jnp.asarray(X), l0.matrix, 0.1, jnp.zeros(8))
    ).astype(np.float64)
    assert dirichlet(Y2) < dirichlet(Y1) < dirichlet(X.astype(np.float64))


def test_optical_trim_removes_high_norm_rows_within_bin():
    """The norm-quantile trim is per grid bin (energymaps.rs:783-817):
    same-direction rows land in the same 2-D projection bin, and the
    highest-norm fifth is excluded from that bin's pooled mean."""
    rng = np.random.default_rng(8)
    base = rng.normal(size=16).astype(np.float32)
    low = np.stack([base * rng.uniform(0.9, 1.1) for _ in range(20)])
    high = np.stack([base * 50.0 for _ in range(5)])
    cents = np.concatenate([low, high])          # one bin, 25 members
    out = np.asarray(em.optical_compress_centroids(cents, 2, 0.2))
    # The pooled token for the shared bin sits near the low-norm mean —
    # untrimmed, the five 50× rows would drag its norm ~10× higher.
    norms = np.linalg.norm(out, axis=1)
    assert norms.min() < 2 * np.linalg.norm(base)


def test_energy_no_graph_rebuild_on_search(built):
    """Search must not mutate index state (cached norms/λ unchanged)."""
    aspace, gl, data = built
    lam0 = np.asarray(aspace.lambdas).copy()
    em.search_energy(aspace, data[5], gl, 5)
    np.testing.assert_array_equal(lam0, np.asarray(aspace.lambdas))


def test_energy_build_sets_lambda_stats(built):
    """Regression: range_lambdas must be real post-build (was left at the
    -1 sentinel → adaptive weights never adapted, add_items corrupted λ)."""
    aspace, _, _ = built
    assert aspace.range_lambdas > 0
    assert np.isfinite(aspace.min_lambdas)
    wl, wd = em.adaptive_energy_weights(aspace)
    assert wl != pytest.approx(0.5) or aspace.range_lambdas < 1e-9


def test_energy_add_items_extends_caches(built):
    """Regression: add_items on an energy index must extend item_norms /
    centroid_map and keep search working (was a broadcast crash)."""
    import copy

    aspace, gl, data = built
    a2 = copy.copy(aspace)
    n0 = a2.nitems
    a2.add_items(data[:3] + 0.01, gl)
    assert a2.nitems == n0 + 3
    assert a2.item_norms.shape[0] == n0 + 3
    assert a2.centroid_map.shape[0] == n0 + 3
    res = em.search_energy(a2, data[1], gl, k=5)
    assert len(res) == 5
    lam = np.asarray(a2.lambdas)
    assert (lam >= 0).all() and (lam <= 1).all()


# ---------------------------------------------------------------------------
# ported energy-search classes (test_energy_search.rs:290-405)
# ---------------------------------------------------------------------------


def test_energy_search_lambda_proximity(built):
    # Energy ranking is λ-distance ascending: the top hit's λ gap to the
    # query must not exceed the bottom hit's (test_energy_search.rs:290).
    aspace, gl, data = built
    q = data[0]
    res = em.search_energy(aspace, q, gl, k=10)
    assert len(res) == 10
    q_lambda = aspace.prepare_query_item(q, gl)
    lam = np.asarray(aspace.lambdas)
    top_diff = abs(q_lambda - lam[res[0][0]])
    bottom_diff = abs(q_lambda - lam[res[-1][0]])
    assert top_diff <= bottom_diff * 1.5 + 1e-9


def test_energy_search_score_monotonicity(built):
    aspace, gl, data = built
    res = em.search_energy(aspace, data[5], gl, k=20)
    ds = [d for _, d in res]
    assert all(a <= b + 1e-9 for a, b in zip(ds, ds[1:])), \
        "energy distances must be ascending"


def test_energy_search_empty_k(built):
    aspace, gl, data = built
    res = em.search_energy(aspace, data[0], gl, k=0)
    assert res == []


def test_energy_search_scores_finite_high_dim(built):
    aspace, gl, data = built
    res = em.search_energy(aspace, data[2], gl, k=8)
    assert len(res) == 8
    assert all(np.isfinite(d) for _, d in res)


# ---------------------------------------------------------------------------
# Banded two-stage energy batch search (searchsorted window on the sorted-λ
# index → exact top-C by |Δλ| → gather + cosine tie-break). TPU-native
# upgrade of energymaps.rs:628-674's scan: same ranking contract, a
# B·C·F gather instead of the full [N, F] corpus read per batch.
# ---------------------------------------------------------------------------


def _synthetic_energy_index(n=4096, f=32, n_sub=64, seed=0):
    """Energy-mode-shaped ArrowSpace with CONTROLLED λ tie groups
    (~n/n_sub items per sub-centroid λ), bypassing the builder so the
    banded window can be sized decisively."""
    import jax.numpy as jnp

    from matternet_rs_tpu.core import ArrowSpace

    rng = np.random.default_rng(seed)
    data = rng.normal(size=(n, f)).astype(np.float32)
    aspace = ArrowSpace.from_items(data)
    sub_c = rng.normal(size=(n_sub, f)).astype(np.float32)
    sc_lams = np.sort(rng.uniform(0.0, 1.0, n_sub)).astype(np.float32)
    assign = rng.integers(0, n_sub, n)
    aspace.sub_centroids = jnp.asarray(sub_c)
    aspace.subcentroid_lambdas = jnp.asarray(sc_lams)
    aspace.lambdas = jnp.asarray(sc_lams[assign])
    aspace.item_norms = jnp.sqrt(jnp.sum(aspace.data * aspace.data, axis=1))
    aspace.min_lambdas, aspace.max_lambdas, aspace.range_lambdas = (
        0.0, 1.0, 1.0
    )
    return aspace, data


def test_energy_banded_matches_full_scan_controlled_ties():
    # Kernel parity contract on controlled tie groups: window covers the
    # largest equal-λ run, so banded == full scan item-for-item.
    aspace, data = _synthetic_energy_index()
    rng = np.random.default_rng(3)
    Q = (
        data[rng.integers(0, len(data), 16)]
        + rng.normal(0, 0.05, (16, data.shape[1]))
    ).astype(np.float32)
    cand = aspace.max_lambda_tie_group() + 10
    assert 2 * cand <= aspace.nitems, "tie groups must be small by design"
    ref_idx, ref_d = em.search_energy_batch(aspace, Q, None, 10)
    got_idx, got_d = em.search_energy_batch(
        aspace, Q, None, 10, candidates=cand
    )
    np.testing.assert_array_equal(got_idx, ref_idx)
    np.testing.assert_allclose(got_d, ref_d, rtol=1e-6, atol=1e-9)


def test_energy_banded_auto_is_always_parity(built):
    # candidates="auto" sizes the window from max_lambda_tie_group() and
    # falls back to the full scan when banding cannot cover it — parity
    # holds unconditionally, including on this tie-dense real build.
    aspace, gl, data = built
    rng = np.random.default_rng(3)
    Q = (
        data[rng.integers(0, len(data), 8)]
        + rng.normal(0, 0.05, (8, data.shape[1]))
    ).astype(np.float32)
    ref_idx, ref_d = em.search_energy_batch(aspace, Q, gl, 10)
    got_idx, got_d = em.search_energy_batch(
        aspace, Q, gl, 10, candidates="auto"
    )
    np.testing.assert_array_equal(got_idx, ref_idx)
    np.testing.assert_allclose(got_d, ref_d, rtol=1e-6, atol=1e-9)


def test_energy_banded_auto_on_spread_corpus_engages_banding():
    # On a spread corpus auto-sizing actually bands (2·cand << N) and
    # stays exact.
    aspace, data = _synthetic_energy_index(n=8192, n_sub=256, seed=4)
    cand_auto = aspace.max_lambda_tie_group() + 10
    assert 2 * cand_auto < aspace.nitems // 4, "banding should engage"
    Q = data[:8]
    ref_idx, ref_d = em.search_energy_batch(aspace, Q, None, 10)
    got_idx, got_d = em.search_energy_batch(
        aspace, Q, None, 10, candidates="auto"
    )
    np.testing.assert_array_equal(got_idx, ref_idx)


def test_energy_banded_self_retrieval(built):
    aspace, gl, data = built
    idx, dist = em.search_energy_batch(
        aspace, data[:8], gl, 5, candidates=32
    )
    # Self-queries: distances ascending, and the self item appears in the
    # top hits (λ-distance 0 with cosine tie-break favouring itself).
    assert np.all(np.diff(dist, axis=1) >= -1e-9)
    for i in range(8):
        assert i in idx[i], f"self item {i} missing from banded top-5"


def test_energy_banded_extreme_lambda_queries(built):
    # Window clamping at the sorted-λ boundaries: queries whose λ lands at
    # the extremes still return k valid ascending results that match the
    # full scan.
    aspace, gl, data = built
    lam = np.asarray(aspace.lambdas)
    lo_q = data[int(np.argmin(lam))]
    hi_q = data[int(np.argmax(lam))]
    Q = np.stack([lo_q, hi_q])
    ref_idx, ref_d = em.search_energy_batch(aspace, Q, gl, 7)
    got_idx, got_d = em.search_energy_batch(aspace, Q, gl, 7, candidates=40)
    np.testing.assert_array_equal(got_idx, ref_idx)
    np.testing.assert_allclose(got_d, ref_d, rtol=1e-6, atol=1e-9)


def test_energy_banded_small_corpus_falls_back(built):
    # 2·candidates > N routes to the full scan (identical results, no
    # window underflow).
    aspace, gl, data = built
    ref_idx, ref_d = em.search_energy_batch(aspace, data[:4], gl, 5)
    got_idx, got_d = em.search_energy_batch(
        aspace, data[:4], gl, 5, candidates=aspace.nitems
    )
    np.testing.assert_array_equal(got_idx, ref_idx)


def test_energy_banded_auto_break_even_routing(monkeypatch):
    """candidates='auto' bands only when B·2C ≤ N/10 (the measured
    break-even — gathered window reads lose to the streamed full scan
    beyond that share); an explicit integer window is always honored."""
    aspace, data = _synthetic_energy_index(n=8192, n_sub=256, seed=4)
    calls = {"banded": 0}
    orig = em._batched_energy_banded_jit

    def counting(*a, **kw):
        calls["banded"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(em, "_batched_energy_banded_jit", counting)
    # Small batch (B=4, window share 448/8192 ≈ 5 % ≤ 10 %): must band.
    em.search_energy_batch(aspace, data[:4], None, 10, candidates="auto")
    assert calls["banded"] == 1
    # Large batch (pads to 256): B·2C > N/10 — auto must stream instead.
    em.search_energy_batch(aspace, data[:200], None, 10, candidates="auto")
    assert calls["banded"] == 1
    # Explicit window at the same large batch is honored (user override).
    em.search_energy_batch(aspace, data[:200], None, 10, candidates=64)
    assert calls["banded"] == 2


def test_energy_banded_candidates_floor_at_k(built):
    # candidates < k is bumped to k — still returns k results.
    aspace, gl, data = built
    idx, dist = em.search_energy_batch(aspace, data[:3], gl, 8, candidates=2)
    assert idx.shape == (3, 8)
    assert np.all(np.diff(dist, axis=1) >= -1e-9)


def test_mutation_refreshes_item_norms(built):
    # Review regression: superpose_items doubled an item's magnitude but
    # left the energy-mode item_norms cache stale, mis-ranking the item in
    # its equal-λ tie group's cosine tie-break.
    import copy

    aspace, gl, data = built
    sp = copy.deepcopy(aspace)
    before = float(np.asarray(sp.item_norms)[3])
    sp.superpose_items(3, 3, gl)        # item 3 doubles → norm doubles
    after = float(np.asarray(sp.item_norms)[3])
    assert after == pytest.approx(2.0 * before, rel=1e-5)


def test_max_lambda_tie_group_requires_lambdas():
    from matternet_rs_tpu.core import ArrowSpace

    sp = ArrowSpace.from_items(np.ones((4, 3), np.float32))
    with pytest.raises(RuntimeError, match="taumode|lambda"):
        sp.max_lambda_tie_group()
