"""Energy retrieval quality at a LARGER fixture (N ≥ 5k) — the reference
runs its energy search suite at multiple scales
(/root/reference/src_legacy/tests/test_energy_search.rs:15-751: self
retrieval, precision/recall vs the standard search, λ-distribution and
build-time comparisons, no-cosine-dependence); the round-3 suite covered
these intents only at N=200 (VERDICT r3 #8).

One module-scoped N=6000 build keeps the added wall-clock to a single
energy pipeline run; every test reads from it.
"""

import time

import numpy as np
import pytest

from matternet_rs_tpu import energymaps as em
from matternet_rs_tpu.builder import ArrowSpaceBuilder
from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

N, F, K = 6000, 32, 10
PER = N // 5                       # fixture: 5 clusters, items in order


def _builder():
    return (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 5)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=40, radius=16.0)
        .with_deterministic_clustering(True)
        .with_dims_reduction(True)
        .with_expected_items(N)
        .with_seed(11)
    )


@pytest.fixture(scope="module")
def built():
    data = make_energy_test_dataset(N, F, seed=7).astype(np.float32)
    labels = np.minimum(np.arange(N) // PER, 4)
    t0 = time.perf_counter()
    aspace, gl = _builder().build_energy(data)
    energy_build_s = time.perf_counter() - t0
    return aspace, gl, data, labels, energy_build_s


@pytest.fixture(scope="module")
def eigen_built():
    data = make_energy_test_dataset(N, F, seed=7).astype(np.float32)
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 5)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=40, radius=16.0)
        .with_deterministic_clustering(True)
        .with_seed(11)
    )
    t0 = time.perf_counter()
    aspace, gl = b.build(data)
    eigen_build_s = time.perf_counter() - t0
    return aspace, gl, eigen_build_s


def test_energy_self_retrieval_at_scale(built):
    """Exact corpus rows must retrieve themselves in the top-10
    (test_energy_search.rs self-retrieval, at 30× the round-3 fixture)."""
    aspace, gl, data, _labels, _ = built
    rng = np.random.default_rng(3)
    probe = rng.integers(0, N, 128)
    idx, _ = em.search_energy_batch(aspace, data[probe], gl, K)
    hits = np.mean([p in idx[r].tolist() for r, p in enumerate(probe)])
    assert hits >= 0.95, f"self-retrieval@10 {hits:.3f}"


def test_energy_precision_at_10_vs_labels(built):
    """Noised intra-cluster queries: the energy ranking must keep most of
    the top-10 inside the query's own cluster (the fixture's clusters are
    10 units apart with ±0.8 noise — cross-cluster results are quality
    failures, not ties)."""
    aspace, gl, data, labels, _ = built
    rng = np.random.default_rng(5)
    probe = rng.integers(0, PER * 5, 64)
    Q = data[probe] + rng.normal(0, 0.05, (64, F)).astype(np.float32)
    idx, _ = em.search_energy_batch(aspace, Q.astype(np.float32), gl, K)
    prec = np.mean(
        [(labels[idx[r]] == labels[p]).mean() for r, p in enumerate(probe)]
    )
    assert prec >= 0.8, f"energy precision@10 vs labels {prec:.3f}"


def test_energy_vs_standard_search_quality(built, eigen_built):
    """Reference comparison (test_energy_search.rs precision/recall vs
    standard search): on the SAME labeled queries, the cosine-free energy
    ranking must reach at least ~85% of the eigen (blended) pipeline's
    label precision at this scale."""
    aspace_e, gl_e, data, labels, _ = built
    aspace_s, gl_s, _ = eigen_built
    rng = np.random.default_rng(6)
    probe = rng.integers(0, PER * 5, 48)
    Q = (data[probe] + rng.normal(0, 0.05, (48, F))).astype(np.float32)

    e_idx, _ = em.search_energy_batch(aspace_e, Q, gl_e, K)
    s_idx, _ = aspace_s.search_batch(Q, gl_s, K)
    p_energy = np.mean(
        [(labels[e_idx[r]] == labels[p]).mean() for r, p in enumerate(probe)]
    )
    p_eigen = np.mean(
        [(labels[s_idx[r]] == labels[p]).mean() for r, p in enumerate(probe)]
    )
    assert p_energy >= 0.85 * p_eigen, (
        f"energy {p_energy:.3f} vs eigen {p_eigen:.3f}"
    )


def test_energy_lambda_distribution_structured(built):
    """λ structure at scale (test_energy_search.rs λ-distribution checks):
    item λ take exactly the sub-centroid values (quantized), span a
    nondegenerate range, and every cluster's λ spread is a small fraction
    of the global range (spectrally-coherent clusters)."""
    aspace, _gl, _data, labels, _ = built
    lam = np.asarray(aspace.lambdas, np.float64)
    sc = np.asarray(aspace.subcentroid_lambdas, np.float64)
    # Every item λ is (to f32 representation) one of the sub-centroid λ.
    assert (np.abs(lam[:, None] - sc[None, :]).min(axis=1) < 1e-6).all()
    assert lam.max() - lam.min() > 0.1
    spreads = [lam[labels == c].std() for c in range(5)]
    assert np.mean(spreads) < (lam.max() - lam.min()), "degenerate spread"


def test_energy_ranking_is_pure_lambda_distance_at_scale(built):
    """No-cosine-dependence (energymaps.rs:628-674): given the prepared
    query λ, the returned distance multiset must be EXACTLY the k smallest
    |λ_item − λ_q| over the corpus — item magnitudes and cosine enter only
    as the within-tie-group order, never the member set. (Query-λ
    preparation itself is nearest-sub-centroid by L2 and is legitimately
    magnitude-sensitive — the reference's is too, core.rs:872-909.)"""
    aspace, gl, data, _labels, _ = built
    rng = np.random.default_rng(8)
    Q = data[rng.integers(0, N, 32)]
    idx, dist = em.search_energy_batch(aspace, Q, gl, K)
    lam = np.asarray(aspace.lambdas, np.float64)
    sc = np.asarray(aspace.subcentroid_lambdas, np.float32)
    q_lams = np.asarray(
        [sc[np.argmin(((np.asarray(aspace.sub_centroids) - q) ** 2).sum(1))]
         for q in Q]
    )
    for r in range(len(Q)):
        want = np.sort(np.abs(lam - q_lams[r]))[:K]
        np.testing.assert_allclose(np.sort(dist[r]), want, atol=1e-6)


def test_energy_build_time_same_magnitude_as_eigen(built, eigen_built):
    """Build-time comparison (test_energy_search.rs records the ratio):
    the energy pipeline's extra stages (compression, diffusion, split,
    assignment) must stay within an order of magnitude of the eigen
    build at this scale — a regression here means an accidental
    O(N·S·F) blowup in the assignment stage."""
    *_, energy_build_s = built
    *_, eigen_build_s = eigen_built
    assert energy_build_s < 10 * max(eigen_build_s, 1.0), (
        f"energy {energy_build_s:.1f}s vs eigen {eigen_build_s:.1f}s"
    )


def test_energy_banded_matches_full_scan_at_scale(built):
    """The banded two-stage dispatch must reproduce the full-scan top-10
    (overlap, not index order — documented tie class) at N=6000."""
    aspace, gl, data, _labels, _ = built
    rng = np.random.default_rng(9)
    Q = data[rng.integers(0, N, 32)]
    full_idx, _ = em.search_energy_batch(aspace, Q, gl, K)
    cand = aspace.max_lambda_tie_group() + K
    band_idx, _ = em.search_energy_batch(aspace, Q, gl, K, candidates=cand)
    overlap = np.mean([
        len(set(full_idx[r].tolist()) & set(band_idx[r].tolist())) / K
        for r in range(len(Q))
    ])
    assert overlap == 1.0, f"banded overlap {overlap:.3f}"
