"""Distributed-vs-serial build equivalence, MEASURED (VERDICT r2 #4).

``ShardedArrowSpace.distributed_build`` swaps the reference's
order-dependent incremental clustering scan for psum-reduced Lloyd
(documented in parallel/clustering.py). These tests quantify the
retrieval-quality delta of that swap on one corpus instead of asserting it
rhetorically: top-10 recall overlap on shared queries, λ-distribution
distance (KS statistic), and the centroid-count regime.

Reference semantics being compared against:
/root/reference/src_legacy/clustering.rs:574-932 (incremental scan used by
the serial builder).
"""

import numpy as np
import pytest

from matternet_rs_tpu.builder import ArrowSpaceBuilder
from matternet_rs_tpu.graph import GraphParams
from matternet_rs_tpu.parallel import make_mesh
from matternet_rs_tpu.parallel.index import ShardedArrowSpace

N, F = 20_000, 32
K = 10
N_QUERIES = 64


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(17)
    centers = rng.normal(size=(12, F)) * 4.0
    labels = rng.integers(0, 12, N)
    X = (centers[labels] + rng.normal(size=(N, F))).astype(np.float32)
    queries = X[rng.integers(0, N, N_QUERIES)] + 0.05 * rng.normal(
        size=(N_QUERIES, F)
    ).astype(np.float32)
    return X, queries.astype(np.float32)


@pytest.fixture(scope="module")
def builds(corpus):
    X, queries = corpus
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 6)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=64, radius=25.0)
        .with_sampling(None)
    )
    aspace, gl = b.build(X)

    mesh = make_mesh(8)
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    n3 = N // 3
    sa = ShardedArrowSpace.distributed_build(
        [X[:n3], X[n3 : 2 * n3 + 111], X[2 * n3 + 111 :]],
        params,
        k_clusters=aspace.n_clusters,     # same centroid budget
        mesh=mesh,
    )
    return aspace, gl, sa


def _topk_serial(aspace, gl, queries, k):
    idx, _ = aspace.search_batch(queries, gl, k)
    return idx


def _topk_distributed(sa, queries, k):
    out = []
    for q in queries:
        out.append([i for i, _ in sa.search(q, k=k)])
    return np.asarray(out)


def test_centroid_count_same_regime(builds):
    aspace, _gl, sa = builds
    c_serial = aspace.n_clusters
    c_dist = int(np.asarray(sa.gl.init_data).shape[1])  # F×C profiles
    # Lloyd was given the serial budget; it must actually use the same
    # order of magnitude of centroids (empty clusters are dropped).
    assert c_dist >= c_serial // 2


def test_recall_overlap_at_10(builds, corpus):
    """Top-10 overlap between the two builds on shared queries. Measured
    on this fixture: ≈0.9+; the bound asserts the equivalence-in-regime
    claim with slack for platform jitter."""
    aspace, gl, sa = builds
    _, queries = corpus
    s_idx = _topk_serial(aspace, gl, queries, K)
    d_idx = _topk_distributed(sa, queries, K)
    overlap = np.mean(
        [
            len(set(s_idx[i].tolist()) & set(d_idx[i].tolist())) / K
            for i in range(len(queries))
        ]
    )
    assert overlap >= 0.75, f"recall@10 overlap {overlap:.3f}"


def test_lambda_agreement_per_item_and_distribution(builds):
    """λ agreement over the SAME items. Per-item correlation is the
    quality-bearing metric (search blends λ per item: ordering is what
    matters); the KS distance of the normalized distributions is recorded
    as a looser bound because min-max normalization shifts with each
    build's own λ range. Measured on this fixture: Spearman 0.94,
    Pearson 0.99, KS 0.24."""
    aspace, _gl, sa = builds
    lam_s = np.asarray(aspace.lambdas)
    lam_d = np.asarray(sa.lambdas)[:N]

    rs = np.argsort(np.argsort(lam_s))
    rd = np.argsort(np.argsort(lam_d))
    spearman = float(np.corrcoef(rs, rd)[0, 1])
    pearson = float(np.corrcoef(lam_s, lam_d)[0, 1])
    assert spearman >= 0.85, f"λ Spearman {spearman:.3f}"
    assert pearson >= 0.95, f"λ Pearson {pearson:.3f}"

    grid = np.linspace(0.0, 1.0, 512)
    cdf_s = np.searchsorted(np.sort(lam_s), grid, side="right") / N
    cdf_d = np.searchsorted(np.sort(lam_d), grid, side="right") / N
    ks = float(np.max(np.abs(cdf_s - cdf_d)))
    assert ks <= 0.35, f"λ KS distance {ks:.3f}"


def test_self_queries_agree_exactly(builds, corpus):
    """Self-queries (exact corpus rows) must rank themselves first under
    BOTH builds — the invariant that survives any clustering swap."""
    aspace, gl, sa = builds
    X, _ = corpus
    probe = X[[5, 777, 12_345]]
    s_idx = _topk_serial(aspace, gl, probe, 3)
    assert list(s_idx[:, 0]) == [5, 777, 12_345]
    for row, i in zip(probe, [5, 777, 12_345]):
        assert sa.search(row, k=3)[0][0] == i


# ---------------------------------------------------------------------
# centroids="serial": the ranking-equivalent distributed mode (VERDICT
# r3 #4). Stage 1 runs the serial builder's incremental scan host-side;
# the graph/λ/search stages were already exact vs serial, so the
# distributed top-10 must now OVERLAP ≥ 0.95 with ArrowSpaceBuilder.build
# (residual deltas: f32 reduction order in the sharded λ matmuls on
# exact score ties only).
# ---------------------------------------------------------------------
@pytest.fixture(scope="module")
def serial_mode_build(corpus, builds):
    X, _ = corpus
    aspace, gl, _sa = builds
    mesh = make_mesh(8)
    # EXACT graph params of the serial build: ArrowSpaceBuilder.build runs
    # define_result_k(), which lowers topk 6 → 4 for k ≤ 9 — the
    # distributed build must wire the same graph or raw λ scale shifts.
    params = GraphParams(eps=1.0, k=6, topk=4, sparsity_check=False)
    n3 = N // 3
    sa = ShardedArrowSpace.distributed_build(
        [X[:n3], X[n3 : 2 * n3 + 111], X[2 * n3 + 111 :]],
        params,
        k_clusters=64,                   # the serial builder's budget
        radius=25.0,                     # and its radius
        centroids="serial",
        mesh=mesh,
    )
    return aspace, gl, sa


def test_serial_mode_centroid_count_matches_exactly(serial_mode_build):
    aspace, _gl, sa = serial_mode_build
    c_serial = aspace.n_clusters
    c_dist = int(np.asarray(sa.gl.init_data).shape[1])
    assert c_dist == c_serial, (c_dist, c_serial)


def test_serial_mode_recall_overlap_at_10(serial_mode_build, corpus):
    aspace, gl, sa = serial_mode_build
    _, queries = corpus
    s_idx = _topk_serial(aspace, gl, queries, K)
    d_idx = _topk_distributed(sa, queries, K)
    overlap = np.mean(
        [
            len(set(s_idx[i].tolist()) & set(d_idx[i].tolist())) / K
            for i in range(len(queries))
        ]
    )
    assert overlap >= 0.95, f"serial-mode recall@10 overlap {overlap:.3f}"


def test_serial_mode_lambdas_match_serial_build(serial_mode_build):
    """Same centroids → same graph → same λ formula: per-item λ must agree
    to f32 reduction-order tolerance (not merely correlate)."""
    aspace, _gl, sa = serial_mode_build
    lam_s = np.asarray(aspace.lambdas)
    lam_d = np.asarray(sa.lambdas)[:N]
    np.testing.assert_allclose(lam_d, lam_s, atol=5e-5)


def test_serial_mode_bounded_sample_still_close(corpus, builds):
    """centroid_sample bounds the host pass; a half-corpus sample keeps the
    centroid REGIME (count within 25%) even though exact equality needs
    the full visit order."""
    X, _ = corpus
    aspace, _gl, _sa = builds
    mesh = make_mesh(8)
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    sa = ShardedArrowSpace.distributed_build(
        [X[: N // 2], X[N // 2 :]],
        params,
        k_clusters=64,
        radius=25.0,
        centroids="serial",
        centroid_sample=N // 2,
        mesh=mesh,
    )
    c_dist = int(np.asarray(sa.gl.init_data).shape[1])
    assert abs(c_dist - aspace.n_clusters) <= max(4, aspace.n_clusters // 4)
    assert sa.search(X[9], k=3)[0][0] == 9


def test_serial_mode_zero_sample_raises_clearly(corpus):
    """centroid_sample=0 must raise a clear ValueError, not crash inside
    np.concatenate with an empty parts list."""
    X, _ = corpus
    mesh = make_mesh(8)
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    with pytest.raises(ValueError, match="at least one sample row"):
        ShardedArrowSpace.distributed_build(
            [X[: N // 2], X[N // 2 :]],
            params,
            k_clusters=64,
            radius=25.0,
            centroids="serial",
            centroid_sample=0,
            mesh=mesh,
        )
