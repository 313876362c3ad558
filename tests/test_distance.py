"""Distance kernel property tests.

Ports the reference's property suite (surfface-core/src/tests/
test_distance.rs:10-437): identity → 0, symmetry, non-metric triangle
violations allowed, batched-vs-single agreement, numerical stability at tiny
and huge variances.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from matternet_rs_tpu.ops import distance as d


def test_cosine_identity():
    a = jnp.array([1.0, 2.0, 3.0])
    assert float(d.cosine_similarity(a, a)) == pytest.approx(1.0, abs=1e-6)


def test_cosine_orthogonal():
    assert float(
        d.cosine_similarity(jnp.array([1.0, 0.0]), jnp.array([0.0, 1.0]))
    ) == pytest.approx(0.0, abs=1e-7)


def test_cosine_zero_vector():
    assert float(
        d.cosine_similarity(jnp.zeros(3), jnp.array([1.0, 2.0, 3.0]))
    ) == 0.0


def test_pairwise_cosine_matches_single():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(5, 8)).astype(np.float32)
    B = rng.normal(size=(7, 8)).astype(np.float32)
    P = np.asarray(d.pairwise_cosine(jnp.asarray(A), jnp.asarray(B)))
    for i in range(5):
        for j in range(7):
            ref = float(d.cosine_similarity(jnp.asarray(A[i]), jnp.asarray(B[j])))
            assert P[i, j] == pytest.approx(ref, abs=1e-5)


def test_sqeuclidean_identity_zero():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(6, 4)).astype(np.float32)
    D = np.asarray(d.pairwise_sqeuclidean(jnp.asarray(A)))
    assert np.allclose(np.diag(D), 0.0, atol=1e-4)
    assert (D >= 0).all()


def test_sqeuclidean_matches_numpy():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(5, 6)).astype(np.float32)
    B = rng.normal(size=(4, 6)).astype(np.float32)
    D = np.asarray(d.pairwise_sqeuclidean(jnp.asarray(A), jnp.asarray(B)))
    ref = ((A[:, None, :] - B[None, :, :]) ** 2).sum(-1)
    assert np.allclose(D, ref, atol=1e-3)


def test_rectified_cosine_range():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(10, 5)).astype(np.float32)
    D = np.asarray(d.rectified_cosine_distance(jnp.asarray(A)))
    assert (D >= -1e-6).all() and (D <= 1.0 + 1e-6).all()
    assert np.allclose(np.diag(D), 0.0, atol=1e-5)


# --- Bhattacharyya (test_distance.rs behaviours) --------------------------


def test_bhattacharyya_identity_zero():
    mu = jnp.array([1.0, 2.0, 3.0])
    var = jnp.array([0.5, 0.5, 0.5])
    assert float(d.bhattacharyya_diagonal(mu, var, mu, var)) == pytest.approx(
        0.0, abs=1e-6
    )


def test_bhattacharyya_symmetry():
    mu1, v1 = jnp.array([0.0, 1.0]), jnp.array([1.0, 2.0])
    mu2, v2 = jnp.array([3.0, -1.0]), jnp.array([0.5, 1.5])
    a = float(d.bhattacharyya_diagonal(mu1, v1, mu2, v2))
    b = float(d.bhattacharyya_diagonal(mu2, v2, mu1, v1))
    assert a == pytest.approx(b, rel=1e-6)
    assert a > 0


def test_bhattacharyya_grows_with_separation():
    v = jnp.ones(3)
    base = jnp.zeros(3)
    d1 = float(d.bhattacharyya_diagonal(base, v, jnp.full(3, 1.0), v))
    d2 = float(d.bhattacharyya_diagonal(base, v, jnp.full(3, 5.0), v))
    assert d2 > d1


def test_bhattacharyya_pairwise_matches_single():
    rng = np.random.default_rng(4)
    mu = rng.normal(size=(4, 6)).astype(np.float32)
    var = rng.uniform(0.1, 2.0, size=(4, 6)).astype(np.float32)
    P = np.asarray(d.bhattacharyya_pairwise(jnp.asarray(mu), jnp.asarray(var)))
    for i in range(4):
        for j in range(4):
            ref = float(
                d.bhattacharyya_diagonal(
                    jnp.asarray(mu[i]), jnp.asarray(var[i]),
                    jnp.asarray(mu[j]), jnp.asarray(var[j]),
                )
            )
            assert P[i, j] == pytest.approx(ref, abs=1e-4)


def test_bhattacharyya_stability_tiny_and_huge_variance():
    mu1 = jnp.array([0.0, 0.0])
    mu2 = jnp.array([1.0, 1.0])
    tiny = jnp.full(2, 1e-12)
    huge = jnp.full(2, 1e12)
    out1 = float(d.bhattacharyya_diagonal(mu1, tiny, mu2, tiny))
    out2 = float(d.bhattacharyya_diagonal(mu1, huge, mu2, huge))
    assert np.isfinite(out1) and np.isfinite(out2)


def test_bhattacharyya_coefficient_range():
    dist = jnp.array([0.0, 0.5, 10.0])
    bc = np.asarray(d.bhattacharyya_coefficient(dist))
    assert bc[0] == pytest.approx(1.0)
    assert ((bc > 0) & (bc <= 1.0)).all()
    assert bc[2] < bc[1] < bc[0]


def test_standardize_columns():
    rng = np.random.default_rng(5)
    A = rng.normal(5.0, 3.0, size=(50, 4)).astype(np.float32)
    S = np.asarray(d.standardize_columns(jnp.asarray(A)))
    assert np.allclose(S.mean(0), 0.0, atol=1e-4)
    assert np.allclose(S.std(0), 1.0, atol=1e-3)


# --- tiled kNN (ops/knn.py) -------------------------------------------------


def test_knn_rect_cosine_matches_bruteforce():
    from matternet_rs_tpu.ops.knn import knn

    rng = np.random.default_rng(10)
    corpus = rng.normal(size=(500, 16)).astype(np.float32)
    queries = rng.normal(size=(37, 16)).astype(np.float32)   # odd Q → padding
    dists, idx = knn(jnp.asarray(queries), jnp.asarray(corpus), k=5,
                     query_chunk=16)
    cn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    ref_d = 1.0 - np.maximum(qn @ cn.T, 0.0)
    for i in range(37):
        ref_top = set(np.argsort(ref_d[i], kind="stable")[:5].tolist())
        got = set(np.asarray(idx[i]).tolist())
        assert len(ref_top & got) >= 4        # f32 tie slack
    assert (np.diff(np.asarray(dists), axis=1) >= -1e-6).all()  # ascending


def test_knn_euclidean_self_nearest():
    from matternet_rs_tpu.ops.knn import knn

    rng = np.random.default_rng(11)
    corpus = rng.normal(size=(200, 8)).astype(np.float32)
    d, idx = knn(jnp.asarray(corpus[:20]), jnp.asarray(corpus), k=1,
                 metric="euclidean", query_chunk=8)
    assert np.asarray(idx)[:, 0].tolist() == list(range(20))
    # sqrt of the matmul-expansion cancellation error: √(~1e-5·‖x‖²) ≈ 4e-2
    assert np.allclose(np.asarray(d)[:, 0], 0.0, atol=5e-2)


# ---------------------------------------------------------------------------
# Deepened property coverage (test_distance.rs:150-437)
# ---------------------------------------------------------------------------


def test_bhattacharyya_triangle_inequality_violated():
    """Bhattacharyya distance is NOT a metric — the reference asserts a
    concrete triangle violation exists (test_distance.rs non-metric
    case). Construct one: variance-mismatched pairs."""
    m = jnp.asarray(np.array([[0.0], [0.0], [0.0]], np.float32))
    v = jnp.asarray(np.array([[1e-4], [1.0], [1e4]], np.float32))
    d01 = float(d.bhattacharyya_diagonal(m[0], v[0], m[1], v[1]))
    d12 = float(d.bhattacharyya_diagonal(m[1], v[1], m[2], v[2]))
    d02 = float(d.bhattacharyya_diagonal(m[0], v[0], m[2], v[2]))
    assert d02 > d01 + d12, (d02, d01, d12)


def test_bhattacharyya_pairwise_symmetric_zero_diag():
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.normal(size=(7, 5)).astype(np.float32))
    v = jnp.asarray(rng.uniform(0.5, 2.0, (7, 5)).astype(np.float32))
    D = np.asarray(d.bhattacharyya_pairwise(m, v))
    assert np.allclose(D, D.T, atol=1e-5)
    assert np.allclose(np.diag(D), 0.0, atol=1e-5)
    assert (D >= -1e-6).all()


def test_bhattacharyya_coefficient_consistency():
    """BC = exp(-d): coefficient and distance must roundtrip."""
    dists = jnp.asarray(np.array([0.0, 0.5, 2.0, 10.0], np.float32))
    bc = np.asarray(d.bhattacharyya_coefficient(dists))
    np.testing.assert_allclose(bc, np.exp(-np.asarray(dists)), rtol=1e-5)
    assert bc[0] == pytest.approx(1.0)
    assert (bc <= 1.0).all() and (bc >= 0.0).all()


def test_pairwise_euclidean_matches_sqeuclidean():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))
    d2 = np.asarray(d.pairwise_sqeuclidean(a))
    d1 = np.asarray(d.pairwise_euclidean(a))
    np.testing.assert_allclose(d1, np.sqrt(np.maximum(d2, 0)), atol=1e-4)


def test_pairwise_cosine_scale_invariant():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(5, 8)).astype(np.float32)
    c1 = np.asarray(d.pairwise_cosine(jnp.asarray(a)))
    c2 = np.asarray(d.pairwise_cosine(jnp.asarray(7.5 * a)))
    np.testing.assert_allclose(c1, c2, atol=1e-5)


def test_rectified_cosine_saturates_anticorrelated():
    a = jnp.asarray(np.array([[1.0, 0.0], [-1.0, 0.0]], np.float32))
    dd = np.asarray(d.rectified_cosine_distance(a))
    assert dd[0, 1] == pytest.approx(1.0, abs=1e-6)  # anti-correlated → 1
    assert dd[0, 0] == pytest.approx(0.0, abs=1e-6)


def test_bhattacharyya_mean_term_vs_variance_term():
    """Equal variances → pure Mahalanobis-like mean term; equal means →
    pure variance-ratio term (reference decomposes the two,
    distance.rs:29-63)."""
    m0 = jnp.asarray(np.zeros(4, np.float32))
    v1 = jnp.asarray(np.ones(4, np.float32))
    # mean term only
    d_mean = float(d.bhattacharyya_diagonal(
        m0, v1, jnp.asarray(np.full(4, 2.0, np.float32)), v1
    ))
    assert d_mean == pytest.approx(0.125 * 4 * 4 / 1.0, rel=1e-4)
    # variance term only
    d_var = float(d.bhattacharyya_diagonal(
        m0, v1, m0, jnp.asarray(np.full(4, 4.0, np.float32))
    ))
    expected = 0.5 * 4 * np.log(((1 + 4) / 2) / np.sqrt(4.0))
    assert d_var == pytest.approx(expected, rel=1e-4)


def test_standardize_constant_column_no_nan():
    x = np.ones((10, 3), np.float32)
    x[:, 1] = np.arange(10)
    out = np.asarray(d.standardize_columns(jnp.asarray(x)))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[:, 0], 0.0, atol=1e-6)


def test_bhattacharyya_affinity_alias():
    """affinity(params) == coefficient(distance(params)) — distance.rs:115."""
    rng = np.random.default_rng(9)
    m1 = jnp.asarray(rng.normal(size=5).astype(np.float32))
    m2 = jnp.asarray(rng.normal(size=5).astype(np.float32))
    v = jnp.asarray(rng.uniform(0.5, 2.0, 5).astype(np.float32))
    aff = float(d.bhattacharyya_affinity(m1, v, m2, v))
    dist = float(d.bhattacharyya_diagonal(m1, v, m2, v))
    assert aff == pytest.approx(np.exp(-dist), rel=1e-5)
    assert 0.0 < aff <= 1.0
