"""Query-projection tests — ports the ``project_query`` property classes and
projection-enabled search flows from
``/root/reference/src_legacy/tests/test_querying_proj.rs`` (:30-143 search
with/without projection, :175-222 α effect, :535-733 project_query
properties: pass-through, consistency, linearity, zero vector, approximate
scale preservation, query distinctness, dot-product sign)."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from matternet_rs_tpu import ArrowSpaceBuilder
from matternet_rs_tpu.reduction import ImplicitProjection


def _clustered_data(n, f, n_clusters=4, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 5, (n_clusters, f))
    X = centers[np.arange(n) % n_clusters] + rng.normal(0, 0.3, (n, f))
    return X.astype(np.float32)


@pytest.fixture(scope="module")
def projected_build():
    data = _clustered_data(99, 1200, seed=18)
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 6, 2.0)
        .with_normalisation(False)
        .with_dims_reduction(True, 1.0)
        .with_sparsity_check(False)
        .with_seed(42)
    )
    aspace, gl = b.build(data)
    return data, aspace, gl


# --------------------------------------------------------------------------
# end-to-end search with projection (test_querying_proj.rs:30-143)
# --------------------------------------------------------------------------


def test_query_without_projection_no_op():
    data = _clustered_data(60, 18, seed=1)
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 6, 2.0)
        .with_sparsity_check(False)
        .with_seed(42)
    )
    aspace, gl = b.build(data)
    assert aspace.projection is None
    q = data[3] + 0.01
    out = np.asarray(aspace.project_query(q))
    np.testing.assert_allclose(out, q, rtol=1e-6)
    ql = aspace.prepare_query_item(q, gl)
    res = aspace.search_lambda_aware(q, ql, 10, 0.7)
    assert len(res) == 10


def test_query_with_projection_enabled(projected_build):
    data, aspace, gl = projected_build
    assert aspace.projection is not None
    assert aspace.reduced_dim is not None

    q = data[1] + 0.02
    qp = np.asarray(aspace.project_query(q))
    assert qp.shape[-1] == aspace.reduced_dim

    ql = aspace.prepare_query_item(q, gl)
    assert np.isfinite(ql)

    res = aspace.search_lambda_aware(q, ql, 10, 0.7)
    assert len(res) == 10
    for idx, score in res:
        assert 0 <= idx < aspace.nitems
        assert np.isfinite(score)


def test_search_lambda_aware_alpha_effect(projected_build):
    # α sweeps between pure-semantic and λ-heavy scoring; the ranking must
    # respond (test_querying_proj.rs:175-222).
    data, aspace, gl = projected_build
    rng = np.random.default_rng(9)
    diffs = 0
    for i in rng.integers(0, len(data), 6):
        q = data[i] + 0.05 * rng.standard_normal(data.shape[1]).astype(np.float32)
        ql = aspace.prepare_query_item(q, gl)
        top_sem = [j for j, _ in aspace.search_lambda_aware(q, ql, 10, 1.0)]
        top_lam = [j for j, _ in aspace.search_lambda_aware(q, ql, 10, 0.1)]
        if top_sem != top_lam:
            diffs += 1
    assert diffs > 0, "α must influence the ranking on at least one query"


def test_lambda_values_reasonable_range(projected_build):
    _, aspace, _ = projected_build
    lam = np.asarray(aspace.lambdas)
    assert np.isfinite(lam).all()
    assert lam.min() >= 0.0
    assert lam.max() <= 1.0 + 1e-6


def test_search_returns_top_k_exactly(projected_build):
    data, aspace, gl = projected_build
    q = data[7]
    ql = aspace.prepare_query_item(q, gl)
    for k in (1, 5, 20):
        res = aspace.search_lambda_aware(q, ql, k, 0.7)
        assert len(res) == k
        idxs = [i for i, _ in res]
        assert len(set(idxs)) == k, "results must be distinct"


# --------------------------------------------------------------------------
# project_query properties (test_querying_proj.rs:535-733)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def proj():
    return ImplicitProjection(original_dim=800, reduced_dim=128, seed=42)


def test_project_query_consistency(proj):
    rng = np.random.default_rng(0)
    q = rng.standard_normal(800).astype(np.float32)
    p1 = np.asarray(proj.project(q))
    p2 = np.asarray(proj.project(q))
    np.testing.assert_array_equal(p1, p2)


def test_project_query_linearity(proj):
    rng = np.random.default_rng(1)
    a = rng.standard_normal(800).astype(np.float32)
    b = rng.standard_normal(800).astype(np.float32)
    pa, pb = np.asarray(proj.project(a)), np.asarray(proj.project(b))
    pab = np.asarray(proj.project(a + b))
    np.testing.assert_allclose(pab, pa + pb, atol=1e-4)
    p3a = np.asarray(proj.project(3.0 * a))
    np.testing.assert_allclose(p3a, 3.0 * pa, atol=1e-4)


def test_project_query_zero_vector(proj):
    z = np.zeros(800, np.float32)
    np.testing.assert_allclose(np.asarray(proj.project(z)), 0.0, atol=1e-7)


def test_project_query_preserves_scale_approximately(proj):
    # E‖Px‖ = ‖x‖ with the 1/√r scaling; individual draws concentrate
    # within a JL band.
    rng = np.random.default_rng(2)
    ratios = []
    for _ in range(20):
        q = rng.standard_normal(800).astype(np.float32)
        ratios.append(
            float(np.linalg.norm(np.asarray(proj.project(q))) / np.linalg.norm(q))
        )
    r = np.array(ratios)
    assert 0.7 < r.mean() < 1.3
    assert (np.abs(r - 1.0) < 0.45).all()


def test_project_query_different_queries_differ(proj):
    rng = np.random.default_rng(3)
    a = rng.standard_normal(800).astype(np.float32)
    b = rng.standard_normal(800).astype(np.float32)
    pa, pb = np.asarray(proj.project(a)), np.asarray(proj.project(b))
    assert not np.allclose(pa, pb)


def test_project_query_preserves_dot_product_sign(proj):
    # Pairs with a decisive dot product keep their sign after projection
    # (statistical claim — use well-separated pairs).
    rng = np.random.default_rng(4)
    agree = 0
    trials = 30
    for _ in range(trials):
        a = rng.standard_normal(800).astype(np.float32)
        # b strongly correlated (or anti-correlated) with a
        sign = 1.0 if rng.random() < 0.5 else -1.0
        b = sign * a + 0.3 * rng.standard_normal(800).astype(np.float32)
        d_orig = float(np.dot(a, b))
        d_proj = float(
            np.dot(np.asarray(proj.project(a)), np.asarray(proj.project(b)))
        )
        if np.sign(d_orig) == np.sign(d_proj):
            agree += 1
    assert agree >= trials - 2, f"dot-sign agreement too low: {agree}/{trials}"


def test_project_query_dimension_mismatch_raises(projected_build):
    _, aspace, _ = projected_build
    with pytest.raises(ValueError):
        aspace.project_query(np.zeros(7, np.float32))
