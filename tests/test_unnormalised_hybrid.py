"""Port of the reference's unnormalised-build / hybrid-similarity suite.

Reference: src_legacy/tests/test_laplacian_unnormalised.rs — the one
reference test file round 2 left uncited.  Assertion classes:

- graph-parameter preservation through the builder (:40-60)
- seeded clustering determinism (:62-79)
- cosine scale invariance (:107-129)
- magnitude-penalty hybrid similarity: scale sensitivity (:131-162),
  closed form exp(-|ln r|) == min(r, 1/r) (:276-319), component
  decomposition over a scale grid (:321-379)
- normalised-vs-unnormalised clustering: pairwise cosines unchanged
  (:164-216); lambda comparison across the two builds (:218-273)

The hybrid-similarity helpers are test-local math in the reference too
(they exercise the *scoring model* the search blend is built on, not a
library export), so they are ported as local helpers here as well.
"""

import numpy as np
import pytest

from matternet_rs_tpu.builder import ArrowSpaceBuilder
from matternet_rs_tpu.utils.fixtures import make_moons_hd


def _cosine(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na > 1e-12 and nb > 1e-12:
        return float(np.dot(a, b) / (na * nb))
    return 0.0


def _hybrid(a: np.ndarray, b: np.ndarray, alpha: float, beta: float) -> float:
    """alpha*cos + beta*exp(-|ln(|a|/|b|)|) (test_laplacian_unnormalised.rs:93-105)."""
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    cos = _cosine(a, b)
    if na > 1e-12 and nb > 1e-12:
        return alpha * cos + beta * float(np.exp(-abs(np.log(na / nb))))
    return cos


def test_builder_graph_params_preservation():
    items = make_moons_hd(50, 0.18, 0.4, 7, 456)
    _, gl = (
        ArrowSpaceBuilder()
        .with_lambda_graph(0.25, 6, 2.5, 0.15)
        .with_normalisation(False)
        .with_seed(1)
        .build(items)
    )
    p = gl.graph_params
    assert p.eps == 0.25
    assert p.k == 6
    assert p.p == 2.5
    assert p.sigma == 0.15
    assert p.normalise is False


def test_with_deterministic_clustering_seeded():
    items = make_moons_hd(80, 0.50, 0.50, 9, 789)
    a1, _ = (
        ArrowSpaceBuilder().with_lambda_graph(0.3, 4, 2.0, None)
        .with_seed(42).build(items)
    )
    a2, _ = (
        ArrowSpaceBuilder().with_lambda_graph(0.3, 4, 2.0, None)
        .with_seed(42).build(items)
    )
    assert a1.n_clusters == a2.n_clusters
    np.testing.assert_allclose(
        np.asarray(a1.lambdas), np.asarray(a2.lambdas), rtol=0, atol=0
    )


def test_cosine_similarity_scale_invariance():
    items = make_moons_hd(2, 0.0, 1.0, 13, 321)
    c0 = _cosine(items[0], items[1])
    c1 = _cosine(items[0] * 3.5, items[1] * 0.2)
    assert c0 == pytest.approx(c1, abs=1e-10)


def test_hybrid_similarity_scale_sensitivity():
    items = make_moons_hd(2, 0.0, 1.0, 13, 654)
    h0 = _hybrid(items[0], items[1], 0.7, 0.3)
    h1 = _hybrid(items[0] * 5.0, items[1] * 0.1, 0.7, 0.3)
    assert abs(h0 - h1) > 1e-6


def test_magnitude_penalty_computation():
    # exp(-|ln r|) == min(r, 1/r) exactly
    a = np.array([1.0, 2.0, 3.0])
    b_same = a * 1.5
    b_diff = a * 0.1
    for b in (b_same, b_diff):
        r = np.linalg.norm(a) / np.linalg.norm(b)
        penalty = float(np.exp(-abs(np.log(r))))
        assert penalty == pytest.approx(min(r, 1.0 / r), abs=1e-12)
    r_same = np.linalg.norm(a) / np.linalg.norm(b_same)
    r_diff = np.linalg.norm(a) / np.linalg.norm(b_diff)
    assert np.exp(-abs(np.log(r_same))) > np.exp(-abs(np.log(r_diff)))


def test_hybrid_similarity_components_grid():
    """Hybrid decomposes exactly into alpha*cos + beta*penalty on a 5x5
    scale grid; the cosine component never moves (:321-379)."""
    items = make_moons_hd(2, 0.0, 1.0, 10, 888)
    base_cos = _cosine(items[0], items[1])
    for s1 in (0.1, 0.5, 1.0, 2.0, 10.0):
        for s2 in (0.1, 0.5, 1.0, 2.0, 10.0):
            a, b = items[0] * s1, items[1] * s2
            cos = _cosine(a, b)
            hyb = _hybrid(a, b, 0.6, 0.4)
            pen = float(np.exp(-abs(np.log(np.linalg.norm(a) / np.linalg.norm(b)))))
            assert hyb == pytest.approx(0.6 * cos + 0.4 * pen, abs=1e-10)
            assert cos == pytest.approx(base_cos, abs=1e-10)


def test_builder_normalized_vs_unnormalized_clustering():
    """Per-row rescaling leaves pairwise cosines untouched (:164-216)."""
    base = make_moons_hd(70, 0.16, 0.38, 11, 999)
    scales = np.array([1.0, 3.0, 0.5, 2.5, 1.5, 4.0, 0.8])
    unnorm = base * scales[np.arange(len(base)) % len(scales), None]
    norm = unnorm / np.linalg.norm(unnorm, axis=1, keepdims=True)
    for i in range(10):
        for j in range(i + 1, 10):
            assert _cosine(base[i], base[j]) == pytest.approx(
                _cosine(norm[i], norm[j]), abs=1e-10
            )


def test_builder_lambda_comparison_normalized_vs_unnormalized():
    """Both builds produce valid normalised lambdas; magnitude-scaled
    input with normalisation off diverges from the scale-free build
    (:218-273 — the reference logs the comparison; we pin the
    invariants it relies on)."""
    base = make_moons_hd(60, 0.18, 0.35, 10, 555)
    scales = np.array([10.0, 0.1, 5.0, 2.0, 0.5])
    unnorm = base * scales[np.arange(len(base)) % len(scales), None]

    a_norm, _ = (
        ArrowSpaceBuilder().with_lambda_graph(0.25, 5, 2.0, None)
        .with_normalisation(True).with_spectral(True).with_seed(3)
        .build(base)
    )
    a_unnorm, _ = (
        ArrowSpaceBuilder().with_lambda_graph(0.25, 5, 2.0, None)
        .with_normalisation(False).with_spectral(True).with_seed(3)
        .build(unnorm)
    )
    ln = np.asarray(a_norm.lambdas)
    lu = np.asarray(a_unnorm.lambdas)
    for lam in (ln, lu):
        assert np.all(np.isfinite(lam))
        assert lam.min() >= 0.0 and lam.max() <= 1.0 + 1e-6
    assert len(ln) == len(lu) == 60
