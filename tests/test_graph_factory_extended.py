"""Builder/graph-factory robustness tests — ports the remaining classes
from ``/root/reference/src_legacy/tests/test_graph_factory.rs``: minimum
viable dataset (:102), scale invariance under normalisation (:129),
dimension sweep (:277), parameter preservation (:247), high-noise
robustness (:390)."""

from __future__ import annotations

import numpy as np
from scipy import stats as sps

from matternet_rs_tpu import ArrowSpaceBuilder, eigenmaps
from matternet_rs_tpu.utils.fixtures import make_moons_hd


def _builder(eps=0.3, k=4, normalise=False):
    return (
        ArrowSpaceBuilder()
        .with_lambda_graph(eps, k, 2.0)
        .with_normalisation(normalise)
        .with_sparsity_check(False)
        .with_seed(42)
    )


def test_builder_minimum_items():
    items = make_moons_hd(20, 0.1, 0.6, 5, 42).astype(np.float32)
    aspace, gl = _builder(0.5, 3).build(items)
    assert aspace.n_clusters >= 1
    f = items.shape[1]
    assert np.asarray(gl.dense()).shape == (f, f)
    assert np.isfinite(np.asarray(aspace.lambdas)).all()


def test_builder_scale_invariance_with_normalization():
    items = make_moons_hd(60, 0.15, 0.4, 8, 0).astype(np.float32)
    a1, gl1 = _builder(normalise=True).build(items)
    a2, gl2 = _builder(normalise=True).build(items * 5.7)

    assert abs(a1.n_clusters - a2.n_clusters) <= 3, (
        f"normalized clustering should be scale-invariant: "
        f"{a1.n_clusters} vs {a2.n_clusters}"
    )
    assert np.asarray(gl1.dense()).shape == np.asarray(gl2.dense()).shape
    # λ orderings should broadly agree under pure rescaling. (The radius
    # heuristic operates on unnormalised distances, so centroid geometry
    # shifts a little and exact ranking equality is NOT guaranteed — the
    # reference test only asserts cluster-count closeness; measured ρ≈0.7.)
    l1, l2 = np.asarray(a1.lambdas), np.asarray(a2.lambdas)
    if np.std(l1) > 1e-9 and np.std(l2) > 1e-9:
        rho = sps.spearmanr(l1, l2).statistic
        assert rho > 0.5, f"λ ranking collapsed under rescaling (ρ={rho:.3f})"


def test_builder_with_different_dimensions():
    for n, dims in ((50, 3), (60, 10), (70, 25)):
        items = make_moons_hd(n, 0.15, 0.4, dims, 42 + dims).astype(np.float32)
        b = (
            ArrowSpaceBuilder()
            .with_lambda_graph(0.3, 5, 2.0)
            .with_normalisation(True)
            .with_spectral(True)
            .with_sparsity_check(False)
            .with_seed(42)
        )
        aspace, gl = b.build(items)
        assert aspace.n_clusters > 0, f"dims={dims}: no clusters"
        assert aspace.nfeatures == dims
        assert np.asarray(gl.dense()).shape == (dims, dims)


def test_builder_parameter_preservation():
    b = _builder(eps=0.25, k=7, normalise=True)
    items = make_moons_hd(40, 0.15, 0.4, 6, 3).astype(np.float32)
    b.build(items)
    assert b.lambda_eps == 0.25
    assert b.lambda_k == 7
    assert b.normalise is True
    gp = b.graph_params()
    assert gp.eps == 0.25 and gp.k == 7 and gp.normalise is True


def test_builder_with_high_noise():
    items = make_moons_hd(80, 0.9, 0.9, 12, 17).astype(np.float32)
    aspace, gl = _builder(0.5, 5).build(items)
    lam = np.asarray(aspace.lambdas)
    assert np.isfinite(lam).all()
    assert lam.min() >= 0.0 and lam.max() <= 1.0 + 1e-6
    res = eigenmaps.search(aspace, items[3], gl, 5)
    assert len(res) == 5
    assert all(np.isfinite(s) for _, s in res)
