"""Taumode λ engine tests.

Ports the reference invariants (src_legacy/tests/test_taumode.rs:15-890):
τ selection per mode with floor, λ bounds, Rayleigh scale invariance,
closed-form dispersion vs direct pairwise scan, zero-vector guard.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from matternet_rs_tpu.graph import GraphParams
from matternet_rs_tpu.ops import laplacian as lap
from matternet_rs_tpu.ops import taumode as tm


def _graph(f=12, seed=0):
    rng = np.random.default_rng(seed)
    nodes = rng.normal(size=(f, 20)).astype(np.float32)   # f graph nodes
    params = GraphParams(eps=0.9, k=5, topk=5, sparsity_check=False)
    return lap.build_laplacian_matrix(nodes, params).matrix


# --- τ selection ----------------------------------------------------------


def test_select_tau_fixed():
    v = jnp.array([[1.0, 2.0, 3.0]])
    assert float(tm.select_tau(v, tm.TAU_FIXED, 0.5)[0]) == pytest.approx(0.5)


def test_select_tau_fixed_invalid_floors():
    v = jnp.array([[1.0, 2.0, 3.0]])
    assert float(tm.select_tau(v, tm.TAU_FIXED, -1.0)[0]) == pytest.approx(
        tm.TAU_FLOOR
    )
    assert float(tm.select_tau(v, tm.TAU_FIXED, 0.0)[0]) == pytest.approx(
        tm.TAU_FLOOR
    )


def test_select_tau_median_odd_even():
    odd = jnp.array([[3.0, 1.0, 2.0]])
    even = jnp.array([[4.0, 1.0, 2.0, 3.0]])
    assert float(tm.select_tau(odd, tm.TAU_MEDIAN)[0]) == pytest.approx(2.0)
    assert float(tm.select_tau(even, tm.TAU_MEDIAN)[0]) == pytest.approx(2.5)


def test_select_tau_mean():
    v = jnp.array([[1.0, 2.0, 3.0, 4.0]])
    assert float(tm.select_tau(v, tm.TAU_MEAN)[0]) == pytest.approx(2.5)


def test_select_tau_percentile_rounding():
    v = jnp.array([[10.0, 20.0, 30.0, 40.0, 50.0]])
    # round((5-1)*0.5)=2 → 30 ; round(4*0.9)=4 → 50 (reference: round index)
    assert float(tm.select_tau(v, tm.TAU_PERCENTILE, 0.5)[0]) == pytest.approx(30.0)
    assert float(tm.select_tau(v, tm.TAU_PERCENTILE, 0.9)[0]) == pytest.approx(50.0)


def test_select_tau_floor_on_negative_values():
    v = jnp.array([[-5.0, -3.0, -1.0]])
    assert float(tm.select_tau(v, tm.TAU_MEDIAN)[0]) == pytest.approx(tm.TAU_FLOOR)


# --- Rayleigh -------------------------------------------------------------


def test_rayleigh_scale_invariance():
    L = _graph()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=12).astype(np.float32))
    r1 = float(tm.rayleigh_quotient(L, x))
    r2 = float(tm.rayleigh_quotient(L, 3.7 * x))
    assert r1 == pytest.approx(r2, rel=1e-4)


def test_rayleigh_nonnegative_and_zero_on_constant():
    L = _graph(seed=2)
    ones = jnp.ones(12)
    assert float(tm.rayleigh_quotient(L, ones)) == pytest.approx(0.0, abs=1e-5)


# --- Dispersion closed form vs direct scan --------------------------------


def test_dispersion_closed_form_matches_direct():
    L = _graph(seed=3)
    rng = np.random.default_rng(4)
    X = jnp.asarray(rng.normal(size=(16, 12)).astype(np.float32))
    lam_batched = tm.taumode_lambdas(X, L, tm.TAU_MEDIAN)
    # Rebuild λ per item from the direct-scan pieces.
    for i in range(16):
        x = X[i]
        tau = float(tm.select_tau(x[None, :], tm.TAU_MEDIAN)[0])
        e = float(tm.rayleigh_quotient(L, x))
        g = float(tm.item_dispersion(x, L))
        expected = tau * (e / (e + tau)) + (1.0 - tau) * g
        assert float(lam_batched[i]) == pytest.approx(expected, rel=2e-3, abs=2e-5)


def test_dispersion_in_unit_interval():
    L = _graph(seed=5)
    rng = np.random.default_rng(6)
    for _ in range(5):
        x = jnp.asarray(rng.normal(size=12).astype(np.float32))
        g = float(tm.item_dispersion(x, L))
        assert 0.0 <= g <= 1.0


def test_zero_vector_lambda_zero():
    L = _graph(seed=7)
    X = jnp.zeros((3, 12))
    lam = np.asarray(tm.taumode_lambdas(X, L, tm.TAU_MEDIAN))
    assert np.allclose(lam, 0.0)


def test_lambda_finite_and_batch_consistent():
    L = _graph(seed=8)
    rng = np.random.default_rng(9)
    X = jnp.asarray(rng.normal(size=(32, 12)).astype(np.float32))
    lam = np.asarray(tm.taumode_lambdas(X, L, tm.TAU_MEDIAN))
    assert np.isfinite(lam).all()
    # single-item path must agree with batched path
    for i in (0, 13, 31):
        s = float(tm.synthetic_lambda(X[i], L, tm.TAU_MEDIAN))
        assert s == pytest.approx(float(lam[i]), rel=1e-5, abs=1e-7)


def test_lambda_modes_differ():
    L = _graph(seed=10)
    rng = np.random.default_rng(11)
    X = jnp.asarray(np.abs(rng.normal(size=(8, 12))).astype(np.float32))
    lam_med = np.asarray(tm.taumode_lambdas(X, L, tm.TAU_MEDIAN))
    lam_fixed = np.asarray(tm.taumode_lambdas(X, L, tm.TAU_FIXED, 0.7))
    assert not np.allclose(lam_med, lam_fixed)
