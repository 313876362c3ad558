"""Port of the reference's dimensional/superposition suite.

Reference: src_legacy/tests/test_dimensional.rs:10-109 — two "emitter"
signal rows over a high-dimensional moons dataset, a λτ-graph over the
signal rows, spectral (signals) Laplacian, λ recompute, then item-wise
superposition (``add_items`` in the reference, :meth:`superpose_items`
here) and multiplication with PSD sanity on the recomputed λ.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from matternet_rs_tpu.core import ArrowSpace
from matternet_rs_tpu.graph import GraphFactory, GraphParams
from matternet_rs_tpu.ops import laplacian as lap_ops
from matternet_rs_tpu.utils.fixtures import make_moons_hd


@pytest.fixture(scope="module")
def emitters():
    # test_dimensional.rs:13-21 — moons in 10-D, rows A/B = the two
    # informative coordinates over all items.
    items = make_moons_hd(300, 0.10, 0.02, 10, 42)
    row_a = items[:, 0].astype(np.float32)
    row_b = items[:, 1].astype(np.float32)
    return row_a, row_b


def _build(row_a, row_b):
    aspace = ArrowSpace.from_items(np.stack([row_a, row_b]))
    assert aspace.nitems == 2, "expected exactly two signal rows"
    assert aspace.nfeatures == 300
    # test_dimensional.rs:55-63: eps=1e-3, k=12, topk=6, p=2, σ=eps/2,
    # normalise=true. The reference test passes the raw 2×N matrix, but its
    # legacy tree never compiles (SURVEY §0) and the shapes only cohere
    # with the standard feature-space convention — transpose to [F, items]
    # profiles so λ (per item, length F) matches the F×F graph, exactly as
    # `build_laplacian_matrix_from_k_cluster` (graph.rs:193-249) does.
    params = GraphParams(
        eps=1e-3, k=12, topk=6, p=2.0, sigma=1e-3 * 0.5, normalise=True,
        sparsity_check=False,
    )
    gl = lap_ops.build_laplacian_from_k_cluster(
        jnp.asarray(aspace.data), params, n_items=aspace.nitems
    )
    GraphFactory.build_spectral_laplacian(aspace, gl)
    aspace.recompute_lambdas(gl)
    return aspace, gl


def _assert_psd_lambdas(aspace):
    lams = np.asarray(aspace.lambdas, np.float64)
    assert np.all(np.isfinite(lams))
    # test_dimensional.rs:73-76,96-108: λ ≥ 0 (PSD Laplacian), incl. the
    # smallest/Fiedler positions after sorting.
    assert np.all(lams >= -1e-9), f"negative λ: {lams.min()}"
    ls = np.sort(lams)
    assert ls[0] >= -1e-9
    if len(ls) > 1:
        assert ls[1] >= -1e-9


def test_two_emitters_superposition_lambda_with_moons_hd(emitters):
    row_a, row_b = emitters
    aspace_sum, gl = _build(row_a, row_b)
    _assert_psd_lambdas(aspace_sum)

    before = np.asarray(aspace_sum.data[0]).copy()
    other = np.asarray(aspace_sum.data[1]).copy()
    aspace_sum.superpose_items(0, 1, gl)  # test_dimensional.rs:83
    np.testing.assert_allclose(
        np.asarray(aspace_sum.data[0]), before + other, rtol=1e-6
    )
    _assert_psd_lambdas(aspace_sum)


def test_two_emitters_multiplication_lambda_with_moons_hd(emitters):
    row_a, row_b = emitters
    aspace_mul, gl = _build(row_a, row_b)
    _assert_psd_lambdas(aspace_mul)

    before = np.asarray(aspace_mul.data[0]).copy()
    other = np.asarray(aspace_mul.data[1]).copy()
    aspace_mul.mul_items(0, 1, gl)  # test_dimensional.rs:89
    np.testing.assert_allclose(
        np.asarray(aspace_mul.data[0]), before * other, rtol=1e-6, atol=1e-9
    )
    _assert_psd_lambdas(aspace_mul)


def test_superpose_items_bounds_checked(emitters):
    row_a, row_b = emitters
    aspace, gl = _build(row_a, row_b)
    with pytest.raises(ValueError, match="out of bounds"):
        aspace.superpose_items(0, 5, gl)
    with pytest.raises(ValueError, match="out of bounds"):
        aspace.superpose_items(-1, 0, gl)
