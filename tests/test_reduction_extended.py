"""JL-dimension formula regime tests — ports the ``compute_jl_dimension``
assertion classes from ``/root/reference/src_legacy/tests/test_reduction.rs``
(:193-579) and ``surfface-core/src/tests/test_reduction.rs`` (:140-327):
low-dim pass-through, never-expands, minimum bound, the F>2048 adaptive
buffer tiers, cap-at-original, growth in n, inverse-ε² scaling, the
Dorothea scenario, boundary behaviour at 2048, and monotonicity."""

from __future__ import annotations

import math

import numpy as np

from matternet_rs_tpu.reduction import (
    ImplicitProjection,
    compute_jl_dimension,
    project_matrix,
)


# ---------------------------------------------------------------------------
# formula regimes
# ---------------------------------------------------------------------------


def test_jl_dimension_preserves_low_dims():
    # F < 32: projection can't help, return F unchanged.
    for f in (1, 8, 16, 31):
        assert compute_jl_dimension(1000, f, 0.3) == f


def test_jl_dimension_never_expands():
    for n in (10, 100, 10_000, 1_000_000):
        for f in (64, 512, 4096, 100_000):
            for eps in (0.1, 0.3, 0.5):
                assert compute_jl_dimension(n, f, eps) <= f


def test_jl_dimension_minimum_bound():
    # Tiny n: the 32-dim floor applies (for F ≥ 32).
    assert compute_jl_dimension(2, 1000, 0.5) >= 32


def test_jl_dimension_standard_regime():
    # F ≤ 2048: r = ceil(8·ln(n)/ε²) clamped to [32, F], no buffer.
    n, f, eps = 10_000, 1024, 0.3
    expected = min(max(math.ceil(8.0 * math.log(n) / eps ** 2), 32), f)
    assert compute_jl_dimension(n, f, eps) == expected


def test_jl_dimension_formula_correctness_standard():
    n, eps = 1000, 0.5
    bound = math.ceil(8.0 * math.log(n) / eps ** 2)   # ≈ 222
    assert compute_jl_dimension(n, 2048, eps) == bound


def test_jl_dimension_high_dim_buffer_tiers():
    # F > 2048 applies a compression-dependent buffer: ×1.2 when F/bound
    # < 10, ×1.5 when < 100, ×2.0 beyond (reduction.rs:126-173).
    eps = 0.3
    n = 10_000
    bound = math.ceil(8.0 * math.log(n) / eps ** 2)    # ≈ 819

    mild_f = 4096                                      # ratio ≈ 5 < 10
    assert compute_jl_dimension(n, mild_f, eps) == min(
        max(math.ceil(bound * 1.2), 32), mild_f
    )

    moderate_f = 40_960                                # ratio ≈ 50 < 100
    assert compute_jl_dimension(n, moderate_f, eps) == min(
        max(math.ceil(bound * 1.5), 32), moderate_f
    )

    severe_f = 100_000                                 # ratio > 100
    assert compute_jl_dimension(n, severe_f, eps) == min(
        max(math.ceil(bound * 2.0), 32), severe_f
    )


def test_jl_dimension_buffer_caps_at_original():
    # The buffered value never exceeds F.
    n, eps = 1_000_000, 0.1     # bound = 8·ln(1e6)/0.01 ≈ 11,052
    f = 3000
    assert compute_jl_dimension(n, f, eps) == f


def test_jl_dimension_grows_with_n():
    eps, f = 0.3, 100_000
    dims = [compute_jl_dimension(n, f, eps) for n in (100, 10_000, 1_000_000)]
    assert dims[0] < dims[1] < dims[2]


def test_jl_dimension_inversely_proportional_epsilon():
    n, f = 10_000, 100_000
    tight = compute_jl_dimension(n, f, 0.1)
    loose = compute_jl_dimension(n, f, 0.5)
    assert tight > loose
    # ε² scaling: ratio ≈ 25 (same buffer tier would make it exact; allow
    # tier crossing).
    assert tight / loose > 5


def test_jl_dimension_dorothea_scenario():
    # Dorothea: N=800 docs, F=100k sparse features (reduction.rs:390-407).
    r = compute_jl_dimension(800, 100_000, 0.3)
    assert 32 <= r < 100_000
    assert r < 5000, "must give massive compression on Dorothea shapes"


def test_jl_dimension_boundary_2048():
    # F=2048 uses the raw formula; F=2049 applies a buffer ⇒ jump is the
    # buffer factor, never a drop.
    n, eps = 50_000, 0.3
    at = compute_jl_dimension(n, 2048, eps)
    above = compute_jl_dimension(n, 2049, eps)
    assert above >= at


def test_jl_dimension_consistency():
    vals = {compute_jl_dimension(5000, 8192, 0.3) for _ in range(5)}
    assert len(vals) == 1


def test_jl_dimension_monotonicity_in_f():
    # For fixed n/ε, growing F never shrinks the target dimension.
    n, eps = 20_000, 0.3
    dims = [compute_jl_dimension(n, f, eps) for f in (64, 512, 2048, 8192, 65_536)]
    assert all(a <= b for a, b in zip(dims, dims[1:]))


def test_jl_dimension_edge_case_single_point():
    r = compute_jl_dimension(1, 10_000, 0.3)
    assert 32 <= r <= 10_000


# ---------------------------------------------------------------------------
# projection batch semantics (test_reduction.rs:128-191)
# ---------------------------------------------------------------------------


def test_project_matrix_dimensions():
    proj = ImplicitProjection(500, 64, seed=3)
    X = np.random.default_rng(0).standard_normal((17, 500)).astype(np.float32)
    out = np.asarray(project_matrix(X, proj))
    assert out.shape == (17, 64)


def test_project_matrix_preserves_rows():
    # Batch projection row i == single projection of row i.
    proj = ImplicitProjection(300, 48, seed=4)
    X = np.random.default_rng(1).standard_normal((5, 300)).astype(np.float32)
    batch = np.asarray(project_matrix(X, proj))
    for i in range(5):
        single = np.asarray(proj.project(X[i]))
        np.testing.assert_allclose(batch[i], single, atol=1e-5)


def test_project_matrix_zero_matrix():
    proj = ImplicitProjection(300, 48, seed=5)
    out = np.asarray(project_matrix(np.zeros((4, 300), np.float32), proj))
    np.testing.assert_allclose(out, 0.0, atol=1e-7)


def test_project_matrix_different_rows_different_projections():
    proj = ImplicitProjection(300, 48, seed=6)
    X = np.random.default_rng(2).standard_normal((2, 300)).astype(np.float32)
    out = np.asarray(project_matrix(X, proj))
    assert not np.allclose(out[0], out[1])


def test_implicit_projection_different_seeds_differ():
    a = ImplicitProjection(300, 48, seed=1)
    b = ImplicitProjection(300, 48, seed=2)
    q = np.random.default_rng(3).standard_normal(300).astype(np.float32)
    assert not np.allclose(np.asarray(a.project(q)), np.asarray(b.project(q)))


def test_memory_efficiency_seed_only_state():
    # The implicit projection stores O(1) state — no materialized matrix in
    # the dataclass (reduction.rs:609-620: "8 bytes vs F·r·8").
    import dataclasses

    proj = ImplicitProjection(100_000, 512, seed=9)
    fields = {f.name for f in dataclasses.fields(proj)}
    assert fields == {"original_dim", "reduced_dim", "seed"}
