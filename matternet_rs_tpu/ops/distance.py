"""Distance / similarity kernels, batched and MXU-friendly.

Capability parity with the reference's distance layer:

* cosine similarity and rectified cosine distance
  (``/root/reference/src_legacy/laplacian.rs:74-80`` — distance
  ``d = 1 - max(0, cos)`` so anti-correlated items are disconnected),
* squared-Euclidean / Euclidean pairwise distances via the
  ``‖a-b‖² = ‖a‖² + ‖b‖² - 2⟨a,b⟩`` matmul expansion
  (``/root/reference/surfface-pipeline/src/stages/clustering.rs:44-59``),
* diagonal-Gaussian Bhattacharyya distance and coefficient
  (``/root/reference/surfface-core/src/distance.rs:29-177,260-290``).

All functions are pure, jittable, and batched: the pairwise variants take
``[M, F]`` × ``[N, F]`` and return ``[M, N]`` so XLA tiles them onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from matternet_rs_tpu.ops._mm import mm

EPS_NORM = 1e-12


def l2_norms(x: jax.Array, axis: int = -1, keepdims: bool = False) -> jax.Array:
    """Row L2 norms (reference: RowMatrix::row_norms, matrix.rs:36-50)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims))


def normalize_rows(x: jax.Array) -> jax.Array:
    """L2-normalize rows; zero rows stay zero."""
    n = l2_norms(x, keepdims=True)
    return x / jnp.maximum(n, EPS_NORM)


def standardize_columns(x: jax.Array) -> jax.Array:
    """Z-score each column (mean 0, std 1), std floored for constant columns.

    Mirrors the StandardScaler preprocessing the reference applies when
    ``params.normalise`` is true (``src_legacy/laplacian.rs:147-156``).
    """
    mean = jnp.mean(x, axis=0, keepdims=True)
    std = jnp.std(x, axis=0, keepdims=True)
    return (x - mean) / jnp.maximum(std, EPS_NORM)


def cosine_similarity(a: jax.Array, b: jax.Array) -> jax.Array:
    """Cosine similarity between two vectors (0 if either is ~zero)."""
    na = jnp.sqrt(jnp.sum(a * a))
    nb = jnp.sqrt(jnp.sum(b * b))
    denom = na * nb
    return jnp.where(denom > EPS_NORM, jnp.dot(a, b) / jnp.maximum(denom, EPS_NORM), 0.0)


def pairwise_cosine(a: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """``[M, N]`` cosine similarities between rows of ``a`` and ``b``.

    One MXU matmul after row normalization.
    """
    if b is None:
        b = a
    an = normalize_rows(a)
    bn = normalize_rows(b)
    return mm(an, bn.T)


def rectified_cosine_distance(a: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """``d = 1 - max(0, cos)`` ∈ [0, 1]; anti-correlated pairs saturate at 1.

    Reference: src_legacy/laplacian.rs:74-80.
    """
    return 1.0 - jnp.maximum(pairwise_cosine(a, b), 0.0)


def pairwise_sqeuclidean(a: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """``[M, N]`` squared Euclidean distances via the matmul expansion.

    Clamped at 0 to absorb cancellation error (reference does the same on the
    GPU clustering path, surfface-pipeline/src/stages/clustering.rs:56-59).
    """
    if b is None:
        b = a
    a_sq = jnp.sum(a * a, axis=-1, keepdims=True)            # [M, 1]
    b_sq = jnp.sum(b * b, axis=-1, keepdims=True).T          # [1, N]
    cross = mm(a, b.T)
    return jnp.maximum(a_sq + b_sq - 2.0 * cross, 0.0)


def pairwise_euclidean(a: jax.Array, b: jax.Array | None = None) -> jax.Array:
    return jnp.sqrt(pairwise_sqeuclidean(a, b))


# ---------------------------------------------------------------------------
# Diagonal-Gaussian Bhattacharyya (surfface-core/src/distance.rs)
# ---------------------------------------------------------------------------

VAR_FLOOR = 1e-6


def bhattacharyya_diagonal(
    mu1: jax.Array, var1: jax.Array, mu2: jax.Array, var2: jax.Array,
    var_floor: float = VAR_FLOOR,
) -> jax.Array:
    """Bhattacharyya distance between diagonal Gaussians (vector inputs).

    ``DB = 1/8 Σ (μ1-μ2)²/σ̄² + 1/2 Σ ln(σ̄²/√(σ1²σ2²))`` with
    ``σ̄² = (σ1²+σ2²)/2``. Matches surfface-core/src/distance.rs:29-63.
    Variances are floored for numerical stability (preflight clamp,
    surfface-core/src/preflight.rs).
    """
    v1 = jnp.maximum(var1, var_floor)
    v2 = jnp.maximum(var2, var_floor)
    vbar = 0.5 * (v1 + v2)
    mterm = 0.125 * jnp.sum((mu1 - mu2) ** 2 / vbar, axis=-1)
    vterm = 0.5 * jnp.sum(jnp.log(vbar / jnp.sqrt(v1 * v2)), axis=-1)
    return mterm + vterm


def bhattacharyya_pairwise(
    mu_a: jax.Array, var_a: jax.Array, mu_b: jax.Array | None = None,
    var_b: jax.Array | None = None, var_floor: float = VAR_FLOOR,
) -> jax.Array:
    """``[M, N]`` pairwise Bhattacharyya distances between diagonal Gaussians.

    The reference materializes an ``[F, F, C]`` broadcast tensor
    (surfface-core/src/distance.rs:143-177); here we keep the broadcast lazy
    and let XLA fuse the reduction. For very large M·N·F, tile the caller.
    """
    if mu_b is None:
        mu_b, var_b = mu_a, var_a
    v_a = jnp.maximum(var_a, var_floor)[:, None, :]   # [M, 1, F]
    v_b = jnp.maximum(var_b, var_floor)[None, :, :]   # [1, N, F]
    vbar = 0.5 * (v_a + v_b)
    diff = mu_a[:, None, :] - mu_b[None, :, :]
    mterm = 0.125 * jnp.sum(diff * diff / vbar, axis=-1)
    vterm = 0.5 * jnp.sum(jnp.log(vbar) - 0.5 * (jnp.log(v_a) + jnp.log(v_b)), axis=-1)
    return mterm + vterm


def bhattacharyya_coefficient(distance: jax.Array) -> jax.Array:
    """Affinity in (0, 1]: ``BC = exp(-DB)`` (surfface-core/src/distance.rs:260-290)."""
    return jnp.exp(-distance)


def bhattacharyya_affinity(
    mu1: jax.Array, var1: jax.Array, mu2: jax.Array, var2: jax.Array,
    var_floor: float = VAR_FLOOR,
) -> jax.Array:
    """``exp(-DB)`` affinity in (0, 1] straight from the Gaussian params
    (surfface-core/src/distance.rs:115-123)."""
    return jnp.exp(-bhattacharyya_diagonal(mu1, var1, mu2, var2, var_floor))
