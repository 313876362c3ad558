"""Johnson-Lindenstrauss implicit random projection.

TPU-native counterpart of the reference's seed-only Gaussian projection
(``/root/reference/src_legacy/reduction.rs``): only the PRNG key is stored —
the projection matrix is regenerated deterministically from it. Where the
reference re-runs a ChaCha8 stream per query (O(F·r) RNG per projection!),
we materialize the ``[F, r]`` Gaussian once from a ``jax.random`` key (same
math, threefry stream) and project with one MXU matmul; persistence stores
the seed, so resume regenerates bit-identical projections.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp


def compute_jl_dimension(n_points: int, original_dim: int, epsilon: float) -> int:
    """JL target dimension: ``r ≥ 8·ln(n)/ε²`` clamped to [32, F], with an
    adaptive buffer ×1.2–2.0 for F > 2048 (reduction.rs:126-173)."""
    if original_dim < 32:
        return original_dim
    log_n = math.log(max(n_points, 1))
    jl_bound = math.ceil(8.0 * log_n / (epsilon ** 2))
    if original_dim > 2048:
        compression_ratio = original_dim / max(jl_bound, 1)
        if compression_ratio < 10.0:
            buffer_factor = 1.2
        elif compression_ratio < 100.0:
            buffer_factor = 1.5
        else:
            buffer_factor = 2.0
        return int(min(max(math.ceil(jl_bound * buffer_factor), 32), original_dim))
    return int(min(max(jl_bound, 32), original_dim))


@functools.lru_cache(maxsize=8)
def _projection_matrix(seed: int, original_dim: int, reduced_dim: int) -> jax.Array:
    key = jax.random.PRNGKey(seed)
    scale = 1.0 / math.sqrt(reduced_dim)
    return jax.random.normal(key, (original_dim, reduced_dim), jnp.float32) * scale


@dataclasses.dataclass(frozen=True)
class ImplicitProjection:
    """Seed-only Gaussian projection (reduction.rs:202-246).

    Stores 8 bytes of state; ``matrix()`` regenerates the ``[F, r]`` Gaussian
    (scaled by 1/√r) deterministically from the seed.
    """

    original_dim: int
    reduced_dim: int
    seed: int = 42

    def matrix(self) -> jax.Array:
        return _projection_matrix(self.seed, self.original_dim, self.reduced_dim)

    def project(self, x: jax.Array) -> jax.Array:
        """Project ``[..., F] → [..., r]`` with one matmul."""
        x = jnp.asarray(x, jnp.float32)
        return jnp.dot(x, self.matrix(), preferred_element_type=jnp.float32)


def project_matrix(data: jax.Array, projection: ImplicitProjection) -> jax.Array:
    """Batch projection of ``[N, F]`` (reduction.rs:176-200)."""
    return projection.project(data)
