"""CentroidState: [C, F] means + diagonal variances + counts.

Reference: ``/root/reference/surfface-core/src/centroid.rs``. The Kalman
clusterer bridge of the reference is replaced by our own variance-tracking
clustering stage (Welford online moments on device).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class CentroidState:
    means: jax.Array        # [C, F]
    variances: jax.Array    # [C, F] diagonal covariance
    counts: jax.Array       # [C] int32

    @classmethod
    def from_clustering(
        cls, centroids, counts, initial_variance: float = 0.1
    ) -> "CentroidState":
        """Uniform initial variance (centroid.rs:43-56); refined by B2."""
        means = jnp.asarray(centroids, jnp.float32)
        return cls(
            means=means,
            variances=jnp.full(means.shape, initial_variance, jnp.float32),
            counts=jnp.asarray(counts, jnp.int32),
        )

    @property
    def num_centroids(self) -> int:
        return int(self.means.shape[0])

    @property
    def feature_dim(self) -> int:
        return int(self.means.shape[1])

    def get_thickness(self) -> jax.Array:
        """Thickness proxy: mean variance per centroid, trace(P)/F
        (centroid.rs:107-110)."""
        return jnp.mean(self.variances, axis=1)

    def to_feature_nodes(self) -> jax.Array:
        """Transpose to feature space [F, C] (centroid.rs:112-115)."""
        return self.means.T

    def get_feature_variances(self) -> jax.Array:
        return self.variances.T

    def regularize_variances(
        self, eps: float, min_var: float, max_var: float
    ) -> "CentroidState":
        """(var + ε) clamped to [min, max] (centroid.rs:122-125). Returns a
        new state (functional, jit-friendly)."""
        return CentroidState(
            means=self.means,
            variances=jnp.clip(self.variances + eps, min_var, max_var),
            counts=self.counts,
        )
