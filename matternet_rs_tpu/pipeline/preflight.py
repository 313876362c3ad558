"""Stage B0: preflight — magnitude analysis, conditional L2 normalization,
zero-variance detection, variance regularization.

Reference: ``/root/reference/surfface-core/src/preflight.rs``. One fused
jitted pass; only the summary scalars come to host.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from matternet_rs_tpu.pipeline.centroid import CentroidState


@dataclasses.dataclass(frozen=True)
class PreflightConfig:
    """Defaults: preflight.rs:37-46."""

    magnitude_threshold: float = 10.0
    min_variance: float = 1e-6
    variance_epsilon: float = 1e-4
    variance_min: float = 1e-4
    variance_max: float = 100.0
    remove_zero_variance: bool = False

    @classmethod
    def conservative(cls) -> "PreflightConfig":
        return cls(magnitude_threshold=5.0, min_variance=1e-5,
                   variance_epsilon=1e-3, variance_min=1e-3, variance_max=50.0)

    @classmethod
    def strict(cls) -> "PreflightConfig":
        return cls(min_variance=1e-4, remove_zero_variance=True)


@dataclasses.dataclass
class MagnitudeStats:
    min_norm: float
    max_norm: float
    mean_norm: float
    variance_ratio: float

    def needs_normalization(self, threshold: float) -> bool:
        return self.variance_ratio > threshold


@dataclasses.dataclass
class PreflightOutput:
    normalized_centroids: jax.Array
    original_centroids: jax.Array
    variances: jax.Array
    was_normalized: bool
    magnitude_stats: MagnitudeStats
    zero_variance_features: np.ndarray
    state: CentroidState


@jax.jit
def _preflight_kernel(means, variances, eps, vmin, vmax):
    norms = jnp.sqrt(jnp.sum(means * means, axis=1))
    min_norm = jnp.maximum(jnp.min(norms), 1e-10)
    max_norm = jnp.max(norms)
    mean_norm = jnp.mean(norms)
    ratio = max_norm / min_norm
    normalized = means / jnp.maximum(norms, 1e-10)[:, None]
    feature_var = jnp.mean(variances, axis=0)
    reg_var = jnp.clip(variances + eps, vmin, vmax)
    return normalized, reg_var, feature_var, min_norm, max_norm, mean_norm, ratio


class PreflightStage:
    def __init__(self, config: PreflightConfig | None = None):
        self.config = config or PreflightConfig()

    def execute(self, state: CentroidState) -> PreflightOutput:
        cfg = self.config
        normalized, reg_var, feature_var, mn, mx, mean, ratio = _preflight_kernel(
            state.means, state.variances,
            jnp.float32(cfg.variance_epsilon),
            jnp.float32(cfg.variance_min), jnp.float32(cfg.variance_max),
        )
        stats = MagnitudeStats(float(mn), float(mx), float(mean), float(ratio))
        was_normalized = stats.needs_normalization(cfg.magnitude_threshold)
        out_means = normalized if was_normalized else state.means
        zero_var = np.nonzero(np.asarray(feature_var) < cfg.min_variance)[0]
        new_state = CentroidState(
            means=state.means, variances=reg_var, counts=state.counts
        )
        return PreflightOutput(
            normalized_centroids=out_means,
            original_centroids=state.means,
            variances=reg_var,
            was_normalized=was_normalized,
            magnitude_stats=stats,
            zero_variance_features=zero_var,
            state=new_state,
        )
