"""Stage B2: Kalman RTS smoothing along the MST 1-D order.

Reference: ``/root/reference/surfface-core/src/smoothing_chain.rs``.
Scalar-per-feature diagonal Kalman; transition models Identity / Damped(α) /
TrunkAware (lower Q on trunk edges).

TPU design: the C sequential steps are two ``lax.scan``s (forward filter,
backward RTS), each step vectorized over all F features on the VPU — the
reference's nested ``for t / for feat`` loops collapse to [F]-wide scans.
Output rows are in MST-traversal order, like the reference
(``KalmanOutput.smoothed_means`` row t ↔ centroid ``order[t]``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from matternet_rs_tpu.pipeline.centroid import CentroidState
from matternet_rs_tpu.pipeline.mst import MSTOutput

IDENTITY = "identity"
DAMPED = "damped"
TRUNK_AWARE = "trunk_aware"


@dataclasses.dataclass(frozen=True)
class SmoothingConfig:
    """Defaults: smoothing_chain.rs:65-74."""

    process_noise: float = 0.01
    observation_noise: float = 0.1
    transition_model: str = IDENTITY
    damping: float = 1.0              # α for Damped
    trunk_factor: float = 1.0         # Q multiplier on trunk edges
    variance_floor: float = 1e-6
    variance_ceiling: float = 1e3

    @classmethod
    def conservative(cls) -> "SmoothingConfig":
        return cls(process_noise=0.1, observation_noise=0.01)

    @classmethod
    def aggressive(cls) -> "SmoothingConfig":
        return cls(process_noise=0.001, observation_noise=1.0)

    @classmethod
    def trunk_aware(cls, trunk_factor: float) -> "SmoothingConfig":
        return cls(transition_model=TRUNK_AWARE, trunk_factor=trunk_factor)


@dataclasses.dataclass
class KalmanOutput:
    smoothed_means: jax.Array        # [C, F] in MST order
    smoothed_variances: jax.Array    # [C, F]
    counts: jax.Array                # [C] (reordered to MST order)
    filtered_means: jax.Array
    filtered_variances: jax.Array
    smoothing_gains: np.ndarray      # [C-1] mean RTS gain per transition
    variance_reduction: float
    order: np.ndarray                # MST traversal order (row t ↔ order[t])

    def summary(self) -> str:
        n = len(self.smoothing_gains)
        mean_gain = float(self.smoothing_gains.mean()) if n else 0.0
        return (
            f"Kalman: variance_reduction={self.variance_reduction * 100.0:.2f}%, "
            f"gains_mean={mean_gain:.4f} (over {n} transitions)"
        )

    def to_centroid_state(self) -> CentroidState:
        return CentroidState(
            means=self.smoothed_means,
            variances=self.smoothed_variances,
            counts=self.counts,
        )


@functools.partial(
    jax.jit, static_argnames=("model",)
)
def _rts_kernel(
    means_o, vars_o, trunk_flags, model, alpha, trunk_factor,
    q, r, vfloor, vceil,
):
    """means_o/vars_o: [C, F] already reordered into MST order.
    trunk_flags: [C] bool — step t is a trunk edge (order[t-1] → order[t])."""
    c, f = means_o.shape

    # t = 0 initialisation (smoothing_chain.rs:297-305).
    x0 = means_o[0]
    p0 = jnp.clip(vars_o[0] + q, vfloor, vceil)

    def fwd_step(carry, inp):
        x_prev, p_prev = carry
        y_obs, var_obs, is_trunk = inp
        if model == IDENTITY:
            x_pred = x_prev
            p_pred = p_prev + q
        elif model == DAMPED:
            x_pred = alpha * x_prev
            p_pred = alpha * alpha * p_prev + q
        else:  # TRUNK_AWARE
            q_eff = jnp.where(is_trunk, q * trunk_factor, q)
            x_pred = x_prev
            p_pred = p_prev + q_eff
        p_pred = jnp.clip(p_pred, vfloor, vceil)

        r_obs = jnp.maximum(jnp.clip(var_obs, vfloor, vceil) + r, vfloor)
        s = p_pred + r_obs
        k = jnp.clip(p_pred / s, 0.0, 1.0)
        x_filt = x_pred + k * (y_obs - x_pred)
        p_filt = jnp.clip((1.0 - k) * p_pred, vfloor, vceil)
        return (x_filt, p_filt), (x_filt, p_filt, x_pred, p_pred)

    (_, _), (xf, pf, xp, pp) = jax.lax.scan(
        fwd_step, (x0, p0),
        (means_o[1:], vars_o[1:], trunk_flags[1:]),
    )
    filtered_means = jnp.concatenate([x0[None], xf], axis=0)
    filtered_vars = jnp.concatenate([p0[None], pf], axis=0)
    # predicted_* index t corresponds to transition into step t (t ≥ 1).

    # Backward RTS scan (smoothing_chain.rs:402-453), iterating t = C-2 .. 0.
    def bwd_step(carry, inp):
        x_sm_next, p_sm_next = carry
        x_filt, p_filt, x_pred_next, p_pred_next = inp
        j = jnp.where(
            p_pred_next > vfloor,
            jnp.clip(p_filt / jnp.maximum(p_pred_next, vfloor), 0.0, 1.0),
            0.0,
        )
        x_sm = x_filt + j * (x_sm_next - x_pred_next)
        p_sm = jnp.clip(p_filt + j * j * (p_sm_next - p_pred_next), vfloor, vceil)
        return (x_sm, p_sm), (x_sm, p_sm, jnp.mean(j))

    init = (filtered_means[-1], filtered_vars[-1])
    (_, _), (xs, ps, gains) = jax.lax.scan(
        bwd_step,
        init,
        (filtered_means[:-1], filtered_vars[:-1], xp, pp),
        reverse=True,
    )
    smoothed_means = jnp.concatenate([xs, filtered_means[-1:]], axis=0)
    smoothed_vars = jnp.concatenate([ps, filtered_vars[-1:]], axis=0)
    return filtered_means, filtered_vars, smoothed_means, smoothed_vars, gains


class SmoothingStage:
    def __init__(self, config: SmoothingConfig | None = None):
        self.config = config or SmoothingConfig()

    def execute(self, state: CentroidState, mst_output: MSTOutput) -> KalmanOutput:
        cfg = self.config
        order = np.asarray(mst_output.centroid_order, np.int64)
        c = len(order)

        means_o = jnp.asarray(np.asarray(state.means)[order])
        vars_o = jnp.asarray(np.asarray(state.variances)[order])
        counts_o = jnp.asarray(np.asarray(state.counts)[order])

        # Trunk flag for the transition (order[t-1] → order[t]).
        trunk_flags = np.zeros(c, bool)
        for t in range(1, c):
            trunk_flags[t] = (int(order[t - 1]), int(order[t])) in mst_output.trunk_edges
        trunk_flags = jnp.asarray(trunk_flags)

        fm, fv, sm, sv, gains = _rts_kernel(
            means_o, vars_o, trunk_flags,
            cfg.transition_model,
            jnp.float32(cfg.damping), jnp.float32(cfg.trunk_factor),
            jnp.float32(cfg.process_noise), jnp.float32(cfg.observation_noise),
            jnp.float32(cfg.variance_floor), jnp.float32(cfg.variance_ceiling),
        )

        raw_var_mean = float(jnp.mean(state.variances))
        smoothed_var_mean = float(jnp.mean(sv))
        variance_reduction = (
            (raw_var_mean - smoothed_var_mean) / raw_var_mean
            if raw_var_mean > 0 else 0.0
        )
        return KalmanOutput(
            smoothed_means=sm,
            smoothed_variances=sv,
            counts=counts_o,
            filtered_means=fm,
            filtered_variances=fv,
            smoothing_gains=np.asarray(gains),
            variance_reduction=variance_reduction,
            order=order,
        )
