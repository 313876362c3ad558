"""Stage C: feature-space Laplacian from smoothed centroids.

Reference: ``/root/reference/surfface-core/src/laplacian.rs``. Transpose
``[C, F] → [F, C]`` feature profiles; per-feature top-k neighbours by
Bhattacharyya-coefficient affinity; max-symmetrization; ``L_sym = I -
D^{-1/2} W D^{-1/2}`` (or ArrowSpace-compatible ``L = D - W``).

TPU design: the reference's O(F²) rayon scan + DashMap becomes one fused
jitted kernel — pairwise BC on device, ``lax.top_k`` per row, dense scatter,
``max(W, Wᵀ)`` symmetrization — all on the MXU/VPU.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from matternet_rs_tpu.ops import distance as dist_ops
from matternet_rs_tpu.pipeline.centroid import CentroidState


@dataclasses.dataclass(frozen=True)
class LaplacianConfig:
    """Defaults: surfface-core/src/laplacian.rs:69-76."""

    k_neighbors: int = 15
    variance_regularizer: float = 1e-6
    normalize: bool = True
    weight_threshold: float = 1e-9


@dataclasses.dataclass
class LaplacianOutput:
    matrix: jax.Array          # [F, F] dense (structurally sparse)
    n_features: int
    nnz: int
    degrees: np.ndarray        # [F]
    sparsity: float

    def summary(self) -> str:
        return (
            f"LaplacianOutput: F={self.n_features}, nnz={self.nnz}, "
            f"sparsity={self.sparsity * 100.0:.2f}%"
        )


@functools.partial(jax.jit, static_argnames=("k", "normalize"))
def _stage_c_kernel(feat_means, feat_vars, reg, thr, k, normalize):
    """feat_means/vars: [F, C] feature profiles."""
    f = feat_means.shape[0]
    # Pairwise Bhattacharyya distance between feature profiles → BC affinity.
    D = dist_ops.bhattacharyya_pairwise(
        feat_means, feat_vars, var_floor=reg
    )
    bc = jnp.exp(-D)
    # Exclude self; below-threshold edges dropped.
    bc = bc.at[jnp.arange(f), jnp.arange(f)].set(-jnp.inf)
    bc = jnp.where(bc > thr, bc, -jnp.inf)

    kk = min(k, f - 1)
    w, idx = jax.lax.top_k(bc, kk)                       # [F, kk] descending
    valid = jnp.isfinite(w)
    w = jnp.where(valid, w, 0.0)

    rows = jnp.broadcast_to(jnp.arange(f)[:, None], idx.shape)
    W = jnp.zeros((f, f), feat_means.dtype).at[rows, idx].max(w)
    W = jnp.maximum(W, W.T)                              # max-symmetrize

    deg = jnp.sum(W, axis=1)
    connected = deg > thr
    if normalize:
        inv_sqrt = jnp.where(connected, 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-30)), 0.0)
        Wn = W * inv_sqrt[:, None] * inv_sqrt[None, :]
        L = jnp.diag(connected.astype(W.dtype)) - Wn
    else:
        L = jnp.diag(deg) - W
    return L, deg


class LaplacianStage:
    def __init__(self, config: LaplacianConfig | None = None):
        self.config = config or LaplacianConfig()

    def execute(self, state: CentroidState) -> LaplacianOutput:
        cfg = self.config
        feat_means = state.to_feature_nodes()            # [F, C]
        feat_vars = state.get_feature_variances()
        f = feat_means.shape[0]
        L, deg = _stage_c_kernel(
            feat_means, feat_vars,
            jnp.float32(cfg.variance_regularizer),
            jnp.float32(cfg.weight_threshold),
            k=int(cfg.k_neighbors), normalize=bool(cfg.normalize),
        )
        nnz = int(jnp.sum(jnp.abs(L) > 1e-9))
        return LaplacianOutput(
            matrix=L,
            n_features=int(f),
            nnz=nnz,
            degrees=np.asarray(deg),
            sparsity=1.0 - nnz / (f * f),
        )
