"""Stage D: batched spectral λ scoring — Rayleigh + Dirichlet.

Reference: ``/root/reference/surfface-core/src/spectral/mod.rs`` and
``spectral/bridge.rs``. λ_i = Rayleigh(L, x_i) + Dirichlet(W, x_i) where
Dirichlet normalizes each item's edge energy by the *global* total energy
across all items (spectral/mod.rs:106-146 — note: different formula from the
legacy per-item taumode blend; both are provided, per SURVEY §7.3).

TPU design: the reference already shaped this stage as batched device
matmuls; here the Rayleigh and Dirichlet share the ``W·Xᵀ`` work in one jit
so XLA fuses the elementwise tail (the reference computes ``Wx`` twice).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from matternet_rs_tpu.ops._mm import mm
from matternet_rs_tpu.pipeline.laplacian import LaplacianOutput


@jax.jit
def _stage_d_kernel(L, X):
    # Rayleigh: e_i = (x_i^T L x_i) / (x_i^T x_i), clamped (mod.rs:69-90).
    XL = mm(X, L.T)
    x_sq = X * X
    num = jnp.sum(X * XL, axis=-1)
    den = jnp.sum(x_sq, axis=-1)
    rayleigh = jnp.clip(num / (den + 1e-9), -1e6, 1e6)

    # Dirichlet: per-item edge energy / global total (mod.rs:106-146).
    W = jnp.maximum(-L, 0.0)
    deg = jnp.sum(W, axis=1)
    WX = mm(X, W.T)
    WX2 = mm(x_sq, W.T)
    edge_energy = deg[None, :] * x_sq - 2.0 * X * WX + WX2
    row_sums = jnp.sum(jnp.maximum(edge_energy, 0.0), axis=-1)
    total = jnp.sum(row_sums)
    dirichlet = jnp.clip(row_sums / (total + 1e-12), 0.0, 1.0)

    return rayleigh + dirichlet, rayleigh, dirichlet


def rayleigh_quotient_batch(L: jax.Array, X: jax.Array) -> jax.Array:
    """Standalone batched Rayleigh (mod.rs:69-90)."""
    return _stage_d_kernel(jnp.asarray(L, jnp.float32), jnp.asarray(X, jnp.float32))[1]


def dirichlet_dispersion_batch(L: jax.Array, X: jax.Array) -> jax.Array:
    """Standalone batched Dirichlet (mod.rs:106-146)."""
    return _stage_d_kernel(jnp.asarray(L, jnp.float32), jnp.asarray(X, jnp.float32))[2]


def compute_lambdas(L: jax.Array, X: jax.Array) -> np.ndarray:
    """All-N λ in one fused dispatch; only [N] scalars leave the device
    (mod.rs:158-181)."""
    lam, _, _ = _stage_d_kernel(
        jnp.asarray(L, jnp.float32), jnp.asarray(X, jnp.float32)
    )
    return np.asarray(lam, np.float64)


def compute_tau_mode(
    laplacian: LaplacianOutput, data, n_items: int, n_features: int
) -> np.ndarray:
    """Stage-D wrapper (bridge.rs:27-69): densified L stays on device; only
    the N λ scalars come back."""
    X = jnp.asarray(data, jnp.float32).reshape(n_items, n_features)
    return compute_lambdas(laplacian.matrix, X)
