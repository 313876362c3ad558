"""Pallas ELL SpMV: ``W @ X`` for fixed-degree graphs at large F.

The BASELINE north star names "Pallas sparse SpMV" for the large-F regime
where densifying the F×F Laplacian stops being free (F ≳ 4k: F²·4 B per
matrix). Every graph in this framework is top-k capped, so ELL
(``indices/weights [n, k]``, zero-weight padding) is exact. The kernel tiles
rows; each tile gathers its neighbour rows of the dense right-hand side
``X [n, m]`` from VMEM-resident X (m small — eigensolver blocks, diffusion
state) and accumulates ``Σ_k w·X[idx]`` on the VPU.

For m = F-scale right-hand sides use the dense path instead; this kernel
targets skinny RHS (block vectors, m ≤ ~256).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 256


def _kernel(idx_ref, w_ref, x_ref, out_ref):
    idx = idx_ref[:]                   # [T, K] int32 (global row ids)
    w = w_ref[:]                       # [T, K]
    X = x_ref[:]                       # [n, m] — full RHS in VMEM
    gathered = X[idx]                  # [T, K, m]
    out_ref[:] = jnp.sum(w[..., None] * gathered, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmv_ell_pallas(
    indices: jax.Array, weights: jax.Array, X: jax.Array, interpret: bool = False
) -> jax.Array:
    """``W @ X`` with W in ELL form. ``X [n, m]`` (m padded to 128 lanes).

    Returns ``[n, m]``. Zero-weight slots contribute nothing regardless of
    their index value.
    """
    n, k = indices.shape
    m = X.shape[1]
    m_pad = (-m) % 128
    n_pad = (-n) % TILE_ROWS
    k_pad = (-k) % 128
    if m_pad:
        X = jnp.pad(X, ((0, 0), (0, m_pad)))
    if n_pad:
        indices = jnp.pad(indices, ((0, n_pad), (0, 0)))
        weights = jnp.pad(weights, ((0, n_pad), (0, 0)))
        X = jnp.pad(X, ((0, n_pad), (0, 0)))
    if k_pad:
        indices = jnp.pad(indices, ((0, 0), (0, k_pad)))
        weights = jnp.pad(weights, ((0, 0), (0, k_pad)))
    np_, kp = indices.shape
    mp = X.shape[1]

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((np_, mp), jnp.float32),
        grid=(np_ // TILE_ROWS,),
        in_specs=[
            pl.BlockSpec((TILE_ROWS, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_ROWS, mp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(indices.astype(jnp.int32), weights.astype(jnp.float32), X.astype(jnp.float32))
    return out[:n, :m]


def laplacian_spmv_ell_pallas(
    indices: jax.Array, weights: jax.Array, X: jax.Array, interpret: bool = False
) -> jax.Array:
    """``L @ X = deg∘X - W@X`` in ELL form."""
    deg = jnp.sum(weights, axis=1)
    return deg[:, None] * X - spmv_ell_pallas(indices, weights, X, interpret)
