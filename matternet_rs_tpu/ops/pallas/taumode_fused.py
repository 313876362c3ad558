"""Fused taumode-λ Pallas kernel.

The λ engine (see :mod:`matternet_rs_tpu.ops.taumode`) needs, per item tile:

  ``XL, X·A, X²·A, X·A², X²·A², X³·A², X⁴·A²``  (7 matmuls)

plus an elementwise tail. Under plain XLA each power of X round-trips HBM;
this kernel loads an X tile into VMEM once, forms X², X³, X⁴ on the VPU, and
issues all seven ``[T, F] × [F, F]`` contractions on the MXU with the three
F×F operand matrices (L, A, A²) resident in VMEM across the whole grid —
HBM traffic drops from ~7·N·F reads to N·F.

VMEM budget: 3·F²·4 B for the operands + ~6·T·F·4 B scratch. With T=256,
F ≤ 512 fits comfortably in 16 MB; the wrapper falls back to the XLA path
beyond that. F and T are zero-padded to lane/sublane multiples — exact for
this computation (padded features have zero weights and zero values).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256
MAX_PALLAS_F = 512
_ZERO_VEC_EPS = 1e-10
TAU_FLOOR = 1e-10


def _kernel(x_ref, l_ref, a_ref, a2_ref, tau_ref, lam_ref):
    X = x_ref[:]                                   # [T, F]
    L = l_ref[:]
    A = a_ref[:]
    A2 = a2_ref[:]
    tau = tau_ref[:, 0]                            # [T, 1] → [T]

    X2 = X * X
    X3 = X2 * X
    X4 = X2 * X2

    deg = jnp.sum(A, axis=1)                       # [F]
    deg2 = jnp.sum(A2, axis=1)

    XL = jnp.dot(X, L, preferred_element_type=jnp.float32)
    B1 = jnp.dot(X, A, preferred_element_type=jnp.float32)
    B2 = jnp.dot(X2, A, preferred_element_type=jnp.float32)
    C1 = jnp.dot(X, A2, preferred_element_type=jnp.float32)
    C2 = jnp.dot(X2, A2, preferred_element_type=jnp.float32)
    C3 = jnp.dot(X3, A2, preferred_element_type=jnp.float32)
    C4 = jnp.dot(X4, A2, preferred_element_type=jnp.float32)

    num_e = jnp.sum(X * XL, axis=-1)
    den = jnp.sum(X2, axis=-1)
    e_raw = jnp.maximum(
        jnp.where(den > 1e-12, num_e / jnp.maximum(den, 1e-12), 0.0), 0.0
    )

    total = jnp.sum(X2 * deg - 2.0 * X * B1 + B2, axis=-1)
    num4 = jnp.sum(
        X4 * deg2 - 4.0 * X3 * C1 + 6.0 * X2 * C2 - 4.0 * X * C3 + C4,
        axis=-1,
    )
    g = jnp.where(total > 1e-12, num4 / jnp.maximum(total * total, 1e-24), 0.0)
    g = jnp.clip(g, 0.0, 1.0)

    e_bounded = jnp.where(
        e_raw + tau > 0, e_raw / jnp.maximum(e_raw + tau, TAU_FLOOR), 0.0
    )
    lam = tau * e_bounded + (1.0 - tau) * g
    is_zero = jnp.max(jnp.abs(X), axis=-1) <= _ZERO_VEC_EPS
    lam_ref[:, 0] = jnp.where(is_zero, 0.0, lam)


@functools.partial(jax.jit, static_argnames=("interpret",))
def taumode_lambdas_pallas(
    X: jax.Array, L: jax.Array, tau: jax.Array, interpret: bool = False
) -> jax.Array:
    """Raw λ per row of ``X [N, F]`` with per-item ``tau [N]`` precomputed.

    Zero-pads N to a TILE_N multiple and F to a 128-lane multiple (exact —
    see module docstring). Use ``interpret=True`` off-TPU (tests).
    """
    n, f = X.shape
    f_pad = (-f) % 128
    n_pad = (-n) % TILE_N
    if f_pad:
        X = jnp.pad(X, ((0, 0), (0, f_pad)))
        L = jnp.pad(L, ((0, f_pad), (0, f_pad)))
    if n_pad:
        X = jnp.pad(X, ((0, n_pad), (0, 0)))
        tau = jnp.pad(tau, (0, n_pad), constant_values=TAU_FLOOR)
    fp = f + f_pad
    np_ = n + n_pad

    A = jnp.maximum(-L, 0.0)
    A = A - jnp.diag(jnp.diag(A))
    A2 = A * A

    # τ and λ travel as [N, 1] column vectors with (TILE_N, 1) blocks — the
    # trailing dim equals the full array dim, which satisfies the Mosaic
    # tiling rules (1-D blocks hit XLA-vs-Mosaic layout mismatches).
    tau2 = tau.astype(jnp.float32).reshape(np_, 1)

    lam = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.float32),
        grid=(np_ // TILE_N,),
        in_specs=[
            pl.BlockSpec((TILE_N, fp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, fp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, fp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, fp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=7 * 2 * np_ * fp * fp,
            bytes_accessed=(np_ * fp + 3 * fp * fp + 2 * np_) * 4,
            transcendentals=0,
        ),
    )(X.astype(jnp.float32), L.astype(jnp.float32), A, A2, tau2)
    return lam.reshape(-1)[:n]


def pallas_supported(f: int) -> bool:
    """Whether a fused kernel applies (device + VMEM budget; the small-F
    kernel up to MAX_PALLAS_F, the F-tiled kernel up to MAX_PALLAS_F_TILED)."""
    if f > MAX_PALLAS_F_TILED:
        return False
    try:
        platform = jax.devices()[0].platform.lower()
    except RuntimeError:
        return False
    return "tpu" in platform or "axon" in platform


# ---------------------------------------------------------------------------
# Large-F variant: operands tiled over output-feature columns
# ---------------------------------------------------------------------------

MAX_PALLAS_F_TILED = 2048
TILE_F = 256
TILE_N_BIG = 128     # smaller row tile: the full-width X powers are the
                     # dominant VMEM term at F ≈ 2k


def _kernel_bigf(
    x_ref, l_ref, a_ref, a2_ref, deg_ref, deg2_ref, tau_ref,
    lam_ref, acc_ref,
):
    """Grid (n_tiles, f_tiles): per step, contract the FULL-F X tile against
    a [F, TILE_F] slice of each operand and accumulate the per-item scalar
    reductions; emit λ on the last feature tile.

    ``x_ref``   — [T, F] full-width item tile (same block across f-steps;
                   this step's output-feature columns are sliced in-kernel)
    ``acc_ref`` — [T, 4] scratch: Σx∘XL, total, num4, den (persists across
                   the f-sweep; reset at jf == 0)
    """
    jf = pl.program_id(1)
    nf = pl.num_programs(1)

    X = x_ref[:]                                   # [T, F]
    Xc = x_ref[:, pl.ds(jf * TILE_F, TILE_F)]      # [T, Tf] column slice
    tau = tau_ref[:, 0]

    @pl.when(jf == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    Xc2 = Xc * Xc
    Xc3 = Xc2 * Xc
    Xc4 = Xc2 * Xc2

    XL = jnp.dot(X, l_ref[:], preferred_element_type=jnp.float32)    # [T, Tf]
    # (A x^m)_i for i in slice needs Σ_j a_ij x_j^m over ALL j — computed as
    # (X^m) @ A_slice. X powers are formed in VMEM from the full-width tile.
    X2f = X * X
    B1 = jnp.dot(X, a_ref[:], preferred_element_type=jnp.float32)
    B2 = jnp.dot(X2f, a_ref[:], preferred_element_type=jnp.float32)
    C1 = jnp.dot(X, a2_ref[:], preferred_element_type=jnp.float32)
    C2 = jnp.dot(X2f, a2_ref[:], preferred_element_type=jnp.float32)
    C3 = jnp.dot(X2f * X, a2_ref[:], preferred_element_type=jnp.float32)
    C4 = jnp.dot(X2f * X2f, a2_ref[:], preferred_element_type=jnp.float32)

    deg = deg_ref[0, :]                # [Tf]
    deg2 = deg2_ref[0, :]

    d_nume = jnp.sum(Xc * XL, axis=-1)
    d_total = jnp.sum(Xc2 * deg[None, :] - 2.0 * Xc * B1 + B2, axis=-1)
    d_num4 = jnp.sum(
        Xc4 * deg2[None, :] - 4.0 * Xc3 * C1 + 6.0 * Xc2 * C2
        - 4.0 * Xc * C3 + C4,
        axis=-1,
    )
    d_den = jnp.sum(Xc2, axis=-1)

    acc_ref[:, 0] += d_nume
    acc_ref[:, 1] += d_total
    acc_ref[:, 2] += d_num4
    acc_ref[:, 3] += d_den

    @pl.when(jf == nf - 1)
    def _():
        nume = acc_ref[:, 0]
        total = acc_ref[:, 1]
        num4 = acc_ref[:, 2]
        den = acc_ref[:, 3]
        e_raw = jnp.maximum(
            jnp.where(den > 1e-12, nume / jnp.maximum(den, 1e-12), 0.0), 0.0
        )
        g = jnp.where(
            total > 1e-12, num4 / jnp.maximum(total * total, 1e-24), 0.0
        )
        g = jnp.clip(g, 0.0, 1.0)
        e_bounded = jnp.where(
            e_raw + tau > 0, e_raw / jnp.maximum(e_raw + tau, TAU_FLOOR), 0.0
        )
        lam = tau * e_bounded + (1.0 - tau) * g
        # Zero-vector guard: for |x_i| ≤ 1e-10 ∀i, den ≤ F·1e-20 < 1e-16.
        is_zero = den <= 1e-16
        lam_ref[:, 0] = jnp.where(is_zero, 0.0, lam)


@functools.partial(jax.jit, static_argnames=("interpret",))
def taumode_lambdas_pallas_bigf(
    X: jax.Array, L: jax.Array, tau: jax.Array, interpret: bool = False
) -> jax.Array:
    """F-tiled fused λ for F up to MAX_PALLAS_F_TILED (zero-padded)."""
    n, f = X.shape
    f_pad = (-f) % TILE_F
    n_pad = (-n) % TILE_N_BIG
    if f_pad:
        X = jnp.pad(X, ((0, 0), (0, f_pad)))
        L = jnp.pad(L, ((0, f_pad), (0, f_pad)))
    if n_pad:
        X = jnp.pad(X, ((0, n_pad), (0, 0)))
        tau = jnp.pad(tau, (0, n_pad), constant_values=TAU_FLOOR)
    fp = f + f_pad
    np_ = n + n_pad

    A = jnp.maximum(-L, 0.0)
    A = A - jnp.diag(jnp.diag(A))
    A2 = A * A
    deg = jnp.sum(A, axis=1).reshape(1, fp)
    deg2 = jnp.sum(A2, axis=1).reshape(1, fp)
    tau2 = tau.astype(jnp.float32).reshape(np_, 1)

    T, Tf = TILE_N_BIG, TILE_F
    lam = pl.pallas_call(
        _kernel_bigf,
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.float32),
        grid=(np_ // T, fp // Tf),
        in_specs=[
            pl.BlockSpec((T, fp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, Tf), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, Tf), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, Tf), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tf), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tf), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T, 4), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=7 * 2 * np_ * fp * fp,
            bytes_accessed=(np_ * fp + 3 * fp * fp + 2 * np_) * 4,
            transcendentals=0,
        ),
    )(
        X.astype(jnp.float32), L.astype(jnp.float32),
        A, A2, deg, deg2, tau2,
    )
    return lam.reshape(-1)[:n]
