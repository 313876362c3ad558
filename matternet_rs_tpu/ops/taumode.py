"""Taumode synthetic-λ engine: fused batched Rayleigh + dispersion scoring.

Semantics follow the reference λ engine (``/root/reference/src_legacy/
taumode.rs:117-408``): for each item vector ``x`` (F-dim) against the F×F
feature-space graph ``L``:

* ``τ``  — selected from the item's own values by Fixed/Median/Mean/Percentile
  with floor 1e-10 (``select_tau``, taumode.rs:29-70),
* ``E_raw = max(xᵀLx / xᵀx, 0)`` (taumode.rs:326-361),
* ``E_bounded = E_raw / (E_raw + τ)``,
* ``G`` — edge-dispersion: with off-diagonal weights ``w_ij = max(-L_ij, 0)``
  and edge energies ``e_ij = w_ij (x_i - x_j)²`` over ordered pairs,
  ``G = Σ (e_ij / Σ e)²`` clamped to [0, 1] (taumode.rs:366-408),
* ``λ = τ·E_bounded + (1-τ)·G``; zero vectors score λ = 0.

TPU-native design: the reference computes G with an O(F²) scalar scan *per
item* (two passes). Expanding the quartic,

  ``Σ_ij w_ij (x_i-x_j)²  = Σ_i [x_i² d_i  - 2 x_i (Wx)_i  + (Wx²)_i]``
  ``Σ_ij w²_ij(x_i-x_j)⁴ = Σ_i [x_i⁴ d2_i - 4 x_i³ (W²x)_i + 6 x_i² (W²x²)_i
                                 - 4 x_i (W²x³)_i + (W²x⁴)_i]``

with ``d = W·1``, ``d2 = (W∘W)·1`` — so the *entire* λ computation for all N
items is seven ``[N, F] × [F, F]`` matmuls that run on the MXU, numerically
identical to the reference's scan (both directions of every edge counted).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from matternet_rs_tpu.ops._mm import mm

TAU_FLOOR = 1e-10
_ZERO_VEC_EPS = 1e-10

# τ-mode encodings (static ints so the scorer stays a single jit).
TAU_FIXED = 0
TAU_MEDIAN = 1
TAU_MEAN = 2
TAU_PERCENTILE = 3


def select_tau(values: jax.Array, mode: int, param: float = 0.0) -> jax.Array:
    """τ from a batch of value vectors ``[..., F]`` → ``[...]``.

    Matches ``TauMode::select_tau`` (taumode.rs:29-70): Median averages the
    two middle elements for even F; Percentile takes the element at index
    ``round((F-1)·clamp(p,0,1))`` of the sorted values. Values are assumed
    finite. Result floored at TAU_FLOOR.
    """
    if mode == TAU_FIXED:
        t = param if (param > 0.0 and math.isfinite(param)) else TAU_FLOOR
        return jnp.full(values.shape[:-1], t, dtype=values.dtype)
    if mode == TAU_MEAN:
        return jnp.maximum(jnp.mean(values, axis=-1), TAU_FLOOR)
    if mode == TAU_MEDIAN:
        return jnp.maximum(jnp.median(values, axis=-1), TAU_FLOOR)
    if mode == TAU_PERCENTILE:
        f = values.shape[-1]
        pp = min(max(param, 0.0), 1.0)
        idx = int(math.floor((f - 1) * pp + 0.5))  # Rust f64::round: half away
        s = jnp.sort(values, axis=-1)
        return jnp.maximum(s[..., idx], TAU_FLOOR)
    raise ValueError(f"unknown tau mode {mode}")


@functools.partial(jax.jit, static_argnames=("tau_mode", "tau_param"))
def taumode_lambdas(
    X: jax.Array,
    L: jax.Array,
    tau_mode: int = TAU_MEDIAN,
    tau_param: float | jax.Array = 0.0,
) -> jax.Array:
    """Raw synthetic λ for every row of ``X [N, F]`` against ``L [F, F]``.

    Fused batched equivalent of ``compute_taumode_lambdas_parallel``
    (taumode.rs:117-250) — N rayon tasks × O(F²) scans become seven MXU
    matmuls. Returns raw (un-normalized) λ ``[N]``.
    """
    X = X.astype(jnp.float32)
    L = L.astype(jnp.float32)

    tau = select_tau(X, tau_mode, float(tau_param))

    # --- Rayleigh quotient with the true L (diagonal included) -----------
    XL = mm(X, L)          # [N, F]
    num_e = jnp.sum(X * XL, axis=-1)
    den = jnp.sum(X * X, axis=-1)
    e_raw = jnp.where(den > 1e-12, num_e / jnp.maximum(den, 1e-12), 0.0)
    e_raw = jnp.maximum(e_raw, 0.0)

    # --- Dispersion G in closed form --------------------------------------
    A = jnp.maximum(-L, 0.0)
    A = A - jnp.diag(jnp.diag(A))            # off-diagonal weights only
    A2 = A * A
    deg = jnp.sum(A, axis=1)                 # [F]
    deg2 = jnp.sum(A2, axis=1)               # [F]

    X2 = X * X
    X3 = X2 * X
    X4 = X2 * X2

    B1 = mm(X, A)          # (Wx)
    B2 = mm(X2, A)         # (Wx²)
    C1 = mm(X, A2)
    C2 = mm(X2, A2)
    C3 = mm(X3, A2)
    C4 = mm(X4, A2)

    total = jnp.sum(X2 * deg - 2.0 * X * B1 + B2, axis=-1)          # Σ e_ij
    num4 = jnp.sum(
        X4 * deg2 - 4.0 * X3 * C1 + 6.0 * X2 * C2 - 4.0 * X * C3 + C4,
        axis=-1,
    )
    g = jnp.where(total > 1e-12, num4 / jnp.maximum(total * total, 1e-24), 0.0)
    g = jnp.clip(g, 0.0, 1.0)

    # --- Synthetic index ---------------------------------------------------
    e_bounded = jnp.where(e_raw + tau > 0, e_raw / jnp.maximum(e_raw + tau, TAU_FLOOR), 0.0)
    lam = tau * e_bounded + (1.0 - tau) * g

    # Zero/constant-vector guard (taumode.rs:267-273): λ = 0.
    is_zero = jnp.max(jnp.abs(X), axis=-1) <= _ZERO_VEC_EPS
    return jnp.where(is_zero, 0.0, lam)


def synthetic_lambda(
    x: jax.Array, L, tau_mode: int = TAU_MEDIAN, tau_param: float = 0.0
) -> jax.Array:
    """Single-vector λ (query path). Scalar result. ``L`` may be a dense
    matrix or an :class:`~matternet_rs_tpu.ops.csr.EllLaplacian`."""
    from matternet_rs_tpu.ops.csr import EllLaplacian

    if isinstance(L, EllLaplacian):
        return taumode_lambdas_ell(x[None, :], L, tau_mode, tau_param, item_chunk=8)[0]
    return taumode_lambdas(x[None, :], L, tau_mode, tau_param)[0]


CHUNK_N = 131_072


@functools.partial(jax.jit, static_argnames=("tau_mode", "tau_param"))
def _pallas_chunk_with_tau(chunk, L, tau_mode, tau_param):
    """τ selection + the fused Pallas λ kernel in one compiled program."""
    from matternet_rs_tpu.ops.pallas import taumode_fused as tf

    tau = select_tau(chunk, tau_mode, tau_param)
    fn = (
        tf.taumode_lambdas_pallas
        if chunk.shape[1] <= tf.MAX_PALLAS_F
        else tf.taumode_lambdas_pallas_bigf
    )
    return fn(chunk, L, tau)


# Beyond this feature dimension λ leaves the dense F×F path: the Laplacian
# is converted once to exact ELL (top-k capped ⇒ lossless) and every matmul
# becomes a fixed-degree SpMV — O(N·F·k) traffic instead of O(N·F²) FLOPs
# (the reference's Stage-C design target, surfface-core/src/laplacian.rs:19-21).
SPARSE_F_THRESHOLD = 2048
_ELL_ITEM_CHUNK = 512


@functools.partial(jax.jit, static_argnames=("tau_mode", "tau_param"))
def _taumode_chunk_ell(
    Xc: jax.Array,           # [B, F]
    indices: jax.Array,      # [F, k]
    weights: jax.Array,      # [F, k] (= A, the non-negative off-diag weights)
    diag: jax.Array,         # [F] diagonal of L
    tau_mode: int,
    tau_param: float,
) -> jax.Array:
    """Sparse λ for one item chunk, EDGE-WISE.

    Instead of expanding the quartic into six SpMVs (which gathers a 4×-wide
    ``[Xᵀ|X²ᵀ|X³ᵀ|X⁴ᵀ]`` RHS and carries [F, B]-sized accumulators), scan
    the k neighbour slots and evaluate each directed edge directly:

        total_b += Σ_f w_fs (x_bj − x_bf)²          (Dirichlet energy)
        num4_b  += Σ_f w²_fs (x_bj − x_bf)⁴          (dispersion numerator)
        r_b     += Σ_f w_fs  x_bf · x_bj             (Rayleigh cross term)

    with ``j = idx[f, s]``. Per slot: ONE ``[F, B]`` row gather of Xᵀ +
    fused elementwise + reduction to three per-item scalars — no large
    accumulators, 4× less gather traffic than the expansion, and the edge
    arithmetic matches the reference's two-pass scan form exactly
    (taumode.rs:366-408). The Rayleigh term closes with
    ``xᵀLx = Σ diag·x² − r`` (symmetric L, off-diag = −w).
    """
    Xc = Xc.astype(jnp.float32)
    tau = select_tau(Xc, tau_mode, float(tau_param))

    Xt = Xc.T                                  # [F, B] resident
    X2 = Xc * Xc

    def body(carry, slot):
        total, num4, r = carry                 # [B] each
        idxs, ws = slot                        # [F] each
        g = Xt[idxs]                           # [F, B] row gather
        d = g - Xt
        d2 = d * d
        total = total + jnp.sum(ws[:, None] * d2, axis=0)
        num4 = num4 + jnp.sum((ws * ws)[:, None] * (d2 * d2), axis=0)
        r = r + jnp.sum(ws[:, None] * (Xt * g), axis=0)
        return (total, num4, r), None

    b = Xc.shape[0]
    zeros = jnp.zeros((b,), jnp.float32)
    (total, num4, r), _ = jax.lax.scan(
        body, (zeros, zeros, zeros), (indices.T, weights.T)
    )

    # Rayleigh with the true L: xᵀLx = Σ_f diag_f x²_f − Σ_edges w·x_f·x_j.
    num_e = jnp.sum(X2 * diag[None, :], axis=-1) - r
    den = jnp.sum(X2, axis=-1)
    e_raw = jnp.maximum(
        jnp.where(den > 1e-12, num_e / jnp.maximum(den, 1e-12), 0.0), 0.0
    )

    g_disp = jnp.where(
        total > 1e-12, num4 / jnp.maximum(total * total, 1e-24), 0.0
    )
    g_disp = jnp.clip(g_disp, 0.0, 1.0)

    e_bounded = jnp.where(
        e_raw + tau > 0, e_raw / jnp.maximum(e_raw + tau, TAU_FLOOR), 0.0
    )
    lam = tau * e_bounded + (1.0 - tau) * g_disp
    is_zero = jnp.max(jnp.abs(Xc), axis=-1) <= _ZERO_VEC_EPS
    return jnp.where(is_zero, 0.0, lam)


def taumode_lambdas_ell(
    X: jax.Array,
    ell,
    tau_mode: int = TAU_MEDIAN,
    tau_param: float | jax.Array = 0.0,
    item_chunk: int = _ELL_ITEM_CHUNK,
) -> jax.Array:
    """λ batch against an :class:`~matternet_rs_tpu.ops.csr.EllLaplacian`.

    Fixed-size item chunks (one compiled program serves every N) over the
    sparse closed form. Numerically equal to :func:`taumode_lambdas` on the
    densified graph.
    """
    X = jnp.asarray(X, jnp.float32)
    n = X.shape[0]
    if n <= item_chunk:
        pad = item_chunk - n
        Xp = jnp.pad(X, ((0, pad), (0, 0))) if pad else X
        out = _taumode_chunk_ell(
            Xp, ell.indices, ell.weights, ell.diag, tau_mode, float(tau_param)
        )
        return out[:n]
    pad = (-n) % item_chunk
    Xp = jnp.pad(X, ((0, pad), (0, 0))) if pad else X
    outs = []
    for start in range(0, n + pad, item_chunk):
        chunk = jax.lax.dynamic_slice_in_dim(Xp, start, item_chunk, axis=0)
        outs.append(
            _taumode_chunk_ell(
                chunk, ell.indices, ell.weights, ell.diag, tau_mode, float(tau_param)
            )
        )
    return jnp.concatenate(outs)[:n]


def taumode_lambdas_auto(
    X: jax.Array,
    L: jax.Array,
    tau_mode: int = TAU_MEDIAN,
    tau_param: float | jax.Array = 0.0,
) -> jax.Array:
    """λ batch with automatic kernel selection: the fused Pallas kernel on
    TPU (single HBM pass over X — see ops/pallas/taumode_fused.py), the
    exact ELL sparse path beyond ``SPARSE_F_THRESHOLD`` (no dense F×F
    operand, no O(N·F²) work), and the XLA closed form elsewhere.
    Numerically equivalent paths.

    Large N is processed in fixed CHUNK_N tiles so ONE compiled program
    serves every dataset size (compiles are expensive on remote-attached
    TPUs; results are identical because λ is row-independent).
    """
    from matternet_rs_tpu.ops.pallas import taumode_fused as tf

    X = jnp.asarray(X, jnp.float32)
    n, f = X.shape

    from matternet_rs_tpu.ops.csr import EllLaplacian, ell_from_dense_laplacian

    if isinstance(L, EllLaplacian) or f > SPARSE_F_THRESHOLD:
        ell = L if isinstance(L, EllLaplacian) else ell_from_dense_laplacian(L)
        return taumode_lambdas_ell(X, ell, tau_mode, tau_param)

    use_pallas = n >= 32768 and tf.pallas_supported(f)

    if n > CHUNK_N:
        pad = (-n) % CHUNK_N
        Xp = jnp.pad(X, ((0, pad), (0, 0))) if pad else X
        Ld = jnp.asarray(L, jnp.float32) if use_pallas else L
        outs = []
        for start in range(0, n + pad, CHUNK_N):
            chunk = jax.lax.dynamic_slice_in_dim(Xp, start, CHUNK_N, axis=0)
            if use_pallas:
                # τ + kernel fused in ONE jit per chunk: the eager median
                # (a full sort) plus per-op dispatch used to dominate the λ
                # stage at 1M on remote-attached TPUs.
                outs.append(
                    _pallas_chunk_with_tau(chunk, Ld, tau_mode, float(tau_param))
                )
            else:
                outs.append(taumode_lambdas(chunk, L, tau_mode, tau_param))
        return jnp.concatenate(outs)[:n]

    if use_pallas:
        return _pallas_chunk_with_tau(
            X, jnp.asarray(L, jnp.float32), tau_mode, float(tau_param)
        )
    return taumode_lambdas(X, L, tau_mode, tau_param)


@jax.jit
def rayleigh_quotient(L: jax.Array, x: jax.Array) -> jax.Array:
    """``max(xᵀLx/xᵀx, 0)`` (taumode.rs:326-361)."""
    num = jnp.dot(x, mm(L, x))
    den = jnp.dot(x, x)
    return jnp.maximum(jnp.where(den > 1e-12, num / jnp.maximum(den, 1e-12), 0.0), 0.0)


@jax.jit
def item_dispersion(x: jax.Array, L: jax.Array) -> jax.Array:
    """Direct (non-closed-form) G for one vector — used in parity tests."""
    A = jnp.maximum(-L, 0.0)
    A = A - jnp.diag(jnp.diag(A))
    diff = x[:, None] - x[None, :]
    e = A * diff * diff
    total = jnp.sum(e)
    share = jnp.where(total > 1e-12, e / jnp.maximum(total, 1e-12), 0.0)
    return jnp.clip(jnp.sum(share * share), 0.0, 1.0)
