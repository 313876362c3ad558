"""Blocked LOBPCG eigensolver + spectral embeddings.

New capability beyond the reference (BASELINE.json north star: "batched
Lanczos/LOBPCG eigensolver" — the reference never eigendecomposes, it only
uses Rayleigh quotients; SURVEY §7.3). Provides the smallest eigenpairs of a
graph Laplacian for true spectral embeddings (eigenmaps quality metrics) at
MXU-friendly block sizes.

Design: standard LOBPCG with Rayleigh–Ritz over the ``[X, R, P]`` subspace,
fixed iteration count under ``jit`` (compiler-friendly control flow), QR
orthonormalization (``jnp.linalg.qr`` maps to batched Householder on TPU).
The operator is either a dense ``[n, n]`` matmul or an ELL SpMV
(:func:`matternet_rs_tpu.ops.csr.laplacian_spmv_ell`) for large sparse L.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from matternet_rs_tpu.ops._mm import mm


def _lobpcg_core(matvec, X0: jax.Array, k: int, iters: int):
    """Blocked LOBPCG with per-block orthogonalization and the standard
    Ritz-restricted conjugate direction (P built from the R/P rows of the
    Ritz coefficients, not an X-projection) — converges on clustered
    spectra where the naive variant stalls."""

    def orthonormalize(V):
        Q, _ = jnp.linalg.qr(V)
        return Q

    X = orthonormalize(X0)
    AX = matvec(X)
    theta = jnp.sum(X * AX, axis=0)
    P = jnp.zeros_like(X)

    def body(carry, _):
        X, AX, theta, P = carry
        R = AX - X * theta[None, :]
        # Orthogonalize the blocks against X (and each other via QR) so the
        # Rayleigh-Ritz basis S keeps block identity: S = [X | R' | P'].
        R = R - mm(X, mm(X.T, R))
        R = orthonormalize(R)
        P_ = P - mm(X, mm(X.T, P)) - mm(R, mm(R.T, P))
        # Normalize P columns; a zero P (first iteration) stays harmless.
        p_norm = jnp.sqrt(jnp.sum(P_ * P_, axis=0))
        P_ = jnp.where(p_norm[None, :] > 1e-8, P_ / jnp.maximum(p_norm, 1e-8), 0.0)

        S = jnp.concatenate([X, R, P_], axis=1)           # [n, 3k]
        AS = matvec(S)
        G = mm(S.T, AS)
        G = 0.5 * (G + G.T)
        M = mm(S.T, S)
        M = 0.5 * (M + M.T)
        # Generalized Rayleigh-Ritz via a regularized Cholesky-free
        # transform: M ≈ I except for the (possibly degenerate) P block —
        # solve with eigh of M^{-1/2} G M^{-1/2} through jnp.linalg.
        w, V = jnp.linalg.eigh(M)
        valid = w > 1e-6
        inv_sqrt = jnp.where(valid, 1.0 / jnp.sqrt(jnp.maximum(w, 1e-6)), 0.0)
        T = V * inv_sqrt[None, :]
        Gt = mm(T.T, mm(G, T))
        Gt = 0.5 * (Gt + Gt.T)
        # Rank-deficient directions of S were zeroed by the soft inverse —
        # they would otherwise appear as spurious 0-eigenvalues and win the
        # smallest-k selection. Push them past the top of the spectrum.
        big = 10.0 * (jnp.sum(jnp.abs(jnp.diag(G))) + 1.0)
        Gt = Gt + jnp.diag(jnp.where(valid, 0.0, big))
        evals, evecs = jnp.linalg.eigh(Gt)
        C = mm(T, evecs[:, :k])                            # back-transform
        X_new = mm(S, C)
        AX_new = mm(AS, C)
        theta_new = evals[:k]
        # Conjugate direction: the R/P contribution to the new X.
        C_rp = C.at[:k, :].set(0.0)
        P_new = mm(S, C_rp)
        # Renormalize X columns (guards drift from the soft inverse).
        xn = jnp.sqrt(jnp.sum(X_new * X_new, axis=0))
        X_new = X_new / jnp.maximum(xn, 1e-12)[None, :]
        AX_new = AX_new / jnp.maximum(xn, 1e-12)[None, :]
        return (X_new, AX_new, theta_new, P_new), None

    (X, AX, theta, P), _ = jax.lax.scan(body, (X, AX, theta, P), None, length=iters)
    return theta, X


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _lobpcg_dense(A: jax.Array, X0: jax.Array, k: int, iters: int):
    return _lobpcg_core(lambda V: mm(A, V), X0, k, iters)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _lobpcg_ell(indices, weights, diag, X0: jax.Array, k: int, iters: int):
    """LOBPCG with the Laplacian applied as a fixed-degree ELL SpMV — the
    large-F operator (no dense [n, n] operand): ``L@V = diag∘V − W@V``."""
    from matternet_rs_tpu.ops.csr import spmv_ell_scan

    def matvec(V):
        return diag[:, None] * V - spmv_ell_scan(indices, weights, V)

    return _lobpcg_core(matvec, X0, k, iters)


def lobpcg_smallest(
    A,
    k: int,
    iters: int = 60,
    seed: int = 0,
    X0: jax.Array | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Smallest-k eigenpairs of symmetric ``A``.

    ``A`` is a dense ``[n, n]`` array or an
    :class:`~matternet_rs_tpu.ops.csr.EllLaplacian` (sparse operator — the
    F ≳ 4k regime where densifying costs F²·4 B).
    Returns ``(eigenvalues [k] ascending, eigenvectors [n, k])``.
    """
    from matternet_rs_tpu.ops.csr import EllLaplacian

    n = A.shape[0]
    k = min(k, n)
    if X0 is None:
        X0 = jax.random.normal(jax.random.PRNGKey(seed), (n, k), jnp.float32)
    if isinstance(A, EllLaplacian):
        theta, X = _lobpcg_ell(A.indices, A.weights, A.diag, X0, k, iters)
    else:
        theta, X = _lobpcg_dense(jnp.asarray(A, jnp.float32), X0, k, iters)
    # Final exact ordering (Ritz values are already sorted by eigh).
    return np.asarray(theta), np.asarray(X)


def spectral_embedding(
    L, k: int, skip_trivial: bool = True, iters: int = 80, seed: int = 0
) -> np.ndarray:
    """Eigenmap embedding: the k smallest non-trivial eigenvectors of L.

    For a connected unnormalized Laplacian the smallest eigenvector is the
    constant nullspace vector; ``skip_trivial`` drops it.
    """
    extra = 1 if skip_trivial else 0
    vals, vecs = lobpcg_smallest(L, k + extra, iters=iters, seed=seed)
    return vecs[:, extra : k + extra]


def eigsh_dense(L, k: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Exact dense reference (np.linalg.eigh) for validation and small F."""
    L = np.asarray(L, np.float64)
    vals, vecs = np.linalg.eigh(L)
    if k is not None:
        vals, vecs = vals[:k], vecs[:, :k]
    return vals, vecs
