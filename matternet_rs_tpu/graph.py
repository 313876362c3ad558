"""Graph containers: parameters and the Laplacian wrapper.

TPU-native counterpart of the reference's ``GraphParams`` / ``GraphLaplacian``
(``/root/reference/src_legacy/graph.rs:94-136``). The Laplacian is stored as a
dense ``[n, n]`` jax array — graphs here are feature- or centroid-scale
(n = F or C, typically ≤ a few thousand), where a dense symmetric matrix is
both exact and the fastest representation for the MXU matmuls that consume it
(taumode λ scoring, diffusion, Rayleigh quotients). Degree-capped sparsity is
preserved *structurally* (most entries are exactly 0), so sparsity statistics
and validation still match the reference semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from matternet_rs_tpu.ops._mm import mm
import numpy as np


@dataclasses.dataclass(frozen=True)
class GraphParams:
    """Graph construction parameters (reference: src_legacy/graph.rs:94-102)."""

    eps: float = 0.5            # max rectified cosine distance for an edge
    k: int = 10                 # max neighbours per node
    topk: int = 10              # neighbours considered per kNN query
    p: float = 2.0              # kernel exponent
    sigma: Optional[float] = None   # kernel bandwidth (None → 1.0)
    normalise: bool = False     # z-score columns before graph build
    sparsity_check: bool = True  # panic if resulting Laplacian sparsity > 0.95

    def sigma_value(self) -> float:
        return 1.0 if self.sigma is None else float(self.sigma)


@dataclasses.dataclass
class GraphLaplacian:
    """Graph Laplacian ``L = D - W`` (or ``L_sym``) over n nodes.

    Attributes
    ----------
    matrix : ``[n, n]`` Laplacian (dense jax array; structurally sparse),
        or ``None`` for an ELL-backed graph (``_ell_cache`` holds the
        exact fixed-degree form — the direct large-F construction path
        never materializes ``[n, n]``; see ops/laplacian.py
        ``build_laplacian_ell``).
    init_data : the node-profile matrix the graph was built from
        (reference keeps this as ``init_data``, src_legacy/graph.rs:127-130).
    nnodes : number of items of the *original raw data* (bookkeeping; the
        matrix itself is over graph nodes, which may be features/centroids).
    graph_params : construction parameters.
    energy : False for eigenmaps, True for energymaps.
    """

    matrix: Optional[jax.Array]
    init_data: jax.Array
    nnodes: int
    graph_params: GraphParams
    energy: bool = False
    _ell_cache: object = dataclasses.field(
        default=None, repr=False, compare=False
    )

    @classmethod
    def from_ell(cls, ell, init_data, nnodes: int, graph_params: GraphParams,
                 energy: bool = False) -> "GraphLaplacian":
        """ELL-backed Laplacian: O(n·k) memory, no dense matrix ever."""
        return cls(
            matrix=None, init_data=init_data, nnodes=nnodes,
            graph_params=graph_params, energy=energy, _ell_cache=ell,
        )

    @property
    def is_ell_backed(self) -> bool:
        return self.matrix is None

    def ell(self):
        """Cached exact ELL form of the Laplacian (large-F λ/SpMV path).

        Extraction costs one top-k pass over [n, n] + one scalar D2H; the
        cache amortizes it across every λ batch and query against this
        graph. ELL-backed graphs return their native form directly.
        """
        if self._ell_cache is None:
            from matternet_rs_tpu.ops.csr import ell_from_dense_laplacian

            self._ell_cache = ell_from_dense_laplacian(self.matrix)
        return self._ell_cache

    def dense(self) -> jax.Array:
        """The dense ``[n, n]`` matrix — densifies an ELL-backed graph on
        demand (O(n²) memory: tests / small n only)."""
        if self.matrix is not None:
            return self.matrix
        return jnp.asarray(self.ell().to_dense())

    # -- basic ops (reference: src_legacy/graph.rs:329-700) ---------------

    @property
    def shape(self) -> tuple[int, int]:
        if self.matrix is None:
            return self.ell().shape
        return tuple(self.matrix.shape)

    def nnz(self, tol: float = 0.0) -> int:
        if self.matrix is None:
            e = self.ell()
            return int(jnp.sum(e.weights > tol)) + int(
                jnp.sum(jnp.abs(e.diag) > tol)
            )
        return int(jnp.sum(jnp.abs(self.matrix) > tol))

    @staticmethod
    def sparsity_of(matrix: jax.Array, tol: float = 0.0) -> float:
        n = matrix.shape[0] * matrix.shape[1]
        nnz = int(jnp.sum(jnp.abs(matrix) > tol))
        return 1.0 - nnz / max(n, 1)

    def sparsity(self, tol: float = 0.0) -> float:
        if self.matrix is None:
            n = self.shape[0]
            return 1.0 - self.nnz(tol) / max(n * n, 1)
        return self.sparsity_of(self.matrix, tol)

    def multiply_vector(self, x: jax.Array) -> jax.Array:
        """``L @ x`` (reference: graph.rs:464-501); ELL-backed graphs use
        the fixed-degree SpMV (no densification)."""
        if self.matrix is None:
            from matternet_rs_tpu.ops.csr import spmv_ell

            # Honor the stored diagonal rather than re-deriving row degrees
            # (L_sym has diag=1, not the degree).
            e = self.ell()
            wx = spmv_ell(e.indices, e.weights, x)
            if x.ndim == 2:
                return e.diag[:, None] * x - wx
            return e.diag * x - wx
        return mm(self.matrix, x)

    def rayleigh_quotient(self, x: jax.Array) -> jax.Array:
        """``xᵀLx / xᵀx`` (reference: graph.rs:422-461)."""
        num = jnp.dot(x, self.multiply_vector(x))
        den = jnp.dot(x, x)
        return jnp.where(den > 1e-12, num / jnp.maximum(den, 1e-12), 0.0)

    def adjacency(self) -> jax.Array:
        """Recover ``W`` from off-diagonals: ``W_ij = max(-L_ij, 0)``
        (graph.rs:510-525). Densifies an ELL-backed graph (O(n²))."""
        off = -self.dense()
        w = jnp.maximum(off, 0.0)
        return w - jnp.diag(jnp.diag(w))

    def degrees(self) -> jax.Array:
        if self.matrix is None:
            return self.ell().diag
        return jnp.diag(self.matrix)

    def neighbors_of(self, i: int, tol: float = 1e-12) -> np.ndarray:
        if self.matrix is None:
            e = self.ell()
            idx = np.asarray(e.indices[i])
            w = np.asarray(e.weights[i])
            return np.unique(idx[w > tol])
        w = np.asarray(self.adjacency()[i])
        return np.nonzero(w > tol)[0]

    def verify_properties(self, atol: float = 1e-4) -> dict:
        """Validation: symmetry, ~zero row sums (unnormalized), PSD diagonal.

        Reference: graph.rs:554-618. Returns a dict of booleans instead of
        panicking; callers assert on what they need.
        """
        m = np.asarray(self.dense())
        sym = bool(np.allclose(m, m.T, atol=atol))
        row_sums_zero = bool(np.allclose(m.sum(axis=1), 0.0, atol=atol))
        diag_nonneg = bool((np.diag(m) >= -atol).all())
        return {
            "symmetric": sym,
            "row_sums_zero": row_sums_zero,
            "diag_nonneg": diag_nonneg,
        }

    def statistics(self) -> dict:
        """Degree / nnz / sparsity stats (reference: graph.rs:656-686)."""
        deg = np.asarray(self.degrees())
        return {
            "nnodes": self.shape[0],
            "nnz": self.nnz(),
            "sparsity": self.sparsity(),
            "min_degree": float(deg.min()) if deg.size else 0.0,
            "max_degree": float(deg.max()) if deg.size else 0.0,
            "mean_degree": float(deg.mean()) if deg.size else 0.0,
        }


class GraphFactory:
    """Namespace parity with the reference's ``GraphFactory``
    (src_legacy/graph.rs:187-313). Thin aliases over ops.laplacian."""

    @staticmethod
    def build_laplacian_matrix_from_k_cluster(
        clustered, eps, k, topk, p, sigma_override=None, normalise=False,
        sparsity_check=False, n_items=None,
    ) -> "GraphLaplacian":
        from matternet_rs_tpu.ops import laplacian as lap_ops

        params = GraphParams(
            eps=eps, k=k, topk=topk, p=p, sigma=sigma_override,
            normalise=normalise, sparsity_check=sparsity_check,
        )
        import jax.numpy as _jnp

        clustered = _jnp.asarray(clustered)
        return lap_ops.build_laplacian_from_k_cluster(
            clustered, params,
            n_items=n_items if n_items is not None else clustered.shape[0],
        )

    @staticmethod
    def build_spectral_laplacian(aspace, graph_laplacian) -> None:
        from matternet_rs_tpu.ops import laplacian as lap_ops

        aspace.signals = lap_ops.build_spectral_laplacian(
            graph_laplacian, aspace.nitems
        )
