"""CSR sparse-graph container + SpMV, for large-F graphs.

Parity with the reference's ``SparseGraph`` (``/root/reference/
surfface-core/src/sparse_mst.rs:15-72`` — COO-edge builder + ``L = D - W``),
plus what the dense path can't do: once F grows past a few thousand, the F×F
Laplacian should stay sparse. ``spmv_ell`` keeps the fixed-degree structure
(every graph here is top-k-capped) as padded ``[n, k]`` index/weight arrays —
the TPU-friendly layout: gathers + one reduction, no dynamic shapes.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class SparseGraph:
    """Fixed-degree (ELL) symmetric graph: ``indices/weights [n, k]``,
    padding marked by weight 0 (index value irrelevant)."""

    indices: jax.Array      # [n, k] int32 neighbor ids
    weights: jax.Array      # [n, k] f32, 0 = padding
    n_nodes: int

    @classmethod
    def from_edges(cls, edges: list[tuple[int, int, float]], n_nodes: int,
                   max_degree: int | None = None) -> "SparseGraph":
        """Build from COO (u, v, w) undirected edges (sparse_mst.rs:15-42).
        Duplicate edges keep the max weight."""
        adj: list[dict[int, float]] = [dict() for _ in range(n_nodes)]
        for u, v, w in edges:
            if u == v:
                continue
            adj[u][v] = max(adj[u].get(v, 0.0), w)
            adj[v][u] = max(adj[v].get(u, 0.0), w)
        k = max_degree or max((len(a) for a in adj), default=1)
        k = max(k, 1)
        idx = np.zeros((n_nodes, k), np.int32)
        wts = np.zeros((n_nodes, k), np.float32)
        for i, a in enumerate(adj):
            # Capacity overflow keeps the STRONGEST edges (truncating by
            # neighbor id would drop heavy edges asymmetrically and break
            # the symmetric operator the eigensolver assumes).
            items = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            for slot, (j, w) in enumerate(items):
                idx[i, slot] = j
                wts[i, slot] = w
        return cls(jnp.asarray(idx), jnp.asarray(wts), n_nodes)

    @classmethod
    def from_dense(cls, W, max_degree: int | None = None) -> "SparseGraph":
        W = np.asarray(W)
        n = W.shape[0]
        degs = (np.abs(W) > 1e-12).sum(1)
        k = int(max_degree or max(degs.max(), 1))
        idx = np.zeros((n, k), np.int32)
        wts = np.zeros((n, k), np.float32)
        for i in range(n):
            nbrs = np.nonzero(np.abs(W[i]) > 1e-12)[0]
            if len(nbrs) > k:   # keep the strongest, not the lowest ids
                nbrs = nbrs[np.argsort(-np.abs(W[i, nbrs]), kind="stable")[:k]]
            idx[i, : len(nbrs)] = nbrs
            wts[i, : len(nbrs)] = W[i, nbrs]
        return cls(jnp.asarray(idx), jnp.asarray(wts), n)

    def degrees(self) -> jax.Array:
        return jnp.sum(self.weights, axis=1)

    def to_dense_adjacency(self) -> jax.Array:
        n, k = self.indices.shape
        rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, k))
        return jnp.zeros((n, n), jnp.float32).at[rows, self.indices].max(self.weights)

    def to_laplacian_dense(self) -> jax.Array:
        """``L = D - W`` densified (sparse_mst.rs:45-72)."""
        W = self.to_dense_adjacency()
        return jnp.diag(jnp.sum(W, axis=1)) - W


@dataclasses.dataclass
class EllLaplacian:
    """Exact ELL form of a graph Laplacian: ``L = diag(diag) - W`` with the
    symmetric non-negative adjacency W as fixed-degree ``indices/weights
    [n, k]`` (zero-weight padding).

    Every Laplacian this framework builds is top-k capped (SURVEY §7.1), so
    the extraction is exact: off-diagonals of L are ``-w_ij ≤ 0`` and the
    diagonal is kept separately (deg for ``L = D-W``, 1 for ``L_sym``).
    This is the large-F production path the reference's Stage-C design note
    asks for (surfface-core/src/laplacian.rs:19-21: keep O(F·k) edges, never
    densify O(F²) work).
    """

    indices: jax.Array      # [n, k] int32
    weights: jax.Array      # [n, k] f32 ≥ 0, 0 = padding
    diag: jax.Array         # [n] f32 diagonal of L

    @property
    def n_nodes(self) -> int:
        return int(self.indices.shape[0])

    @property
    def max_degree(self) -> int:
        return int(self.indices.shape[1])

    @property
    def shape(self) -> tuple[int, int]:
        """Duck-types the dense ``[n, n]`` matrix for dimension checks."""
        n = self.n_nodes
        return (n, n)

    def to_dense(self) -> jax.Array:
        n, k = self.indices.shape
        rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, k))
        W = jnp.zeros((n, n), jnp.float32).at[rows, self.indices].max(self.weights)
        return jnp.diag(self.diag) - W


@functools.partial(jax.jit, static_argnames=("k",))
def _ell_extract(L: jax.Array, k: int):
    W = jnp.maximum(-L, 0.0)
    W = W - jnp.diag(jnp.diag(W))
    w, idx = jax.lax.top_k(W, k)
    return idx.astype(jnp.int32), w, jnp.diag(L)


@jax.jit
def _ell_required_degree(L: jax.Array) -> jax.Array:
    W = jnp.maximum(-L, 0.0)
    W = W - jnp.diag(jnp.diag(W))
    return jnp.max(jnp.sum(W > 0.0, axis=1))


def ell_from_dense_laplacian(L, max_degree: int | None = None) -> EllLaplacian:
    """Exact ELL extraction from a dense Laplacian, on device.

    ``max_degree=None`` computes the true maximum row degree first (one
    scalar D2H) so no edge is dropped. Positive off-diagonals (not a
    Laplacian of a non-negative graph) would be silently rectified — the
    builders here never produce them.
    """
    L = jnp.asarray(L, jnp.float32)
    k = int(_ell_required_degree(L)) if max_degree is None else int(max_degree)
    k = max(min(k, L.shape[0] - 1), 1)
    idx, w, diag = _ell_extract(L, k)
    return EllLaplacian(indices=idx, weights=w, diag=diag)


@jax.jit
def spmv_ell(indices: jax.Array, weights: jax.Array, x: jax.Array) -> jax.Array:
    """``W @ x`` in ELL layout: one gather + weighted row-reduce.

    Shapes: indices/weights [n, k], x [n] or [n, m] → [n] / [n, m].
    Padding contributes 0 via zero weights.
    """
    gathered = x[indices]                       # [n, k] or [n, k, m]
    if gathered.ndim == 3:
        return jnp.sum(weights[..., None] * gathered, axis=1)
    return jnp.sum(weights * gathered, axis=1)


@jax.jit
def laplacian_spmv_ell(
    indices: jax.Array, weights: jax.Array, x: jax.Array
) -> jax.Array:
    """``L @ x = deg∘x - W@x`` without densifying."""
    deg = jnp.sum(weights, axis=1)
    wx = spmv_ell(indices, weights, x)
    if x.ndim == 2:
        return deg[:, None] * x - wx
    return deg * x - wx


@jax.jit
def spmv_ell_scan(indices: jax.Array, weights: jax.Array, X: jax.Array) -> jax.Array:
    """``W @ X`` for a WIDE right-hand side ``X [n, m]`` with bounded memory.

    The one-shot gather form materializes ``[n, k, m]`` — at F=8k, k=32,
    m=2048 that is gigabytes. This variant scans over the k neighbour slots:
    each step is one ``[n, m]`` row-gather + fused multiply-add, so peak
    memory stays at ``O(n·m)`` and traffic at ``k·n·m`` reads (the sparse
    path's whole point: 100×+ fewer bytes than the dense F×F matmul).
    """
    def body(acc, slot):
        idx, w = slot
        return acc + w[:, None] * X[idx], None

    acc0 = jnp.zeros_like(X)
    acc, _ = jax.lax.scan(body, acc0, (indices.T, weights.T))
    return acc
