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
            items = sorted(a.items())[:k]
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
            nbrs = np.nonzero(np.abs(W[i]) > 1e-12)[0][:k]
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
