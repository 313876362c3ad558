"""SF-GRASS lightweight spectral sparsification.

Reference: ``/root/reference/src_legacy/sparsification.rs``: skip when avg
degree < 10; otherwise per-node keep the top ``ratio`` fraction of edges by
score ``w·√(deg_i·deg_j)``, at least one edge per node. Vectorized over the
dense adjacency (pure top-k — trivially a device op; kept numpy-simple at
graph scale).
"""

from __future__ import annotations

import numpy as np


class SfGrassSparsifier:
    def __init__(self, target_ratio: float = 0.5):
        self.target_ratio = float(np.clip(target_ratio, 0.1, 1.0))

    def with_target_ratio(self, ratio: float) -> "SfGrassSparsifier":
        self.target_ratio = float(np.clip(ratio, 0.1, 1.0))
        return self

    def sparsify_adjacency(self, W: np.ndarray) -> np.ndarray:
        """Dense-adjacency variant: returns the (asymmetric, per-row kept)
        adjacency. Callers re-symmetrize as needed."""
        W = np.asarray(W, np.float64)
        n = W.shape[0]
        mask = W > 1e-12
        degrees = mask.sum(axis=1)
        orig_edges = int(degrees.sum())
        avg_degree = orig_edges / max(n, 1)
        if avg_degree < 10.0:
            return W.copy()

        out = np.zeros_like(W)
        for i in range(n):
            nbrs = np.nonzero(mask[i])[0]
            if nbrs.size == 0:
                continue
            score = W[i, nbrs] * np.sqrt(degrees[i] * degrees[nbrs])
            keep = min(
                max(int(np.ceil(nbrs.size * self.target_ratio)), 1), nbrs.size
            )
            top = nbrs[np.argsort(-score, kind="stable")[:keep]]
            out[i, top] = W[i, top]
        return out

    def sparsify_graph(
        self, adj_rows: list[list[tuple[int, float]]], n_nodes: int
    ) -> list[list[tuple[int, float]]]:
        """Adjacency-list variant matching the reference signature."""
        degrees = [len(r) for r in adj_rows]
        orig_edges = sum(degrees)
        if orig_edges / max(n_nodes, 1) < 10.0:
            return [list(r) for r in adj_rows]
        out = []
        for i, neighbors in enumerate(adj_rows):
            if not neighbors:
                out.append([])
                continue
            scored = sorted(
                ((j, w, w * np.sqrt(degrees[i] * degrees[j])) for j, w in neighbors),
                key=lambda t: -t[2],
            )
            keep = min(max(int(np.ceil(len(neighbors) * self.target_ratio)), 1),
                       len(neighbors))
            out.append([(j, w) for j, w, _ in scored[:keep]])
        return out
