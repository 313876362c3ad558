"""Motif detection: triangle-density motif spotting on a Laplacian.

Reference: ``/root/reference/src_legacy/motives.rs``. Top-L neighbor lists
from off-diagonals, per-node triangle counts + clustering coefficient
``2T/(k(k-1))``, seeding where tri ≥ min and C ≥ min, greedy expansion by
triangle gain, Jaccard dedup. The eigen variant works on the graph's own
nodes; the energy variant maps sub-centroid motifs to item indices via
``centroid_map``.

Graphs here are feature/centroid-scale, so the set-based expansion runs on
host exactly as the reference; the neighbor-list extraction is vectorized.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from matternet_rs_tpu.core import ArrowSpace
from matternet_rs_tpu.graph import GraphLaplacian


@dataclasses.dataclass(frozen=True)
class MotiveConfig:
    """Defaults: motives.rs:67-76."""

    top_l: int = 16
    min_triangles: int = 2
    min_clust: float = 0.4
    max_motif_size: int = 32
    max_sets: int = 256
    jaccard_dedup: float = 0.8


def jaccard(a: set[int], b: set[int]) -> float:
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def _neighbor_lists(W: np.ndarray, top_l: int, by_weight: bool) -> list[np.ndarray]:
    """Sorted top-L neighbor index lists per node.

    ``by_weight=True`` keeps the L strongest edges (eigen variant,
    motives.rs:154-176); ``False`` truncates the index-sorted list (energy
    variant, motives.rs:317-337 — reference truncates after index sort)."""
    n = W.shape[0]
    out = []
    for i in range(n):
        nbrs = np.nonzero(W[i] > 1e-12)[0]
        nbrs = nbrs[nbrs != i]
        if by_weight and len(nbrs) > top_l:
            order = np.argsort(-W[i, nbrs], kind="stable")
            nbrs = nbrs[order[:top_l]]
        ids = np.sort(nbrs)
        if not by_weight and len(ids) > top_l:
            ids = ids[:top_l]
        out.append(ids)
    return out


def _triangle_stats(neigh_idx: list[np.ndarray], n: int):
    """Per-node triangle counts + clustering coefficients
    (motives.rs:568-603).

    Device formulation: with the (possibly asymmetric, top-L-truncated)
    binary neighbor matrix B, the common-neighbor count of (i, j) excluding
    both endpoints is exactly ``(B Bᵀ)[i, j]`` (the diagonal of B is zero),
    so ``tri[i] = Σ_{j>i} B[i,j]·(B Bᵀ)[i,j]`` — one MXU matmul instead of
    the reference's per-node sorted-list intersections. Bit-identical to the
    scalar scan.
    """
    import jax.numpy as jnp

    from matternet_rs_tpu.ops._mm import mm

    B = np.zeros((n, n), np.float32)
    for i, ids in enumerate(neigh_idx):
        B[i, ids] = 1.0
    Bj = jnp.asarray(B)
    common = np.asarray(mm(Bj, Bj.T))                  # [n, n]
    upper = np.triu(B, k=1)                            # j > i mask ∘ B[i,j]
    tri = np.rint((upper * common).sum(axis=1)).astype(np.int64)

    k = np.array([len(ids) for ids in neigh_idx])
    clust = np.where(k >= 2, 2.0 * tri / np.maximum(k * (k - 1), 1), 0.0)
    tri = np.where(k >= 2, tri, 0)
    return tri, clust


def _greedy_expand(seed: int, neigh_idx, sets, cfg: MotiveConfig) -> set[int] | None:
    """Greedy expansion by triangle gain (motives.rs:198-258)."""
    motif = {seed}
    while len(motif) < cfg.max_motif_size:
        cand = set()
        for u in motif:
            cand.update(v for v in neigh_idx[u] if v not in motif)
        if not cand:
            break
        best_u, best_gain = None, -1
        for u in sorted(cand):
            s_nbrs = sorted(v for v in neigh_idx[u] if v in motif)
            edges = 0
            for pos, ui in enumerate(s_nbrs):
                edges += len(sets[ui] & set(s_nbrs[pos + 1:]))
            if edges > best_gain:
                best_gain = edges
                best_u = u
        if best_u is None:
            break
        motif.add(best_u)
    return motif if len(motif) >= 3 else None


def _spot(neigh_idx, n: int, cfg: MotiveConfig) -> list[list[int]]:
    sets = [set(ids.tolist()) for ids in neigh_idx]
    tri, clust = _triangle_stats(neigh_idx, n)
    seeds = [
        i for i in range(n)
        if tri[i] >= cfg.min_triangles and clust[i] >= cfg.min_clust
    ]
    seeds.sort(key=lambda i: (-tri[i], -int(clust[i] * 1e6)))

    results: list[set[int]] = []
    for s in seeds:
        motif = _greedy_expand(s, neigh_idx, sets, cfg)
        if motif is None:
            continue
        if any(jaccard(motif, r) >= cfg.jaccard_dedup for r in results):
            continue
        results.append(motif)
        if len(results) >= cfg.max_sets:
            break
    return [sorted(r) for r in results]


def spot_motives_eigen(gl: GraphLaplacian, cfg: MotiveConfig | None = None) -> list[list[int]]:
    """Eigen-graph motif spotting (motives.rs:145-297)."""
    cfg = cfg or MotiveConfig()
    W = np.asarray(gl.adjacency(), np.float64)
    neigh_idx = _neighbor_lists(W, cfg.top_l, by_weight=True)
    return _spot(neigh_idx, W.shape[0], cfg)


def spot_motives_energy(
    gl_energy: GraphLaplacian, aspace: ArrowSpace, cfg: MotiveConfig | None = None
) -> list[list[int]]:
    """Energy motif spotting: sub-centroid motifs mapped to item indices via
    ``centroid_map`` (motives.rs:299-528)."""
    cfg = cfg or MotiveConfig()
    W = np.asarray(gl_energy.adjacency(), np.float64)
    n_sc = W.shape[0]
    if n_sc == 0:
        return []
    neigh_idx = _neighbor_lists(W, cfg.top_l, by_weight=False)
    sc_motifs = _spot(neigh_idx, n_sc, cfg)

    if aspace.centroid_map is None:
        return []
    cmap = np.asarray(aspace.centroid_map)
    out: list[list[int]] = []
    seen: list[set[int]] = []
    for motif in sc_motifs:
        items = set(np.nonzero(np.isin(cmap, motif))[0].tolist())
        if not items:
            continue
        if any(jaccard(items, s) >= cfg.jaccard_dedup for s in seen):
            continue
        seen.append(items)
        out.append(sorted(items))
    return out


def is_clique(gl: GraphLaplacian, nodes: set[int]) -> bool:
    """All pairs connected (motives.rs:530-543)."""
    if len(nodes) < 2:
        return False
    W = np.asarray(gl.adjacency())
    lst = sorted(nodes)
    for a in lst:
        for b in lst:
            if a != b and W[a, b] <= 1e-12:
                return False
    return True


def rayleigh_indicator(gl: GraphLaplacian, nodes: set[int]) -> float:
    """``R_L(1_S)`` cohesion score (motives.rs:546-561)."""
    n = gl.matrix.shape[0]
    if n == 0 or not nodes or any(u >= n for u in nodes):
        return float("inf")
    x = np.zeros(n, np.float64)
    x[sorted(nodes)] = 1.0
    L = np.asarray(gl.matrix, np.float64)
    return float(x @ L @ x / (x @ x))
