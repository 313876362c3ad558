"""Stage B1: thickness-weighted MST skeleton → trunk → 1-D ordering.

Reference: ``/root/reference/surfface-core/src/mst.rs``. TPU split:

* candidate-graph distances — the reference's O(C²) scalar scans become one
  batched pairwise kernel on device (Bhattacharyya / Euclidean / squared),
* Prim's MST, double-BFS trunk, and thick→thin DFS stay on host: C is
  centroid-scale (≲ 10⁴) and tree pointer-chasing is not device work.
"""

from __future__ import annotations

import dataclasses
import heapq
from collections import deque

import numpy as np

from matternet_rs_tpu.ops import distance as dist_ops
from matternet_rs_tpu.pipeline.centroid import CentroidState

BHATTACHARYYA = "bhattacharyya"
EUCLIDEAN = "euclidean"
SQEUCLIDEAN = "sqeuclidean"

THICKNESS_MEAN = "mean"
THICKNESS_MIN = "min"
THICKNESS_MAX = "max"
THICKNESS_GEOMETRIC = "geometric_mean"
THICKNESS_NONE = "none"


@dataclasses.dataclass(frozen=True)
class MSTConfig:
    """Defaults: mst.rs:78-88."""

    k_neighbors: int = 8
    distance_metric: str = BHATTACHARYYA
    thickness_weight: str = THICKNESS_MEAN
    compute_trunk: bool = True

    @classmethod
    def high_dimensional(cls) -> "MSTConfig":
        return cls(k_neighbors=16)

    @classmethod
    def prototype(cls) -> "MSTConfig":
        return cls(k_neighbors=4, distance_metric=SQEUCLIDEAN,
                   thickness_weight=THICKNESS_NONE, compute_trunk=False)


@dataclasses.dataclass
class Edge:
    u: int
    v: int
    distance: float
    thickness_u: float
    thickness_v: float
    cost: float

    def contains(self, node: int) -> bool:
        """Edge endpoint membership (mst.rs Edge helper)."""
        return node == self.u or node == self.v

    def other(self, node: int):
        """The opposite endpoint, or None if ``node`` is not on the edge
        (mst.rs Edge helper)."""
        if node == self.u:
            return self.v
        if node == self.v:
            return self.u
        return None


@dataclasses.dataclass
class MSTOutput:
    candidate_edges: list[Edge]
    mst_edges: list[Edge]
    centroid_order: np.ndarray
    trunk_nodes: np.ndarray
    trunk_edges: set[tuple[int, int]]
    thickness: np.ndarray
    total_weight: float
    nodes_in_mst: int

    def is_connected(self) -> bool:
        """All centroids reached by the tree (mst.rs:182-184)."""
        return self.nodes_in_mst == len(self.centroid_order)


class MSTStage:
    def __init__(self, config: MSTConfig | None = None):
        self.config = config or MSTConfig()

    # ------------------------------------------------------------------
    def execute(self, state: CentroidState) -> MSTOutput:
        cfg = self.config
        c = state.num_centroids
        thickness = np.asarray(state.get_thickness(), np.float64)

        # Pairwise distances on device, top-k on device.
        D = self._pairwise(state)                      # [C, C] numpy
        k = min(cfg.k_neighbors, c - 1)
        candidate_edges = []
        order = np.argsort(D, axis=1, kind="stable")
        for i in range(c):
            cnt = 0
            for j in order[i]:
                if j == i:
                    continue
                d = float(D[i, j])
                cost = self._edge_cost(d, thickness[i], thickness[j])
                candidate_edges.append(
                    Edge(i, int(j), d, thickness[i], thickness[j], cost)
                )
                cnt += 1
                if cnt >= k:
                    break

        mst_edges, total_weight, nodes_in_mst = self._prim(candidate_edges, c)

        trunk_nodes = np.array([], np.int64)
        if cfg.compute_trunk and nodes_in_mst > 1:
            trunk_nodes = self._trunk(mst_edges, thickness, c)
        trunk_edges = set()
        for a, b in zip(trunk_nodes[:-1], trunk_nodes[1:]):
            trunk_edges.add((int(a), int(b)))
            trunk_edges.add((int(b), int(a)))

        centroid_order = self._dfs_ordering(mst_edges, thickness, c)

        return MSTOutput(
            candidate_edges=candidate_edges,
            mst_edges=mst_edges,
            centroid_order=centroid_order,
            trunk_nodes=trunk_nodes,
            trunk_edges=trunk_edges,
            thickness=thickness,
            total_weight=total_weight,
            nodes_in_mst=nodes_in_mst,
        )

    # ------------------------------------------------------------------
    def _pairwise(self, state: CentroidState) -> np.ndarray:
        if self.config.distance_metric == BHATTACHARYYA:
            D = dist_ops.bhattacharyya_pairwise(state.means, state.variances)
        elif self.config.distance_metric == EUCLIDEAN:
            D = dist_ops.pairwise_euclidean(state.means)
        else:
            D = dist_ops.pairwise_sqeuclidean(state.means)
        return np.asarray(D, np.float64)

    def _edge_cost(self, d: float, ti: float, tj: float) -> float:
        """Surface cost c = d · φ(tᵢ, tⱼ) (mst.rs:400-417)."""
        tw = self.config.thickness_weight
        if tw == THICKNESS_NONE:
            return d
        if tw == THICKNESS_MEAN:
            phi = (ti + tj) / 2.0
        elif tw == THICKNESS_MIN:
            phi = min(ti, tj)
        elif tw == THICKNESS_MAX:
            phi = max(ti, tj)
        elif tw == THICKNESS_GEOMETRIC:
            phi = float(np.sqrt(max(ti * tj, 0.0)))
        else:
            raise ValueError(f"unknown thickness weight {tw!r}")
        return d * phi

    @staticmethod
    def _prim(edges: list[Edge], n: int) -> tuple[list[Edge], float, int]:
        """Heap Prim from node 0 (mst.rs:420-508)."""
        adj: list[list[tuple[int, float, int]]] = [[] for _ in range(n)]
        for idx, e in enumerate(edges):
            adj[e.u].append((e.v, e.cost, idx))
            adj[e.v].append((e.u, e.cost, idx))

        in_mst = [False] * n
        in_mst[0] = True
        heap = [(cost, nb, idx) for nb, cost, idx in adj[0]]
        heapq.heapify(heap)
        mst_idx = []
        total = 0.0
        while heap:
            cost, node, idx = heapq.heappop(heap)
            if in_mst[node]:
                continue
            in_mst[node] = True
            mst_idx.append(idx)
            total += cost
            for nb, nb_cost, nb_idx in adj[node]:
                if not in_mst[nb]:
                    heapq.heappush(heap, (nb_cost, nb, nb_idx))
        return [edges[i] for i in mst_idx], total, sum(in_mst)

    def _trunk(self, mst_edges, thickness, n) -> np.ndarray:
        """Tree diameter via double BFS from the thickest node
        (mst.rs:511-539)."""
        if not mst_edges:
            return np.array([], np.int64)
        adj: list[list[tuple[int, float]]] = [[] for _ in range(n)]
        for e in mst_edges:
            adj[e.u].append((e.v, e.cost))
            adj[e.v].append((e.u, e.cost))

        root = int(np.argmax(thickness))
        far1, _ = self._bfs_farthest(adj, root, n)
        far2, dist = self._bfs_farthest(adj, far1, n)
        return self._reconstruct_path(adj, far1, far2, dist)

    @staticmethod
    def _bfs_farthest(adj, start, n):
        dist = np.full(n, np.inf)
        dist[start] = 0.0
        q = deque([start])
        while q:
            u = q.popleft()
            for v, cost in adj[u]:
                nd = dist[u] + cost
                if nd < dist[v]:
                    dist[v] = nd
                    q.append(v)
        finite = np.where(np.isfinite(dist))[0]
        far = int(finite[np.argmax(dist[finite])]) if finite.size else start
        return far, dist

    @staticmethod
    def _reconstruct_path(adj, start, end, dist) -> np.ndarray:
        """Distance-gradient walk back (mst.rs:570-619)."""
        path = [end]
        cur = end
        while cur != start:
            nxt, best_residual = None, np.inf
            for nb, cost in adj[cur]:
                residual = abs(dist[cur] - (dist[nb] + cost))
                if residual < best_residual:
                    best_residual = residual
                    nxt = nb
            if nxt is None or best_residual >= 1e-3:
                break
            path.append(nxt)
            cur = nxt
        path.reverse()
        return np.asarray(path, np.int64)

    @staticmethod
    def _dfs_ordering(mst_edges, thickness, n) -> np.ndarray:
        """Iterative DFS from the thickest node, children thick→thin
        (mst.rs:622-674; recursion replaced with an explicit stack)."""
        if not mst_edges:
            return np.arange(n, dtype=np.int64)
        adj: list[list[int]] = [[] for _ in range(n)]
        for e in mst_edges:
            adj[e.u].append(e.v)
            adj[e.v].append(e.u)
        for nbrs in adj:
            nbrs.sort(key=lambda j: -thickness[j])

        root = int(np.argmax(thickness))
        order, visited = [], [False] * n
        stack = [root]
        while stack:
            node = stack.pop()
            if visited[node]:
                continue
            visited[node] = True
            order.append(node)
            # push reversed so the thickest child is visited first
            for nb in reversed(adj[node]):
                if not visited[nb]:
                    stack.append(nb)
        return np.asarray(order, np.int64)
