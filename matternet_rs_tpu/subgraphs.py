"""Subgraphs: motif materialization + hierarchical centroid subgraphs.

Reference: ``/root/reference/src_legacy/subgraphs/``:

* motif subgraphs (``sg_from_motives.rs``): each energy motif becomes a
  ``Subgraph`` with the parent's init-data columns sliced to the motif's
  centroids, a local F×F feature Laplacian, the original item indices, and
  an optional Rayleigh-cohesion filter;
* centroid hierarchy (``sg_from_centroids.rs``): recursive round-robin mean
  reclustering building per-level F×F Laplacians with root item-index
  propagation.

Invariants (sg_from_motives.rs:8-15): ``laplacian.init_data`` is [F, X],
``laplacian.matrix`` is F×F, ``laplacian.nnodes`` is X.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from matternet_rs_tpu.core import ArrowSpace
from matternet_rs_tpu.graph import GraphLaplacian, GraphParams
from matternet_rs_tpu.motives import MotiveConfig, spot_motives_energy
from matternet_rs_tpu.ops import laplacian as lap_ops


@dataclasses.dataclass
class SubgraphConfig:
    motives: MotiveConfig = dataclasses.field(default_factory=MotiveConfig)
    rayleigh_max: Optional[float] = None
    min_size: int = 3


@dataclasses.dataclass
class Subgraph:
    node_indices: list[int]
    item_indices: Optional[list[int]]
    laplacian: GraphLaplacian
    rayleigh: Optional[float] = None

    @classmethod
    def from_parent(
        cls, parent: GraphLaplacian, nodes: list[int], n_items: Optional[int] = None
    ) -> "Subgraph":
        """Materialize: slice parent init-data columns → local F×F Laplacian
        (sg_from_motives.rs:46-118)."""
        sub_init = jnp.asarray(parent.init_data)[:, jnp.asarray(nodes)]
        feature_gl = lap_ops.build_laplacian_matrix(
            sub_init, parent.graph_params, n_items=n_items, energy=parent.energy
        )
        local = GraphLaplacian(
            matrix=feature_gl.matrix,
            init_data=sub_init,
            nnodes=len(nodes),
            graph_params=parent.graph_params,
            energy=parent.energy,
        )
        return cls(node_indices=list(nodes), item_indices=None, laplacian=local)

    def compute_rayleigh(self) -> None:
        """Rayleigh of the all-ones feature indicator (sg_from_motives.rs:
        121-137)."""
        f = self.laplacian.init_data.shape[0]
        if f == 0:
            self.rayleigh = float("inf")
            return
        ones = jnp.ones(f)
        self.rayleigh = float(self.laplacian.rayleigh_quotient(ones))


def spot_subg_motives(
    gl_energy: GraphLaplacian, aspace: ArrowSpace, cfg: SubgraphConfig | None = None
) -> list[Subgraph]:
    """Energy-motif subgraphs with item mapping (sg_from_motives.rs:140-215)."""
    cfg = cfg or SubgraphConfig()
    item_motifs = spot_motives_energy(gl_energy, aspace, cfg.motives)

    if aspace.centroid_map is not None:
        cmap = np.asarray(aspace.centroid_map)
    elif aspace.cluster_assignments is not None:
        cmap = np.where(
            np.asarray(aspace.cluster_assignments) >= 0,
            np.asarray(aspace.cluster_assignments), 0,
        )
    else:
        raise ValueError(
            "centroid_map or cluster_assignments required for energy subgraphs"
        )

    n_centroids = gl_energy.init_data.shape[1]
    out: list[Subgraph] = []
    for items in item_motifs:
        if len(items) < cfg.min_size:
            continue
        cset = sorted(
            {int(cmap[i]) for i in items if i < len(cmap) and cmap[i] < n_centroids}
        )
        if len(cset) < 2:
            continue
        sg = Subgraph.from_parent(gl_energy, cset, n_items=aspace.nitems)
        sg.item_indices = list(items)
        if cfg.rayleigh_max is not None:
            sg.compute_rayleigh()
            if sg.rayleigh is not None and sg.rayleigh > cfg.rayleigh_max:
                continue
        out.append(sg)
    return out


# ---------------------------------------------------------------------------
# Centroid hierarchy (sg_from_centroids.rs)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CentroidGraphParams:
    eps: float = 0.5
    k: int = 16
    topk: int = 16
    p: float = 2.0
    sigma: Optional[float] = None
    normalise: bool = False
    sparsity_check: bool = False
    seed: Optional[int] = None
    min_centroids: int = 8
    max_depth: int = 2

    def graph_params(self) -> GraphParams:
        return GraphParams(
            eps=self.eps, k=self.k, topk=self.topk, p=self.p, sigma=self.sigma,
            normalise=self.normalise, sparsity_check=self.sparsity_check,
        )


@dataclasses.dataclass
class CentroidNode:
    graph: Subgraph
    parent_map: list[int]
    root_indices: list[list[int]]
    children: list["CentroidNode"] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class CentroidHierarchy:
    root: CentroidNode
    levels: list[list[CentroidNode]]

    def level(self, depth: int) -> list[CentroidNode]:
        return self.levels[depth] if depth < len(self.levels) else []

    def count_subgraphs(self) -> int:
        return sum(len(lvl) for lvl in self.levels)

    def all_subgraphs(self) -> list[Subgraph]:
        return [node.graph for lvl in self.levels for node in lvl]


def recluster_centroids(
    centroids: np.ndarray, k: int, seed: Optional[int] = None
) -> tuple[np.ndarray, np.ndarray]:
    """Round-robin mean recluster (sg_from_centroids.rs:296-336; the
    reference deliberately uses round-robin labels, not k-means)."""
    n, d = centroids.shape
    if n == 0:
        return np.zeros(0, np.int64), np.zeros((0, d), centroids.dtype)
    k_eff = min(k, n)
    labels = np.arange(n) % k_eff
    sums = np.zeros((k_eff, d), np.float64)
    np.add.at(sums, labels, centroids.astype(np.float64))
    counts = np.bincount(labels, minlength=k_eff)
    means = sums / np.maximum(counts, 1)[:, None]
    return labels.astype(np.int64), means.astype(centroids.dtype)


def _root_indices_from_aspace(aspace: ArrowSpace, n_root: int) -> list[list[int]]:
    out: list[list[int]] = [[] for _ in range(n_root)]
    if aspace.centroid_map is not None:
        for item, cid in enumerate(np.asarray(aspace.centroid_map)):
            if 0 <= cid < n_root:
                out[int(cid)].append(item)
    elif aspace.cluster_assignments is not None:
        for item, cid in enumerate(np.asarray(aspace.cluster_assignments)):
            if 0 <= cid < n_root:
                out[int(cid)].append(item)
    else:
        raise ValueError("centroid_map or cluster_assignments required")
    return out


def build_centroid_hierarchy(
    gl_centroids: GraphLaplacian,
    aspace: ArrowSpace,
    params: CentroidGraphParams | None = None,
) -> CentroidHierarchy:
    """Recursive hierarchy (sg_from_centroids.rs:71-208)."""
    params = params or CentroidGraphParams()
    gp = params.graph_params()

    init_fx = jnp.asarray(gl_centroids.init_data)      # [F, X0]
    f_dim, x0 = init_fx.shape
    root_indices = _root_indices_from_aspace(aspace, x0)

    feature_gl = lap_ops.build_laplacian_matrix(
        init_fx, gp, n_items=aspace.nitems
    )
    root_gl = GraphLaplacian(
        matrix=feature_gl.matrix, init_data=init_fx, nnodes=int(x0),
        graph_params=gp, energy=feature_gl.energy,
    )
    root = CentroidNode(
        graph=Subgraph(list(range(x0)), None, root_gl),
        parent_map=list(range(x0)),
        root_indices=root_indices,
    )
    hierarchy = CentroidHierarchy(root=root, levels=[[] for _ in range(max(params.max_depth, 1))])

    def collect(node: CentroidNode, depth: int):
        if depth >= len(hierarchy.levels):
            hierarchy.levels.extend([] for _ in range(depth + 1 - len(hierarchy.levels)))
        hierarchy.levels[depth].append(node)
        if depth + 1 >= params.max_depth:
            return
        x_curr = node.graph.laplacian.nnodes
        if x_curr < params.min_centroids:
            return
        cents_xf = np.asarray(node.graph.laplacian.init_data).T    # [X, F]
        labels, subs_xf = recluster_centroids(cents_xf, params.k, params.seed)
        x_next = subs_xf.shape[0]
        if x_next == 0:
            return
        subs_fx = jnp.asarray(subs_xf.T)
        next_root: list[list[int]] = [[] for _ in range(x_next)]
        for parent_cid, items in enumerate(node.root_indices):
            child = int(labels[parent_cid])
            if child < x_next:
                next_root[child].extend(items)
        sub_feature_gl = lap_ops.build_laplacian_matrix(
            subs_fx, gp, n_items=aspace.nitems
        )
        sub_gl = GraphLaplacian(
            matrix=sub_feature_gl.matrix, init_data=subs_fx, nnodes=int(x_next),
            graph_params=gp, energy=sub_feature_gl.energy,
        )
        child_node = CentroidNode(
            graph=Subgraph(list(range(x_next)), None, sub_gl),
            parent_map=[int(l) for l in labels],
            root_indices=next_root,
        )
        node.children.append(child_node)
        collect(child_node, depth + 1)

    collect(root, 0)
    return hierarchy


def spot_subg_centroids(
    gl_centroids: GraphLaplacian,
    aspace: ArrowSpace,
    params: CentroidGraphParams | None = None,
) -> list[Subgraph]:
    """Flat list across hierarchy levels (sg_from_centroids.rs:21-42)."""
    return build_centroid_hierarchy(gl_centroids, aspace, params).all_subgraphs()
