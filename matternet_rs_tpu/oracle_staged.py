"""Staged-pipeline oracle — independent NumPy f64 port of surfface's
A→D chain (stages B0 preflight → B1 MST → B2 Kalman RTS → C Bhattacharyya
Laplacian → D spectral λ).

Same contract as :mod:`matternet_rs_tpu.oracle`: a second, double-precision
implementation following the *reference's* algorithm structure (per-feature
scalar Kalman loops, heap Prim, per-item Dirichlet scans), run side by side
with the TPU pipeline to turn "matches the reference" into measurements
(tests/test_reference_parity.py).

Reference provenance (all /root/reference/surfface-core/src):
  preflight.rs:151-299, mst.rs:202-674, smoothing_chain.rs:281-453,
  laplacian.rs:135-394, spectral/mod.rs:29-181, centroid.rs:107-115.
"""

from __future__ import annotations

import dataclasses
import heapq
from collections import deque
from typing import Optional

import numpy as np


# ---------------------------------------------------------------------------
# Stage B0: preflight (preflight.rs:151-299)
# ---------------------------------------------------------------------------


def preflight(
    means: np.ndarray, variances: np.ndarray,
    magnitude_threshold: float = 10.0,
    variance_epsilon: float = 1e-4, variance_min: float = 1e-4,
    variance_max: float = 100.0,
) -> tuple[np.ndarray, np.ndarray, bool]:
    """(out_means, regularized_vars, was_normalized)."""
    means = np.asarray(means, np.float64)
    variances = np.asarray(variances, np.float64)
    norms = np.linalg.norm(means, axis=1)
    ratio = norms.max() / max(norms.min(), 1e-10)
    was_normalized = ratio > magnitude_threshold
    out = means / np.maximum(norms, 1e-10)[:, None] if was_normalized else means
    reg = np.clip(variances + variance_epsilon, variance_min, variance_max)
    return out, reg, bool(was_normalized)


# ---------------------------------------------------------------------------
# Distances (distance.rs:29-177)
# ---------------------------------------------------------------------------


def bhattacharyya_pairwise(
    mu: np.ndarray, var: np.ndarray, var_floor: float = 1e-6
) -> np.ndarray:
    mu = np.asarray(mu, np.float64)
    v = np.maximum(np.asarray(var, np.float64), var_floor)
    va = v[:, None, :]
    vb = v[None, :, :]
    vbar = 0.5 * (va + vb)
    diff = mu[:, None, :] - mu[None, :, :]
    mterm = 0.125 * np.sum(diff * diff / vbar, axis=-1)
    vterm = 0.5 * np.sum(np.log(vbar) - 0.5 * (np.log(va) + np.log(vb)), axis=-1)
    return mterm + vterm


# ---------------------------------------------------------------------------
# Stage B1: MST skeleton (mst.rs:202-674)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class OracleMST:
    mst_edges: list[tuple[int, int, float]]   # (u, v, cost)
    centroid_order: np.ndarray
    trunk_nodes: np.ndarray
    trunk_edges: set
    total_weight: float


def _edge_cost(d, ti, tj, thickness_weight):
    if thickness_weight == "none":
        return d
    if thickness_weight == "mean":
        return d * (ti + tj) / 2.0
    if thickness_weight == "min":
        return d * min(ti, tj)
    if thickness_weight == "max":
        return d * max(ti, tj)
    if thickness_weight == "geometric_mean":
        return d * float(np.sqrt(max(ti * tj, 0.0)))
    raise ValueError(thickness_weight)


def mst_stage(
    means: np.ndarray, variances: np.ndarray,
    k_neighbors: int = 8, distance_metric: str = "bhattacharyya",
    thickness_weight: str = "mean", compute_trunk: bool = True,
) -> OracleMST:
    means = np.asarray(means, np.float64)
    variances = np.asarray(variances, np.float64)
    c = means.shape[0]
    thickness = variances.mean(axis=1)          # trace(P)/F (centroid.rs:107)

    if distance_metric == "bhattacharyya":
        D = bhattacharyya_pairwise(means, variances)
    elif distance_metric == "euclidean":
        D = np.sqrt(
            np.maximum(((means[:, None] - means[None, :]) ** 2).sum(-1), 0.0)
        )
    else:
        D = ((means[:, None] - means[None, :]) ** 2).sum(-1)

    # Per-node k nearest candidates (brute scan, self excluded).
    k = min(k_neighbors, c - 1)
    edges: list[tuple[int, int, float]] = []          # (u, v, cost)
    order_all = np.argsort(D, axis=1, kind="stable")
    for i in range(c):
        cnt = 0
        for j in order_all[i]:
            if j == i:
                continue
            cost = _edge_cost(float(D[i, j]), thickness[i], thickness[j],
                              thickness_weight)
            edges.append((i, int(j), cost))
            cnt += 1
            if cnt >= k:
                break

    # Heap Prim from node 0 (mst.rs:420-508).
    adj: list[list[tuple[int, float, int]]] = [[] for _ in range(c)]
    for idx, (u, v, cost) in enumerate(edges):
        adj[u].append((v, cost, idx))
        adj[v].append((u, cost, idx))
    in_mst = [False] * c
    in_mst[0] = True
    heap = [(cost, nb, idx) for nb, cost, idx in adj[0]]
    heapq.heapify(heap)
    mst_idx: list[int] = []
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
    mst_edges = [edges[i] for i in mst_idx]

    # Trunk: double BFS from the thickest node (mst.rs:511-539).
    tadj: list[list[tuple[int, float]]] = [[] for _ in range(c)]
    for u, v, cost in mst_edges:
        tadj[u].append((v, cost))
        tadj[v].append((u, cost))

    def bfs_far(start):
        dist = np.full(c, np.inf)
        dist[start] = 0.0
        q = deque([start])
        while q:
            u = q.popleft()
            for v, cost in tadj[u]:
                nd = dist[u] + cost
                if nd < dist[v]:
                    dist[v] = nd
                    q.append(v)
        finite = np.where(np.isfinite(dist))[0]
        far = int(finite[np.argmax(dist[finite])]) if finite.size else start
        return far, dist

    trunk_nodes = np.array([], np.int64)
    if compute_trunk and mst_edges:
        root = int(np.argmax(thickness))
        far1, _ = bfs_far(root)
        far2, dist = bfs_far(far1)
        path = [far2]
        cur = far2
        while cur != far1:
            nxt, best = None, np.inf
            for nb, cost in tadj[cur]:
                residual = abs(dist[cur] - (dist[nb] + cost))
                if residual < best:
                    best = residual
                    nxt = nb
            if nxt is None or best >= 1e-3:
                break
            path.append(nxt)
            cur = nxt
        path.reverse()
        trunk_nodes = np.asarray(path, np.int64)
    trunk_edges = set()
    for a, b in zip(trunk_nodes[:-1], trunk_nodes[1:]):
        trunk_edges.add((int(a), int(b)))
        trunk_edges.add((int(b), int(a)))

    # DFS thick→thin from the thickest node (mst.rs:622-674).
    dadj: list[list[int]] = [[] for _ in range(c)]
    for u, v, _ in mst_edges:
        dadj[u].append(v)
        dadj[v].append(u)
    for nbrs in dadj:
        nbrs.sort(key=lambda j: -thickness[j])
    if mst_edges:
        root = int(np.argmax(thickness))
        order, visited, stack = [], [False] * c, [root]
        while stack:
            node = stack.pop()
            if visited[node]:
                continue
            visited[node] = True
            order.append(node)
            for nb in reversed(dadj[node]):
                if not visited[nb]:
                    stack.append(nb)
        centroid_order = np.asarray(order, np.int64)
    else:
        centroid_order = np.arange(c, dtype=np.int64)

    return OracleMST(mst_edges, centroid_order, trunk_nodes, trunk_edges, total)


# ---------------------------------------------------------------------------
# Stage B2: Kalman RTS (smoothing_chain.rs:281-453) — per-step scalar loops
# ---------------------------------------------------------------------------


def kalman_rts(
    means_ordered: np.ndarray, vars_ordered: np.ndarray,
    trunk_flags: np.ndarray,
    process_noise: float = 0.01, observation_noise: float = 0.1,
    transition_model: str = "identity", damping: float = 1.0,
    trunk_factor: float = 1.0,
    variance_floor: float = 1e-6, variance_ceiling: float = 1e3,
) -> tuple[np.ndarray, np.ndarray]:
    """(smoothed_means, smoothed_variances), rows in the given order."""
    y = np.asarray(means_ordered, np.float64)
    rv = np.asarray(vars_ordered, np.float64)
    c, f = y.shape
    q, r = process_noise, observation_noise
    vf, vc = variance_floor, variance_ceiling

    xf = np.empty((c, f))
    pf = np.empty((c, f))
    xp = np.empty((c, f))       # predicted (transition into step t, t ≥ 1)
    pp = np.empty((c, f))
    xf[0] = y[0]
    pf[0] = np.clip(rv[0] + q, vf, vc)
    for t in range(1, c):
        if transition_model == "identity":
            x_pred, p_pred = xf[t - 1], pf[t - 1] + q
        elif transition_model == "damped":
            x_pred = damping * xf[t - 1]
            p_pred = damping * damping * pf[t - 1] + q
        else:  # trunk_aware
            q_eff = q * trunk_factor if trunk_flags[t] else q
            x_pred, p_pred = xf[t - 1], pf[t - 1] + q_eff
        p_pred = np.clip(p_pred, vf, vc)
        r_obs = np.maximum(np.clip(rv[t], vf, vc) + r, vf)
        kgain = np.clip(p_pred / (p_pred + r_obs), 0.0, 1.0)
        xf[t] = x_pred + kgain * (y[t] - x_pred)
        pf[t] = np.clip((1.0 - kgain) * p_pred, vf, vc)
        xp[t], pp[t] = x_pred, p_pred

    xs = np.empty((c, f))
    ps = np.empty((c, f))
    xs[-1], ps[-1] = xf[-1], pf[-1]
    for t in range(c - 2, -1, -1):
        j = np.where(
            pp[t + 1] > vf,
            np.clip(pf[t] / np.maximum(pp[t + 1], vf), 0.0, 1.0),
            0.0,
        )
        xs[t] = xf[t] + j * (xs[t + 1] - xp[t + 1])
        ps[t] = np.clip(pf[t] + j * j * (ps[t + 1] - pp[t + 1]), vf, vc)
    return xs, ps


# ---------------------------------------------------------------------------
# Stage C: feature-space Bhattacharyya Laplacian (laplacian.rs:135-394)
# ---------------------------------------------------------------------------


def stage_c_laplacian(
    means: np.ndarray, variances: np.ndarray,
    k_neighbors: int = 15, variance_regularizer: float = 1e-6,
    normalize: bool = True, weight_threshold: float = 1e-9,
) -> np.ndarray:
    feat_mu = np.asarray(means, np.float64).T           # [F, C]
    feat_var = np.asarray(variances, np.float64).T
    f = feat_mu.shape[0]
    D = bhattacharyya_pairwise(feat_mu, feat_var, var_floor=variance_regularizer)
    bc = np.exp(-D)
    np.fill_diagonal(bc, -np.inf)
    bc[bc <= weight_threshold] = -np.inf

    k = min(k_neighbors, f - 1)
    W = np.zeros((f, f))
    for i in range(f):
        order = np.argsort(-bc[i], kind="stable")[:k]
        for j in order:
            w = bc[i, j]
            if np.isfinite(w):
                W[i, j] = max(W[i, j], w)
    W = np.maximum(W, W.T)

    deg = W.sum(axis=1)
    if normalize:
        connected = deg > weight_threshold
        inv_sqrt = np.where(connected, 1.0 / np.sqrt(np.maximum(deg, 1e-30)), 0.0)
        Wn = W * inv_sqrt[:, None] * inv_sqrt[None, :]
        return np.diag(connected.astype(np.float64)) - Wn
    return np.diag(deg) - W


# ---------------------------------------------------------------------------
# Stage D: spectral λ (spectral/mod.rs:29-181) — per-item scans
# ---------------------------------------------------------------------------


def stage_d_lambdas(L: np.ndarray, X: np.ndarray) -> np.ndarray:
    """λ_i = clip(Rayleigh) + clip(edge_energy_i / global_total)."""
    L = np.asarray(L, np.float64)
    X = np.asarray(X, np.float64)
    W = np.maximum(-L, 0.0)
    deg = W.sum(axis=1)

    rayleigh = np.empty(X.shape[0])
    row_sums = np.empty(X.shape[0])
    for i, x in enumerate(X):
        num = float(x @ (L @ x))
        den = float(x @ x)
        rayleigh[i] = np.clip(num / (den + 1e-9), -1e6, 1e6)
        x2 = x * x
        edge = deg * x2 - 2.0 * x * (W @ x) + (W @ x2)
        row_sums[i] = np.maximum(edge, 0.0).sum()
    total = row_sums.sum()
    dirichlet = np.clip(row_sums / (total + 1e-12), 0.0, 1.0)
    return rayleigh + dirichlet


# ---------------------------------------------------------------------------
# Full chain from a stage-A CentroidState
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class OracleStagedResult:
    preflight_means: np.ndarray
    preflight_vars: np.ndarray
    was_normalized: bool
    mst: OracleMST
    smoothed_means: np.ndarray     # in MST order
    smoothed_vars: np.ndarray
    L: np.ndarray
    lambdas: np.ndarray


def run_staged(
    means: np.ndarray, variances: np.ndarray, items: np.ndarray,
    mst_k: int = 8, distance_metric: str = "bhattacharyya",
    thickness_weight: str = "mean",
    smoothing_model: str = "identity", trunk_factor: float = 1.0,
    lap_k: int = 15, lap_normalize: bool = True,
) -> OracleStagedResult:
    """B0 → B1 → B2 → C → D with default configs (mirrors pipeline.build
    from a given stage-A state)."""
    pf_means, pf_vars, was_norm = preflight(means, variances)
    mst = mst_stage(pf_means, pf_vars, k_neighbors=mst_k,
                    distance_metric=distance_metric,
                    thickness_weight=thickness_weight)
    order = mst.centroid_order
    trunk_flags = np.zeros(len(order), bool)
    for t in range(1, len(order)):
        trunk_flags[t] = (int(order[t - 1]), int(order[t])) in mst.trunk_edges
    sm, sv = kalman_rts(
        pf_means[order], pf_vars[order], trunk_flags,
        transition_model=smoothing_model, trunk_factor=trunk_factor,
    )
    L = stage_c_laplacian(sm, sv, k_neighbors=lap_k, normalize=lap_normalize)
    lam = stage_d_lambdas(L, items)
    return OracleStagedResult(
        preflight_means=pf_means, preflight_vars=pf_vars, was_normalized=was_norm,
        mst=mst, smoothed_means=sm, smoothed_vars=sv, L=L, lambdas=lam,
    )
