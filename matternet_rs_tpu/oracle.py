"""Reference oracle — independent pure-NumPy f64 port of the legacy pipeline.

This module re-implements the reference's exact legacy ("arrowspace") build
and query path in double-precision NumPy, following the *reference's own
algorithm structure* (per-node kNN scans, explicit two-pass dispersion, full
ranking scan) rather than the TPU rebuild's fused/closed-form design. It is
deliberately a second, independent implementation: the parity harness
(tests/test_reference_parity.py) runs it side by side with the TPU build and
asserts identical graph topology, λ agreement at f32 tolerance, and top-k
ranking equality — converting "matches the reference" claims into
measurements. bench.py uses it as the CPU build-throughput baseline
(``build_qps_vs_numpy``).

Pipeline covered (reference provenance, all under /root/reference):

* incremental clustering scan      src_legacy/clustering.rs:574-932
* kNN by rectified cosine distance src_legacy/laplacian.rs:205-294
  (CosinePair semantics: d = 1 - max(0, cos), self excluded, d ≤ eps)
* kernel weights w = 1/(1+(d/σ)^p), floor 1e-12        laplacian.rs:256-262
* inline degree sparsification (top ⌈len/2⌉ by w·√(deg_i·deg_j) when
  avg degree > 10 and len > 2)                          laplacian.rs:232-282
* union symmetrization (both directions inserted)       laplacian.rs:297-348
* L = D − W                                             laplacian.rs:351-419
* per-item select_tau (Median/Mean/Fixed/Percentile, floor 1e-10)
                                                        taumode.rs:29-70
* synthetic λ = τ·E/(E+τ) + (1−τ)·G with the two-pass edge-dispersion G
                                                        taumode.rs:261-408
* min-max λ normalization (max folded from 0, range floor 1e-9)
                                                        core.rs:1341-1354
* λ-aware full-scan search α·cos + (1−α)·(1−min(|Δλ|,1))
                                                        core.rs:141-179, 1156-1193
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import numpy as np

TAU_FLOOR = 1e-10
WEIGHT_FLOOR = 1e-12
SPARSIFY_AVG_DEGREE = 10.0
LAMBDA_RANGE_FLOOR = 1e-9


# ---------------------------------------------------------------------------
# Graph build (src_legacy/laplacian.rs)
# ---------------------------------------------------------------------------


def standardize_columns(x: np.ndarray) -> np.ndarray:
    """StandardScaler: z-score each column (laplacian.rs:147-156)."""
    x = np.asarray(x, np.float64)
    mean = x.mean(axis=0, keepdims=True)
    std = x.std(axis=0, keepdims=True)
    return (x - mean) / np.maximum(std, 1e-12)


def rectified_cosine_distances(x: np.ndarray) -> np.ndarray:
    """All-pairs ``d = 1 - max(0, cos)`` with self set to +inf.

    CosinePair's distance (laplacian.rs:74-80): anti-correlated pairs
    saturate at distance 1 so they never form edges at eps < 1.
    """
    x = np.asarray(x, np.float64)
    norms = np.linalg.norm(x, axis=1)
    safe = np.maximum(norms, 1e-12)
    xn = x / safe[:, None]
    cos = xn @ xn.T
    d = 1.0 - np.maximum(cos, 0.0)
    np.fill_diagonal(d, np.inf)
    return d


def build_adjacency(nodes: np.ndarray, eps: float, topk: int, p: float,
                    sigma: Optional[float], normalise: bool) -> np.ndarray:
    """Dense symmetric weighted adjacency, per-node scan structure.

    Follows _build_adjacency + _symmetrise_adjancency
    (laplacian.rs:205-348): per node, take the ``topk`` nearest non-self
    neighbours, keep those with d ≤ eps and kernel weight > 1e-12, optionally
    sparsify, then insert both directions of every surviving edge.
    """
    nodes = np.asarray(nodes, np.float64)
    n = nodes.shape[0]
    x = standardize_columns(nodes) if normalise else nodes
    sig = 1.0 if sigma is None else float(sigma)

    d = rectified_cosine_distances(x)
    kk = min(int(topk), n - 1)

    # Per-node top-k candidates (ascending distance, stable ties by index —
    # matches the deterministic candidate order of a fastpair tree walk).
    cand = np.argsort(d, axis=1, kind="stable")[:, :kk]          # [n, kk]
    cand_d = np.take_along_axis(d, cand, axis=1)                  # [n, kk]
    valid = cand_d <= eps

    # Degrees used by the sparsification score = count of eps-valid
    # candidates (laplacian.rs:219-231).
    degrees = valid.sum(axis=1)
    avg_degree = degrees.mean() if n else 0.0
    sparsify = avg_degree > SPARSIFY_AVG_DEGREE

    W = np.zeros((n, n), np.float64)
    for i in range(n):
        entries = []  # (j, weight, score)
        for c in range(kk):
            if not valid[i, c]:
                continue
            j = int(cand[i, c])
            dist = float(cand_d[i, c])
            w = 1.0 / (1.0 + (dist / sig) ** p)
            if w <= WEIGHT_FLOOR:
                continue
            score = w * math.sqrt(degrees[i] * degrees[j]) if sparsify else w
            entries.append((j, w, score))
        if sparsify and len(entries) > 2:
            entries.sort(key=lambda t: -t[2])
            keep = max(len(entries) // 2, 1)
            entries = entries[:keep]
        for j, w, _ in entries:
            # Union symmetrization: both directions inserted with the
            # (pair-symmetric) weight (laplacian.rs:319-322).
            W[i, j] = max(W[i, j], w)
            W[j, i] = max(W[j, i], w)
    return W


def laplacian_from_adjacency(W: np.ndarray) -> np.ndarray:
    """Unnormalized ``L = D − W`` (laplacian.rs:351-419)."""
    deg = W.sum(axis=1)
    return np.diag(deg) - W


def build_laplacian_from_centroids(
    centroids: np.ndarray, eps: float, topk: int, p: float,
    sigma: Optional[float], normalise: bool,
) -> tuple[np.ndarray, np.ndarray]:
    """Feature-space F×F graph from ``[C, F]`` centroids.

    GraphFactory::build_laplacian_matrix_from_k_cluster transposes so graph
    nodes are *features* with C-length profiles (graph.rs:193-249).
    Returns ``(W, L)``.
    """
    centroids = np.asarray(centroids, np.float64)
    W = build_adjacency(centroids.T, eps, topk, p, sigma, normalise)
    return W, laplacian_from_adjacency(W)


# ---------------------------------------------------------------------------
# TauMode λ (src_legacy/taumode.rs)
# ---------------------------------------------------------------------------


def select_tau(values: np.ndarray, mode: str, param: float = 0.0) -> float:
    """τ from an item's own values (taumode.rs:29-70), floor 1e-10."""
    v = np.asarray(values, np.float64)
    v = v[np.isfinite(v)]
    if mode == "fixed":
        return param if (math.isfinite(param) and param > 0.0) else TAU_FLOOR
    if v.size == 0:
        return TAU_FLOOR
    if mode == "mean":
        return max(float(v.mean()), TAU_FLOOR)
    s = np.sort(v, kind="stable")
    if mode == "percentile":
        pp = min(max(param, 0.0), 1.0)
        idx = int(np.floor((s.size - 1) * pp + 0.5))   # Rust half-away round
        return max(float(s[idx]), TAU_FLOOR)
    if mode == "median":
        mid = (
            float(s[s.size // 2])
            if s.size % 2 == 1
            else 0.5 * (float(s[s.size // 2 - 1]) + float(s[s.size // 2]))
        )
        return max(mid, TAU_FLOOR)
    raise ValueError(f"unknown tau mode {mode!r}")


def rayleigh_quotient(L: np.ndarray, x: np.ndarray) -> float:
    """``max(xᵀLx/xᵀx, 0)``; 0 if xᵀx ≤ 1e-12 (taumode.rs:326-361)."""
    x = np.asarray(x, np.float64)
    num = float(x @ (np.asarray(L, np.float64) @ x))
    den = float(x @ x)
    return max(num / den, 0.0) if den > 1e-12 else 0.0


def item_dispersion(x: np.ndarray, L: np.ndarray) -> float:
    """Two-pass edge dispersion ``G = Σ (e_ij/Σe)²`` over ordered pairs
    with ``w_ij = max(-L_ij, 0)`` off-diagonal (taumode.rs:366-408)."""
    x = np.asarray(x, np.float64)
    A = np.maximum(-np.asarray(L, np.float64), 0.0)
    np.fill_diagonal(A, 0.0)
    diff = x[:, None] - x[None, :]
    e = A * diff * diff
    total = float(e.sum())
    if total <= 1e-12:
        return 0.0
    share = e / total
    return float(np.clip((share * share).sum(), 0.0, 1.0))


def synthetic_lambda(x: np.ndarray, L: np.ndarray, tau: float) -> float:
    """``S = τ·E/(E+τ) + (1−τ)·G``; zero vectors → 0 (taumode.rs:261-318)."""
    x = np.asarray(x, np.float64)
    if np.all(np.abs(x) <= 1e-10):
        return 0.0
    e_raw = rayleigh_quotient(L, x)
    g = item_dispersion(x, L)
    e_bounded = e_raw / (e_raw + tau)
    return tau * e_bounded + (1.0 - tau) * g


def taumode_lambdas(
    X: np.ndarray, L: np.ndarray, mode: str = "median", param: float = 0.0
) -> np.ndarray:
    """Raw λ for every row (per-item loop, the reference's rayon map —
    taumode.rs:117-250)."""
    X = np.asarray(X, np.float64)
    return np.array(
        [synthetic_lambda(row, L, select_tau(row, mode, param)) for row in X],
        np.float64,
    )


def taumode_lambdas_fast(
    X: np.ndarray, L: np.ndarray, mode: str = "median", param: float = 0.0
) -> np.ndarray:
    """Vectorized f64 λ batch (closed-form expansion) — the *strong* NumPy
    baseline for the build-throughput bench. Verified against the scan
    version in tests/test_reference_parity.py.
    """
    X = np.asarray(X, np.float64)
    L = np.asarray(L, np.float64)
    n, f = X.shape

    if mode == "fixed":
        t = param if (math.isfinite(param) and param > 0.0) else TAU_FLOOR
        tau = np.full(n, t)
    elif mode == "mean":
        tau = np.maximum(X.mean(axis=1), TAU_FLOOR)
    elif mode == "median":
        tau = np.maximum(np.median(X, axis=1), TAU_FLOOR)
    elif mode == "percentile":
        pp = min(max(param, 0.0), 1.0)
        idx = int(np.floor((f - 1) * pp + 0.5))        # Rust half-away round
        tau = np.maximum(np.sort(X, axis=1)[:, idx], TAU_FLOOR)
    else:
        raise ValueError(f"unknown tau mode {mode!r}")

    XL = X @ L
    num_e = np.einsum("ij,ij->i", X, XL)
    den = np.einsum("ij,ij->i", X, X)
    e_raw = np.where(den > 1e-12, num_e / np.maximum(den, 1e-12), 0.0)
    e_raw = np.maximum(e_raw, 0.0)

    A = np.maximum(-L, 0.0)
    np.fill_diagonal(A, 0.0)
    A2 = A * A
    deg = A.sum(axis=1)
    deg2 = A2.sum(axis=1)
    X2, X3, X4 = X * X, X**3, X**4
    B1, B2 = X @ A, X2 @ A
    C1, C2, C3, C4 = X @ A2, X2 @ A2, X3 @ A2, X4 @ A2
    total = np.einsum("ij->i", X2 * deg - 2.0 * X * B1 + B2)
    num4 = np.einsum(
        "ij->i", X4 * deg2 - 4.0 * X3 * C1 + 6.0 * X2 * C2 - 4.0 * X * C3 + C4
    )
    g = np.where(total > 1e-12, num4 / np.maximum(total * total, 1e-24), 0.0)
    g = np.clip(g, 0.0, 1.0)

    e_bounded = e_raw / (e_raw + tau)
    lam = tau * e_bounded + (1.0 - tau) * g
    return np.where(np.max(np.abs(X), axis=1) <= 1e-10, 0.0, lam)


# ---------------------------------------------------------------------------
# λ normalization + search (src_legacy/core.rs)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LambdaStats:
    min: float
    max: float
    range: float


def normalise_lambdas(raw: np.ndarray) -> tuple[np.ndarray, LambdaStats]:
    """Min-max to [0,1]; max folded from 0.0, range floor 1e-9
    (core.rs:1341-1354)."""
    raw = np.asarray(raw, np.float64)
    mn = float(raw.min()) if raw.size else float("inf")
    mx = max(float(raw.max()) if raw.size else 0.0, 0.0)
    rng = max(mx - mn, LAMBDA_RANGE_FLOOR)
    return (raw - mn) / rng, LambdaStats(mn, mx, rng)


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> float:
    denom = float(np.linalg.norm(a) * np.linalg.norm(b))
    return float(a @ b / denom) if denom > 0.0 else 0.0


def search_lambda_aware(
    X: np.ndarray, lambdas: np.ndarray, query: np.ndarray, q_lambda: float,
    k: int, alpha: float,
) -> list[tuple[int, float]]:
    """Full-scan ranking α·cos + (1−α)·(1−min(|Δλ|,1)); stable sort desc
    (core.rs:1156-1193)."""
    X = np.asarray(X, np.float64)
    q = np.asarray(query, np.float64)
    norms = np.linalg.norm(X, axis=1)
    qn = float(np.linalg.norm(q))
    denom = norms * qn
    cos = np.where(denom > 0.0, (X @ q) / np.maximum(denom, 1e-300), 0.0)
    lam_sim = 1.0 - np.minimum(np.abs(q_lambda - np.asarray(lambdas, np.float64)), 1.0)
    scores = alpha * cos + (1.0 - alpha) * lam_sim
    order = np.argsort(-scores, kind="stable")[:k]
    return [(int(i), float(scores[i])) for i in order]


def search_lambda_aware_hybrid(
    X: np.ndarray, lambdas: np.ndarray, query: np.ndarray, q_lambda: float,
    k: int, alpha: float,
) -> list[tuple[int, float]]:
    """Hybrid search (core.rs:1197-1323): candidate union of the λ-score
    top-k, {cos > 0.9999}, and the semantic top-1; high-semantic members
    keep their cosine as the final score (insertion precedence), the rest
    keep the blended score; sorted desc, truncated to k."""
    if k == 0:
        return []
    X = np.asarray(X, np.float64)
    q = np.asarray(query, np.float64)
    norms = np.linalg.norm(X, axis=1)
    qn = float(np.linalg.norm(q))
    denom = norms * qn
    cos = np.where(denom > 0.0, (X @ q) / np.maximum(denom, 1e-300), 0.0)
    lam_sim = 1.0 - np.minimum(np.abs(q_lambda - np.asarray(lambdas, np.float64)), 1.0)
    lambda_score = alpha * cos + (1.0 - alpha) * lam_sim

    score_map: dict[int, float] = {}
    for i in np.nonzero(cos > 0.9999)[0]:          # high-semantic first
        score_map[int(i)] = float(cos[i])
    for i in np.argsort(-lambda_score, kind="stable")[:k]:
        score_map.setdefault(int(i), float(lambda_score[i]))
    sem_top = int(np.argmax(cos))
    score_map.setdefault(sem_top, float(cos[sem_top]))

    out = sorted(score_map.items(), key=lambda t: (-t[1], t[0]))
    return [(i, s) for i, s in out[:k]]


# ---------------------------------------------------------------------------
# Incremental clustering (src_legacy/clustering.rs:574-932, sequential mode)
# ---------------------------------------------------------------------------


def incremental_clustering(
    X: np.ndarray, max_clusters: int, radius: float,
    keep_mask: Optional[np.ndarray] = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Sequential radius-gated create/assign scan. Returns
    ``(centroids [C, F], assignments [N], with -1 for dropped outliers)``.

    Semantics: create when nearest d² > radius·0.5 and capacity remains;
    assign + online-mean update when d² ≤ radius; soft outlier (counted, no
    move) when d² ≤ radius·1.5; else dropped.
    """
    X = np.asarray(X, np.float64)
    n, f = X.shape
    cents = np.zeros((max_clusters, f), np.float64)
    counts = np.zeros(max_clusters, np.int64)
    assignments = np.full(n, -1, np.int64)
    ncent = 0
    for i in range(n):
        if keep_mask is not None and not keep_mask[i]:
            continue
        row = X[i]
        if ncent == 0:
            cents[0], counts[0], assignments[i], ncent = row, 1, 0, 1
            continue
        d2 = np.sum((cents[:ncent] - row) ** 2, axis=1)
        bi = int(np.argmin(d2))
        bd = float(d2[bi])
        if ncent < max_clusters and bd > radius * 0.5:
            cents[ncent], counts[ncent], assignments[i] = row, 1, ncent
            ncent += 1
        elif bd <= radius:
            counts[bi] += 1
            cents[bi] += (row - cents[bi]) / counts[bi]
            assignments[i] = bi
        elif bd <= radius * 1.5:
            counts[bi] += 1
            assignments[i] = bi
    return cents[:ncent], assignments


# ---------------------------------------------------------------------------
# Oracle index: end-to-end build + query
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class OracleIndex:
    """A fully built oracle index over raw items (f64)."""

    data: np.ndarray          # [N, F]
    W: np.ndarray             # [F, F] adjacency
    L: np.ndarray             # [F, F] Laplacian
    raw_lambdas: np.ndarray   # [N] pre-normalization
    lambdas: np.ndarray       # [N] in [0, 1]
    stats: LambdaStats
    tau_mode: str = "median"
    tau_param: float = 0.0
    centroids: Optional[np.ndarray] = None

    def prepare_query(self, query: np.ndarray) -> float:
        """select_tau → synthetic λ → normalize+clamp (core.rs:865-935)."""
        q = np.asarray(query, np.float64)
        tau = select_tau(q, self.tau_mode, self.tau_param)
        raw = synthetic_lambda(q, self.L, tau)
        if abs(raw) <= 1e-12:
            raise ValueError("undecidable query: raw λ is 0.0")
        return float(np.clip((raw - self.stats.min) / self.stats.range, 0.0, 1.0))

    def search(self, query: np.ndarray, k: int, alpha: float = 0.7):
        q_lambda = self.prepare_query(query)
        return search_lambda_aware(self.data, self.lambdas, query, q_lambda, k, alpha)


def build_index(
    rows: np.ndarray,
    centroids: np.ndarray,
    eps: float, topk: int, p: float = 2.0, sigma: Optional[float] = None,
    normalise: bool = False,
    tau_mode: str = "median", tau_param: float = 0.0,
    fast_lambdas: bool = False,
) -> OracleIndex:
    """Graph + λ build from precomputed centroids (stages 2-4 of
    build_legacy, builder.rs:831-1080). ``fast_lambdas`` switches the λ
    batch to the vectorized f64 closed form (for throughput baselines);
    both are verified equal in tests.
    """
    rows = np.asarray(rows, np.float64)
    W, L = build_laplacian_from_centroids(centroids, eps, topk, p, sigma, normalise)
    lam_fn = taumode_lambdas_fast if fast_lambdas else taumode_lambdas
    raw = lam_fn(rows, L, tau_mode, tau_param)
    lambdas, stats = normalise_lambdas(raw)
    return OracleIndex(
        data=rows, W=W, L=L, raw_lambdas=raw, lambdas=lambdas, stats=stats,
        tau_mode=tau_mode, tau_param=tau_param,
        centroids=np.asarray(centroids, np.float64),
    )


def full_build(
    rows: np.ndarray,
    max_clusters: int, radius: float,
    eps: float, topk: int, p: float = 2.0, sigma: Optional[float] = None,
    normalise: bool = False,
    tau_mode: str = "median", tau_param: float = 0.0,
    fast_lambdas: bool = True,
) -> OracleIndex:
    """Stages 1-4: sequential clustering → graph → λ → normalize.

    The CPU reference row for the bench's build-throughput comparison.
    """
    rows = np.asarray(rows, np.float64)
    centroids, _ = incremental_clustering(rows, max_clusters, radius)
    return build_index(
        rows, centroids, eps, topk, p, sigma, normalise,
        tau_mode, tau_param, fast_lambdas=fast_lambdas,
    )


# ---------------------------------------------------------------------------
# Energy pipeline oracle (src_legacy/energymaps.rs)
#
# Same independence contract as the eigen oracle: plain f64 NumPy following
# the reference's scan structure. Random projections are *inputs* (the
# materialized [F, r] / [F, 2] matrices) — RNG streams differ between
# implementations by design (SURVEY §7.3), so parity is over the math given
# identical projections.
# ---------------------------------------------------------------------------


def optical_compress(
    centroids: np.ndarray, proj2d: np.ndarray, token_budget: int,
    trim_quantile: float,
) -> np.ndarray:
    """Optical compression (energymaps.rs:314-447), per-bin loop form:
    JL→2D, √budget × √budget grid binning, per-bin norm-quantile trim +
    mean pool in bin-id order, low-norm top-up."""
    centroids = np.asarray(centroids, np.float64)
    x, f = centroids.shape
    if token_budget == 0 or token_budget >= x:
        return centroids.copy()
    xy = centroids @ np.asarray(proj2d, np.float64)
    g = int(np.ceil(np.sqrt(token_budget)))
    px = (xy[:, 0] - xy[:, 0].min()) / (xy[:, 0].max() - xy[:, 0].min() + 1e-9)
    py = (xy[:, 1] - xy[:, 1].min()) / (xy[:, 1].max() - xy[:, 1].min() + 1e-9)
    bx = np.clip(np.floor(px * g), 0, g - 1).astype(int)
    by = np.clip(np.floor(py * g), 0, g - 1).astype(int)
    bin_ids = by * g + bx

    norms = np.linalg.norm(centroids, axis=1)
    out_rows: list[np.ndarray] = []
    for b in range(g * g):
        members = np.nonzero(bin_ids == b)[0]
        if members.size == 0:
            continue
        if members.size > 4:
            order = members[np.argsort(norms[members], kind="stable")]
            keep = max(int(np.floor(len(order) * (1.0 - trim_quantile) + 0.5)), 1)
            members = order[:keep]
        out_rows.append(centroids[members].mean(axis=0))
        if len(out_rows) >= token_budget:
            break
    if len(out_rows) < token_budget:
        for i in np.argsort(norms, kind="stable"):
            if len(out_rows) >= token_budget:
                break
            out_rows.append(centroids[i])
    return np.stack(out_rows)


def diffuse(X: np.ndarray, L: np.ndarray, eta: float, steps: int) -> np.ndarray:
    """Heat diffusion ``x' = x − η·x·Lᵀ`` iterated (energymaps.rs:485-530)."""
    work = np.asarray(X, np.float64).copy()
    L = np.asarray(L, np.float64)
    for _ in range(steps):
        work = work - eta * (work @ L.T)
    return work


def node_energy_and_dispersion(X: np.ndarray, L: np.ndarray):
    """(λ, G) per row with the UPPER-TRIANGLE edge scan
    (energymaps.rs:923-1045: each undirected pair counted once)."""
    X = np.asarray(X, np.float64)
    L = np.asarray(L, np.float64)
    A = np.maximum(-L, 0.0)
    np.fill_diagonal(A, 0.0)
    iu = np.triu_indices(L.shape[0], 1)
    w = A[iu]
    lam = np.empty(X.shape[0])
    gini = np.empty(X.shape[0])
    for r, xrow in enumerate(X):
        lam[r] = rayleigh_quotient(L, xrow)
        d = xrow[iu[0]] - xrow[iu[1]]
        e = w * d * d
        total = e.sum()
        if total <= 1e-12:
            gini[r] = 0.0
        else:
            share = e / total
            gini[r] = float(np.clip((share * share).sum(), 0.0, 1.0))
    return lam, gini


def split_subcentroids(
    work: np.ndarray, gini: np.ndarray, split_quantile: float,
    neighbor_k: int, split_tau: float,
) -> np.ndarray:
    """±τ·gradient split of the top-dispersion quantile
    (energymaps.rs:531-621), per-row scan form."""
    work = np.asarray(work, np.float64)
    x, f = work.shape
    g_sorted = np.sort(gini)
    thresh = g_sorted[int(np.floor((len(g_sorted) - 1) * split_quantile + 0.5))]
    rows = [work]
    to_split = np.nonzero(gini >= thresh)[0]
    if to_split.size and x > 1:
        k = min(neighbor_k, x - 1)
        for i in to_split:
            d2 = np.sum((work - work[i]) ** 2, axis=1)
            order = np.argsort(d2, kind="stable")
            nbrs = [j for j in order if j != i][:k]
            mean = work[nbrs].mean(axis=0)
            c = work[i]
            d = c - mean
            n = max(np.sqrt((d * d).sum()), 1e-9)
            direction = d / n
            std_loc = float(np.sqrt(np.mean((d - d.mean()) ** 2)))
            tau = split_tau * max(std_loc, 1e-6)
            rows.append((c + tau * direction)[None, :])
            rows.append((c - tau * direction)[None, :])
    return np.concatenate(rows, axis=0)


@dataclasses.dataclass
class OracleEnergyIndex:
    """A fully built oracle energy index (f64)."""

    data: np.ndarray              # [N, F] raw items
    data_work: np.ndarray         # [N, F'] items in the λ-prep space
    sub_centroids: np.ndarray     # [S, F']
    subcentroid_lambdas: np.ndarray  # [S] normalized
    centroid_map: np.ndarray      # [N]
    lambdas: np.ndarray           # [N] inherited sub-centroid λ
    L_energy: np.ndarray

    def prepare_query(self, query: np.ndarray, projection: Optional[np.ndarray] = None) -> float:
        q = np.asarray(query, np.float64)
        if projection is not None and q.shape[-1] == projection.shape[0]:
            q = q @ np.asarray(projection, np.float64)
        d = np.linalg.norm(self.sub_centroids - q[None, :], axis=1)
        return float(self.subcentroid_lambdas[int(np.argmin(d))])

    def search(self, query: np.ndarray, k: int,
               projection: Optional[np.ndarray] = None) -> list[tuple[int, float]]:
        """Pure λ-distance scan with cosine tie-break at |Δλ| < 1e-9
        (energymaps.rs:628-674), ascending."""
        q_lambda = self.prepare_query(query, projection)
        q = np.asarray(query, np.float64)
        lam_dist = np.abs(q_lambda - self.lambdas)
        qn = max(np.linalg.norm(q), 1e-9)
        norms = np.linalg.norm(self.data, axis=1)
        cos = (self.data @ q) / (qn * norms + 1e-9)
        tie = np.where(lam_dist < 1e-9, (1.0 - cos) * 1e-9, 0.0)
        scores = lam_dist + tie
        order = np.argsort(scores, kind="stable")[:k]
        return [(int(i), float(scores[i])) for i in order]


def build_energy_index(
    rows: np.ndarray,
    centroids: np.ndarray,
    eps: float, k: int, topk: int,
    optical_tokens: Optional[int], trim_quantile: float,
    eta: float, steps: int, split_quantile: float, neighbor_k: int,
    split_tau: float,
    proj2d: Optional[np.ndarray] = None,
    projection: Optional[np.ndarray] = None,
    normalise: bool = False,
    tau_mode: str = "median", tau_param: float = 0.0,
) -> OracleEnergyIndex:
    """Energy build from precomputed (possibly projected) centroids
    (energymaps.rs:1116-1391): optical compression → bootstrap L₀ →
    diffusion + split → energy Laplacian → sub-centroid λ → item
    assignment with cosine tie-break.
    """
    rows = np.asarray(rows, np.float64)
    centroids = np.asarray(centroids, np.float64)

    if optical_tokens is not None and proj2d is not None:
        centroids = optical_compress(centroids, proj2d, optical_tokens, trim_quantile)

    def boot(nodes):
        x = nodes.shape[0]
        return build_laplacian_from_centroids(
            nodes, eps, min(topk, 4, x - 1), 2.0, None, normalise
        )[1]

    l0 = boot(centroids)
    work = diffuse(centroids, l0, eta, steps)
    _, gini = node_energy_and_dispersion(work, l0)
    sub_centroids = split_subcentroids(work, gini, split_quantile, neighbor_k, split_tau)

    L_energy = boot(sub_centroids)

    raw = taumode_lambdas(sub_centroids, L_energy, tau_mode, tau_param)
    sc_lambdas, _ = normalise_lambdas(raw)

    # Item assignment (energymaps.rs:1246-1342): nearest sub-centroid by L2
    # in the working space → its λ → λ-distance re-assignment with cosine
    # tie-break among |Δλ| < 1e-11 candidates.
    Xw = rows @ np.asarray(projection, np.float64) if projection is not None else rows
    scn = sub_centroids / np.maximum(
        np.linalg.norm(sub_centroids, axis=1, keepdims=True), 1e-12
    )
    cmap = np.empty(rows.shape[0], np.int64)
    for i, xw in enumerate(Xw):
        d2 = np.sum((sub_centroids - xw) ** 2, axis=1)
        item_lambda = sc_lambdas[int(np.argmin(d2))]
        lam_dist = np.abs(item_lambda - sc_lambdas)
        best = lam_dist.min()
        ties = np.abs(lam_dist - best) < 1e-11
        if ties.sum() > 1:
            xn = xw / max(np.linalg.norm(xw), 1e-12)
            cos = scn @ xn
            cos = np.where(ties, cos, -np.inf)
            cmap[i] = int(np.argmax(cos))
        else:
            cmap[i] = int(np.argmin(lam_dist))

    return OracleEnergyIndex(
        data=rows,
        data_work=Xw,
        sub_centroids=sub_centroids,
        subcentroid_lambdas=sc_lambdas,
        centroid_map=cmap,
        lambdas=sc_lambdas[cmap],
        L_energy=L_energy,
    )


# ---------------------------------------------------------------------------
# Sorted-λ index (src_legacy/sorted_index.rs)
# ---------------------------------------------------------------------------


def sorted_band_query(
    lambdas: np.ndarray, q_lambda: float, k: int, p: float,
) -> list[tuple[int, float]]:
    """Band range query over the sorted-λ order (sorted_index.rs:64-80):
    band = σ/2^p with the reference's f32 std (f32 mean, f32 variance —
    laplacian.rs:431-448); all items with λ ∈ [λq−band, λq+band] in
    ascending-λ order, truncated to k ONLY when ≥ k are in band."""
    lam = np.asarray(lambdas, np.float64)
    order = np.argsort(lam, kind="stable")
    s_lam = lam[order]
    mean32 = np.float32(lam.sum()) / np.float32(lam.size)
    var32 = np.mean((mean32 - lam.astype(np.float32)) ** 2, dtype=np.float32)
    band = float(np.sqrt(var32)) / (2.0 ** p)
    lo = np.searchsorted(s_lam, q_lambda - band, side="left")
    hi = np.searchsorted(s_lam, q_lambda + band, side="right")
    out = [(int(order[i]), float(s_lam[i])) for i in range(lo, hi)]
    return out[:k] if len(out) >= k else out


def k_nearest_by_lambda(
    lambdas: np.ndarray, q_lambda: float, k: int, p: float,
    base_delta: Optional[float] = None, growth: float = 1.7,
    max_multiplier: float = 10.0,
) -> list[tuple[int, float]]:
    """Expanding-window k-nearest by |Δλ| (sorted_index.rs:85-140)."""
    lam = np.asarray(lambdas, np.float64)
    if k == 0 or lam.size == 0:
        return []
    order = np.argsort(lam, kind="stable")
    s_lam = lam[order]
    mean32 = np.float32(lam.sum()) / np.float32(lam.size)
    var32 = np.mean((mean32 - lam.astype(np.float32)) ** 2, dtype=np.float32)
    std = float(np.sqrt(var32))
    delta = abs(base_delta if base_delta is not None else max(std * p, 1e-9))
    growth = growth if np.isfinite(growth) and growth > 1.0 else 1.7
    max_delta = min(delta * max(max_multiplier, 1.0), 1.0)
    while True:
        lo = np.searchsorted(s_lam, max(q_lambda - delta, 0.0), side="left")
        hi = np.searchsorted(s_lam, min(q_lambda + delta, 1.0), side="right")
        if hi - lo >= k or delta >= max_delta:
            break
        delta = min(delta * growth, max_delta)
    idx = order[lo:hi]
    vals = s_lam[lo:hi]
    if idx.size == 0:
        return []
    sub = np.argsort(np.abs(vals - q_lambda), kind="stable")[:k]
    return [(int(idx[i]), float(vals[i])) for i in sub]
