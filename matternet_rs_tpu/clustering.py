"""Clustering: jit k-means, optimal-k heuristics, incremental clustering.

Rebuilds ``/root/reference/src_legacy/clustering.rs``:

* ``kmeans`` — Lloyd's algorithm as a jitted ``lax.fori_loop`` (replaces
  smartcore ``KMeans``; assignment is one ``[N, K]`` distance matmul/iter),
* ``estimate_intrinsic_dimension`` — Two-NN ratio method
  (clustering.rs:132-195) on device (one pairwise-distance pass),
* ``compute_optimal_k`` — Calinski-Harabasz sweep with penalty
  ``-0.8·k·ln N``, 3 seeded trials per k, coarse step + fine-tune,
  larger-k tiebreak (clustering.rs:198-337),
* ``compute_threshold_from_pilot`` — radius = 90th-pct within-cluster d²
  × 1.5 with inter-centroid fallback (clustering.rs:411-519),
* ``incremental_clustering`` — radius-gated create/assign scan with inline
  sampling, soft-outlier relaxed radius ×1.5 after saturation
  (clustering.rs:574-932). Two modes: an exact sequential host scan
  (the reference's deterministic mode) and a batched device fast path
  (distance matmuls on the MXU, centroid creation on host per batch —
  same regime, mini-batch snapshot semantics).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from matternet_rs_tpu.ops._mm import mm
import numpy as np

from matternet_rs_tpu.sampling import InlineSampler


# ---------------------------------------------------------------------------
# K-means (Lloyd) on device
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "max_iter"))
def _kmeans_jit(X: jax.Array, k: int, max_iter: int, seed: jax.Array):
    n = X.shape[0]
    key = jax.random.PRNGKey(seed)

    # k-means++ init: sample each next center ∝ d² to the nearest chosen one.
    # (Sturdier than the reference's random init; fully jitted fori_loop.)
    k0, key = jax.random.split(key)
    first = X[jax.random.randint(k0, (), 0, n)]
    centroids0 = jnp.zeros((k, X.shape[1]), X.dtype).at[0].set(first)
    d0 = jnp.sum((X - first) ** 2, axis=-1)

    def init_body(i, carry):
        cents, d_min, kk = carry
        kk, sub = jax.random.split(kk)
        probs = d_min / jnp.maximum(jnp.sum(d_min), 1e-30)
        idx = jax.random.choice(sub, n, p=probs)
        c = X[idx]
        cents = cents.at[i].set(c)
        d_min = jnp.minimum(d_min, jnp.sum((X - c) ** 2, axis=-1))
        return cents, d_min, kk

    centroids, _, _ = jax.lax.fori_loop(1, k, init_body, (centroids0, d0, key))

    x_sq = jnp.sum(X * X, axis=-1, keepdims=True)

    def assign(cents):
        c_sq = jnp.sum(cents * cents, axis=-1)[None, :]
        d = x_sq + c_sq - 2.0 * mm(X, cents.T)
        return jnp.argmin(d, axis=1)

    def body(_, cents):
        a = assign(cents)
        one_hot = jax.nn.one_hot(a, k, dtype=X.dtype)          # [N, K]
        counts = jnp.sum(one_hot, axis=0)                      # [K]
        sums = mm(one_hot.T, X)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        # Empty clusters keep their previous centroid.
        return jnp.where(counts[:, None] > 0, new, cents)

    centroids = jax.lax.fori_loop(0, max_iter, body, centroids)
    return assign(centroids), centroids


def kmeans_lloyd(
    X, k: int, max_iter: int = 20, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Returns ``(assignments [N], centroids [k, F])``."""
    X = jnp.asarray(X, jnp.float32)
    k = min(k, X.shape[0])
    a, c = _kmeans_jit(X, k, max_iter, jnp.uint32(seed & 0xFFFFFFFF))
    return np.asarray(a), np.asarray(c)


@functools.partial(jax.jit, static_argnames=("k",))
def _ch_score_jit(X: jax.Array, assignments: jax.Array, k: int) -> jax.Array:
    """Calinski-Harabasz index (clustering.rs:340-408)."""
    n = X.shape[0]
    global_c = jnp.mean(X, axis=0)
    one_hot = jax.nn.one_hot(assignments, k, dtype=X.dtype)
    counts = jnp.sum(one_hot, axis=0)
    sums = mm(one_hot.T, X)
    cents = sums / jnp.maximum(counts, 1.0)[:, None]
    bgss = jnp.sum(counts * jnp.sum((cents - global_c) ** 2, axis=-1))
    diff = X - cents[assignments]
    wgss = jnp.sum(diff * diff)
    score = (bgss / (k - 1)) / (wgss / (n - k))
    return jnp.where(wgss < 1e-10, 0.0, score)


def calinski_harabasz_score(X, assignments, k: int) -> float:
    if k <= 1 or k >= np.asarray(X).shape[0]:
        return 0.0
    return float(
        _ch_score_jit(jnp.asarray(X, jnp.float32), jnp.asarray(assignments), k)
    )


# ---------------------------------------------------------------------------
# Heuristics
# ---------------------------------------------------------------------------


def estimate_intrinsic_dimension(X, seed: int = 0) -> int:
    """Two-NN intrinsic-dimension estimate (clustering.rs:132-195).

    Mean ratio d2/d1 of nearest two neighbours over ≤500 sampled rows;
    ID = 1/ln(mean_ratio), clamped to [1, F].
    """
    X = np.asarray(X, np.float32)
    n, f = X.shape
    if n < 10:
        return min(f, 2)
    rng = np.random.default_rng(seed + 1)
    sample = rng.permutation(n)[: min(n, 500)]

    Xd = jnp.asarray(X)
    from matternet_rs_tpu.ops.knn import knn

    d, _ = knn(Xd[sample], Xd, k=3, metric="euclidean")
    d = np.asarray(d)
    # First column is the self-distance (0); next two are the 2 NNs.
    d1, d2 = d[:, 1], d[:, 2]
    valid = d1 > 1e-12
    if not valid.any():
        return min(f, 3)
    ratios = d2[valid] / d1[valid]
    mean_ratio = float(np.mean(ratios))
    ident = 1.0 / math.log(mean_ratio) if mean_ratio > 1.001 else float(f)
    return int(np.clip(round(ident), 1, f))


def step1_bounds(X, seed: int = 0) -> tuple[int, int, int]:
    """K bounds from N/F/intrinsic-dim (clustering.rs:106-129)."""
    n, f = np.asarray(X).shape
    id_est = estimate_intrinsic_dimension(X, seed)
    k_min = max(math.ceil(math.sqrt(n / 10.0)), 2)
    k_max = min(f, n // 10, 5 * id_est, int(n ** 0.5))
    k_max = min(max(k_max, k_min + 1), n // 2)
    return k_min, k_max, id_est


def _best_ch(X, k: int, seeds: list[int]) -> float:
    best = 0.0
    for s in seeds:
        a, _ = kmeans_lloyd(X, k, 20, s)
        best = max(best, calinski_harabasz_score(X, a, k))
    return best


def step2_calinski_harabasz(X, k_min: int, k_max: int, seed: int = 0) -> int:
    """Penalized CH sweep with coarse step + fine-tune, larger-k tiebreak
    (clustering.rs:198-337)."""
    X = np.asarray(X, np.float32)
    n = X.shape[0]
    if n < 10:
        return k_min
    k_range = k_max - k_min
    k_step = 1 if k_range <= 5 else (2 if k_range <= 15 else 3)
    candidates = list(range(k_min, k_max + 1, k_step))

    def penalized(k: int, mult: int) -> float:
        seeds = [seed + k * mult + t for t in range(3)]
        return _best_ch(X, k, seeds) - 0.8 * k * math.log(n)

    scores = [(k, penalized(k, 1000)) for k in candidates if 2 <= k < n]
    if not scores:
        return k_min
    # max by score; ties prefer larger k.
    best_k, best_score = max(scores, key=lambda t: (t[1], t[0]))

    if k_step > 1:
        fine = {
            max(best_k - (k_step - 1), 0),
            max(best_k - 1, 0),
            best_k,
            min(best_k + 1, k_max),
            min(best_k + k_step - 1, k_max),
        }
        fine = [k for k in sorted(fine) if k_min <= k <= k_max and k < n and k not in candidates]
        fine_scores = [(k, penalized(k, 10000)) for k in fine]
        if fine_scores:
            fk, fs = max(fine_scores, key=lambda t: (t[1], t[0]))
            if fs > best_score:
                best_k = fk
    return min(best_k, k_max)


def compute_threshold_from_pilot(X, k: int, seed: int = 0) -> float:
    """Radius heuristic (clustering.rs:411-519): 90th-percentile
    within-cluster squared distance × 1.5, inter-centroid fallback."""
    X = np.asarray(X, np.float32)
    a, cents = kmeans_lloyd(X, k, 20, seed + 100000)
    counts = np.bincount(a, minlength=len(cents))
    d2 = np.sum((X - cents[a]) ** 2, axis=-1).astype(np.float64)
    if d2.size == 0:
        return 1.0
    d2s = np.sort(d2)
    idx = min(math.ceil(len(d2s) * 0.9), len(d2s) - 1)
    p90 = float(d2s[idx])

    nonempty = cents[counts > 0]
    if len(nonempty) > 1:
        pd = np.sum(
            (nonempty[:, None, :] - nonempty[None, :, :]) ** 2, axis=-1
        ).astype(np.float64)
        iu = np.triu_indices(len(nonempty), 1)
        min_inter = float(pd[iu].min()) if iu[0].size else float("inf")
    else:
        min_inter = float("inf")

    ratio = p90 / min_inter if np.isfinite(min_inter) and min_inter > 0 else 1.0
    if p90 < 1e-8 or ratio < 0.01:
        if np.isfinite(min_inter):
            return max(min_inter * 0.15, 1e-6)
        return 1e-6
    return max(p90 * 1.5, 1e-6)


def compute_optimal_k(X, seed: int = 0) -> tuple[int, float, int]:
    """(k_optimal, radius, intrinsic_dim) — clustering.rs:69-103."""
    X = np.asarray(X, np.float32)
    n = X.shape[0]
    k_min, k_max, id_est = step1_bounds(X, seed)
    rng = np.random.default_rng(seed)
    sample = rng.permutation(n)[: min(n, 1000)] if n > 1000 else np.arange(n)
    Xs = X[sample]
    k_opt = step2_calinski_harabasz(Xs, k_min, k_max, seed)
    radius = compute_threshold_from_pilot(Xs, k_opt, seed)
    return k_opt, radius, id_est


# ---------------------------------------------------------------------------
# Incremental clustering (radius-gated create/assign)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ClusteredOutput:
    centroids: np.ndarray               # [C, F] (or [C, r] if projected)
    assignments: np.ndarray             # [N] int, -1 for dropped outliers
    sizes: np.ndarray                   # [C]
    radius: float
    n_items: int
    n_features: int
    reduced_dim: Optional[int] = None


RELAX_FACTOR = 1.5
CREATE_FACTOR = 0.5   # create when snapshot d² > radius·0.5 (clustering.rs:697)


def incremental_clustering(
    X,
    max_clusters: int,
    radius: float,
    sampler: Optional[InlineSampler] = None,
    deterministic: bool = True,
    batch_size: int = 2048,
) -> ClusteredOutput:
    """Radius-gated incremental clustering (clustering.rs:574-932).

    Fast path: the native C++ scan (bit-identical to the sequential
    reference semantics; see native/clustering.cpp). Falls back to the
    Python sequential scan, or the batched-device path for huge N when
    ``deterministic=False`` and no native library is available.
    Assignments use -1 for dropped outliers (reference: ``None``).
    """
    X = np.asarray(X, np.float32)
    n, f = X.shape

    # Sampling masks that don't depend on live clustering state can be
    # precomputed and handed to the native scan. Density-adaptive sampling
    # reads the current nearest-distance, so it stays on the Python path.
    from matternet_rs_tpu.sampling import SimpleRandomSampler
    from matternet_rs_tpu import native as native_mod

    keep_mask = None
    native_ok = True
    if sampler is not None:
        if type(sampler) is SimpleRandomSampler:
            keep_mask = (sampler.rng.random(n) < sampler.rate).astype(np.uint8)
            sampler.stats.sampled += int(keep_mask.sum())
            sampler.stats.discarded += int(n - keep_mask.sum())
        else:
            native_ok = False

    if native_ok:
        out = native_mod.incremental_cluster(
            X, max_clusters, radius, "legacy", keep_mask
        )
        if out is not None:
            cents, assignments, counts, _m2 = out
            if len(cents) == 0:
                raise ValueError(
                    "No clusters created from data (sampling too aggressive?)"
                )
            return ClusteredOutput(
                centroids=cents,
                assignments=assignments,
                sizes=counts,
                radius=radius,
                n_items=n,
                n_features=f,
            )

    if deterministic or n <= batch_size:
        # Hand the already-drawn (and already-counted) keep mask to the
        # fallback so the kept rows and sampler stats match the native
        # path exactly — re-sampling here would double-count stats and
        # advance the RNG a second time.
        return _incremental_sequential(
            X, max_clusters, radius,
            sampler if keep_mask is None else None, keep_mask=keep_mask,
        )
    return _incremental_batched(X, max_clusters, radius, sampler, batch_size)


def _incremental_sequential(
    X, max_clusters, radius, sampler, keep_mask=None
) -> ClusteredOutput:
    n, f = X.shape
    cents = np.zeros((max_clusters, f), np.float64)
    counts = np.zeros(max_clusters, np.int64)
    ncent = 0
    assignments = np.full(n, -1, np.int64)

    for i in range(n):
        if keep_mask is not None and not keep_mask[i]:
            continue
        row = X[i].astype(np.float64)
        if ncent == 0:
            best_d = np.inf
        else:
            d2 = np.sum((cents[:ncent] - row) ** 2, axis=1)
            best_idx = int(np.argmin(d2))
            best_d = float(d2[best_idx])

        if sampler is not None and not sampler.should_keep(best_d, ncent, max_clusters):
            continue

        if ncent == 0:
            cents[0] = row
            counts[0] = 1
            assignments[i] = 0
            ncent = 1
        elif ncent < max_clusters and best_d > radius * CREATE_FACTOR:
            cents[ncent] = row
            counts[ncent] = 1
            assignments[i] = ncent
            ncent += 1
        elif best_d <= radius:
            counts[best_idx] += 1
            cents[best_idx] += (row - cents[best_idx]) / counts[best_idx]
            assignments[i] = best_idx
        else:
            # Soft outlier: relaxed radius, centroid not moved.
            if best_d <= radius * RELAX_FACTOR:
                counts[best_idx] += 1
                assignments[i] = best_idx
            # else: dropped.

    if ncent == 0:
        raise ValueError("No clusters created from data (sampling too aggressive?)")
    return ClusteredOutput(
        centroids=cents[:ncent].astype(np.float32),
        assignments=assignments,
        sizes=counts[:ncent].copy(),
        radius=radius,
        n_items=n,
        n_features=f,
    )


@functools.partial(jax.jit, static_argnames=("cap",))
def _batch_dists(Xb: jax.Array, cents: jax.Array, ncent: jax.Array, cap: int):
    """Min d² + argmin of batch rows against the first ``ncent`` of ``cents``."""
    d = (
        jnp.sum(Xb * Xb, axis=-1, keepdims=True)
        + jnp.sum(cents * cents, axis=-1)[None, :]
        - 2.0 * mm(Xb, cents.T)
    )
    mask = jnp.arange(cap)[None, :] < ncent
    d = jnp.where(mask, jnp.maximum(d, 0.0), jnp.inf)
    return jnp.min(d, axis=1), jnp.argmin(d, axis=1)


def _incremental_batched(X, max_clusters, radius, sampler, batch_size) -> ClusteredOutput:
    """Device fast path: per-batch distance matmul on the MXU, creations and
    mean updates applied on host per batch (mini-batch snapshot semantics —
    the reference's parallel mode has the same relaxed ordering)."""
    n, f = X.shape
    cap = max_clusters
    cents = np.zeros((cap, f), np.float64)
    counts = np.zeros(cap, np.int64)
    ncent = 0
    assignments = np.full(n, -1, np.int64)

    for start in range(0, n, batch_size):
        Xb = X[start : start + batch_size]
        if ncent == 0:
            # Bootstrap with the sequential path on the first batch.
            out = _incremental_sequential(Xb, max_clusters, radius, sampler)
            c0 = out.centroids.shape[0]
            cents[:c0] = out.centroids
            counts[:c0] = out.sizes
            ncent = c0
            assignments[start : start + len(Xb)] = out.assignments
            continue

        dmin, didx = _batch_dists(
            jnp.asarray(Xb), jnp.asarray(cents, jnp.float32), jnp.int32(ncent), cap
        )
        dmin = np.asarray(dmin, np.float64)
        didx = np.asarray(didx)

        keep = (
            sampler.decide_batch(dmin, ncent, max_clusters)
            if sampler is not None
            else np.ones(len(Xb), bool)
        )

        # Every kept row with dmin > 0.5·radius routes to the sequential
        # create loop below (which re-checks against live state and falls
        # back to assign / soft-outlier there); the remaining kept rows all
        # have dmin ≤ 0.5·radius ≤ radius, so the vectorized path only ever
        # sees plain assignments — soft outliers are handled in the loop.
        create_mask = keep & (dmin > radius * CREATE_FACTOR)
        assign_mask = keep & ~create_mask & (dmin <= radius)

        # Assignments to existing clusters: online mean via grouped sums.
        aidx = didx[assign_mask]
        if aidx.size:
            rows = Xb[assign_mask].astype(np.float64)
            add = np.bincount(aidx, minlength=cap)
            sums = np.zeros((cap, f), np.float64)
            np.add.at(sums, aidx, rows)
            new_counts = counts + add
            upd = add > 0
            cents[upd] = (
                cents[upd] * counts[upd, None] + sums[upd]
            ) / new_counts[upd, None]
            counts = new_counts
            assignments[start + np.nonzero(assign_mask)[0]] = aidx

        # Creations: sequential within batch (order matters; they're few).
        for off in np.nonzero(create_mask)[0]:
            row = Xb[off].astype(np.float64)
            d2 = np.sum((cents[:ncent] - row) ** 2, axis=1)
            bi = int(np.argmin(d2))
            bd = float(d2[bi])
            if ncent < max_clusters and bd > radius * CREATE_FACTOR:
                cents[ncent] = row
                counts[ncent] = 1
                assignments[start + off] = ncent
                ncent += 1
            elif bd <= radius:
                counts[bi] += 1
                cents[bi] += (row - cents[bi]) / counts[bi]
                assignments[start + off] = bi
            elif bd <= radius * RELAX_FACTOR:
                counts[bi] += 1
                assignments[start + off] = bi

    if ncent == 0:
        raise ValueError("No clusters created from data (sampling too aggressive?)")
    return ClusteredOutput(
        centroids=cents[:ncent].astype(np.float32),
        assignments=assignments,
        sizes=counts[:ncent].copy(),
        radius=radius,
        n_items=n,
        n_features=f,
    )


def nearest_centroid(row: np.ndarray, centroids: np.ndarray) -> tuple[int, float]:
    """(index, squared distance) — clustering.rs:935-950."""
    d2 = np.sum((np.asarray(centroids, np.float64) - np.asarray(row, np.float64)) ** 2, axis=1)
    i = int(np.argmin(d2))
    return i, float(d2[i])
