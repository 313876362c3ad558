"""Stage A: incremental clustering with radius threshold + variance tracking.

Reference: ``/root/reference/surfface-core/src/clustering.rs`` (simpler
semantics than the legacy clusterer: assign if d² < r², create if capacity
remains, else force-assign to nearest) plus the GPU-batched distance path of
``surfface-pipeline/src/stages/clustering.rs`` (vectorized ``‖x-c‖²`` matmul
with a batch-size knob for N=10M scale).

TPU design: batches stream through a jitted assign kernel (one ``[B, C_cap]``
MXU matmul per batch against the padded centroid buffer); rows that fall
outside the radius are resolved sequentially on host (few per batch).
Variances are tracked per centroid with Welford online moments — replacing
the reference's external ``kalman_clustering`` crate — so Stage B gets real
diagonal variances, not the flat 0.1 initialization.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from matternet_rs_tpu.ops._mm import mm
from matternet_rs_tpu.pipeline.centroid import CentroidState
from matternet_rs_tpu.reduction import ImplicitProjection


def compute_jl_dimension(n_points: int, original_dim: int, epsilon: float) -> int:
    """``r = 8·ln(n)/ε²`` clamped to [32, F] (surfface-core/src/
    clustering.rs:113-123 — no high-D buffer in this generation)."""
    import math

    log_n = math.log(max(n_points, 1))
    jl_bound = math.ceil(8.0 * log_n / (epsilon ** 2))
    return int(min(max(jl_bound, 32), original_dim))


@dataclasses.dataclass(frozen=True)
class ClusteringConfig:
    """Reference defaults: clustering.rs:40-52."""

    max_clusters: int = 10_000
    radius_threshold: float = 1.0     # squared L2
    seed: Optional[int] = 42
    use_projection: bool = True
    projection_threshold: int = 1000
    jl_epsilon: float = 0.3
    min_projected_dim: int = 64
    batch_size: int = 4096            # surfface-pipeline stages/clustering.rs:9

    @classmethod
    def high_dimensional(cls) -> "ClusteringConfig":
        return cls(radius_threshold=1.5, min_projected_dim=128)


@dataclasses.dataclass
class ClusteringOutput:
    state: CentroidState
    assignments: np.ndarray           # [N] int (always assigned in stage A)
    num_items: int
    original_dim: int
    working_dim: int
    projection: Optional[ImplicitProjection]
    # The projected [N, working_dim] rows (== input when no projection):
    # stage D consumes this directly instead of re-projecting all N rows.
    working: Optional[np.ndarray] = None


@functools.partial(jax.jit, static_argnames=("cap",))
def _assign_batch(Xb, cents, ncent, cap):
    """Min-d² + argmin of batch rows vs the first ``ncent`` padded centroids."""
    d = (
        jnp.sum(Xb * Xb, axis=-1, keepdims=True)
        + jnp.sum(cents * cents, axis=-1)[None, :]
        - 2.0 * mm(Xb, cents.T)
    )
    mask = jnp.arange(cap)[None, :] < ncent
    d = jnp.where(mask, jnp.maximum(d, 0.0), jnp.inf)
    return jnp.min(d, axis=1), jnp.argmin(d, axis=1)


class ClusteringStage:
    def __init__(self, config: ClusteringConfig | None = None):
        self.config = config or ClusteringConfig()

    def execute(self, rows) -> ClusteringOutput:
        cfg = self.config
        X = np.asarray(rows, np.float32)
        n, f = X.shape

        # Optional early JL projection (clustering.rs:166-204).
        projection = None
        working = X
        working_dim = f
        if cfg.use_projection and f > cfg.projection_threshold:
            jl_dim = compute_jl_dimension(n, f, cfg.jl_epsilon)
            target = max(min(jl_dim, f // 2), cfg.min_projected_dim)
            projection = ImplicitProjection(f, target, cfg.seed or 42)
            working = np.asarray(projection.project(X))
            working_dim = target

        cents, assignments, counts, m2 = self._incremental(working)

        c = len(cents)
        # Welford M2 → variance (unbiased by count, floor 0); singleton
        # clusters fall back to the reference's 0.1 initialization.
        var = np.where(
            counts[:, None] > 1,
            m2 / np.maximum(counts[:, None], 1),
            0.1,
        ).astype(np.float32)

        state = CentroidState(
            means=jnp.asarray(cents, jnp.float32),
            variances=jnp.asarray(var),
            counts=jnp.asarray(counts, jnp.int32),
        )
        return ClusteringOutput(
            state=state,
            assignments=assignments,
            num_items=n,
            original_dim=f,
            working_dim=working_dim,
            projection=projection,
            working=working,
        )

    # ------------------------------------------------------------------
    def _incremental(self, X: np.ndarray):
        """Radius-gated scan (clustering.rs:240-309) with batched device
        distances and Welford variance accumulation. Fast path: the native
        C++ scan (native/clustering.cpp, mode="stage_a")."""
        from matternet_rs_tpu import native as native_mod

        cfg = self.config
        out = native_mod.incremental_cluster(
            X, min(cfg.max_clusters, X.shape[0]), cfg.radius_threshold, "stage_a"
        )
        if out is not None:
            return out
        n, f = X.shape
        cap = min(cfg.max_clusters, n)
        cents = np.zeros((cap, f), np.float64)
        m2 = np.zeros((cap, f), np.float64)       # Welford sum of squared devs
        counts = np.zeros(cap, np.int64)
        assignments = np.zeros(n, np.int64)
        ncent = 0

        def add_point(ci: int, row: np.ndarray):
            counts[ci] += 1
            delta = row - cents[ci]
            cents[ci] += delta / counts[ci]
            m2[ci] += delta * (row - cents[ci])

        def create(row: np.ndarray) -> int:
            nonlocal ncent
            cents[ncent] = row
            counts[ncent] = 1
            ci = ncent
            ncent += 1
            return ci

        assignments[0] = create(X[0].astype(np.float64))

        # Sequential live-centroid scan — IDENTICAL decisions to the native
        # C++ path (clustering.cpp mode="stage_a"), so toolchain-free hosts
        # produce the same clustering (a batch-snapshot fallback here used
        # to silently diverge from native: snapshot argmin vs live
        # centroids and near-before-far reordering both change the
        # order-dependent online means).
        for i in range(1, n):
            row = X[i].astype(np.float64)
            d2 = np.sum((cents[:ncent] - row) ** 2, axis=1)
            bi = int(np.argmin(d2))
            bd = float(d2[bi])
            if bd < cfg.radius_threshold:
                add_point(bi, row)
                assignments[i] = bi
            elif ncent < cap:
                assignments[i] = create(row)
            else:
                # Budget exhausted: force-assign (clustering.rs:289-293).
                add_point(bi, row)
                assignments[i] = bi

        return (
            cents[:ncent].astype(np.float32),
            assignments,
            counts[:ncent].copy(),
            m2[:ncent],
        )
