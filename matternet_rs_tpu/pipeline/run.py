"""Pipeline orchestrator: the full staged chain A → B0 → B1 → B2 → C → D.

Reference intent: ``surfface-pipeline/src/lib.rs:32-75`` (which the
reference ships half-stubbed — stages C/D noted as TODO at lib.rs:70-74;
the full chain is exercised in its tests, test_spectral.rs:47-86). Here the
whole chain runs for real.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Optional

import numpy as np

from matternet_rs_tpu.pipeline.centroid import CentroidState
from matternet_rs_tpu.pipeline.clustering import ClusteringConfig, ClusteringStage
from matternet_rs_tpu.pipeline.laplacian import (
    LaplacianConfig,
    LaplacianOutput,
    LaplacianStage,
)
from matternet_rs_tpu.pipeline.mst import MSTConfig, MSTOutput, MSTStage
from matternet_rs_tpu.pipeline.preflight import PreflightConfig, PreflightStage
from matternet_rs_tpu.pipeline.smoothing import (
    KalmanOutput,
    SmoothingConfig,
    SmoothingStage,
)
from matternet_rs_tpu.pipeline import spectral
from matternet_rs_tpu.pipeline.taumode import TauMode, compute_tau

log = logging.getLogger(__name__)


@dataclasses.dataclass
class PipelineConfig:
    clustering: ClusteringConfig = dataclasses.field(default_factory=ClusteringConfig)
    preflight: PreflightConfig = dataclasses.field(default_factory=PreflightConfig)
    mst: MSTConfig = dataclasses.field(default_factory=MSTConfig)
    smoothing: SmoothingConfig = dataclasses.field(default_factory=SmoothingConfig)
    laplacian: LaplacianConfig = dataclasses.field(default_factory=LaplacianConfig)
    taumode: TauMode = dataclasses.field(default_factory=TauMode.median)


@dataclasses.dataclass
class PipelineResult:
    state: CentroidState                 # smoothed centroid state (B2 output)
    # [N] item → ORIGINAL stage-A centroid id. NB: `state` rows are in MST
    # traversal order (row t ↔ centroid kalman.order[t]) — index `state`
    # with `centroid_positions`, not `assignments`.
    assignments: np.ndarray
    # [N] item → row of `state` (assignments mapped through the inverse of
    # kalman.order), so `state.means[centroid_positions[i]]` IS item i's
    # smoothed centroid.
    centroid_positions: np.ndarray
    mst: MSTOutput
    kalman: KalmanOutput
    laplacian: LaplacianOutput
    lambdas: np.ndarray                  # [N] stage-D λ per item
    tau: float                           # τ resolved from the λ distribution
    timings: dict[str, float]


def build(
    rows, config: Optional[PipelineConfig] = None, mesh=None,
) -> PipelineResult:
    """Run the full staged pipeline on ``[N, F]`` data.

    ``mesh``: optional ``jax.sharding.Mesh`` — stage D (the only N-scaling
    stage; everything else is centroid-scale) then shards the item axis
    across the mesh with the F×F Laplacian replicated. λ scoring is
    zero-communication DP, so the result is bit-identical to the
    single-device run (determinism-tested)."""
    cfg = config or PipelineConfig()
    X = np.asarray(rows, np.float32)
    timings: dict[str, float] = {}

    # Hardware telemetry at pipeline entry (surfface-pipeline/src/lib.rs:7-26
    # prints backend info before dispatching stages).
    from matternet_rs_tpu import backend as _backend

    _backend.print_backend_info()

    def timed(name, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        timings[name] = time.perf_counter() - t0
        log.info("stage %s: %.3fs", name, timings[name])
        return out

    # Stage A: clustering (+ JL) with variance tracking.
    a_out = timed("A:clustering", ClusteringStage(cfg.clustering).execute, X)

    # Stage B0: preflight.
    b0 = timed("B0:preflight", PreflightStage(cfg.preflight).execute, a_out.state)
    state = CentroidState(
        means=b0.normalized_centroids,
        variances=b0.variances,
        counts=a_out.state.counts,
    )

    # Stage B1: MST skeleton.
    mst = timed("B1:mst", MSTStage(cfg.mst).execute, state)

    # Stage B2: Kalman RTS smoothing along the MST order.
    kalman = timed("B2:kalman", SmoothingStage(cfg.smoothing).execute, state, mst)
    smoothed = kalman.to_centroid_state()

    # Stage C: feature-space Laplacian.
    lap = timed("C:laplacian", LaplacianStage(cfg.laplacian).execute, smoothed)

    # Stage D: batched spectral λ for all items (in working dim). Stage A
    # already projected the rows — reuse them (re-projecting is an
    # O(N·F·r) matmul on the only N-scaling stage).
    work = a_out.working if a_out.working is not None else X
    if mesh is not None:
        lambdas = timed(
            "D:spectral", _compute_tau_mode_sharded, mesh, lap, work
        )
    else:
        lambdas = timed(
            "D:spectral", spectral.compute_tau_mode, lap, work,
            work.shape[0], work.shape[1],
        )
    tau = compute_tau(lambdas, cfg.taumode)

    # Map stage-A centroid ids to rows of the (MST-ordered) smoothed state.
    order = np.asarray(kalman.order, np.int64)
    pos_of = np.empty_like(order)
    pos_of[order] = np.arange(len(order))

    return PipelineResult(
        state=smoothed,
        assignments=a_out.assignments,
        centroid_positions=pos_of[np.asarray(a_out.assignments, np.int64)],
        mst=mst,
        kalman=kalman,
        laplacian=lap,
        lambdas=lambdas,
        tau=tau,
        timings=timings,
    )


def _compute_tau_mode_sharded(mesh, lap, work) -> np.ndarray:
    """Stage D over a device mesh: rows sharded, F×F Laplacian replicated
    (GSPMD keeps all seven matmuls shard-local)."""
    from matternet_rs_tpu.parallel.mesh import replicate, shard_items

    n = work.shape[0]
    Xs = shard_items(mesh, np.asarray(work, np.float32))
    Ls = replicate(mesh, lap.matrix)
    # Padded rows contribute zero edge energy, so the kernel's global
    # Dirichlet total (an automatic psum under GSPMD) is unchanged.
    lam = spectral.compute_lambdas(Ls, Xs)
    return np.asarray(lam)[:n]


def save_result(result: PipelineResult, path, name: str = "pipeline") -> None:
    """Persist the staged-pipeline artifacts (centroid state, Laplacian, λ,
    MST order) — the surfface analogue of the legacy builder's stage dumps."""
    from matternet_rs_tpu.storage import parquet as pq

    pq.save_dense_matrix(np.asarray(result.state.means), path, f"{name}-means")
    pq.save_dense_matrix(
        np.asarray(result.state.variances), path, f"{name}-variances"
    )
    pq.save_sparse_matrix(
        np.asarray(result.laplacian.matrix), path, f"{name}-laplacian"
    )
    pq.save_lambdas(result.lambdas, path, f"{name}-lambdas")
    pq.save_dense_matrix(
        result.mst.centroid_order[:, None].astype(np.float64), path,
        f"{name}-order",
    )


def load_result_arrays(path, name: str = "pipeline") -> dict:
    """Load the persisted artifacts back as arrays (resume building blocks)."""
    from matternet_rs_tpu.storage import parquet as pq
    from pathlib import Path

    base = Path(path)
    return {
        "means": pq.load_dense_matrix(base / f"{name}-means.parquet"),
        "variances": pq.load_dense_matrix(base / f"{name}-variances.parquet"),
        "laplacian": pq.load_sparse_matrix(base / f"{name}-laplacian.parquet"),
        "lambdas": pq.load_lambdas(base / f"{name}-lambdas.parquet"),
        "order": pq.load_dense_matrix(base / f"{name}-order.parquet")[:, 0].astype(int),
    }
