"""Surfface staged pipeline: A → B0 → B1 → B2 → C → D.

The reference's "new generation" architecture (``/root/reference/
surfface-core``): Stage A incremental clustering (+ JL), B0 preflight, B1
thickness-weighted MST skeleton, B2 Kalman RTS smoothing along the MST
order, C Bhattacharyya feature-space Laplacian, D batched spectral λ
(Rayleigh + Dirichlet). The numeric stages are jitted dense device ops;
the tree algorithms run on host at centroid scale.
"""

from matternet_rs_tpu.pipeline.centroid import CentroidState
from matternet_rs_tpu.pipeline.clustering import ClusteringConfig, ClusteringStage
from matternet_rs_tpu.pipeline.preflight import PreflightConfig, PreflightStage
from matternet_rs_tpu.pipeline.mst import MSTConfig, MSTStage
from matternet_rs_tpu.pipeline.smoothing import SmoothingConfig, SmoothingStage
from matternet_rs_tpu.pipeline.laplacian import LaplacianConfig, LaplacianStage
from matternet_rs_tpu.pipeline.spectral import compute_lambdas, compute_tau_mode
from matternet_rs_tpu.pipeline.taumode import TauMode, compute_tau
from matternet_rs_tpu.pipeline.run import PipelineConfig, PipelineResult, build

__all__ = [
    "CentroidState",
    "ClusteringConfig", "ClusteringStage",
    "PreflightConfig", "PreflightStage",
    "MSTConfig", "MSTStage",
    "SmoothingConfig", "SmoothingStage",
    "LaplacianConfig", "LaplacianStage",
    "compute_lambdas", "compute_tau_mode",
    "TauMode", "compute_tau",
    "PipelineConfig", "PipelineResult", "build",
]
