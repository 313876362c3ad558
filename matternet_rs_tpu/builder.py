"""ArrowSpaceBuilder: the fluent build API (eigen pipeline).

Rebuilds the reference builder (``/root/reference/surfface-pipeline/src/
builder.rs:52-1080``): config surface (λ-graph eps/k/topk/p/σ, normalise,
sampling, synthesis TauMode, cluster overrides, JL reduction, persistence),
clustering front-end, and the 4-stage eigen build:

  1. optimal-K incremental clustering with inline sampling (+ optional JL),
  2. feature-space Laplacian from centroids,
  3. optional F×F spectral "signals" Laplacian,
  4. taumode λ + normalization + sorted-λ index.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from pathlib import Path
from typing import Optional

import numpy as np

from matternet_rs_tpu import clustering as clus
from matternet_rs_tpu import eigenmaps as em
from matternet_rs_tpu.core import ArrowSpace, TAUDEFAULT, TauMode
from matternet_rs_tpu.graph import GraphLaplacian, GraphParams
from matternet_rs_tpu.reduction import (
    ImplicitProjection,
    compute_jl_dimension,
    project_matrix,
)
from matternet_rs_tpu.sampling import InlineSampler, make_sampler

log = logging.getLogger(__name__)


@dataclasses.dataclass
class ArrowSpaceBuilder:
    """Fluent builder (defaults mirror builder.rs:95-125)."""

    # λ-graph parameters
    lambda_eps: float = 1e-3
    lambda_k: int = 6
    lambda_topk: int = 3
    lambda_p: float = 2.0
    lambda_sigma: Optional[float] = None
    normalise: bool = False
    sparsity_check: bool = False

    # synthetic index
    synthesis: TauMode = TAUDEFAULT
    prebuilt_spectral: bool = False

    # sampling: (kind, rate); reference default Simple(0.6)
    sampling: Optional[tuple[str, float]] = ("simple", 0.6)

    # clustering
    cluster_max_clusters: Optional[int] = None
    cluster_radius: float = 1.0
    clustering_seed: Optional[int] = None
    deterministic_clustering: bool = False

    # dimensionality reduction
    use_dims_reduction: bool = False
    rp_eps: float = 0.3

    # persistence (name, dir)
    persistence: Optional[tuple[str, Path]] = None

    # ---------------- fluent config (builder.rs:629-779) ----------------
    def with_lambda_graph(
        self, eps: float, k: int, p: float = 2.0, sigma: Optional[float] = None
    ) -> "ArrowSpaceBuilder":
        self.lambda_eps, self.lambda_k = eps, k
        self.lambda_p, self.lambda_sigma = p, sigma
        return self

    def with_synthesis(self, taumode: TauMode) -> "ArrowSpaceBuilder":
        self.synthesis = taumode
        return self

    def with_spectral(self, enabled: bool = True) -> "ArrowSpaceBuilder":
        self.prebuilt_spectral = enabled
        return self

    def with_normalisation(self, enabled: bool) -> "ArrowSpaceBuilder":
        self.normalise = enabled
        return self

    def with_sparsity_check(self, enabled: bool) -> "ArrowSpaceBuilder":
        self.sparsity_check = enabled
        return self

    def with_sampling(self, kind_rate: Optional[tuple[str, float]]) -> "ArrowSpaceBuilder":
        self.sampling = kind_rate
        return self

    def with_cluster_params(
        self, max_clusters: Optional[int] = None, radius: Optional[float] = None
    ) -> "ArrowSpaceBuilder":
        if max_clusters is not None:
            self.cluster_max_clusters = max_clusters
        if radius is not None:
            self.cluster_radius = radius
            # Remember the radius was user-set: the heuristic-k path must
            # not overwrite it (a radius without max_clusters used to be
            # silently ignored).
            self._radius_user_set = True
        return self

    def with_seed(self, seed: int) -> "ArrowSpaceBuilder":
        self.clustering_seed = seed
        return self

    def with_deterministic_clustering(self, enabled: bool = True) -> "ArrowSpaceBuilder":
        self.deterministic_clustering = enabled
        return self

    def with_dims_reduction(self, enabled: bool, rp_eps: float = 0.3) -> "ArrowSpaceBuilder":
        self.use_dims_reduction = enabled
        self.rp_eps = rp_eps
        return self

    def with_persistence(self, name: str, path) -> "ArrowSpaceBuilder":
        self.persistence = (name, Path(path))
        return self

    def with_expected_items(self, n: int) -> "ArrowSpaceBuilder":
        """Dataset-size hint used by EnergyParams' adaptive 2√N optical-token
        rule before build (reference: energymaps.rs:97-120)."""
        self.nitems = int(n)
        return self

    # ---------------- helpers ----------------
    def graph_params(self) -> GraphParams:
        return GraphParams(
            eps=self.lambda_eps,
            k=self.lambda_k,
            topk=self.lambda_topk,
            p=self.lambda_p,
            sigma=self.lambda_sigma,
            normalise=self.normalise,
            sparsity_check=self.sparsity_check,
        )

    def define_result_k(self) -> None:
        """topk heuristic for small k (builder.rs:785-793)."""
        if self.lambda_k <= 5:
            self.lambda_topk = 3
        elif self.lambda_k < 10:
            self.lambda_topk = 4

    # ---------------- Stage 1: clustering (builder.rs:128-273) ----------
    def _cluster_working(
        self, aspace: ArrowSpace, working: np.ndarray
    ) -> np.ndarray:
        """Shared clustering core: sampler → optimal-k heuristics →
        incremental clustering, all in ``working``'s space (which may be
        the raw feature space or a JL-reduced one)."""
        n_items = working.shape[0]
        sampler: Optional[InlineSampler] = None
        if n_items > 1000 and self.sampling is not None:
            kind, rate = self.sampling
            sampler = make_sampler(kind, rate, seed=self.clustering_seed or 0)

        if self.cluster_max_clusters is not None:
            k_opt, radius = self.cluster_max_clusters, self.cluster_radius
        else:
            if self.clustering_seed is None:
                raise ValueError("clustering_seed must be set for full heuristics")
            k_opt, radius, _ = clus.compute_optimal_k(working, self.clustering_seed)
            if getattr(self, "_radius_user_set", False):
                radius = self.cluster_radius      # user radius + heuristic k
            self.cluster_max_clusters, self.cluster_radius = k_opt, radius

        out = clus.incremental_clustering(
            working,
            max_clusters=k_opt,
            radius=radius,
            sampler=sampler,
            deterministic=self.deterministic_clustering or n_items <= 4096,
        )

        aspace.n_clusters = len(out.centroids)
        aspace.cluster_assignments = out.assignments
        aspace.cluster_sizes = out.sizes
        aspace.cluster_radius = radius
        return out.centroids

    def start_clustering(
        self, rows: np.ndarray, device_rows=None
    ) -> tuple[ArrowSpace, np.ndarray]:
        rows = np.asarray(rows, np.float32)
        n_items, n_features = rows.shape
        if device_rows is not None:
            # Reuse an already-resident device copy of the SAME corpus
            # (see :meth:`build`): from_items' jnp.asarray is a no-op on
            # a jax array, skipping the dominant H2D upload. Shape/dtype
            # are validated; content equality is the caller's contract.
            if tuple(device_rows.shape) != (n_items, n_features):
                raise ValueError(
                    f"device_rows shape {tuple(device_rows.shape)} != "
                    f"rows shape {(n_items, n_features)}"
                )
            if device_rows.dtype != np.float32:
                # from_items would upcast, but a bf16 (or downcast-f64)
                # device copy has already lost the values of `rows` — the
                # content-equality contract below can't hold, and the
                # index would silently build from rounded data.
                raise ValueError(
                    f"device_rows dtype {device_rows.dtype} != float32: "
                    "device_rows must be the float32 device copy of rows "
                    "(a reduced-precision copy no longer equals rows)"
                )
            aspace = ArrowSpace.from_items(device_rows, self.synthesis)
        else:
            aspace = ArrowSpace.from_items(rows, self.synthesis)
        centroids = self._cluster_working(aspace, rows)
        # Optional JL projection of centroids (builder.rs:230-262).
        if self.use_dims_reduction and n_features > 64:
            jl_dim = compute_jl_dimension(aspace.n_clusters, n_features, self.rp_eps)
            target = min(jl_dim, n_features // 2)
            if target < n_features and target > centroids.shape[0]:
                proj = ImplicitProjection(
                    n_features, target,
                    # seed 0 is a valid user seed — only None means unset
                    # (the reference passes clustering_seed verbatim,
                    # builder.rs:240).
                    42 if self.clustering_seed is None else self.clustering_seed,
                )
                centroids = np.asarray(project_matrix(centroids, proj))
                aspace.projection = proj
                aspace.reduced_dim = target
        return aspace, centroids

    def start_clustering_dim_reduce(
        self, rows: np.ndarray
    ) -> tuple[ArrowSpace, np.ndarray]:
        """Early-JL clustering front-end: project ALL rows to the JL
        dimension first, then run optimal-k + incremental clustering in the
        reduced space (reference ``start_clustering_dim_reduce``,
        surfface-pipeline/src/builder.rs:277-430 — its "fast clustering" for
        huge F, e.g. Dorothea-style 100k-dim sparse data).

        Contrast with :meth:`start_clustering`, which clusters in the raw
        space and JL-projects only the centroids afterwards
        (builder.rs:230-262). Here the O(N·F·k) distance work of the
        optimal-k sweep and the clustering itself happens in r ≪ F dims;
        the projection is one MXU matmul (blocked over rows so the working
        set stays bounded at huge F). The ArrowSpace keeps the ORIGINAL
        rows; centroids come back in the reduced space, and the seed-only
        projection is stored on the space so queries can be projected.
        """
        rows = np.asarray(rows, np.float32)
        n_items, n_features = rows.shape
        aspace = ArrowSpace.from_items(rows, self.synthesis)

        working = rows
        if self.use_dims_reduction and n_features > 1000:
            jl_dim = compute_jl_dimension(n_items, n_features, self.rp_eps)
            # builder.rs:294: target = clamp(jl_dim, 64, F/2)
            target = max(min(jl_dim, n_features // 2), 64)
            proj = ImplicitProjection(
                n_features, target,
                42 if self.clustering_seed is None else self.clustering_seed,
            )
            # Blocked projection: bound the on-device input slab to ~64 MB
            # regardless of F (at F=100k a full [N,F] upload would be
            # N·400 KB; the row blocks keep peak memory flat).
            blk = max(1, (16 << 20) // max(n_features, 1))
            parts = [
                np.asarray(project_matrix(rows[i:i + blk], proj))
                for i in range(0, n_items, blk)
            ]
            working = np.concatenate(parts, axis=0)
            aspace.projection = proj
            aspace.reduced_dim = target
            log.info(
                "early JL projection: %d → %d dims (ε=%.2f, %.1fx compression)",
                n_features, target, self.rp_eps, n_features / target,
            )

        centroids = self._cluster_working(aspace, working)
        return aspace, centroids

    # ---------------- Build (builder.rs:831-1080) ------------------------
    def build(self, rows, device_rows=None) -> tuple[ArrowSpace, GraphLaplacian]:
        """Full eigen build. ``device_rows`` optionally passes an
        already-device-resident jax array with the SAME content as
        ``rows`` (e.g. ``prev_aspace.data`` when re-building with new
        graph/λ params over the same corpus): the index then reuses it
        instead of re-uploading the corpus. On remote-attached TPUs the
        host→device transfer is the dominant warm-build cost (measured
        ~43 MB/s through the tunnel: 1.2 s of a ~1.7 s warm 100k×128
        build), so parameter-sweep rebuilds skip it entirely. The host
        ``rows`` are still required — the exact sequential clustering
        scan is a host-native kernel."""
        from matternet_rs_tpu.utils.profiling import StageTimer

        rows = np.asarray(rows, np.float32)
        n_items = rows.shape[0]
        t0 = time.time()
        self.define_result_k()

        self._persist_dense("raw_input", rows)

        # One INFO line per stage with wall-clock + items/sec (the
        # reference's per-stage banners and throughput lines,
        # taumode.rs:218-222 / laplacian.rs:141-198).
        timer = StageTimer()

        # Stage 1: clustering (+ optional JL)
        with timer.stage("clustering", items=n_items):
            aspace, centroids = self.start_clustering(
                rows, device_rows=device_rows
            )
        self._persist_dense("clustered-dm", centroids)
        self._persist_dense("laplacian-input", centroids)

        # Stage 2 (+3): Laplacian from centroids, optional spectral signals
        with timer.stage("laplacian", items=int(centroids.shape[1])):
            gl = em.eigenmaps(aspace, self, centroids, n_items)
            import jax as _jax

            _jax.block_until_ready(
                gl.ell().weights if gl.is_ell_backed else gl.matrix
            )
        # NOTE: device→host pulls are gated behind the persistence check —
        # evaluating np.asarray(...) as a call argument forces a D2H even
        # when persistence is off, and the remote transport charges a large
        # fixed cost for the first materialization of a jit output.
        if self.persistence is not None:
            self._persist_sparse("gl-matrix", np.asarray(gl.dense()))
            if self.prebuilt_spectral and aspace.signals is not None:
                self._persist_sparse("aspace-signals", np.asarray(aspace.signals))

        # Stage 4: taumode λ + sorted index
        with timer.stage("taumode", items=n_items):
            aspace.compute_taumode(gl)
        with timer.stage("sorted-index", items=n_items):
            aspace.build_lambdas_sorted()
        self._persist_lambdas(aspace)
        self.last_stage_timings = timer.as_dict()

        log.info(
            "ArrowSpace build complete: %d items, %d centroids, %.3fs",
            n_items, aspace.n_clusters, time.time() - t0,
        )
        return aspace, gl

    def build_for_persistence(
        self, rows, pipeline: str = "eigen", energy_params=None
    ) -> tuple[ArrowSpace, GraphLaplacian]:
        """Pipeline-selecting build (reference ``build_for_persistence``,
        builder.rs:1083-1461: ``Pipeline::{Eigen, Energy, Default}``)."""
        if pipeline in ("eigen", "default"):
            return self.build(rows)
        if pipeline == "energy":
            return self.build_energy(rows, energy_params)
        raise ValueError(f"unknown pipeline {pipeline!r} (eigen|energy|default)")

    def build_energy(self, rows, energy_params=None):
        """Energy-pipeline build (reference ``build_for_persistence`` with
        ``Pipeline::Energy``, builder.rs:1083-1461 → energymaps.rs:1116)."""
        from matternet_rs_tpu import energymaps as em_energy

        aspace, gl = em_energy.build_energy(self, rows, energy_params)
        if self.persistence is not None:
            self._persist_dense("raw_input", np.asarray(aspace.data))
            self._persist_sparse("gl-matrix", np.asarray(gl.dense()))
            self._persist_lambdas(aspace)
        return aspace, gl

    # ---------------- persistence hooks ----------------------------------
    def _persist_dense(self, tag: str, arr: np.ndarray) -> None:
        if self.persistence is None:
            return
        from matternet_rs_tpu.storage import parquet as pq

        name, path = self.persistence
        pq.save_dense_matrix(arr, path, f"{name}-{tag}", builder=self)

    def _persist_sparse(self, tag: str, arr: np.ndarray) -> None:
        if self.persistence is None:
            return
        from matternet_rs_tpu.storage import parquet as pq

        name, path = self.persistence
        pq.save_sparse_matrix(arr, path, f"{name}-{tag}", builder=self)

    def _persist_lambdas(self, aspace: ArrowSpace) -> None:
        if self.persistence is None:
            return
        from matternet_rs_tpu.storage import parquet as pq

        name, path = self.persistence
        pq.save_lambdas(np.asarray(aspace.lambdas), path, f"{name}-lambdas", builder=self)
        pq.save_arrowspace_metadata(aspace, self, path, name)
