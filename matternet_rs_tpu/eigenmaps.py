"""EigenMaps staged API: centroids → Laplacian → taumode λ → search.

Reference: ``/root/reference/src_legacy/eigenmaps.rs`` (trait decomposing the
build into stages so callers can run them independently and must get results
identical to the monolithic builder — the staged-vs-monolithic equivalence is
covered by tests, mirroring test_eigenmaps.rs:105-429).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax.numpy as jnp

from matternet_rs_tpu.core import ArrowSpace
from matternet_rs_tpu.graph import GraphLaplacian
from matternet_rs_tpu.ops import laplacian as lap_ops

if TYPE_CHECKING:
    from matternet_rs_tpu.builder import ArrowSpaceBuilder


def eigenmaps(
    aspace: ArrowSpace, builder: "ArrowSpaceBuilder", centroids, n_items: int
) -> GraphLaplacian:
    """Stage 2: build the feature-space Laplacian from ``[C, F]`` centroids
    (eigenmaps.rs:133-199). Optionally builds the second-order F×F spectral
    "signals" Laplacian when ``builder.prebuilt_spectral`` is set."""
    centroids = jnp.asarray(centroids, jnp.float32)
    gl = lap_ops.build_laplacian_from_k_cluster(
        centroids, builder.graph_params(), n_items=n_items
    )
    if builder.prebuilt_spectral:
        aspace.signals = lap_ops.build_spectral_laplacian(gl, n_items)
    return gl


def compute_taumode(aspace: ArrowSpace, gl: GraphLaplacian) -> None:
    """Stage 4: per-item synthetic λ + normalization (eigenmaps.rs:199-227)."""
    aspace.compute_taumode(gl)


def search(
    aspace: ArrowSpace, item, gl: GraphLaplacian, k: int, alpha: float = 0.7
) -> list[tuple[int, float]]:
    """Query: prepare λ then λ-aware ranking (eigenmaps.rs:229-260)."""
    q_lambda = aspace.prepare_query_item(item, gl)
    return aspace.search_lambda_aware(item, q_lambda, k, alpha)
