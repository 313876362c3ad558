"""matternet_rs_tpu — TPU-native spectral graph-wiring vector index.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
``tuned-org-uk/matternet-rs`` ("surfface"/"arrowspace") reference:

* ingest ``[N, F]`` embedding matrices,
* compress to centroids (incremental / k-means clustering, JL projection),
* wire a graph over the data (kNN cosine kernel / MST / Bhattacharyya),
* build graph Laplacians (``L = D - W`` and symmetric-normalized),
* compute a per-item synthetic spectral score λ ("taumode lambda") blending a
  Rayleigh quotient energy with a Dirichlet dispersion measure,
* search by blended cosine + λ-proximity (eigenmaps) or pure λ-distance over
  a diffused energy graph (energymaps),
* extract graph motifs, hierarchical centroid subgraphs, spectral
  sparsification, and persist to Parquet.

Design stance (TPU-first, not a port):

* All pairwise-distance / kNN / Laplacian / λ computations are dense, batched,
  MXU-friendly matmuls — the graphs here are feature- or centroid-scale
  (F, C ≲ a few thousand), where dense [F, F] linear algebra on the MXU beats
  any sparse CPU structure by orders of magnitude.
* The dispersion measure G (an O(F²) edge scan per item in the reference,
  ``src_legacy/taumode.rs:366-408``) is computed in closed form from six
  ``[N, F] × [F, F]`` matmuls — see :mod:`matternet_rs_tpu.ops.taumode`.
* Sequential cores (Kalman RTS, Borůvka MST, incremental clustering) use
  ``lax.scan`` / host orchestration at centroid scale.
* Distribution is mesh-sharded data parallelism over the item axis N with
  all-gather top-k merge for queries — see :mod:`matternet_rs_tpu.parallel`.
"""

from matternet_rs_tpu.graph import GraphParams, GraphLaplacian
from matternet_rs_tpu.core import ArrowSpace, TauMode, TAU_FLOOR
from matternet_rs_tpu.builder import ArrowSpaceBuilder
from matternet_rs_tpu import backend, eigenmaps

__version__ = "0.2.0"


def init(level: int | str = "INFO") -> None:
    """One-time logging init (reference: surfface_core::init(),
    surfface-core/src/lib.rs:30-44 — env_logger equivalent)."""
    import logging

    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )

__all__ = [
    "GraphParams",
    "GraphLaplacian",
    "ArrowSpace",
    "TauMode",
    "TAU_FLOOR",
    "ArrowSpaceBuilder",
    "backend",
    "eigenmaps",
]
