"""Model families: high-level fit/query façades over the three pipelines.

The reference exposes its "model families" through builder plumbing
(``ArrowSpaceBuilder::build_legacy`` / ``build_for_persistence(Energy)`` /
the staged surfface chain). These façades give each family a uniform
``fit(X) → query(q, k)`` surface:

* :class:`EigenIndex`   — the canonical λτ-graph index (eigenmaps path),
* :class:`EnergyIndex`  — the cosine-free energy index (energymaps path),
* :class:`SurffaceModel`— the staged A→D pipeline (centroid skeleton +
  Kalman smoothing + stage-D spectral λ).
"""

from matternet_rs_tpu.models.families import EigenIndex, EnergyIndex, SurffaceModel

__all__ = ["EigenIndex", "EnergyIndex", "SurffaceModel"]
