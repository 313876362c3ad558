"""Sorted-λ index: argsort + searchsorted band queries.

TPU-native replacement for the reference's ``SortedLambdas``
``BTreeMap<OrderedFloat, Vec<(idx, id)>>`` (``/root/reference/src_legacy/
sorted_index.rs``): one ``argsort`` at build time, ``searchsorted`` for band
range queries, and an expanding-window k-nearest-by-λ. Ties inside equal-λ
buckets are ordered by item index, matching the reference's id-lexicographic
order for auto-assigned string ids up to string-vs-numeric ordering of
indices ≥ 10 (documented divergence: we use numeric order, which is the
saner deterministic tie-break).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _build_sorted_jit(lam: jax.Array):
    order = jnp.argsort(lam, stable=True)
    mean = jnp.mean(lam)
    std = jnp.sqrt(jnp.mean((mean - lam) ** 2))
    return lam[order], order.astype(jnp.int32), std


@dataclasses.dataclass
class SortedLambdas:
    """Immutable sorted view over per-item λ (assumed normalized to [0,1]).

    ``build_from`` accepts numpy or device arrays; ``build_on_device`` sorts
    with ``jnp.argsort`` on the accelerator and defers the (potentially
    expensive) device→host materialization until a host-side query needs it.
    """

    sorted_lambdas: np.ndarray      # [N] ascending
    sorted_indices: np.ndarray      # [N] item index per position
    std_dev: float

    @classmethod
    def build_from(cls, lambdas: np.ndarray) -> "SortedLambdas":
        lambdas = np.asarray(lambdas, dtype=np.float64)
        if lambdas.size == 0:
            raise ValueError("cannot build sorted index from empty lambdas")
        # Stable sort ⇒ equal-λ ties keep ascending item index.
        order = np.argsort(lambdas, kind="stable")
        # f32 std-dev around f32 mean, matching std_deviation
        # (src_legacy/laplacian.rs:431-448).
        mean32 = np.float32(lambdas.sum()) / np.float32(lambdas.size)
        var32 = np.mean((mean32 - lambdas.astype(np.float32)) ** 2, dtype=np.float32)
        return cls(
            sorted_lambdas=lambdas[order],
            sorted_indices=order.astype(np.int64),
            std_dev=float(np.sqrt(var32)),
        )

    @classmethod
    def build_on_device(cls, lambdas) -> "DeviceSortedLambdas":
        return DeviceSortedLambdas.build_from(lambdas)

    def to_vec(self) -> list[tuple[float, int]]:
        return [
            (float(l), int(i))
            for l, i in zip(self.sorted_lambdas, self.sorted_indices)
        ]

    def zadd(self, item_index: int, lam: float) -> None:
        """Single sorted insert (reference ``SortedLambdas::zadd``,
        sorted_index.rs:22-29). Equal-λ ties append after existing entries,
        matching the BTreeMap bucket-push order. std_dev is NOT updated
        (same contract as the reference — it is fixed at build time)."""
        pos = int(np.searchsorted(self.sorted_lambdas, lam, side="right"))
        self.sorted_lambdas = np.insert(self.sorted_lambdas, pos, lam)
        self.sorted_indices = np.insert(self.sorted_indices, pos, item_index)

    def range_bylambda(self, lambda_q: float, k: int, p: float) -> list[tuple[int, float]]:
        """Band query: all items with λ ∈ [λq - band, λq + band], band =
        std/2^p, truncated to the first k in ascending-λ order
        (sorted_index.rs:64-80)."""
        band = self.std_dev / (2.0 ** p)
        lo = np.searchsorted(self.sorted_lambdas, lambda_q - band, side="left")
        hi = np.searchsorted(self.sorted_lambdas, lambda_q + band, side="right")
        idx = self.sorted_indices[lo:hi]
        lam = self.sorted_lambdas[lo:hi]
        out = [(int(i), float(l)) for i, l in zip(idx, lam)]
        return out[:k] if len(out) >= k else out

    def k_nearest_by_lambda(
        self,
        lambda_q: float,
        k: int,
        lambda_p: float,
        base_delta: float | None = None,
        growth: float = 1.7,
        max_multiplier: float = 10.0,
    ) -> list[tuple[int, float]]:
        """Expanding-window k nearest by |Δλ| (sorted_index.rs:85-140)."""
        if k == 0 or self.sorted_lambdas.size == 0:
            return []
        delta = abs(
            base_delta
            if base_delta is not None
            else max(self.std_dev * lambda_p, 1e-9)
        )
        growth = growth if np.isfinite(growth) and growth > 1.0 else 1.7
        max_delta = min(delta * max(max_multiplier, 1.0), 1.0)

        while True:
            lo_v, hi_v = max(lambda_q - delta, 0.0), min(lambda_q + delta, 1.0)
            lo = np.searchsorted(self.sorted_lambdas, lo_v, side="left")
            hi = np.searchsorted(self.sorted_lambdas, hi_v, side="right")
            if hi - lo >= k or delta >= max_delta:
                break
            delta = min(delta * growth, max_delta)

        idx = self.sorted_indices[lo:hi]
        lam = self.sorted_lambdas[lo:hi]
        if idx.size == 0:
            return []
        d = np.abs(lam - lambda_q)
        order = np.argsort(d, kind="stable")[:k]
        return [(int(idx[o]), float(lam[o])) for o in order]


class DeviceSortedLambdas:
    """Device-resident sorted-λ index: ``jnp.argsort`` once on build,
    ``jnp.searchsorted`` band queries; only query results cross to host.

    On remote-attached TPUs this avoids downloading the full λ vector
    (device→host is the bottleneck there); host-side numpy views are
    materialized lazily on first host query and cached.
    """

    def __init__(self, sorted_lambdas, sorted_indices, std_dev: float):
        self.sorted_lambdas_dev = sorted_lambdas     # [N] jax, ascending
        self.sorted_indices_dev = sorted_indices     # [N] jax
        self.std_dev = std_dev
        self._host: SortedLambdas | None = None

    @classmethod
    def build_from(cls, lambdas) -> "DeviceSortedLambdas":
        lam = jnp.asarray(lambdas, jnp.float32)
        if lam.size == 0:
            raise ValueError("cannot build sorted index from empty lambdas")
        # One fused jit: eager op-by-op dispatch costs seconds at 1M on a
        # remote-attached TPU (each op is a separate round-trip + program);
        # jitted this is ~60 ms.
        sl, order, std = _build_sorted_jit(lam)
        return cls(sl, order, float(std))

    # -- device band query -------------------------------------------------
    def range_bylambda(self, lambda_q: float, k: int, p: float) -> list[tuple[int, float]]:
        band = self.std_dev / (2.0 ** p)
        lo = int(jnp.searchsorted(self.sorted_lambdas_dev, jnp.float32(lambda_q - band), side="left"))
        hi = int(jnp.searchsorted(self.sorted_lambdas_dev, jnp.float32(lambda_q + band), side="right"))
        idx = np.asarray(self.sorted_indices_dev[lo:hi])
        lam = np.asarray(self.sorted_lambdas_dev[lo:hi])
        out = [(int(i), float(l)) for i, l in zip(idx, lam)]
        return out[:k] if len(out) >= k else out

    # -- host fallbacks (materialize lazily) -------------------------------
    def _host_view(self) -> SortedLambdas:
        if self._host is None:
            self._host = SortedLambdas(
                sorted_lambdas=np.asarray(self.sorted_lambdas_dev, np.float64),
                sorted_indices=np.asarray(self.sorted_indices_dev, np.int64),
                std_dev=self.std_dev,
            )
        return self._host

    def k_nearest_by_lambda(self, *args, **kwargs):
        return self._host_view().k_nearest_by_lambda(*args, **kwargs)

    def to_vec(self):
        return self._host_view().to_vec()
