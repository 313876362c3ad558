"""Surfface-generation TauMode: τ resolved from the λ *distribution*.

Reference: ``/root/reference/surfface-core/src/taumode.rs`` (f32; distinct
from the legacy per-item ``select_tau`` — SURVEY §7.3 documents both).
Median here is ``sorted[len/2]`` (upper median, no averaging), Percentile is
``round((n-1)·p)`` of the sorted values; floor 1e-9.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

TAU_FLOOR = 1e-9


@dataclasses.dataclass(frozen=True)
class TauMode:
    mode: str = "median"     # median | mean | fixed | percentile
    param: float = 0.0

    @classmethod
    def median(cls) -> "TauMode":
        return cls("median")

    @classmethod
    def mean(cls) -> "TauMode":
        return cls("mean")

    @classmethod
    def fixed(cls, t: float) -> "TauMode":
        return cls("fixed", float(t))

    @classmethod
    def percentile(cls, p: float) -> "TauMode":
        return cls("percentile", float(p))


def compute_tau(lambdas, mode: TauMode) -> float:
    """Resolve scalar τ (taumode.rs:37-65)."""
    lam = np.asarray(lambdas, np.float32)
    finite = lam[np.isfinite(lam)]
    if finite.size == 0:
        return TAU_FLOOR
    if mode.mode == "fixed":
        t = mode.param
        return max(t, TAU_FLOOR) if math.isfinite(t) else TAU_FLOOR
    if mode.mode == "mean":
        return max(float(finite.mean()), TAU_FLOOR)
    s = np.sort(finite)
    if mode.mode == "median":
        return max(float(s[len(s) // 2]), TAU_FLOOR)
    if mode.mode == "percentile":
        p = min(max(mode.param, 0.0), 1.0)
        idx = int(np.floor((len(s) - 1) * p + 0.5))  # Rust half-away round
        return max(float(s[idx]), TAU_FLOOR)
    raise ValueError(f"unknown tau mode {mode.mode!r}")
