"""Tracing / profiling / observability.

Counterpart of the reference's logging-based observability (SURVEY §5:
structured per-stage banners, throughput lines, wall-clock stage timing —
e.g. taumode.rs:218-222, laplacian.rs:141-198) upgraded with what the TPU
stack actually offers: ``block_until_ready`` barriers so timings measure
device work, and ``jax.profiler`` traces for real kernel-level profiles.
"""

from __future__ import annotations

import contextlib
import dataclasses
import logging
import time
from typing import Any, Iterator

import jax

log = logging.getLogger("matternet_rs_tpu")


@dataclasses.dataclass
class StageTiming:
    name: str
    seconds: float
    items: int | None = None

    @property
    def items_per_sec(self) -> float | None:
        if self.items is None or self.seconds <= 0:
            return None
        return self.items / self.seconds


class StageTimer:
    """Collects per-stage wall-clock timings with device barriers.

    Usage::

        timer = StageTimer()
        with timer.stage("laplacian"):
            gl = build_laplacian_matrix(...)
        timer.report()
    """

    def __init__(self) -> None:
        self.timings: list[StageTiming] = []

    @contextlib.contextmanager
    def stage(self, name: str, items: int | None = None, sync: Any = None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.timings.append(StageTiming(name, dt, items))
            line = f"stage {name}: {dt:.3f}s"
            tput = self.timings[-1].items_per_sec
            if tput is not None:
                line += f" ({tput:,.0f} items/s)"
            log.info(line)

    def as_dict(self) -> dict[str, float]:
        return {t.name: t.seconds for t in self.timings}

    def total(self) -> float:
        return sum(t.seconds for t in self.timings)

    def report(self) -> str:
        width = 61
        lines = ["╔" + "═" * width + "╗"]
        lines.append("║ {:<{w}} ║".format("Stage timings", w=width - 2))
        lines.append("╠" + "═" * width + "╣")
        for t in self.timings:
            tput = f" ({t.items_per_sec:,.0f}/s)" if t.items_per_sec else ""
            lines.append(
                "║ {:<{w}} ║".format(f"{t.name}: {t.seconds:.3f}s{tput}", w=width - 2)
            )
        lines.append(
            "║ {:<{w}} ║".format(f"total: {self.total():.3f}s", w=width - 2)
        )
        lines.append("╚" + "═" * width + "╝")
        out = "\n".join(lines)
        log.info("\n%s", out)
        return out


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace context (open the result with XProf/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_block_until_ready(x, name: str = "op") -> float:
    """Barrier + wall time for the given output (throughput lines à la
    taumode.rs:218-222)."""
    t0 = time.perf_counter()
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0
    log.info("%s ready in %.3fs", name, dt)
    return dt


def lambda_statistics(lambdas) -> dict:
    """λ distribution stats logged after every compute
    (builder.rs:1059-1070, taumode.rs:226-246)."""
    import numpy as np

    lam = np.asarray(lambdas, np.float64)
    return {
        "min": float(lam.min()),
        "max": float(lam.max()),
        "mean": float(lam.mean()),
        "std": float(lam.std()),
        "range": float(lam.max() - lam.min()),
        "count": int(lam.size),
    }
