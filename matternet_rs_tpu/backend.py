"""Backend dispatch and capability report.

TPU-native counterpart of the reference's compile-time accelerator selection
(``/root/reference/surfface-core/src/backend.rs:7-116`` — burn AutoBackend
CPU/WGPU/CUDA). JAX resolves devices at runtime; this module provides the
equivalent device getter, capability report, and a ``dispatch`` helper that
runs a closure with a chosen default device.
"""

from __future__ import annotations

import contextlib
import logging
from typing import Callable, TypeVar

import jax

log = logging.getLogger(__name__)

T = TypeVar("T")


def get_device(prefer: str | None = None) -> jax.Device:
    """Default compute device; ``prefer`` ∈ {"tpu", "gpu", "cpu", None}.

    Reference: ``get_device()`` (backend.rs:52-71) — here the accelerator is
    selected at runtime from the live platform list instead of cargo
    features.
    """
    devices = jax.devices()
    if prefer:
        matches = [d for d in devices if prefer in d.platform.lower()]
        if matches:
            return matches[0]
        for platform in ("tpu", "gpu", "cpu"):
            if platform.startswith(prefer):
                try:
                    return jax.devices(platform)[0]
                except RuntimeError:
                    pass
        raise ValueError(f"no device matching {prefer!r}; have {devices}")
    return devices[0]


def is_tpu_available() -> bool:
    """Reference: ``is_gpu_available()`` (backend.rs:106-116)."""
    try:
        return any("tpu" in d.platform.lower() or "axon" in d.platform.lower()
                   for d in jax.devices())
    except RuntimeError:
        return False


def backend_info() -> dict:
    """Capability report (backend.rs:73-103)."""
    devices = jax.devices()
    return {
        "backend": jax.default_backend(),
        "device_count": len(devices),
        "local_device_count": jax.local_device_count(),
        "devices": [str(d) for d in devices],
        "platform_version": getattr(jax.devices()[0].client, "platform_version", ""),
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }


def print_backend_info() -> None:
    info = backend_info()
    log.info("backend: %s (%d devices)", info["backend"], info["device_count"])
    for d in info["devices"]:
        log.info("  device: %s", d)


def dispatch(fn: Callable[[], T], prefer: str | None = None) -> T:
    """Run ``fn`` with the chosen device as default (backend.rs:26-50)."""
    device = get_device(prefer)
    with jax.default_device(device):
        return fn()


@contextlib.contextmanager
def on_device(prefer: str | None = None):
    with jax.default_device(get_device(prefer)):
        yield
