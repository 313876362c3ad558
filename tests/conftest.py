"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the reference's "fake backend" strategy (burn-ndarray CPU backend for
GPU code paths, surfface-core/src/tests/test_smoothing.rs:16): all JAX code
runs on CPU with 8 virtual devices so mesh-sharded paths are exercised
without a real TPU pod.

Note: a pytest plugin imports jax before this conftest runs, and jax captures
``JAX_PLATFORMS`` at import time — so we must ALSO update jax.config, not
just the environment.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert not jax._src.xla_bridge.backends_are_initialized(), (
    "a plugin initialized a JAX backend before conftest could force CPU"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The full suite compiles many hundreds of XLA CPU programs in one
    process; past ~600 the XLA CPU JIT segfaulted *during a later
    compilation* (reproduced twice at ~94% of the suite, in
    backend_compile_and_load — not in any test's own logic; every module
    passes in isolation and the suite tail passes as a subset). Unloading
    executables per module keeps the JIT's code memory bounded at the cost
    of cross-module recompiles."""
    yield
    jax.clear_caches()
    gc.collect()
