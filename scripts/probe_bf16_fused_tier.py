"""Targeted device-time probe for the round-4 bf16 fused rescored tier.

Runs ONLY the 1M section's device-time ladder (exact / approx-bf16 /
int8-rescored / bf16-rescored) + rescored-tier recall, via bench.py's own
protocol functions, so the numbers are directly comparable to the full
bench artifact. Prints the section JSON.
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = pathlib.Path(bench.__file__).parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np

    bench._mark("transport warmup")
    np.asarray(jnp.arange(8) * 1)
    bench._mark("warmup done; 1M section")
    extra = {}
    bench._EMIT_STATE.update({"N": 10_000, "F": 128})
    bench.bench_1m(jax, jnp, extra)
    print(json.dumps(extra.get("config_1m", {}), indent=1))


if __name__ == "__main__":
    main()
