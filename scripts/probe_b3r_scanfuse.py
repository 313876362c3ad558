"""Quick on-chip A/B of the bf16x3 scan (tilemax_only on an f32 corpus)
after the cross-term K=2F fusion in ``_scan_dots_kernel`` — measures the
scan stage only, same protocol as probe_b3r_ablation (whose pre-change
scan row is the baseline: 2.371 ms at 1M×128 B=256)."""

import functools
import json
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

K = 10


@functools.partial(jax.jit, static_argnames=())
def scan_stage(X, norms, lams, Q, qls, alphas):
    from matternet_rs_tpu.ops import search as so
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    b = Q.shape[0]
    a = jnp.broadcast_to(jnp.asarray(alphas, jnp.float32), (b,))
    submax = tmf.tilemax_only(
        X, norms, lams, Q, qls, a, tile=so.DEFAULT_TILE,
        subs=so.RESCORE_SUBS,
    )
    return jnp.sum(submax)


def measure(run, args, n_batches=32):
    jax.block_until_ready(run(*args))
    for _ in range(4):
        run(*args)
    float(run(*args))
    t0 = time.perf_counter()
    outs = [run(*args) for _ in range(n_batches)]
    float(outs[-1])
    return (time.perf_counter() - t0) / n_batches * 1e3


def main():
    cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    N, F, B = 1_000_000, 128, 256
    rng = np.random.default_rng(44)
    X = jnp.asarray(rng.normal(size=(N, F)), jnp.float32)
    norms = jnp.sqrt(jnp.sum(X * X, axis=-1))
    lams = jnp.asarray(rng.random(N), jnp.float32)
    Q = X[:B]
    qls = lams[:B]
    alphas = jnp.full((B,), 0.7, jnp.float32)
    args = (X, norms, lams, Q, qls, alphas)

    best = min(measure(scan_stage, args) for _ in range(3))
    res = {"scan_ms_best_of_3": round(best, 3),
           "baseline_prefuse_ms": 2.371}
    print(json.dumps(res))
    pathlib.Path(__file__).with_suffix(".json").write_text(
        json.dumps(res, indent=1)
    )


if __name__ == "__main__":
    main()
