"""On-chip probe: the maxima-first int8 rescored tier at 1M×128.

Round-4 change under test: ``_batched_search_int8_jit`` routes through
``fused_scan_rescored`` (one MXU pass over the LOSSLESS bf16 upcast of the
int8 corpus — a quarter of the f32 HBM read — with the per-row dequant
multiplier folded into the epilogue's ``rn`` factor, then the exact ring-DMA
slab rescore). Measures device ms/batch + QPS at B=256 and B=1024 against
the exact and bf16/bf16x3 rescored tiers in the SAME window, plus
recall@10 vs the exact scan on the clustered bench fixture.
"""

import json
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

K = 10


def main():
    # Persistent compilation cache (same dir as bench.py — its config
    # lives inside bench.main(), so standalone probes must set it
    # themselves or they recompile every 1M program from scratch).
    cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    N, F = 1_000_000, 128
    data = make_energy_test_dataset(N, F, seed=44).astype(np.float32)
    t0 = time.perf_counter()
    b = bench._make_builder(N)
    aspace, gl = b.build(data)
    jax.block_until_ready(aspace.lambdas)
    print(f"build {time.perf_counter() - t0:.1f}s", flush=True)

    res = {}
    for nq in (256, 1024):
        for name, approx, quantized, int8 in (
            ("exact_f32", False, False, False),
            ("int8_poolcut", True, False, True),
            ("int8_rescored", True, "int8_rescored", False),
            ("bf16_rescored", True, "bf16_rescored", False),
            ("bf16x3_rescored", True, "bf16x3_rescored", False),
        ):
            runs = [
                bench._device_time_protocol(
                    jax, jnp, aspace, data, n_queries=nq, n_batches=32,
                    approx=approx, quantized=quantized, int8=int8,
                )
                for _ in range(2)
            ]
            ms = min(r[0] for r in runs)
            res[f"{name}_B{nq}"] = {
                "ms": round(ms, 3),
                "qps": round(max(r[1] for r in runs), 1),
                "agree_pct": round(
                    100 * (1 - abs(runs[0][0] - runs[1][0])
                           / max(r[0] for r in runs)), 1),
            }
            print(f"B={nq} {name}: {res[f'{name}_B{nq}']}", flush=True)

    # Recall@10 vs exact on the clustered fixture (16 corpus queries).
    from matternet_rs_tpu.core import (
        _batched_search_i8r_jit,
        _batched_search_jit,
    )

    rng = np.random.default_rng(7)
    base_idx = rng.integers(0, N, 16)
    lam_np = np.asarray(aspace.lambdas)
    qv = jnp.asarray(data[base_idx])
    qlv = jnp.asarray(lam_np[base_idx])
    alphas16 = jnp.full((16,), 0.7, jnp.float32)
    zero, one = jnp.float32(0.0), jnp.float32(1.0)
    cand16 = aspace._int8_cand(K, None)
    ex_idx = np.asarray(_batched_search_jit(
        aspace.data, aspace.norms, aspace.lambdas,
        qv, qlv, K, alphas16, False,
    )[0])
    X8_d, i8m_d = aspace._ensure_int8()
    r_idx = np.asarray(_batched_search_i8r_jit(
        X8_d, i8m_d, aspace.data, aspace.norms, aspace.lambdas,
        qv, qlv, zero, one, K, cand16, alphas16, True,
    )[0])
    res["int8_fused_recall_at_10_vs_exact"] = round(float(np.mean([
        len(set(r_idx[i].tolist()) & set(ex_idx[i].tolist())) / K
        for i in range(len(base_idx))
    ])), 4)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
