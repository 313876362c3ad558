"""On-chip ablation: where the bf16x3_rescored (exact-grade headline)
tier's 1M×128 batch time goes — the bf16x3 counterpart of
``probe_exact_ablation.py`` (VERDICT r4 #9 attribution style).

Stages of the production ``ops/search.fused_scan_rescored`` pipeline
with an f32 scan corpus (→ three-pass bf16x3 maxima-first scan),
measured cumulatively with the pipelined-dispatch protocol:

  scan     — ``tilemax_only`` alone (3 bf16 MXU passes over the f32
             corpus, cheap multiply/add epilogue, per-sub-tile maxima —
             no [B, N] score write)
  select   — + ``lax.top_k`` over the [B, ns] sub-tile maxima + id sort
  ringdots — + ``slab_dots_ring`` exact HIGHEST dots over the selected
             128-row slabs (8 outstanding HBM→VMEM slab DMAs)
  full     — the production ``fused_scan_rescored`` (adds the blend
             epilogue over [B, c·ts], the norms/λ gathers, the ragged
             tail via the XLA producer, and the final top-k)

The deltas are the attribution table DESIGN.md records for the tier.
"""

import functools
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
CAND = 40       # core default max(4k, 32)


@functools.partial(jax.jit, static_argnames=("stage", "kk", "cand"))
def staged(X, norms, lams, Q, qls, alphas, stage, kk, cand):
    from matternet_rs_tpu.ops import search as so
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    b, n = Q.shape[0], X.shape[0]
    t = so.DEFAULT_TILE
    nt0 = n // t
    ts = t // so.RESCORE_SUBS
    ns = nt0 * so.RESCORE_SUBS
    a = jnp.broadcast_to(jnp.asarray(alphas, jnp.float32), (b,))
    if stage == "full":
        idx, top = so.fused_scan_rescored(
            X, X, norms, lams, Q, qls, kk, cand, a
        )
        return jnp.sum(top) + jnp.sum(idx)
    submax = tmf.tilemax_only(
        X, norms, lams, Q, qls, a, tile=t, subs=so.RESCORE_SUBS,
    )                                                            # [B, ns]
    if stage == "scan":
        return jnp.sum(submax)
    c = min(ns, max(kk + 4, -(-cand // ts)))
    _, sel = jax.lax.top_k(submax, c)
    sel = jnp.sort(sel, axis=1)
    if stage == "select":
        return jnp.sum(sel)
    d = tmf.slab_dots_ring(X, Q, sel, ts)                        # [B,c,ts]
    return jnp.sum(d[:, :, ::64])                                # ringdots


def measure(run, args, n_batches=32):
    jax.block_until_ready(run(*args))            # compile
    for _ in range(4):                           # settle (probe protocol)
        run(*args)
    float(jnp.sum(run(*args)))
    t0 = time.perf_counter()
    outs = [run(*args) for _ in range(n_batches)]
    float(jnp.sum(outs[-1]))                     # trailing barrier
    return (time.perf_counter() - t0) / n_batches * 1e3


def main():
    cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    N, F, B = 1_000_000, 128, 256
    data = make_energy_test_dataset(N, F, seed=44).astype(np.float32)
    b = bench._make_builder(N)
    aspace, gl = b.build(data)
    jax.block_until_ready(aspace.lambdas)
    print("build done", flush=True)

    rng = np.random.default_rng(13)
    qi = rng.integers(0, N, B)
    Q = jnp.asarray(data[qi])
    qls = aspace.lambdas[jnp.asarray(qi)]
    alphas = jnp.full((B,), 0.7, jnp.float32)
    args = (aspace.data, aspace.norms, aspace.lambdas, Q, qls, alphas)

    res = {}
    prev = 0.0
    for stage in ("scan", "select", "ringdots", "full"):
        ms = measure(
            lambda *a, s=stage: staged(*a, stage=s, kk=K, cand=CAND), args
        )
        res[f"{stage}_ms"] = round(ms, 3)
        res[f"{stage}_delta_ms"] = round(ms - prev, 3)
        prev = ms
        print(f"{stage}: {ms:.3f} ms (Δ {res[f'{stage}_delta_ms']:.3f})",
              flush=True)
    res["qps_b256_full"] = round(B / (res["full_ms"] / 1e3), 1)
    res["non_scan_frac"] = round(1.0 - res["scan_ms"] / res["full_ms"], 3)
    # Floor context: 3 bf16 passes over N·F at the chip's bf16 peak +
    # one corpus read; everything above scan_ms is selection/rescore.
    print(json.dumps(res))
    out = pathlib.Path(__file__).with_suffix(".json")
    out.write_text(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
