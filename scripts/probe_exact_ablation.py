"""On-chip ablation: where the exact tier's 1M×128 batch time goes
(VERDICT r4 #9 — "attribute the exact tier's remaining 42% of MXU
ceiling").

Stages of the production fused exact pipeline
(``ops/search.fused_tilemax``), measured cumulatively with the bench's
pipelined-dispatch protocol (32 distinct dispatches, one trailing scalar
barrier):

  producer   — ``scores_and_tilemax`` alone (6-pass HIGHEST MXU scan +
               [B, N] f32 score write + sub-tile maxima in-kernel)
  select     — + top_k over the [B, ns] sub-tile maxima + id-order sort
  gather     — + ``gather_subtiles`` grouped-DMA candidate gather
  full       — the production ``fused_tilemax`` (adds the final top_k
               over [B, c·ts(+tail)] and the index arithmetic; the
               ragged 576-row tail scored by the XLA producer)

The deltas are the attribution table DESIGN.md records. Each stage's
output is consumed through a scalar so nothing is DCE'd; the Pallas
producer writes both outputs regardless of which is consumed.
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


@functools.partial(jax.jit, static_argnames=("stage", "kk"))
def staged(X, norms, lams, Q, qls, alphas, stage, kk):
    from matternet_rs_tpu.ops import search as so
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    b, n = Q.shape[0], X.shape[0]
    t = so.DEFAULT_TILE
    nt0 = n // t
    ts = t // tmf.SUBS
    ns = nt0 * tmf.SUBS
    if stage == "full":
        top, idx = so.fused_tilemax(X, norms, lams, Q, qls, kk, alphas, t)
        return jnp.sum(top) + jnp.sum(idx)
    smain, submax = tmf.scores_and_tilemax(
        X, norms, lams, Q, qls,
        jnp.broadcast_to(jnp.asarray(alphas, jnp.float32), (b,)), tile=t,
    )
    if stage == "producer":
        return jnp.sum(submax)
    c = min(ns, kk + 4)
    _, sel = jax.lax.top_k(submax, c)
    sel = jnp.sort(sel, axis=1)
    if stage == "select":
        return jnp.sum(sel)
    cand = tmf.gather_subtiles(smain, sel, ts)
    return jnp.sum(cand[:, :: ts])               # stage == "gather"


def measure(run, args, n_batches=32):
    jax.block_until_ready(run(*args))            # compile
    # Settle: a short throwaway pipelined window first — the FIRST timed
    # window after a compile measured wildly high on this tunnel
    # (2.6 s/call once; cache publication / program upload effects).
    for _ in range(4):
        run(*args)
    float(jnp.sum(run(*args)))
    t0 = time.perf_counter()
    outs = [run(*args) for _ in range(n_batches)]
    # Trailing scalar download is the barrier (block_until_ready is not
    # reliable on the axon backend — bench.py protocol).
    float(jnp.sum(outs[-1]))
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
    for stage in ("producer", "select", "gather", "full"):
        ms = measure(
            lambda *a, s=stage: staged(*a, stage=s, kk=K), args
        )
        res[f"{stage}_ms"] = round(ms, 3)
        res[f"{stage}_delta_ms"] = round(ms - prev, 3)
        prev = ms
        print(f"{stage}: {ms:.3f} ms (Δ {res[f'{stage}_delta_ms']:.3f})",
              flush=True)
    res["qps_b256_full"] = round(B / (res["full_ms"] / 1e3), 1)
    # MXU ceiling context: 6 HIGHEST passes over N·F at the chip's bf16
    # peak sets the producer floor; everything above producer_ms is
    # non-scan overhead.
    res["non_producer_frac"] = round(
        1.0 - res["producer_ms"] / res["full_ms"], 3
    )
    print(json.dumps(res))
    out = pathlib.Path(__file__).with_suffix(".json")
    out.write_text(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
