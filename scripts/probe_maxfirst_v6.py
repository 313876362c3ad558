"""Ring slab reader vs auto-pipelined slab_rescore, plus tier totals at
B=256 AND B=1024 (the throughput batch where the exact tier's VPU
epilogue is unhidden — 11.9 ms measured round 3)."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from matternet_rs_tpu.ops import search as so
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    N, F, K = 1_000_000, 128, 10
    t = so.DEFAULT_TILE
    subs = so.RESCORE_SUBS
    ts = t // subs
    nt0 = N // t
    ns = nt0 * subs
    c = K + 4
    NB = 64

    rng = np.random.default_rng(13)
    print("gen corpus", flush=True)
    X = jnp.asarray(rng.standard_normal((N, F), dtype=np.float32))
    Xb = X.astype(jnp.bfloat16)
    norms = jnp.sqrt(jnp.sum(X * X, axis=1))
    lams = jnp.asarray(rng.random(N, dtype=np.float32))
    print("first d2h", flush=True)
    np.asarray(norms[:8])
    print("warmup done", flush=True)

    def timeit(name, fn, batches, n=NB):
        out = fn(*batches[0])
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = fn(*batches[i % len(batches)])
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{name}: {dt:.3f} ms", flush=True)
        return dt

    from matternet_rs_tpu.core import _batched_search_b3r_jit, \
        _batched_search_bf16r_jit

    zero, one = jnp.float32(0.0), jnp.float32(1.0)
    for B in (256, 1024):
        al = jnp.full((B,), 0.7, jnp.float32)
        qb = [
            (jnp.asarray(rng.standard_normal((B, F), dtype=np.float32)),
             jnp.asarray(rng.random(B, dtype=np.float32)))
            for _ in range(8)
        ]
        sels = [
            (jnp.sort(jnp.asarray(np.stack([
                rng.choice(ns, size=c, replace=False) for _ in range(B)
            ]).astype(np.int32)), axis=1),)
            for _ in range(8)
        ]
        timeit(f"B={B} slab_dots_ring",
               lambda s: tmf.slab_dots_ring(X, qb[0][0], s, ts), sels)

        @jax.jit
        def sel_topk(q, ql):
            sm = jnp.zeros((q.shape[0], ns), jnp.float32) + q[:, :1]
            _, sl = jax.lax.top_k(sm, c)
            return jnp.sort(sl, axis=1)

        timeit(f"B={B} top_k+sort over maxima", sel_topk, qb)
        timeit(f"B={B} TIER bf16_rescored",
               lambda q, ql: _batched_search_bf16r_jit(
                   Xb, X, norms, lams, q, ql, zero, one, K, 64, al, True),
               qb)
        timeit(f"B={B} TIER bf16x3_rescored",
               lambda q, ql: _batched_search_b3r_jit(
                   X, norms, lams, q, ql, zero, one, K, 64, al, True), qb)
        timeit(f"B={B} TIER exact",
               lambda q, ql: so.search_lambda_aware_tilemax(
                   X, norms, lams, q, ql, K, al), qb)


if __name__ == "__main__":
    main()
