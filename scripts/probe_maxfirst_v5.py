"""Maxima-first rescored tiers, final on-chip measurement at 1M×128.

After probe v3/v4 (see those files): cheap-epilogue scan landed in
tilemax_only, the XLA row-gather (~100 GB/s, 2.2-4.9 ms) was replaced by
the scalar-prefetch slab_rescore kernel, RESCORE_SUBS=16. This probe
measures the production jitted wrappers end-to-end plus the new kernel
stages in isolation, against the exact tier and the XLA two-stage
fallback the tiers previously routed to.
"""

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

    N, F, B, K = 1_000_000, 128, 256, 10
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
    al = jnp.full((B,), 0.7, jnp.float32)
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

    qb = [
        (jnp.asarray(rng.standard_normal((B, F), dtype=np.float32)),
         jnp.asarray(rng.random(B, dtype=np.float32)))
        for _ in range(8)
    ]

    # stages in isolation
    timeit("scan bf16 subs16 (lib tilemax_only)",
           lambda q, ql: tmf.tilemax_only(Xb, norms, lams, q, ql, al,
                                          tile=t, subs=subs), qb)
    timeit("scan bf16x3 subs16 (lib tilemax_only)",
           lambda q, ql: tmf.tilemax_only(X, norms, lams, q, ql, al,
                                          tile=t, subs=subs), qb)

    n0 = nt0 * t
    sels = [
        (jnp.sort(jnp.asarray(
            rng.choice(ns, size=(B, c), replace=False).astype(np.int32)
        ), axis=1),)
        for _ in range(8)
    ]
    timeit("slab_rescore kernel (scalar-prefetch DMA)",
           lambda s: tmf.slab_rescore(X, norms[:n0], lams[:n0],
                                      qb[0][0], qb[0][1], al, s, ts), sels)

    # production tiers, end to end (jitted wrappers)
    from matternet_rs_tpu.core import (
        _batched_search_b3r_jit,
        _batched_search_bf16r_jit,
    )

    zero, one = jnp.float32(0.0), jnp.float32(1.0)
    timeit("TIER bf16_rescored (maxima-first)",
           lambda q, ql: _batched_search_bf16r_jit(
               Xb, X, norms, lams, q, ql, zero, one, K, 64, al, True), qb)
    timeit("TIER bf16x3_rescored (maxima-first)",
           lambda q, ql: _batched_search_b3r_jit(
               X, norms, lams, q, ql, zero, one, K, 64, al, True), qb)
    timeit("TIER exact (search_lambda_aware_tilemax)",
           lambda q, ql: so.search_lambda_aware_tilemax(
               X, norms, lams, q, ql, K, al), qb)

    # XLA full-precision scan + top_k (the structure the tiers'
    # off-envelope fallback uses), for the record.
    import functools as _ft

    @_ft.partial(jax.jit, static_argnames=("k", "cand"))
    def xla_two_stage_b3(Xf, nrm, lam, q, ql, k, cand):
        qn = jnp.sqrt(jnp.sum(q * q, axis=-1))
        dots = jnp.dot(q, Xf.T, precision=jax.lax.Precision.HIGH,
                       preferred_element_type=jnp.float32)
        cos = so._guarded_cosine(dots, nrm[None, :] * qn[:, None])
        scores = so._blend(cos, lam[None, :], ql[:, None], al[:, None])
        top, idx = jax.lax.top_k(scores, k)
        return idx, top

    timeit("FALLBACK xla HIGH scan + top_k",
           lambda q, ql: xla_two_stage_b3(X, norms, lams, q, ql, K, 64), qb)


if __name__ == "__main__":
    main()
