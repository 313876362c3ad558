"""Stage decomposition of the maxima-first rescored path at 1M×128.

Times each stage of ops.search.fused_scan_rescored in isolation (pipelined
batches, one trailing barrier — the device-time protocol) to locate the
~8 ms of fixed overhead the probe ladder showed: scan kernel / top-k /
slab gather / exact rescore (einsum-HIGHEST vs VPU multiply-reduce).
"""

import functools
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
    ts = t // tmf.SUBS
    nt0 = N // t
    ns = nt0 * tmf.SUBS
    c = K + 4

    rng = np.random.default_rng(13)
    print("gen corpus", flush=True)
    X = jnp.asarray(rng.standard_normal((N, F), dtype=np.float32))
    norms = jnp.sqrt(jnp.sum(X * X, axis=1))
    lams = jnp.asarray(rng.random(N, dtype=np.float32))
    al = jnp.full((B,), 0.7, jnp.float32)
    print("first d2h", flush=True)
    np.asarray(norms[:8])
    print("warmup done", flush=True)

    def timeit(name, fn, batches, n=16):
        out = fn(*batches[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for args in batches:
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / len(batches) * 1e3
        print(f"{name}: {dt:.3f} ms", flush=True)
        return dt

    qb = [
        (jnp.asarray(rng.standard_normal((B, F), dtype=np.float32)),
         jnp.asarray(rng.random(B, dtype=np.float32)))
        for _ in range(16)
    ]

    # 1. scan kernel alone (both precisions)
    Xb = X.astype(jnp.bfloat16)
    timeit("tilemax_only bf16 (1-pass)",
           lambda q, ql: tmf.tilemax_only(Xb, norms, lams, q, ql, al, tile=t),
           qb)
    timeit("tilemax_only f32 (bf16x3)",
           lambda q, ql: tmf.tilemax_only(X, norms, lams, q, ql, al, tile=t),
           qb)

    # 2. top-k over maxima + sort (fixed fake maxima)
    sm = [(jnp.asarray(rng.standard_normal((B, ns), dtype=np.float32)),)
          for _ in range(16)]

    @jax.jit
    def sel_only(submax):
        _, sel = jax.lax.top_k(submax, c)
        return jnp.sort(sel, axis=1)

    timeit("top_k(maxima, 14) + sort", sel_only, sm)

    sels = [(sel_only(s[0]),) for s in sm]
    jax.block_until_ready(sels)

    # 3. slab gather alone
    @jax.jit
    def gather_only(sel):
        return jnp.take(X[: nt0 * t].reshape(ns, ts * F), sel, axis=0)

    timeit("slab gather (take, 470MB)", gather_only, sels)

    # 4. rescore einsum variants on a pre-gathered slab
    slab = gather_only(sels[0][0]).reshape(B, c, ts, F)
    jax.block_until_ready(slab)
    q0 = qb[0][0]

    @jax.jit
    def eins_highest(q, sl):
        return jnp.einsum("bf,bctf->bct", q, sl,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def eins_default(q, sl):
        return jnp.einsum("bf,bctf->bct", q, sl,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def vpu_reduce(q, sl):
        return (q[:, None, None, :] * sl).sum(axis=-1)

    sb = [(qq, slab) for (qq, _l) in qb]
    timeit("rescore einsum HIGHEST", eins_highest, sb)
    timeit("rescore einsum DEFAULT", eins_default, sb)
    timeit("rescore VPU mul+reduce", vpu_reduce, sb)

    # 4b. fused gather+rescore (no materialized slab)
    @jax.jit
    def gather_rescore_vpu(q, sel):
        sl = jnp.take(X[: nt0 * t].reshape(ns, ts * F), sel,
                      axis=0).reshape(B, c, ts, F)
        return (q[:, None, None, :] * sl).sum(axis=-1)

    gb = [(qq, s[0]) for (qq, _l), s in zip(qb, sels)]
    timeit("gather+rescore fused (VPU)", gather_rescore_vpu, gb)

    # 5. full path, both tiers
    timeit("fused_scan_rescored bf16",
           lambda q, ql: so.fused_scan_rescored(
               Xb, X, norms, lams, q, ql, K, 64, al),
           qb)
    timeit("fused_scan_rescored f32 (bf16x3)",
           lambda q, ql: so.fused_scan_rescored(
               X, X, norms, lams, q, ql, K, 64, al),
           qb)

    # 6. reference points
    timeit("exact fused tier (search_lambda_aware_tilemax)",
           lambda q, ql: so.search_lambda_aware_tilemax(
               X, norms, lams, q, ql, K, al),
           qb)


if __name__ == "__main__":
    main()
