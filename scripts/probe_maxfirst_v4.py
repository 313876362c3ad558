"""Maxima-first rescored path, round 2 of stage probing at 1M×128.

v3 results (64 pipelined batches, scalar-download barrier):
  lib bf16 scan 1.865 ms → cheap-epilogue variant 1.076 ms
  lib bf16x3   2.610 ms → cheap-epilogue variant 1.887 ms
  dots-only floor: bf16 1.219 / f32-split 1.594 ms
  selection: top_k+sort 0.919 ms, approx_max_k+sort 0.610 ms
  (v3's gather row OOMed: 64 retained [B*c, ts*F] outputs — fixed here
   by reducing outputs in-jit.)

This probe composes full-tier candidates as SINGLE jits and times the
remaining stages properly:
  D2  iterative max-and-mask selection (c sequential masked row-maxima)
  E   slab gather + VPU rescore with reduced outputs, SUBS=8 vs 16
  S   hi/lo two-plane bf16 corpus scan (no in-kernel split)
  V*  full-path variants: scan → select → gather → exact rescore → top-k
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from matternet_rs_tpu.ops import search as so
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    N, F, B, K = 1_000_000, 128, 256, 10
    t = so.DEFAULT_TILE
    nt0 = N // t
    NB = 64

    rng = np.random.default_rng(13)
    print("gen corpus", flush=True)
    X = jnp.asarray(rng.standard_normal((N, F), dtype=np.float32))
    Xb = X.astype(jnp.bfloat16)
    Xhi = Xb
    Xlo = (X - Xhi.astype(jnp.float32)).astype(jnp.bfloat16)
    norms = jnp.sqrt(jnp.sum(X * X, axis=1))
    rnorms = jnp.where(norms > 1e-12, 1.0 / jnp.maximum(norms, 1e-12), 0.0)
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

    # ------------------------------------------------------------------
    # cheap-epilogue maxima kernel, parameterized by sub-tile count and
    # scan mode ("bf16" one plane, "split" in-kernel hi/lo, "hilo" two
    # bf16 planes precomputed)
    # ------------------------------------------------------------------
    def make_scan(subs, mode):
        ns = nt0 * subs

        def body(dots, rn, aqrn, beta, lam, ql, tm_ref):
            s = dots * rn * aqrn
            lam_pen = jnp.minimum(jnp.abs(lam - ql), 1.0)
            s = s + (beta - beta * lam_pen)
            row = jax.lax.broadcasted_iota(jnp.int32, (subs, s.shape[0]), 0)
            acc = jnp.zeros((subs, s.shape[0]), jnp.float32)
            tsz = s.shape[1] // subs
            for g in range(subs):
                m = s[:, g * tsz:(g + 1) * tsz].max(axis=1)
                acc = jnp.where(row == g, m[None, :], acc)
            tm_ref[:] = acc

        if mode == "hilo":
            def kern(xh_ref, xl_ref, rn_ref, lam_ref, qh_ref, ql16_ref,
                     aqrn_ref, beta_ref, qlam_ref, tm_ref):
                dn = (((1,), (1,)), ((), ()))
                dots = (
                    jax.lax.dot_general(qh_ref[:], xl_ref[:], dn,
                                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(ql16_ref[:], xh_ref[:], dn,
                                          preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(qh_ref[:], xh_ref[:], dn,
                                          preferred_element_type=jnp.float32)
                )
                body(dots, rn_ref[:], aqrn_ref[:], beta_ref[:], lam_ref[:],
                     qlam_ref[:], tm_ref)

            @jax.jit
            def scan(xh, xl, rn, lam, q, ql):
                qn = jnp.sqrt(jnp.sum(q * q, axis=-1))
                aqrn = (al / jnp.maximum(qn, 1e-12))[:, None]
                beta = (1.0 - al)[:, None]
                qh = q.astype(jnp.bfloat16)
                ql16 = (q - qh.astype(jnp.float32)).astype(jnp.bfloat16)
                return pl.pallas_call(
                    kern,
                    grid=(nt0,),
                    in_specs=[
                        pl.BlockSpec((t, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((t, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, t), lambda i: (0, i), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, t), lambda i: (0, i), memory_space=pltpu.VMEM),
                        pl.BlockSpec((B, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((B, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((subs, B), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((ns, B), jnp.float32),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 1024 * 1024),
                )(xh, xl, rn[None, :], lam[None, :], qh, ql16,
                  aqrn, beta, ql[:, None]).T

            def run(q, ql):
                return scan(Xhi, Xlo, rnorms, lams, q, ql)
            return run

        def kern(x_ref, rn_ref, lam_ref, q_ref, aqrn_ref, beta_ref,
                 qlam_ref, tm_ref):
            dots = tmf._scan_dots_kernel(q_ref[:], x_ref[:])
            body(dots, rn_ref[:], aqrn_ref[:], beta_ref[:], lam_ref[:],
                 qlam_ref[:], tm_ref)

        @jax.jit
        def scan(Xs, rn, lam, q, ql):
            qn = jnp.sqrt(jnp.sum(q * q, axis=-1))
            aqrn = (al / jnp.maximum(qn, 1e-12))[:, None]
            beta = (1.0 - al)[:, None]
            return pl.pallas_call(
                kern,
                grid=(nt0,),
                in_specs=[
                    pl.BlockSpec((t, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, t), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, t), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((B, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((subs, B), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((ns, B), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(Xs, rn[None, :], lam[None, :], q, aqrn, beta, ql[:, None]).T

        if mode == "bf16":
            return lambda q, ql: scan(Xb, rnorms, lams, q, ql)
        return lambda q, ql: scan(X, rnorms, lams, q, ql)

    # ---- S. scan variants --------------------------------------------
    scan8_bf16 = make_scan(8, "bf16")
    scan8_split = make_scan(8, "split")
    scan8_hilo = make_scan(8, "hilo")
    scan16_bf16 = make_scan(16, "bf16")
    scan16_hilo = make_scan(16, "hilo")
    timeit("S subs8 bf16 cheap-epi", scan8_bf16, qb)
    timeit("S subs8 split cheap-epi", scan8_split, qb)
    timeit("S subs8 hilo 2-plane", scan8_hilo, qb)
    timeit("S subs16 bf16 cheap-epi", scan16_bf16, qb)
    timeit("S subs16 hilo 2-plane", scan16_hilo, qb)

    # ---- D2. selection variants over [B, ns] -------------------------
    for subs in (8, 16):
        ns = nt0 * subs
        c = K + 4
        sm = [(jnp.asarray(rng.standard_normal((B, ns), dtype=np.float32)),)
              for _ in range(8)]

        @jax.jit
        def sel_topk(submax):
            _, sel = jax.lax.top_k(submax, c)
            return jnp.sort(sel, axis=1)

        @jax.jit
        def sel_iter(submax):
            def step(carry, _):
                s, = carry
                m = jnp.argmax(s, axis=1)                       # [B]
                s = s.at[jnp.arange(B), m].set(-jnp.inf)
                return (s,), m
            (_,), sels = jax.lax.scan(step, (submax,), None, length=c)
            return jnp.sort(sels.T.astype(jnp.int32), axis=1)

        timeit(f"D2 subs{subs} top_k+sort", sel_topk, sm)
        timeit(f"D2 subs{subs} iter-argmax", sel_iter, sm)

    # ---- E. gather + rescore, reduced outputs ------------------------
    for subs in (8, 16):
        ns = nt0 * subs
        tsz = t // subs
        c = K + 4
        X0r = X[: nt0 * t].reshape(ns, tsz * F)
        sels = [
            (jnp.sort(jnp.asarray(
                rng.choice(ns, size=(B, c), replace=False).astype(np.int32)
            ), axis=1),)
            for _ in range(8)
        ]

        @jax.jit
        def gather_sum(Xr, sel):
            g = jnp.take(Xr, sel, axis=0)
            return jnp.sum(g, axis=-1)                           # [B, c]

        timeit(f"E subs{subs} gather+sum", lambda s: gather_sum(X0r, s), sels)

        @jax.jit
        def gather_rescore(Xr, q, sel):
            sl = jnp.take(Xr, sel, axis=0).reshape(B, c, tsz, F)
            d = (q[:, None, None, :] * sl).sum(axis=-1)          # VPU
            return d.max(axis=-1)                                # [B, c]

        gb = [(qq, s[0]) for (qq, _l), s in zip(qb, sels)]
        timeit(f"E subs{subs} gather+VPU rescore",
               lambda q, s: gather_rescore(X0r, q, s), gb)

    # ---- V. composed full paths (single jit each) ---------------------
    def make_full(subs, mode, select):
        ns = nt0 * subs
        tsz = t // subs
        c = K + 4
        scan = {"bf16": scan8_bf16 if subs == 8 else scan16_bf16,
                "hilo": scan8_hilo if subs == 8 else scan16_hilo}[mode]

        @functools.partial(jax.jit, static_argnames=())
        def tail_rescore(Xf, nrm, lam, q, ql, sel):
            qn = jnp.sqrt(jnp.sum(q * q, axis=-1))
            Xr = Xf[: nt0 * t].reshape(ns, tsz * F)
            sl = jnp.take(Xr, sel, axis=0).reshape(B, c, tsz, F)
            d = jnp.einsum("bf,bctf->bct", q, sl,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
            nrm_s = jnp.take(nrm[: nt0 * t].reshape(ns, tsz), sel, axis=0)
            lam_s = jnp.take(lam[: nt0 * t].reshape(ns, tsz), sel, axis=0)
            cos = so._guarded_cosine(d, nrm_s * qn[:, None, None])
            s = so._blend(cos, lam_s, ql[:, None, None],
                          al[:, None, None]).reshape(B, c * tsz)
            gidx = (sel[:, :, None] * tsz
                    + jnp.arange(tsz, dtype=jnp.int32)[None, None, :]
                    ).reshape(B, c * tsz)
            top, pos = jax.lax.top_k(s, K)
            return jnp.take_along_axis(gidx, pos, axis=1), top

        @jax.jit
        def sel_fn(submax):
            if select == "topk":
                _, sel = jax.lax.top_k(submax, c)
            else:
                _, sel = jax.lax.approx_max_k(submax, c)
                sel = sel.astype(jnp.int32)
            return jnp.sort(sel, axis=1)

        def run(q, ql):
            submax = scan(q, ql)
            sel = sel_fn(submax)
            return tail_rescore(X, norms, lams, q, ql, sel)
        return run

    timeit("V bf16 subs16 topk", make_full(16, "bf16", "topk"), qb)
    timeit("V hilo subs16 topk", make_full(16, "hilo", "topk"), qb)
    timeit("V hilo subs16 approx", make_full(16, "hilo", "approx"), qb)
    timeit("V hilo subs8 topk", make_full(8, "hilo", "topk"), qb)

    # ---- G. references -------------------------------------------------
    timeit("G exact tier",
           lambda q, ql: so.search_lambda_aware_tilemax(
               X, norms, lams, q, ql, K, al), qb)
    from matternet_rs_tpu.core import _batched_search_b3r_jit
    zero, one = jnp.float32(0.0), jnp.float32(1.0)
    timeit("G lib bf16x3_rescored tier (jit)",
           lambda q, ql: _batched_search_b3r_jit(
               X, norms, lams, q, ql, zero, one, K, 64, al, True), qb)


if __name__ == "__main__":
    main()
