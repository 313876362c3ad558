"""Probe 2: diagnose the F>128 in-kernel divergence.

- prints max RELATIVE error (not just ulps) for the direct in-kernel dot,
- tries an explicit 3-pass bf16 error-compensated decomposition
  (hi/lo splitting — what XLA's HIGHEST lowers to on TPU),
- tries f32 elementwise multiply-accumulate via chunked VPU ops,
- retries one failing remote-compile case with the full error text.
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from matternet_rs_tpu.ops._mm import mm  # noqa: E402

B, T = 256, 2048


def _dot_raw(q, x, prec):
    return jax.lax.dot_general(
        q, x, (((1,), (1,)), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32,
    )


def make_kernel(variant: str):
    def kernel(q_ref, x_ref, o_ref):
        q = q_ref[:]
        x = x_ref[:]
        if variant == "direct":
            o_ref[:] = _dot_raw(q, x, jax.lax.Precision.HIGHEST)
        elif variant == "default":
            o_ref[:] = _dot_raw(q, x, jax.lax.Precision.DEFAULT)
        elif variant == "3pass":
            qh = q.astype(jnp.bfloat16)
            xh = x.astype(jnp.bfloat16)
            ql = (q - qh.astype(jnp.float32)).astype(jnp.bfloat16)
            xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)

            def d(a, b):
                return jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32,
                )

            o_ref[:] = d(qh, xh) + (d(qh, xl) + d(ql, xh))
        elif variant == "3passb":
            qh = q.astype(jnp.bfloat16)
            xh = x.astype(jnp.bfloat16)
            ql = (q - qh.astype(jnp.float32)).astype(jnp.bfloat16)
            xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)

            def d(a, b):
                return jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32,
                )

            o_ref[:] = (d(qh, xl) + d(ql, xh)) + d(qh, xh)
        return

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "f"))
def run_kernel(q, x, variant: str, f: int):
    return pl.pallas_call(
        make_kernel(variant),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, T), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, x)


def report(name, out, ref):
    n_mis = int((out != ref).sum())
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-12)
    print(f"  {name:8s} mismatches={n_mis:8d}/{out.size} "
          f"max_rel={rel.max():.3e}")


def main():
    print("backend:", jax.devices()[0].platform)
    key = jax.random.PRNGKey(0)
    for f in (128, 256, 512, 1536):
        kq, kx = jax.random.split(jax.random.fold_in(key, f))
        q = jax.random.normal(kq, (B, f), jnp.float32)
        x = jax.random.normal(kx, (T, f), jnp.float32)
        ref = np.asarray(mm(q, x.T))
        print(f"F={f}")
        for v in ("direct", "default", "3pass", "3passb"):
            try:
                out = np.asarray(run_kernel(q, x, v, f))
            except Exception as e:  # noqa: BLE001
                msg = repr(e)
                print(f"  {v:8s} ERROR {msg[:400]}")
                continue
            report(v, out, ref)


if __name__ == "__main__":
    main()
