"""Probe: can an in-kernel Pallas dot reproduce XLA's HIGHEST matmul
bitwise at contraction sizes F > 128?

The fused score+tilemax producer (ops/pallas/tilemax_fused.py) is capped
at MAX_FUSED_F = 128 because the measured bitwise-parity envelope ended
there in the first round-3 sweep. This probe re-checks the envelope
systematically on the real chip:

  variant "direct"   — one dot_general over the full K (what the kernel
                       does today),
  variant "ltr"      — left-to-right 128-chunk accumulation,
  variant "rtl"      — right-to-left 128-chunk accumulation,
  variant "tree"     — pairwise-tree reduction over 128-chunks,
  variant "dot256".. — direct dot at coarser chunk splits (256/512).

For each F in {256, 384, 512, 768, 1536} and each variant, reports the
number of mismatching bits vs ops._mm.mm and the max ulp distance.

Run on the real TPU attachment (no JAX_PLATFORMS override).
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


def _dot(q, x):
    return jax.lax.dot_general(
        q, x, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def make_kernel(variant: str, f: int):
    def kernel(q_ref, x_ref, o_ref):
        q = q_ref[:]
        x = x_ref[:]
        if variant == "direct":
            o_ref[:] = _dot(q, x)
            return
        if variant.startswith("dot"):
            c = int(variant[3:])
        else:
            c = 128
        chunks = [
            _dot(q[:, i:i + c], x[:, i:i + c]) for i in range(0, f, c)
        ]
        if variant == "rtl":
            chunks = chunks[::-1]
        if variant == "tree":
            while len(chunks) > 1:
                nxt = []
                for i in range(0, len(chunks) - 1, 2):
                    nxt.append(chunks[i] + chunks[i + 1])
                if len(chunks) % 2:
                    nxt.append(chunks[-1])
                chunks = nxt
            o_ref[:] = chunks[0]
            return
        acc = chunks[0]
        for ch in chunks[1:]:
            acc = acc + ch
        o_ref[:] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "f"))
def run_kernel(q, x, variant: str, f: int):
    return pl.pallas_call(
        make_kernel(variant, f),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, T), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T), jnp.float32),
    )(q, x)


def ulps(a: np.ndarray, b: np.ndarray) -> int:
    ai = a.view(np.int32).astype(np.int64)
    bi = b.view(np.int32).astype(np.int64)
    # map to monotonic integer space
    ai = np.where(ai < 0, np.int64(0x80000000) - ai, ai)
    bi = np.where(bi < 0, np.int64(0x80000000) - bi, bi)
    return int(np.abs(ai - bi).max())


def main():
    print("backend:", jax.devices()[0].platform)
    key = jax.random.PRNGKey(0)
    for f in (256, 384, 512, 768, 1536):
        kq, kx = jax.random.split(jax.random.fold_in(key, f))
        q = jax.random.normal(kq, (B, f), jnp.float32)
        x = jax.random.normal(kx, (T, f), jnp.float32)
        ref = np.asarray(mm(q, x.T))
        variants = ["direct", "ltr", "rtl", "tree", "dot256", "dot512"]
        for v in variants:
            if v.startswith("dot") and f % int(v[3:]) != 0:
                continue
            if not v.startswith("dot") and v != "direct" and f % 128 != 0:
                continue
            try:
                out = np.asarray(run_kernel(q, x, v, f))
            except Exception as e:  # noqa: BLE001
                print(f"F={f:5d} {v:8s} ERROR {repr(e)[:120]}")
                continue
            n_mis = int((out != ref).sum())
            u = ulps(out, ref) if n_mis else 0
            print(f"F={f:5d} {v:8s} mismatches={n_mis:8d}/{out.size} "
                  f"max_ulp={u}")


if __name__ == "__main__":
    main()
