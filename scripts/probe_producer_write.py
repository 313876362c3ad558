"""Probe: producer WITHOUT the [B,N] score write - is the write on the
critical path? maxima-only vs full fused producer at 1M x 128, B=256."""
import sys, time, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
from matternet_rs_tpu.ops import search as so
from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

N, F, B, K, NB = 1_000_000, 128, 256, 10, 32
TILE = 2048

def _maxonly_kernel(x_ref, nrm_ref, lam_ref, q_ref, qn_ref, ql_ref, al_ref,
                    tm_ref):
    dots = jax.lax.dot_general(
        q_ref[:], x_ref[:], (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    from matternet_rs_tpu.ops.search import _blend, _guarded_cosine
    cos = _guarded_cosine(dots, qn_ref[:] * nrm_ref[:])
    s = _blend(cos, lam_ref[:], ql_ref[:], al_ref[:])
    ts = s.shape[1] // tmf.SUBS
    row = jax.lax.broadcasted_iota(jnp.int32, (tmf.SUBS, s.shape[0]), 0)
    acc = jnp.zeros((tmf.SUBS, s.shape[0]), jnp.float32)
    for g in range(tmf.SUBS):
        m = s[:, g * ts:(g + 1) * ts].max(axis=1)
        acc = jnp.where(row == g, m[None, :], acc)
    tm_ref[:] = acc

@functools.partial(jax.jit, static_argnames=("tile",))
def maxonly(X, norms, lambdas, queries, query_lambdas, alphas, tile=TILE):
    n, f = X.shape
    b = queries.shape[0]
    nt0 = n // tile
    qn = jnp.sqrt(jnp.sum(queries * queries, axis=-1))
    a = jnp.broadcast_to(jnp.asarray(alphas, jnp.float32), (b,))
    tm = pl.pallas_call(
        _maxonly_kernel,
        grid=(nt0,),
        in_specs=[
            pl.BlockSpec((tile, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tmf.SUBS, b), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt0 * tmf.SUBS, b), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nt0 * tile * f,
            bytes_accessed=(nt0 * tile * f + b * f) * 4,
            transcendentals=0,
        ),
    )(X, norms[None, :], lambdas[None, :], queries, qn[:, None],
      query_lambdas[:, None], a[:, None])
    return tm.T

rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
norms = jnp.sqrt(jnp.sum(X * X, axis=1))
lams = jnp.asarray(rng.random(N, dtype=np.float32))
float(jnp.sum(norms))
print("uploaded", flush=True)

def bench(fn, args_list, red):
    out = fn(*args_list[0]); float(jnp.sum(red(out)))
    t0 = time.perf_counter()
    for a in args_list:
        out = fn(*a)
    float(jnp.sum(red(out)))
    return (time.perf_counter() - t0) / len(args_list) * 1e3

qs = []
for i in range(NB):
    r = np.random.default_rng(100 + i)
    qs.append((jnp.asarray(r.standard_normal((B, F)).astype(np.float32)),
               jnp.asarray(r.random(B, dtype=np.float32))))
al = jnp.full((B,), 0.7, jnp.float32)

args = [(X, norms, lams, q, ql, al) for q, ql in qs]
ms_mo = min(bench(maxonly, args, lambda o: o) for _ in range(3))
print(f"maxima-only producer: {ms_mo:.2f} ms/batch", flush=True)

args2 = [(X, norms, lams, q, ql, al) for q, ql in qs]
ms_full = min(bench(lambda *a: tmf.scores_and_tilemax(*a[:5], a[5])[1], args2,
                    lambda o: o) for _ in range(3))
print(f"full producer (scores+maxima): {ms_full:.2f} ms/batch", flush=True)

# full routed pipeline for context
args3 = [(X, norms, lams, q, ql, K, al) for q, ql in qs]
ms_e2e = min(bench(lambda *a: so.search_lambda_aware_tilemax(*a), args3,
                   lambda o: o[1]) for _ in range(3))
print(f"end-to-end fused tilemax: {ms_e2e:.2f} ms/batch", flush=True)

# parity of maxima
tm1 = maxonly(X, norms, lams, qs[0][0], qs[0][1], al)
_, tm2 = tmf.scores_and_tilemax(X, norms, lams, qs[0][0], qs[0][1], al)
print("maxima bitwise equal:", (np.asarray(tm1) == np.asarray(tm2)).all(), flush=True)
