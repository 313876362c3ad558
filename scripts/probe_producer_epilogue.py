"""Decompose the fused producer: dots-only vs +cosine vs +blend vs full."""
import sys, time, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

N, F, B, NB = 1_000_000, 128, 256, 32
TILE = 2048

def make_kernel(stage):
    def kernel(x_ref, nrm_ref, lam_ref, q_ref, qn_ref, ql_ref, al_ref, tm_ref):
        dots = jax.lax.dot_general(
            q_ref[:], x_ref[:], (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        from matternet_rs_tpu.ops.search import _blend, _guarded_cosine
        if stage == "dots":
            s = dots
        elif stage == "cos":
            s = _guarded_cosine(dots, qn_ref[:] * nrm_ref[:])
        elif stage == "cos_recip":
            denom = qn_ref[:] * nrm_ref[:]
            inv = jnp.where(denom > 0.0, 1.0 / denom, 0.0)
            s = jnp.clip(dots * inv, -1.0, 1.0)
        else:
            cos = _guarded_cosine(dots, qn_ref[:] * nrm_ref[:])
            s = _blend(cos, lam_ref[:], ql_ref[:], al_ref[:])
        ts = s.shape[1] // tmf.SUBS
        row = jax.lax.broadcasted_iota(jnp.int32, (tmf.SUBS, s.shape[0]), 0)
        acc = jnp.zeros((tmf.SUBS, s.shape[0]), jnp.float32)
        for g in range(tmf.SUBS):
            m = s[:, g * ts:(g + 1) * ts].max(axis=1)
            acc = jnp.where(row == g, m[None, :], acc)
        tm_ref[:] = acc
    return kernel

@functools.partial(jax.jit, static_argnames=("stage",))
def run(X, norms, lambdas, queries, query_lambdas, alphas, stage):
    n, f = X.shape
    b = queries.shape[0]
    nt0 = n // TILE
    qn = jnp.sqrt(jnp.sum(queries * queries, axis=-1))
    a = jnp.broadcast_to(jnp.asarray(alphas, jnp.float32), (b,))
    tm = pl.pallas_call(
        make_kernel(stage),
        grid=(nt0,),
        in_specs=[
            pl.BlockSpec((TILE, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
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
            flops=2 * b * nt0 * TILE * f,
            bytes_accessed=(nt0 * TILE * f + b * f) * 4,
            transcendentals=0,
        ),
    )(X, norms[None, :], lambdas[None, :], queries, qn[:, None],
      query_lambdas[:, None], a[:, None])
    return tm

rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
norms = jnp.sqrt(jnp.sum(X * X, axis=1))
lams = jnp.asarray(rng.random(N, dtype=np.float32))
float(jnp.sum(norms))
print("uploaded", flush=True)

def bench(fn, args_list):
    out = fn(*args_list[0]); float(jnp.sum(out))
    t0 = time.perf_counter()
    for a in args_list:
        out = fn(*a)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / len(args_list) * 1e3

qs = []
for i in range(NB):
    r = np.random.default_rng(100 + i)
    qs.append((jnp.asarray(r.standard_normal((B, F)).astype(np.float32)),
               jnp.asarray(r.random(B, dtype=np.float32))))
al = jnp.full((B,), 0.7, jnp.float32)

for stage in ("dots", "cos", "cos_recip", "full"):
    args = [(X, norms, lams, q, ql, al, stage) for q, ql in qs]
    ms = min(bench(lambda *a: run(*a), args) for _ in range(3))
    print(f"stage={stage:10s}: {ms:.2f} ms/batch", flush=True)
