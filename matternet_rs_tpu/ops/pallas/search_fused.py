"""Fused batched λ-aware search kernel: score + EXACT top-k in one pass.

The flash-attention idea applied to retrieval: stream X tiles through VMEM,
compute the blended scores for the whole query batch on the MXU, and merge
into a running top-k held in VMEM scratch — the ``[B, N]`` score matrix
never touches HBM.

Selection without a sort primitive (Mosaic has no ``top_k``): a running
threshold θ_b = current k-th best per query prunes tiles whose scores can't
enter the top-k; a merging tile runs k rounds of max / tie-broken
argmin-id / mask over the [B, T+K] candidate block on the VPU.

**Measured verdict (TPU v5e, 1M×128, 256-query batches): DON'T use this in
production.** 327 ms/batch vs 13.5 ms for the XLA flat ``top_k`` path and
2.4 ms for ``lax.approx_max_k``. Two structural reasons: (1) the merge
trigger is per-batch (``any`` over 256 queries), so with large B almost
every tile merges and the pruning assumption collapses; (2) Mosaic fully
unrolls the merge loop (temporaries forced TILE_T down to 512, leaving the
per-tile ``[256,128]×[128,512]`` matmul too small to feed the MXU). The
kernel is kept as a correct, tested (interpret-mode exact) reference for
streamed-top-k construction in Pallas; use
``search_lambda_aware(..., approx=True)`` for throughput.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_T = 512   # merge temporaries scale with T and Mosaic unrolls the k-round loop
K_PAD = 16
_NEG = -3.0e38             # python scalar: jnp constants would be captured
_PAD_LAMBDA = 2.0          # sentinel marking padded rows (real λ ∈ [0, 1])
_BIG_ID = 2**30


def _make_kernel(k_keep: int, alpha: float):
    def kernel(xn_ref, lam_ref, qn_ref, ql_ref, out_val_ref, out_idx_ref,
               run_val, run_idx):
        i = pl.program_id(0)
        nt = pl.num_programs(0)
        T = xn_ref.shape[0]
        B = qn_ref.shape[0]

        @pl.when(i == 0)
        def _():
            run_val[:] = jnp.full_like(run_val, _NEG)
            run_idx[:] = jnp.full_like(run_idx, _BIG_ID)

        Xn = xn_ref[:]                       # [T, F] rows pre-normalized
        lam = lam_ref[:, 0]                  # [T]
        Qn = qn_ref[:]                       # [B, F] pre-normalized
        ql = ql_ref[:, 0]                    # [B]

        cos = jnp.dot(Qn, Xn.T, preferred_element_type=jnp.float32)   # [B, T]
        lam_sim = 1.0 - jnp.minimum(jnp.abs(lam[None, :] - ql[:, None]), 1.0)
        scores = alpha * cos + (1.0 - alpha) * lam_sim
        scores = jnp.where(lam[None, :] > 1.5, _NEG, scores)  # padded rows

        theta = run_val[:, k_keep - 1]       # current k-th best per query
        needs_merge = jnp.any(scores > theta[:, None])

        @pl.when(needs_merge)
        def _():
            comb = jnp.concatenate([scores, run_val[:]], axis=1)      # [B,T+K]
            col = jax.lax.broadcasted_iota(jnp.int32, comb.shape, 1)
            run_cols = jnp.concatenate(
                [jnp.zeros((B, T), jnp.int32), run_idx[:]], axis=1
            )
            gid = jnp.where(col < T, i * T + col, run_cols)
            kcol = jax.lax.broadcasted_iota(jnp.int32, (B, run_val.shape[1]), 1)

            # fori_loop (not unrolled): Mosaic reuses one body's buffers —
            # an unrolled Python loop kept every round's temporaries live
            # and blew the VMEM budget. The round's output column is placed
            # with a one-hot mask (dynamic lane-index writes aren't a thing).
            def round_body(r, carry):
                comb, out_v, out_i = carry
                m = jnp.max(comb, axis=1)                              # [B]
                is_max = comb == m[:, None]
                sel_id = jnp.min(jnp.where(is_max, gid, _BIG_ID), axis=1)
                onehot = kcol == r
                out_v = jnp.where(onehot, m[:, None], out_v)
                out_i = jnp.where(onehot, sel_id[:, None], out_i)
                taken = is_max & (gid == sel_id[:, None])
                comb = jnp.where(taken, _NEG, comb)
                return comb, out_v, out_i

            _, out_v, out_i = jax.lax.fori_loop(
                0, k_keep, round_body, (comb, run_val[:], run_idx[:])
            )
            run_val[:] = out_v
            run_idx[:] = out_i

        @pl.when(i == nt - 1)
        def _():
            out_val_ref[:] = run_val[:]
            out_idx_ref[:] = run_idx[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "alpha", "interpret"))
def search_fused_pallas(
    Xn: jax.Array,
    lambdas: jax.Array,
    Qn: jax.Array,
    q_lambdas: jax.Array,
    k: int,
    alpha: float = 0.7,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact blended top-k for a query batch, single HBM pass over ``Xn``.

    ``Xn [N, F]`` and ``Qn [B, F]`` must be row-normalized (cosine becomes a
    plain dot); ``lambdas/q_lambdas`` normalized λ ∈ [0, 1]. Returns
    ``(indices [B, k], scores [B, k])`` sorted descending, ties toward the
    smaller index.
    """
    n, f = Xn.shape
    b = Qn.shape[0]
    if k > K_PAD:
        raise ValueError(
            f"search_fused_pallas keeps a fixed K_PAD={K_PAD}-wide running "
            f"top-k in VMEM; k={k} exceeds it (use lax.top_k for larger k)"
        )
    k_keep = min(max(k, 1), K_PAD, n)

    n_pad = (-n) % TILE_T
    f_pad = (-f) % 128
    b_pad = (-b) % 8
    if f_pad:
        Xn = jnp.pad(Xn, ((0, 0), (0, f_pad)))
        Qn = jnp.pad(Qn, ((0, 0), (0, f_pad)))
    if n_pad:
        Xn = jnp.pad(Xn, ((0, n_pad), (0, 0)))
        lambdas = jnp.pad(lambdas, (0, n_pad), constant_values=_PAD_LAMBDA)
    if b_pad:
        Qn = jnp.pad(Qn, ((0, b_pad), (0, 0)))
        q_lambdas = jnp.pad(q_lambdas, (0, b_pad))
    np_, fp = Xn.shape
    bp = Qn.shape[0]

    vals, idx = pl.pallas_call(
        _make_kernel(k_keep, float(alpha)),
        out_shape=(
            jax.ShapeDtypeStruct((bp, K_PAD), jnp.float32),
            jax.ShapeDtypeStruct((bp, K_PAD), jnp.int32),
        ),
        grid=(np_ // TILE_T,),
        in_specs=[
            pl.BlockSpec((TILE_T, fp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, fp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bp, K_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, K_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bp, K_PAD), jnp.float32),
            pltpu.VMEM((bp, K_PAD), jnp.int32),
        ],
        interpret=interpret,
        # Mosaic fully unrolls the k-round merge; its temporaries exceed the
        # default 16M scoped-vmem budget. ~80M fits v5e's 128M VMEM alongside
        # the streamed operand windows.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=80 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * np_ * fp,
            bytes_accessed=(np_ * fp + bp * fp) * 4,
            transcendentals=0,
        ),
    )(
        Xn.astype(jnp.float32),
        lambdas.astype(jnp.float32).reshape(np_, 1),
        Qn.astype(jnp.float32),
        q_lambdas.astype(jnp.float32).reshape(bp, 1),
    )
    return idx[:b, :k_keep], vals[:b, :k_keep]
