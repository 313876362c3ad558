"""Fused λ-aware score + tile-max producer for tile-max pruned selection.

Why this kernel exists (measured on v5e, 1M×128 corpus, 256-query
batches — `scripts/` decomposition sweep, DESIGN.md "Fused score+tilemax
producer"): the exact batched scan's 10.88 ms/batch decomposed as

* 2.95 ms  — XLA matmul (HIGHEST) + blend, writing the [B, N] scores,
* 4.85 ms  — re-READING those scores in (B, tile) blocks for the
  per-tile max. This is a multi-segment strided DMA pattern and is
  hard-capped at ~215 GB/s on this part regardless of segment size
  (64 KB segments measured identical to 8 KB) or row-stride padding,
  while contiguous reads run ~475 GB/s and (B, tile)-block WRITES
  ~575 GB/s — the read path, not the write path, is the slow direction,
* 3.1 ms   — candidate tile gather, ~0.35 ms — final small top_k.

So the fix is to never re-read: stream corpus tiles (contiguous
[tile, F] reads), compute the whole query batch's blended scores on the
MXU, write each [B, tile] score block once (fast direction), and reduce
the block's per-query maxima while the data is still VMEM-resident.
The 4.85 ms tile-max pass disappears from the HBM budget entirely.

Parity: for F ≤ 128 the in-kernel ``dot_general`` at
``Precision.HIGHEST`` was measured BITWISE-identical to the XLA
``ops._mm.mm`` path on TPU, and the blend uses the exact formula of
``ops.search._batched_scores`` (zero-norm-guarded cosine,
``α·cos + (1-α)·(1-min(|Δλ|,1))``) — a parity test pins the produced
scores bit-for-bit against the XLA producer so the flat/tilemax/streamed
bit-identity contracts survive. For 128 < F ≤ MAX_FUSED_F_WIDE the
producer runs in SELF-CONSISTENT mode (see the constants block below):
scores sit within f32 accumulation-reorder distance of the XLA
producer's and the caller returns the kernel's own scores, so the
selection is exact with respect to the scores it returns.

Reference behavior: ``/root/reference/src_legacy/core.rs:1156-1193``
(λ-aware scan semantics); selection contract in ``ops/search.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Bitwise-parity envelope, measured on v5e (scripts sweep): the in-kernel
# HIGHEST dot matches XLA's `mm` bit-for-bit for F ≤ 128 (one lane-tile
# contraction) and B ≥ 2 (XLA switches to a differently-accumulated
# matvec at B=1). F > 128 splits the contraction across lane tiles and
# NO probed in-kernel formulation reproduces XLA's accumulation (direct
# wide-K HIGHEST, left-to-right / right-to-left / pairwise-tree 128-chunk
# f32 summation, and the explicit 3-pass bf16 hi/lo decomposition were
# all measured on-chip — scripts/probe_fused_f*.py — and every one
# diverges; the wide-K Mosaic lowering is not even within plain-f32
# reorder distance of XLA's).
#
# So for MAX_FUSED_F < F ≤ MAX_FUSED_F_WIDE the fused producer runs in
# SELF-CONSISTENT mode instead: the kernel accumulates 128-wide HIGHEST
# chunk dots left-to-right in f32 (each chunk bitwise == XLA's chunk
# matmul), and the caller uses the kernel's scores for BOTH selection
# and the returned values — the result is exactly "top-k of the scores
# this program computes", while those scores sit within f32
# accumulation-reorder distance (~1e-6 rel) of the XLA producer's.
# Ranking can differ from the flat/single-query kernels only among items
# whose blended scores tie within that error — the same near-tie class
# the tilemax tie-substitution contract already names. F ≤ MAX_FUSED_F
# keeps the bitwise guarantee: a single chunk IS the old kernel.
MAX_FUSED_F = 128
MAX_FUSED_F_WIDE = 2048
MIN_FUSED_B = 2
MAX_FUSED_B = 1024

# K-chunk width for the wide-F self-consistent mode (one lane tile — the
# bitwise unit of the parity envelope).
K_CHUNK = 128


# Sub-tile maxima per corpus block: selection granularity is decoupled
# from the DMA/matmul granularity. Finer sub-tiles shrink the candidate
# gather 8x (the next-largest cost after the producer) at no extra HBM
# traffic — the maxima come off VMEM-resident data — and SUBS=8 makes
# each grid step own exactly one (8, B) output block, no masking.
SUBS = 8


def _chunk_dot(q, x):
    """[B, T] chunk dot on the MXU — HIGHEST is bitwise == ops._mm.mm on
    TPU for K ≤ 128 (one lane tile)."""
    return jax.lax.dot_general(
        q, x, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _kernel(x_ref, nrm_ref, lam_ref, q_ref, qn_ref, ql_ref, al_ref, mf_ref,
            s_ref, tm_ref):
    i = pl.program_id(0)
    f = q_ref.shape[1]
    if f <= K_CHUNK:
        # Bitwise envelope: one lane-tile contraction == XLA's mm.
        dots = _chunk_dot(q_ref[:], x_ref[:])
    else:
        # Wide-F self-consistent mode: left-to-right f32 accumulation of
        # bitwise-exact 128-chunks (see module constants for the contract).
        dots = _chunk_dot(q_ref[:, :K_CHUNK], x_ref[:, :K_CHUNK])
        for lo in range(K_CHUNK, f, K_CHUNK):
            hi = min(lo + K_CHUNK, f)
            dots = dots + _chunk_dot(q_ref[:, lo:hi], x_ref[:, lo:hi])
    # THE canonical scoring helpers (ops/search.py) traced into the kernel
    # on VMEM-resident data — the bitwise-parity contract with
    # _batched_scores depends on these staying the same functions.
    from matternet_rs_tpu.ops.search import _blend, _guarded_cosine

    cos = _guarded_cosine(dots, qn_ref[:] * nrm_ref[:])          # [B,1]*[1,T]
    s = _blend(cos, lam_ref[:], ql_ref[:], al_ref[:])            # al: [B, 1]
    # Padded-row mask (the sharded path's rows past n_items): -inf from
    # local row ``mask_from``. The default mask_from = n0 never fires and
    # leaves scores bitwise-untouched.
    col = i * s.shape[1] + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col >= mf_ref[0, 0], -jnp.inf, s)
    s_ref[:] = s

    # Per-query sub-tile maxima while resident, one row per sub-tile
    # (dynamic sublane writes aren't a thing in Mosaic, so build the
    # (SUBS, B) block with iota masks).
    ts = s.shape[1] // SUBS
    row = jax.lax.broadcasted_iota(jnp.int32, (SUBS, s.shape[0]), 0)
    acc = jnp.zeros((SUBS, s.shape[0]), jnp.float32)
    for g in range(SUBS):
        m = s[:, g * ts:(g + 1) * ts].max(axis=1)                # [B]
        acc = jnp.where(row == g, m[None, :], acc)
    tm_ref[:] = acc


def _scan_dots_kernel(q, x):
    """Reduced-precision scan dots for the maxima-first rescored tiers,
    dispatched on the corpus tile's dtype at trace time:

    * bf16 corpus → ONE MXU pass, f32 accumulation (1/6th the passes of
      the f32 HIGHEST decomposition and half the corpus read). Error =
      bf16 rounding of corpus AND query elements.
    * int8 corpus → ONE MXU pass over a LOSSLESS bf16 upcast (every
      int8 value is an integer in [-127, 127], exactly representable in
      bf16's 8 mantissa bits) at a QUARTER of the f32 corpus read. The
      caller folds the per-row dequant multiplier into the epilogue's
      ``rn`` factor, so the blend stays multiply/add-only. Error = int8
      quantization of the corpus + bf16 rounding of the query — the
      per-row absmax grid that measured recall ~0.99 on the clustered
      1M fixture where plain bf16 rounding capped at ~0.72.
    * f32 corpus → bf16x3 (three MXU passes over an explicit hi/lo
      split of both operands — the classic f32≈bf16³ decomposition,
      ~21 effective mantissa bits). Half the MXU passes of HIGHEST at
      the full f32 corpus read. This is NOT the bitwise-XLA chunk dot
      (`_chunk_dot`): the maxima-first tiers never return these scores,
      so the contract is precision, not parity.

    Why precision matters here and one-pass bf16 is NOT enough as the
    only mode: measured at 1M on the clustered bench fixture, bf16
    corpus rounding alone caps recall@10 at ~0.72 no matter how many
    candidates are rescored (the cluster-offset coordinate rounds with a
    ~0.25 ulp at magnitude 40, scrambling rankings whose true margins
    are ~1e-5) — while the int8 tier survives (0.9875) because per-row
    absmax scaling makes the largest-magnitude coordinate EXACT. bf16x3
    restores ~f32-grade scan ranking at half the exact tier's compute.
    """
    dn = (((1,), (1,)), ((), ()))
    if x.dtype in (jnp.bfloat16, jnp.int8):
        return jax.lax.dot_general(
            q.astype(jnp.bfloat16), x.astype(jnp.bfloat16), dn,
            preferred_element_type=jnp.float32,
        )
    qhi = q.astype(jnp.bfloat16)
    qlo = (q - qhi.astype(jnp.float32)).astype(jnp.bfloat16)
    xhi = x.astype(jnp.bfloat16)
    xlo = (x - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
    # Both cross terms ride ONE K=2F contraction ([qhi|qlo]·[xlo|xhi]):
    # the MXU accumulates all 2F products in f32 — same math as summing
    # the two K=F dots (the tiers' contract is precision, not bitwise),
    # one fewer MXU dispatch per tile.
    cross = jax.lax.dot_general(
        jnp.concatenate([qhi, qlo], axis=1),
        jnp.concatenate([xlo, xhi], axis=1),
        dn, preferred_element_type=jnp.float32,
    )
    return cross + jax.lax.dot_general(
        qhi, xhi, dn, preferred_element_type=jnp.float32
    )


def _make_kernel_tilemax_only(subs: int, masked: bool):
    def _kernel_tilemax_only(x_ref, rn_ref, lam_ref, q_ref, aqrn_ref,
                             beta_ref, ql_ref, mf_ref, tm_ref):
        """Maxima-first producer: per-sub-tile maxima of the blended
        scores, NO [B, N] score write. The rescored tiers exact-rescore
        every row of the selected sub-tiles downstream, so the full score
        matrix is never needed — HBM traffic collapses to the corpus read
        + a [ns, B] maxima block. (The score-writing bf16 variant was
        measured and rejected: its [B, N] bf16 write fed a top-`cand`
        pool cut over bf16-rounded scores, which collapse into tie groups
        of 30-90+ at the pool boundary on clustered corpora — see
        DESIGN.md "Rescored tiers, maxima-first".)

        CHEAP epilogue (measured: lib scan 1.865 → 1.076 ms at 1M×128,
        B=256 — the guarded-divide cosine was ~0.8 ms of unhidden VPU
        once the MXU dropped from 6 HIGHEST passes to 1-3): the caller
        precomputes reciprocal norms (``rn`` — 0 for zero-norm rows, the
        same guard semantics) and folds α into the per-query scale
        (``aqrn = α/qn``), so the blend is pure multiplies/adds:

            s = dots·rn·aqrn + β − β·min(|λ−λq|, 1),   β = 1−α.

        These maxima deviate from the exact blend only by the scan dots'
        rounding plus ~2 ulp of reciprocal-vs-divide — selection-grade,
        never returned.
        """
        dots = _scan_dots_kernel(q_ref[:], x_ref[:])
        s = dots * rn_ref[:] * aqrn_ref[:]
        lam_pen = jnp.minimum(jnp.abs(lam_ref[:] - ql_ref[:]), 1.0)
        s = s + (beta_ref[:] - beta_ref[:] * lam_pen)
        if masked:
            # Padded-row mask (sharded path only): ~3 VPU ops/element —
            # a measured ~0.3 ms/batch at 1M that unmasked callers
            # (mask_from=None, the rescored tiers) skip at trace time.
            i = pl.program_id(0)
            col = i * s.shape[1] + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 1
            )
            s = jnp.where(col >= mf_ref[0, 0], -jnp.inf, s)
        ts = s.shape[1] // subs
        row = jax.lax.broadcasted_iota(jnp.int32, (subs, s.shape[0]), 0)
        acc = jnp.zeros((subs, s.shape[0]), jnp.float32)
        for g in range(subs):
            m = s[:, g * ts:(g + 1) * ts].max(axis=1)            # [B]
            acc = jnp.where(row == g, m[None, :], acc)
        tm_ref[:] = acc

    return _kernel_tilemax_only


@functools.partial(jax.jit, static_argnames=("tile", "subs", "interpret"))
def tilemax_only(
    X: jax.Array,
    norms: jax.Array,
    lambdas: jax.Array,
    queries: jax.Array,
    query_lambdas: jax.Array,
    alphas: jax.Array,
    tile: int = 2048,
    subs: int = SUBS,
    interpret: bool = False,
    mask_from: jax.Array | None = None,
    rn: jax.Array | None = None,
) -> jax.Array:
    """Per-sub-tile score maxima for the first ``(N // tile) * tile``
    corpus rows in one pass, WITHOUT writing the score matrix.

    Scan precision follows ``X.dtype`` (see :func:`_scan_dots_kernel`):
    bf16 corpus → one-pass bf16 dots; f32 corpus → three-pass bf16x3
    (~f32-grade). Norms/λ stay f32; the cosine uses precomputed
    reciprocal norms (see the kernel docstring) so the maxima sit within
    scan-dot rounding + ~2 ulp of the exact blend — selection-grade.

    ``subs`` picks the selection granularity (sub-tile = ``tile/subs``
    rows): the rescored tiers run ``subs=16`` (128-row slabs — half the
    slab-rescore traffic of the exact tier's SUBS=8 at +0.15 ms scan).

    ``rn`` overrides the per-corpus-row cosine factor (default: guarded
    ``1/norms``). The int8 tier passes its dequant-to-cosine multiplier
    ``scale_r/|x_r|`` here, so dequantization costs ZERO extra kernel
    work — it rides the multiply the blend already does.

    Returns ``submax [B, nt0 * subs]`` — sub-tile j covers corpus rows
    ``[j*(tile/subs), (j+1)*(tile/subs))``. Callers rescore the selected
    sub-tiles' rows exactly from the f32 corpus.
    """
    n, f = X.shape
    b = queries.shape[0]
    nt0 = n // tile
    n0 = nt0 * tile

    qn = jnp.sqrt(jnp.sum(queries * queries, axis=-1))           # [B]
    a = jnp.broadcast_to(jnp.asarray(alphas, jnp.float32), (b,))
    if rn is None:
        rn = jnp.where(norms > 1e-12, 1.0 / jnp.maximum(norms, 1e-12), 0.0)
    else:
        rn = jnp.asarray(rn, jnp.float32)
    aqrn = a / jnp.maximum(qn, 1e-12)
    beta = 1.0 - a
    mf = jnp.asarray(n0 if mask_from is None else mask_from, jnp.int32)

    tmax_t = pl.pallas_call(
        _make_kernel_tilemax_only(subs, mask_from is not None),
        grid=(nt0,),
        in_specs=[
            pl.BlockSpec((tile, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (subs, b), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nt0 * subs, b), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=None if interpret else pl.CostEstimate(
            # one bf16 MXU pass for bf16 AND int8 (lossless upcast) scans
            flops=(6 if X.dtype == jnp.float32 else 2) * b * n0 * f,
            bytes_accessed=n0 * f * X.dtype.itemsize + b * f * 4,
            transcendentals=0,
        ),
    )(
        X,
        rn[None, :],
        lambdas[None, :],
        queries,
        aqrn[:, None],
        beta[:, None],
        query_lambdas[:, None],
        mf.reshape(1, 1),
    )
    return tmax_t.T


def tilemax_only_supported(n: int, f: int, b: int, tile: int,
                           subs: int = SUBS) -> bool:
    """Envelope for the maxima-first producer (both scan dtypes): shape
    limits as the fused producer, but the VMEM budget drops the score
    output planes (only the corpus tile, query block, hi/lo splits and
    the dot/blend temporaries are resident)."""
    if n < tile or f > MAX_FUSED_F_WIDE:
        return False
    if b < MIN_FUSED_B or b > MAX_FUSED_B:
        return False
    if tile % (subs * 128) != 0:
        return False
    # corpus tile double-buffered (≤4B/elt) + bf16 hi/lo splits (2B each)
    # + query block + 3 [b, tile] f32 dot/blend temporaries.
    if (2 * tile * f * 4 + 4 * tile * f + b * f * 8
            + 3 * b * tile * 4) > 90 * 1024 * 1024:
        return False
    try:
        platform = jax.devices()[0].platform.lower()
    except RuntimeError:
        return False
    return "tpu" in platform or "axon" in platform


# Outstanding-DMA depth for the ring slab reader: an auto-pipelined
# scalar-prefetch BlockSpec variant kept ONE 64 KB slab copy in flight
# (double-buffered) and measured 119 GB/s — HBM-latency-bound, ~0.55 µs
# per transfer (probe v5; that variant is superseded by this kernel).
# Eight in flight hides the latency (208 GB/s measured, probe v6).
DMA_RING_DEPTH = 8


def _make_kernel_slab_dots_ring(c: int, ts: int, depth: int, nslabs: int,
                                int8_rows: bool = False):
    def kern(sel_ref, x_hbm, q_ref, d_ref, xbuf, sems):
        def dma(idx, slot):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(sel_ref[idx] * ts, ts), :],
                xbuf.at[slot],
                sems.at[slot],
            )

        for d in range(depth):                 # prime the ring
            dma(d, d).start()

        def body(i, _):
            slot = jax.lax.rem(i, depth)
            dma(i, slot).wait()
            qi = i // c
            q8 = q_ref[pl.ds((qi // 8) * 8, 8), :]           # [8, F]
            if int8_rows:
                # int8 slab rows (the resident-sketch tier): LOSSLESS
                # bf16 upcast, one MXU pass — the same contract as the
                # maxima-first scan's int8 mode (_scan_dots_kernel).
                dots8 = jax.lax.dot_general(
                    q8.astype(jnp.bfloat16),
                    xbuf[slot].astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                dots8 = jax.lax.dot_general(
                    q8, xbuf[slot], (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )                                            # [8, ts]
            rowm = (jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                    == jax.lax.rem(qi, 8))
            d_ref[:, pl.ds(i * ts, ts)] = jnp.sum(
                jnp.where(rowm, dots8, 0.0), axis=0, keepdims=True
            )

            @pl.when(i + depth < nslabs)
            def _():
                dma(i + depth, slot).start()

            return 0

        jax.lax.fori_loop(0, nslabs, body, 0)

    return kern


@functools.partial(jax.jit, static_argnames=("ts", "interpret"))
def slab_dots_ring(
    X: jax.Array,
    queries: jax.Array,
    sel: jax.Array,
    ts: int,
    interpret: bool = False,
) -> jax.Array:
    """HIGHEST-precision dots of each query against every row of its
    selected sub-tile slabs, via a manual ring of ``DMA_RING_DEPTH``
    outstanding HBM→VMEM slab copies.

    Motivation (measured at 1M×128, B=256, c=14, ts=128): the
    auto-pipelined scalar-prefetch BlockSpec variant kept one 64 KB
    slab in flight and ran at 119 GB/s (1.97 ms) — latency-bound, the
    wall of the maxima-first design; XLA's own row gather was worse
    still (~100 GB/s). The ring keeps 8 in flight (208 GB/s measured);
    the corpus stays in HBM (``memory_space=ANY``) and one grid step
    drives the whole gather from an in-kernel ``fori_loop``.

    ``X [n, F]`` f32 — or int8 (the resident-sketch tier): int8 slabs
    ride a lossless bf16 upcast in the kernel's dot, and the DMA moves a
    quarter of the f32 bytes. ``sel [B, c]`` int32 sub-tile ids (rows
    ``[sel·ts, (sel+1)·ts)`` all in-bounds), B a multiple of 8 (the
    query block is sliced 8-wide and the row extracted by iota mask —
    M=8 is the Mosaic minimum and costs the same MXU time as a padded
    matvec). Returns dots ``[B, c, ts]`` f32; the caller applies the
    canonical cosine/λ-blend epilogue (a [B, c·ts] XLA elementwise pass
    — trivial next to the slab read).
    """
    b, f = queries.shape
    c = sel.shape[1]
    if b % 8:
        raise ValueError(
            f"slab_dots_ring needs the query batch padded to a multiple "
            f"of 8, got B={b}"
        )
    nslabs = b * c
    depth = min(DMA_RING_DEPTH, nslabs)
    sel_flat = sel.reshape(nslabs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((b, f), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nslabs * ts), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((depth, ts, f), X.dtype),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel_slab_dots_ring(
            c, ts, depth, nslabs, int8_rows=X.dtype == jnp.int8
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, nslabs * ts), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=None if interpret else pl.CostEstimate(
            flops=(2 if X.dtype == jnp.int8 else 6) * b * c * ts * f,
            bytes_accessed=b * c * ts * f * X.dtype.itemsize + b * f * 4,
            transcendentals=0,
        ),
    )(sel_flat, X, queries)
    return out.reshape(b, c, ts)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def scores_and_tilemax(
    X: jax.Array,
    norms: jax.Array,
    lambdas: jax.Array,
    queries: jax.Array,
    query_lambdas: jax.Array,
    alphas: jax.Array,
    tile: int = 2048,
    interpret: bool = False,
    mask_from: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Blended score matrix for the first ``(N // tile) * tile`` corpus rows
    plus per-SUB-tile maxima, in ONE corpus pass.

    ``mask_from`` (traced int32 scalar, optional): scores for local rows
    ≥ mask_from become -inf — the sharded path's padded-row mask, applied
    in-kernel so the score buffer is never re-touched. Default never fires.

    Returns ``(scores [B, n0], submax [B, nt0 * SUBS])`` with
    ``nt0 = N // tile``, ``n0 = nt0 * tile``; sub-tile ``j`` covers score
    columns ``[j * tile/SUBS, (j+1) * tile/SUBS)``. The ragged tail's
    scores are NOT computed here — the tile-max selection always includes
    the tail in the candidate set, so the caller scores it separately (a
    ≤ tile-column XLA pass).

    ``alphas`` must be a ``[B]`` vector (the serve contract); scalars are
    broadcast by the caller.
    """
    n, f = X.shape
    b = queries.shape[0]
    nt0 = n // tile
    n0 = nt0 * tile

    qn = jnp.sqrt(jnp.sum(queries * queries, axis=-1))           # [B]
    a = jnp.broadcast_to(jnp.asarray(alphas, jnp.float32), (b,))
    mf = jnp.asarray(n0 if mask_from is None else mask_from, jnp.int32)

    scores, tmax_t = pl.pallas_call(
        _kernel,
        grid=(nt0,),
        in_specs=[
            pl.BlockSpec((tile, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            # each grid step owns exactly one (SUBS, B) sub-maxima block
            pl.BlockSpec((SUBS, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n0), jnp.float32),
            jax.ShapeDtypeStruct((nt0 * SUBS, b), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=None if interpret else pl.CostEstimate(
            flops=2 * b * n0 * f,
            bytes_accessed=(n0 * f + b * f + b * n0) * 4,
            transcendentals=0,
        ),
    )(
        X,
        norms[None, :],
        lambdas[None, :],
        queries,
        qn[:, None],
        query_lambdas[:, None],
        a[:, None],
        mf.reshape(1, 1),
    )
    return scores, tmax_t.T


# --------------------------------------------------------------------------
# Candidate sub-tile gather
# --------------------------------------------------------------------------
# XLA's take_along_axis over the [B, ns, ts] score view is per-slice
# latency-bound (~0.9 µs per (query, slot) slice → 3.2-3.6 ms for 256
# queries × 14 slots, regardless of slice width). This kernel instead
# issues all GQ·c copies of a query GROUP in one grid step (112 DMAs in
# flight amortize the issue/latency cost): measured 0.56 ms for the same
# gather. HBM slices must be 8-row aligned, so each copy moves the
# group's whole 8-row band and a masked sublane-sum (exact: 0·x + 1·x)
# extracts each query's row — 8× overfetch of a 3.7 MB gather is noise
# next to the latency win.

GATHER_GQ = 8           # queries per grid step (= sublane alignment)
MAX_GATHER_C = 32       # unrolled DMA count per step is GQ*c; cap compile


def _gather_kernel_factory(gq: int, c: int, ts: int):
    def kernel(sel_ref, s_hbm, o_ref, scratch, sems):
        g = pl.program_id(0)
        copies = []
        for q in range(gq):
            for i in range(c):
                j = sel_ref[g * gq + q, i]
                cp = pltpu.make_async_copy(
                    s_hbm.at[pl.ds(g * gq, gq), pl.ds(j * ts, ts)],
                    scratch.at[q * c + i],
                    sems.at[q * c + i],
                )
                cp.start()
                copies.append(cp)
        for cp in copies:
            cp.wait()
        rows = []
        for q in range(gq):
            row_mask = jax.lax.broadcasted_iota(jnp.int32, (gq, ts), 0) == q
            parts = []
            for i in range(c):
                blk = scratch[q * c + i]                      # (gq, ts)
                parts.append(
                    jnp.where(row_mask, blk, 0.0).sum(axis=0, keepdims=True)
                )
            rows.append(jnp.concatenate(parts, axis=1))       # (1, c*ts)
        o_ref[:] = jnp.concatenate(rows, axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("ts", "interpret"))
def gather_subtiles(
    scores: jax.Array, sel: jax.Array, ts: int, interpret: bool = False
) -> jax.Array:
    """Gather each query's selected sub-tiles from ``scores [B, n0]`` into
    a contiguous candidate row: returns ``[B, c * ts]`` where
    ``cand[b, i*ts + a] == scores[b, sel[b, i]*ts + a]``. Requires
    ``B % GATHER_GQ == 0`` (see :func:`gather_supported`)."""
    b = scores.shape[0]
    c = sel.shape[1]
    gq = GATHER_GQ
    return pl.pallas_call(
        _gather_kernel_factory(gq, c, ts),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // gq,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((gq, c * ts), lambda g, sel_ref: (g, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((gq * c, gq, ts), jnp.float32),
                pltpu.SemaphoreType.DMA((gq * c,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, c * ts), jnp.float32),
        interpret=interpret,
    )(sel, scores)


def gather_supported(b: int, c: int) -> bool:
    """Whether the DMA gather applies (alignment + compile-size caps);
    otherwise the caller keeps the XLA take_along_axis gather."""
    return b % GATHER_GQ == 0 and b >= GATHER_GQ and c <= MAX_GATHER_C


def fused_supported(n: int, f: int, b: int, dtype, tile: int) -> bool:
    """Whether the fused producer applies: f32 corpus, at least one full
    tile, shapes inside the supported envelope (bitwise for F ≤
    MAX_FUSED_F, self-consistent chunked-K for F ≤ MAX_FUSED_F_WIDE — see
    module constants), and a real TPU backend (interpret-mode CPU runs
    route through the XLA producer instead)."""
    if dtype != jnp.float32 or n < tile or f > MAX_FUSED_F_WIDE:
        return False
    if b < MIN_FUSED_B or b > MAX_FUSED_B:
        return False
    if tile % (SUBS * 128) != 0:        # sub-tiles must stay lane-aligned
        return False
    # Wide-F VMEM gate: per-step residency is the double-buffered corpus
    # tile (2·tile·f), the query block (b·f), and ~4 [b, tile] f32 planes
    # (score out double-buffered + the kernel's dots/blend temporaries —
    # Mosaic keeps at least the dot accumulator and one elementwise
    # temporary live alongside the two out buffers). 90 MB of the
    # 100 MB vmem_limit_bytes leaves headroom for the sub-maxima block
    # and semaphores. Validated on-chip at the widest admitted shape
    # (B=1024, F=2048, tile=2048 — estimate 76 MB, compiles and matches).
    if (2 * tile * f + b * f + 4 * b * tile) * 4 > 90 * 1024 * 1024:
        return False
    try:
        platform = jax.devices()[0].platform.lower()
    except RuntimeError:
        return False
    return "tpu" in platform or "axon" in platform
