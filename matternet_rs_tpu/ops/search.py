"""λ-aware search kernels: fused cosine + λ-proximity top-k scans.

Rebuilds the reference search APIs (``/root/reference/src_legacy/core.rs:
1156-1424``) as single jitted device passes:

* ``search_lambda_aware`` — full scan, score = α·cos + (1-α)·(1-min(|Δλ|,1)),
  top-k (core.rs:1156-1193),
* ``search_lambda_aware_hybrid`` — union of λ-top-k, the high-cosine set
  (cos > 0.9999), and the semantic top-1, re-ranked (core.rs:1197-1323),
* ``range_search`` — items with λ - λq ≤ eps (core.rs:1389-1424).

The reference's rayon heap/fold machinery collapses to one ``[N,F]×[F]``
matvec + ``lax.top_k``; the hybrid union becomes a masked re-score.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from matternet_rs_tpu.ops._mm import mm

SEMANTIC_THRESHOLD = 0.9999

# Above this (per-device) corpus size, exact batched selections route
# through :func:`tilemax_topk`: flat ``lax.top_k`` over [B, N] scores
# costs ~10 ms per 256-query batch at N=1M on v5e — an order of magnitude
# over the matmul that produced the scores — while tile-max selection is
# score-exact at reduction cost. Measured crossover sweep (v5e, 128-d,
# 256-query batches, ms/batch flat vs tilemax): 65k 1.79/1.50 · 131k
# 2.61/2.35 · 262k 4.35/3.19 · 524k 7.85/5.08 · 1M 15.25/10.85 — tilemax
# wins from 65k up (below ~30k it degenerates to flat by construction).
# Below the threshold the flat kernel stays bit-identical to the
# single-query path, ties included.
TILEMAX_MIN_N = 65_536

# With the FUSED producer (ops/pallas/tilemax_fused.py) the crossover
# moves down: measured flat vs fused ms/batch (v5e, 128-d, 256q, k=10):
# 16k 0.67/0.72 · 32k 0.84/0.72 · 65k 1.15/0.77 · 131k 2.17/0.93 ·
# 262k 3.95/1.33. Exact batched scans route through the fused path from
# 32k up WHEN the FULL fused pipeline applies (:func:`fused_fast_path` —
# producer envelope AND grouped-DMA gather AND non-degenerate selection;
# with only the XLA per-slice gather, flat still wins in this band); the
# XLA tilemax keeps the original 65k threshold.
FUSED_TILEMAX_MIN_N = 32_768

# Default per-tile width for the tile-max family; every routing predicate
# must evaluate the same tile it executes with.
DEFAULT_TILE = 2048

# Slab-count cap for the maxima-first rescored tiers: bounds the exact
# rescore's [B, c, ts, F] gather (64 slabs × 256 rows × 512 B/row ×
# B=256 ≈ 2.1 GB transient — the practical ceiling before the rescore
# stops being noise next to the scan).
MAX_RESCORE_SLABS = 64


def _tilemax_degenerate(n: int, kk: int, t: int, margin: int = 4) -> bool:
    """True when the candidate set would cover the whole corpus — the
    tile-max machinery buys nothing and callers keep the flat kernel."""
    nt0 = n // t
    return min(nt0, kk + margin) * t + (n - nt0 * t) >= n


def fused_fast_path(
    n: int, f: int, b: int, dtype, kk: int, tile: int = DEFAULT_TILE
) -> bool:
    """Whether the FULL fused pipeline applies (producer envelope +
    grouped-DMA gather + non-degenerate selection). This is the predicate
    for routing exact batched scans at the lowered FUSED_TILEMAX_MIN_N
    threshold: with the XLA per-slice gather instead of the DMA gather,
    the fused path loses to flat below TILEMAX_MIN_N (the gather is
    ~0.9 µs × B·c slices regardless of slice width). Above TILEMAX_MIN_N
    the fused producer is worth routing whenever ``fused_supported`` alone
    holds — the XLA-gather fallback still beats the XLA tilemax there."""
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    if _tilemax_degenerate(n, kk, tile):
        return False
    if not tmf.fused_supported(n, f, b, dtype, tile):
        return False
    ns = (n // tile) * tmf.SUBS
    return tmf.gather_supported(b, min(ns, kk + 4))


def _scan_dots(X: jax.Array, query: jax.Array) -> jax.Array:
    """Corpus·query dots, specialized on the corpus dtype at trace time.

    A bf16 corpus is the TPU-idiomatic throughput lever for the exact scan:
    the [N, F] read is the bottleneck, and bf16 halves the HBM bytes while
    one MXU pass (vs the multi-pass f32 decomposition) does the arithmetic;
    accumulation stays f32 via ``preferred_element_type``. f32 corpora keep
    the parity-grade HIGHEST-precision path (ops/_mm.py).
    """
    if X.dtype == jnp.bfloat16:
        return jnp.dot(
            X, query.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
    return mm(X, query)


def _guarded_cosine(dots, denom):
    """dots/denom with the zero-norm guard — THE cosine used everywhere."""
    return jnp.where(denom > 1e-12, dots / jnp.maximum(denom, 1e-12), 0.0)


def _blend(cos, lambdas, query_lambda, alpha):
    """``α·cos + (1-α)·(1-min(|Δλ|,1))`` — THE blended score (broadcasts)."""
    lam_sim = 1.0 - jnp.minimum(jnp.abs(lambdas - query_lambda), 1.0)
    return alpha * cos + (1.0 - alpha) * lam_sim


@jax.jit
def cosine_scores(X: jax.Array, norms: jax.Array, query: jax.Array) -> jax.Array:
    """Cosine similarity of ``query`` against every row (0 for zero norms)."""
    qn = jnp.sqrt(jnp.sum(query * query))
    return _guarded_cosine(_scan_dots(X, query), norms * qn)


@jax.jit
def lambda_aware_scores(
    X: jax.Array,
    norms: jax.Array,
    lambdas: jax.Array,
    query: jax.Array,
    query_lambda: jax.Array,
    alpha: jax.Array,
) -> jax.Array:
    return _blend(cosine_scores(X, norms, query), lambdas, query_lambda, alpha)


@functools.partial(jax.jit, static_argnames=("k", "approx", "recall_target"))
def search_lambda_aware(
    X: jax.Array,
    norms: jax.Array,
    lambdas: jax.Array,
    query: jax.Array,
    query_lambda: jax.Array,
    k: int,
    alpha: float = 0.7,
    approx: bool = False,
    recall_target: float = 0.95,
) -> tuple[jax.Array, jax.Array]:
    """Top-k by blended score. Returns ``(indices [k], scores [k])``.

    ``approx=True`` selects with the TPU-native ``lax.approx_max_k``
    (hardware-bucketed partial reduction): measured 5.7× faster than exact
    ``top_k`` at 1M×128 (selection cost drops from ~10 ms to ~0.5 ms per
    256-query batch) at ≥``recall_target`` recall of the exact result.
    """
    scores = lambda_aware_scores(
        X, norms, lambdas, query, query_lambda, jnp.float32(alpha)
    )
    kk = min(k, X.shape[0])
    if approx:
        top, idx = jax.lax.approx_max_k(scores, kk, recall_target=recall_target)
    else:
        top, idx = jax.lax.top_k(scores, kk)
    return idx, top


@functools.partial(jax.jit, static_argnames=("k",))
def search_lambda_aware_hybrid(
    X: jax.Array,
    norms: jax.Array,
    lambdas: jax.Array,
    query: jax.Array,
    query_lambda: jax.Array,
    k: int,
    alpha: float = 0.7,
) -> tuple[jax.Array, jax.Array]:
    """Hybrid search (core.rs:1197-1323).

    Candidate set = λ-score top-k ∪ {cos > 0.9999} ∪ {argmax cos}. Final
    score: cosine for high-semantic members (insertion order in the
    reference gives cosine precedence), blended λ-score for the rest; sorted
    desc, truncated to k.
    """
    n = X.shape[0]
    kk = min(k, n)
    cos = cosine_scores(X, norms, query)
    lambda_score = _blend(cos, lambdas, query_lambda, alpha)

    # λ top-k membership mask.
    _, top_idx = jax.lax.top_k(lambda_score, kk)
    in_topk = jnp.zeros((n,), bool).at[top_idx].set(True)

    high_sem = cos > SEMANTIC_THRESHOLD
    sem_top = jnp.argmax(cos)
    is_sem_top = jnp.zeros((n,), bool).at[sem_top].set(True)

    eligible = in_topk | high_sem | is_sem_top
    final = jnp.where(high_sem, cos, lambda_score)
    # Semantic top-1 that's in neither set scores its cosine.
    final = jnp.where(is_sem_top & ~high_sem & ~in_topk, cos, final)
    final = jnp.where(eligible, final, -jnp.inf)

    top, idx = jax.lax.top_k(final, kk)
    return idx, top


def _scan_dots_batch(X: jax.Array, queries: jax.Array) -> jax.Array:
    """Batched corpus dots ``[B, N]``, specialized on the corpus dtype at
    trace time (same contract as :func:`_scan_dots`: bf16 corpora take one
    MXU pass with f32 accumulation, f32 corpora the parity-grade HIGHEST
    path)."""
    if X.dtype == jnp.bfloat16:
        return jnp.dot(
            queries.astype(jnp.bfloat16), X.T,
            preferred_element_type=jnp.float32,
        )
    return mm(queries, X.T)


def _batched_scores(
    X: jax.Array,
    norms: jax.Array,
    lambdas: jax.Array,
    queries: jax.Array,
    query_lambdas: jax.Array,
    alphas: jax.Array,
) -> jax.Array:
    """Blended λ-aware score matrix ``[B, N]`` — THE batched scoring block
    (guarded cosine + λ-proximity blend). ``alphas`` may be a scalar or a
    per-query ``[B]`` vector."""
    qn = jnp.sqrt(jnp.sum(queries * queries, axis=-1))           # [B]
    dots = _scan_dots_batch(X, queries)                          # [B, N]
    cos = _guarded_cosine(dots, norms[None, :] * qn[:, None])
    a = jnp.asarray(alphas, jnp.float32)
    a2 = a if a.ndim == 0 else a[:, None]
    return _blend(cos, lambdas[None, :], query_lambdas[:, None], a2)


def tilemax_topk(
    scores: jax.Array, k: int, tile: int = DEFAULT_TILE, margin: int = 4
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over ``scores [B, N]`` via tile-max pruned selection.

    ``lax.top_k`` over a wide score matrix is the wall of the exact batched
    scan at large N (~10 ms per 256-query batch at N=1M on v5e — an order
    of magnitude over the matmul that produced the scores). This selection
    is score-exact at reduction cost instead of sort cost:

    1. reduce per-tile maxima ``[B, nt]`` (one streaming read of scores —
       the pad/reshape/max fuses, nothing is re-materialized),
    2. keep the ``c = k + margin`` tiles with the largest maxima. Every
       item scoring strictly above the global k-th score s_k lives in a
       tile whose max exceeds s_k, and at most k tiles can have max > s_k
       (each such tile already contains a distinct item > s_k) — so those
       c tiles contain all of them, plus enough items equal to s_k to fill
       k slots,
    3. gather the selected tiles' scores ``[B, c·tile]`` (a few MB) and
       run the exact ``top_k`` there.

    The returned score multiset is always exactly the global top-k.
    Indices match flat ``lax.top_k`` (lowest-index-first on ties) except
    when distinct items TIE exactly at s_k across a selected/unselected
    tile boundary, where an equally-scored index can substitute — the same
    class of tie the fuzz suite pins rankings away from. Selected tiles
    are re-sorted into id order before the gather so the final top-k
    breaks in-candidate ties by global index, like the flat kernel.

    TPU measurement notes (v5e, 1M×128, 256 queries, the shapes behind
    the constants here): the gather MUST move whole contiguous tiles
    (``take_along_axis`` over the reshaped ``[B, nt, t]`` view) — a
    flat-index gather of the same elements runs ~15 ns/element and is
    slower than the flat top_k it replaces; a one-hot-matmul gather is
    WRONG (``-inf × 0 = NaN``). Padding the score matrix materializes a
    [B, N]-sized copy per batch, so the ragged tail is instead always
    appended to the candidate set (its ≤ tile columns cost nothing).

    Returns ``(scores [B, k], indices [B, k])`` — ``lax.top_k`` order.
    """
    b, n = scores.shape
    kk = min(k, n)
    t = min(tile, n)
    nt0 = n // t
    c = min(nt0, kk + margin)
    n0 = nt0 * t
    if c * t + (n - n0) >= n:
        return jax.lax.top_k(scores, kk)
    main = scores[:, :n0].reshape(b, nt0, t)   # view of the score buffer
    tmax = main.max(axis=2)                                      # [B, nt0]
    tail = scores[:, n0:] if n0 < n else None
    return _tilemax_select(main, tmax, tail, n, kk, margin)


def _tilemax_select(
    main: jax.Array,
    tmax: jax.Array,
    tail: jax.Array | None,
    n: int,
    kk: int,
    margin: int,
    gather=None,
) -> tuple[jax.Array, jax.Array]:
    """Selection core of :func:`tilemax_topk`, shared with the fused
    Pallas producer path (which supplies ``tmax`` from the score kernel
    instead of re-reading the score buffer). ``main [B, nt0, t]`` is the
    full-tile score view, ``tail [B, n - nt0*t]`` the ragged remainder
    (always a candidate). ``gather(sel) -> [B, c*t]`` overrides the
    XLA candidate gather (the fused path's DMA kernel)."""
    b, nt0, t = main.shape
    n0 = nt0 * t
    c = min(nt0, kk + margin)
    _, sel = jax.lax.top_k(tmax, c)
    sel = jnp.sort(sel, axis=1)                                  # id-order ties
    if gather is not None:
        cand = gather(sel)                     # [B, c*t] contiguous
    else:
        cand = jnp.take_along_axis(
            main, sel[:, :, None], axis=1
        ).reshape(b, c * t)                    # contiguous tile slices
    if tail is not None:
        # The ragged tail is always a candidate — no score padding.
        cand = jnp.concatenate([cand, tail], axis=1)
    top, pos = jax.lax.top_k(cand, kk)
    in_main = pos < c * t
    tile_of = jnp.take_along_axis(
        sel, jnp.minimum(pos, c * t - 1) // t, axis=1
    )
    gidx = jnp.where(in_main, tile_of * t + pos % t, n0 + pos - c * t)
    return top, gidx


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def search_lambda_aware_tilemax(
    X: jax.Array,
    norms: jax.Array,
    lambdas: jax.Array,
    queries: jax.Array,
    query_lambdas: jax.Array,
    k: int,
    alphas: jax.Array,
    tile: int = DEFAULT_TILE,
) -> tuple[jax.Array, jax.Array]:
    """Exact batched λ-aware top-k with tile-max pruned selection (see
    :func:`tilemax_topk`). Score computation is the standard blended scan
    (core.rs:1156-1193 semantics). For F ≤ 128 (and every non-fused
    route) the scores are bitwise the flat kernel's and only the
    selection differs; for 128 < F ≤ 2048 on TPU the fused producer's
    self-consistent scores apply — exact top-k of the scores returned,
    within ~1e-6 rel of the flat kernel's, index substitution possible
    only on near-ties inside that error (see the routing paragraph
    below and PARITY.md).

    ``alphas`` may be a scalar or a traced ``[B]`` vector (heterogeneous
    serving traffic shares one program). Returns ``(indices [B, k],
    scores [B, k])``.

    On TPU with an f32 corpus the scores and tile maxima come from ONE
    fused Pallas pass (ops/pallas/tilemax_fused.py): the XLA producer +
    separate tile-max reduce re-reads the [B, N] score matrix through a
    ~215 GB/s strided-DMA wall, which was 45% of the exact 1M-batch time.
    For F ≤ 128 the two producers are bitwise-identical (pinned by test),
    so routing is a pure perf decision; for wider F the fused producer is
    self-consistent — selection and returned scores come from the same
    kernel, within f32 accumulation-reorder distance (~1e-6 rel) of the
    XLA producer (tilemax_fused.py constants block for the contract).
    """
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    b, n = queries.shape[0], X.shape[0]
    kk = min(k, n)
    t = min(tile, n)
    if not _tilemax_degenerate(n, kk, t) and tmf.fused_supported(
        n, X.shape[1], b, X.dtype, t
    ):
        top, idx = fused_tilemax(
            X, norms, lambdas, queries, query_lambdas, kk, alphas, t
        )
        return idx, top
    scores = _batched_scores(X, norms, lambdas, queries, query_lambdas, alphas)
    top, idx = tilemax_topk(scores, k, tile=tile)
    return idx, top


def fused_tilemax(
    X: jax.Array,
    norms: jax.Array,
    lambdas: jax.Array,
    queries: jax.Array,
    query_lambdas: jax.Array,
    kk: int,
    alphas: jax.Array,
    t: int = DEFAULT_TILE,
    mask_from: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused-producer tile-max top-k body: one Pallas pass for scores +
    sub-tile maxima, grouped-DMA candidate gather, shared selection core.
    Selection runs at SUB-tile granularity (tile/SUBS columns): the
    kernel's maxima are free off VMEM-resident data and the finer
    partition shrinks the candidate gather by SUBS x; the exactness
    argument is partition-agnostic (tilemax_topk docstring).

    ``mask_from`` (traced int32 scalar): rows ≥ mask_from score -inf —
    the sharded path's padded-row mask (parallel/search.py), applied
    in-kernel and to the ragged tail. Caller must have checked
    ``tilemax_fused.fused_supported`` and non-degeneracy.
    Returns ``(top [B, kk], idx [B, kk])``.

    Wide-F note (128 < F, the self-consistent producer mode): the ragged
    tail (< tile rows) is scored by the XLA producer while the main body
    comes from the kernel, so main-vs-tail comparisons carry the same
    f32 accumulation-reorder near-tie caveat as the producer itself.
    """
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    b, n = queries.shape[0], X.shape[0]
    nt0 = n // t
    n0 = nt0 * t
    smain, submax = tmf.scores_and_tilemax(
        X, norms, lambdas, queries, query_lambdas,
        jnp.broadcast_to(jnp.asarray(alphas, jnp.float32), (b,)), tile=t,
        mask_from=mask_from,
    )
    if n0 < n:
        tail = _batched_scores(
            X[n0:], norms[n0:], lambdas[n0:], queries, query_lambdas, alphas
        )
        if mask_from is not None:
            tail = jnp.where(
                jnp.arange(n0, n, dtype=jnp.int32)[None, :] >= mask_from,
                -jnp.inf, tail,
            )
    else:
        tail = None
    ts = t // tmf.SUBS
    ns = nt0 * tmf.SUBS
    c = min(ns, kk + 4)
    gather = (
        (lambda sel: tmf.gather_subtiles(smain, sel, ts))
        if tmf.gather_supported(b, c)
        else None
    )
    return _tilemax_select(
        smain.reshape(b, ns, ts), submax, tail, n, kk, 4, gather=gather
    )


# Selection granularity for the rescored tiers: finer than the exact
# tier's SUBS=8 because the slab rescore's HBM traffic is proportional
# to the sub-tile size (128-row slabs halve it for +0.15 ms of scan —
# probe v4).
RESCORE_SUBS = 16


def fused_rescored_path(
    n: int, f: int, b: int, kk: int, cand: int, tile: int = DEFAULT_TILE
) -> bool:
    """Routing predicate for :func:`fused_scan_rescored` (both scan
    precisions): the maxima-first producer envelope holds, the corpus is
    large enough for sub-tile pruning to pay, selection is
    non-degenerate, and the slab rescore stays a small fraction of the
    corpus (a huge ``candidates`` — e.g. the ``candidates=N`` exactness
    escape hatch — would rescore the whole corpus per query; those run
    the XLA two-stage fallback instead)."""
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    ts = tile // RESCORE_SUBS
    c = max(kk + 4, -(-cand // ts))
    return (
        n >= FUSED_TILEMAX_MIN_N
        and b % 8 == 0                   # slab_dots_ring's 8-query blocks
        and f % 128 == 0                 # Mosaic DMA lane-tiling: a slab
        # slice of an [n, f] memref needs f aligned to the 128-lane tile
        # (measured: F=96 int8 fails AOT with "Slice shape along
        # dimension 1 must be aligned to tiling (128)"); unaligned-F
        # callers take the pool-cut fallback (the sketch tier pads F up
        # instead — index/streaming._sketch_flatten_jit)
        and not _tilemax_degenerate(n, kk, tile)
        and tmf.tilemax_only_supported(n, f, b, tile, subs=RESCORE_SUBS)
        and c <= MAX_RESCORE_SLABS
        and c * ts * 8 <= n
    )


def fused_scan_rescored(
    Xscan: jax.Array,
    X: jax.Array,
    norms: jax.Array,
    lambdas: jax.Array,
    queries: jax.Array,
    query_lambdas: jax.Array,
    k: int,
    cand: int,
    alphas: jax.Array,
    t: int = DEFAULT_TILE,
    scan_rn: jax.Array | None = None,
    mask_from: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Maxima-first reduced-precision scan + exact slab rescore — the
    rescored tiers' TPU fast path (VERDICT r3 #3's "bf16-pass scoring +
    exact top-k rescore", built maxima-first after the score-writing
    variant measured recall 0.725 at 1M — DESIGN.md "rescored tiers").

    Stage 1: :func:`tilemax_fused.tilemax_only` streams the scan corpus
    (``Xscan``: bf16 → one MXU pass; int8 → one MXU pass over a lossless
    bf16 upcast at a quarter of the f32 read, with the per-row dequant
    multiplier passed as ``scan_rn``; f32 → bf16x3, three passes ≈ f32)
    and emits ONLY per-sub-tile blended-score maxima — no [B, N] score
    write at all, so stage-1 HBM traffic is the corpus read.

    Stage 2: the top ``c = max(k+4, ceil(cand/ts))`` sub-tiles per query
    (f32-distinct maxima — no bf16 tie collapse) are each streamed
    through :func:`tilemax_fused.slab_dots_ring` — a scalar-prefetch
    Pallas kernel that keeps 8 slab DMAs in flight (XLA's row gather
    measured ~100 GB/s and a single-buffered Pallas variant 119 GB/s —
    both HBM-latency-bound — vs 208 GB/s for the ring; probe v5/v6) —
    and every row is rescored at HIGHEST precision; the ragged tail is scored exactly by the XLA
    producer. Final top-k over exact scores only — returned scores are
    parity-grade, and the only deviation from the exact scan is
    scan-precision recall at the sub-tile selection boundary (measured
    per tier in the bench's ``recall_at_10_vs_exact``).

    Tie-breaking: ``sel`` is sorted ascending and the tail appended
    after, so candidate columns are in global-index order and the final
    ``top_k`` breaks exact-score ties lowest-index-first like the flat
    kernel (the standard tilemax contract).

    Caller must have checked :func:`fused_rescored_path`. ``alphas`` may
    be scalar or ``[B]``. Returns ``(idx [B, k], scores [B, k])``.

    ``mask_from`` (traced int32 scalar, optional): rows with local index
    ≥ ``mask_from`` are masked to -inf at BOTH stages — the scan maxima
    (so padded sub-tiles are never selected) and the exact rescore (so a
    padded row sharing a slab with real rows cannot rank). This is the
    sharded path's zero-padding contract (``parallel/search.py``);
    single-device callers leave it ``None`` and pay nothing.
    """
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    b, n = queries.shape[0], X.shape[0]
    kk = min(k, n)
    nt0 = n // t
    n0 = nt0 * t
    ts = t // RESCORE_SUBS
    ns = nt0 * RESCORE_SUBS
    a = jnp.broadcast_to(jnp.asarray(alphas, jnp.float32), (b,))

    submax = tmf.tilemax_only(
        Xscan, norms, lambdas, queries, query_lambdas, a, tile=t,
        subs=RESCORE_SUBS, rn=scan_rn, mask_from=mask_from,
    )                                                            # [B, ns]
    c = min(ns, max(kk + 4, -(-cand // ts)))
    # Selection stays lax.top_k: a Pallas c-sweep max-extract kernel was
    # built and measured 4.05 ms at [256, 7808] vs top_k's 0.56 — Mosaic
    # cross-lane reductions lose badly to XLA's sort here (probe v6).
    _, sel = jax.lax.top_k(submax, c)
    sel = jnp.sort(sel, axis=1)

    # Exact rescore of EVERY row in the selected slabs: HIGHEST dots via
    # the ring slab reader (8 outstanding HBM→VMEM slab DMAs), then the
    # canonical cosine/λ-blend epilogue in XLA — [B, c·ts] elementwise
    # plus a 3.7 MB norms/λ gather, trivial next to the slab read.
    d = tmf.slab_dots_ring(X, queries, sel, ts)                  # [B,c,ts]
    qn = jnp.sqrt(jnp.sum(queries * queries, axis=-1))
    nrm_s = jnp.take(norms[:n0].reshape(ns, ts), sel, axis=0)    # [B,c,ts]
    lam_s = jnp.take(lambdas[:n0].reshape(ns, ts), sel, axis=0)
    cos = _guarded_cosine(d, nrm_s * qn[:, None, None])
    s = _blend(
        cos, lam_s, query_lambdas[:, None, None], a[:, None, None]
    ).reshape(b, c * ts)
    gidx = (
        sel[:, :, None] * ts
        + jnp.arange(ts, dtype=jnp.int32)[None, None, :]
    ).reshape(b, c * ts)
    if n0 < n:
        tail = _batched_scores(
            X[n0:], norms[n0:], lambdas[n0:], queries, query_lambdas, alphas
        )
        s = jnp.concatenate([s, tail], axis=1)
        gidx = jnp.concatenate([
            gidx,
            jnp.broadcast_to(
                jnp.arange(n0, n, dtype=jnp.int32)[None, :], (b, n - n0)
            ),
        ], axis=1)
    if mask_from is not None:
        # Rescore-stage pad mask: a padded row inside a selected slab (or
        # the ragged tail) would otherwise score cos=0 + λ-sim and rank.
        s = jnp.where(gidx < jnp.asarray(mask_from, jnp.int32), s, -jnp.inf)
    top, pos = jax.lax.top_k(s, kk)
    return jnp.take_along_axis(gidx, pos, axis=1), top


@functools.partial(jax.jit, static_argnames=("k", "window"))
def search_lambda_banded(
    X: jax.Array,
    norms: jax.Array,
    sorted_lambdas: jax.Array,
    sorted_indices: jax.Array,
    query: jax.Array,
    query_lambda: jax.Array,
    k: int,
    alpha: float = 0.7,
    window: int = 4096,
) -> tuple[jax.Array, jax.Array]:
    """Sublinear λ-banded search: score only a fixed window of candidates
    around the query's position in the sorted-λ order.

    The reference's sorted-index search (core.rs:1326-1335) returns band
    members by λ alone; this upgrade re-scores the band with the full
    blended metric, so it converges to ``search_lambda_aware`` as the
    window grows while doing ``window/N`` of the work. Approximate: items
    outside the λ-window cannot be returned.

    ``sorted_lambdas/sorted_indices`` come from the device sorted index
    (``index.sorted.DeviceSortedLambdas``). Returns global item ids.
    """
    n = X.shape[0]
    w = min(window, n)
    pos = jnp.searchsorted(sorted_lambdas, query_lambda)
    start = jnp.clip(pos - w // 2, 0, n - w)
    cand = jax.lax.dynamic_slice_in_dim(sorted_indices, start, w)
    cand_lam = jax.lax.dynamic_slice_in_dim(sorted_lambdas, start, w)

    Xc = X[cand]                                   # [w, F] gather
    nc = norms[cand]
    qn = jnp.sqrt(jnp.sum(query * query))
    dots = jnp.dot(
        Xc, query, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    scores = _blend(_guarded_cosine(dots, nc * qn), cand_lam, query_lambda, alpha)
    top, idx = jax.lax.top_k(scores, min(k, w))
    return cand[idx], top


@jax.jit
def range_search_mask(
    lambdas: jax.Array, query_lambda: jax.Array, eps: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Signed λ-distance and membership mask (core.rs:1389-1424 keeps items
    with ``λq - λi ≤ eps``, signed)."""
    dist = query_lambda - lambdas
    return dist, dist <= eps
