"""Streaming index: single-chip search over a corpus larger than HBM.

Completes the larger-than-memory story the shard store opens
(``storage/shards.py``: Deep1B-scale ingest, SURVEY §2.5 north star). The
distributed build spreads the corpus across a mesh's combined HBM; this
index is the orthogonal axis — ONE chip, corpus on disk:

* build: stage-1 clustering on a strided row sample (native scan), graph
  from centroids (F×F, tiny), then one streamed pass computing raw λ for
  every row (fixed-shape device chunks) written back beside the shards as
  ``lambdas.bin`` + ``index.json`` (graph + stats) — the index itself is
  O(F²), never O(N).
* search: stream ``[block_rows, F]`` corpus blocks + the matching λ slices
  through the device (the native read-ahead reader overlaps disk IO with
  the previous block's scoring), blended top-k per block, host merge.
  HBM residency is one block regardless of N.

The reference has no out-of-core path at all (its builder takes a full
in-memory Vec, SURVEY §2.4); this is TPU-native capability beyond it.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import threading
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from matternet_rs_tpu.core import TAUDEFAULT, TauMode
from matternet_rs_tpu.graph import GraphLaplacian, GraphParams
from matternet_rs_tpu.ops import taumode as taumode_ops
from matternet_rs_tpu.ops._mm import mm
from matternet_rs_tpu.ops.search import _blend, _guarded_cosine
from matternet_rs_tpu.storage import shards as shard_store

INDEX_FILE = "index.json"
LAMBDA_FILE = "lambdas.bin"
GRAPH_FILE = "graph.bin"
GRAPH_ELL_FILE = "graph_ell.npz"
ENERGY_FILE = "energy.npz"
SKETCH_FILE = "sketch.bin"            # int8 [N, F] row-quantized corpus
SKETCH_META_FILE = "sketch_meta.npz"  # per-row dequant multiplier

# Scale crossover for the maxima-first sketch scan in AUTO mode
# (sketch_maxfirst=None): measured LOSING at 1M flat rows (carry scan
# 0.79× faster) and WINNING at 10M (+10–13% serving QPS) — the carry
# scan's per-block top-k carry scales with the block count while the
# maxima-first selection cost is ~flat in N. See DESIGN.md.
MAXFIRST_MIN_ROWS = 4_000_000
DEFAULT_BLOCK_ROWS = 131_072


def _host_bf16(block: np.ndarray) -> np.ndarray:
    """f32 → bf16 on the HOST: halves the H2D bytes of each streamed block
    (the out-of-core bottleneck on any transport)."""
    import ml_dtypes

    return block.astype(ml_dtypes.bfloat16)


def _alpha_param(alpha, b: int):
    """Scalar or ``[B]`` per-query blend weights → broadcastable operand
    (``[B, 1]`` against the ``[B, n]`` score matrix). Mirrors the
    in-memory ``search_batch``: heterogeneous serving traffic shares one
    dispatch instead of fragmenting per distinct alpha."""
    a = jnp.asarray(alpha, jnp.float32)
    if a.ndim == 0:
        return a
    if a.shape[0] != b:
        raise ValueError(f"alpha vector length {a.shape[0]} != batch {b}")
    return a[:, None]


@functools.partial(jax.jit, static_argnames=("k",))
def _score_block_batch(X, lams, Q, q_lams, alpha, mn, rng, valid, k):
    """Blended top-k over one corpus block (λ arrives raw, normalized
    in-dispatch; invalid tail rows masked to -inf). f32 blocks use the
    parity-grade HIGHEST-precision matmul (ops/_mm.py — the streamed path
    must rank exactly like the in-memory exact scan); bf16 blocks do one
    MXU pass with f32 accumulation (the documented quantized tradeoff)."""
    if X.dtype == jnp.bfloat16:
        norms = jnp.sqrt(jnp.sum(X.astype(jnp.float32) ** 2, axis=-1))
        dots = jnp.dot(
            Q.astype(jnp.bfloat16), X.T, preferred_element_type=jnp.float32
        )                                                       # [B, n]
    else:
        norms = jnp.sqrt(jnp.sum(X * X, axis=-1))
        dots = mm(Q, X.T)
    qn = jnp.sqrt(jnp.sum(Q * Q, axis=-1))                     # [B]
    cos = _guarded_cosine(dots, norms[None, :] * qn[:, None])
    lam_n = jnp.clip((lams - mn) / rng, 0.0, 1.0)
    scores = _blend(cos, lam_n[None, :], q_lams[:, None], alpha)
    # Deliberately flat lax.top_k (NOT ops/search.tilemax_topk): the
    # streamed exact scan is disk-IO-bound (~5-8 MB/s sandbox floor,
    # DESIGN.md), so selection cost is invisible here, and flat top_k
    # preserves the bit-identical ranking contract vs the in-memory
    # exact scan that _merge_topk_jit and the parity suite pin.
    scores = jnp.where(jnp.arange(X.shape[0])[None, :] < valid, scores, -jnp.inf)
    return jax.lax.top_k(scores, k)


@functools.partial(jax.jit, static_argnames=("ascending", "kk"))
def _merge_topk_jit(best_s, best_i, sc, idx, offset, ascending, kk):
    """Device-side running top-k merge: the streamed carry. Stable argsort
    keeps the earlier (lower-id) entry on exact ties — matching the
    round-2 host merge bit-for-bit (blocks arrive in id order, and the
    carry always sits left of the new block's candidates)."""
    gids = jnp.where(idx >= 0, idx + offset, -1)
    cat_s = jnp.concatenate([best_s, sc], axis=1)
    cat_i = jnp.concatenate([best_i, gids], axis=1)
    key = cat_s if ascending else -cat_s
    sel = jnp.argsort(key, axis=1, stable=True)[:, :kk]
    return (
        jnp.take_along_axis(cat_s, sel, axis=1),
        jnp.take_along_axis(cat_i, sel, axis=1),
    )


def scan_sketch_blocks(
    X8s, mults, lams, valids, Q, q_lams, alpha, mn, rng, kk, offset0,
    energy: bool = False,
):
    """Traceable core of the sketch scan: ``lax.scan`` over stacked
    ``[nb, blk, F]`` int8 blocks with a running per-query top-``kk``
    carry, global ids starting at ``offset0``. Shared verbatim by the
    single-chip jit wrapper (:func:`_sketch_scan_topk`, offset0=0) and the
    mesh-sharded scan (``parallel/sketch.py``, offset0 = the device's
    global row base) — one implementation, so the sharded path ranks
    block-for-block identically to the single-chip path.

    ``energy=True`` scores energy-mode semantics (ascending |Δλ| with the
    cosine tie-break, energymaps.rs:628-674) NEGATED, so the carry/merge/
    selection machinery stays in the maximize convention; callers flip the
    sign back. The λ part is exact (λ is resident f32); only the tie-break
    term — active within |Δλ| < 1e-9 — carries int8/bf16 rounding."""
    b = Q.shape[0]
    blk = X8s.shape[1]
    Qb = Q.astype(jnp.bfloat16)
    qn = jnp.sqrt(jnp.sum(Q * Q, axis=-1))
    col = jnp.arange(blk)[None, :]

    def step(carry, inp):
        best_s, best_i, offset = carry
        X8, mult, lam, valid = inp
        dots = jnp.dot(
            Qb, X8.astype(jnp.bfloat16).T, preferred_element_type=jnp.float32
        )                                                    # [B, blk]
        cos = jnp.clip(
            dots * mult[None, :] / jnp.maximum(qn[:, None], 1e-12), -1.0, 1.0
        )
        lam_n = jnp.clip((lam - mn) / rng, 0.0, 1.0)
        if energy:
            lam_dist = jnp.abs(lam_n[None, :] - q_lams[:, None])
            scores = -(
                lam_dist
                + jnp.where(lam_dist < 1e-9, (1.0 - cos) * 1e-9, 0.0)
            )
        else:
            scores = _blend(cos, lam_n[None, :], q_lams[:, None], alpha)
        scores = jnp.where(col < valid, scores, -jnp.inf)
        # TPU-native selection: approx_max_k is the hardware top-k for
        # MIPS-style scans (~10× faster than exact lax.top_k at this
        # shape, measured 9.6 vs 93 ms over 10M rows). The sketch stage
        # is already approximate-by-design (int8 + bf16, exact rescore
        # after), so its tiny recall cost folds into the `candidates`
        # knob; exact top_k only when kk is a large fraction of the block
        # (approx shines when kk ≪ blk, and tests that demand exactness
        # use candidates = block size). The per-block width is capped at
        # the block (top_k(k > dim) raises); the kk-wide carry still
        # accumulates kk > blk results across blocks — a block can
        # contribute at most blk of the global top anyway.
        kb = min(kk, blk)
        if kb * 16 <= blk:
            sc, idx = jax.lax.approx_max_k(scores, kb, recall_target=0.95)
        else:
            sc, idx = jax.lax.top_k(scores, kb)
        cat_s = jnp.concatenate([best_s, sc], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.where(sc > -jnp.inf, idx.astype(jnp.int32) + offset, -1)],
            axis=1,
        )
        ms, sel = jax.lax.top_k(cat_s, kk)
        mi = jnp.take_along_axis(cat_i, sel, axis=1)
        return (ms, mi, offset + valid), None

    init = (
        jnp.full((b, kk), -jnp.inf, jnp.float32),
        jnp.full((b, kk), -1, jnp.int32),
        jnp.int32(offset0),
    )
    (best_s, best_i, _), _ = jax.lax.scan(
        step, init, (X8s, mults, lams, valids)
    )
    return best_s, best_i


@functools.partial(jax.jit, static_argnames=("kk", "energy"))
def _sketch_scan_topk(X8s, mults, lams, valids, Q, q_lams, alpha, mn, rng,
                      kk, energy=False):
    """Whole-sketch blended top-k in ONE device program (see
    :func:`scan_sketch_blocks`). Replaces the per-block dispatch loop — on
    a remote-attached TPU each dispatch is a tunnel round-trip, so 38
    blocks × 2 calls cost ~200 ms/batch in latency alone; the fused scan
    pays one round-trip and runs block-to-block at HBM speed."""
    return scan_sketch_blocks(
        X8s, mults, lams, valids, Q, q_lams, alpha, mn, rng, kk, 0,
        energy=energy,
    )


def suffix_padded(validh, blk: int) -> bool:
    """True when every block before the first partial one is full — the
    maxima-first fast path's precondition (flat ``[nb·blk]`` row index ==
    global id for all real rows). Shared by the single-chip sketch
    (``build_sketch``) and the mesh-sharded one
    (``parallel/sketch.ShardedSketch``): the invariant is the id-mapping
    correctness condition for BOTH, so there is exactly one
    implementation of it."""
    partial_seen = False
    for v in np.asarray(validh).tolist():
        if partial_seen and v > 0:
            return False
        if v < blk:
            partial_seen = True
    return True


@jax.jit
def _sketch_flatten_jit(X8s, mults, lams, mn, rng):
    """Flat ``[nb·blk, F_pad]`` views of the stacked sketch + the λ
    column NORMALIZED once (the maxima-first producer consumes
    normalized λ; re-normalizing [N] per batch would add an N-read/write
    pass to every dispatch). F is additionally zero-padded up to a
    multiple of 128 when unaligned — Mosaic's DMA lane tiling requires
    it for the ring slab reader (zero columns contribute 0 to every
    dot, queries pad to match at dispatch). Because jit outputs cannot
    alias inputs, the flat ``[n, f_pad]`` int8 buffer is a NEW resident
    allocation for every F (even aligned, where the reshape is
    layout-free inside the program but the result is still a distinct
    buffer), plus the normalized λ (4 B/row); ``_sketch_fused_ok``
    bounds the copy."""
    nb, blk, f = X8s.shape
    f_pad = -(-f // 128) * 128
    lam_n = jnp.clip((lams.reshape(nb * blk) - mn) / rng, 0.0, 1.0)
    X8f = X8s.reshape(nb * blk, f)
    if f_pad != f:
        X8f = jnp.pad(X8f, ((0, 0), (0, f_pad - f)))
    return X8f, mults.reshape(nb * blk), lam_n


@functools.partial(jax.jit, static_argnames=("rows_out", "kfinal"))
def _sketch_maxfirst_topk(X8f, mult_f, lam_f, Q, q_lams, alphas, rows_out,
                          kfinal, n_items):
    """Maxima-first int8 sketch scan (VERDICT r4 #5 — the round-4
    ``int8_rescored`` kernel applied to the resident-sketch serving
    tier): ONE MXU pass over the lossless bf16 upcast of the flat int8
    sketch emits per-128-row-slab score maxima (``tilemax_only`` with
    the dequant multiplier riding the epilogue's ``rn`` — no [B, N]
    score write, no per-block top-k carry), then every row of the top
    slabs is rescored AT SKETCH PRECISION from the resident int8 rows
    (a [B, c·128, F] HBM gather — trivial next to the scan) and the
    top-``kk`` selected. Replaces ``scan_sketch_blocks``'s per-block
    approx_max_k + concat + merge pipeline, whose selection machinery
    is the measured difference between 93k and 150k sketch QPS at
    1M/B=1024 (DESIGN.md "Rescored tiers, maxima-first").

    Same contract as the carry scan: returned scores carry int8/bf16
    quantization; candidate recall is governed by ``cand`` (slab-granular
    here — the exact disk rescore downstream absorbs it, measured in
    bench/tests). Rows ≥ ``n_items`` (suffix padding) are masked at both
    stages. Caller guarantees the fused envelope via
    ``StreamingIndex._sketch_fused_ok``.

    ``rows_out``: candidate rows returned per query (the refine stage's
    ``C``); ``kfinal``: the FINAL top-k — it sizes the slab budget
    ``c = max(kfinal+4, ceil(rows_out/128))`` exactly like the
    in-memory tier (the true top-k rows occupy ≤ kfinal slabs, so the
    +4 margin covers scan-precision maxima reordering; ``c·128 ≥
    rows_out`` holds by construction)."""
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf
    from matternet_rs_tpu.ops.search import DEFAULT_TILE, RESCORE_SUBS

    b = Q.shape[0]
    n, f = X8f.shape
    t = DEFAULT_TILE
    ts = t // RESCORE_SUBS
    ns = (n // t) * RESCORE_SUBS
    a = jnp.broadcast_to(jnp.asarray(alphas, jnp.float32), (b,))

    submax = tmf.tilemax_only(
        X8f, mult_f, lam_f, Q, q_lams, a, tile=t, subs=RESCORE_SUBS,
        rn=mult_f, mask_from=jnp.asarray(n_items, jnp.int32),
    )                                                            # [B, ns]
    c = min(ns, max(kfinal + 4, -(-rows_out // ts)))
    _, sel = jax.lax.top_k(submax, c)
    sel = jnp.sort(sel, axis=1)                                  # id-ordered

    # Slab rescore through the ring-DMA reader (8 outstanding HBM→VMEM
    # slab copies, int8 rows upcast losslessly in-kernel): an XLA
    # row-index gather + batched-GEMV einsum here measured 24.9 ms vs
    # the carry scan's 2.8 ms at 1M×96/B=256 — the same latency-bound
    # gather wall the in-memory tier hit (probe v5/v6).
    d = tmf.slab_dots_ring(X8f, Q, sel, ts)                      # [B, c, ts]
    qn = jnp.sqrt(jnp.sum(Q * Q, axis=-1))
    mult_s = jnp.take(mult_f.reshape(ns, ts), sel, axis=0)       # [B, c, ts]
    lam_s = jnp.take(lam_f.reshape(ns, ts), sel, axis=0)
    cos = jnp.clip(
        d * mult_s / jnp.maximum(qn[:, None, None], 1e-12), -1.0, 1.0
    )
    s = _blend(cos, lam_s, q_lams[:, None, None], a[:, None, None])
    s = s.reshape(b, c * ts)
    gidx = (
        sel[:, :, None] * ts + jnp.arange(ts, dtype=jnp.int32)[None, None, :]
    ).reshape(b, c * ts)                                         # [B, c·ts]
    s = jnp.where(gidx < n_items, s, -jnp.inf)
    top, pos = jax.lax.top_k(s, min(rows_out, c * ts))
    gidx = jnp.take_along_axis(gidx, pos, axis=1)
    return top, jnp.where(top > -jnp.inf, gidx, -1)


@functools.partial(jax.jit, static_argnames=("kk",))
def _refine_energy_topk(XU, lamU, Q, q_lams, mn, rng, valid_u, kk):
    """Exact energy-mode rescore of the fetched candidate union
    (ascending |Δλ|, cosine tie-break — the same parity-grade kernel as
    the streamed energy scan, energymaps.rs:628-674)."""
    norms = jnp.sqrt(jnp.sum(XU * XU, axis=-1))
    qn = jnp.sqrt(jnp.sum(Q * Q, axis=-1))
    dots = mm(Q, XU.T)
    cos = dots / (qn[:, None] * norms[None, :] + 1e-9)
    lam_n = jnp.clip((lamU - mn) / rng, 0.0, 1.0)
    lam_dist = jnp.abs(lam_n[None, :] - q_lams[:, None])
    scores = lam_dist + jnp.where(lam_dist < 1e-9, (1.0 - cos) * 1e-9, 0.0)
    scores = jnp.where(
        jnp.arange(XU.shape[0])[None, :] < valid_u, scores, jnp.inf
    )
    neg, idx = jax.lax.top_k(-scores, kk)
    return -neg, idx


@functools.partial(jax.jit, static_argnames=("kk",))
def _refine_exact_topk(XU, lamU, Q, q_lams, alpha, mn, rng, valid_u, kk):
    """Exact blended rescore of the fetched candidate union (parity-grade
    HIGHEST matmul — the refined ranking must match the exact streamed
    scan on the rows it sees), then top-k into the union index space."""
    dots = mm(Q, XU.T)                                       # [B, U]
    norms = jnp.sqrt(jnp.sum(XU * XU, axis=-1))
    qn = jnp.sqrt(jnp.sum(Q * Q, axis=-1))
    cos = _guarded_cosine(dots, norms[None, :] * qn[:, None])
    lam_n = jnp.clip((lamU - mn) / rng, 0.0, 1.0)
    scores = _blend(cos, lam_n[None, :], q_lams[:, None], alpha)
    scores = jnp.where(
        jnp.arange(XU.shape[0])[None, :] < valid_u, scores, -jnp.inf
    )
    return jax.lax.top_k(scores, kk)


def _quantize_rows(block: np.ndarray):
    """Host-side per-row symmetric int8 quantization: ``q8 = rint(x/scale)``
    with ``scale = maxabs/127``; returns ``(q8, mult)`` where ``mult``
    dequantizes a raw int8 dot product straight to cosine numerator/|x|
    (zero rows get mult 0 — the guarded-cosine convention)."""
    maxabs = np.abs(block).max(axis=1)
    norms = np.sqrt(np.sum(block.astype(np.float64) ** 2, axis=1)).astype(
        np.float32
    )
    scale = np.where(maxabs > 0, maxabs / 127.0, 1.0).astype(np.float32)
    q8 = np.rint(block / scale[:, None]).astype(np.int8)
    mult = np.where(norms > 1e-12, scale / np.maximum(norms, 1e-12), 0.0)
    return q8, mult.astype(np.float32)


def _publish_sketch_files(directory: Path, sk_tmp: Path, mult: np.ndarray):
    """Crash-safe publication of the sketch pair from a fully-written
    int8 tmp file. The META file is the commit point and is REMOVED
    before the new sketch lands, so a crash anywhere in the sequence
    leaves either the complete old pair or a missing meta (readers then
    rebuild) — never a new sketch paired with an old meta, which would
    silently scan with wrong dequant multipliers. Not safe against two
    concurrent writers on the same directory (last one wins)."""
    import os

    meta = directory / SKETCH_META_FILE
    m_tmp = directory / (SKETCH_META_FILE + ".tmp")
    try:
        with m_tmp.open("wb") as mfh:
            np.savez(mfh, mult=np.ascontiguousarray(mult, np.float32))
        meta.unlink(missing_ok=True)       # clear the commit point first
        os.replace(sk_tmp, directory / SKETCH_FILE)
        os.replace(m_tmp, meta)
    finally:
        m_tmp.unlink(missing_ok=True)      # no-op when published


@dataclasses.dataclass
class StreamingIndex:
    directory: Path
    gl: GraphLaplacian
    taumode: TauMode
    min_lambdas: float
    range_lambdas: float
    n_items: int
    n_features: int
    block_rows: int = DEFAULT_BLOCK_ROWS
    # Energy-mode state (present when persisted from an energy-built
    # index): queries route through the nearest sub-centroid's λ and
    # search_energy streams a pure λ-distance scan.
    sub_centroids: Optional[np.ndarray] = None
    subcentroid_lambdas: Optional[np.ndarray] = None
    # JL projection metadata (seed-only, reduction.py): λ preparation and
    # sub-centroid routing happen in the reduced space; corpus scoring
    # stays original-dim.
    projection: Optional[object] = None
    # Wall-clock per build stage, populated by build_from_store (not
    # persisted): {"sample_cluster_graph_s", "lambda_pass_s",
    # "lambda_rows_computed"} — the out-of-core observability row.
    build_timings: Optional[dict] = None
    # Device-resident int8 sketch (build_sketch): stacked device arrays
    # (X8s [nb, blk, F] int8, mults [nb, blk], lam_raw [nb, blk],
    # valids [nb] int32). Session state, not meta.
    _sketch: Optional[tuple] = dataclasses.field(
        default=None, repr=False, compare=False
    )
    # Flat views + normalized λ for the maxima-first scan (lazy, derived
    # from _sketch) and whether the stacked layout pads ONLY at the
    # suffix (flat row index == global id for real rows — the fused
    # path's precondition).
    _sketch_flat: Optional[tuple] = dataclasses.field(
        default=None, repr=False, compare=False
    )
    # Guards the lazy flatten above: the serving dispatch pool runs two
    # workers concurrently (serve.py), so two sketch-tier batches can race
    # _sketch_flat_views — without the lock both would run the N-sized
    # flatten (transient 2× flat-copy allocation on an HBM budget already
    # holding the stacked sketch). Same pattern as ArrowSpace._sketch_lock.
    _sketch_flat_lock: threading.Lock = dataclasses.field(
        default_factory=threading.Lock, repr=False, compare=False
    )
    _sketch_suffix_pad: bool = dataclasses.field(
        default=False, repr=False, compare=False
    )
    # Maxima-first sketch scan policy — None = AUTO by the measured
    # scale crossover (DESIGN.md "Maxima-first on the sketch tier: a
    # scale crossover"): at 1M×96 the carry scan wins every batch size
    # (B=8/256/1024: 1.05/2.05/5.62 ms vs 1.40/2.41/7.07 — one bf16
    # pass + hardware approx_max_k is already near-optimal and
    # maxima-first only adds slab/ring overhead), but at 10M the carry
    # scan's per-block top-k machinery scales with the block count and
    # maxima-first WINS (+13%/+10% serving QPS at B=256/1024, r5 bench).
    # Auto engages at ≥ MAXFIRST_MIN_ROWS flat rows; True/False force.
    sketch_maxfirst: Optional[bool] = dataclasses.field(
        default=None, repr=False, compare=False
    )

    # The lock is per-process runtime state: exclude it from pickle and
    # deepcopy (which route through __reduce_ex__) and recreate it fresh
    # on the copy — same contract as ArrowSpace._sketch_lock.
    def __getstate__(self):
        state = self.__dict__.copy()
        state.pop("_sketch_flat_lock", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._sketch_flat_lock = threading.Lock()

    # ------------------------------------------------------------------
    @classmethod
    def build_from_store(
        cls,
        directory,
        graph_params: GraphParams,
        max_clusters: int,
        radius: float,
        taumode: TauMode = TAUDEFAULT,
        block_rows: int = DEFAULT_BLOCK_ROWS,
        sample_rows: int = 200_000,
        seed: int = 0,
        resume: bool = False,
        emit_sketch: bool = False,
    ) -> "StreamingIndex":
        """Two streamed passes over the store: (1) strided row sample →
        incremental clustering → F×F graph; (2) raw λ for every row,
        written to ``lambdas.bin`` with global stats in ``index.json``.

        The λ pass is **crash-resumable**: the graph is persisted before it
        starts, every λ block is appended as it completes, and
        ``resume=True`` picks up from the last whole block (a partial tail
        write is truncated) — at Deep1B scale the λ pass is hours of IO,
        and the reference has no resumable build at all.

        ``emit_sketch=True`` writes ``sketch.bin``/``sketch_meta.npz``
        DURING the λ pass (each block is already in host memory), so the
        later :meth:`build_sketch` reads the 1-byte/elem sketch instead
        of re-streaming the 4-byte corpus — on the IO-floor-bound sandbox
        this removes an entire corpus pass (~20 min at 100M×96). Skipped
        when resuming past block 0 (earlier blocks are not re-read; the
        sketch pass in :meth:`sketch_host_buffers` covers that case).
        """
        import time as _time

        from matternet_rs_tpu.clustering import incremental_clustering
        from matternet_rs_tpu.ops import laplacian as lap_ops

        t_start = _time.perf_counter()
        directory = Path(directory)
        m = shard_store.read_manifest(directory)
        n, f = m["n_rows"], m["n_features"]
        lam_path = directory / LAMBDA_FILE
        meta_path = directory / INDEX_FILE

        idx = None
        if resume and meta_path.exists():
            idx = cls.load(directory)
            if (
                idx.n_items != n
                or idx.n_features != f
                or idx.block_rows != block_rows
            ):
                idx = None    # store changed under us — rebuild fresh
            else:
                # The checkpointed τ policy wins: mixing the caller's
                # (possibly different) taumode into the remaining blocks
                # would silently corrupt the λ file.
                taumode = idx.taumode

        if idx is None:
            # Pass 1: strided sample (deterministic, covers the whole store).
            stride = max(1, n // max(sample_rows, 1))
            sample: list[np.ndarray] = []
            offset = 0
            for block in shard_store.stream_blocks(directory, block_rows):
                first = (-offset) % stride
                sample.append(block[first::stride])
                offset += len(block)
            Xs = np.concatenate(sample)[:sample_rows]
            out = incremental_clustering(Xs, max_clusters, radius)
            gl = lap_ops.build_laplacian_from_k_cluster(
                jnp.asarray(out.centroids), graph_params, n_items=n
            )
            idx = cls(
                directory=directory, gl=gl, taumode=taumode,
                min_lambdas=float("nan"), range_lambdas=float("nan"),
                n_items=n, n_features=f, block_rows=block_rows,
            )
            # Order matters for crash-safety: drop the stale λ file BEFORE
            # the new checkpoint exists — a crash between the two must
            # never leave a new meta pointing at old λ rows. The stale
            # sketch pair goes with it: a fresh build means the shard data
            # may have changed, and a leftover sketch.bin would silently
            # serve sketch searches from the OLD corpus.
            lam_path.unlink(missing_ok=True)
            (directory / SKETCH_FILE).unlink(missing_ok=True)
            (directory / SKETCH_META_FILE).unlink(missing_ok=True)
            idx._save_meta()              # checkpoint the graph pre-λ

        # Resume point: whole λ blocks already on disk.
        done_rows = 0
        mn, mx = np.inf, -np.inf
        if resume and lam_path.exists():
            have_bytes = lam_path.stat().st_size
            have = have_bytes // 4
            # A COMPLETE λ file resumes as a no-op (the ragged tail block
            # is only partial-suspect when the file is short of n).
            done_rows = n if have >= n else (have // block_rows) * block_rows
            # Compare BYTES, not float counts: a torn write can leave 1-3
            # trailing bytes past a block boundary, which a float-count
            # comparison would miss — the resumed append would then shift
            # every later λ row and silently corrupt all rankings.
            if have_bytes != done_rows * 4:   # truncate a partial tail
                with open(lam_path, "r+b") as fh:
                    fh.truncate(done_rows * 4)
            if done_rows:
                prev = np.memmap(lam_path, np.float32, "r", shape=(done_rows,))
                mn, mx = float(prev.min()), float(prev.max())

        t_pass1 = _time.perf_counter()

        # Pass 2: streamed λ (raw), fixed-shape device chunks, appended.
        gl = idx.gl
        graph = (
            gl.ell()
            if gl.is_ell_backed or f > taumode_ops.SPARSE_F_THRESHOLD
            else gl.matrix
        )
        # One-block-deep pipeline: dispatch block i+1's upload+λ compute
        # (jax async dispatch) BEFORE materializing block i's result, so
        # the device works while the host pays the D2H + disk write. On
        # the remote-tunnel TPU the per-block cost is almost entirely
        # round-trip overhead (the 7-matmul λ itself is sub-ms at
        # [262k, 96]), so overlapping roughly halves the pass.
        pending = None                         # in-flight device λ block
        sk_tmp = directory / (SKETCH_FILE + ".tmp")
        emit = emit_sketch and done_rows == 0
        if emit:
            sk_tmp.unlink(missing_ok=True)     # stale tmp from a crash
        sk_fh = open(sk_tmp, "wb") if emit else None
        # Preallocated (4 bytes/row — 400 MB at 100M): keeps the streamed
        # pass constant-memory instead of accumulating a list + concat.
        mult_all = np.zeros(n, np.float32) if emit else None
        try:
            with open(lam_path, "ab") as fh:

                def _drain(dev) -> None:
                    nonlocal mn, mx
                    raw = np.asarray(dev, np.float32)
                    mn = min(mn, float(raw.min()))
                    mx = max(mx, float(raw.max()))
                    fh.write(raw.tobytes())
                    fh.flush()

                # Resume SEEKS past completed rows (done_rows is always a
                # whole number of blocks) — their bytes are never read.
                offset = done_rows
                for block in shard_store.stream_blocks(
                    directory, block_rows, start_row=done_rows
                ):
                    dev = taumode_ops.taumode_lambdas_auto(
                        jnp.asarray(block), graph, taumode.mode, taumode.param
                    )
                    if sk_fh is not None:
                        # Quantize while the λ dispatch runs on device —
                        # the block is already in host memory, so the
                        # sketch costs no extra corpus IO.
                        q8, mult = _quantize_rows(
                            np.asarray(block, np.float32)
                        )
                        sk_fh.write(q8.tobytes())
                        mult_all[offset:offset + len(block)] = mult
                    if pending is not None:
                        _drain(pending)
                    pending = dev
                    offset += len(block)
                if pending is not None:
                    _drain(pending)
            if sk_fh is not None:
                sk_fh.close()
                sk_fh = None
                _publish_sketch_files(directory, sk_tmp, mult_all)
        finally:
            if sk_fh is not None:              # λ pass raised mid-stream
                sk_fh.close()
            if emit:
                sk_tmp.unlink(missing_ok=True)  # no-op when published
        idx.min_lambdas = mn
        idx.range_lambdas = (mx - mn) if mx > mn else 1.0
        idx._save_meta()
        idx.build_timings = {
            "sample_cluster_graph_s": round(t_pass1 - t_start, 3),
            "lambda_pass_s": round(_time.perf_counter() - t_pass1, 3),
            "lambda_rows_computed": int(offset - done_rows),
        }
        return idx

    def _save_meta(self) -> None:
        """Atomic checkpoint: graph as raw f32 (``graph.bin`` — at F=4096
        a JSON-encoded matrix would be ~300 MB of text), metadata as
        strict JSON (no NaN literals: unfinished stats serialize as null),
        both via write-tmp + rename so a crash never leaves a truncated
        file for ``load``/resume to choke on."""
        import os

        if self.gl.is_ell_backed:
            # Matrix-free graph (direct-ELL build at F ≥ 8192): persist the
            # O(F·k) ELL arrays — densifying to graph.bin would write the
            # exact [F, F] the construction exists to avoid (1 GB at 16k).
            e = self.gl.ell()
            g_tmp = self.directory / (GRAPH_ELL_FILE + ".tmp")
            with g_tmp.open("wb") as fh:
                np.savez(
                    fh,
                    indices=np.asarray(e.indices, np.int32),
                    weights=np.asarray(e.weights, np.float32),
                    diag=np.asarray(e.diag, np.float32),
                )
            os.replace(g_tmp, self.directory / GRAPH_ELL_FILE)
            g_shape = list(e.shape)
        else:
            G = np.ascontiguousarray(np.asarray(self.gl.matrix, np.float32))
            g_tmp = self.directory / (GRAPH_FILE + ".tmp")
            g_tmp.write_bytes(G.tobytes())
            os.replace(g_tmp, self.directory / GRAPH_FILE)
            g_shape = list(G.shape)

        def _num(v):
            return float(v) if np.isfinite(v) else None

        if self.sub_centroids is not None:
            e_tmp = self.directory / (ENERGY_FILE + ".tmp")
            # Close BEFORE the rename: zipfile never closes a passed
            # handle, and renaming an unflushed file would publish a
            # truncated energy.npz — the exact corruption tmp+rename is
            # here to prevent.
            with e_tmp.open("wb") as fh:
                np.savez(
                    fh,
                    sub_centroids=np.asarray(self.sub_centroids, np.float32),
                    subcentroid_lambdas=np.asarray(
                        self.subcentroid_lambdas, np.float32
                    ),
                )
            os.replace(e_tmp, self.directory / ENERGY_FILE)

        meta = {
            "min_lambdas": _num(self.min_lambdas),
            "range_lambdas": _num(self.range_lambdas),
            "n_items": self.n_items,
            "n_features": self.n_features,
            "block_rows": self.block_rows,
            "taumode": {"mode": int(self.taumode.mode),
                        "param": float(self.taumode.param)},
            "graph_params": dataclasses.asdict(self.gl.graph_params),
            "graph_nnodes": self.gl.nnodes,
            "graph_shape": g_shape,
            "graph_format": "ell" if self.gl.is_ell_backed else "dense",
            "energy_mode": self.sub_centroids is not None,
            "projection": (
                None if self.projection is None else {
                    "seed": int(self.projection.seed),
                    "original_dim": int(self.projection.original_dim),
                    "reduced_dim": int(self.projection.reduced_dim),
                }
            ),
        }
        m_tmp = self.directory / (INDEX_FILE + ".tmp")
        m_tmp.write_text(json.dumps(meta, allow_nan=False))
        os.replace(m_tmp, self.directory / INDEX_FILE)

    @classmethod
    def load(cls, directory) -> "StreamingIndex":
        """Resume from ``index.json`` + ``graph.bin`` + ``lambdas.bin``
        (no recompute)."""
        directory = Path(directory)
        meta = json.loads((directory / INDEX_FILE).read_text())
        params = GraphParams(**meta["graph_params"])
        shape = tuple(meta["graph_shape"])
        if meta.get("graph_format") == "ell":
            from matternet_rs_tpu.ops.csr import EllLaplacian

            with np.load(directory / GRAPH_ELL_FILE) as gz:
                ell = EllLaplacian(
                    indices=jnp.asarray(gz["indices"]),
                    weights=jnp.asarray(gz["weights"]),
                    diag=jnp.asarray(gz["diag"]),
                )
            gl = GraphLaplacian.from_ell(
                ell, init_data=ell.weights, nnodes=meta["graph_nnodes"],
                graph_params=params,
            )
        else:
            matrix = jnp.asarray(
                np.frombuffer(
                    (directory / GRAPH_FILE).read_bytes(), np.float32
                ).reshape(shape)
            )
            gl = GraphLaplacian(
                matrix=matrix, init_data=matrix, nnodes=meta["graph_nnodes"],
                graph_params=params,
            )

        def _num(v):
            return float("nan") if v is None else float(v)

        sub_c = sc_lam = None
        if meta.get("energy_mode"):
            with np.load(directory / ENERGY_FILE) as ez:
                sub_c = ez["sub_centroids"]
                sc_lam = ez["subcentroid_lambdas"]
        proj = None
        if meta.get("projection"):
            from matternet_rs_tpu.reduction import ImplicitProjection

            pj = meta["projection"]
            proj = ImplicitProjection(
                pj["original_dim"], pj["reduced_dim"], pj["seed"]
            )
        return cls(
            directory=directory, gl=gl,
            taumode=TauMode(meta["taumode"]["mode"], meta["taumode"]["param"]),
            min_lambdas=_num(meta["min_lambdas"]),
            range_lambdas=_num(meta["range_lambdas"]),
            n_items=meta["n_items"], n_features=meta["n_features"],
            block_rows=meta["block_rows"],
            sub_centroids=sub_c, subcentroid_lambdas=sc_lam,
            projection=proj,
        )

    # ------------------------------------------------------------------
    def _reduced_query(self, q):
        """Project to the λ-preparation space when a JL projection is
        active (corpus scoring stays original-dim)."""
        if (
            self.projection is not None
            and q.shape[-1] == self.projection.original_dim
        ):
            return jnp.asarray(self.projection.project(jnp.asarray(q)))
        return jnp.asarray(q)

    def prepare_query_lambda(self, query) -> float:
        q = jnp.asarray(query, jnp.float32)
        if self.sub_centroids is not None:
            qr = np.asarray(self._reduced_query(q))
            d = np.sum((self.sub_centroids - qr[None, :]) ** 2, axis=-1)
            return float(np.asarray(self.subcentroid_lambdas)[int(d.argmin())])
        qr = self._reduced_query(q)
        graph = (
            self.gl.ell()
            if self.gl.is_ell_backed
            or self.gl.shape[0] > taumode_ops.SPARSE_F_THRESHOLD
            else self.gl.matrix
        )
        raw = float(
            taumode_ops.synthetic_lambda(
                qr, graph, self.taumode.mode, self.taumode.param
            )
        )
        return float(
            np.clip((raw - self.min_lambdas) / self.range_lambdas, 0.0, 1.0)
        )

    def _lambda_blocks(self):
        lam = np.memmap(
            self.directory / LAMBDA_FILE, np.float32, "r", shape=(self.n_items,)
        )
        for start in range(0, self.n_items, self.block_rows):
            yield lam[start : start + self.block_rows]

    def _query_lambdas(self, Q: jax.Array) -> jax.Array:
        """Normalized query λ per row — energy mode routes through the
        nearest sub-centroid, eigen mode through the taumode graph."""
        if self.sub_centroids is not None:
            Qr = np.asarray(self._reduced_query(Q))
            dd = (
                (Qr[:, None, :] - self.sub_centroids[None, :, :]) ** 2
            ).sum(-1)
            return jnp.asarray(
                np.asarray(self.subcentroid_lambdas, np.float32)[dd.argmin(1)]
            )
        Qr = self._reduced_query(Q)
        graph = (
            self.gl.ell()
            if self.gl.is_ell_backed
            or self.gl.shape[0] > taumode_ops.SPARSE_F_THRESHOLD
            else self.gl.matrix
        )
        raw = taumode_ops.taumode_lambdas_auto(
            Qr, graph, self.taumode.mode, self.taumode.param
        )
        return jnp.clip(
            (raw - self.min_lambdas) / self.range_lambdas, 0.0, 1.0
        )

    def _stream_topk(self, kernel, b: int, k: int, ascending: bool,
                     quantized: bool = False):
        """THE streamed top-k core: fixed-shape blocks through the device,
        per-block top-k via ``kernel(block, lam_slice, valid)``, merged
        into a DEVICE-side carry (``_merge_topk_jit``). Shared by the
        blended and energy paths so padding / reader-cleanup / merge fixes
        land once.

        The whole stream is asynchronous: uploads enqueue, each block's
        kernel + merge chains onto the carry, and the ONLY device→host
        transfer is the final [b, k] result. The round-2 version
        synchronized per block (download top-k, merge on the host) — at
        10M×96 that serialized 39 round-trips and ran at 27 MB/s effective;
        async chaining leaves disk/H2D as the only bottleneck. A
        block-on-carry every ``FLIGHT_BLOCKS`` bounds in-flight device
        memory (corpus >> HBM must not queue entirely on device)."""
        FLIGHT_BLOCKS = 8
        kk = min(k, self.n_items)
        fill = jnp.inf if ascending else -jnp.inf
        best_scores = jnp.full((b, kk), fill, jnp.float32)
        best_ids = jnp.full((b, kk), -1, jnp.int32)
        offset = 0
        n_flight = 0
        reader = shard_store.stream_blocks(self.directory, self.block_rows)
        try:
            for block, lam in zip(reader, self._lambda_blocks()):
                valid = len(block)
                if valid < self.block_rows:   # pad tail to the fixed shape
                    block = np.concatenate(
                        [block,
                         np.zeros((self.block_rows - valid, self.n_features),
                                  np.float32)]
                    )
                    lam = np.concatenate(
                        [lam, np.zeros(self.block_rows - valid, np.float32)]
                    )
                if quantized:
                    block = _host_bf16(block)
                sc, idx = kernel(
                    jnp.asarray(block), jnp.asarray(lam), jnp.int32(valid)
                )
                best_scores, best_ids = _merge_topk_jit(
                    best_scores, best_ids, sc, idx.astype(jnp.int32),
                    jnp.int32(offset), ascending=ascending, kk=kk,
                )
                offset += valid
                n_flight += 1
                if n_flight >= FLIGHT_BLOCKS:
                    jax.block_until_ready(best_scores)
                    n_flight = 0
        finally:
            reader.close()
        return (
            np.asarray(best_ids, np.int64),
            np.asarray(best_scores),
        )

    def search(
        self, query, k: int, alpha: float = 0.7, quantized: bool = False,
    ) -> list[tuple[int, float]]:
        """Streamed exact blended top-k: one block of HBM at a time.

        ``quantized=True`` converts each block to bf16 on the host before
        upload — half the H2D bytes (the out-of-core bottleneck) at the
        usual bf16 ranking fidelity (DESIGN.md)."""
        idx, sc = self.search_batch(
            np.asarray(query, np.float32)[None, :], k, alpha,
            quantized=quantized,
        )
        return [
            (int(i), float(s)) for i, s in zip(idx[0], sc[0]) if i >= 0
        ]

    def search_batch(
        self, queries, k: int, alpha: float = 0.7, quantized: bool = False,
    ):
        """Batched streamed top-k. Returns ``(indices [B, k], scores [B, k])``."""
        Q = jnp.asarray(queries, jnp.float32)
        if Q.ndim == 1:
            Q = Q[None, :]
        if Q.shape[-1] != self.n_features:
            raise ValueError(
                f"Query dimension {Q.shape[-1]} doesn't match index "
                f"dimension {self.n_features}"
            )
        q_lams = self._query_lambdas(Q)

        al = _alpha_param(alpha, Q.shape[0])

        def kernel(Xb, lamb, valid):
            return _score_block_batch(
                Xb, lamb, Q, q_lams, al,
                jnp.float32(self.min_lambdas), jnp.float32(self.range_lambdas),
                valid, min(min(k, self.n_items), self.block_rows),
            )

        return self._stream_topk(
            kernel, Q.shape[0], k, ascending=False, quantized=quantized
        )

    # ----------------------------------------------------------------
    # Resident-sketch search: the answer to transports slower than disk.
    # The streamed exact scan above ships the WHOLE corpus host→device on
    # every query batch — correct, but bounded by the slowest link (a
    # congested tunnel runs it at ~25 MB/s; even bare PCIe caps a 3.8 GB
    # scan at ~250 ms). The sketch inverts the data movement: ONE pass
    # uploads an int8 row-quantized copy (N×(F+8) bytes — 1.0 GB at
    # 10M×96, 10.4 GB at the Deep1B 100M×96 stretch, both HBM-fit), every
    # search scans it at HBM bandwidth, and only the top-`candidates`
    # rows per query are fetched from disk (seek arithmetic,
    # storage/shards.read_rows) for an exact f32 rescore. No reference
    # counterpart (its search is all in-memory, src_legacy/core.rs).
    # ----------------------------------------------------------------
    def sketch_host_buffers(self, persist: bool = True, force: bool = False,
                            nb_pad: int | None = None):
        """Assemble the stacked sketch HOST buffers ``(X8 [nb, blk, F]
        int8, mult [nb, blk], lam [nb, blk], valid [nb])`` — the quantize
        pass of :meth:`build_sketch` without the device upload. Used
        directly by the mesh-sharded sketch (``parallel/sketch.py``),
        which places each device's block slice itself.

        ``nb_pad``: allocate (and return) that many blocks instead of the
        natural count — trailing blocks stay zero with ``valid = 0``. The
        sharded caller needs the block count divisible by the device
        count, and padding at allocation time avoids a second full-sketch
        copy (``np.concatenate`` would double peak host RAM — 2× 104 GB
        at the 1B×96 target this tier exists for)."""
        sk_path = self.directory / SKETCH_FILE
        meta_path = self.directory / SKETCH_META_FILE
        n, f, blk = self.n_items, self.n_features, self.block_rows
        nb = (n + blk - 1) // blk
        nb_alloc = max(nb, nb_pad or 0)
        X8h = np.zeros((nb_alloc, blk, f), np.int8)
        multh = np.zeros((nb_alloc, blk), np.float32)
        lamh = np.zeros((nb_alloc, blk), np.float32)
        validh = np.zeros(nb_alloc, np.int32)

        def _fill(i, q8, mult, lam, valid):
            X8h[i, :valid] = q8[:valid]
            multh[i, :valid] = mult[:valid]
            lamh[i, :valid] = lam[:valid]
            validh[i] = valid

        if sk_path.exists() and meta_path.exists() and not force:
            # Reload through the native read-ahead reader (VERDICT r3 #7):
            # the next sketch block is read from disk while this one is
            # copied into the stacked buffer — a plain memmap walk pays
            # synchronous page-fault IO for the whole 1-byte/elem file
            # (347 s at the 100M×96 stretch's 10.4 GB on the sandbox's
            # sequential-disk floor; the reader overlaps it like the
            # corpus path's block streams).
            from matternet_rs_tpu.native import ShardReader

            with np.load(meta_path) as z:
                mult_all = np.asarray(z["mult"], np.float32)
            reader = ShardReader([sk_path], blk, f, dtype=np.int8)
            try:
                start = 0
                for i, (q8, lam) in enumerate(
                    zip(reader, self._lambda_blocks())
                ):
                    stop = min(start + blk, n)
                    _fill(i, q8, mult_all[start:stop],
                          np.asarray(lam), stop - start)
                    start = stop
            finally:
                reader.close()
        else:
            tmp = self.directory / (SKETCH_FILE + ".tmp")
            fh = open(tmp, "wb") if persist else None
            try:
                reader = shard_store.stream_blocks(self.directory, blk)
                try:
                    for i, (block, lam) in enumerate(
                        zip(reader, self._lambda_blocks())
                    ):
                        q8, mult = _quantize_rows(
                            np.asarray(block, np.float32)
                        )
                        if fh is not None:
                            fh.write(q8.tobytes())
                        _fill(i, q8, mult, np.asarray(lam), len(block))
                finally:
                    reader.close()
                if fh is not None:
                    fh.close()
                    fh = None
                    _publish_sketch_files(
                        self.directory, tmp, multh.reshape(-1)[:n]
                    )
            finally:
                if fh is not None:
                    fh.close()
                tmp.unlink(missing_ok=True)    # no-op when published
        return X8h, multh, lamh, validh

    def build_sketch(self, persist: bool = True, force: bool = False):
        """Quantize the on-disk corpus to a device-resident int8 sketch.

        One streamed pass (host-side ``_quantize_rows``); the quantized
        blocks accumulate into ONE host-pinned ``[nb, blk, F]`` buffer that
        ships to the device in a single transfer — a quarter of the f32
        H2D bytes, and no per-block RPC overhead. ``persist=True`` also
        writes ``sketch.bin`` + ``sketch_meta.npz`` beside the shards so
        later sessions upload straight from the 1-byte/elem file instead
        of re-reading the 4-byte corpus. Returns the stacked device tuple
        (also cached on ``self._sketch``)."""
        X8h, multh, lamh, validh = self.sketch_host_buffers(
            persist=persist, force=force
        )
        # One transfer per array: [nb, blk, F] int8 + metadata. Every
        # search is then a SINGLE device program (lax.scan over the
        # leading axis) — no per-block dispatches, no device-side restack.
        self._sketch = (
            jax.device_put(X8h),
            jax.device_put(multh),
            jax.device_put(lamh),
            jax.device_put(validh),
        )
        jax.block_until_ready(self._sketch[0])
        self._sketch_flat = None
        # Suffix-pad check for the maxima-first fast path (sequential
        # streaming guarantees it; a custom nb_pad layout would not).
        self._sketch_suffix_pad = suffix_padded(validh, X8h.shape[1])
        return self._sketch

    def _sketch_fused_ok(self, b_pad: int, kk: int, cand: int) -> bool:
        """Envelope for the maxima-first sketch scan: suffix-only
        padding, tile-divisible flat length, the shared rescored-path
        predicate (TPU platform, batch multiple of 8, slab budget, F
        lane alignment — satisfied here by padding F up), and an HBM
        guard for the flat copy. The flatten is a jit whose outputs
        cannot alias its inputs, so it allocates a SECOND resident
        ``[n, f_pad]`` int8 buffer for every F, aligned or not (plus the
        normalized-λ column); at the 100M×96 stretch that would not fit
        beside the stacked sketch, so such shapes stay on the carry
        scan."""
        if self.sketch_maxfirst is False:
            return False
        if self._sketch is None or not self._sketch_suffix_pad:
            return False
        from matternet_rs_tpu.ops.search import (
            DEFAULT_TILE,
            fused_rescored_path,
        )

        nb, blk, f = self._sketch[0].shape
        n = nb * blk
        if self.sketch_maxfirst is None and n < MAXFIRST_MIN_ROWS:
            return False                 # auto: below the measured crossover
        f_pad = -(-f // 128) * 128
        if n * f_pad > 4 * 1024**3:
            return False
        return n % DEFAULT_TILE == 0 and fused_rescored_path(
            n, f_pad, b_pad, kk, cand
        )

    def _sketch_flat_views(self):
        flat = self._sketch_flat          # lock-free fast path (one read)
        if flat is not None:
            return flat
        with self._sketch_flat_lock:
            if self._sketch_flat is None:
                X8s, mults, lams, _valids = self._sketch
                self._sketch_flat = _sketch_flatten_jit(
                    X8s, mults, lams,
                    jnp.float32(self.min_lambdas),
                    jnp.float32(self.range_lambdas),
                )
            return self._sketch_flat

    def search_batch_sketch(
        self, queries, k: int, alpha: float = 0.7,
        candidates: int | None = None, refine: bool = True,
    ):
        """Two-stage out-of-core search: resident int8 sketch scan →
        disk fetch of the per-query top-``candidates`` → exact f32
        rescore over the candidate union. Returns ``(ids [B, kk],
        scores [B, kk])`` like :meth:`search_batch`; the rescore ranks
        with the same parity-grade kernel as the exact streamed scan, so
        any deviation from it is purely sketch-stage recall (measured in
        tests/bench; raise ``candidates`` to push it to 1.0).

        ``refine=False`` serves straight from the sketch scan: the same
        top-``candidates`` device scan, but the result is its first ``k``
        columns — no disk fetch, no rescore, and the host downloads only
        ``[B, k]`` instead of the ``[B, candidates]`` id matrix plus
        candidate rows. Scores carry int8/bf16 quantization (~0.4 %
        relative); use it when the serving floor is transport/disk rather
        than exactness (recall vs the refined mode is measured in bench).
        """
        if self._sketch is None:
            self.build_sketch()
        Q = jnp.asarray(queries, jnp.float32)
        if Q.ndim == 1:
            Q = Q[None, :]
        if Q.shape[-1] != self.n_features:
            raise ValueError(
                f"Query dimension {Q.shape[-1]} doesn't match index "
                f"dimension {self.n_features}"
            )
        q_lams = self._query_lambdas(Q)
        b = Q.shape[0]
        kk = min(k, self.n_items)
        C = min(
            candidates if candidates is not None else max(4 * k, 32),
            self.n_items, self.block_rows,
        )
        C = max(C, kk)
        al = _alpha_param(alpha, Q.shape[0])
        mn = jnp.float32(self.min_lambdas)
        rng = jnp.float32(self.range_lambdas)

        # Maxima-first fast path (VERDICT r4 #5): one Pallas pass of
        # slab maxima + resident-slab rescore replaces the per-block
        # carry scan when the envelope holds (pad B to a multiple of 8 —
        # pow-2, so serving batch sizes share compiled programs).
        b_pad = max(8, 1 << max(b - 1, 1).bit_length())
        if self._sketch_fused_ok(b_pad, kk, C):
            Qp = Q if b_pad == b else jnp.pad(Q, ((0, b_pad - b), (0, 0)))
            qlp = (
                q_lams if b_pad == b
                else jnp.pad(jnp.asarray(q_lams), (0, b_pad - b))
            )
            a_vec = jnp.broadcast_to(
                jnp.asarray(alpha, jnp.float32).reshape(-1), (b,)
            ) if np.ndim(alpha) else jnp.full((b,), alpha, jnp.float32)
            if b_pad != b:
                a_vec = jnp.pad(a_vec, (0, b_pad - b))
            X8f, mult_f, lam_f = self._sketch_flat_views()
            if X8f.shape[1] != Qp.shape[1]:
                # F padded up to the 128-lane tile: zero query columns
                # leave every dot unchanged.
                Qp = jnp.pad(Qp, ((0, 0), (0, X8f.shape[1] - Qp.shape[1])))
            best_s, best_i = _sketch_maxfirst_topk(
                X8f, mult_f, lam_f, Qp, qlp, a_vec, rows_out=C,
                kfinal=kk, n_items=jnp.int32(self.n_items),
            )
            best_s, best_i = best_s[:b], best_i[:b]
        else:
            X8s, mults, lams, valids = self._sketch
            best_s, best_i = _sketch_scan_topk(
                X8s, mults, lams, valids, Q, q_lams, al, mn, rng, kk=C
            )
        if not refine:
            # Slice on device; only [B, k] crosses the wire.
            return (
                np.asarray(best_i[:, :kk]).astype(np.int64),
                np.asarray(best_s[:, :kk]),
            )

        return self.refine_candidates(
            np.asarray(best_i), Q, q_lams, al, mn, rng, kk
        )

    def _fetch_union(self, ids: np.ndarray, kk: int):
        """Candidate-union fetch for the refine stage: unique ids → disk
        rows (seek arithmetic) + λ memmap reads, pow-2 padded so repeat
        queries reuse one compiled rescore program."""
        uids = np.unique(ids[ids >= 0])
        XU = shard_store.read_rows(self.directory, uids)
        lam_mm = np.memmap(
            self.directory / LAMBDA_FILE, np.float32, "r",
            shape=(self.n_items,),
        )
        lamU = np.asarray(lam_mm[uids], np.float32)
        u = len(uids)
        u_pad = max(kk, 1 << (max(u, 1) - 1).bit_length())
        if u < u_pad:
            XU = np.concatenate(
                [XU, np.zeros((u_pad - u, self.n_features), np.float32)]
            )
            lamU = np.concatenate([lamU, np.zeros(u_pad - u, np.float32)])
        return uids, XU, lamU, u

    def refine_candidates(self, ids, Q, q_lams, al, mn, rng, kk: int):
        """Exact rescore of a ``[B, C]`` candidate-id matrix: fetch the
        candidate union from disk by seek arithmetic, rescore with the
        parity-grade kernel, return ``(ids [B, kk] int64, scores)``.
        Shared by the single-chip and mesh-sharded sketch paths."""
        uids, XU, lamU, u = self._fetch_union(np.asarray(ids), kk)
        if u == 0:
            # No valid candidates at all (every id -1): all-miss rows —
            # np.where would eagerly index the empty uids array otherwise.
            b = np.asarray(Q).shape[0]
            return (np.full((b, kk), -1, np.int64),
                    np.full((b, kk), -np.inf, np.float32))
        sc, sel = _refine_exact_topk(
            jnp.asarray(XU), jnp.asarray(lamU), Q, q_lams, al, mn, rng,
            jnp.int32(u), kk=kk,
        )
        sel = np.asarray(sel)
        sc = np.asarray(sc)
        gids = np.where(sc > -np.inf, uids[np.minimum(sel, u - 1)], -1)
        return gids.astype(np.int64), sc

    def search_sketch(
        self, query, k: int, alpha: float = 0.7,
        candidates: int | None = None, refine: bool = True,
    ) -> list[tuple[int, float]]:
        """Single-query convenience over :meth:`search_batch_sketch`."""
        idx, sc = self.search_batch_sketch(
            np.asarray(query, np.float32)[None, :], k, alpha,
            candidates=candidates, refine=refine,
        )
        return [
            (int(i), float(s)) for i, s in zip(idx[0], sc[0]) if i >= 0
        ]

    def search_energy_batch_sketch(
        self, queries, k: int, candidates: int | None = None,
        refine: bool = True,
    ):
        """Energy-mode search over the RESIDENT sketch: ascending |Δλ|
        with the cosine tie-break, scanned entirely on device (λ is
        resident f32, so the λ ranking is exact; the tie-break — active
        only within |Δλ| < 1e-9 — carries int8 rounding). ``refine=True``
        rescores the per-query top-``candidates`` from disk with the
        parity-grade energy kernel. Turns energy serving from a
        corpus-restream per batch into a device-resident scan — the same
        inversion as the blended sketch path (DESIGN.md)."""
        if self.sub_centroids is None:
            raise ValueError("not an energy-mode index (no sub-centroid state)")
        if self._sketch is None:
            self.build_sketch()
        Q = jnp.asarray(queries, jnp.float32)
        if Q.ndim == 1:
            Q = Q[None, :]
        if Q.shape[-1] != self.n_features:
            raise ValueError(
                f"Query dimension {Q.shape[-1]} doesn't match index "
                f"dimension {self.n_features}"
            )
        q_lams = self._query_lambdas(Q)
        kk = min(k, self.n_items)
        C = min(
            candidates if candidates is not None else max(4 * k, 32),
            self.n_items, self.block_rows,
        )
        C = max(C, kk)
        mn = jnp.float32(self.min_lambdas)
        rng = jnp.float32(self.range_lambdas)
        X8s, mults, lams, valids = self._sketch
        best_s, best_i = _sketch_scan_topk(
            X8s, mults, lams, valids, Q, q_lams, jnp.float32(0.0), mn, rng,
            kk=C, energy=True,
        )
        if not refine:
            return (
                np.asarray(best_i[:, :kk]).astype(np.int64),
                -np.asarray(best_s[:, :kk]),
            )
        return self.refine_energy_candidates(
            np.asarray(best_i), Q, q_lams, mn, rng, kk
        )

    def refine_energy_candidates(self, ids, Q, q_lams, mn, rng, kk: int):
        """Energy-mode counterpart of :meth:`refine_candidates` (exact
        ascending-|Δλ| rescore of the fetched union); shared by the
        single-chip and mesh-sharded sketch paths."""
        uids, XU, lamU, u = self._fetch_union(np.asarray(ids), kk)
        if u == 0:
            # All-miss rows (see refine_candidates) — ascending-distance
            # convention uses +inf sentinels.
            b = np.asarray(Q).shape[0]
            return (np.full((b, kk), -1, np.int64),
                    np.full((b, kk), np.inf, np.float32))
        sc, sel = _refine_energy_topk(
            jnp.asarray(XU), jnp.asarray(lamU), Q, q_lams, mn, rng,
            jnp.int32(u), kk=kk,
        )
        sel = np.asarray(sel)
        sc = np.asarray(sc)
        gids = np.where(sc < np.inf, uids[np.minimum(sel, u - 1)], -1)
        return gids.astype(np.int64), sc

    def search_energy_sketch(
        self, query, k: int, candidates: int | None = None,
        refine: bool = True,
    ) -> list[tuple[int, float]]:
        ids, sc = self.search_energy_batch_sketch(
            np.asarray(query, np.float32)[None, :], k,
            candidates=candidates, refine=refine,
        )
        return [
            (int(i), float(s)) for i, s in zip(ids[0], sc[0]) if i >= 0
        ]

    def search_energy_batch(self, queries, k: int):
        """Streamed energy search: λ-distance ascending with the cosine
        tie-break (energymaps.rs:628-674); HBM holds one block. Requires
        an energy-mode store."""
        if self.sub_centroids is None:
            raise ValueError("not an energy-mode index (no sub-centroid state)")
        Q = jnp.asarray(queries, jnp.float32)
        if Q.ndim == 1:
            Q = Q[None, :]
        if Q.shape[-1] != self.n_features:
            raise ValueError(
                f"Query dimension {Q.shape[-1]} doesn't match index "
                f"dimension {self.n_features}"
            )
        q_lams = self._query_lambdas(Q)

        def kernel(Xb, lamb, valid):
            return _energy_block_batch(
                Xb, lamb, Q, q_lams,
                jnp.float32(self.min_lambdas), jnp.float32(self.range_lambdas),
                valid, min(min(k, self.n_items), self.block_rows),
            )

        return self._stream_topk(kernel, Q.shape[0], k, ascending=True)

    def search_energy(self, query, k: int):
        idx, sc = self.search_energy_batch(
            np.asarray(query, np.float32)[None, :], k
        )
        return [(int(i), float(s)) for i, s in zip(idx[0], sc[0]) if i >= 0]


@functools.partial(jax.jit, static_argnames=("k",))
def _energy_block_batch(X, lams, Q, q_lams, mn, rng, valid, k):
    """Energy-mode block scores: ascending |Δλ| with the cosine tie-break
    at |Δλ| < 1e-9 (energymaps.rs:628-674 semantics, streamed)."""
    norms = jnp.sqrt(jnp.sum(X * X, axis=-1))
    qn = jnp.sqrt(jnp.sum(Q * Q, axis=-1))
    dots = mm(Q, X.T)
    cos = dots / (qn[:, None] * norms[None, :] + 1e-9)
    lam_n = jnp.clip((lams - mn) / rng, 0.0, 1.0)
    lam_dist = jnp.abs(lam_n[None, :] - q_lams[:, None])
    scores = lam_dist + jnp.where(lam_dist < 1e-9, (1.0 - cos) * 1e-9, 0.0)
    scores = jnp.where(
        jnp.arange(X.shape[0])[None, :] < valid, scores, jnp.inf
    )
    neg, idx = jax.lax.top_k(-scores, k)
    return -neg, idx
