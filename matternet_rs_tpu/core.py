"""ArrowSpace: the item store + λ index container.

TPU-native counterpart of the reference's ``ArrowSpace``
(``/root/reference/src_legacy/core.rs:370-1454``): holds the ``[N, F]`` data
as a device array, per-item synthetic λ, λ normalization stats, the sorted-λ
index, clustering/projection metadata, and the energymaps fields. All search
paths are jitted device scans (see :mod:`matternet_rs_tpu.ops.search`).
"""

from __future__ import annotations

import dataclasses
import logging
import threading
from typing import Optional

log = logging.getLogger(__name__)

import jax
import jax.numpy as jnp
import numpy as np

from matternet_rs_tpu.graph import GraphLaplacian
from matternet_rs_tpu.index.sorted import SortedLambdas
from matternet_rs_tpu.ops import search as search_ops
from matternet_rs_tpu.ops import taumode as taumode_ops
from matternet_rs_tpu.reduction import ImplicitProjection

TAU_FLOOR = taumode_ops.TAU_FLOOR

import functools


@jax.jit
def _normalize_lambdas_jit(raw):
    """Min-max normalization to [0,1] (core.rs:1341-1354: max folded from
    0.0, range floored at 1e-9). Returns (normalized, [min, max, range])."""
    mn = jnp.min(raw)
    mx = jnp.maximum(jnp.max(raw), 0.0)
    rng = jnp.maximum(mx - mn, 1e-9)
    return (raw - mn) / rng, jnp.stack([mn, mx, rng])


@jax.jit
def _nearest_subcentroid_lambda_jit(sub_c, sc_lams, q):
    d = jnp.sum((sub_c - q[None, :]) ** 2, axis=-1)
    return sc_lams[jnp.argmin(d)]


# Re-exported routing threshold (see ops/search.py for rationale).
TILEMAX_MIN_N = search_ops.TILEMAX_MIN_N

# Every named scan tier search_batch accepts (beyond the bf16-copy bool).
# Validated at the shared search_batch layer: an unknown/mistyped string
# ("bf16x3", "int8-rescored", ...) must raise, not silently fall through
# the tier dispatch to the truthy-string bf16 scan with degraded recall.
QUANT_TIERS = frozenset(
    {"auto", "int8", "int8_auto", "int8_rescored", "bf16_rescored",
     "bf16x3_rescored"}
)

# Tiers that are measurably DOMINATED on the common (clustered) corpus
# shape and therefore gated behind an explicit override (VERDICT r4 #7):
# bf16_rescored measured recall@10 0.55 on the clustered 1M fixture while
# int8_rescored was simultaneously faster (2.36 vs 2.37-2.83 ms), 2x the
# recall (0.875) and half the sketch bytes. It survives only as a
# spread/normalized-corpus comparison rung — reachable with
# allow_low_recall=True, never by default.
LOW_RECALL_TIERS = frozenset({"bf16_rescored"})


def _routed_batched_search(X, norms, lams, Q, q_lams, k, alphas, approx):
    """Shared body of the batched-search jits: exact scans above
    TILEMAX_MIN_N route through the tile-max pruned selection
    (score-exact at reduction cost; at 128 < F ≤ 2048 on TPU the fused
    producer's SELF-CONSISTENT scores apply — ~1e-6-rel of the flat
    kernel's, near-tie index substitution only, see PARITY.md) — from
    FUSED_TILEMAX_MIN_N when the FULL fused pipeline applies (producer +
    grouped-DMA gather + non-degenerate selection,
    `ops/search.fused_fast_path`); otherwise the vmapped single-query
    kernel (bit-identical to serial search, approx_max_k when asked)."""
    n = X.shape[0]
    tilemax_n = (
        search_ops.FUSED_TILEMAX_MIN_N
        if search_ops.fused_fast_path(
            n, X.shape[1], Q.shape[0], X.dtype, min(k, n)
        )
        else TILEMAX_MIN_N
    )
    if not approx and n >= tilemax_n:
        return search_ops.search_lambda_aware_tilemax(
            X, norms, lams, Q, q_lams, k, alphas
        )
    return jax.vmap(
        lambda q, ql, a: search_ops.search_lambda_aware(
            X, norms, lams, q, ql, k, a, approx=approx
        )
    )(Q, q_lams, alphas)


@functools.partial(jax.jit, static_argnames=("k", "approx"))
def _batched_search_jit(X, norms, lams, Q, q_lams, k, alphas, approx):
    """``alphas`` is a traced ``[B]`` vector — heterogeneous per-query
    blend weights share ONE compiled program (the serve batcher would
    otherwise fragment into a program per distinct alpha)."""
    return _routed_batched_search(X, norms, lams, Q, q_lams, k, alphas, approx)


@functools.partial(jax.jit, static_argnames=("k", "approx"))
def _batched_search_normalized_jit(X, norms, lams, Q, raw, mn, rng, k, alphas, approx):
    """Search with the query-λ normalization folded in — one dispatch
    instead of four (sub/div/clip each cost a round-trip when eager on a
    remote-attached TPU). ``alphas`` is traced per-query (see above)."""
    q_lams = jnp.clip((raw - mn) / rng, 0.0, 1.0)
    return _routed_batched_search(X, norms, lams, Q, q_lams, k, alphas, approx)


@jax.jit
def _quantize_rows_device_jit(X):
    """Per-row symmetric int8 quantization ON DEVICE: ``q8 = rint(x/scale)``
    with ``scale = maxabs/127``; ``mult`` dequantizes a raw int8 dot
    straight to cosine numerator/|x| (zero rows get mult 0 — the
    guarded-cosine convention). Same math as the out-of-core sketch's
    host-side ``index.streaming._quantize_rows``."""
    maxabs = jnp.max(jnp.abs(X), axis=1)
    norms = jnp.sqrt(jnp.sum(X * X, axis=1))
    scale = jnp.where(maxabs > 0, maxabs / 127.0, 1.0)
    q8 = jnp.rint(X / scale[:, None]).astype(jnp.int8)
    mult = jnp.where(norms > 1e-12, scale / jnp.maximum(norms, 1e-12), 0.0)
    return q8, mult.astype(jnp.float32)


def _cand_select_rescore(scores, X, norms, lams, Q, q_lams, qn, alphas,
                         k, cand, approx):
    """Shared tail of the two-stage rescored tiers: per-query top-``cand``
    candidate selection over the scan ``scores [B, N]`` → on-device gather
    of the f32 candidate rows → parity-grade exact rescore → top-``k``.
    Deviation from the exact f32 scan is pure candidate-stage recall,
    governed by ``cand``."""
    if approx and cand * 16 <= X.shape[0]:
        _, idx = jax.lax.approx_max_k(scores, cand, recall_target=0.95)
    elif X.shape[0] >= TILEMAX_MIN_N:
        # Exact candidate selection at reduction cost (not sort cost) —
        # tie substitutions at the pool boundary are absorbed by the
        # exact rescore downstream, same as the approx branch's recall.
        _, idx = search_ops.tilemax_topk(scores, cand)           # [B, cand]
    else:
        _, idx = jax.lax.top_k(scores, cand)                     # [B, cand]
    XU = X[idx]                                                  # [B, cand, F]
    d2 = jnp.einsum(
        "bf,bcf->bc", Q, XU, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    cos2 = search_ops._guarded_cosine(d2, norms[idx] * qn[:, None])
    s2 = search_ops._blend(cos2, lams[idx], q_lams[:, None], alphas[:, None])
    top, sel = jax.lax.top_k(s2, k)
    return jnp.take_along_axis(idx, sel, axis=1), top


@functools.partial(jax.jit, static_argnames=("k", "cand", "approx"))
def _batched_search_int8_jit(
    X8, mult, X, norms, lams, Q, raw, mn, rng, k, cand, alphas, approx
):
    """Two-stage in-memory search in ONE program: int8 corpus scan (a
    quarter of the f32 HBM read; int8 rows ride the MXU as bf16 — exact
    for values in [-127, 127]) → exact rescore of the per-query candidate
    pool (:func:`_cand_select_rescore`). The same memory-hierarchy
    inversion as the out-of-core sketch (DESIGN.md), but the "disk fetch"
    is an HBM gather, so the whole refine stays in the dispatch.

    Per-candidate pool cut (recall@10 0.9875 on the clustered 1M bench
    fixture) — the maxima-first variant of the same scan precision is the
    separate ``quantized="int8_rescored"`` tier (faster, coarser 128-row
    selection units: 0.875 there)."""
    q_lams = jnp.clip((raw - mn) / rng, 0.0, 1.0)
    return _int8_poolcut_scan(
        X8, mult, X, norms, lams, Q, q_lams, k, cand, alphas, approx
    )


def _int8_poolcut_scan(X8, mult, X, norms, lams, Q, q_lams, k, cand,
                       alphas, approx):
    """Shared pool-cut int8 scan body (traced inside the jitted tiers):
    one bf16 MXU pass over the losslessly-upcast int8 corpus, per-row
    dequant to cosine, per-candidate top-``cand`` cut, exact rescore."""
    qn = jnp.sqrt(jnp.sum(Q * Q, axis=-1))                       # [B]
    dots = jnp.dot(
        Q.astype(jnp.bfloat16), X8.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )                                                            # [B, N]
    cos = jnp.clip(
        dots * mult[None, :] / jnp.maximum(qn[:, None], 1e-12), -1.0, 1.0
    )
    scores = search_ops._blend(cos, lams[None, :], q_lams[:, None], alphas[:, None])
    return _cand_select_rescore(
        scores, X, norms, lams, Q, q_lams, qn, alphas, k, cand, approx
    )


@functools.partial(jax.jit, static_argnames=("k", "cand", "approx"))
def _batched_search_i8r_jit(
    X8, mult, X, norms, lams, Q, raw, mn, rng, k, cand, alphas, approx
):
    """int8 maxima-first rescored tier (``quantized="int8_rescored"``) —
    the fastest measured rung at 1M×128 (2.28 ms/256q, 1.50× the exact
    tier; 151k QPS at B=1024): ONE MXU pass over the LOSSLESS bf16
    upcast of the int8 corpus (integers in [-127, 127] are exact in
    bf16) at a QUARTER of the f32 corpus read, emitting only per-sub-tile
    score maxima — the per-row dequant multiplier rides the epilogue's
    ``rn`` multiply for free (``scan_rn=mult``) — then the exact ring-DMA
    slab rescore (ops/search.fused_scan_rescored).

    Selection-precision ladder on the clustered 1M fixture (recall@10 vs
    exact at default ``candidates``): bf16_rescored 0.55 < THIS 0.875 <
    "int8" pool-cut 0.9875 < bf16x3_rescored 1.0. This tier DOMINATES
    bf16_rescored (faster, 2× better recall, half the sketch memory);
    the pool-cut "int8" tier keeps higher recall by selecting individual
    candidates instead of 128-row slabs at +6% ms. Returned scores are
    parity-grade (exact rescores) in all cases.

    Off the fused envelope (CPU, tiny corpora, huge ``candidates``) it
    falls back to the pool-cut scan — ``candidates=N`` reproduces the
    exact f32 search bit-for-bit, the same escape hatch as the other
    rescored tiers."""
    q_lams = jnp.clip((raw - mn) / rng, 0.0, 1.0)
    if search_ops.fused_rescored_path(
        X8.shape[0], X8.shape[1], Q.shape[0], min(k, X8.shape[0]), cand
    ):
        return search_ops.fused_scan_rescored(
            X8, X, norms, lams, Q, q_lams, k, cand, alphas, scan_rn=mult
        )
    return _int8_poolcut_scan(
        X8, mult, X, norms, lams, Q, q_lams, k, cand, alphas, approx
    )


@functools.partial(jax.jit, static_argnames=("k", "cand", "approx"))
def _batched_search_bf16r_jit(
    Xb, X, norms, lams, Q, raw, mn, rng, k, cand, alphas, approx
):
    """bf16 scan + exact rescore — the int8 tier's structure at bf16 scan
    precision (VERDICT r3 #3: "bf16-pass scoring + exact top-k rescore").
    One single-pass bf16 MXU matmul over the half-width corpus copy
    selects the per-query top-``cand`` (vs 6 HIGHEST passes for the exact
    f32 scan); the f32 HIGHEST rescore restores parity-grade ranking on
    the pool. Scan-stage cosine uses the EXACT f32 row norms (the corpus
    rows are bf16-rounded, the norms are not), so the only scan error is
    the bf16 rounding of each dot — tighter than int8's per-row
    quantization grid."""
    q_lams = jnp.clip((raw - mn) / rng, 0.0, 1.0)
    if search_ops.fused_rescored_path(
        Xb.shape[0], Xb.shape[1], Q.shape[0], min(k, Xb.shape[0]), cand
    ):
        # Maxima-first fused path: one bf16 MXU pass emits only sub-tile
        # maxima (no [B, N] score write), then every row of the selected
        # slabs is exact-rescored (ops/search.fused_scan_rescored).
        return search_ops.fused_scan_rescored(
            Xb, X, norms, lams, Q, q_lams, k, cand, alphas
        )
    qn = jnp.sqrt(jnp.sum(Q * Q, axis=-1))                       # [B]
    dots = jnp.dot(
        Q.astype(jnp.bfloat16), Xb.T, preferred_element_type=jnp.float32
    )                                                            # [B, N]
    cos = search_ops._guarded_cosine(dots, norms[None, :] * qn[:, None])
    scores = search_ops._blend(cos, lams[None, :], q_lams[:, None], alphas[:, None])
    return _cand_select_rescore(
        scores, X, norms, lams, Q, q_lams, qn, alphas, k, cand, approx
    )


@functools.partial(jax.jit, static_argnames=("k", "cand", "approx"))
def _batched_search_b3r_jit(
    X, norms, lams, Q, raw, mn, rng, k, cand, alphas, approx
):
    """bf16x3 scan + exact rescore (``quantized="bf16x3_rescored"``) —
    the recommended throughput tier. The scan runs the f32 corpus through
    three bf16 MXU passes (the classic hi/lo f32≈bf16³ decomposition,
    ~21 effective mantissa bits — HALF the exact tier's 6 HIGHEST
    passes), so scan-stage ranking is ~f32-grade even on clustered
    corpora where one-pass bf16 rounding caps recall at ~0.72 and int8
    at ~0.99 (measured at 1M, DESIGN.md "rescored tiers"); the exact
    HIGHEST rescore of the selected slabs makes returned scores
    parity-grade. No quantized corpus copy is needed — the scan reads
    the f32 data.

    Off the fused envelope (CPU tests, tiny corpora) the fallback scans
    with ``Precision.HIGH`` dots (XLA's own 3-pass decomposition on TPU;
    plain f32 on CPU) and rescores the top-``cand`` pool."""
    q_lams = jnp.clip((raw - mn) / rng, 0.0, 1.0)
    if search_ops.fused_rescored_path(
        X.shape[0], X.shape[1], Q.shape[0], min(k, X.shape[0]), cand
    ):
        return search_ops.fused_scan_rescored(
            X, X, norms, lams, Q, q_lams, k, cand, alphas
        )
    qn = jnp.sqrt(jnp.sum(Q * Q, axis=-1))                       # [B]
    dots = jnp.dot(
        Q, X.T, precision=jax.lax.Precision.HIGH,
        preferred_element_type=jnp.float32,
    )                                                            # [B, N]
    cos = search_ops._guarded_cosine(dots, norms[None, :] * qn[:, None])
    scores = search_ops._blend(cos, lams[None, :], q_lams[:, None], alphas[:, None])
    return _cand_select_rescore(
        scores, X, norms, lams, Q, q_lams, qn, alphas, k, cand, approx
    )


def _alpha_vector(alpha, b_pad: int) -> jax.Array:
    """Scalar-or-[B] alpha → padded traced [b_pad] vector."""
    a = jnp.asarray(alpha, jnp.float32)
    if a.ndim == 0:
        return jnp.full((b_pad,), a, jnp.float32)
    if a.shape[0] != b_pad:
        a = jnp.pad(a, (0, b_pad - a.shape[0]))
    return a


@dataclasses.dataclass(frozen=True)
class TauMode:
    """τ-selection policy (reference: src_legacy/taumode.rs:17-25).

    ``TauMode.median()`` (default), ``.mean()``, ``.fixed(t)``,
    ``.percentile(p)``.
    """

    mode: int = taumode_ops.TAU_MEDIAN
    param: float = 0.0

    @classmethod
    def median(cls) -> "TauMode":
        return cls(taumode_ops.TAU_MEDIAN)

    @classmethod
    def mean(cls) -> "TauMode":
        return cls(taumode_ops.TAU_MEAN)

    @classmethod
    def fixed(cls, t: float) -> "TauMode":
        return cls(taumode_ops.TAU_FIXED, float(t))

    @classmethod
    def percentile(cls, p: float) -> "TauMode":
        return cls(taumode_ops.TAU_PERCENTILE, float(p))

    @property
    def name(self) -> str:
        return {
            taumode_ops.TAU_FIXED: "fixed",
            taumode_ops.TAU_MEDIAN: "median",
            taumode_ops.TAU_MEAN: "mean",
            taumode_ops.TAU_PERCENTILE: "percentile",
        }[self.mode]


TAUDEFAULT = TauMode.median()


class UndecidableQueryError(ValueError):
    """Raised when a query's raw λ is ~0 (reference panics, core.rs:920-934)."""


@dataclasses.dataclass
class ArrowItem:
    """A single owned row with its spectral score λ (core.rs:87-360).

    Convenience handle for query-time computations; the batch paths operate
    on raw arrays.
    """

    item: np.ndarray
    lam: float = 0.0

    def __post_init__(self):
        self.item = np.asarray(self.item, np.float64)

    def __len__(self) -> int:
        return len(self.item)

    def norm(self) -> float:
        return float(np.linalg.norm(self.item))

    def dot(self, other: "ArrowItem") -> float:
        if len(self) != len(other):
            raise ValueError("Dimension mismatch")
        return float(self.item @ np.asarray(other.item))

    def cosine_similarity(self, other) -> float:
        o = np.asarray(other.item if isinstance(other, ArrowItem) else other, np.float64)
        denom = np.linalg.norm(self.item) * np.linalg.norm(o)
        return float(self.item @ o / denom) if denom > 1e-12 else 0.0

    def euclidean_distance(self, other: "ArrowItem") -> float:
        return float(np.linalg.norm(self.item - np.asarray(other.item)))

    def scale(self, factor: float) -> None:
        self.item = self.item * factor

    def add(self, other: "ArrowItem") -> None:
        self.item = self.item + np.asarray(other.item)

    def lambda_component_similarity(self, other: "ArrowItem") -> float:
        """1 - min(|Δλ|, 1) (core.rs:141-146)."""
        return 1.0 - min(abs(self.lam - other.lam), 1.0)

    def lambda_similarity(self, other: "ArrowItem", alpha: float) -> float:
        """α·cos + (1-α)·λ-proximity (core.rs:162-179)."""
        return (
            alpha * self.cosine_similarity(other)
            + (1.0 - alpha) * self.lambda_component_similarity(other)
        )


@dataclasses.dataclass
class ArrowSpace:
    """Item store + λ index (reference: src_legacy/core.rs:370-407)."""

    data: jax.Array                      # [N, F] raw (or projected) items
    nfeatures: int                       # original F
    nitems: int
    taumode: TauMode = TAUDEFAULT

    signals: Optional[jax.Array] = None  # F×F spectral Laplacian (or None)
    lambdas: Optional[jax.Array] = None  # [N] normalized λ
    lambdas_sorted: Optional[SortedLambdas] = None

    # λ normalization stats (core.rs:1341-1354)
    min_lambdas: float = -1.0
    max_lambdas: float = -1.0
    range_lambdas: float = -1.0

    # clustering metadata
    n_clusters: int = 0
    cluster_assignments: Optional[np.ndarray] = None
    cluster_sizes: Optional[np.ndarray] = None
    cluster_radius: float = 0.0

    # projection metadata
    projection: Optional[ImplicitProjection] = None
    reduced_dim: Optional[int] = None
    extra_reduced_dim: bool = False

    # energymaps fields
    centroid_map: Optional[np.ndarray] = None          # [N] item → subcentroid
    sub_centroids: Optional[jax.Array] = None          # [S, F']
    subcentroid_lambdas: Optional[np.ndarray] = None   # [S]
    item_norms: Optional[jax.Array] = None             # [N] L2 norms

    # cached row norms for cosine scoring
    _norms: Optional[jax.Array] = None
    # cached ELL form of `signals` (large-F spectral mode)
    _signals_ell: Optional[object] = None
    # optional IVF pruned-search layout (index/ivf.py)
    ivf: Optional[object] = None
    # optional bf16 corpus copy for memory-bound scans (ops/search._scan_dots)
    _data_bf16: Optional[jax.Array] = None
    # optional int8 corpus sketch for the two-stage exact-rescored scan
    # (quantized="int8"): one (sketch [N, F] int8, per-row dequant-to-cosine
    # multiplier [N]) tuple — stored as a single attribute so a concurrent
    # reader can never observe a torn (stale sketch, fresh multiplier) pair
    # across a re-quantization.
    _i8_pair: Optional[tuple] = None
    # Guards the lazy sketch builds above: the serving dispatch pool runs
    # two _dispatch workers concurrently (serve.py), so two int8/bf16-tier
    # batches can race _ensure_int8/_scan_corpus — without the lock both
    # would quantize (transient 2× sketch allocation).
    _sketch_lock: threading.Lock = dataclasses.field(
        default_factory=threading.Lock, repr=False, compare=False
    )

    # The lock above is per-process runtime state: exclude it from pickle
    # and deepcopy (copy.deepcopy routes through __reduce_ex__, which uses
    # these) and recreate it fresh on the copy.
    def __getstate__(self):
        state = self.__dict__.copy()
        state.pop("_sketch_lock", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._sketch_lock = threading.Lock()

    # ------------------------------------------------------------------
    @classmethod
    def from_items(cls, items, taumode: TauMode = TAUDEFAULT) -> "ArrowSpace":
        data = jnp.asarray(items, dtype=jnp.float32)
        if data.ndim != 2 or data.shape[0] < 2:
            raise ValueError("need at least two item rows")
        return cls(
            data=data,
            nfeatures=int(data.shape[1]),
            nitems=int(data.shape[0]),
            taumode=taumode,
        )

    @property
    def norms(self) -> jax.Array:
        if self._norms is None or self._norms.shape[0] != self.data.shape[0]:
            norms = jnp.sqrt(jnp.sum(self.data * self.data, axis=-1))
            if isinstance(norms, jax.core.Tracer):
                # First access happened under a trace (e.g. inside a user's
                # jit/vmap closure) — don't leak the tracer into the cache.
                return norms
            self._norms = norms
        return self._norms

    def get_item(self, i: int) -> tuple[np.ndarray, float]:
        lam = float(self.lambdas[i]) if self.lambdas is not None else 0.0
        return np.asarray(self.data[i]), lam

    @classmethod
    def empty_with_projection(
        cls, proj_data: dict, nrows: int, ncols: int,
        taumode: TauMode = None,
    ) -> "ArrowSpace":
        """Empty shell carrying projection metadata from a typed config map
        (``storage.parquet.arrowspace_config_typed`` format) — the storage
        loaders' reconstruction seam (core.rs:485-560). Raises on
        ``extra_reduced_dim`` like the reference (:497-500)."""
        if proj_data.get("extra_reduced_dim"):
            raise ValueError(
                "Reconstructing with extra dim reduction is not implemented"
            )
        sp = cls(
            data=jnp.zeros((0, ncols), jnp.float32),
            nfeatures=int(ncols),
            nitems=int(nrows),
            taumode=taumode or TAUDEFAULT,
        )
        if proj_data.get("projection_original_dim") is not None:
            from matternet_rs_tpu.reduction import ImplicitProjection

            sp.projection = ImplicitProjection(
                int(proj_data["projection_original_dim"]),
                int(proj_data["reduced_dim"]),
                int(proj_data.get("projection_seed") or 0),
            )
            sp.reduced_dim = int(proj_data["reduced_dim"])
        return sp

    def cluster_of(self, i: int) -> Optional[int]:
        """Stage-1 cluster id of item ``i``, None for dropped outliers or
        when no clustering ran (core.rs:950-952)."""
        if self.cluster_assignments is None or i >= len(self.cluster_assignments):
            return None
        c = int(self.cluster_assignments[i])
        return None if c < 0 else c

    def drop_data(self) -> None:
        """Free the raw item matrix after persistence (core.rs:672-675) —
        λ, the sorted index, and metadata survive; feature-space searches
        require a reload."""
        log.info("Freeing raw input memory, should have been persisted to file")
        self.data = jnp.zeros((0, self.nfeatures), jnp.float32)
        self._norms = None
        self._data_bf16 = None
        self._i8_pair = None
        self.ivf = None

    def recompute_lambdas(self, gl: GraphLaplacian) -> None:
        """Recompute λ for all items against ``gl`` and refresh the sorted
        index if one was built (core.rs:1107-1130)."""
        self.compute_taumode(gl)
        if self.lambdas_sorted is not None:
            self.build_lambdas_sorted()

    def set_item(self, i: int, values) -> None:
        """Replace item ``i``'s vector (core.rs:993). λ is NOT recomputed —
        callers follow with :meth:`recompute_lambdas` (the mutation APIs
        below do)."""
        if not 0 <= i < self.nitems:
            # JAX drops out-of-bounds scatters silently — raise instead.
            raise ValueError(f"item index out of bounds: i={i}")
        v = jnp.asarray(values, jnp.float32)
        if v.shape != (self.nfeatures,):
            raise ValueError(
                f"item values must be shape ({self.nfeatures},), got {v.shape}"
            )
        self.data = self.data.at[i].set(v)
        self._invalidate_row_caches()

    def max_lambda_tie_group(self) -> int:
        """Largest equal-λ run (f32): sizes the banded energy search's
        ``candidates`` window — parity with the full scan needs the window
        to cover the tie group straddling rank k (energy-mode λ is
        quantized to sub-centroid values, so runs are ~N/n_subcentroids).
        Cached per λ array (``candidates="auto"`` sits on the serving hot
        path; λ arrays are replaced, never mutated in place)."""
        self._require_lambdas()
        cache = getattr(self, "_tie_group_cache", None)
        if cache is not None and cache[0] == id(self.lambdas):
            return cache[1]
        lam = np.asarray(self.lambdas, np.float32)
        if lam.size == 0:
            out = 0
        else:
            _, counts = np.unique(lam, return_counts=True)
            out = int(counts.max())
        self._tie_group_cache = (id(self.lambdas), out)
        return out

    def _invalidate_row_caches(self) -> None:
        """Drop every derived-from-``data`` cache after a row mutation and
        refresh the energy-mode ``item_norms`` (search_energy's cosine
        tie-break reads them; a stale norm mis-ranks the mutated item
        inside its equal-λ group)."""
        self._norms = None
        self._data_bf16 = None
        self._i8_pair = None
        if self.item_norms is not None:
            self.item_norms = jnp.sqrt(jnp.sum(self.data * self.data, axis=1))

    def superpose_items(self, a: int, b: int, gl: GraphLaplacian) -> None:
        """Elementwise ``item[a] += item[b]`` + λ recompute — the
        reference's two-index ``add_items`` (core.rs:1010-1043; renamed
        here because :meth:`add_items` is the incremental append API)."""
        if not (0 <= a < self.nitems and 0 <= b < self.nitems):
            raise ValueError(f"item indices out of bounds: a={a}, b={b}")
        self.data = self.data.at[a].set(self.data[a] + self.data[b])
        self._invalidate_row_caches()
        self.recompute_lambdas(gl)

    def mul_items(self, a: int, b: int, gl: GraphLaplacian) -> None:
        """Elementwise ``item[a] *= item[b]`` + λ recompute (core.rs:1045)."""
        if not (0 <= a < self.nitems and 0 <= b < self.nitems):
            raise ValueError(f"item indices out of bounds: a={a}, b={b}")
        self.data = self.data.at[a].set(self.data[a] * self.data[b])
        self._invalidate_row_caches()
        self.recompute_lambdas(gl)

    def scale_item(self, a: int, scalar: float, gl: GraphLaplacian) -> None:
        """``item[a] *= scalar`` + λ recompute (core.rs:1074-1104)."""
        if not 0 <= a < self.nitems:
            raise ValueError(f"item index out of bounds: a={a}")
        self.data = self.data.at[a].multiply(jnp.float32(scalar))
        self._invalidate_row_caches()
        self.recompute_lambdas(gl)

    # ------------------------------------------------------------------
    # λ computation / normalization
    # ------------------------------------------------------------------
    def graph_for_taumode(self, gl: GraphLaplacian):
        """Precomputed signals when present, else the Laplacian
        (taumode.rs:137-146). Beyond ``SPARSE_F_THRESHOLD`` features the
        graph is served in exact ELL form (cached — extraction does a full
        [F, F] pass + a blocking scalar D2H, so per-query re-extraction
        would dominate serving on remote-attached TPUs)."""
        if self.signals is not None:
            if self.signals.shape[0] > taumode_ops.SPARSE_F_THRESHOLD:
                if self._signals_ell is None:
                    from matternet_rs_tpu.ops.csr import ell_from_dense_laplacian

                    self._signals_ell = ell_from_dense_laplacian(self.signals)
                return self._signals_ell
            return self.signals
        if gl.is_ell_backed or gl.matrix.shape[0] > taumode_ops.SPARSE_F_THRESHOLD:
            return gl.ell()
        return gl.matrix

    def compute_taumode(self, gl: GraphLaplacian) -> None:
        """Compute raw λ for all items, then min-max normalize to [0,1]
        (taumode.rs:117-250 + core.rs:1427-1454).

        When a JL projection is active the stored data stays in the original
        F-dim space (search is semantic over raw vectors) but λ is computed in
        the reduced space against the r×r graph — matching the reference's
        per-item ``project()`` inside ``compute_synthetic_lambda``
        (taumode.rs:277-297); here it is one batched matmul.
        """
        graph = self.graph_for_taumode(gl)
        X = self.data
        if (
            self.projection is not None
            and X.shape[-1] == self.projection.original_dim
            and graph.shape[0] == self.projection.reduced_dim
        ):
            X = self.projection.project(X)
        raw = taumode_ops.taumode_lambdas_auto(
            X, graph, self.taumode.mode, self.taumode.param
        )
        self.update_lambdas(raw)

    def update_lambdas(self, raw: jax.Array) -> None:
        raw = jnp.asarray(raw, jnp.float32)
        if int(raw.shape[0]) != self.nitems:
            raise ValueError("lambda length mismatch")
        # One fused dispatch + one tiny D2H for all three stats (each
        # separate float() costs a full round-trip on remote-attached TPUs).
        lam_norm, stats = _normalize_lambdas_jit(raw)
        mn, mx, rng = (float(v) for v in np.asarray(stats))
        self.min_lambdas, self.max_lambdas, self.range_lambdas = mn, mx, rng
        self.lambdas = lam_norm
        # λ statistics after every compute (reference logs these,
        # builder.rs:1059-1070 / taumode.rs:226-246).
        log.debug(
            "lambdas updated: n=%d raw_min=%.6f raw_max=%.6f range=%.6f",
            self.nitems, mn, mx, rng,
        )

    def normalise_query_lambda(self, raw_lambda: float) -> float:
        """Same transform as the batch normalization, clamped to [0,1]
        (core.rs:1361-1373)."""
        return float(
            np.clip((raw_lambda - self.min_lambdas) / self.range_lambdas, 0.0, 1.0)
        )

    def _require_lambdas(self) -> None:
        """Searching an index whose λ were never computed must fail with a
        clear message, not a tracer TypeError from inside jit (reference
        panics: test_eigenmaps.rs ``test_search_without_taumode_panics``)."""
        if self.lambdas is None:
            raise RuntimeError(
                "taumode lambdas not computed: call compute_taumode(gl) "
                "(or build via ArrowSpaceBuilder) before searching"
            )

    def build_lambdas_sorted(self, on_device: bool | None = None) -> None:
        """Sorted-λ index. Defaults to the device-resident build on
        accelerators (avoids a full λ download; device→host is the
        bottleneck on remote-attached TPUs) and host numpy on CPU."""
        if self.lambdas is None:
            raise ValueError("compute lambdas first")
        if on_device is None:
            on_device = jax.default_backend() != "cpu"
        if on_device:
            self.lambdas_sorted = SortedLambdas.build_on_device(self.lambdas)
        else:
            self.lambdas_sorted = SortedLambdas.build_from(np.asarray(self.lambdas))

    # ------------------------------------------------------------------
    # Query preparation (core.rs:839-935)
    # ------------------------------------------------------------------
    def project_query(self, query: jax.Array) -> jax.Array:
        query = jnp.asarray(query, jnp.float32)
        if query.shape[-1] != self.nfeatures:
            raise ValueError(
                f"Query dimension {query.shape[-1]} doesn't match index "
                f"original dimension {self.nfeatures}"
            )
        return self.projection.project(query) if self.projection else query

    def prepare_query_item(self, query, gl: GraphLaplacian) -> float:
        """Compute the query's normalized λ.

        Energy mode maps the query to the nearest sub-centroid's λ; eigen
        mode runs the synthetic-λ formula then normalizes. Raises
        :class:`UndecidableQueryError` when raw λ ≈ 0 (reference panics).
        """
        # Validate on host BEFORE any device dispatch: each device sync is a
        # full round-trip on remote-attached TPUs (VERDICT weak #4).
        q_host = np.asarray(query, np.float32)
        if not np.all(np.isfinite(q_host)):
            raise ValueError("query item has non-finite values")
        query = jnp.asarray(q_host)

        # Energy mode (core.rs:872-909). Divergence from the reference: when
        # a JL projection is active and the query arrives in the original
        # dimension, we project it (the reference's Rust `zip` silently
        # truncates the longer vector — a latent bug, core.rs:886-891).
        if self.sub_centroids is not None and self.subcentroid_lambdas is not None:
            q = query
            if self.extra_reduced_dim or (
                self.projection is not None
                and query.shape[-1] == self.projection.original_dim
                and self.sub_centroids.shape[-1] == self.projection.reduced_dim
            ):
                q = self.projection.project(query)
            if q.shape[-1] != self.sub_centroids.shape[-1]:
                raise ValueError(
                    f"Query dimension {query.shape[-1]} doesn't match "
                    f"sub-centroid dimension {self.sub_centroids.shape[-1]}"
                )
            # One fused dispatch + one scalar D2H (was argmin sync + index).
            return float(
                _nearest_subcentroid_lambda_jit(
                    self.sub_centroids,
                    jnp.asarray(self.subcentroid_lambdas, jnp.float32),
                    q,
                )
            )

        # Eigen mode
        q = query
        if self.projection is not None and query.shape[-1] == self.projection.original_dim:
            q = self.projection.project(query)
        graph = self.graph_for_taumode(gl)
        if q.shape[-1] != graph.shape[0]:
            raise ValueError(
                f"Query dimension {query.shape[-1]} doesn't match index "
                f"dimension {graph.shape[0]} (original F={self.nfeatures})"
            )
        raw = float(
            taumode_ops.synthetic_lambda(
                q, graph, self.taumode.mode, self.taumode.param
            )
        )
        if abs(raw) <= 1e-12:
            raise UndecidableQueryError(
                "Check your eps parameter for the builder; the query item may "
                "be out of context for the dataset (undecidable): raw λ is 0.0"
            )
        if np.isfinite(self.range_lambdas) and self.range_lambdas > 0:
            return self.normalise_query_lambda(raw)
        return raw

    # ------------------------------------------------------------------
    # Search (core.rs:1156-1424)
    # ------------------------------------------------------------------
    def enable_quantized_scan(self) -> None:
        """Cache a bf16 copy of the corpus: halves the HBM read of the
        exact scan (the [N, F] traffic is the query-path bottleneck) at
        ~0.4% relative dot error. Search with ``quantized=True``."""
        self._data_bf16 = self.data.astype(jnp.bfloat16)

    def _scan_corpus(self, quantized: bool) -> jax.Array:
        if not quantized:
            return self.data
        if self._data_bf16 is None or (
            self._data_bf16.shape[0] != self.data.shape[0]
        ):
            with self._sketch_lock:
                if self._data_bf16 is None or (
                    self._data_bf16.shape[0] != self.data.shape[0]
                ):
                    self.enable_quantized_scan()
        return self._data_bf16

    def enable_int8_scan(self) -> None:
        """Cache an int8 corpus sketch for the two-stage exact-rescored
        scan (``search_batch(..., quantized="int8")``): a quarter of the
        f32 HBM read for the scan stage, with the final ranking restored
        by an on-device exact rescore of the candidate pool."""
        data_i8, i8_mult = _quantize_rows_device_jit(self.data)
        # Single atomic attribute write: a concurrent reader sees either the
        # whole old pair or the whole new pair, never a torn mix.
        self._i8_pair = (data_i8, i8_mult)

    def _ensure_int8(self):
        pair = self._i8_pair
        if pair is None or pair[0].shape[0] != self.data.shape[0]:
            # Double-checked under the lock: concurrent dispatch workers
            # must not each quantize (2× transient HBM).
            with self._sketch_lock:
                pair = self._i8_pair
                if pair is None or pair[0].shape[0] != self.data.shape[0]:
                    self.enable_int8_scan()
                    pair = self._i8_pair
        return pair

    def _int8_cand(self, k: int, candidates: Optional[int]) -> int:
        """Candidate-pool width for the int8 rescore: pow-2 padded so the
        serving batcher's varying k values share compiled programs."""
        c = candidates if candidates is not None else max(4 * k, 32)
        c = max(min(c, self.nitems), min(k, self.nitems))
        return min(1 << (c - 1).bit_length(), self.nitems)

    def search_lambda_aware(
        self, query, query_lambda: float, k: int, alpha: float = 0.7,
        approx: bool = False, recall_target: float = 0.95,
        quantized: bool = False,
    ) -> list[tuple[int, float]]:
        self._require_lambdas()
        if query_lambda == 0.0:
            raise ValueError(
                "Lambda of the item is 0.0, prepare the item before searching"
            )
        q = jnp.asarray(query, jnp.float32)
        idx, sc = search_ops.search_lambda_aware(
            self._scan_corpus(quantized), self.norms, self.lambdas, q,
            jnp.float32(query_lambda), k, alpha,
            approx=approx, recall_target=recall_target,
        )
        return [(int(i), float(s)) for i, s in zip(idx, sc)]

    def search_batch(
        self, queries, gl: GraphLaplacian, k: int, alpha: float = 0.7,
        approx: bool = False, return_raw: bool = False,
        quantized: bool | str = False, candidates: Optional[int] = None,
        recall_target: float = 0.95, allow_low_recall: bool = False,
    ):
        """Batched query path: fused λ preparation for all queries (one
        taumode dispatch, or one nearest-sub-centroid matmul in energy
        mode — same routing as :meth:`prepare_query_item`) + vmapped
        blended top-k. Returns ``(indices [B, k], scores [B, k])``, plus
        the raw query λ per row when ``return_raw`` (for undecidable-query
        detection in batched serving). ``alpha`` may be a scalar or a
        per-query ``[B]`` vector (heterogeneous serving traffic batches
        into one dispatch — alpha is traced, not compiled-in).

        This is the TPU-idiomatic serving path — one ``[B, F] × [F, N]``
        matmul amortizes the corpus read across the whole batch.

        ``quantized``: ``False`` = exact f32 (parity-grade); ``True`` =
        bf16 corpus scan (half the HBM read, ~0.4% dot error in the final
        ranking); ``"int8"`` = two-stage int8 scan + exact on-device
        rescore of the per-query top-``candidates`` (default
        ``max(4k, 32)``) — a quarter of the scan read with the final
        ranking exact on the candidate pool;
        ``"int8_auto"`` = the measured batch-size routing between the two
        int8 tiers: ``"int8_rescored"`` below 1024 padded queries,
        pool-cut ``"int8"`` with approx selection from 1024 (where its
        amortized score-plane crossing is both faster AND higher-recall
        — TUNING "speed ladder");
        ``"int8_rescored"`` / ``"bf16_rescored"`` /
        ``"bf16x3_rescored"`` = the maxima-first tiers (DESIGN.md
        "Rescored tiers, maxima-first"): a per-sub-tile-maxima Pallas
        scan with NO ``[B, N]`` score write (maxima reduced from the
        f32 blend in VMEM — no bf16 tie collapse at the selection
        boundary), then an exact HIGHEST rescore of every row of the
        selected 128-row slabs through an 8-deep ring of outstanding
        HBM→VMEM DMAs. ``"int8_rescored"`` scans the int8 sketch via a
        LOSSLESS bf16 upcast in one MXU pass at a quarter of the f32
        read — the fastest measured rung (1.50–1.60× the exact tier at
        1M×128) and it DOMINATES ``"bf16_rescored"`` on speed, recall
        (0.875 vs 0.55 on the clustered 1M fixture) and sketch memory;
        ``"bf16_rescored"`` scans a bf16 corpus copy in one MXU pass
        (kept for spread/normalized corpora and comparison);
        ``"bf16x3_rescored"`` scans the f32 corpus at bf16x3 precision
        (3 passes ≈ f32-grade selection, half the exact tier's 6) with
        no quantized copy needed — recall 1.0 measured on the clustered
        fixture while still beating the exact tier. All return
        parity-grade scores; the only approximation is scan-precision
        recall at the sub-tile selection boundary.

        ``"auto"`` routes on ``recall_target`` and the batch size over
        the measured ladder, picking the fastest tier whose MEASURED
        recall still meets the target (never silently below it):
        target > 0.9875 → bf16x3_rescored (measured recall 1.0, 1.13×
        exact, no sketch); target > 0.875 (incl. the 0.95 default) →
        int8 pool-cut (+approx, recall 0.9875); at or below 0.875 the
        int8 rungs with the 1024-query crossover. ``"bf16_rescored"``
        is GATED (``allow_low_recall=True`` required): it is dominated
        by int8_rescored on clustered corpora (recall 0.55 vs 0.875 at
        equal-or-better speed — VERDICT r4 #7) and is kept only as the
        spread/normalized-corpus comparison rung.

        Perf note for ``"int8"``: pair it with ``approx=True`` (the
        measured 2.4 ms/256q configuration at 1M×128 — candidate stage
        via ``approx_max_k`` at recall 0.95, absorbed by the exact
        rescore). With ``approx=False`` the candidate stage selects the
        top-``candidates`` pool EXACTLY, and exact selection at
        cand≈40 costs more than the entire fused exact-f32 scan (the
        1M scan is compute-bound, so int8's read savings cannot pay for
        it — measured same-window: int8+exact-cand ~3× the exact scan's
        ms). Exactness-first workloads should use ``quantized=False``
        directly; ``"int8"`` earns its keep as the throughput tier.
        """
        self._require_lambdas()
        if isinstance(quantized, str) and quantized not in QUANT_TIERS:
            raise ValueError(
                f"unknown quantized tier {quantized!r}: expected a bool or "
                f"one of {sorted(QUANT_TIERS)}"
            )
        if quantized in LOW_RECALL_TIERS and not allow_low_recall:
            raise ValueError(
                f"quantized tier {quantized!r} is dominated on clustered "
                "corpora (measured recall@10 0.55 at 1M vs int8_rescored's "
                "0.875 at equal-or-better speed and half the sketch "
                "memory — DESIGN.md 'Rescored tiers'). Use "
                "'int8_rescored', 'bf16x3_rescored' or 'auto'; pass "
                "allow_low_recall=True only for spread/normalized corpora "
                "where one-pass bf16 rounding is known to be benign."
            )
        Q = jnp.asarray(queries, jnp.float32)
        if Q.ndim == 1:
            Q = Q[None, :]
        b = Q.shape[0]
        # Pad the batch to the next power of two: micro-batched serving sees
        # many distinct batch sizes, and each unpadded size would compile its
        # own program.
        b_pad = 1 << max(b - 1, 1).bit_length() if b > 1 else 1
        if b_pad != b:
            Q = jnp.pad(Q, ((0, b_pad - b), (0, 0)))
        alphas = _alpha_vector(alpha, b_pad)

        if quantized == "auto":
            # Recall-target-aware routing over the MEASURED ladder
            # (VERDICT r4 #7 — the int8_auto crossover generalized).
            # Each rung is the FASTEST tier whose measured recall@10 on
            # the clustered 1M fixture still meets the requested target —
            # the target is honored, never silently under-served:
            # * target > 0.9875 → bf16x3_rescored: the only
            #   faster-than-exact rung measured at recall 1.0 (1.13×
            #   exact), and it needs no sketch copy.
            # * 0.875 < target ≤ 0.9875 → int8 pool-cut (+approx, its
            #   measured configuration): recall 0.9875 at every batch
            #   size, and from the 1024-query crossover it is also the
            #   outright fastest rung (~720 GB/s score-plane crossing).
            # * target ≤ 0.875 → int8_rescored below the crossover
            #   (fastest B≤512 rung, recall 0.875); the pool-cut above
            #   it (faster AND higher recall at B≥1024).
            # The int8 sketch builds lazily on first use (N·(F+4)
            # bytes); callers that must avoid the copy pick bf16x3
            # explicitly.
            if recall_target > 0.9875:
                quantized = "bf16x3_rescored"
            elif recall_target > 0.875 or b_pad >= 1024:
                quantized, approx = "int8", True
            else:
                quantized = "int8_rescored"
        if quantized == "int8_auto":
            # Measured batch-size crossover (TUNING "speed ladder",
            # scripts/probe_int8_fused.py): below ~1024 queries the
            # maxima-first int8 tier is fastest; from 1024 the pool-cut's
            # fused [B, N] score-plane + approx_max_k crossing amortizes
            # (~720 GB/s) and overtakes it at HIGHER recall (0.9875 vs
            # 0.875) — so large batches also switch selection to approx
            # (the pool-cut's measured configuration; its exact-candidate
            # form is the documented dominated config).
            if b_pad >= 1024:
                quantized, approx = "int8", True
            else:
                quantized = "int8_rescored"
        if quantized in ("int8_rescored", "bf16_rescored",
                         "bf16x3_rescored") and b_pad < 8:
            # The fused maxima-first producer requires b % 8 == 0; the
            # extra padded rows ride the same MXU sublane tile, so the
            # floor is ~free while a 1-4 query batch would otherwise
            # silently fall back to the XLA two-stage path.
            Q = jnp.pad(Q, ((0, 8 - b_pad), (0, 0)))
            alphas = _alpha_vector(alphas, 8)
            b_pad = 8

        # Both λ-prep modes feed ONE named-tier dispatch below (a prior
        # revision duplicated the four tier calls per mode, an easy place
        # for the branches to silently fork): energy mode looks up the
        # already-normalized sub-centroid λ (mn=0, rng=1 → the fold is an
        # identity), eigen mode computes raw taumode λ with the
        # normalization folded into the search jits (no eager
        # sub/div/clip round-trips).
        if self.sub_centroids is not None and self.subcentroid_lambdas is not None:
            Qe = Q
            if self.extra_reduced_dim or (
                self.projection is not None
                and Q.shape[-1] == self.projection.original_dim
                and self.sub_centroids.shape[-1] == self.projection.reduced_dim
            ):
                Qe = self.projection.project(Q)
            sc_lams = jnp.asarray(self.subcentroid_lambdas, jnp.float32)
            q_lams = jax.vmap(
                lambda q: _nearest_subcentroid_lambda_jit(
                    self.sub_centroids, sc_lams, q
                )
            )(Qe)
            raw = q_lams
            mn, rng = jnp.float32(0.0), jnp.float32(1.0)
        else:
            graph = self.graph_for_taumode(gl)
            Qw = Q
            if (
                self.projection is not None
                and Q.shape[-1] == self.projection.original_dim
                and graph.shape[0] == self.projection.reduced_dim
            ):
                Qw = self.projection.project(Q)
            raw = taumode_ops.taumode_lambdas_auto(
                Qw, graph, self.taumode.mode, self.taumode.param
            )
            q_lams = raw
            mn = jnp.float32(self.min_lambdas)
            rng = jnp.float32(self.range_lambdas)

        if quantized == "int8":
            X8, i8m = self._ensure_int8()
            idx, sc = _batched_search_int8_jit(
                X8, i8m, self.data, self.norms, self.lambdas, Q, q_lams,
                mn, rng,
                min(k, self.nitems), self._int8_cand(k, candidates),
                alphas, approx,
            )
        elif quantized == "int8_rescored":
            X8, i8m = self._ensure_int8()
            idx, sc = _batched_search_i8r_jit(
                X8, i8m, self.data, self.norms, self.lambdas, Q, q_lams,
                mn, rng,
                min(k, self.nitems), self._int8_cand(k, candidates),
                alphas, approx,
            )
        elif quantized == "bf16_rescored":
            idx, sc = _batched_search_bf16r_jit(
                self._scan_corpus(True), self.data, self.norms,
                self.lambdas, Q, q_lams,
                mn, rng,
                min(k, self.nitems), self._int8_cand(k, candidates),
                alphas, approx,
            )
        elif quantized == "bf16x3_rescored":
            idx, sc = _batched_search_b3r_jit(
                self.data, self.norms, self.lambdas, Q, q_lams,
                mn, rng,
                min(k, self.nitems), self._int8_cand(k, candidates),
                alphas, approx,
            )
        elif self.sub_centroids is not None and self.subcentroid_lambdas is not None:
            idx, sc = _batched_search_jit(
                self._scan_corpus(quantized), self.norms, self.lambdas,
                Q, q_lams, k, alphas, approx,
            )
        else:
            idx, sc = _batched_search_normalized_jit(
                self._scan_corpus(quantized), self.norms, self.lambdas,
                Q, raw, mn, rng, k, alphas, approx,
            )
        # ONE coalesced device→host fetch (jax.device_get async-copies all
        # leaves before waiting): sequential np.asarray calls pay one
        # remote-attachment round-trip EACH, and on a congested tunnel the
        # RTT — not the bytes — dominates the serving dispatch.
        if return_raw:
            idx, sc, raw = jax.device_get((idx, sc, raw))
            return idx[:b], sc[:b], raw[:b]
        idx, sc = jax.device_get((idx, sc))
        return idx[:b], sc[:b]

    def add_items(self, new_rows, gl: GraphLaplacian) -> None:
        """Incrementally insert items into a built index.

        New rows get λ from the existing graph with the existing
        normalization stats (clamped to [0,1], exactly how queries are
        normalized — core.rs:1361-1373); the graph itself is NOT rebuilt
        (same contract as the reference's ``SortedLambdas::zadd`` single
        inserts, sorted_index.rs:22-29). Rebuild for large drift.
        """
        new_rows = jnp.asarray(new_rows, jnp.float32)
        if new_rows.ndim == 1:
            new_rows = new_rows[None, :]
        if new_rows.shape[-1] != self.nfeatures:
            raise ValueError(
                f"new items have dimension {new_rows.shape[-1]}, index has "
                f"{self.nfeatures}"
            )
        if self.sub_centroids is not None and self.subcentroid_lambdas is not None:
            # Energy mode: new items get the nearest sub-centroid's
            # (already-normalized) λ — the same routing as queries — and
            # the energy-search caches must grow with the data.
            Xe = new_rows
            if (
                self.projection is not None
                and Xe.shape[-1] == self.projection.original_dim
                and self.sub_centroids.shape[-1] == self.projection.reduced_dim
            ):
                Xe = self.projection.project(Xe)
            d = jnp.sum(
                (Xe[:, None, :] - self.sub_centroids[None, :, :]) ** 2, axis=-1
            )
            nearest = np.asarray(jnp.argmin(d, axis=1))
            lam_new = jnp.asarray(
                np.asarray(self.subcentroid_lambdas, np.float32)[nearest]
            )
            self.centroid_map = np.concatenate([self.centroid_map, nearest])
            if self.item_norms is not None:
                self.item_norms = jnp.concatenate([
                    self.item_norms,
                    jnp.sqrt(jnp.sum(new_rows * new_rows, axis=-1)),
                ])
        else:
            graph = self.graph_for_taumode(gl)
            X = new_rows
            if (
                self.projection is not None
                and X.shape[-1] == self.projection.original_dim
                and graph.shape[0] == self.projection.reduced_dim
            ):
                X = self.projection.project(X)
            raw = taumode_ops.taumode_lambdas_auto(
                X, graph, self.taumode.mode, self.taumode.param
            )
            lam_new = jnp.clip(
                (raw - self.min_lambdas) / self.range_lambdas, 0.0, 1.0
            )
        self.data = jnp.concatenate([self.data, new_rows], axis=0)
        self.lambdas = jnp.concatenate([self.lambdas, lam_new])
        self.nitems = int(self.data.shape[0])
        self._norms = None
        if self.ivf is not None:
            # The bucket layout doesn't know the new rows — rebuild it so
            # pruned search can return them (silently stale otherwise).
            self.build_ivf_index(bucket_size=self.ivf.bucket_size)
        if self.lambdas_sorted is not None:
            self.build_lambdas_sorted()

    def search_lambda_aware_hybrid(
        self, query, query_lambda: float, k: int, alpha: float = 0.7
    ) -> list[tuple[int, float]]:
        self._require_lambdas()
        if k == 0:
            return []
        q = jnp.asarray(query, jnp.float32)
        idx, sc = search_ops.search_lambda_aware_hybrid(
            self.data, self.norms, self.lambdas, q,
            jnp.float32(query_lambda), k, alpha,
        )
        return [(int(i), float(s)) for i, s in zip(idx, sc) if np.isfinite(s)]

    def search_linear_sorted(self, query, gl: GraphLaplacian, k: int):
        """Sorted-index band search (core.rs:1326-1335)."""
        self._require_lambdas()
        q_lambda = self.prepare_query_item(query, gl)
        return self.lambdas_sorted.range_bylambda(q_lambda, k, gl.graph_params.p)

    def search_k_nearest_by_lambda(
        self, query, gl: GraphLaplacian, k: int,
        base_delta: float | None = None, growth: float = 1.7,
        max_multiplier: float = 10.0,
    ) -> list[tuple[int, float]]:
        """Expanding-window k-nearest by |Δλ| over the sorted index
        (sorted_index.rs:85-140 exposed through the query path)."""
        if self.lambdas_sorted is None:
            raise ValueError("build_lambdas_sorted() first")
        q_lambda = self.prepare_query_item(query, gl)
        return self.lambdas_sorted.k_nearest_by_lambda(
            q_lambda, k, gl.graph_params.p, base_delta, growth, max_multiplier
        )

    def search_lambda_banded(
        self, query, query_lambda: float, k: int, alpha: float = 0.7,
        window: int = 4096,
    ) -> list[tuple[int, float]]:
        """Sublinear banded search: blended re-scoring over a fixed window
        of the sorted-λ order (approximate; see ops.search docstring).
        Requires the device sorted index (``build_lambdas_sorted``)."""
        from matternet_rs_tpu.index.sorted import DeviceSortedLambdas

        if self.lambdas_sorted is None:
            raise ValueError("build_lambdas_sorted() first")
        sl = self.lambdas_sorted
        if isinstance(sl, DeviceSortedLambdas):
            s_lam, s_idx = sl.sorted_lambdas_dev, sl.sorted_indices_dev
        else:
            s_lam = jnp.asarray(sl.sorted_lambdas, jnp.float32)
            s_idx = jnp.asarray(sl.sorted_indices, jnp.int32)
        idx, sc = search_ops.search_lambda_banded(
            self.data, self.norms, s_lam, s_idx,
            jnp.asarray(query, jnp.float32), jnp.float32(query_lambda),
            k, alpha, window,
        )
        return [(int(i), float(s)) for i, s in zip(idx, sc)]

    # ------------------------------------------------------------------
    # IVF-pruned search (beyond-reference: reuses the build's clustering
    # to prune the query-time scan; index/ivf.py)
    # ------------------------------------------------------------------
    def build_ivf_index(self, bucket_size: int = 1024, seed: int = 0):
        """Bucketed IVF layout over the item store. Seeds centroids from
        the build-stage cluster assignments when present (stage 1 already
        paid for them), else a jitted k-means++ run."""
        from matternet_rs_tpu.index.ivf import build_ivf

        self.ivf = build_ivf(
            self.data,
            assignments=self.cluster_assignments,
            n_clusters=self.n_clusters or None,
            bucket_size=bucket_size,
            seed=seed,
            lambdas=None if self.lambdas is None else np.asarray(self.lambdas),
        )
        return self.ivf

    def search_lambda_aware_ivf(
        self, query, query_lambda: float, k: int, alpha: float = 0.7,
        nprobe: int = 8,
    ) -> list[tuple[int, float]]:
        """Pruned blended top-k over the ``nprobe`` most query-similar
        buckets (exact scoring on the pruned candidate set; approximate
        overall — converges to :meth:`search_lambda_aware` as ``nprobe``
        approaches the bucket count)."""
        from matternet_rs_tpu.index.ivf import ivf_search

        if self.ivf is None:
            raise ValueError("build_ivf_index() first")
        if query_lambda == 0.0:
            raise ValueError(
                "Lambda of the item is 0.0, prepare the item before searching"
            )
        idx, sc = ivf_search(
            self.ivf.centroids, self.ivf.centroid_norms,
            self.ivf.bucket_items, self.ivf.bucket_centroid,
            self.ivf.bucket_lambda_lo, self.ivf.bucket_lambda_hi,
            self.data, self.norms, self.lambdas,
            jnp.asarray(query, jnp.float32), jnp.float32(query_lambda),
            k, alpha, nprobe,
        )
        return [(int(i), float(s)) for i, s in zip(idx, sc) if np.isfinite(s)]

    def search_batch_ivf(
        self, queries, gl: GraphLaplacian, k: int, alpha: float = 0.7,
        nprobe: int = 8,
    ):
        """Batched pruned search with fused query-λ preparation (same λ
        routing as :meth:`search_batch`). Returns ``(indices [B, k],
        scores [B, k])`` — padded rows carry -inf scores."""
        from matternet_rs_tpu.index.ivf import ivf_search_batch

        if self.ivf is None:
            raise ValueError("build_ivf_index() first")
        Q = jnp.asarray(queries, jnp.float32)
        if Q.ndim == 1:
            Q = Q[None, :]
        b = Q.shape[0]
        graph = self.graph_for_taumode(gl)
        Qw = Q
        if (
            self.projection is not None
            and Q.shape[-1] == self.projection.original_dim
            and graph.shape[0] == self.projection.reduced_dim
        ):
            Qw = self.projection.project(Q)
        raw = taumode_ops.taumode_lambdas_auto(
            Qw, graph, self.taumode.mode, self.taumode.param
        )
        q_lams = jnp.clip(
            (raw - self.min_lambdas) / self.range_lambdas, 0.0, 1.0
        )
        idx, sc = ivf_search_batch(
            self.ivf.centroids, self.ivf.centroid_norms,
            self.ivf.bucket_items, self.ivf.bucket_centroid,
            self.ivf.bucket_lambda_lo, self.ivf.bucket_lambda_hi,
            self.data, self.norms, self.lambdas, Q, q_lams, k, alpha, nprobe,
        )
        return np.asarray(idx)[:b], np.asarray(sc)[:b]

    def range_search(self, query, query_lambda: float, eps: float):
        """All items with ``λq - λi ≤ eps`` (signed, core.rs:1389-1424)."""
        self._require_lambdas()
        dist, mask = search_ops.range_search_mask(
            self.lambdas, jnp.float32(query_lambda), jnp.float32(eps)
        )
        dist = np.asarray(dist)
        return [(int(i), float(dist[i])) for i in np.nonzero(np.asarray(mask))[0]]
