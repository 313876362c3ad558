"""EnergyMaps: cosine-free energy index pipeline.

Rebuilds ``/root/reference/src_legacy/energymaps.rs``:

1. **Optical compression** — project centroids to 2D via JL, spatial grid
   binning (√budget × √budget), trim the high-norm quantile per bin,
   mean-pool per bin, top up with low-norm rows (energymaps.rs:314-447),
2. **Bootstrap Laplacian L₀** — cosine-kernel F×F graph over the compressed
   centroids' feature profiles (energymaps.rs:449-483),
3. **Heat diffusion + split** — ``x' = x - η·L·x`` for ``steps`` iterations
   (one [C, F] × [F, F] matmul per step on the MXU), then split the
   top-dispersion-quantile centroids ±τ along the local gradient
   (energymaps.rs:485-621),
4. **Energy Laplacian** over sub-centroids + per-node energy/dispersion
   (energymaps.rs:923-1045, 1394-1444) — the O(C·F²) edge scans become the
   same closed-form matmuls as the taumode engine (upper-triangle variant),
5. **λ on sub-centroids only**, items mapped to the nearest sub-centroid
   (L2, with cosine tie-break among equal-λ candidates), norms cached
   (energymaps.rs:1116-1391),
6. **search_energy** — λ-distance scan with cosine tie-break at |Δλ|<1e-9
   (energymaps.rs:628-674).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from matternet_rs_tpu.core import ArrowSpace
from matternet_rs_tpu.graph import GraphLaplacian, GraphParams
from matternet_rs_tpu.ops import laplacian as lap_ops
from matternet_rs_tpu.ops import taumode as tm_ops
from matternet_rs_tpu.ops._mm import mm
from matternet_rs_tpu.reduction import ImplicitProjection

log = logging.getLogger(__name__)


@dataclasses.dataclass
class EnergyParams:
    """Defaults: energymaps.rs:52-70."""

    optical_tokens: Optional[int] = 50
    trim_quantile: float = 0.1
    eta: float = 0.1
    steps: int = 4
    split_quantile: float = 0.9
    neighbor_k: int = 20
    split_tau: float = 0.15
    w_lambda: float = 1.0
    w_disp: float = 0.5
    w_dirichlet: float = 0.25
    candidate_m: int = 32

    # ------------------------------------------------------------------
    @staticmethod
    def compute_adaptive_tokens(nitems: int) -> int:
        """2√N clamped to [100, 2000] (energymaps.rs:169-179)."""
        return int(min(max(round(2.0 * np.sqrt(nitems)), 100), 2000))

    @classmethod
    def from_builder(cls, builder) -> "EnergyParams":
        """Adaptive params (energymaps.rs:97-168)."""
        base_k = builder.lambda_k
        neighbor_k = min(max(base_k * 2, 15), 50)
        candidate_m = min(max(neighbor_k * 3, 30), 128)
        nitems = getattr(builder, "nitems", 0) or 0
        if nitems:
            tokens = cls.compute_adaptive_tokens(nitems)
        elif builder.use_dims_reduction:
            tokens = int(min(max(np.ceil(80.0 / builder.rp_eps), 40), 200))
        else:
            tokens = 60
        return cls(optical_tokens=tokens, neighbor_k=neighbor_k,
                   candidate_m=candidate_m)

    @classmethod
    def high_resolution(cls, builder) -> "EnergyParams":
        p = cls.from_builder(builder)
        p.optical_tokens = None
        p.neighbor_k = max(builder.lambda_k * 3, 25)
        p.candidate_m = max(builder.lambda_k * 5, 50)
        p.split_quantile = 0.85
        p.steps = 5
        return p

    @classmethod
    def large_dataset(cls, builder) -> "EnergyParams":
        p = cls.from_builder(builder)
        p.optical_tokens = 100
        p.neighbor_k = min(max(builder.lambda_k, 15), 30)
        p.candidate_m = min(max(builder.lambda_k * 2, 30), 80)
        p.steps = 3
        p.split_quantile = 0.92
        return p


# ---------------------------------------------------------------------------
# Step 2': optical compression (energymaps.rs:314-447)
# ---------------------------------------------------------------------------


def optical_compress_centroids(
    centroids: np.ndarray, token_budget: int, trim_quantile: float,
    seed: int = 0,
) -> np.ndarray:
    x, f = centroids.shape
    if token_budget == 0 or token_budget >= x:
        return centroids.copy()

    proj = ImplicitProjection(f, 2, seed)
    xy = np.asarray(proj.project(centroids), np.float64)     # [x, 2]

    g = int(np.ceil(np.sqrt(token_budget)))
    minx, maxx = xy[:, 0].min(), xy[:, 0].max()
    miny, maxy = xy[:, 1].min(), xy[:, 1].max()
    px = (xy[:, 0] - minx) / (maxx - minx + 1e-9)
    py = (xy[:, 1] - miny) / (maxy - miny + 1e-9)
    bx = np.clip(np.floor(px * g), 0, g - 1).astype(int)
    by = np.clip(np.floor(py * g), 0, g - 1).astype(int)
    bin_ids = by * g + bx

    norms = np.linalg.norm(centroids, axis=1)

    # Vectorized per-bin trim + mean-pool (energymaps.rs:783-817): sort rows
    # by (bin, norm); the within-bin rank then decides who survives the
    # norm-quantile trim, and one np.add.at accumulates the bin means — no
    # Python loop over the g² bins (VERDICT weak #5).
    order = np.lexsort((norms, bin_ids))               # stable: bin, then norm
    sb = bin_ids[order]
    uniq, starts, counts = np.unique(sb, return_index=True, return_counts=True)
    rank = np.arange(x) - np.repeat(starts, counts)    # rank within own bin
    cnt_of = np.repeat(counts, counts)
    keep_of = np.where(
        cnt_of > 4,
        # .round() half-away-from-zero + clamp(1, len) — energymaps.rs:807-809
        np.maximum(np.floor(cnt_of * (1.0 - trim_quantile) + 0.5), 1).astype(int),
        cnt_of,
    )
    kept = rank < keep_of
    kept_rows = order[kept]
    kept_bins = sb[kept]

    sums = np.zeros((g * g, f), np.float64)
    np.add.at(sums, kept_bins, centroids[kept_rows].astype(np.float64))
    kept_counts = np.bincount(kept_bins, minlength=g * g)
    # Bin-id-order truncation when the g² grid overshoots the budget is
    # REFERENCE-FAITHFUL (energymaps.rs:394-401 breaks out of the bin loop
    # at the budget in the same order): the dropped high-id bins are the
    # top rows of the projected grid. A count- or norm-ranked selection
    # would be better-balanced but would diverge from the oracle/parity.
    nonempty = np.nonzero(kept_counts)[0][:token_budget]   # bin-id order
    pooled = sums[nonempty] / kept_counts[nonempty, None]

    if len(nonempty) < token_budget:
        # Top up with lowest-norm centroids (energymaps.rs:405-436).
        top_up = np.argsort(norms, kind="stable")[: token_budget - len(nonempty)]
        pooled = np.concatenate([pooled, centroids[top_up].astype(np.float64)])

    return pooled.astype(np.float32)


# ---------------------------------------------------------------------------
# Step 3': bootstrap Laplacian (energymaps.rs:449-483)
# ---------------------------------------------------------------------------


def bootstrap_centroid_laplacian(centroids, builder) -> GraphLaplacian:
    """F×F cosine-kernel Laplacian over the centroids' feature profiles."""
    centroids = jnp.asarray(centroids, jnp.float32)
    x = int(centroids.shape[0])
    params = GraphParams(
        eps=builder.lambda_eps,
        k=min(builder.lambda_k, x - 1),
        topk=min(builder.lambda_topk, 4, x - 1),
        p=2.0,
        sigma=None,
        normalise=builder.normalise,
        sparsity_check=builder.sparsity_check,
    )
    return lap_ops.build_laplacian_matrix(
        centroids.T, params, n_items=x, energy=True
    )


# ---------------------------------------------------------------------------
# Step 4': diffusion + dispersion split (energymaps.rs:485-621)
# ---------------------------------------------------------------------------


@jax.jit
def _diffusion_kernel(X, L, eta, steps_onehot):
    """``x' = x - η·L·x`` per row, iterated. steps passed as scanned units."""
    def body(work, _):
        return work - eta * mm(work, L.T), None
    out, _ = jax.lax.scan(body, X, steps_onehot)
    return out


@jax.jit
def _energy_dispersion_kernel(X, L):
    """Batched Rayleigh λ + upper-triangle dispersion G for rows of X against
    the F×F graph — closed form of energymaps.rs:923-1045 (which scans i<j,
    i.e. each undirected edge once: G_upper = 2·N₄/T² in the both-directions
    notation of ops.taumode)."""
    A = jnp.maximum(-L, 0.0)
    A = A - jnp.diag(jnp.diag(A))
    A2 = A * A
    deg = jnp.sum(A, axis=1)
    deg2 = jnp.sum(A2, axis=1)

    XL = mm(X, L.T)
    num_e = jnp.sum(X * XL, axis=-1)
    den = jnp.sum(X * X, axis=-1)
    lam = jnp.maximum(jnp.where(den > 1e-12, num_e / jnp.maximum(den, 1e-12), 0.0), 0.0)

    X2 = X * X
    X3 = X2 * X
    X4 = X2 * X2
    B1 = mm(X, A)
    B2 = mm(X2, A)
    C1 = mm(X, A2)
    C2 = mm(X2, A2)
    C3 = mm(X3, A2)
    C4 = mm(X4, A2)
    total_both = jnp.sum(X2 * deg - 2.0 * X * B1 + B2, axis=-1)
    num4_both = jnp.sum(
        X4 * deg2 - 4.0 * X3 * C1 + 6.0 * X2 * C2 - 4.0 * X * C3 + C4, axis=-1
    )
    # upper-triangle: total halves, shares double → G = 2·N₄/T².
    g = jnp.where(
        total_both > 2e-12,
        2.0 * num4_both / jnp.maximum(total_both * total_both, 1e-24),
        0.0,
    )
    return lam, jnp.clip(g, 0.0, 1.0)


def node_energy_and_dispersion(X, gl: GraphLaplacian, k: int):
    """(λ [N], G [N]) — energymaps.rs:923-1045 (k unused by the math; kept
    for signature parity)."""
    lam, g = _energy_dispersion_kernel(
        jnp.asarray(X, jnp.float32), jnp.asarray(gl.matrix, jnp.float32)
    )
    return np.asarray(lam, np.float64), np.asarray(g, np.float64)


def diffuse_and_split_subcentroids(
    centroids: np.ndarray, l0: GraphLaplacian, p: EnergyParams
) -> np.ndarray:
    x, f = centroids.shape
    if l0.matrix.shape[0] != f:
        raise ValueError(
            f"Laplacian rows {l0.matrix.shape[0]} must match feature count {f}"
        )
    work = _diffusion_kernel(
        jnp.asarray(centroids, jnp.float32),
        jnp.asarray(l0.matrix, jnp.float32),
        jnp.float32(p.eta),
        jnp.zeros(p.steps),
    )
    work_np = np.asarray(work, np.float64)

    lam, gini = node_energy_and_dispersion(work, l0, p.neighbor_k)

    g_sorted = np.sort(gini)
    # Rust f64::round is half-away-from-zero (Python round is banker's).
    q_idx = int(np.floor((len(g_sorted) - 1) * p.split_quantile + 0.5))
    thresh = g_sorted[q_idx]

    rows = [work_np]
    to_split = np.nonzero(gini >= thresh)[0]
    k = min(p.neighbor_k, x - 1)
    if to_split.size and x > 1 and k >= 1:
        # One batched kNN matmul + fully vectorized ±τ·gradient split —
        # no per-split-row Python loop (VERDICT weak #5). k < 1 degrades
        # to no split (the scalar loop's zero-mean fallback produced
        # degenerate ±τ·ĉ rows; no-split is the saner behaviour and
        # unreachable with the EnergyParams presets anyway).
        from matternet_rs_tpu.ops.knn import knn

        _, idx = knn(work[to_split], work, k=k + 1, metric="sqeuclidean")
        idx = np.asarray(idx)                                  # [S, k+1]
        # Drop self per row, keep neighbour order, take k.
        not_self = idx != to_split[:, None]
        sel = np.argsort(~not_self, axis=1, kind="stable")[:, :k]
        nbrs = np.take_along_axis(idx, sel, axis=1)            # [S, k]
        mean = work_np[nbrs].mean(axis=1)                      # [S, F]

        c = work_np[to_split]
        d = c - mean
        n = np.maximum(np.sqrt((d * d).sum(axis=1)), 1e-9)
        direction = d / n[:, None]
        std_loc = np.sqrt(np.mean((d - d.mean(axis=1, keepdims=True)) ** 2, axis=1))
        tau = p.split_tau * np.maximum(std_loc, 1e-6)          # [S]
        plus = c + tau[:, None] * direction
        minus = c - tau[:, None] * direction
        # Interleave (+, −) per split row — same order as the scalar loop.
        rows.append(np.stack([plus, minus], axis=1).reshape(-1, f))

    return np.concatenate(rows, axis=0).astype(np.float32)


# ---------------------------------------------------------------------------
# Step 6': energy Laplacian (energymaps.rs:1394-1444)
# ---------------------------------------------------------------------------


def build_energy_laplacian(sub_centroids, builder, p: EnergyParams):
    l_boot = bootstrap_centroid_laplacian(sub_centroids, builder)
    lam, gini = node_energy_and_dispersion(
        sub_centroids, l_boot, max(p.neighbor_k, builder.lambda_k)
    )
    return l_boot, lam, gini


# ---------------------------------------------------------------------------
# Full energy build (energymaps.rs:1116-1391)
# ---------------------------------------------------------------------------


def build_energy(builder, rows, energy_params: Optional[EnergyParams] = None):
    """Energy pipeline build → (ArrowSpace, GraphLaplacian)."""
    rows = np.asarray(rows, np.float32)
    if not builder.use_dims_reduction:
        raise ValueError("When using build_energy, dim reduction is needed")
    if builder.prebuilt_spectral:
        raise ValueError("Spectral mode not compatible with build_energy")

    builder.nitems = rows.shape[0]
    p = energy_params or EnergyParams.from_builder(builder)

    # Stage 1: clustering (+ optional JL of centroids).
    aspace, centroids = builder.start_clustering(rows)
    centroids = np.asarray(centroids, np.float32)

    # Step 2: optical compression.
    if p.optical_tokens is not None:
        centroids = optical_compress_centroids(
            centroids, p.optical_tokens, p.trim_quantile,
            seed=builder.clustering_seed or 0,
        )

    # Step 3: bootstrap Laplacian L₀ (F×F over compressed centroids).
    l0 = bootstrap_centroid_laplacian(centroids, builder)

    # Step 4: diffuse + split → sub-centroids.
    sub_centroids = diffuse_and_split_subcentroids(centroids, l0, p)

    # Step 6: energy Laplacian over sub-centroids.
    gl_energy, _, _ = build_energy_laplacian(sub_centroids, builder, p)

    # Step 7: λ on sub-centroids only.
    sc = jnp.asarray(sub_centroids)
    raw = tm_ops.taumode_lambdas(
        sc, gl_energy.matrix, aspace.taumode.mode, aspace.taumode.param
    )
    raw_np = np.asarray(raw, np.float64)
    mn = float(raw_np.min())
    mx = max(float(raw_np.max()), 0.0)
    rng = max(mx - mn, 1e-9)
    sc_lambdas = (raw_np - mn) / rng

    aspace.sub_centroids = sc
    aspace.subcentroid_lambdas = sc_lambdas
    # Record the normalization stats (were left at the -1 construction
    # sentinels): adaptive_energy_weights derives w_λ from range_lambdas,
    # and add_items normalizes inserted rows with these.
    aspace.min_lambdas = mn
    aspace.max_lambdas = mx
    aspace.range_lambdas = rng

    # Step 8: item → sub-centroid assignment (nearest by L2 in the working
    # space — the energy-mode prepare_query path — then cosine tie-break among
    # equal-λ candidates; energymaps.rs:1246-1342).
    X = aspace.data
    if aspace.projection is not None:
        X = aspace.projection.project(X)
    Xp = jnp.asarray(X)
    scn = sc / jnp.maximum(jnp.linalg.norm(sc, axis=1, keepdims=True), 1e-12)
    sc_lam_dev = jnp.asarray(sc_lambdas, jnp.float32)

    @jax.jit
    def _assign_chunk(Xc):
        """Nearest sub-centroid by L2 → its λ → λ-distance re-assignment
        with cosine tie-break — all [B, S] intermediates stay on device."""
        d2 = (
            jnp.sum(Xc * Xc, axis=1, keepdims=True)
            + jnp.sum(sc * sc, axis=1)[None, :]
            - 2.0 * mm(Xc, sc.T)
        )
        item_lambda = sc_lam_dev[jnp.argmin(d2, axis=1)]
        lam_dist = jnp.abs(item_lambda[:, None] - sc_lam_dev[None, :])
        best_dist = jnp.min(lam_dist, axis=1)
        ties = jnp.abs(lam_dist - best_dist[:, None]) < 1e-11
        n_ties = jnp.sum(ties, axis=1)
        Xn = Xc / jnp.maximum(jnp.linalg.norm(Xc, axis=1, keepdims=True), 1e-12)
        cos = mm(Xn, scn.T)
        masked_cos = jnp.where(ties, cos, -jnp.inf)
        return jnp.where(
            n_ties > 1, jnp.argmax(masked_cos, axis=1), jnp.argmin(lam_dist, axis=1)
        )

    # Chunk items so the [B, S] buffers stay bounded at any N.
    B = 65_536
    n = Xp.shape[0]
    pad = (-n) % B if n > B else 0
    Xpad = jnp.pad(Xp, ((0, pad), (0, 0))) if pad else Xp
    parts = [
        np.asarray(_assign_chunk(jax.lax.dynamic_slice_in_dim(Xpad, s, min(B, Xpad.shape[0]), 0)))
        for s in range(0, Xpad.shape[0], B)
    ] if n > B else [np.asarray(_assign_chunk(Xp))]
    best_idx = np.concatenate(parts)[:n]

    aspace.centroid_map = best_idx.astype(np.int64)
    aspace.lambdas = jnp.asarray(sc_lambdas[best_idx], jnp.float32)
    aspace.item_norms = jnp.sqrt(jnp.sum(aspace.data * aspace.data, axis=1))
    aspace.build_lambdas_sorted()

    return aspace, gl_energy


# ---------------------------------------------------------------------------
# search_energy (energymaps.rs:628-674)
# ---------------------------------------------------------------------------


@jax.jit
def _energy_score_kernel(X, norms, lambdas, query, q_lambda):
    lam_dist = jnp.abs(q_lambda - lambdas)
    qn = jnp.sqrt(jnp.sum(query * query))
    dots = mm(X, query)
    cosine = dots / (qn * norms + 1e-9)
    tie = jnp.where(lam_dist < 1e-9, (1.0 - cosine) * 1e-9, 0.0)
    return lam_dist + tie


def search_energy(
    aspace: ArrowSpace, query, gl_energy: GraphLaplacian, k: int,
    approx: bool = False,
):
    """Pure λ-distance scan with cosine tie-break; ascending distance.
    ``approx=True`` selects with ``lax.approx_max_k`` (large-N throughput)."""
    q_lambda = aspace.prepare_query_item(query, gl_energy)
    scores = _energy_score_kernel(
        aspace.data, aspace.item_norms, aspace.lambdas,
        jnp.asarray(query, jnp.float32), jnp.float32(q_lambda),
    )
    kk = min(k, aspace.nitems)
    if approx:
        neg, idx = jax.lax.approx_max_k(-scores, kk, recall_target=0.95)
    else:
        neg, idx = jax.lax.top_k(-scores, kk)
    return [(int(i), float(-s)) for i, s in zip(idx, neg)]


@functools.partial(jax.jit, static_argnames=("k", "approx"))
def _batched_energy_search_jit(X, norms, lambdas, sub_c, sc_lams, Q, Qe, k, approx):
    # Query λ for the whole batch in ONE dispatch: nearest sub-centroid by
    # L2 over the (possibly JL-projected) query ``Qe`` ([B, S] matmul) →
    # its λ (core.rs:872-909, batched). Scoring uses the ORIGINAL-space
    # query ``Q`` against the original-space corpus, exactly like the
    # serial path (only λ-prep lives in the reduced space).
    d = (
        jnp.sum(Qe * Qe, axis=-1, keepdims=True)
        + jnp.sum(sub_c * sub_c, axis=-1)[None, :]
        - 2.0 * mm(Qe, sub_c.T)
    )
    q_lams = sc_lams[jnp.argmin(d, axis=1)]

    def one(q, ql):
        scores = _energy_score_kernel(X, norms, lambdas, q, ql)
        if approx:
            neg, idx = jax.lax.approx_max_k(-scores, k, recall_target=0.95)
        else:
            neg, idx = jax.lax.top_k(-scores, k)
        return idx, -neg

    return jax.vmap(one)(Q, q_lams)


@functools.partial(jax.jit, static_argnames=("k", "cand"))
def _batched_energy_banded_jit(
    X, norms, s_lam, s_idx, sub_c, sc_lams, Q, Qe, k, cand
):
    """Banded two-stage energy search in ONE program.

    The energy ranking's primary key is |Δλ| (energymaps.rs:628-674), and
    items nearest a query λ form a CONTIGUOUS window of the sorted-λ order
    — so stage 1 is ``searchsorted`` + a clamped ``2·cand`` window (exact
    top-``cand`` by λ-distance: the globally nearest ``cand`` items all lie
    within ``cand`` positions of the insertion point on either side).
    Stage 2 gathers only the window rows for the exact scoring —
    ``B·2·cand·F`` HBM traffic instead of the full ``[N, F]`` corpus read
    the single-pass kernel pays per batch. Result parity with the full
    scan holds whenever the window covers the equal-λ tie group straddling
    rank ``k`` (energy-mode λ is quantized to sub-centroid values, so tie
    groups are ~``N/n_subcentroids`` items — size ``cand`` accordingly;
    :meth:`ArrowSpace.max_lambda_tie_group` reports the worst case). One
    residual ordering nuance: when two DISTINCT λ values straddle the query
    at exactly equal |Δλ| (an evenly-spaced λ grid), ``top_k`` breaks the
    score tie by item index on the full scan but by window position here —
    same distances, possibly different tied indices at the boundary."""
    d = (
        jnp.sum(Qe * Qe, axis=-1, keepdims=True)
        + jnp.sum(sub_c * sub_c, axis=-1)[None, :]
        - 2.0 * mm(Qe, sub_c.T)
    )
    q_lams = sc_lams[jnp.argmin(d, axis=1)]                  # [B]

    n = s_lam.shape[0]
    pos = jnp.searchsorted(s_lam, q_lams).astype(jnp.int32)  # [B]
    start = jnp.clip(pos - cand, 0, n - 2 * cand)
    win = start[:, None] + jnp.arange(2 * cand, dtype=jnp.int32)[None, :]
    # Score the WHOLE window exactly (not a λ-only top-C of it): energy-mode
    # λ is quantized to sub-centroid values, so equal-λ tie groups are large
    # and a λ-only reduction would pick arbitrary tie members before the
    # cosine tie-break can rank them.
    ids = s_idx[win]                                         # [B, 2C]
    lam_d = jnp.abs(q_lams[:, None] - s_lam[win])            # [B, 2C]

    XU = X[ids]                                              # [B, 2C, F]
    qn = jnp.sqrt(jnp.sum(Q * Q, axis=-1))
    dots = jnp.einsum(
        "bf,bcf->bc", Q, XU, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    cosine = dots / (qn[:, None] * norms[ids] + 1e-9)
    scores = lam_d + jnp.where(lam_d < 1e-9, (1.0 - cosine) * 1e-9, 0.0)
    top, sel2 = jax.lax.top_k(-scores, k)
    return jnp.take_along_axis(ids, sel2, axis=1), -top


def search_energy_batch(
    aspace: ArrowSpace, queries, gl_energy: GraphLaplacian, k: int,
    approx: bool = False, candidates: int | str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Batched energy search: one fused dispatch prepares every query's λ
    (nearest-sub-centroid matmul) and runs the λ-distance top-k scan —
    the TPU-idiomatic serving path (amortizes the corpus read across the
    batch; the serial path pays a host round-trip per query).
    ``candidates=C`` routes to the banded two-stage program (sorted-λ
    ``searchsorted`` window → exact top-C by |Δλ| → gather-and-tie-break):
    ~``N·F/(B·C·F)``× less HBM read than the full scan, exact under the
    λ-tie boundary contract (see ``_batched_energy_banded_jit``).
    Returns ``(indices [B, k], distances [B, k])`` ascending."""
    if aspace.sub_centroids is None or aspace.subcentroid_lambdas is None:
        raise ValueError("not an energy-mode index (no sub-centroids)")
    Q = jnp.asarray(queries, jnp.float32)
    if Q.ndim == 1:
        Q = Q[None, :]
    b = Q.shape[0]
    # Power-of-two batch padding: one compiled program per size bucket
    # (micro-batched serving produces many distinct batch sizes).
    b_pad = 1 << max(b - 1, 1).bit_length() if b > 1 else 1
    if b_pad != b:
        Q = jnp.pad(Q, ((0, b_pad - b), (0, 0)))
    Qe = Q
    if aspace.extra_reduced_dim or (
        aspace.projection is not None
        and Q.shape[-1] == aspace.projection.original_dim
        and aspace.sub_centroids.shape[-1] == aspace.projection.reduced_dim
    ):
        Qe = aspace.projection.project(Q)
    if Qe.shape[-1] != aspace.sub_centroids.shape[-1]:
        raise ValueError(
            f"Query dimension {Q.shape[-1]} doesn't match "
            f"sub-centroid dimension {aspace.sub_centroids.shape[-1]}"
        )
    kk = min(k, aspace.nitems)
    if candidates is not None:
        if candidates == "auto":
            # Safe-by-default sizing: parity with the full scan needs the
            # window to cover any equal-λ tie group straddling rank k.
            cand = aspace.max_lambda_tie_group() + kk
            # Measured break-even (TUNING "banded energy", bench
            # `energy_banded_1m`): the banded program GATHERS B·2C rows
            # (latency-bound reads) while the full scan STREAMS N rows,
            # so banding only pays when the window share is small —
            # at B=256, C=572, N=1M the window covers ~29 % of the
            # corpus in gathered reads and loses 0.81× on device. Auto
            # bands only when B·2C ≤ N/10; an explicit integer
            # ``candidates`` is always honored.
            if 2 * cand * b_pad > aspace.nitems // 10:
                cand = aspace.nitems          # routes to the full scan
        else:
            cand = max(int(candidates), kk)
        if 2 * cand <= aspace.nitems:
            s_lam, s_idx = _sorted_lambda_arrays(aspace)
            idx, dist = _batched_energy_banded_jit(
                aspace.data, aspace.item_norms, s_lam, s_idx,
                aspace.sub_centroids,
                jnp.asarray(aspace.subcentroid_lambdas, jnp.float32),
                Q, Qe, kk, cand,
            )
            idx, dist = jax.device_get((idx, dist))   # one coalesced D2H
            return idx[:b], dist[:b]
        # Window would cover the whole corpus — the full scan is cheaper.
    idx, dist = _batched_energy_search_jit(
        aspace.data, aspace.item_norms, aspace.lambdas,
        aspace.sub_centroids, jnp.asarray(aspace.subcentroid_lambdas, jnp.float32),
        Q, Qe, kk, approx,
    )
    idx, dist = jax.device_get((idx, dist))       # one coalesced D2H
    return idx[:b], dist[:b]


def _sorted_lambda_arrays(aspace: ArrowSpace):
    """Device ``(sorted λ [N], item index per position [N])`` for the banded
    energy path, building the sorted index on first use. The host-backed
    case caches its device copies per sorted-index object (serving hot
    path: the arrays only change when the index is rebuilt)."""
    from matternet_rs_tpu.index.sorted import DeviceSortedLambdas

    if aspace.lambdas_sorted is None:
        aspace.build_lambdas_sorted()
    sl = aspace.lambdas_sorted
    if isinstance(sl, DeviceSortedLambdas):
        return sl.sorted_lambdas_dev, sl.sorted_indices_dev
    cache = getattr(aspace, "_banded_sorted_cache", None)
    if cache is not None and cache[0] == id(sl):
        return cache[1], cache[2]
    s_lam = jnp.asarray(sl.sorted_lambdas, jnp.float32)
    s_idx = jnp.asarray(sl.sorted_indices, jnp.int32)
    aspace._banded_sorted_cache = (id(sl), s_lam, s_idx)
    return s_lam, s_idx


@jax.jit
def _adaptive_energy_score_kernel(X, lambdas, query, q_lambda, w_lambda, w_feat):
    lam_dist = jnp.abs(q_lambda - lambdas)
    qn = jnp.maximum(jnp.sqrt(jnp.sum(query * query)), 1e-9)
    diff = X - query[None, :]
    feat_dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1)) / qn
    return w_lambda * lam_dist + w_feat * feat_dist


def search_energy_adaptive(
    aspace: ArrowSpace, query, gl_energy: GraphLaplacian, k: int
) -> list[tuple[int, float]]:
    """Adaptive-weight energy search: ``w_λ·|Δλ| + w_D·(‖q-x‖/‖q‖)`` with
    weights auto-derived from the λ-range (the reference sketches this as a
    commented-out implementation, energymaps.rs:675-760; live here).
    Ascending distance."""
    w_lambda, w_feat = adaptive_energy_weights(aspace)
    q_lambda = aspace.prepare_query_item(query, gl_energy)
    scores = _adaptive_energy_score_kernel(
        aspace.data, aspace.lambdas, jnp.asarray(query, jnp.float32),
        jnp.float32(q_lambda), jnp.float32(w_lambda), jnp.float32(w_feat),
    )
    kk = min(k, aspace.nitems)
    neg, idx = jax.lax.top_k(-scores, kk)
    return [(int(i), float(-s)) for i, s in zip(idx, neg)]


def adaptive_w_lambda(aspace: ArrowSpace) -> float:
    """Linear map of λ-range → weight [0.5, 2.0] (energymaps.rs:677-684)."""
    if aspace.range_lambdas < 1e-9:
        return 0.5
    return 0.5 + 1.5 * aspace.range_lambdas


def adaptive_energy_weights(aspace: ArrowSpace) -> tuple[float, float]:
    w_lambda = adaptive_w_lambda(aspace)
    return w_lambda, 2.5 - w_lambda
