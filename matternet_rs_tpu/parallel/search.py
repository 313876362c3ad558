"""Mesh-sharded λ scoring and distributed top-k search.

The north-star distributed pattern (BASELINE.json): shard items over the
``data`` axis, score locally, take a shard-local top-k, ``all_gather`` the
k·D candidates over ICI, and re-rank to a global top-k — exact (``k_local =
k_global``) and deterministic (global item indices break ties).

Implemented with ``shard_map`` so the collective is explicit and rides ICI;
λ scoring itself needs no communication (graph replicated, N sharded).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from matternet_rs_tpu.ops import taumode as tm
from matternet_rs_tpu.ops.search import (
    TILEMAX_MIN_N,
    _blend,
    _guarded_cosine,
    _scan_dots,
    _scan_dots_batch,
    tilemax_topk,
)
from matternet_rs_tpu.parallel.mesh import DATA_AXIS, flat_axis_index

try:  # JAX ≥ 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def sharded_taumode_lambdas(mesh, X_sharded: jax.Array, L: jax.Array, tau_mode: int,
                            tau_param: float = 0.0) -> jax.Array:
    """λ for all items with N sharded over the mesh — zero communication.

    ``jit`` with explicit shardings: XLA keeps each shard's seven matmuls
    local; the output stays sharded like the input. On a 2-D multi-slice
    mesh the item axis shards over (slice, data) jointly.
    """
    axes = tuple(mesh.axis_names)
    first = axes[0] if len(axes) == 1 else axes
    spec = P(first, None)

    @functools.partial(
        jax.jit,
        in_shardings=(NamedSharding(mesh, spec), NamedSharding(mesh, P())),
        out_shardings=NamedSharding(mesh, P(first)),
        static_argnums=(2, 3),
    )
    def run(Xs, Ls, mode, param):
        return tm.taumode_lambdas(Xs, Ls, mode, param)

    return run(X_sharded, L, tau_mode, tau_param)


def make_sharded_search(mesh, n_items: int, k: int):
    """Compile a distributed λ-aware search closure.

    Returns ``search(X_sharded, norms_sharded, lambdas_sharded, query,
    q_lambda, alpha) -> (idx [k], scores [k])`` with global indices.
    """

    def local_fn(Xl, nl, ll, q, ql, alpha):
        # Shard-local blended scores.
        qn = jnp.sqrt(jnp.sum(q * q))
        # THE per-dtype scan dot (ops/search._scan_dots): f32 shards keep
        # the parity-grade HIGHEST path; bf16 shards take the one-pass
        # MXU path — same contract as the single-device scan.
        dots = _scan_dots(Xl, q)
        scores = _blend(_guarded_cosine(dots, nl * qn), ll, ql, alpha)
        # Mask PADDED rows by global id — a real all-zero row is a valid
        # item the serial scan ranks by λ-sim, so a norm mask would drop it.
        shard = jax.lax.axis_index(DATA_AXIS)
        my_gids = shard * Xl.shape[0] + jnp.arange(Xl.shape[0])
        scores = jnp.where(my_gids < n_items, scores, -jnp.inf)

        kk = min(k, Xl.shape[0])
        top, idx = jax.lax.top_k(scores, kk)
        # Local → global indices.
        gidx = idx + shard * Xl.shape[0]

        # all-gather the candidate sets (k·D values over ICI), re-rank.
        all_scores = jax.lax.all_gather(top, DATA_AXIS, tiled=True)
        all_idx = jax.lax.all_gather(gidx, DATA_AXIS, tiled=True)
        # Deterministic tie-break: lower global index wins on equal score.
        # Final width: when k exceeds the per-shard row count the gathered
        # set still holds D·kk candidates — return min(k, D·kk), not kk.
        order = jnp.lexsort((all_idx, -all_scores))
        take = order[: min(k, all_scores.shape[0])]
        return all_idx[take], all_scores[take]

    # check_vma=False: after the all_gather every device holds identical
    # candidate sets, but the varying-mesh-axes checker can't prove the
    # post-gather sort is replicated.
    mapped = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS), P(DATA_AXIS), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_multislice_search(mesh, n_items: int, k: int):
    """Hierarchical distributed top-k over a 2-D ``("slice", "data")`` mesh.

    Merge order follows the interconnect hierarchy: shard-local top-k →
    ``all_gather`` + re-rank over the ``data`` axis (ICI within a slice) →
    ``all_gather`` of k candidates per slice over the ``slice`` axis (DCN)
    → final re-rank. DCN carries only k·n_slices scores per query.
    """
    n_slices = mesh.shape["slice"]
    n_data = mesh.shape[DATA_AXIS]

    def local_fn(Xl, nl, ll, q, ql, alpha):
        qn = jnp.sqrt(jnp.sum(q * q))
        # THE per-dtype scan dot (ops/search._scan_dots): f32 shards keep
        # the parity-grade HIGHEST path; bf16 shards take the one-pass
        # MXU path — same contract as the single-device scan.
        dots = _scan_dots(Xl, q)
        scores = _blend(_guarded_cosine(dots, nl * qn), ll, ql, alpha)

        slice_id = jax.lax.axis_index("slice")
        data_id = jax.lax.axis_index(DATA_AXIS)
        row0 = (slice_id * n_data + data_id) * Xl.shape[0]
        # Padded rows masked by global id (norm-masking would drop real
        # zero-vector items the serial scan ranks by λ-sim).
        scores = jnp.where(
            row0 + jnp.arange(Xl.shape[0]) < n_items, scores, -jnp.inf
        )

        kk = min(k, Xl.shape[0])
        top, idx = jax.lax.top_k(scores, kk)
        gidx = idx + row0

        # Stage 1: merge across the data axis (ICI). Keep min(k, gathered)
        # candidates per slice so k > per-shard rows still fills up.
        s1 = jax.lax.all_gather(top, DATA_AXIS, tiled=True)
        i1 = jax.lax.all_gather(gidx, DATA_AXIS, tiled=True)
        k1 = min(k, s1.shape[0])
        o1 = jnp.lexsort((i1, -s1))[:k1]
        s1, i1 = s1[o1], i1[o1]

        # Stage 2: merge across slices (DCN) — ≤ k values per slice only.
        s2 = jax.lax.all_gather(s1, "slice", tiled=True)
        i2 = jax.lax.all_gather(i1, "slice", tiled=True)
        o2 = jnp.lexsort((i2, -s2))[: min(k, s2.shape[0])]
        return i2[o2], s2[o2]

    mapped = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(("slice", DATA_AXIS), None), P(("slice", DATA_AXIS)),
            P(("slice", DATA_AXIS)), P(), P(), P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_sharded_energy_search(mesh, n_items: int, k: int):
    """Distributed pure-λ-distance search (the energy query path,
    energymaps.rs:628-674): ascending ``|Δλ|`` with a cosine tie-break at
    |Δλ| < 1e-9, shard-local top-k + all-gather merge. Works on 1-D and
    2-D ``("slice", "data")`` meshes (joint merge — candidate counts are
    tiny either way)."""
    axes = tuple(mesh.axis_names)

    def local_fn(Xl, nl, ll, q, ql):
        lam_dist = jnp.abs(ql - ll)
        qn = jnp.sqrt(jnp.sum(q * q))
        # THE per-dtype scan dot (ops/search._scan_dots): f32 shards keep
        # the parity-grade HIGHEST path; bf16 shards take the one-pass
        # MXU path — same contract as the single-device scan.
        dots = _scan_dots(Xl, q)
        cos = dots / (qn * nl + 1e-9)
        tie = jnp.where(lam_dist < 1e-9, (1.0 - cos) * 1e-9, 0.0)
        scores = lam_dist + tie
        shard = flat_axis_index(axes if len(axes) > 1 else axes[0])
        row0 = shard * Xl.shape[0]
        # Padded rows lose (global-id mask; real zero rows stay rankable).
        scores = jnp.where(
            row0 + jnp.arange(Xl.shape[0]) < n_items, scores, jnp.inf
        )

        kk = min(k, Xl.shape[0])
        neg_top, idx = jax.lax.top_k(-scores, kk)
        gidx = idx + row0
        all_scores = neg_top
        all_idx = gidx
        for ax in reversed(axes):
            all_scores = jax.lax.all_gather(all_scores, ax, tiled=True)
            all_idx = jax.lax.all_gather(all_idx, ax, tiled=True)
        order = jnp.lexsort((all_idx, -all_scores))[: min(k, all_scores.shape[0])]
        return all_idx[order], -all_scores[order]

    item_spec = P(axes[0]) if len(axes) == 1 else P(axes)
    x_spec = P(axes[0], None) if len(axes) == 1 else P(axes, None)
    mapped = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(x_spec, item_spec, item_spec, P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_search_lambda_aware(
    mesh, X_sharded, norms_sharded, lambdas_sharded, query, q_lambda, k: int,
    alpha: float = 0.7, n_items: int | None = None,
):
    """One-shot distributed search (compiles per (mesh, shapes, k)).

    ``n_items``: real row count (defaults to the padded length — pass it
    when the sharded arrays carry zero-padding so pad rows are masked).
    """
    search = make_sharded_search(
        mesh, X_sharded.shape[0] if n_items is None else n_items, k
    )
    return search(
        X_sharded, norms_sharded, lambdas_sharded,
        jnp.asarray(query, jnp.float32), jnp.float32(q_lambda),
        jnp.float32(alpha),
    )


def make_sharded_search_batch(mesh, n_items: int, k: int):
    """Batched distributed λ-aware top-k: one ``[B, F] × [F, n_local]``
    matmul per shard amortizes the shard read across the whole query batch
    (the serving path on a mesh), then an all-gather of ``B·k`` candidates
    per device and a per-row deterministic re-rank. Works on 1-D and 2-D
    ``("slice", "data")`` meshes (joint single-stage merge — the gathered
    candidate set is B·k·D values, tiny next to the scan)."""
    axes = tuple(mesh.axis_names)
    joint = axes if len(axes) > 1 else axes[0]

    def local_fn(Xl, nl, ll, Q, QL, alpha):
        from matternet_rs_tpu.ops.pallas import tilemax_fused as _tmf
        from matternet_rs_tpu.ops.search import (
            DEFAULT_TILE, FUSED_TILEMAX_MIN_N, _tilemax_degenerate,
            fused_fast_path, fused_tilemax,
        )

        n_local = Xl.shape[0]
        b = Q.shape[0]
        kk = min(k, n_local)
        row0 = flat_axis_index(joint) * n_local
        # Same two-level routing as core._routed_batched_search: above
        # TILEMAX_MIN_N the fused producer is worth it whenever its
        # envelope holds (XLA-gather fallback still beats XLA tilemax);
        # in the lowered band the FULL pipeline must apply.
        use_fused = (
            n_local >= TILEMAX_MIN_N
            and not _tilemax_degenerate(n_local, kk, DEFAULT_TILE)
            and _tmf.fused_supported(
                n_local, Xl.shape[1], b, Xl.dtype, DEFAULT_TILE
            )
        ) or (
            n_local >= FUSED_TILEMAX_MIN_N
            and fused_fast_path(n_local, Xl.shape[1], b, Xl.dtype, kk)
        )
        if use_fused:
            # Same fused producer + grouped-DMA gather as the single-device
            # exact scan (3.6x measured there); the padded-row mask (global
            # id >= n_items) is applied in-kernel via mask_from. Tie caveat
            # as below.
            mask_from = jnp.clip(
                jnp.int32(n_items) - jnp.int32(row0), 0, n_local
            )
            top, idx = fused_tilemax(
                Xl, nl, ll, Q, QL, kk, alpha, mask_from=mask_from
            )
        else:
            qn = jnp.sqrt(jnp.sum(Q * Q, axis=-1))             # [B]
            # Per-dtype batched scan dot (ops/search._scan_dots_batch):
            # f32 shards HIGHEST, bf16 shards one-pass — the serial
            # batched-scan contract.
            dots = _scan_dots_batch(Xl, Q)                      # [B, n_local]
            cos = _guarded_cosine(dots, nl[None, :] * qn[:, None])
            scores = _blend(cos, ll[None, :], QL[:, None], alpha)
            # Padded rows masked by global id (real zero rows stay rankable).
            scores = jnp.where(
                (row0 + jnp.arange(n_local))[None, :] < n_items,
                scores, -jnp.inf,
            )
            if n_local >= TILEMAX_MIN_N:
                # Score-exact selection at reduction cost on big shards (see
                # ops/search.tilemax_topk). Tie caveat (PARITY.md): on items
                # tied EXACTLY at a shard's kk-th score across a tile
                # boundary, an equally-scored id may substitute for flat
                # top_k's lowest-index pick — so returned ids on such ties
                # can differ from the flat path (and across mesh shapes that
                # straddle the routing threshold); scores are always exact.
                top, idx = tilemax_topk(scores, kk)            # [B, kk]
            else:
                top, idx = jax.lax.top_k(scores, kk)           # [B, kk]
        gidx = idx + row0

        all_s = jax.lax.all_gather(top, joint)                 # [D, B, kk]
        all_i = jax.lax.all_gather(gidx, joint)
        d = all_s.shape[0]
        all_s = jnp.moveaxis(all_s, 0, 1).reshape(-1, d * kk)  # [B, D·kk]
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(-1, d * kk)
        # Deterministic (score desc, id asc) per-row re-rank: id-sort first,
        # then stable argsort by -score. Final width min(k, D·kk): when k
        # exceeds the per-shard rows the gathered set still fills it.
        id_order = jnp.argsort(all_i, axis=1)
        all_s = jnp.take_along_axis(all_s, id_order, axis=1)
        all_i = jnp.take_along_axis(all_i, id_order, axis=1)
        sel = jnp.argsort(-all_s, axis=1)[:, : min(k, d * kk)]
        return (
            jnp.take_along_axis(all_i, sel, axis=1),
            jnp.take_along_axis(all_s, sel, axis=1),
        )

    item_spec = P(joint)
    mapped = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(joint, None), item_spec, item_spec, P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_sharded_search_batch_quantized(
    mesh, n_items: int, k: int, cand: int, tier: str
):
    """Batched distributed search through the QUANTIZED tier ladder
    (VERDICT r4 #3): per-shard reduced-precision scan → per-shard EXACT
    rescore of the selected candidates → all-gather top-k merge of the
    exact scores. Because every per-shard score that reaches the merge is
    an exact f32 HIGHEST rescore (the single-chip rescored-tier
    contract, PARITY.md "Rescored tiers"), the merge itself is exact —
    sharding changes candidate RECALL only (and upward: ``cand``
    candidates are selected per SHARD, so the global pool is D× the
    single-chip pool at the same ``cand``).

    ``tier``:

    * ``"int8_rescored"`` — per-shard int8 sketch scan (lossless bf16
      upcast, quarter HBM read); on the TPU fused envelope the
      maxima-first Pallas producer + ring-DMA slab rescore
      (:func:`ops.search.fused_scan_rescored` with the shard's pad rows
      masked in-kernel via ``mask_from``), else the pool-cut fallback.
    * ``"int8"`` — per-shard int8 scan with per-CANDIDATE pool-cut
      selection (finer than slabs, the higher-recall int8 rung).
    * ``"bf16x3_rescored"`` — per-shard bf16x3 scan of the f32 shard
      (~f32-grade selection, no sketch copy), fused when supported.

    ``cand`` is the PER-SHARD candidate width (static). Scalar-or-[B]
    ``alphas`` ride traced, as in the single-chip tiers."""
    from matternet_rs_tpu.ops.search import (
        fused_rescored_path,
        fused_scan_rescored,
        tilemax_topk,
    )

    if tier not in ("int8", "int8_rescored", "bf16x3_rescored"):
        raise ValueError(
            f"sharded quantized tier must be 'int8', 'int8_rescored' or "
            f"'bf16x3_rescored', got {tier!r}"
        )
    int8_scan = tier in ("int8", "int8_rescored")
    axes = tuple(mesh.axis_names)
    joint = axes if len(axes) > 1 else axes[0]

    def _body(Xl, X8l, multl, nl, ll, Q, QL, alphas):
        n_local = Xl.shape[0]
        b = Q.shape[0]
        kk = min(k, n_local)
        cc = max(min(cand, n_local), kk)
        row0 = flat_axis_index(joint) * n_local
        # Zero-pad mask: rows with global id >= n_items must not rank.
        mask_from = jnp.clip(
            jnp.int32(n_items) - jnp.int32(row0), 0, n_local
        )
        use_fused = tier != "int8" and fused_rescored_path(
            n_local, Xl.shape[1], b, kk, cc
        )
        if use_fused:
            Xscan = X8l if int8_scan else Xl
            top, idx = fused_scan_rescored(
                Xscan, Xl, nl, ll, Q, QL, kk, cc, alphas,
                scan_rn=multl if int8_scan else None,
                mask_from=mask_from,
            )
        else:
            # Pool-cut fallback (CPU meshes, tiny shards, tier="int8"):
            # reduced-precision scan → top-cc pool → exact HIGHEST
            # rescore — the same two-stage structure as the single-chip
            # non-fused tiers (core._int8_poolcut_scan).
            qn = jnp.sqrt(jnp.sum(Q * Q, axis=-1))               # [B]
            if int8_scan:
                dots = jnp.dot(
                    Q.astype(jnp.bfloat16), X8l.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32,
                )                                                # [B, n_local]
                cos = jnp.clip(
                    dots * multl[None, :]
                    / jnp.maximum(qn[:, None], 1e-12),
                    -1.0, 1.0,
                )
            else:
                dots = jnp.dot(
                    Q, Xl.T, precision=jax.lax.Precision.HIGH,
                    preferred_element_type=jnp.float32,
                )
                cos = _guarded_cosine(dots, nl[None, :] * qn[:, None])
            a_col = jnp.broadcast_to(
                jnp.asarray(alphas, jnp.float32), (b,)
            )[:, None]
            scores = _blend(cos, ll[None, :], QL[:, None], a_col)
            valid = (row0 + jnp.arange(n_local))[None, :] < n_items
            scores = jnp.where(valid, scores, -jnp.inf)
            if n_local >= TILEMAX_MIN_N:
                _, cidx = tilemax_topk(scores, cc)               # [B, cc]
            else:
                _, cidx = jax.lax.top_k(scores, cc)
            XU = Xl[cidx]                                        # [B, cc, F]
            d2 = jnp.einsum(
                "bf,bcf->bc", Q, XU,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            cos2 = _guarded_cosine(d2, nl[cidx] * qn[:, None])
            s2 = _blend(cos2, ll[cidx], QL[:, None], a_col)
            # Re-mask: an exact rescore of a padded zero row is cos=0 +
            # λ-sim, not -inf.
            s2 = jnp.where(
                row0 + cidx < n_items, s2, -jnp.inf
            )
            top, sel = jax.lax.top_k(s2, kk)
            idx = jnp.take_along_axis(cidx, sel, axis=1)
        gidx = idx + row0

        all_s = jax.lax.all_gather(top, joint)                   # [D, B, kk]
        all_i = jax.lax.all_gather(gidx, joint)
        d = all_s.shape[0]
        all_s = jnp.moveaxis(all_s, 0, 1).reshape(-1, d * kk)
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(-1, d * kk)
        # Deterministic (score desc, id asc) re-rank — exact on the
        # rescored (parity-grade) scores, same as the exact batch merge.
        id_order = jnp.argsort(all_i, axis=1)
        all_s = jnp.take_along_axis(all_s, id_order, axis=1)
        all_i = jnp.take_along_axis(all_i, id_order, axis=1)
        sel = jnp.argsort(-all_s, axis=1, stable=True)[:, : min(k, d * kk)]
        return (
            jnp.take_along_axis(all_i, sel, axis=1),
            jnp.take_along_axis(all_s, sel, axis=1),
        )

    item_spec = P(joint)
    if int8_scan:
        local_fn = _body
        in_specs = (
            P(joint, None), P(joint, None), item_spec, item_spec,
            item_spec, P(), P(), P(),
        )
    else:
        # No sketch operands for the f32-scan tier — the closure takes
        # only the shard arrays (callers never allocate dummies).
        def local_fn(Xl, nl, ll, Q, QL, alphas):
            return _body(Xl, None, None, nl, ll, Q, QL, alphas)

        in_specs = (
            P(joint, None), item_spec, item_spec, P(), P(), P(),
        )
    mapped = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_sharded_hybrid_search(mesh, n_items: int, k: int):
    """Distributed hybrid search (core.rs:1197-1323 semantics, exact):
    candidate set = λ-score top-k ∪ {cos > 0.9999} ∪ {GLOBAL argmax cos};
    high-semantic members score their cosine, the rest the blended score.

    Two collective stages: (1) all-gather each shard's (max-cos, gid) to
    crown the single global semantic top (deterministic id tie-break —
    only the true global argmax may enter through that door, exactly like
    the serial scan); (2) all-gather the per-shard top-k over eligible
    rows and re-rank. Exact: final scores are row-local, so the global
    top-k is contained in the union of shard-local top-ks."""
    from matternet_rs_tpu.ops.search import (
        SEMANTIC_THRESHOLD,
        _blend,
        _guarded_cosine,
    )

    axes = tuple(mesh.axis_names)
    joint = axes if len(axes) > 1 else axes[0]

    def local_fn(Xl, nl, ll, q, ql, alpha):
        qn = jnp.sqrt(jnp.sum(q * q))
        # THE per-dtype scan dot (ops/search._scan_dots): f32 shards keep
        # the parity-grade HIGHEST path; bf16 shards take the one-pass
        # MXU path — same contract as the single-device scan.
        dots = _scan_dots(Xl, q)
        cos = _guarded_cosine(dots, nl * qn)
        lambda_score = _blend(cos, ll, ql, alpha)

        row0 = flat_axis_index(joint) * Xl.shape[0]
        gids = row0 + jnp.arange(Xl.shape[0])
        real = gids < n_items
        cos_m = jnp.where(real, cos, -jnp.inf)

        # Stage 1: crown the global semantic top (cos desc, id asc ties).
        loc_top = jnp.argmax(cos_m)
        my_best = cos_m[loc_top]
        my_best_id = gids[loc_top]
        all_best = jax.lax.all_gather(my_best, joint)          # [D]
        all_best_id = jax.lax.all_gather(my_best_id, joint)
        w = jnp.lexsort((all_best_id, -all_best))[0]
        sem_top_gid = all_best_id[w]

        # Stage 2: the GLOBAL λ-top-k membership set (serial semantics —
        # a shard-local top-k would admit rows the serial hybrid excludes).
        kk = min(k, Xl.shape[0])
        l_top, l_idx = jax.lax.top_k(
            jnp.where(real, lambda_score, -jnp.inf), kk
        )
        g_s = jax.lax.all_gather(l_top, joint, tiled=True)      # [D·kk]
        g_i = jax.lax.all_gather(gids[l_idx], joint, tiled=True)
        g_order = jnp.lexsort((g_i, -g_s))[: min(k, g_s.shape[0])]
        gtop_ids = g_i[g_order]
        in_topk = jnp.any(gids[:, None] == gtop_ids[None, :], axis=1)

        high_sem = (cos > SEMANTIC_THRESHOLD) & real
        is_sem_top = gids == sem_top_gid
        eligible = (in_topk | high_sem | is_sem_top) & real
        final = jnp.where(high_sem, cos, lambda_score)
        final = jnp.where(is_sem_top & ~high_sem & ~in_topk, cos, final)
        final = jnp.where(eligible, final, -jnp.inf)

        top, idx = jax.lax.top_k(final, kk)
        gidx = gids[idx]
        all_s = jax.lax.all_gather(top, joint, tiled=True)
        all_i = jax.lax.all_gather(gidx, joint, tiled=True)
        order = jnp.lexsort((all_i, -all_s))[: min(k, all_s.shape[0])]
        return all_i[order], all_s[order]

    item_spec = P(joint)
    mapped = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(joint, None), item_spec, item_spec, P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)
