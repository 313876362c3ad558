"""Mesh-sharded item-graph construction: ring kNN + sharded ELL Laplacian.

The "mesh-sharded graph build" of the BASELINE north star, and the
SURVEY §5 distributed-backend row the reference has nothing for:
``ppermute`` ring for pairwise-tile exchange during the kNN graph build,
``all_gather`` for candidate/degree tiles, ``psum`` for global degree
statistics.

Design: items ``X [N_pad, F]`` are sharded over the mesh (contiguous
global blocks per device). Each device's block of *query* rows stays put;
a *visiting* tile of corpus rows rotates around the ring via
``lax.ppermute``. Each step is one ``[n_local, F] × [F, n_tile]`` MXU
matmul + a top-k merge, so no device ever materializes more than one
remote tile and the full pairwise matrix never exists anywhere. After
``D`` steps every row has seen the whole corpus — the result is exact,
with deterministic (distance, id) lexicographic tie-breaking.

On top of the ring kNN, :func:`distributed_knn_ell_laplacian` reproduces
the single-device Laplacian recipe (``ops/laplacian.py``: eps filter,
kernel weights, inline degree sparsification, union symmetrization,
``L = D − W``) with the graph stored as row-sharded ELL — O(N·k) memory
per mesh instead of O(N²) anywhere. Reverse (in-)edges are recovered from
an all-gathered edge list; rows whose in-degree exceeds the ELL reverse
capacity keep their highest-weight reverse edges and the dropped count is
``psum``-reported (no silent truncation).
"""

from __future__ import annotations

import dataclasses
import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from matternet_rs_tpu.graph import GraphParams
from matternet_rs_tpu.ops import distance as dist_ops
from matternet_rs_tpu.ops.laplacian import (
    SPARSIFY_AVG_DEGREE,
    WEIGHT_FLOOR,
)

log = logging.getLogger(__name__)

PAD_DIAG = 1e6   # isolated padded rows get a huge diagonal so their
                 # eigenpairs land at the TOP of the spectrum, not in the
                 # nullspace the smallest-eigenpair solvers look at.


from matternet_rs_tpu.parallel.mesh import flat_axis_index as _flat_axis_index


def _mesh_axes(mesh):
    axes = tuple(mesh.axis_names)
    return axes if len(axes) > 1 else axes[0]


def _ring_perm(n_dev: int):
    return [(i, (i + 1) % n_dev) for i in range(n_dev)]


def _mark_varying(x, axes):
    """Tag a constant as device-varying for the shard_map VMA checker."""
    try:
        return jax.lax.pcast(x, axes, to="varying")
    except (AttributeError, TypeError):
        return jax.lax.pvary(x, axes)


def _standardize_global(Xs: jax.Array, n_items: int) -> jax.Array:
    """Column z-scoring with moments over the n_items REAL rows only
    (padded zero rows would bias the stats). GSPMD keeps it sharded."""
    n_pad = Xs.shape[0]
    mask = (jnp.arange(n_pad) < n_items).astype(Xs.dtype)[:, None]
    s1 = jnp.sum(Xs * mask, axis=0)
    s2 = jnp.sum(Xs * Xs * mask, axis=0)
    mean = s1 / n_items
    var = jnp.maximum(s2 / n_items - mean * mean, 0.0)
    out = (Xs - mean[None, :]) / jnp.maximum(
        jnp.sqrt(var)[None, :], dist_ops.EPS_NORM
    )
    return out * mask       # padded rows stay zero


def distributed_knn(
    mesh, Xs: jax.Array, n_items: int, k: int, normalise: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact rectified-cosine kNN over the mesh-sharded item axis.

    Returns ``(dists [N_pad, k], ids [N_pad, k])``, row-sharded like the
    input; self excluded; padded query rows carry ``inf``/-1; deterministic
    (d, id) tie-break matches the single-device scan.
    """
    axes = _mesh_axes(mesh)
    n_dev = int(mesh.devices.size)
    n_pad = int(Xs.shape[0])
    per = n_pad // n_dev
    kk = min(k, n_items - 1)
    perm = _ring_perm(n_dev)

    if normalise:
        Xs = _standardize_global(Xs, n_items)

    def local_fn(Xl):
        me = _flat_axis_index(axes)
        row0 = me * per
        my_ids = row0 + jnp.arange(per)
        xhat = dist_ops.normalize_rows(Xl)

        def step(carry, _):
            tile, tile_row0, best_d, best_i = carry
            tile_ids = tile_row0 + jnp.arange(per)
            d = 1.0 - jnp.maximum(
                jnp.dot(
                    xhat, tile.T,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                ),
                0.0,
            )                                             # [per, per]
            invalid = (tile_ids[None, :] == my_ids[:, None]) | (
                tile_ids[None, :] >= n_items
            )
            d = jnp.where(invalid, jnp.inf, d)
            # A tile only holds `per` rows — take everything when kk ≥ per
            # (still exact: the merge buffer accumulates across tiles).
            t_negd, t_loc = jax.lax.top_k(-d, min(kk, per))
            t_ids = tile_ids[t_loc]

            cat_d = jnp.concatenate([best_d, -t_negd], axis=1)
            cat_i = jnp.concatenate([best_i, t_ids], axis=1)
            # (d, id) lexicographic merge — stable argsort over id-sorted
            # columns gives deterministic ties identical to the
            # single-device full-row top_k.
            id_order = jnp.argsort(cat_i, axis=1)
            cat_d = jnp.take_along_axis(cat_d, id_order, axis=1)
            cat_i = jnp.take_along_axis(cat_i, id_order, axis=1)
            sel = jnp.argsort(cat_d, axis=1, stable=True)[:, :kk]
            best_d = jnp.take_along_axis(cat_d, sel, axis=1)
            best_i = jnp.take_along_axis(cat_i, sel, axis=1)

            tile = jax.lax.ppermute(tile, axes, perm)
            tile_row0 = jax.lax.ppermute(tile_row0, axes, perm)
            return (tile, tile_row0, best_d, best_i), None

        # pvary: the init accumulators are device-varying (the VMA checker
        # otherwise rejects the scan carry whose outputs vary over the mesh).
        init = (
            xhat, row0,
            _mark_varying(jnp.full((per, kk), jnp.inf, jnp.float32), axes),
            _mark_varying(jnp.full((per, kk), -1, jnp.int32), axes),
        )
        (_, _, best_d, best_i), _ = jax.lax.scan(
            step, init, None, length=n_dev
        )
        # Padded query rows: no neighbours.
        pad_row = my_ids >= n_items
        best_d = jnp.where(pad_row[:, None], jnp.inf, best_d)
        best_i = jnp.where(pad_row[:, None], -1, best_i)
        return best_d, best_i

    spec_x = P(axes, None)
    mapped = shard_map(
        local_fn, mesh=mesh,
        in_specs=(spec_x,),
        out_specs=(P(axes, None), P(axes, None)),
    )
    return jax.jit(mapped)(Xs)


@dataclasses.dataclass
class ShardedEllLaplacian:
    """Row-sharded exact ELL Laplacian ``L = diag(diag) − W`` over the mesh.

    ``indices/weights [N_pad, ell_k]`` (-1 / 0 padding), ``diag [N_pad]``.
    Padded rows carry ``diag = PAD_DIAG`` and no edges.
    """

    indices: jax.Array
    weights: jax.Array
    diag: jax.Array
    n_items: int
    dropped_reverse_edges: int      # psum'd observability (no silent caps)

    @property
    def shape(self):
        n = int(self.indices.shape[0])
        return (n, n)

    def to_dense(self) -> np.ndarray:
        """Host-side dense assembly (tests / small n only)."""
        n = int(self.indices.shape[0])
        idx = np.asarray(self.indices)
        w = np.asarray(self.weights)
        W = np.zeros((n, n), np.float64)
        for i in range(n):
            for m in range(idx.shape[1]):
                j = idx[i, m]
                if j >= 0:
                    W[i, j] = max(W[i, j], w[i, m])
        d = np.asarray(self.diag, np.float64)
        L = np.diag(d) - W
        return L[: self.n_items, : self.n_items]


def distributed_knn_ell_laplacian(
    mesh, Xs: jax.Array, n_items: int, params: GraphParams,
    reverse_k: int | str | None = None,
) -> ShardedEllLaplacian:
    """Mesh-sharded item-graph Laplacian with the single-device semantics
    (``ops/laplacian.py``): ring kNN → eps filter → kernel weights →
    inline degree sparsification (global avg-degree decision via psum) →
    union symmetrization (reverse edges recovered from the all-gathered
    directed edge list) → ``L = D − W`` rows in ELL form.

    ``reverse_k`` caps the reverse-edge slots per row (default ``topk``);
    rows with higher in-degree keep their highest-weight reverse edges and
    the total dropped count is reported on the result. Pass
    ``reverse_k="auto"`` to guarantee ``dropped_reverse_edges == 0``:
    one attempt at the ``topk`` default, then (only if edges dropped)
    one more at the measured max in-degree — an upper bound on the
    reverse requirement, so two assemblies worst case with the ring kNN
    reused. The operator is then exactly symmetric, which eigensolvers
    (``distributed_lobpcg``) require for exact spectra; capacity growth
    is logged with the resulting ELL memory.

    Memory note: the kNN/Laplacian ROWS are O(N·k / D) per device, but the
    symmetrization step all-gathers the full directed edge list — an
    O(N·k)-per-device transient (plus its lexsort buffers) while reverse
    edges are recovered. That bounds this exact-union builder to corpora
    whose edge list fits one device (~50M rows × k=32 at f32+int32 on a
    16 GB chip); beyond that, build per-shard graphs from the store
    (``distributed_build_from_store``) or extend the ring exchange to
    stream dst-filtered edge tiles instead of gathering them all.
    """
    axes = _mesh_axes(mesh)
    n_dev = int(mesh.devices.size)
    n_pad = int(Xs.shape[0])
    per = n_pad // n_dev
    kk = min(int(params.topk), n_items - 1)

    nd, ids = distributed_knn(
        mesh, Xs, n_items, kk, normalise=bool(params.normalise)
    )

    eps = jnp.float32(params.eps)
    p = jnp.float32(params.p)
    sigma = jnp.float32(params.sigma_value())

    if reverse_k == "auto":
        rk = kk
        out = _assemble_ell(
            mesh, axes, nd, ids, n_pad, per, n_items, kk, rk,
            eps, p, sigma,
        )
        if out.dropped_reverse_edges == 0 or rk >= n_items - 1:
            return out
        # ONE more assembly at the measured max in-degree (an upper bound
        # on the per-row reverse requirement — the weight stages only
        # remove candidate edges), instead of a 4×-per-step ladder that
        # re-runs the full all-gather symmetrization per retry. The kNN
        # ids are already on device; count in-degrees there and fetch
        # only the scalar max — materializing the [N_pad, k] global id
        # list on host is a multi-GB transfer at the ~50M×32 design scale.
        max_indeg = _max_indegree_device(mesh, axes, ids, n_items)
        rk = min(max(max_indeg, kk + 1), n_items - 1)
        est_gb = n_pad * (kk + rk) * 8 / 1e9
        # Growth is auto's designed success path; WARN only when the
        # grown footprint is material (hub-heavy corpus at scale).
        log.log(
            logging.WARNING if est_gb > 0.5 else logging.INFO,
            "distributed ELL auto reverse capacity grew to %d slots/row "
            "(first attempt %d dropped %d reverse edges) — ELL "
            "ids+weights ≈ %.2f GB across the mesh; pin reverse_k to "
            "bound memory instead",
            rk, kk, out.dropped_reverse_edges, est_gb,
        )
        return _assemble_ell(
            mesh, axes, nd, ids, n_pad, per, n_items, kk, rk,
            eps, p, sigma,
        )
    rk = kk if reverse_k is None else int(reverse_k)
    return _assemble_ell(
        mesh, axes, nd, ids, n_pad, per, n_items, kk, rk, eps, p, sigma
    )


def _max_indegree_device(mesh, axes, ids, n_items: int) -> int:
    """Max in-degree over the real rows of a row-sharded kNN id list,
    computed on device: each shard scatter-adds its ids into a [n_items+1]
    bin vector (pad rows and invalid slots land in the overflow bin), the
    bins psum across the mesh, and only the scalar max comes to host."""
    per = int(ids.shape[0]) // int(mesh.devices.size)

    def local_fn(idl):
        me = _flat_axis_index(axes)
        my_rows = me * per + jnp.arange(idl.shape[0])
        real = (my_rows < n_items)[:, None]
        flat = jnp.where(real & (idl >= 0), idl, n_items).reshape(-1)
        counts = jnp.zeros(n_items + 1, jnp.int32).at[flat].add(1)
        counts = jax.lax.psum(counts, axes)
        return jnp.max(counts[:n_items])

    mapped = shard_map(
        local_fn, mesh=mesh, in_specs=(P(axes, None),), out_specs=P(),
        check_vma=False,
    )
    return int(jax.jit(mapped)(ids))


def _assemble_ell(mesh, axes, nd, ids, n_pad, per, n_items, kk, rk,
                  eps, p, sigma) -> ShardedEllLaplacian:
    """ELL assembly for one reverse-edge capacity ``rk`` (the kNN result
    is reused across "auto" capacity raises)."""

    def local_fn(ndl, idl):
        me = _flat_axis_index(axes)
        my_ids = me * per + jnp.arange(per)

        valid = (idl >= 0) & (ndl <= eps)
        w = 1.0 / (1.0 + (jnp.where(valid, ndl, 0.0) / sigma) ** p)
        vmask = valid & (w > WEIGHT_FLOOR)
        w = jnp.where(vmask, w, 0.0)

        # Global degree stats (psum over real rows only). Reduce in f32
        # like the single-device recipe (ops/laplacian.py) — an int32
        # psum wraps at N·avg_degree > 2^31 (≈ 1e9 rows × degree 3, the
        # Deep1B scale this module targets) and a negative total would
        # silently disable sparsification.
        degrees = jnp.sum(valid, axis=1)                      # [per]
        real = my_ids < n_items
        tot_deg = jax.lax.psum(
            jnp.sum(jnp.where(real, degrees, 0).astype(jnp.float32)), axes
        )
        avg_degree = tot_deg / n_items
        sparsify = avg_degree > SPARSIFY_AVG_DEGREE

        deg_all = jax.lax.all_gather(
            degrees.astype(jnp.float32), axes, tiled=True
        )                                                      # [N_pad]
        score = w * jnp.sqrt(
            degrees.astype(jnp.float32)[:, None]
            * deg_all[jnp.maximum(idl, 0)]
        )
        score = jnp.where(vmask, score, -jnp.inf)
        order = jnp.argsort(-score, axis=1)
        ranks = jnp.argsort(order, axis=1)
        n_valid = jnp.sum(vmask, axis=1)
        keep_count = jnp.where(n_valid > 2, jnp.maximum(n_valid // 2, 1), n_valid)
        keep_mask = ranks < keep_count[:, None]
        w = jnp.where(jnp.logical_and(sparsify, ~keep_mask), 0.0, w)
        fwd_ids = jnp.where(w > 0, idl, -1)

        # ---- union symmetrization: recover reverse (in-)edges ----------
        ids_all = jax.lax.all_gather(fwd_ids, axes, tiled=True)   # [N_pad, k]
        w_all = jax.lax.all_gather(w, axes, tiled=True)

        # Forward slots take max(w_ij, w_ji): does j also point at i?
        nb_rows = ids_all[jnp.maximum(fwd_ids, 0)]            # [per, k, k]
        nb_w = w_all[jnp.maximum(fwd_ids, 0)]
        rev_hit = (nb_rows == my_ids[:, None, None]) & (nb_w > 0)
        w_rev_fwd = jnp.max(jnp.where(rev_hit, nb_w, 0.0), axis=2)
        w_fwd = jnp.where(fwd_ids >= 0, jnp.maximum(w, w_rev_fwd), 0.0)
        # Mutual edges (both directions exist) — they occupy a forward slot
        # and must not consume (or count against) reverse capacity.
        n_mutual = jnp.sum(
            (jnp.any(rev_hit, axis=2) & (w_fwd > 0)).astype(jnp.int32), axis=1
        )

        # Reverse-only edges: sort the full directed edge list by
        # (dst, -weight); each row's in-edges are then a contiguous,
        # weight-descending run located by searchsorted. Over-gather by the
        # forward width kk (at most kk run entries are forward duplicates),
        # mask duplicates, then keep the first rk survivors.
        src = jnp.repeat(jnp.arange(n_pad, dtype=jnp.int32), ids_all.shape[1])
        dst = ids_all.reshape(-1)
        ew = w_all.reshape(-1)
        dst_key = jnp.where(dst >= 0, dst, n_pad)             # invalid → end
        edge_order = jnp.lexsort((-ew, dst_key))
        dst_s = dst_key[edge_order]
        src_s = src[edge_order]
        ew_s = ew[edge_order]

        rkx = rk + kk
        lo = jnp.searchsorted(dst_s, my_ids, side="left")      # [per]
        hi = jnp.searchsorted(dst_s, my_ids, side="right")
        take = lo[:, None] + jnp.arange(rkx)[None, :]          # [per, rkx]
        in_run = take < hi[:, None]
        take = jnp.minimum(take, dst_s.shape[0] - 1)
        cand_src = jnp.where(in_run, src_s[take], -1)
        cand_w = jnp.where(in_run, ew_s[take], 0.0)
        dup = jnp.any(
            cand_src[:, :, None]
            == jnp.where(w_fwd > 0, fwd_ids, -2)[:, None, :],
            axis=2,
        )
        ok = in_run & ~dup & (cand_w > 0)
        rank = jnp.cumsum(ok.astype(jnp.int32), axis=1) - 1
        keep = ok & (rank < rk)
        # Compact the kept entries into the first rk slots per row.
        slot = jnp.where(keep, rank, rk)                      # [per, rkx]
        rev_src = jnp.full((per, rk + 1), -1, jnp.int32).at[
            jnp.arange(per)[:, None], slot
        ].max(jnp.where(keep, cand_src, -1))[:, :rk]
        rev_w = jnp.zeros((per, rk + 1), jnp.float32).at[
            jnp.arange(per)[:, None], slot
        ].max(jnp.where(keep, cand_w, 0.0))[:, :rk]
        # Exact drop count: in-degree minus mutual (forward-slot) edges
        # minus the rk reverse slots.
        dropped = jax.lax.psum(
            jnp.sum(jnp.maximum((hi - lo) - n_mutual - rk, 0)), axes
        )

        ell_ids = jnp.concatenate(
            [jnp.where(w_fwd > 0, fwd_ids, -1), rev_src], axis=1
        )
        ell_w = jnp.concatenate([w_fwd, rev_w], axis=1)
        deg = jnp.sum(ell_w, axis=1)
        diag = jnp.where(my_ids < n_items, deg, PAD_DIAG)
        return ell_ids, ell_w, diag, dropped

    mapped = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axes, None), P(axes, None)),
        out_specs=(P(axes, None), P(axes, None), P(axes), P()),
        check_vma=False,
    )
    ell_ids, ell_w, diag, dropped = jax.jit(mapped)(nd, ids)
    return ShardedEllLaplacian(
        indices=ell_ids, weights=ell_w, diag=diag, n_items=n_items,
        dropped_reverse_edges=int(dropped),
    )


def distributed_lobpcg(
    mesh, ell: ShardedEllLaplacian, k: int, iters: int = 100, seed: int = 0,
    return_residuals: bool = False,
):
    """Smallest-k eigenpairs of the sharded ELL Laplacian.

    The LOBPCG block iteration (``ops/eigensolver._lobpcg_core``) runs
    under GSPMD: the SpMV's ``x[indices]`` gather partitions over the
    row-sharded ELL with the eigenvector block replicated, and every inner
    product contraction psums across shards automatically — the SURVEY
    §7.3 "blocked Lanczos/LOBPCG with psum'd reductions" north star.
    Padded rows carry ``diag = PAD_DIAG`` so their eigenpairs sit far
    above the smallest-k window.

    ``return_residuals=True`` additionally returns ``‖L·x − θ·x‖₂`` per
    eigenpair (computed with the same sharded operator, one fused
    dispatch) — the convergence observability VERDICT r2 #5 asks for.
    """
    from matternet_rs_tpu.ops.eigensolver import _lobpcg_core

    if ell.dropped_reverse_edges:
        import logging

        # A dropped reverse edge leaves W asymmetric (one endpoint keeps
        # the edge, the other lost it to capacity) — LOBPCG assumes a
        # symmetric operator, so eigenpairs degrade. Rebuild the graph
        # with a larger reverse_k for exact spectra.
        logging.getLogger(__name__).warning(
            "distributed_lobpcg: operator has %d dropped reverse edges "
            "(asymmetric rows); raise reverse_k in "
            "distributed_knn_ell_laplacian for exact eigenpairs",
            ell.dropped_reverse_edges,
        )

    n_pad = int(ell.indices.shape[0])
    rng = np.random.default_rng(seed)
    X0 = jnp.asarray(rng.normal(size=(n_pad, k)), jnp.float32)
    X0 = jax.device_put(X0, NamedSharding(mesh, P()))

    # The ELL operands are jit ARGUMENTS, not closure constants: in the
    # multi-controller regime (jax.distributed) closing over arrays that
    # span non-addressable devices is rejected outright.
    # out_shardings replicated: the eigenpairs are the host-facing result;
    # a row-sharded output could not even be fetched in multi-controller
    # mode (values spanning non-addressable devices).
    @functools.partial(
        jax.jit, static_argnames=("kk", "it"),
        out_shardings=NamedSharding(mesh, P()),
    )
    def run(indices, weights, diag, X, kk, it):
        def matvec(V):
            gathered = V[jnp.maximum(indices, 0)]          # [N_pad, ek, k]
            wx = jnp.sum(
                jnp.where(
                    (indices >= 0)[..., None], weights[..., None], 0.0
                ) * gathered,
                axis=1,
            )
            return diag[:, None] * V - wx

        theta, Xk = _lobpcg_core(matvec, X, kk, it)
        R = matvec(Xk) - Xk * theta[None, :]
        res = jnp.sqrt(jnp.sum(R * R, axis=0))
        return theta, Xk, res

    vals, vecs, res = run(ell.indices, ell.weights, ell.diag, X0, kk=k, it=iters)
    out = (np.asarray(vals), np.asarray(vecs)[: ell.n_items])
    if return_residuals:
        return out + (np.asarray(res),)
    return out
