"""ShardedArrowSpace: the mesh-scale index front-end.

The distributed capability the single-node reference lacks (SURVEY §2.5 —
"index sharding across TPU mesh ... all_gather+top-k-merge" is named the
north star in BASELINE.json). Wraps a built index so that:

* items, norms, and λ are sharded over the ``data`` mesh axis,
* the F×F graph and λ-normalization stats are replicated,
* λ scoring is zero-communication (pure DP),
* queries run shard-local blended scoring + shard-local top-k + one
  ``all_gather`` of k·D candidates over ICI + replicated re-rank — exact
  and deterministic vs the single-device scan.

Build path for data larger than one host: feed per-shard blocks through
``from_shards``; λ statistics are reduced globally before normalization so
the result is identical to a single-device build.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from matternet_rs_tpu.core import ArrowSpace, TauMode, TAUDEFAULT
from matternet_rs_tpu.graph import GraphLaplacian
from matternet_rs_tpu.ops import taumode as tm
from matternet_rs_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_items,
    shard_items_from_blocks,
)
from matternet_rs_tpu.parallel.search import (
    make_sharded_search,
    sharded_taumode_lambdas,
)


def _normalize_sharded_lambdas(mesh, raw: jax.Array, n_items: int):
    """Masked global λ min/max + normalization, entirely on device.

    Only two scalars come back to the host; the raw λ vector never does
    (D2H through the remote tunnel is the bottleneck, and at Deep1B scale
    it would not fit one host anyway). Padded rows (global index ≥ n) are
    excluded from the stats and clamp harmlessly in the output.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = tuple(mesh.axis_names)
    first = axes[0] if len(axes) == 1 else axes

    @jax.jit
    def run(raw, n):
        idx = jnp.arange(raw.shape[0])
        valid = idx < n
        mn = jnp.min(jnp.where(valid, raw, jnp.inf))
        mx = jnp.maximum(jnp.max(jnp.where(valid, raw, -jnp.inf)), 0.0)
        rng = jnp.maximum(mx - mn, 1e-9)
        lam = jnp.clip((raw - mn) / rng, 0.0, 1.0)
        return (
            jax.lax.with_sharding_constraint(lam, NamedSharding(mesh, P(first))),
            mn,
            rng,
        )

    lam, mn, rng = run(raw, jnp.int32(n_items))
    return lam, float(mn), float(rng)


@dataclasses.dataclass
class ShardedArrowSpace:
    mesh: object
    X: jax.Array            # [N_pad, F] sharded over "data"
    norms: jax.Array        # [N_pad] sharded
    lambdas: jax.Array      # [N_pad] sharded, normalized to [0,1]
    gl: GraphLaplacian      # replicated F×F graph
    n_items: int
    taumode: TauMode = TAUDEFAULT
    min_lambdas: float = 0.0
    range_lambdas: float = 1.0
    projection: object | None = None     # ImplicitProjection for F-dim queries
    # Energy-mode state (copied from an energy-built ArrowSpace): query λ
    # routes through the nearest sub-centroid, matching serial semantics.
    sub_centroids: jax.Array | None = None
    subcentroid_lambdas: np.ndarray | None = None
    _search_cache: dict = dataclasses.field(default_factory=dict)
    # Lazy per-shard int8 sketch for the quantized tiers (sharded like X;
    # quantization is row-local so GSPMD keeps each shard's rows on its
    # device — no gather). One atomic pair write, as in core.ArrowSpace.
    _i8_pair: tuple | None = None

    # ------------------------------------------------------------------
    @classmethod
    def from_arrowspace(
        cls, aspace: ArrowSpace, gl: GraphLaplacian, n_devices: int | None = None,
        mesh=None,
    ) -> "ShardedArrowSpace":
        """Shard an already-built single-device index across the mesh (pass
        ``mesh`` for a prebuilt 2-D multi-slice mesh)."""
        if mesh is None:
            mesh = make_mesh(n_devices)
        return cls(
            mesh=mesh,
            X=shard_items(mesh, aspace.data),
            norms=shard_items(mesh, aspace.norms),
            lambdas=shard_items(mesh, aspace.lambdas),
            gl=GraphLaplacian(
                matrix=replicate(mesh, gl.matrix),
                init_data=replicate(mesh, gl.init_data),
                nnodes=gl.nnodes,
                graph_params=gl.graph_params,
                energy=gl.energy,
            ),
            n_items=aspace.nitems,
            taumode=aspace.taumode,
            min_lambdas=aspace.min_lambdas,
            range_lambdas=aspace.range_lambdas,
            projection=aspace.projection,
            sub_centroids=aspace.sub_centroids,
            subcentroid_lambdas=aspace.subcentroid_lambdas,
        )

    @classmethod
    def from_shards(
        cls,
        shards: Sequence[np.ndarray],
        gl: GraphLaplacian,
        taumode: TauMode = TAUDEFAULT,
        n_devices: int | None = None,
        mesh=None,
    ) -> "ShardedArrowSpace":
        """Distributed build: per-shard raw blocks → sharded λ → global
        min/max reduction → normalized sharded index. Pass ``mesh`` for a
        prebuilt 2-D multi-slice mesh.

        λ computation needs no communication (graph replicated); only two
        scalars (min/max) are reduced globally, so the normalized λ equal a
        single-device build bit-for-bit (modulo shard concat order, which
        the caller controls).
        """
        if mesh is None:
            mesh = make_mesh(n_devices)
        n = sum(int(np.asarray(s).shape[0]) for s in shards)
        f = int(np.asarray(shards[0]).shape[1])
        if f != gl.matrix.shape[0]:
            raise ValueError(
                f"shard feature dim {f} must match the graph's "
                f"{gl.matrix.shape[0]} (project shards before a distributed "
                "build when using JL reduction)"
            )
        # Per-device placement — the global array is never materialized on
        # one host (largest host temporary = one device block).
        Xs = shard_items_from_blocks(mesh, shards)
        Ls = replicate(mesh, gl.matrix)
        raw = sharded_taumode_lambdas(mesh, Xs, Ls, taumode.mode, taumode.param)
        lam_norm, mn, rng = _normalize_sharded_lambdas(mesh, raw, n)
        norms = jnp.sqrt(jnp.sum(Xs * Xs, axis=-1))
        return cls(
            mesh=mesh,
            X=Xs,
            norms=norms,
            lambdas=lam_norm,
            gl=GraphLaplacian(
                matrix=Ls,
                init_data=replicate(mesh, gl.init_data),
                nnodes=n,
                graph_params=gl.graph_params,
                energy=gl.energy,
            ),
            n_items=n,
            taumode=taumode,
            min_lambdas=mn,
            range_lambdas=rng,
        )

    @classmethod
    def distributed_build(
        cls,
        shards: Sequence[np.ndarray],
        graph_params,
        k_clusters: int,
        taumode: TauMode = TAUDEFAULT,
        n_devices: int | None = None,
        mesh=None,
        lloyd_iters: int = 10,
        centroids: str = "serial",
        radius: float = 25.0,
        centroid_sample: int | None = None,
    ) -> "ShardedArrowSpace":
        """Fully distributed build: per-host shards → mesh-sharded items →
        stage-1 clustering → (tiny, replicated) F×F graph from the
        centroids → zero-communication sharded λ → device-side global stats.

        ``centroids`` selects the stage-1 semantics (VERDICT r3 #4;
        default flipped to the exact mode per VERDICT r4 #6):

        * ``"serial"`` (default) — run the SERIAL builder's radius-gated
          incremental scan (the native C++ fast path,
          clustering.rs:574-932 semantics; ``radius`` is the serial
          builder's cluster radius) over the first ``centroid_sample``
          rows streamed host-side in shard order (default: all rows —
          identical to the serial builder's visit order). Every later
          stage (centroid graph, sharded λ, normalization, search) is
          already exact vs serial, so with a full sample the distributed
          index is ranking-equivalent to the serial build (measured
          recall@10 overlap 1.0 at 100k, round-4 bench) — at the cost of
          one bounded host pass for stage 1 (+1.4 s at 100k).
        * ``"lloyd"`` — psum-reduced Lloyd refinement over the
          mesh-sharded items (parallel/clustering.py). Nothing N-sized
          ever exists on one host, so this is the opt-in scale escape
          when the host pass is unaffordable (≫100M rows or no host
          streaming of the shards) — but the centroids differ from the
          serial builder's order-dependent incremental scan (0.875
          recall@10 overlap vs ``ArrowSpaceBuilder.build`` at 100k,
          round-3 measurement), so rankings diverge.
        """
        from matternet_rs_tpu.ops import laplacian as lap_ops

        if mesh is None:
            mesh = make_mesh(n_devices)
        n = sum(int(np.asarray(s).shape[0]) for s in shards)
        Xs = shard_items_from_blocks(mesh, shards)

        if centroids == "serial":
            from matternet_rs_tpu.clustering import incremental_clustering

            budget = n if centroid_sample is None else min(centroid_sample, n)
            if budget <= 0:
                raise ValueError(
                    "centroids='serial' needs at least one sample row: "
                    f"centroid_sample={centroid_sample!r} over {n} items"
                )
            parts, got = [], 0
            for s in shards:
                if got >= budget:
                    break
                take = np.asarray(s, np.float32)[: budget - got]
                parts.append(take)
                got += len(take)
            sample = parts[0] if len(parts) == 1 else np.concatenate(parts)
            out = incremental_clustering(
                sample, max_clusters=k_clusters, radius=radius
            )
            cents = out.centroids
        elif centroids == "lloyd":
            from matternet_rs_tpu.parallel.clustering import distributed_lloyd

            cents, counts, _assign = distributed_lloyd(
                mesh, Xs, n, k_clusters, iters=lloyd_iters
            )
            cents = cents[counts > 0]
        else:
            raise ValueError(
                f"centroids must be 'lloyd' or 'serial', got {centroids!r}"
            )

        # The graph is centroid-scale ([C, F] → F×F): built once, replicated.
        gl = lap_ops.build_laplacian_from_k_cluster(
            jnp.asarray(cents), graph_params, n_items=n
        )
        Ls = replicate(mesh, gl.matrix)
        raw = sharded_taumode_lambdas(mesh, Xs, Ls, taumode.mode, taumode.param)
        lam_norm, mn, rng = _normalize_sharded_lambdas(mesh, raw, n)
        norms = jnp.sqrt(jnp.sum(Xs * Xs, axis=-1))
        return cls(
            mesh=mesh,
            X=Xs,
            norms=norms,
            lambdas=lam_norm,
            gl=GraphLaplacian(
                matrix=Ls,
                init_data=replicate(mesh, gl.init_data),
                nnodes=n,
                graph_params=gl.graph_params,
                energy=gl.energy,
            ),
            n_items=n,
            taumode=taumode,
            min_lambdas=mn,
            range_lambdas=rng,
        )

    # ------------------------------------------------------------------
    def prepare_query_lambda(self, query) -> float:
        """Query λ: energy mode maps to the nearest sub-centroid's
        (already-normalized) λ; eigen mode runs synthetic λ against the
        replicated graph then normalizes (core.rs:865-935 semantics).
        Projects original-dim queries when a JL projection is active.
        Delegates to :meth:`prepare_query_lambdas_batch` with B=1 so the
        serial and batched surfaces agree by construction (a previous
        difference-form serial path could flip the sub-centroid argmin
        vs the batched matmul decomposition under f32 cancellation)."""
        return float(np.asarray(self.prepare_query_lambdas_batch(query))[0])

    def prepare_query_lambdas_batch(self, queries):
        """Query-λ for a ``[B, F]`` (or single ``[F]``) batch — the one
        λ-prep path both :meth:`search`/:meth:`prepare_query_lambda` and
        :meth:`search_batch` share. Energy mode: nearest sub-centroid λ
        via the ‖q‖²+‖c‖²−2⟨q,c⟩ matmul decomposition (the broadcast
        difference tensor would materialize [B, S, F] — ~537 MB at
        B=256, S=4096, F=128 — on the serving path). Eigen mode: one
        taumode dispatch against the replicated graph, then normalize."""
        Q = jnp.asarray(queries, jnp.float32)
        if Q.ndim == 1:
            Q = Q[None, :]
        Qlam = Q
        if self.sub_centroids is not None and self.subcentroid_lambdas is not None:
            if (
                self.projection is not None
                and Q.shape[-1] == self.projection.original_dim
                and self.sub_centroids.shape[-1] == self.projection.reduced_dim
            ):
                Qlam = self.projection.project(Q)
            from matternet_rs_tpu.ops._mm import mm as _mm

            sub_c = self.sub_centroids
            d = (
                jnp.sum(Qlam * Qlam, axis=-1, keepdims=True)
                + jnp.sum(sub_c * sub_c, axis=-1)[None, :]
                - 2.0 * _mm(Qlam, sub_c.T)
            )
            sc = jnp.asarray(np.asarray(self.subcentroid_lambdas, np.float32))
            return sc[jnp.argmin(d, axis=1)]
        if (
            self.projection is not None
            and Q.shape[-1] == self.projection.original_dim
            and self.gl.matrix.shape[0] == self.projection.reduced_dim
        ):
            # Only project when the graph actually lives in the reduced
            # space — otherwise the λ-prep and scoring paths disagree
            # (crash vs answer) on the same index.
            Qlam = self.projection.project(Q)
        raw = tm.taumode_lambdas(
            Qlam, self.gl.matrix, self.taumode.mode, self.taumode.param
        )
        return jnp.clip((raw - self.min_lambdas) / self.range_lambdas, 0.0, 1.0)

    def search(
        self, query, k: int, alpha: float = 0.7, query_lambda: float | None = None
    ) -> list[tuple[int, float]]:
        """Distributed λ-aware top-k (exact vs the single-device scan)."""
        if query_lambda is None:
            query_lambda = self.prepare_query_lambda(query)
        key = k
        if key not in self._search_cache:
            if "slice" in self.mesh.axis_names:
                from matternet_rs_tpu.parallel.search import make_multislice_search

                self._search_cache[key] = make_multislice_search(
                    self.mesh, self.n_items, k
                )
            else:
                self._search_cache[key] = make_sharded_search(
                    self.mesh, self.n_items, k
                )
        fn = self._search_cache[key]
        idx, sc = fn(
            self.X, self.norms, self.lambdas,
            jnp.asarray(query, jnp.float32), jnp.float32(query_lambda),
            jnp.float32(alpha),
        )
        return [
            (int(i), float(s))
            for i, s in zip(np.asarray(idx), np.asarray(sc))
            if np.isfinite(s)
        ]

    def _ensure_int8(self):
        """Per-shard int8 sketch (lazy): row-local symmetric quantization
        of the sharded corpus — same math/object as the single-chip
        ``ArrowSpace.enable_int8_scan`` (`core._quantize_rows_device_jit`),
        but the jit runs under GSPMD so each device quantizes only its own
        rows. Padded zero rows quantize to (0, mult=0) — the guarded-cosine
        convention."""
        pair = self._i8_pair
        if pair is None or pair[0].shape[0] != self.X.shape[0]:
            from matternet_rs_tpu.core import _quantize_rows_device_jit

            pair = _quantize_rows_device_jit(self.X)
            self._i8_pair = pair
        return pair

    def search_batch(
        self, queries, k: int, alpha: float = 0.7,
        quantized: bool | str = False, candidates: int | None = None,
        recall_target: float = 0.95,
    ):
        """Batched distributed search: fused query-λ preparation (one
        taumode dispatch against the replicated graph) + per-shard batch
        scoring + all-gather merge. Returns ``(indices [B, k],
        scores [B, k])`` with global ids; score-exact vs serial
        :meth:`search` (ids too, except items tied EXACTLY at a shard's
        k-th score when the shard routes tilemax — see PARITY.md).

        ``quantized`` (VERDICT r4 #3 — the single-chip tier ladder on the
        mesh): ``False`` = exact f32; ``"int8_rescored"`` /
        ``"bf16x3_rescored"`` / ``"int8"`` = per-shard reduced-precision
        scan + per-shard EXACT rescore of the top-``candidates``
        (per-shard width, default ``max(4k, 32)``) + all-gather merge of
        the exact scores — returned scores are parity-grade, the only
        approximation is per-shard candidate recall (≥ the single-chip
        tier's at equal ``candidates``: the global pool is D× wider).
        ``"int8_auto"`` applies the measured batch-size crossover and
        ``"auto"`` additionally routes on ``recall_target``
        (core.search_batch semantics). The dominated ``bf16_rescored``
        rung and the bare bf16-scan ``True`` are deliberately NOT
        offered here."""
        from matternet_rs_tpu.parallel.search import (
            make_sharded_search_batch,
            make_sharded_search_batch_quantized,
        )

        Q = jnp.asarray(queries, jnp.float32)
        if Q.ndim == 1:
            Q = Q[None, :]
        # λ-prep projects for the λ computation ONLY — the sharded corpus
        # stays in the original dimension, so scoring uses the original
        # queries (same routing as serial search()/prepare_query_lambda,
        # which shares this exact helper).
        q_lams = self.prepare_query_lambdas_batch(Q)
        if quantized is False:
            key = ("batch", k)
            if key not in self._search_cache:
                self._search_cache[key] = make_sharded_search_batch(
                    self.mesh, self.n_items, k
                )
            idx, sc = self._search_cache[key](
                self.X, self.norms, self.lambdas, Q, q_lams,
                jnp.float32(alpha),
            )
            return np.asarray(idx), np.asarray(sc)

        sharded_tiers = ("auto", "int8", "int8_auto", "int8_rescored",
                         "bf16x3_rescored")
        if quantized not in sharded_tiers:
            raise ValueError(
                f"sharded quantized tier {quantized!r} not supported: "
                f"expected False or one of {sorted(sharded_tiers)} "
                "(bf16_rescored is dominated by int8_rescored — see "
                "core.search_batch — and is not offered on the mesh)"
            )
        b = Q.shape[0]
        # Pad the batch to a power of two, floored at 8 (shared compiled
        # programs across serving batch sizes; the fused maxima-first
        # producer requires b % 8 == 0 — a bare pow-2 pad of a 2-4 query
        # batch would silently lose the fused path to the pool-cut
        # fallback).
        b_pad = max(8, 1 << max(b - 1, 1).bit_length())
        if b_pad != b:
            Q = jnp.pad(Q, ((0, b_pad - b), (0, 0)))
            q_lams = jnp.pad(jnp.asarray(q_lams), (0, b_pad - b))
        if quantized == "auto":
            # Same recall-target-aware routing as core.search_batch: the
            # fastest tier whose measured recall meets the target.
            if recall_target > 0.9875:
                quantized = "bf16x3_rescored"
            elif recall_target > 0.875 or b_pad >= 1024:
                quantized = "int8"
            else:
                quantized = "int8_rescored"
        elif quantized == "int8_auto":
            quantized = "int8" if b_pad >= 1024 else "int8_rescored"
        n_local = int(self.X.shape[0]) // int(self.mesh.devices.size)
        c = candidates if candidates is not None else max(4 * k, 32)
        c = max(min(c, n_local), min(k, n_local))
        cc = min(1 << (c - 1).bit_length(), n_local)
        key = ("batchq", quantized, k, cc)
        if key not in self._search_cache:
            self._search_cache[key] = make_sharded_search_batch_quantized(
                self.mesh, self.n_items, k, cc, quantized
            )
        a = jnp.asarray(alpha, jnp.float32)
        if quantized in ("int8", "int8_rescored"):
            X8, mult = self._ensure_int8()
            idx, sc = self._search_cache[key](
                self.X, X8, mult, self.norms, self.lambdas, Q, q_lams, a
            )
        else:
            idx, sc = self._search_cache[key](
                self.X, self.norms, self.lambdas, Q, q_lams, a
            )
        idx, sc = jax.device_get((idx, sc))
        return idx[:b], sc[:b]

    def spectral_embedding(
        self, k_eig: int, params=None, iters: int = 100, reverse_k=None,
        seed: int = 0,
    ):
        """Distributed spectral embedding of the sharded items: ring-kNN
        item graph (``parallel/knn_graph``) + distributed LOBPCG. Returns
        ``(eigenvalues [k_eig], vectors [n_items, k_eig])`` — the
        mesh-scale version of the eigenmaps embedding the BASELINE SIFT1M
        row measures."""
        from matternet_rs_tpu.parallel.knn_graph import (
            distributed_knn_ell_laplacian,
            distributed_lobpcg,
        )

        params = params or self.gl.graph_params
        ell = distributed_knn_ell_laplacian(
            self.mesh, self.X, self.n_items, params, reverse_k=reverse_k
        )
        return distributed_lobpcg(self.mesh, ell, k_eig, iters=iters, seed=seed)

    def search_hybrid(
        self, query, k: int, alpha: float = 0.7,
        query_lambda: float | None = None,
    ) -> list[tuple[int, float]]:
        """Distributed hybrid search (λ-top-k ∪ high-cosine ∪ global
        semantic top, core.rs:1197-1323) — exact vs the serial hybrid."""
        from matternet_rs_tpu.parallel.search import make_sharded_hybrid_search

        if query_lambda is None:
            query_lambda = self.prepare_query_lambda(query)
        key = ("hybrid", k)
        if key not in self._search_cache:
            self._search_cache[key] = make_sharded_hybrid_search(
                self.mesh, self.n_items, k
            )
        idx, sc = self._search_cache[key](
            self.X, self.norms, self.lambdas,
            jnp.asarray(query, jnp.float32), jnp.float32(query_lambda),
            jnp.float32(alpha),
        )
        return [
            (int(i), float(s))
            for i, s in zip(np.asarray(idx), np.asarray(sc))
            if np.isfinite(s)
        ]

    def range_search(self, query, eps: float, query_lambda: float | None = None):
        """Distributed λ-range search (``λq - λi ≤ eps``, signed —
        core.rs:1389-1424). The signed distances and the match compaction
        compute sharded under GSPMD; only one scalar (the match count) and
        the ``[count]`` matches come to the host — never an N-sized array.
        """
        if query_lambda is None:
            query_lambda = self.prepare_query_lambda(query)
        from matternet_rs_tpu.ops.search import range_search_mask

        dist, mask = range_search_mask(
            self.lambdas, jnp.float32(query_lambda), jnp.float32(eps)
        )
        mask = mask & (jnp.arange(self.X.shape[0]) < self.n_items)
        count = int(jnp.sum(mask))
        if count == 0:
            return []
        (idx,) = jnp.nonzero(mask, size=count)
        ids = np.asarray(idx)
        dists = np.asarray(dist[idx])
        return [(int(i), float(d)) for i, d in zip(ids, dists)]

    def search_energy(
        self, query, k: int, query_lambda: float | None = None
    ) -> list[tuple[int, float]]:
        """Distributed pure-λ-distance search (ascending; energy query
        semantics, energymaps.rs:628-674)."""
        from matternet_rs_tpu.parallel.search import make_sharded_energy_search

        if query_lambda is None:
            query_lambda = self.prepare_query_lambda(query)
        key = ("energy", k)
        if key not in self._search_cache:
            self._search_cache[key] = make_sharded_energy_search(
                self.mesh, self.n_items, k
            )
        fn = self._search_cache[key]
        idx, sc = fn(
            self.X, self.norms, self.lambdas,
            jnp.asarray(query, jnp.float32), jnp.float32(query_lambda),
        )
        return [
            (int(i), float(s))
            for i, s in zip(np.asarray(idx), np.asarray(sc))
            if np.isfinite(s)
        ]

    # ------------------------------------------------------------------
    # Persistence through the streaming-index on-disk format
    # (index/streaming.py): ONE directory serves distributed resume
    # (load_from_store), single-chip out-of-core search
    # (StreamingIndex.load), and the CLI.
    # ------------------------------------------------------------------
    def to_store(self, directory) -> None:
        """Write this index to a shard store. Streams one device block at
        a time — nothing N-sized materializes on the host."""
        from pathlib import Path

        from matternet_rs_tpu.index.streaming import (
            LAMBDA_FILE,
            StreamingIndex,
        )
        from matternet_rs_tpu.storage import shards as shard_store

        directory = Path(directory)
        # Scrub a stale sketch pair from a previous index in this
        # directory BEFORE writing the new corpus — sketch builds trust an
        # existing sketch.bin/meta without validation, so a crash after
        # write_shards but before the scrub would pair the NEW corpus with
        # the OLD corpus's sketch and silently serve wrong int8 scans (the
        # streaming fresh-build path orders its scrub the same way).
        from matternet_rs_tpu.index.streaming import (
            SKETCH_FILE,
            SKETCH_META_FILE,
        )

        (directory / SKETCH_FILE).unlink(missing_ok=True)
        (directory / SKETCH_META_FILE).unlink(missing_ok=True)
        shard_store.write_shards(
            _device_blocks(self.X, self.n_items), directory
        )
        # Streaming stores RAW λ + stats; reconstruct raw from the
        # normalized values (exact except values clipped at the bounds,
        # which land back on the bounds).
        with open(directory / LAMBDA_FILE, "wb") as fh:
            for lam in _device_blocks(self.lambdas, self.n_items):
                raw = self.min_lambdas + lam.astype(np.float64) * self.range_lambdas
                fh.write(raw.astype(np.float32).tobytes())
        si = StreamingIndex(
            directory=directory,
            gl=GraphLaplacian(
                matrix=jnp.asarray(np.asarray(self.gl.matrix)),
                init_data=self.gl.init_data,
                nnodes=self.gl.nnodes,
                graph_params=self.gl.graph_params,
            ),
            taumode=self.taumode,
            min_lambdas=self.min_lambdas,
            range_lambdas=self.range_lambdas,
            n_items=self.n_items,
            n_features=int(self.X.shape[1]),
            sub_centroids=(
                None if self.sub_centroids is None
                else np.asarray(self.sub_centroids)
            ),
            subcentroid_lambdas=self.subcentroid_lambdas,
            projection=self.projection,
        )
        si._save_meta()

    @classmethod
    def load_from_store(
        cls, directory, n_devices: int | None = None, mesh=None,
    ) -> "ShardedArrowSpace":
        """Resume a persisted index mesh-sharded — no recompute. The same
        directory also serves ``StreamingIndex.load`` for single-chip
        out-of-core search."""
        from pathlib import Path

        from matternet_rs_tpu.index.streaming import LAMBDA_FILE, StreamingIndex
        from matternet_rs_tpu.storage import shards as shard_store

        if mesh is None:
            mesh = make_mesh(n_devices)
        si = StreamingIndex.load(directory)
        Xs, n = shard_store.shard_items_from_store(mesh, directory)
        raw = np.fromfile(Path(directory) / LAMBDA_FILE, np.float32)
        lam = np.clip(
            (raw.astype(np.float64) - si.min_lambdas) / si.range_lambdas,
            0.0, 1.0,
        ).astype(np.float32)
        norms = jnp.sqrt(jnp.sum(Xs * Xs, axis=-1))
        return cls(
            mesh=mesh,
            X=Xs,
            norms=norms,
            lambdas=shard_items(mesh, jnp.asarray(lam)),
            gl=GraphLaplacian(
                matrix=replicate(mesh, si.gl.matrix),
                init_data=replicate(mesh, si.gl.init_data),
                nnodes=si.gl.nnodes,
                graph_params=si.gl.graph_params,
            ),
            n_items=n,
            taumode=si.taumode,
            min_lambdas=si.min_lambdas,
            range_lambdas=si.range_lambdas,
            sub_centroids=(
                None if si.sub_centroids is None
                else jnp.asarray(si.sub_centroids)
            ),
            subcentroid_lambdas=si.subcentroid_lambdas,
            projection=si.projection,
        )


def _device_blocks(arr, n_items: int):
    """Yield a sharded array's rows in global order, host-resident one
    device block at a time, trimmed to ``n_items``. Single-controller
    only: addressable shards must cover every row — in a multi-process
    mesh each process sees only its local shards, and silently writing
    them would persist a truncated store (the manifest records whatever
    was emitted, so nothing downstream would ever error)."""
    shards = sorted(
        arr.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    emitted = 0
    for s in shards:
        block = np.asarray(s.data)
        take = min(len(block), n_items - emitted)
        if take <= 0:
            break
        emitted += take
        yield block[:take]
    if emitted < n_items:
        raise RuntimeError(
            f"to_store covers {emitted}/{n_items} rows — this process's "
            "addressable shards do not span the corpus (multi-controller "
            "mesh?). Persist from a single-controller mesh, or gather "
            "per-process stores and merge them explicitly."
        )
