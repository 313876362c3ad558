"""Mesh-sharded resident-sketch serving — the beyond-one-chip corpus axis.

The single-chip sketch path (``index/streaming.py``) holds N·(F+8) bytes of
int8 sketch in HBM: 1.0 GB at 10M×96, 10.4 GB at the Deep1B-stretch
100M×96. At the FULL Deep1B scale (1B×96) the sketch is 104 GB — it fits
only ACROSS a mesh. :class:`ShardedSketch` shards the stacked
``[nb, blk, F]`` int8 block axis over the mesh (each chip holds
``nb/D`` blocks ≈ N·(F+8)/D bytes), scans locally with the exact same
running top-C carry as the single-chip scan
(:func:`index.streaming.scan_sketch_blocks` — one implementation, shared),
and merges per-device candidates with one ``all_gather`` of ``[B, C]``
ids+scores over ICI followed by the deterministic (score desc, id asc)
re-rank used by every merge in ``parallel/search.py``. The exact disk
rescore stays host-side and unchanged
(:meth:`index.streaming.StreamingIndex.refine_candidates`).

Scaling shape: per-device scan work and HBM both fall as 1/D while the
merge carries only D·C candidates per query — the same local-topk →
all-gather → re-rank recipe as the in-memory distributed search (SURVEY
§2.5 "index sharding + collective top-k merge"), applied to the
out-of-core serving tier.

Reference provenance: the reference is single-process (SURVEY §5
"Distributed communication backend: none"); this is the mesh-native
extension of its search surface (src_legacy/core.rs:1156-1193 scoring
semantics) to corpora beyond one device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from matternet_rs_tpu.index.streaming import (
    StreamingIndex,
    _alpha_param,
    scan_sketch_blocks,
    suffix_padded,
)

try:  # jax >= 0.4.35
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_sharded_sketch_scan(mesh, kk: int, energy: bool = False,
                             maxfirst: bool = False, kfinal: int = 10):
    """Compile the mesh-sharded sketch scan: every device runs the
    single-chip block scan over its local blocks (global ids via its row
    base), then one ``all_gather`` + deterministic re-rank yields the
    replicated global top-``kk``. ``energy=True`` scans energy-mode
    semantics (negated-ascending convention — see
    :func:`scan_sketch_blocks`; callers flip the sign).

    ``maxfirst=True`` (blend mode only) routes each device's LOCAL scan
    through the maxima-first kernel instead of the block-carry scan
    (``index/streaming._sketch_maxfirst_topk`` — one Pallas slab-maxima
    pass + ring-DMA rescore at sketch precision): the winning side of
    the measured scale crossover at ≥4M rows per device, which is
    precisely the regime this sharded tier exists for (a sketch that
    needs sharding holds ≥10M rows/chip). ``kfinal`` sizes its slab
    budget. Caller guarantees the envelope via
    :meth:`ShardedSketch._maxfirst_ok` (per-device suffix padding,
    tile-divisible local length, F lane alignment, batch %8)."""
    axes = tuple(mesh.axis_names)
    joint = axes if len(axes) > 1 else axes[0]
    if maxfirst and energy:
        raise ValueError("maxfirst scan is blend-mode only")

    def _merge(best_s, best_i):
        all_s = jax.lax.all_gather(best_s, joint)              # [D, B, kk]
        all_i = jax.lax.all_gather(best_i, joint)
        d = all_s.shape[0]
        all_s = jnp.moveaxis(all_s, 0, 1).reshape(-1, d * kk)  # [B, D·kk]
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(-1, d * kk)
        # Deterministic (score desc, id asc) re-rank — identical to the
        # in-memory distributed merge (parallel/search.py): id-sort first,
        # then stable argsort by -score. Invalid slots carry id -1 and
        # score -inf, so they sort last.
        id_order = jnp.argsort(all_i, axis=1)
        all_s = jnp.take_along_axis(all_s, id_order, axis=1)
        all_i = jnp.take_along_axis(all_i, id_order, axis=1)
        sel = jnp.argsort(-all_s, axis=1, stable=True)[:, :kk]
        return (
            jnp.take_along_axis(all_s, sel, axis=1),
            jnp.take_along_axis(all_i, sel, axis=1),
        )

    # Contract: ``lams`` arrives PRE-NORMALIZED to [0, 1] (ShardedSketch
    # normalizes once at allocation), so neither local scan pays an
    # n_local-sized normalization pass per dispatch — the carry scan
    # gets an identity fold (mn=0, rng=1: clip((λ−0)/1) == λ exactly),
    # the maxima-first producer consumes the column directly.
    if maxfirst:
        def local_fn(X8s, mults, lams, valids, base, Q, q_lams, alpha):
            from matternet_rs_tpu.index.streaming import (
                _sketch_maxfirst_topk,
            )

            nb_l, blk, f = X8s.shape
            n_l = nb_l * blk
            b = Q.shape[0]
            a = jnp.broadcast_to(
                jnp.asarray(alpha, jnp.float32).reshape(-1), (b,)
            )
            # Per-device suffix padding (caller-checked): local flat
            # index == global id − base, and rows ≥ Σvalids mask.
            top, idx = _sketch_maxfirst_topk(
                X8s.reshape(n_l, f), mults.reshape(n_l),
                lams.reshape(n_l),
                Q, q_lams, a, rows_out=kk, kfinal=kfinal,
                n_items=jnp.sum(valids),
            )
            gidx = jnp.where(idx >= 0, idx + base[0], -1)
            return _merge(top, gidx)
    else:
        def local_fn(X8s, mults, lams, valids, base, Q, q_lams, alpha):
            best_s, best_i = scan_sketch_blocks(
                X8s, mults, lams, valids, Q, q_lams, alpha,
                jnp.float32(0.0), jnp.float32(1.0), kk,
                base[0], energy=energy,
            )                                                  # [B, kk]
            return _merge(best_s, best_i)

    blk_spec = P(joint)  # leading (block) axis sharded
    mapped = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(joint, None, None), P(joint, None), P(joint, None), blk_spec,
            blk_spec, P(), P(), P(),
        ),
        # After the all_gather every device holds identical candidate
        # sets, so the outputs are replicated by construction.
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


class ShardedSketch:
    """Int8 corpus sketch sharded over a device mesh, serving blended
    top-k out-of-core search for corpora whose sketch exceeds one chip's
    HBM. Wraps a built :class:`StreamingIndex` (disk layout, λ stats,
    query preparation, exact refine) and replaces only the scan tier."""

    def __init__(self, index: StreamingIndex, mesh,
                 sketch_maxfirst: bool | None = None):
        self.index = index
        self.mesh = mesh
        # Local-scan policy: None = AUTO by the measured per-device scale
        # crossover (index/streaming.MAXFIRST_MIN_ROWS); True/False force
        # the maxima-first / block-carry local scan.
        self.sketch_maxfirst = sketch_maxfirst
        d = int(mesh.devices.size)
        # Pad the block count to a device multiple AT ALLOCATION TIME
        # (zero blocks: valid=0 ⇒ every row masks to -inf and the running
        # offset does not advance across them). A post-hoc concatenate
        # would materialize a second full sketch copy — 2× peak host RAM
        # at the 1B×96 / 104 GB target this tier exists for.
        n, blk = index.n_items, index.block_rows
        nb = (n + blk - 1) // blk
        nb_pad = nb + ((-nb) % d)
        X8h, multh, lamh, validh = index.sketch_host_buffers(nb_pad=nb_pad)
        # Normalize the λ column ONCE at allocation (f32, identical ops
        # to the per-dispatch clip((λ−mn)/rng) it replaces): both local
        # scans then run with mn=0, rng=1 — an exact identity fold — so
        # no dispatch ever pays an n_local-sized normalization pass
        # (the maxima-first path used to re-materialize it per batch).
        lamh = np.clip(
            (np.asarray(lamh, np.float32) - np.float32(index.min_lambdas))
            / np.float32(index.range_lambdas), 0.0, 1.0,
        ).astype(np.float32)
        self.blocks_per_device = nb_pad // d
        # Global row base of each device = items in all earlier blocks.
        starts = np.concatenate(
            [[0], np.cumsum(validh.astype(np.int64))]
        )[:-1]
        bases = starts[:: self.blocks_per_device].astype(np.int32)

        axes = tuple(mesh.axis_names)
        joint = axes if len(axes) > 1 else axes[0]
        sh3 = NamedSharding(mesh, P(joint, None, None))
        sh2 = NamedSharding(mesh, P(joint, None))
        sh1 = NamedSharding(mesh, P(joint))
        # device_put with a sharding ships each device exactly its slice.
        # The host still holds ONE dense copy of the sketch (built from
        # the persisted sketch.bin when present, streamed+quantized
        # otherwise) — the pad-at-allocation above keeps it at exactly
        # one copy.
        self._shards = (
            jax.device_put(X8h, sh3),
            jax.device_put(multh, sh2),
            jax.device_put(lamh, sh2),
            jax.device_put(validh, sh1),
            jax.device_put(bases, sh1),
        )
        jax.block_until_ready(self._shards[0])
        self._scan_cache: dict[tuple, callable] = {}
        # Per-DEVICE suffix padding: every device's blocks full except a
        # suffix on the globally-last partial device — the maxima-first
        # local scan's precondition (local flat index == global − base).
        bpd = self.blocks_per_device
        self._suffix_pad = suffix_padded(validh, blk) and all(
            int(bases[i]) == i * bpd * blk for i in range(d)
        )

    @property
    def hbm_bytes_per_device(self) -> int:
        x8, mult, lam, valid, _ = self._shards
        tot = (
            x8.size * 1 + mult.size * 4 + lam.size * 4 + valid.size * 4
        )
        return tot // int(self.mesh.devices.size)

    def _scan(self, kk: int, energy: bool = False, maxfirst: bool = False,
              kfinal: int = 10):
        key = (kk, energy, maxfirst, kfinal if maxfirst else 0)
        fn = self._scan_cache.get(key)
        if fn is None:
            fn = make_sharded_sketch_scan(
                self.mesh, kk, energy=energy, maxfirst=maxfirst,
                kfinal=kfinal,
            )
            self._scan_cache[key] = fn
        return fn

    def _maxfirst_ok(self, b_pad: int, kfinal: int, cand: int) -> bool:
        """Envelope + policy for the maxima-first LOCAL scan — the
        per-device mirror of ``StreamingIndex._sketch_fused_ok``."""
        if self.sketch_maxfirst is False or not self._suffix_pad:
            return False
        from matternet_rs_tpu.index.streaming import MAXFIRST_MIN_ROWS
        from matternet_rs_tpu.ops.search import (
            DEFAULT_TILE,
            fused_rescored_path,
        )

        nb, blk, f = self._shards[0].shape
        n_l = (nb // int(self.mesh.devices.size)) * blk
        if self.sketch_maxfirst is None and n_l < MAXFIRST_MIN_ROWS:
            return False                 # auto: below the crossover
        return n_l % DEFAULT_TILE == 0 and fused_rescored_path(
            n_l, f, b_pad, kfinal, cand
        )

    def search_batch(
        self, queries, k: int, alpha: float = 0.7,
        candidates: int | None = None, refine: bool = True,
    ):
        """Same contract as
        :meth:`StreamingIndex.search_batch_sketch`, with the scan tier
        sharded over the mesh. ``refine=True`` fetches the per-query
        top-``candidates`` from disk and rescores exactly; ``refine=False``
        serves straight from the sharded scan."""
        idx = self.index
        Q = jnp.asarray(queries, jnp.float32)
        if Q.ndim == 1:
            Q = Q[None, :]
        if Q.shape[-1] != idx.n_features:
            raise ValueError(
                f"Query dimension {Q.shape[-1]} doesn't match index "
                f"dimension {idx.n_features}"
            )
        q_lams = idx._query_lambdas(Q)
        kk = min(k, idx.n_items)
        C = min(
            candidates if candidates is not None else max(4 * k, 32),
            idx.n_items, idx.block_rows,
        )
        C = max(C, kk)
        al = _alpha_param(alpha, Q.shape[0])
        mn = jnp.float32(idx.min_lambdas)
        rng = jnp.float32(idx.range_lambdas)

        b = Q.shape[0]
        b_pad = max(8, 1 << max(b - 1, 1).bit_length())
        if self._maxfirst_ok(b_pad, kk, C):
            Qp = Q if b_pad == b else jnp.pad(Q, ((0, b_pad - b), (0, 0)))
            qlp = (
                q_lams if b_pad == b
                else jnp.pad(jnp.asarray(q_lams), (0, b_pad - b))
            )
            a_vec = jnp.broadcast_to(
                jnp.asarray(alpha, jnp.float32).reshape(-1), (b,)
            )
            if b_pad != b:
                a_vec = jnp.pad(a_vec, (0, b_pad - b))
            best_s, best_i = self._scan(C, maxfirst=True, kfinal=kk)(
                *self._shards, Qp, qlp, a_vec
            )
            best_s, best_i = best_s[:b], best_i[:b]
        else:
            best_s, best_i = self._scan(C)(
                *self._shards, Q, q_lams, al
            )
        if not refine:
            return (
                np.asarray(best_i[:, :kk]).astype(np.int64),
                np.asarray(best_s[:, :kk]),
            )
        return idx.refine_candidates(
            np.asarray(best_i), Q, q_lams, al, mn, rng, kk
        )

    def search(
        self, query, k: int, alpha: float = 0.7,
        candidates: int | None = None, refine: bool = True,
    ) -> list[tuple[int, float]]:
        ids, sc = self.search_batch(
            np.asarray(query, np.float32)[None, :], k, alpha,
            candidates=candidates, refine=refine,
        )
        return [
            (int(i), float(s)) for i, s in zip(ids[0], sc[0]) if i >= 0
        ]

    def search_energy_batch(
        self, queries, k: int, candidates: int | None = None,
        refine: bool = True,
    ):
        """Energy-mode search through the sharded sketch (same contract
        as :meth:`StreamingIndex.search_energy_batch_sketch`): ascending
        |Δλ| with the cosine tie-break, λ exact-resident, optional exact
        disk rescore."""
        idx = self.index
        if idx.sub_centroids is None:
            raise ValueError(
                "not an energy-mode index (no sub-centroid state)"
            )
        Q = jnp.asarray(queries, jnp.float32)
        if Q.ndim == 1:
            Q = Q[None, :]
        if Q.shape[-1] != idx.n_features:
            raise ValueError(
                f"Query dimension {Q.shape[-1]} doesn't match index "
                f"dimension {idx.n_features}"
            )
        q_lams = idx._query_lambdas(Q)
        kk = min(k, idx.n_items)
        C = min(
            candidates if candidates is not None else max(4 * k, 32),
            idx.n_items, idx.block_rows,
        )
        C = max(C, kk)
        mn = jnp.float32(idx.min_lambdas)
        rng = jnp.float32(idx.range_lambdas)
        best_s, best_i = self._scan(C, energy=True)(
            *self._shards, Q, q_lams, jnp.float32(0.0)
        )
        if not refine:
            return (
                np.asarray(best_i[:, :kk]).astype(np.int64),
                -np.asarray(best_s[:, :kk]),
            )
        return idx.refine_energy_candidates(
            np.asarray(best_i), Q, q_lams, mn, rng, kk
        )

    def search_energy(
        self, query, k: int, candidates: int | None = None,
        refine: bool = True,
    ) -> list[tuple[int, float]]:
        ids, sc = self.search_energy_batch(
            np.asarray(query, np.float32)[None, :], k,
            candidates=candidates, refine=refine,
        )
        return [
            (int(i), float(s)) for i, s in zip(ids[0], sc[0]) if i >= 0
        ]
