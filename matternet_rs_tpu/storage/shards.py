"""Raw shard store: larger-than-memory ingest for the distributed build.

Datasets at the Deep1B stretch scale (BASELINE.json: 100M × 96-d = 38 GB)
cannot pass through one host array. This module stores the corpus as raw
f32 shard files + a JSON manifest and streams fixed-size row blocks through
the native read-ahead reader (native/shard_reader.cpp — disk IO overlaps
the H2D upload of the previous block), placing each device's block directly
on its device. Host residency is bounded by two blocks regardless of N.

The reference has no data loader (its builder takes a full in-memory Vec —
SURVEY §2.4); this is the mesh-scale ingestion path the rebuild adds.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterable

import numpy as np

MANIFEST = "shards.json"


def write_shards(
    blocks: Iterable[np.ndarray] | np.ndarray, directory, rows_per_shard: int = 262_144,
) -> dict:
    """Write ``[*, F]`` f32 data as raw shard files + manifest.

    ``blocks`` may be one array or an iterable of arrays (a streaming
    producer); rows are repacked into shards of ``rows_per_shard``.
    Returns the manifest dict.
    """
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    if isinstance(blocks, np.ndarray):
        blocks = [blocks]

    shard_rows: list[int] = []
    f_dim: int | None = None
    cur = None        # open file handle state
    cur_rows = 0
    shard_idx = 0

    def open_next():
        nonlocal cur, cur_rows, shard_idx
        cur = open(directory / f"shard-{shard_idx:05d}.bin", "wb")
        cur_rows = 0
        shard_idx += 1

    open_next()
    for block in blocks:
        block = np.ascontiguousarray(block, np.float32)
        if block.ndim != 2:
            raise ValueError("blocks must be [n, F]")
        if f_dim is None:
            f_dim = int(block.shape[1])
        elif block.shape[1] != f_dim:
            raise ValueError("inconsistent feature dims across blocks")
        pos = 0
        while pos < len(block):
            take = min(rows_per_shard - cur_rows, len(block) - pos)
            cur.write(block[pos : pos + take].tobytes())
            cur_rows += take
            pos += take
            if cur_rows == rows_per_shard:
                cur.close()
                shard_rows.append(cur_rows)
                open_next()
    cur.close()
    if cur_rows:
        shard_rows.append(cur_rows)
    else:  # drop the empty trailing file
        (directory / f"shard-{shard_idx - 1:05d}.bin").unlink()

    manifest = {
        "n_rows": int(sum(shard_rows)),
        "n_features": int(f_dim or 0),
        "dtype": "float32",
        "shards": [
            {"file": f"shard-{i:05d}.bin", "rows": int(r)}
            for i, r in enumerate(shard_rows)
        ],
    }
    (directory / MANIFEST).write_text(json.dumps(manifest, indent=1))
    return manifest


def read_manifest(directory) -> dict:
    return json.loads((Path(directory) / MANIFEST).read_text())


def stream_blocks(directory, block_rows: int, start_row: int = 0):
    """Iterate ``[block_rows, F]`` f32 blocks across all shards (native
    read-ahead reader; Python memmap fallback). ``start_row`` seeks that
    many rows into the stream without reading them (crash-resume)."""
    from matternet_rs_tpu.native import ShardReader

    directory = Path(directory)
    m = read_manifest(directory)
    paths = [directory / s["file"] for s in m["shards"]]
    return ShardReader(paths, block_rows, m["n_features"], start_row=start_row)


def read_rows(directory, row_ids) -> np.ndarray:
    """Random-access fetch of specific rows by global id (``[len(ids), F]``
    f32, in the order given). Shards are raw fixed-stride f32 records, so
    this is pure seek arithmetic over per-shard memmaps — the candidate
    refinement path of the resident-sketch search
    (index/streaming.py) fetches a few hundred rows this way instead of
    re-streaming the corpus."""
    directory = Path(directory)
    m = read_manifest(directory)
    f = m["n_features"]
    ids = np.asarray(row_ids, np.int64)
    if ids.ndim != 1:
        raise ValueError("row_ids must be 1-D")
    if len(ids) == 0:
        return np.zeros((0, f), np.float32)
    if ids.min() < 0 or ids.max() >= m["n_rows"]:
        raise IndexError(
            f"row id out of range [0, {m['n_rows']}): "
            f"[{ids.min()}, {ids.max()}]"
        )
    starts = np.cumsum([0] + [s["rows"] for s in m["shards"]])
    out = np.empty((len(ids), f), np.float32)
    # One memmap + one gather per shard that actually holds requested rows.
    shard_of = np.searchsorted(starts, ids, side="right") - 1
    for si in np.unique(shard_of):
        sel = shard_of == si
        mm = np.memmap(
            directory / m["shards"][si]["file"], np.float32, "r"
        ).reshape(-1, f)
        out[sel] = mm[ids[sel] - starts[si]]
    return out


def shard_items_from_store(mesh, directory):
    """Assemble the mesh-sharded ``[N_pad, F]`` array by streaming exactly
    one block per device from disk — never more than two blocks on the
    host (the streaming analogue of
    :func:`matternet_rs_tpu.parallel.mesh.shard_items_from_blocks`)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    m = read_manifest(directory)
    n, f = m["n_rows"], m["n_features"]
    d = mesh.devices.size
    n_pad = n + ((-n) % d)
    per_dev = n_pad // d

    axes = tuple(mesh.axis_names)
    first = axes[0] if len(axes) == 1 else axes
    sharding = NamedSharding(mesh, P(first, None))
    dev_indices = sharding.addressable_devices_indices_map((n_pad, f))
    # Order devices by their global row range so streamed blocks line up.
    ordered = sorted(
        dev_indices.items(), key=lambda kv: kv[1][0].start or 0
    )

    arrays = []
    for dev, idx in ordered:
        # Each device reads ITS OWN global row slice (seek-arithmetic open,
        # skipped files never touched). A single sequential reader from
        # row 0 would be wrong on multi-process meshes: every non-zero
        # process would feed its devices the STORE'S leading rows instead
        # of their own ranges.
        start = idx[0].start or 0
        take = max(0, min(per_dev, n - start))
        if take:
            reader = stream_blocks(directory, per_dev, start_row=start)
            try:
                block = next(reader)[:take]
            except StopIteration:
                block = np.zeros((0, f), np.float32)
            finally:
                reader.close()
        else:
            block = np.zeros((0, f), np.float32)
        if block.shape[0] < per_dev:     # zero-pad the tail device
            block = np.concatenate(
                [block, np.zeros((per_dev - block.shape[0], f), np.float32)]
            )
        arrays.append(jax.device_put(block, dev))
    return jax.make_array_from_single_device_arrays((n_pad, f), sharding, arrays), n


def distributed_build_from_store(
    directory, graph_params, k_clusters: int, taumode=None,
    n_devices: int | None = None, mesh=None, lloyd_iters: int = 10,
    centroids: str = "serial", radius: float = 25.0,
    centroid_sample: int | None = None, sample_block_rows: int = 65536,
):
    """Fully distributed build streamed from the shard store.

    ``centroids`` selects the stage-1 semantics, mirroring
    ``ShardedArrowSpace.distributed_build`` (same defaults, so the two
    builds are λ- and ranking-identical on the same data):

    * ``"serial"`` (default) — the serial builder's radius-gated
      incremental scan (clustering.rs:574-932 semantics, native C++
      fast path) over the first ``centroid_sample`` rows streamed
      host-side in store order (default: all rows — identical to the
      serial builder's visit order, exact ranking parity). The sample
      is materialized on the host for stage 1 only; for stores far
      beyond host RAM, bound it with ``centroid_sample`` or use
      ``"lloyd"``.
    * ``"lloyd"`` — psum-reduced Lloyd over the mesh-sharded items;
      nothing N-sized ever exists on one host (the scale escape, at
      the cost of centroid divergence from the serial builder).
    """
    from matternet_rs_tpu.core import TAUDEFAULT
    from matternet_rs_tpu.graph import GraphLaplacian
    from matternet_rs_tpu.ops import laplacian as lap_ops
    from matternet_rs_tpu.parallel.index import (
        ShardedArrowSpace,
        _normalize_sharded_lambdas,
    )
    from matternet_rs_tpu.parallel.mesh import make_mesh, replicate
    from matternet_rs_tpu.parallel.search import sharded_taumode_lambdas

    import jax.numpy as jnp

    taumode = taumode or TAUDEFAULT
    if mesh is None:
        mesh = make_mesh(n_devices)
    Xs, n = shard_items_from_store(mesh, directory)

    if centroids == "serial":
        from matternet_rs_tpu.clustering import incremental_clustering

        budget = n if centroid_sample is None else min(centroid_sample, n)
        if budget <= 0:
            raise ValueError(
                "centroids='serial' needs at least one sample row: "
                f"centroid_sample={centroid_sample!r} over {n} items"
            )
        parts, got = [], 0
        reader = stream_blocks(directory, sample_block_rows)
        try:
            for blk in reader:
                if got >= budget:
                    break
                take = blk[: budget - got]
                parts.append(np.array(take, np.float32))
                got += len(take)
        finally:
            reader.close()
        sample = parts[0] if len(parts) == 1 else np.concatenate(parts)
        out = incremental_clustering(
            sample, max_clusters=k_clusters, radius=radius
        )
        cents = out.centroids
    elif centroids == "lloyd":
        from matternet_rs_tpu.parallel.clustering import distributed_lloyd

        cents, counts, _ = distributed_lloyd(
            mesh, Xs, n, k_clusters, iters=lloyd_iters
        )
        cents = cents[counts > 0]
    else:
        raise ValueError(
            f"centroids must be 'lloyd' or 'serial', got {centroids!r}"
        )
    gl = lap_ops.build_laplacian_from_k_cluster(
        jnp.asarray(cents), graph_params, n_items=n
    )
    Ls = replicate(mesh, gl.matrix)
    raw = sharded_taumode_lambdas(mesh, Xs, Ls, taumode.mode, taumode.param)
    lam_norm, mn, rng = _normalize_sharded_lambdas(mesh, raw, n)
    norms = jnp.sqrt(jnp.sum(Xs * Xs, axis=-1))
    return ShardedArrowSpace(
        mesh=mesh, X=Xs, norms=norms, lambdas=lam_norm,
        gl=GraphLaplacian(
            matrix=Ls, init_data=replicate(mesh, gl.init_data), nnodes=n,
            graph_params=gl.graph_params, energy=gl.energy,
        ),
        n_items=n, taumode=taumode, min_lambdas=mn, range_lambdas=rng,
    )
