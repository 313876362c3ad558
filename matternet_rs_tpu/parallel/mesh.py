"""Device mesh construction and sharding helpers.

One mesh axis ``"data"`` shards the item axis N (pure DP — the graph is
feature-scale and replicated). Multi-slice meshes would add a second axis
riding DCN; the collectives below only ever cross ICI within a slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over ``n_devices`` (default: all available)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def make_mesh_2d(
    n_slices: int, per_slice: int | None = None, devices=None
) -> Mesh:
    """2-D mesh ``("slice", "data")`` for multi-slice deployments.

    The ``data`` axis rides ICI within a slice (all-gather top-k merges,
    psum'd λ stats); the ``slice`` axis crosses DCN and should only carry
    the final k-candidate merge (k·D_slice values per query — tiny). This
    is the Deep1B-shard stretch topology from BASELINE.json.
    """
    if devices is None:
        devices = jax.devices()
    if per_slice is None:
        per_slice = len(devices) // n_slices
    need = n_slices * per_slice
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(n_slices, per_slice)
    return Mesh(arr, ("slice", DATA_AXIS))


def shard_items(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Shard a ``[N, ...]`` array over the item axis (pads N to a multiple of
    the mesh size with zero rows — padded rows score -inf in search).

    On a 1-D mesh this shards over ``data``; on a 2-D multi-slice mesh the
    item axis shards over (slice, data) jointly so each device owns one
    contiguous global block.
    """
    n = x.shape[0]
    d = mesh.devices.size
    pad = (-n) % d
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    axes = tuple(mesh.axis_names)
    first = axes[0] if len(axes) == 1 else axes
    spec = P(first, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_items_from_blocks(mesh: Mesh, blocks) -> jax.Array:
    """Assemble a mesh-sharded ``[N_pad, F]`` array from per-shard host
    blocks WITHOUT ever concatenating them into one host array.

    Each device receives exactly its slice of the global array
    (``jax.device_put`` per device + ``make_array_from_single_device_
    arrays``); the largest host-side temporary is one device block. This is
    what lets the distributed build ingest datasets larger than one host's
    memory (the round-1 ``from_shards`` concatenated everything first —
    VERDICT missing #2).
    """
    blocks = [np.asarray(b, np.float32) for b in blocks]
    if not blocks:
        raise ValueError("need at least one shard")
    f = blocks[0].shape[1]
    for b in blocks:
        if b.ndim != 2 or b.shape[1] != f:
            raise ValueError("all shards must be [n_i, F] with equal F")
    n = sum(b.shape[0] for b in blocks)
    d = mesh.devices.size
    n_pad = n + ((-n) % d)
    per_dev = n_pad // d

    # Global row offsets of each input block.
    starts = np.cumsum([0] + [b.shape[0] for b in blocks])

    def rows(lo: int, hi: int) -> np.ndarray:
        """Rows [lo, hi) of the (virtual) global array, zero-padded past n."""
        pieces = []
        for bi, b in enumerate(blocks):
            b_lo, b_hi = starts[bi], starts[bi + 1]
            s, e = max(lo, b_lo), min(hi, b_hi)
            if s < e:
                pieces.append(b[s - b_lo : e - b_lo])
        got = sum(p.shape[0] for p in pieces)
        if got < hi - lo:
            pieces.append(np.zeros((hi - lo - got, f), np.float32))
        return pieces[0] if len(pieces) == 1 else np.concatenate(pieces, axis=0)

    axes = tuple(mesh.axis_names)
    first = axes[0] if len(axes) == 1 else axes
    sharding = NamedSharding(mesh, P(first, *([None])))
    # Device order for a joint dim-0 sharding is row-major over the mesh
    # array — exactly ``mesh.devices.flatten()``; confirm via the sharding's
    # own index map and place each block on its device.
    dev_indices = sharding.addressable_devices_indices_map((n_pad, f))
    arrays = []
    for dev, idx in dev_indices.items():
        sl = idx[0]
        lo = 0 if sl.start is None else sl.start
        hi = n_pad if sl.stop is None else sl.stop
        arrays.append(jax.device_put(rows(lo, hi), dev))
    assert all(a.shape == (per_dev, f) for a in arrays)
    return jax.make_array_from_single_device_arrays((n_pad, f), sharding, arrays)


def replicate(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Replicate an array (graphs, queries, λ stats) across the mesh."""
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))


def pad_to_mesh(n: int, mesh: Mesh) -> int:
    d = mesh.devices.size
    return n + ((-n) % d)


def flat_axis_index(axes):
    """Linearized device position along (possibly joint) mesh axes — shared
    by every shard_map body that converts local to global row ids."""
    if isinstance(axes, str):
        return jax.lax.axis_index(axes)
    idx = jax.lax.axis_index(axes[0])
    for a in axes[1:]:
        idx = idx * jax.lax.axis_size(a) + jax.lax.axis_index(a)
    return idx
