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


def replicate(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Replicate an array (graphs, queries, λ stats) across the mesh."""
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))


def pad_to_mesh(n: int, mesh: Mesh) -> int:
    d = mesh.devices.size
    return n + ((-n) % d)
