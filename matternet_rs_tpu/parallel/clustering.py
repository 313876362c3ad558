"""Mesh-sharded clustering: device-local assignment + psum centroid reduction.

Stage-1 of the distributed build (SURVEY §2.5, "absent" row — the reference
is single-process). Items stay sharded over the mesh for the whole
clustering; only the ``[C, F]`` centroid state and ``[C]`` counts cross the
interconnect, via ``psum`` per refinement round. Nothing N-sized ever lands
on one host, so stage 1 scales past single-host memory (the Deep1B stretch
config, BASELINE.json).

Semantics: distributed Lloyd refinement seeded from evenly-spaced global
rows. The reference's *incremental* scan (clustering.rs:574-932) is
order-dependent and host-sequential by construction; at mesh scale the
equivalent regime (same C, same radius discipline) is reached by Lloyd
rounds over all shards — the builder's single-device paths remain available
for bit-faithful legacy semantics.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # JAX ≥ 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _item_spec(mesh) -> P:
    axes = tuple(mesh.axis_names)
    return P(axes[0] if len(axes) == 1 else axes, None)


def distributed_lloyd(
    mesh,
    X_sharded: jax.Array,
    n_items: int,
    k: int,
    iters: int = 10,
    init_centroids: np.ndarray | None = None,
):
    """Lloyd refinement over mesh-sharded items.

    Per round, each device computes assignments of its local rows ([B, C]
    MXU matmul) and partial (sum, count) statistics; a ``psum`` over every
    mesh axis reduces them. Padded rows (global index ≥ n_items) are masked
    out of the statistics.

    Returns ``(centroids [k, F] np, counts [k] np, assignments [N_pad]
    sharded device array)``.
    """
    n_pad, f = X_sharded.shape
    axes = tuple(mesh.axis_names)
    spec = _item_spec(mesh)

    if init_centroids is None:
        # Evenly-spaced global rows; one tiny cross-shard gather.
        idx = jnp.asarray(
            np.linspace(0, n_items - 1, k).round().astype(np.int64)
        )
        init_centroids = jax.jit(
            lambda X, i: jnp.take(X, i, axis=0),
            out_shardings=NamedSharding(mesh, P()),
        )(X_sharded, idx)
    C0 = jnp.asarray(init_centroids, jnp.float32)

    def local_round(Xl, cents, row0):
        gid = row0 + jnp.arange(Xl.shape[0])
        valid = gid < n_items
        d = (
            jnp.sum(Xl * Xl, axis=-1, keepdims=True)
            + jnp.sum(cents * cents, axis=-1)[None, :]
            - 2.0
            * jnp.dot(
                Xl, cents.T,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        )
        a = jnp.argmin(d, axis=1)
        one_hot = jax.nn.one_hot(a, cents.shape[0], dtype=Xl.dtype)
        one_hot = jnp.where(valid[:, None], one_hot, 0.0)
        sums = jnp.dot(
            one_hot.T, Xl,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        # Counts accumulate as int32 scatter-adds: an f32 one-hot sum stops
        # counting exactly past 2^24 members/cluster (Deep1B-scale regime).
        counts = (
            jnp.zeros(cents.shape[0], jnp.int32)
            .at[jnp.where(valid, a, cents.shape[0] - 1)]
            .add(jnp.where(valid, 1, 0))
        )
        for ax in axes:
            sums = jax.lax.psum(sums, ax)
            counts = jax.lax.psum(counts, ax)
        cf = counts.astype(jnp.float32)
        new = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(cf, 1.0)[:, None], cents
        )
        return new, counts, jnp.where(valid, a, -1)

    def shard_fn(Xs, cents):
        # Global row offset of this device's block.
        from matternet_rs_tpu.parallel.mesh import flat_axis_index

        row0 = flat_axis_index(axes if len(axes) > 1 else axes[0]) * Xs.shape[0]

        def body(carry, _):
            cents, _, _ = carry
            new, counts, a = local_round(Xs, cents, row0)
            return (new, counts, a), None

        init = (
            cents,
            jnp.zeros(cents.shape[0], jnp.int32),
            jnp.zeros(Xs.shape[0], jnp.int32) - 1,
        )
        (cents, counts, a), _ = jax.lax.scan(body, init, None, length=iters)
        return cents, counts, a

    a_spec = P(axes[0]) if len(axes) == 1 else P(axes)
    mapped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec, P()),
        out_specs=(P(), P(), a_spec),
        check_vma=False,
    )
    cents, counts, assignments = jax.jit(mapped)(X_sharded, C0)
    return np.asarray(cents), np.asarray(counts), assignments
