"""Tiled top-k nearest-neighbour search on the MXU.

Replaces the reference's CPU fastpair structure (smartcore ``CosinePair``,
``/root/reference/src_legacy/laplacian.rs:205-294``) with what a TPU is
actually fast at: blocked pairwise-distance matmuls with a streaming top-k
merge. No tree, no pointer chasing — a ``[B, F] × [F, N]`` matmul per tile plus
``lax.top_k``, with the query axis chunked via ``lax.map`` so no ``[N, N]``
buffer ever materializes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from matternet_rs_tpu.ops._mm import mm

from matternet_rs_tpu.ops import distance as dist_ops


def knn(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    metric: str = "rect_cosine",
    query_chunk: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    """Top-k nearest corpus rows per query: ``(dists [Q,k], idx [Q,k])``."""
    return _knn_jit(queries, corpus, k, metric, min(query_chunk, queries.shape[0]))


@functools.partial(jax.jit, static_argnames=("k", "metric", "query_chunk"))
def _knn_jit(queries, corpus, k, metric, query_chunk):
    n = queries.shape[0]
    pad = (-n) % query_chunk
    if pad:
        queries = jnp.concatenate(
            [queries, jnp.zeros((pad, queries.shape[1]), queries.dtype)], axis=0
        )
    tiles = queries.reshape(-1, query_chunk, queries.shape[1])

    if metric == "rect_cosine":
        corpus_t = dist_ops.normalize_rows(corpus).T

        def tile_fn(q):
            qn = dist_ops.normalize_rows(q)
            d = 1.0 - jnp.maximum(
                mm(qn, corpus_t), 0.0
            )
            neg, idx = jax.lax.top_k(-d, k)
            return -neg, idx
    else:
        corpus_sq = jnp.sum(corpus * corpus, axis=-1)[None, :]
        corpus_t = corpus.T

        def tile_fn(q):
            q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
            d = jnp.maximum(
                q_sq + corpus_sq
                - 2.0 * mm(q, corpus_t),
                0.0,
            )
            if metric == "euclidean":
                d = jnp.sqrt(d)
            neg, idx = jax.lax.top_k(-d, k)
            return -neg, idx

    dists, idx = jax.lax.map(tile_fn, tiles)
    dists = dists.reshape(-1, k)[:n]
    idx = idx.reshape(-1, k)[:n]
    return dists, idx
