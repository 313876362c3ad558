"""Mesh sharding + collectives: the scale-out axis of the index.

The reference is single-process (rayon); its parallelism maps to a TPU mesh
as pure data parallelism over the item axis N (SURVEY §2.5): build shards N
across devices (λ scoring is embarrassingly parallel given the replicated
F×F graph), queries do shard-local top-k then an all-gather merge over ICI.
Stage-1 clustering runs as device-local assignment + psum centroid
reduction (parallel/clustering.py), so nothing N-sized ever lives on one
host.
"""

from matternet_rs_tpu.parallel.clustering import distributed_lloyd
from matternet_rs_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    replicate,
    shard_items,
    shard_items_from_blocks,
)
from matternet_rs_tpu.parallel.search import (
    make_sharded_energy_search,
    sharded_search_lambda_aware,
    sharded_taumode_lambdas,
)
from matternet_rs_tpu.parallel.sketch import ShardedSketch

__all__ = [
    "ShardedSketch",
    "distributed_lloyd",
    "make_mesh",
    "make_mesh_2d",
    "make_sharded_energy_search",
    "replicate",
    "shard_items",
    "shard_items_from_blocks",
    "sharded_search_lambda_aware",
    "sharded_taumode_lambdas",
]
