"""Mesh sharding + collectives: the scale-out axis of the index.

The reference is single-process (rayon); its parallelism maps to a TPU mesh
as pure data parallelism over the item axis N (SURVEY §2.5): build shards N
across devices (λ scoring is embarrassingly parallel given the replicated
F×F graph), queries do shard-local top-k then an all-gather merge over ICI.
"""

from matternet_rs_tpu.parallel.mesh import make_mesh, shard_items, replicate
from matternet_rs_tpu.parallel.search import (
    sharded_search_lambda_aware,
    sharded_taumode_lambdas,
)

__all__ = [
    "make_mesh",
    "shard_items",
    "replicate",
    "sharded_search_lambda_aware",
    "sharded_taumode_lambdas",
]
