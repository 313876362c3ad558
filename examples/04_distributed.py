"""Distributed build + search over a device mesh (run on CPU with 8
virtual devices; the same code scales to a TPU pod slice).

Run: python examples/04_distributed.py
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np


def main():
    import jax

    if jax.device_count() < 8:
        jax.config.update("jax_platforms", "cpu")

    from matternet_rs_tpu.graph import GraphParams
    from matternet_rs_tpu.parallel import make_mesh
    from matternet_rs_tpu.parallel.index import ShardedArrowSpace
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    X = make_energy_test_dataset(4000, 32, seed=3).astype(np.float32)
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)

    # Per-host shards never concatenate; clustering is psum-reduced Lloyd.
    sa = ShardedArrowSpace.distributed_build(
        [X[:1500], X[1500:]], params, k_clusters=16, mesh=make_mesh(8)
    )
    print("serial:", sa.search(X[5], k=5)[:3])
    idx, _ = sa.search_batch(X[:4], k=5)
    print("batched top-1:", idx[:, 0].tolist())

    # Mesh-scale spectral embedding (ring-kNN graph + distributed LOBPCG).
    vals, vecs = sa.spectral_embedding(4, iters=60)
    print("smallest eigenvalues:", np.round(vals, 5).tolist())
    return sa


if __name__ == "__main__":
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    main()
