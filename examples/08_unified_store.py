"""One on-disk index, three consumers: distributed resume, single-chip
out-of-core search, and the CLI — all from the same directory.

Run: python examples/08_unified_store.py
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import tempfile

import numpy as np


def main():
    import jax

    if jax.device_count() < 8:
        jax.config.update("jax_platforms", "cpu")

    from matternet_rs_tpu.graph import GraphParams
    from matternet_rs_tpu.index.streaming import StreamingIndex
    from matternet_rs_tpu.parallel import make_mesh
    from matternet_rs_tpu.parallel.index import ShardedArrowSpace
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    X = make_energy_test_dataset(3000, 24, seed=8).astype(np.float32)
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)

    with tempfile.TemporaryDirectory() as store:
        # Build on the mesh, persist once.
        sa = ShardedArrowSpace.distributed_build(
            [X[:1200], X[1200:]], params, k_clusters=16, mesh=make_mesh(8)
        )
        sa.to_store(store)
        print("persisted:", sorted(os.listdir(store))[:4], "...")

        # Consumer 1: distributed resume (no recompute).
        sa2 = ShardedArrowSpace.load_from_store(store, mesh=make_mesh(8))
        r1 = sa2.search(X[5], k=3)

        # Consumer 2: single-chip out-of-core (corpus stays on disk).
        si = StreamingIndex.load(store)
        r2 = si.search(X[5], k=3)

        print("distributed:", r1)
        print("streamed:   ", r2)
        assert [i for i, _ in r1] == [i for i, _ in r2]
        return r1


if __name__ == "__main__":
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    main()
