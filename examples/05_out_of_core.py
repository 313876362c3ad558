"""Out-of-core index: corpus on disk, exact search streams blocks through
one chip. Crash-resumable build.

Run: python examples/05_out_of_core.py
"""
import tempfile

import numpy as np


def main():
    from matternet_rs_tpu.graph import GraphParams
    from matternet_rs_tpu.index.streaming import StreamingIndex
    from matternet_rs_tpu.storage import shards
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    X = make_energy_test_dataset(5000, 32, seed=4).astype(np.float32)
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)

    with tempfile.TemporaryDirectory() as store:
        shards.write_shards(X, store, rows_per_shard=1024)
        si = StreamingIndex.build_from_store(
            store, params, max_clusters=24, radius=25.0, block_rows=1024,
        )
        print("top-5:", si.search(X[11], k=5))
        # Reload without recompute; bf16 blocks halve the upload bytes.
        si2 = StreamingIndex.load(store)
        print("resumed top-1:", si2.search(X[11], k=1, quantized=True))

        # Serving path: device-resident int8 sketch (one upload, scans at
        # HBM speed) + exact disk rescore; refine=False skips the rescore
        # for pure-sketch latency.
        si2.build_sketch(persist=False)
        print("sketch top-3:", si2.search_sketch(X[11], k=3))
        print("sketch-only top-3:", si2.search_sketch(X[11], k=3, refine=False))

        # Sketch bigger than one chip's HBM? Shard it over the mesh —
        # same scan core, all-gather merge, identical results.
        import jax

        if len(jax.devices()) >= 2:
            from matternet_rs_tpu.parallel import ShardedSketch, make_mesh

            sk = ShardedSketch(si2, make_mesh(len(jax.devices())))
            print("mesh-sharded top-3:", sk.search(X[11], k=3))
        return True


if __name__ == "__main__":
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    main()
