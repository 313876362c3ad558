"""Energy pipeline: cosine-free λ-distance index.

Run: python examples/02_energy_pipeline.py
"""
import numpy as np


def main():
    from matternet_rs_tpu import ArrowSpaceBuilder, energymaps
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    X = make_energy_test_dataset(1000, 48, seed=2).astype(np.float32)
    builder = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 5)
        .with_cluster_params(max_clusters=24, radius=20.0)
        .with_dims_reduction(True)
        .with_sparsity_check(False)
        .with_seed(7)
    )
    aspace, gl = builder.build_energy(X)
    print(f"{aspace.sub_centroids.shape[0]} sub-centroids")

    res = energymaps.search_energy(aspace, X[3], gl, k=5)
    print("energy top-5 (ascending λ-distance):", res)
    idx, dist = energymaps.search_energy_batch(aspace, X[:4], gl, k=5)
    print("batched:", idx[:, 0].tolist())
    # Banded serving: searchsorted window on the sorted-λ index instead of
    # the full corpus read; "auto" sizes the window from the λ-tie
    # structure and falls back to the full scan when banding can't pay.
    bidx, bdist = energymaps.search_energy_batch(
        aspace, X[:4], gl, k=5, candidates="auto"
    )
    print("banded :", bidx[:, 0].tolist(),
          f"(max λ-tie group {aspace.max_lambda_tie_group()})")
    return res


if __name__ == "__main__":
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    main()
