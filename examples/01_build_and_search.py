"""Eigen pipeline: build a λ-aware index and query it.

Run: python examples/01_build_and_search.py
"""
import numpy as np


def main():
    from matternet_rs_tpu import ArrowSpaceBuilder, eigenmaps
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    X = make_energy_test_dataset(2000, 64, seed=1).astype(np.float32)

    builder = (
        ArrowSpaceBuilder()
        .with_lambda_graph(eps=1.0, k=6)
        .with_cluster_params(max_clusters=32, radius=25.0)
        .with_sparsity_check(False)
        .with_seed(42)
    )
    aspace, gl = builder.build(X)

    # Single query (blended cosine + λ-proximity score).
    results = eigenmaps.search(aspace, X[17], gl, k=5, alpha=0.7)
    print("top-5:", results)
    assert results[0][0] == 17

    # Batched serving path: one fused dispatch for the whole batch.
    idx, scores = aspace.search_batch(X[:8], gl, k=5, approx=True)
    print("batched top-1 ids:", idx[:, 0].tolist())
    return results


if __name__ == "__main__":
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    main()
