"""Surfface staged pipeline A→B0→B1→B2→C→D (clustering → preflight → MST →
Kalman RTS → Bhattacharyya Laplacian → spectral λ).

Run: python examples/03_staged_pipeline.py
"""
import numpy as np


def main():
    from matternet_rs_tpu import pipeline
    from matternet_rs_tpu.utils.fixtures import make_gaussian_blob

    X = make_gaussian_blob(800, 0.5).astype(np.float32)
    result = pipeline.build(X)
    print("stage timings:", {k: round(v, 3) for k, v in result.timings.items()})
    print(f"centroids: {result.state.means.shape}, "
          f"MST trunk length: {len(result.mst.trunk_nodes)}, "
          f"tau: {result.tau:.4f}")
    assert result.lambdas.shape == (800,)
    return result


if __name__ == "__main__":
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    main()
