"""Large feature dimensions: the direct-ELL graph path (F >= 8192).

Beyond ``DIRECT_ELL_N`` graph nodes, ``build_laplacian_matrix`` switches to
a construction that never materializes the [F, F] matrix: tiled exact kNN
(one [row_tile, F] distance strip at a time) feeding a fixed-degree ELL
Laplacian. λ scoring and the eigensolver consume the ELL form directly.

Run: python examples/09_large_features.py
(demonstrated here at a forced-small threshold so it runs in seconds; the
production route engages automatically at F >= 8192)
"""
import numpy as np


def main():
    import jax.numpy as jnp

    from matternet_rs_tpu.graph import GraphParams
    from matternet_rs_tpu.ops import laplacian as lap_ops
    from matternet_rs_tpu.ops import taumode as tm_ops
    from matternet_rs_tpu.ops.eigensolver import lobpcg_smallest

    rng = np.random.default_rng(0)
    F, C, N = 2048, 96, 4000          # F plays the "huge" role
    centroids = rng.normal(size=(C, F)).astype(np.float32)
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)

    # Direct ELL build over the feature profiles (graph nodes = features).
    gl = lap_ops.build_laplacian_ell(centroids.T, params, n_items=N)
    assert gl.is_ell_backed
    e = gl.ell()
    ell_mb = (e.indices.size + e.weights.size + e.diag.size) * 4 / 1e6
    print(f"graph: {gl.shape}, ELL memory {ell_mb:.1f} MB "
          f"(dense would be {F * F * 4 / 1e6:.0f} MB)")

    # λ scoring consumes the ELL operator directly.
    X = rng.normal(size=(256, F)).astype(np.float32)
    lam = tm_ops.taumode_lambdas_auto(jnp.asarray(X), e, tm_ops.TAU_MEDIAN)
    lam = np.asarray(lam)
    assert lam.shape == (256,) and np.all(np.isfinite(lam))
    print("λ[:4] =", np.round(lam[:4], 5))

    # Spectral embedding through the same sparse operator (no dense L).
    vals, vecs = lobpcg_smallest(e, k=4, iters=40)
    print("smallest eigenvalues:", np.round(vals, 5))
    assert vecs.shape == (F, 4)

    print("ok")
    return vals


if __name__ == "__main__":
    main()
