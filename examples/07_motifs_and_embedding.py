"""Graph analytics on a built index: motif detection, SF-GRASS
sparsification, and the LOBPCG spectral embedding.

Run: python examples/07_motifs_and_embedding.py
"""
import numpy as np


def main():
    import jax.numpy as jnp

    from matternet_rs_tpu import motives, sparsification
    from matternet_rs_tpu.graph import GraphParams
    from matternet_rs_tpu.ops import eigensolver as eig
    from matternet_rs_tpu.ops import laplacian as lap_ops
    from matternet_rs_tpu.utils.fixtures import make_gaussian_cliques_multi

    X = make_gaussian_cliques_multi(400, 0.4, 4, 16, seed=5).astype(np.float32)
    params = GraphParams(eps=0.8, k=10, topk=10, sparsity_check=False)
    gl = lap_ops.build_laplacian_matrix(jnp.asarray(X), params)  # item graph

    # Motifs: dense triangle neighborhoods (MXU triangle counting).
    found = motives.spot_motives_eigen(gl, motives.MotiveConfig(max_sets=6))
    print(f"{len(found)} motifs; sizes: {[len(m) for m in found]}")

    # Spectral sparsification (SF-GRASS degree-score filter).
    W = np.asarray(gl.adjacency())
    W_sparse = sparsification.SfGrassSparsifier(0.5).sparsify_adjacency(W)
    print(f"edges {int((W > 0).sum())} -> {int((W_sparse > 0).sum())}")

    # LOBPCG eigenmap embedding (smallest k eigenpairs of L).
    vals, vecs = eig.lobpcg_smallest(gl.matrix, 6, iters=80, seed=0)
    print("smallest eigenvalues:", np.round(np.asarray(vals), 4).tolist())
    assert vecs.shape == (400, 6)
    return found


if __name__ == "__main__":
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    main()
