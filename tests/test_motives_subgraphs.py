"""Motif detection + subgraph + sparsification tests.

Ports behaviours from src_legacy/tests/test_motives.rs,
subgraphs/tests/test_subg_motives.rs, test_subg_centroids.rs, and
test_subg_parallel.rs (determinism)."""

import numpy as np
import pytest

import jax.numpy as jnp

from matternet_rs_tpu import motives as mv
from matternet_rs_tpu import subgraphs as sg
from matternet_rs_tpu.core import ArrowSpace
from matternet_rs_tpu.graph import GraphLaplacian, GraphParams
from matternet_rs_tpu.ops import laplacian as lap_ops
from matternet_rs_tpu.sparsification import SfGrassSparsifier
from matternet_rs_tpu.utils.fixtures import make_gaussian_cliques


def _clique_graph():
    """Graph with two explicit 4-cliques joined by one bridge edge."""
    n = 9
    W = np.zeros((n, n))
    for block in ([0, 1, 2, 3], [4, 5, 6, 7]):
        for a in block:
            for b in block:
                if a != b:
                    W[a, b] = 1.0
    W[3, 4] = W[4, 3] = 0.2
    W[8, 0] = W[0, 8] = 0.1     # pendant node
    L = np.diag(W.sum(1)) - W
    return GraphLaplacian(
        matrix=jnp.asarray(L, jnp.float32),
        init_data=jnp.asarray(np.eye(n), jnp.float32),
        nnodes=n,
        graph_params=GraphParams(sparsity_check=False),
    )


def test_motives_find_cliques():
    gl = _clique_graph()
    motifs = mv.spot_motives_eigen(gl, mv.MotiveConfig(min_triangles=1, min_clust=0.3))
    assert len(motifs) >= 1
    found = [set(m) for m in motifs]
    # Each 4-clique should be discovered (possibly with the bridge attached).
    assert any({0, 1, 2, 3} <= f for f in found)
    assert any({4, 5, 6, 7} <= f for f in found)


def test_motives_deterministic():
    gl = _clique_graph()
    cfg = mv.MotiveConfig(min_triangles=1, min_clust=0.3)
    assert mv.spot_motives_eigen(gl, cfg) == mv.spot_motives_eigen(gl, cfg)


def test_motives_respect_max_sets():
    gl = _clique_graph()
    cfg = mv.MotiveConfig(min_triangles=1, min_clust=0.1, max_sets=1)
    assert len(mv.spot_motives_eigen(gl, cfg)) <= 1


def test_is_clique_and_rayleigh():
    gl = _clique_graph()
    assert mv.is_clique(gl, {0, 1, 2, 3})
    assert not mv.is_clique(gl, {0, 1, 4})
    r_coh = mv.rayleigh_indicator(gl, {0, 1, 2, 3})
    r_cut = mv.rayleigh_indicator(gl, {0, 4, 5})
    assert r_coh < r_cut        # cohesive set has lower boundary energy


def test_motives_on_clique_dataset():
    data = make_gaussian_cliques(12, 0.4, 5, 10, seed=3).astype(np.float32)
    params = GraphParams(eps=0.5, k=8, topk=8, sparsity_check=False)
    gl = lap_ops.build_laplacian_matrix(data, params)  # item graph for motifs
    motifs = mv.spot_motives_eigen(
        gl, mv.MotiveConfig(min_triangles=1, min_clust=0.2)
    )
    assert len(motifs) >= 1
    for m in motifs:
        assert len(m) >= 3
        assert m == sorted(m)


# --- sparsification (src_legacy/tests/test_sparsification.rs:4-113:
# basic skip-below-degree, larger-graph ratio/min-one-edge, sparsified-vs-
# unsparsified score preference) ---------------------------------------------


def test_sparsifier_skips_sparse_graph():
    W = np.zeros((10, 10))
    W[0, 1] = W[1, 0] = 1.0
    out = SfGrassSparsifier().sparsify_adjacency(W)
    assert np.allclose(out, W)


def test_sparsifier_keeps_ratio_and_min_one():
    rng = np.random.default_rng(0)
    n = 30
    W = rng.random((n, n))
    W = (W + W.T) / 2
    np.fill_diagonal(W, 0.0)
    out = SfGrassSparsifier(0.5).sparsify_adjacency(W)
    kept = (out > 1e-12).sum(axis=1)
    orig = (W > 1e-12).sum(axis=1)
    assert ((kept >= 1) | (orig == 0)).all()
    assert kept.sum() <= np.ceil(orig.sum() * 0.5) + n     # per-row ceil slack


def test_sparsifier_prefers_high_scores():
    n = 20
    W = np.full((n, n), 0.1)
    np.fill_diagonal(W, 0.0)
    W[0, 1] = W[1, 0] = 5.0       # strongest edge must survive
    out = SfGrassSparsifier(0.3).sparsify_adjacency(W)
    assert out[0, 1] > 0


# --- subgraphs -------------------------------------------------------------


def _centroid_graph_and_space():
    rng = np.random.default_rng(5)
    data = make_gaussian_cliques(10, 0.4, 3, 10, seed=7).astype(np.float32)
    aspace = ArrowSpace.from_items(data)
    n_cent = 8
    centroids = data[rng.permutation(len(data))[:n_cent]]
    gl = lap_ops.build_laplacian_from_k_cluster(
        jnp.asarray(centroids),
        GraphParams(eps=1.0, k=5, topk=5, sparsity_check=False),
        n_items=len(data),
    )
    # Assign items round-robin to centroids for root indices.
    aspace.cluster_assignments = np.arange(len(data)) % n_cent
    return gl, aspace


def test_subgraph_from_parent_invariants():
    gl, aspace = _centroid_graph_and_space()
    nodes = [0, 2, 4, 5]
    sub = sg.Subgraph.from_parent(gl, nodes, n_items=aspace.nitems)
    f = gl.init_data.shape[0]
    assert sub.laplacian.init_data.shape == (f, 4)
    assert sub.laplacian.matrix.shape == (f, f)
    assert sub.laplacian.nnodes == 4
    sub.compute_rayleigh()
    assert sub.rayleigh is not None and np.isfinite(sub.rayleigh)


def test_centroid_hierarchy_levels():
    gl, aspace = _centroid_graph_and_space()
    params = sg.CentroidGraphParams(
        eps=1.0, k=4, topk=4, min_centroids=2, max_depth=3, sparsity_check=False
    )
    h = sg.build_centroid_hierarchy(gl, aspace, params)
    assert len(h.level(0)) == 1
    assert h.count_subgraphs() >= 2          # at least root + one recluster
    # Root indices cover all items exactly once at the root level.
    root = h.level(0)[0]
    all_items = sorted(i for lst in root.root_indices for i in lst)
    assert all_items == list(range(aspace.nitems))
    # Child levels preserve item coverage.
    for depth in range(1, len(h.levels)):
        for node in h.level(depth):
            covered = sorted(i for lst in node.root_indices for i in lst)
            assert covered == list(range(aspace.nitems))


def test_recluster_round_robin():
    cents = np.arange(12, dtype=np.float32).reshape(6, 2)
    labels, means = sg.recluster_centroids(cents, 3)
    assert labels.tolist() == [0, 1, 2, 0, 1, 2]
    assert means.shape == (3, 2)
    assert np.allclose(means[0], cents[[0, 3]].mean(0))


def test_spot_subg_centroids_flat():
    gl, aspace = _centroid_graph_and_space()
    subs = sg.spot_subg_centroids(
        gl, aspace,
        sg.CentroidGraphParams(eps=1.0, k=4, topk=4, min_centroids=2,
                               max_depth=2, sparsity_check=False),
    )
    assert len(subs) >= 1
    for s in subs:
        assert s.laplacian.matrix.shape[0] == gl.init_data.shape[0]


def test_hierarchy_deterministic_parallel_consistency():
    """Reference test_subg_parallel.rs analogue: repeated builds identical."""
    gl, aspace = _centroid_graph_and_space()
    params = sg.CentroidGraphParams(eps=1.0, k=4, topk=4, min_centroids=2,
                                    max_depth=2, sparsity_check=False)
    h1 = sg.build_centroid_hierarchy(gl, aspace, params)
    h2 = sg.build_centroid_hierarchy(gl, aspace, params)
    assert h1.count_subgraphs() == h2.count_subgraphs()
    for l1, l2 in zip(h1.levels, h2.levels):
        for n1, n2 in zip(l1, l2):
            assert np.allclose(
                np.asarray(n1.graph.laplacian.matrix),
                np.asarray(n2.graph.laplacian.matrix),
            )


def test_motives_empty_and_single_node():
    """Degenerate graphs don't crash the triangle machinery."""
    W = np.zeros((3, 3))
    L = np.diag(W.sum(1)) - W
    gl = GraphLaplacian(
        matrix=jnp.asarray(L, jnp.float32),
        init_data=jnp.asarray(np.eye(3), jnp.float32),
        nnodes=3,
        graph_params=GraphParams(sparsity_check=False),
    )
    assert mv.spot_motives_eigen(gl) == []
    assert not mv.is_clique(gl, {0})


# --- bridged multi-clique suites (test_motives.rs:9-213, test_subg_*) ------


def _multi_clique_labels(data, n_cliques, spacing=20.0):
    """Recover clique labels from grid positions (the fixture shuffles)."""
    grid = int(np.ceil(np.sqrt(n_cliques)))
    centers = np.zeros((n_cliques, data.shape[1]))
    for i in range(n_cliques):
        centers[i, 0] = (i % grid) * spacing
        if data.shape[1] > 1:
            centers[i, 1] = (i // grid) * spacing
    d = ((data[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    labels = d.argmin(1)
    dist = np.sqrt(d.min(1))
    labels[dist > 6.0] = -1      # outliers
    return labels


def test_motives_multi_clique_purity():
    """On the 6-clique grid fixture, every detected motif is clique-pure —
    bridged/outlier points never stitch two cliques into one motif
    (reference: test_motives.rs on make_gaussian_cliques_multi)."""
    from matternet_rs_tpu.utils.fixtures import make_gaussian_cliques_multi

    n_cliques = 6
    data = make_gaussian_cliques_multi(180, 0.5, n_cliques, 12, seed=11).astype(
        np.float32
    )
    labels = _multi_clique_labels(data, n_cliques)
    # Within-clique rectified-cosine distance ≈ 5e-4 (noise 0.5 at radius
    # ~28); angularly-adjacent cliques sit at d ≈ 0.05. eps must fall
    # between the two for the graph to separate direction classes.
    params = GraphParams(eps=0.02, k=10, topk=10, sparsity_check=False)
    gl = lap_ops.build_laplacian_matrix(data, params)
    motifs = mv.spot_motives_eigen(
        gl, mv.MotiveConfig(min_triangles=2, min_clust=0.3, max_sets=32)
    )
    assert len(motifs) >= 3, f"only {len(motifs)} motifs on 6 cliques"
    # The motif graph is rectified-COSINE (like the reference's CosinePair):
    # grid cliques with co-linear centers (e.g. [20,0] and [40,0]) are one
    # direction and cannot be separated by any cosine method; the origin
    # clique has no direction at all. Purity therefore holds per DIRECTION
    # CLASS: motifs never mix angularly-distinct cliques.
    grid = int(np.ceil(np.sqrt(n_cliques)))
    centers = np.zeros((n_cliques, 2))
    for i in range(n_cliques):
        centers[i] = [(i % grid) * 20.0, (i // grid) * 20.0]
    reps: list[np.ndarray] = []
    dir_class = {}
    for i in range(1, n_cliques):       # 0 = origin, no direction
        u = centers[i] / np.linalg.norm(centers[i])
        for v in reps:
            if float(u @ v) > 0.99:
                dir_class[i] = v
                break
        else:
            reps.append(u)
            dir_class[i] = u

    covered = set()
    for m in motifs:
        dirs = {
            tuple(np.round(dir_class[int(labels[i])], 6))
            for i in m
            if labels[i] >= 1
        }
        assert len(dirs) <= 1, f"motif spans direction classes {dirs}: {m}"
        covered |= dirs
    assert len(covered) >= 2      # several distinct direction classes found


def test_motives_bridge_points_do_not_merge_cliques():
    """The 3-blob + bridge fixture: motifs stay within blobs even though
    bridge points sit between them (test_motives.rs:9-76)."""
    data = make_gaussian_cliques(15, 0.4, 3, 10, seed=5).astype(np.float32)
    # Blocks are positional here: 3 blobs of 15, then 3 bridges, 3 outliers.
    blob_of = lambda i: i // 15 if i < 45 else -1
    params = GraphParams(eps=0.4, k=8, topk=8, sparsity_check=False)
    gl = lap_ops.build_laplacian_matrix(data, params)
    motifs = mv.spot_motives_eigen(
        gl, mv.MotiveConfig(min_triangles=2, min_clust=0.3)
    )
    assert motifs, "no motifs on the clique fixture"
    for m in motifs:
        blobs = {blob_of(i) for i in m if blob_of(i) >= 0}
        assert len(blobs) <= 1, f"motif merged blobs {blobs}"


def test_motives_eigen_vs_energy_consistency():
    """Energy-variant motifs (sub-centroid graph → items via centroid_map)
    land on the same clusters the eigen variant finds on the item graph
    (test_motives.rs:117-213)."""
    from matternet_rs_tpu.builder import ArrowSpaceBuilder
    from matternet_rs_tpu.utils.fixtures import make_gaussian_cliques_multi

    n_cliques = 4
    data = make_gaussian_cliques_multi(160, 0.5, n_cliques, 16, seed=13).astype(
        np.float32
    )
    labels = _multi_clique_labels(data, n_cliques)

    b = (
        ArrowSpaceBuilder()
        .with_seed(17)
        .with_lambda_graph(1.0, 6)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=24, radius=30.0)
        .with_dims_reduction(True)
        .with_sampling(None)
        .with_expected_items(len(data))
    )
    aspace, gl_energy = b.build_energy(data)
    motifs_en = mv.spot_motives_energy(
        gl_energy, aspace, mv.MotiveConfig(min_triangles=1, min_clust=0.15)
    )
    # Item graph for the eigen variant.
    params = GraphParams(eps=0.5, k=10, topk=10, sparsity_check=False)
    gl_items = lap_ops.build_laplacian_matrix(data, params)
    motifs_ei = mv.spot_motives_eigen(
        gl_items, mv.MotiveConfig(min_triangles=2, min_clust=0.3, max_sets=32)
    )
    assert motifs_ei, "eigen motifs missing"
    if not motifs_en:
        pytest.skip("energy variant found no motifs at this config (allowed)")

    def majority_labels(motifs):
        out = set()
        for m in motifs:
            ls = [int(labels[i]) for i in m if labels[i] >= 0]
            if ls:
                vals, cnt = np.unique(ls, return_counts=True)
                out.add(int(vals[cnt.argmax()]))
        return out

    # The clique families the two variants identify must overlap.
    assert majority_labels(motifs_en) & majority_labels(motifs_ei)


# ---------------------------------------------------------------------------
# Energy-subgraph suite over a real energy build
# (src_legacy/subgraphs/tests/test_subg_motives.rs:65-400)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def energy_built_cliques():
    from matternet_rs_tpu.builder import ArrowSpaceBuilder
    from matternet_rs_tpu.utils.fixtures import make_gaussian_cliques_multi

    data = make_gaussian_cliques_multi(300, 0.3, 6, 24, seed=999).astype(
        np.float32
    )
    b = (
        ArrowSpaceBuilder()
        .with_seed(999)
        .with_lambda_graph(1.0, 8)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=30, radius=30.0)
        .with_dims_reduction(True)
        .with_sampling(None)
        .with_expected_items(len(data))
    )
    aspace, gl_energy = b.build_energy(data)
    return aspace, gl_energy


def _energy_subgraphs(aspace, gl_energy, rayleigh_max=None, min_size=5):
    cfg = sg.SubgraphConfig(
        motives=mv.MotiveConfig(
            top_l=18, min_triangles=1, min_clust=0.15, max_motif_size=30,
            max_sets=60, jaccard_dedup=0.65,
        ),
        rayleigh_max=rayleigh_max,
        min_size=min_size,
    )
    return sg.spot_subg_motives(gl_energy, aspace, cfg), cfg


def test_spot_subgraphs_energy_basic(energy_built_cliques):
    # test_subg_motives.rs:65-130 — shape/population invariants on every
    # extracted energy subgraph.
    aspace, gl_energy = energy_built_cliques
    subgraphs, _ = _energy_subgraphs(aspace, gl_energy)
    if not subgraphs:
        pytest.skip("no subgraphs at this config (allowed by the reference)")
    f_parent = gl_energy.init_data.shape[0]
    for s in subgraphs:
        f_dim, x_motif = s.laplacian.init_data.shape
        assert f_dim == f_parent
        assert s.laplacian.nnodes == x_motif, (
            "nnodes must equal number of motif centroids"
        )
        assert len(s.node_indices) == x_motif
        assert s.laplacian.matrix.shape == (f_dim, f_dim)
        assert s.laplacian.nnz(tol=1e-12) > 0, "subgraph should have edges"
        assert s.item_indices is not None, (
            "energy subgraphs must carry item_indices"
        )


def test_spot_subgraphs_energy_with_item_mapping(energy_built_cliques):
    # test_subg_motives.rs:133-209 — centroid indices within the parent
    # graph's node range, item indices within the ArrowSpace range.
    aspace, gl_energy = energy_built_cliques
    subgraphs, _ = _energy_subgraphs(aspace, gl_energy, min_size=3)
    if not subgraphs:
        pytest.skip("no subgraphs at this config (allowed by the reference)")
    n_parent = gl_energy.init_data.shape[1]
    for s in subgraphs:
        for node_idx in s.node_indices:
            assert 0 <= node_idx < n_parent, (
                f"centroid index {node_idx} out of range"
            )
        assert s.item_indices is not None
        for item_idx in s.item_indices:
            assert 0 <= item_idx < aspace.nitems, (
                f"item index {item_idx} out of range"
            )


def test_subgraph_energy_rayleigh_filter(energy_built_cliques):
    # test_subg_motives.rs:288-334 — a stricter Rayleigh cap never yields
    # MORE subgraphs, and every survivor respects its cap.
    aspace, gl_energy = energy_built_cliques
    strict, _ = _energy_subgraphs(aspace, gl_energy, rayleigh_max=0.15)
    relaxed, _ = _energy_subgraphs(aspace, gl_energy, rayleigh_max=0.5)
    assert len(relaxed) >= len(strict), (
        "relaxed Rayleigh filter should yield at least as many subgraphs"
    )
    for s in strict:
        assert s.rayleigh is not None and s.rayleigh <= 0.15
    for s in relaxed:
        assert s.rayleigh is not None and s.rayleigh <= 0.5


def test_subgraph_structure_clique_data(energy_built_cliques):
    # test_subg_motives.rs:335-400 — clique-structured data yields
    # subgraphs with >= 2 centroids, >= min_size items, and item count
    # >= centroid count (many items per centroid).
    aspace, gl_energy = energy_built_cliques
    subgraphs, cfg = _energy_subgraphs(aspace, gl_energy, min_size=8)
    if not subgraphs:
        pytest.skip("no subgraphs with these strict parameters (allowed)")
    for i, s in enumerate(subgraphs):
        _, x_centroids = s.laplacian.init_data.shape
        assert x_centroids >= 2, f"subgraph {i} needs >= 2 centroids"
        assert s.item_indices is not None
        assert len(s.item_indices) >= cfg.min_size, (
            f"subgraph {i} should have at least min_size items"
        )
        assert len(s.item_indices) >= x_centroids, (
            f"subgraph {i} should have at least as many items as centroids"
        )


# ---------------------------------------------------------------------------
# Centroid-hierarchy classes over real builds
# (src_legacy/subgraphs/tests/test_subg_centroids.rs:152-388)
# ---------------------------------------------------------------------------


def _built_centroid_graph(n, noise, seed, eps=1.0, k=10):
    from matternet_rs_tpu.builder import ArrowSpaceBuilder
    from matternet_rs_tpu.utils.fixtures import make_gaussian_hd

    data = make_gaussian_hd(n, noise).astype(np.float32)
    b = (
        ArrowSpaceBuilder()
        .with_seed(seed)
        .with_lambda_graph(eps, k, 2.0, None)
        .with_sparsity_check(False)
    )
    aspace, gl = b.build(data)
    return aspace, gl


def test_centroid_subgraphs_min_centroids_cutoff():
    # test_subg_centroids.rs:152-200 — min_centroids above the root size
    # leaves only the root subgraph; deeper levels stay empty.
    aspace, gl = _built_centroid_graph(60, 0.5, seed=7, k=6)
    x0 = gl.init_data.shape[1]
    params = sg.CentroidGraphParams(
        eps=1.0, k=4, topk=4, min_centroids=x0 + 1, max_depth=3,
        sparsity_check=False, seed=1,
    )
    subgraphs = sg.spot_subg_centroids(gl, aspace, params)
    assert len(subgraphs) == 1, (
        "only the root should survive when min_centroids > root size"
    )
    hierarchy = sg.build_centroid_hierarchy(gl, aspace, params)
    assert hierarchy.count_subgraphs() == 1
    for depth in range(1, len(hierarchy.levels)):
        assert not hierarchy.levels[depth], (
            f"expected no nodes at depth {depth}"
        )


def test_recluster_centroids_reference_properties():
    # test_subg_centroids.rs:203-229 — label range and output shapes.
    cents = np.array(
        [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0], [2.0, 2.0]],
        np.float32,
    )
    labels, means = sg.recluster_centroids(cents, 3)
    assert len(labels) == 5
    k_eff, d = means.shape
    assert k_eff == min(3, 5) and d == 2
    assert all(0 <= int(c) < k_eff for c in labels)


def test_centroid_subgraphs_two_levels():
    # test_subg_centroids.rs:230-278 — a nested hierarchy materializes a
    # non-empty level 1 with consistent per-subgraph shapes.
    aspace, gl = _built_centroid_graph(120, 0.3, seed=99)
    params = sg.CentroidGraphParams(
        eps=1.0, k=4, topk=4, min_centroids=3, max_depth=2,
        sparsity_check=False, seed=1234,
    )
    hierarchy = sg.build_centroid_hierarchy(gl, aspace, params)
    assert hierarchy.level(1), "expected non-empty level 1"
    for s in hierarchy.all_subgraphs():
        f_sg, x_sg = s.laplacian.init_data.shape
        assert s.laplacian.nnodes == x_sg
        assert f_sg > 0


def test_centroid_subgraphs_three_levels():
    # test_subg_centroids.rs:279-339 — three-deep recursion keeps the
    # F×F matrix / [F, X] init-data / nnodes invariants at every node.
    aspace, gl = _built_centroid_graph(200, 0.25, seed=123, k=12)
    params = sg.CentroidGraphParams(
        eps=1.0, k=3, topk=3, min_centroids=3, max_depth=3,
        sparsity_check=False, seed=5,
    )
    hierarchy = sg.build_centroid_hierarchy(gl, aspace, params)
    assert hierarchy.level(0), "root level must be non-empty"
    assert hierarchy.level(1), "level 1 should be non-empty"
    for i, s in enumerate(hierarchy.all_subgraphs()):
        f_sg, x_sg = s.laplacian.init_data.shape
        assert x_sg > 0 and f_sg > 0
        assert s.laplacian.nnodes == x_sg, f"subgraph {i} nnodes"
        assert s.laplacian.matrix.shape == (f_sg, f_sg)


def test_centroid_subgraphs_flat_vs_hierarchy():
    # test_subg_centroids.rs:340-388 — flat and hierarchy APIs agree.
    aspace, gl = _built_centroid_graph(100, 0.3, seed=555)
    params = sg.CentroidGraphParams(
        eps=1.0, k=4, topk=4, min_centroids=3, max_depth=2,
        sparsity_check=False, seed=999,
    )
    flat = sg.spot_subg_centroids(gl, aspace, params)
    hierarchy = sg.build_centroid_hierarchy(gl, aspace, params)
    assert len(flat) == len(hierarchy.all_subgraphs())
    assert len(flat) == hierarchy.count_subgraphs()
