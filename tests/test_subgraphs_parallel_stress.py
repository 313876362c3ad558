"""Subgraph/motif parallel-stress determinism — analogue of
/root/reference/src_legacy/subgraphs/tests/test_subg_parallel.rs:15-329
(concurrent hierarchy builds identical, no item loss/duplication under
parallel construction, parallel stress at a larger dataset).

The TPU rebuild's concurrency story is threads driving JAX dispatches into
one device queue (the reference's is rayon); these tests assert the same
contracts: concurrent builds of the SAME inputs are bit-identical to a
serial build, concurrent builds of DIFFERENT inputs don't cross-pollute,
and motif materialization under concurrency neither loses nor duplicates
item indices.
"""

import concurrent.futures

import numpy as np
import pytest

import jax.numpy as jnp

from matternet_rs_tpu import motives as mv
from matternet_rs_tpu import subgraphs as sg
from matternet_rs_tpu.core import ArrowSpace
from matternet_rs_tpu.graph import GraphParams
from matternet_rs_tpu.ops import laplacian as lap_ops
from matternet_rs_tpu.utils.fixtures import make_gaussian_cliques_multi

N_WORKERS = 8


def _space(seed: int, n_cliques: int = 4, n_points: int = 96):
    data = make_gaussian_cliques_multi(
        n_points, 0.35, n_cliques, 8, seed=seed
    ).astype(np.float32)
    aspace = ArrowSpace.from_items(data)
    n_cent = 10
    rng = np.random.default_rng(seed)
    centroids = data[rng.permutation(len(data))[:n_cent]]
    gl = lap_ops.build_laplacian_from_k_cluster(
        jnp.asarray(centroids),
        GraphParams(eps=1.0, k=5, topk=5, sparsity_check=False),
        n_items=len(data),
    )
    aspace.cluster_assignments = np.arange(len(data)) % n_cent
    return gl, aspace, data


def _hier_fingerprint(h: sg.CentroidHierarchy):
    """Order-sensitive structural fingerprint of a hierarchy."""
    out = []
    for level in h.levels:
        for node in level:
            out.append((
                tuple(node.graph.node_indices),
                np.asarray(node.graph.laplacian.matrix).tobytes(),
            ))
    return out


def test_concurrent_hierarchy_builds_identical():
    """test_subg_parallel.rs determinism core: N_WORKERS concurrent builds
    of the SAME inputs must all equal the serial build, level for level,
    node for node, Laplacian byte for byte."""
    gl, aspace, _ = _space(seed=3)
    params = sg.CentroidGraphParams(
        eps=1.0, k=4, topk=4, min_centroids=2, max_depth=2,
        sparsity_check=False,
    )
    serial = _hier_fingerprint(sg.build_centroid_hierarchy(gl, aspace, params))
    with concurrent.futures.ThreadPoolExecutor(N_WORKERS) as ex:
        hs = list(ex.map(
            lambda _: sg.build_centroid_hierarchy(gl, aspace, params),
            range(N_WORKERS),
        ))
    for h in hs:
        assert _hier_fingerprint(h) == serial


def test_concurrent_distinct_inputs_do_not_cross_pollute():
    """Different (seeded) inputs built concurrently must each match their
    own serial build — shared jit caches and device queues must not leak
    state across builds."""
    spaces = [_space(seed=s) for s in (11, 12, 13, 14)]
    params = sg.CentroidGraphParams(
        eps=1.0, k=4, topk=4, min_centroids=2, max_depth=2,
        sparsity_check=False,
    )
    serial = [
        _hier_fingerprint(sg.build_centroid_hierarchy(gl, a, params))
        for gl, a, _ in spaces
    ]
    with concurrent.futures.ThreadPoolExecutor(N_WORKERS) as ex:
        futures = [
            ex.submit(sg.build_centroid_hierarchy, gl, a, params)
            for gl, a, _ in spaces
            for _ in range(2)
        ]
        got = [f.result() for f in futures]
    for i, h in enumerate(got):
        assert _hier_fingerprint(h) == serial[i // 2]


def test_concurrent_motif_subgraphs_no_loss_no_duplication():
    """Motif materialization under concurrency: every worker's subgraph
    set equals the serial one; within each subgraph item indices are
    unique and in range (the reference's no-loss/no-duplication asserts,
    test_subg_parallel.rs)."""
    from matternet_rs_tpu.builder import ArrowSpaceBuilder

    data = make_gaussian_cliques_multi(300, 0.3, 6, 24, seed=999).astype(
        np.float32
    )
    aspace, gl = (
        ArrowSpaceBuilder()
        .with_seed(999)
        .with_lambda_graph(1.0, 8)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=30, radius=30.0)
        .with_dims_reduction(True)
        .with_sampling(None)
        .with_expected_items(300)
        .build_energy(data)
    )
    mcfg = mv.MotiveConfig(
        top_l=18, min_triangles=1, min_clust=0.15, max_motif_size=30,
        max_sets=60, jaccard_dedup=0.65,
    )
    scfg = sg.SubgraphConfig(motives=mcfg, min_size=3)

    def build(_):
        motifs = mv.spot_motives_energy(gl, aspace, mcfg)
        subs = sg.spot_subg_motives(gl, aspace, scfg)
        for s in subs:
            if s.rayleigh is None:
                s.compute_rayleigh()
        return motifs, subs

    serial_motifs, serial_subs = build(0)
    assert len(serial_subs) > 0, "fixture produced no motif subgraphs"
    with concurrent.futures.ThreadPoolExecutor(N_WORKERS) as ex:
        results = list(ex.map(build, range(N_WORKERS)))

    def sub_fp(subs):
        return [
            (tuple(s.node_indices), tuple(s.item_indices),
             None if s.rayleigh is None else round(float(s.rayleigh), 6))
            for s in subs
        ]

    want = sub_fp(serial_subs)
    for motifs, subs in results:
        assert [tuple(m) for m in motifs] == [tuple(m) for m in serial_motifs]
        assert sub_fp(subs) == want
        for s in subs:
            ids = list(s.item_indices)
            assert len(set(ids)) == len(ids), "duplicated item index"
            assert all(0 <= i < len(data) for i in ids)


def test_parallel_stress_large_dataset():
    """Parallel stress at a larger dataset (test_subg_parallel.rs:240-329
    runs its stress on the big fixture): 8 workers × (hierarchy build +
    motif pass) on a ~1.9k-item corpus, all results identical, wall-clock
    bounded only by the x-dist timeout."""
    gl, aspace, data = _space(seed=9, n_cliques=8, n_points=1900)
    assert len(data) > 1800
    params = sg.CentroidGraphParams(
        eps=1.0, k=4, topk=4, min_centroids=2, max_depth=3,
        sparsity_check=False,
    )

    def build(_):
        h = sg.build_centroid_hierarchy(gl, aspace, params)
        return h.count_subgraphs(), _hier_fingerprint(h)

    serial_count, serial_fp = build(0)
    assert serial_count >= 1
    with concurrent.futures.ThreadPoolExecutor(N_WORKERS) as ex:
        results = list(ex.map(build, range(N_WORKERS)))
    for count, fp in results:
        assert count == serial_count
        assert fp == serial_fp
