"""Mesh-sharded resident-sketch serving (parallel/sketch.py).

The beyond-one-chip out-of-core tier: the int8 sketch sharded over the
``data`` mesh axis, per-device block scans (the SAME scan core as the
single-chip path), all-gather candidate merge, exact disk rescore.

Contract: with a candidate pool wide enough to force exact per-block
selection, the sharded scan returns EXACTLY what the single-chip sketch
search returns — for every mesh shape, refined and unrefined — and the
answer is deterministic across mesh shapes {2, 4, 8} and the 2-D (2×4)
slice/data topology (the reference has no distributed tier; the scoring
semantics under test are src_legacy/core.rs:1156-1193).
"""

import numpy as np
import pytest

from matternet_rs_tpu.graph import GraphParams
from matternet_rs_tpu.index.streaming import StreamingIndex
from matternet_rs_tpu.parallel.mesh import make_mesh, make_mesh_2d
from matternet_rs_tpu.parallel.sketch import ShardedSketch
from matternet_rs_tpu.storage import shards as shard_store
from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

N, F, K = 3000, 24, 10
BLK = 256           # 12 blocks: ragged tail (3000 = 11*256 + 184)


@pytest.fixture(scope="module")
def index(tmp_path_factory):
    d = tmp_path_factory.mktemp("sharded_sketch_store")
    data = make_energy_test_dataset(N, F, seed=43).astype(np.float32)
    shard_store.write_shards(data, d, rows_per_shard=700)
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    idx = StreamingIndex.build_from_store(
        d, params, max_clusters=20, radius=20.0, block_rows=BLK,
        sample_rows=N,
    )
    idx.build_sketch(persist=False)
    return idx, data


@pytest.fixture(scope="module")
def queries(index):
    _, data = index
    rng = np.random.default_rng(5)
    ids = rng.integers(0, N, 16)
    return data[ids] + rng.normal(0, 0.05, (16, F)).astype(np.float32)


# Exact per-block selection: candidates=BLK disables approx_max_k
# (kk·16 > blk) in both the single-chip and sharded scan.
EXACT = dict(candidates=BLK)


@pytest.mark.parametrize("d", [2, 4, 8])
def test_sharded_matches_single_chip_refined(index, queries, d):
    idx, _ = index
    ref_ids, ref_sc = idx.search_batch_sketch(queries, K, **EXACT)
    sk = ShardedSketch(idx, make_mesh(d))
    got_ids, got_sc = sk.search_batch(queries, K, **EXACT)
    np.testing.assert_array_equal(got_ids, ref_ids)
    np.testing.assert_allclose(got_sc, ref_sc, atol=1e-6)


@pytest.mark.parametrize("d", [2, 8])
def test_sharded_matches_single_chip_unrefined(index, queries, d):
    idx, _ = index
    ref_ids, ref_sc = idx.search_batch_sketch(
        queries, K, refine=False, **EXACT
    )
    sk = ShardedSketch(idx, make_mesh(d))
    got_ids, got_sc = sk.search_batch(queries, K, refine=False, **EXACT)
    np.testing.assert_array_equal(got_ids, ref_ids)
    np.testing.assert_allclose(got_sc, ref_sc, atol=1e-6)


def test_2d_slice_data_mesh_matches(index, queries):
    idx, _ = index
    ref_ids, _ = idx.search_batch_sketch(queries, K, **EXACT)
    sk = ShardedSketch(idx, make_mesh_2d(2, 4))
    got_ids, _ = sk.search_batch(queries, K, **EXACT)
    np.testing.assert_array_equal(got_ids, ref_ids)


def test_deterministic_across_mesh_shapes(index, queries):
    idx, _ = index
    runs = [
        ShardedSketch(idx, make_mesh(d)).search_batch(queries, K, **EXACT)
        for d in (2, 4)
    ]
    np.testing.assert_array_equal(runs[0][0], runs[1][0])
    np.testing.assert_allclose(runs[0][1], runs[1][1], atol=1e-6)


def test_self_queries_recall(index):
    """Self-queries must return themselves top-1 through the sharded
    tier (default candidate pool, approx selection allowed)."""
    idx, data = index
    want = np.arange(0, N, 311)
    ids, _ = ShardedSketch(idx, make_mesh(8)).search_batch(
        data[want], K
    )
    assert np.mean(ids[:, 0] == want) == 1.0


def test_per_query_alpha_vector(index, queries):
    """Traced per-query alpha: a mixed-alpha batch equals per-alpha
    scalar calls row-for-row (the serving batcher contract)."""
    idx, _ = index
    sk = ShardedSketch(idx, make_mesh(4))
    alphas = np.array([0.3, 0.9] * 8, np.float32)
    mixed_ids, _ = sk.search_batch(queries, K, alpha=alphas, **EXACT)
    a_ids, _ = sk.search_batch(queries, K, alpha=0.3, **EXACT)
    b_ids, _ = sk.search_batch(queries, K, alpha=0.9, **EXACT)
    np.testing.assert_array_equal(mixed_ids[0::2], a_ids[0::2])
    np.testing.assert_array_equal(mixed_ids[1::2], b_ids[1::2])


def test_hbm_accounting_falls_with_devices(index):
    idx, _ = index
    b2 = ShardedSketch(idx, make_mesh(2)).hbm_bytes_per_device
    b8 = ShardedSketch(idx, make_mesh(8)).hbm_bytes_per_device
    assert b8 < b2
    assert b8 <= int(np.ceil(b2 / 4)) + BLK * (F + 8)


def test_single_query_wrapper(index, queries):
    idx, _ = index
    sk = ShardedSketch(idx, make_mesh(4))
    got = sk.search(queries[0], K, **EXACT)
    ref = idx.search_sketch(queries[0], K, **EXACT)
    assert got == ref


def test_dimension_mismatch_raises(index):
    idx, _ = index
    sk = ShardedSketch(idx, make_mesh(2))
    with pytest.raises(ValueError, match="dimension"):
        sk.search_batch(np.zeros((2, F + 3), np.float32), K)


# ----------------------------------------------------- energy-mode sharded
@pytest.fixture(scope="module")
def energy_index(tmp_path_factory):
    from matternet_rs_tpu import energymaps as em
    from matternet_rs_tpu.builder import ArrowSpaceBuilder
    from matternet_rs_tpu.parallel.index import ShardedArrowSpace

    data = make_energy_test_dataset(1200, 24, seed=48).astype(np.float32)
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 5)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=16, radius=18.0)
        .with_dims_reduction(True)
        .with_seed(6)
    )
    aspace, gl = b.build_energy(
        data, em.EnergyParams(optical_tokens=12, neighbor_k=4, candidate_m=8)
    )
    sa = ShardedArrowSpace.from_arrowspace(aspace, gl, mesh=make_mesh(8))
    d = tmp_path_factory.mktemp("energy_sharded_store")
    sa.to_store(d)
    idx = StreamingIndex.load(d)
    idx.block_rows = 256
    idx.build_sketch(persist=False)
    return idx, data


@pytest.mark.parametrize("d", [2, 8])
def test_sharded_energy_matches_single_chip(energy_index, d):
    idx, data = energy_index
    Q = data[[5, 321, 999]]
    ref_ids, ref_sc = idx.search_energy_batch_sketch(
        Q, 8, candidates=idx.block_rows
    )
    sk = ShardedSketch(idx, make_mesh(d))
    got_ids, got_sc = sk.search_energy_batch(Q, 8, candidates=idx.block_rows)
    np.testing.assert_array_equal(got_ids, ref_ids)
    np.testing.assert_allclose(got_sc, ref_sc, atol=1e-6)


def test_sharded_energy_unrefined_and_wrapper(energy_index):
    idx, data = energy_index
    sk = ShardedSketch(idx, make_mesh(4))
    ids, sc = sk.search_energy_batch(data[:8], 5, refine=False)
    assert ids.shape == (8, 5)
    assert np.all(np.diff(sc, axis=1) >= -1e-7)
    got = sk.search_energy(data[7], 5, candidates=idx.block_rows)
    ref = idx.search_energy_sketch(data[7], 5, candidates=idx.block_rows)
    assert got == ref


def test_sharded_energy_on_eigen_store_raises(index):
    idx, _ = index
    sk = ShardedSketch(idx, make_mesh(2))
    with pytest.raises(ValueError, match="energy-mode"):
        sk.search_energy_batch(np.zeros((1, F), np.float32), 3)
