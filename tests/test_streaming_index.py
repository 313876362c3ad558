"""Streaming (out-of-core) index: build from the shard store, streamed
exact search, block-size invariance, resume, batched/serial agreement.

Reference counterpart: none (the reference is strictly in-memory,
SURVEY §2.4) — this is the single-chip larger-than-HBM capability.
"""

import numpy as np
import pytest

from matternet_rs_tpu.graph import GraphParams
from matternet_rs_tpu.index.streaming import StreamingIndex
from matternet_rs_tpu.storage import shards as shard_store
from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

N, F, K = 3000, 24, 10


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_store")
    data = make_energy_test_dataset(N, F, seed=21).astype(np.float32)
    shard_store.write_shards(data, d, rows_per_shard=700)   # 5 shards
    return d, data


@pytest.fixture(scope="module")
def index(store):
    d, _ = store
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    return StreamingIndex.build_from_store(
        d, params, max_clusters=20, radius=20.0, block_rows=512,
        sample_rows=N,
    )


def test_build_writes_lambda_file_and_meta(store, index):
    d, _ = store
    lam = np.fromfile(d / "lambdas.bin", np.float32)
    assert lam.shape == (N,)
    assert np.isfinite(lam).all()
    assert (d / "index.json").exists()
    assert index.range_lambdas > 0


def test_self_query_top1(store, index):
    _, data = store
    res = index.search(data[42], K)
    assert res[0][0] == 42
    scores = [s for _, s in res]
    assert scores == sorted(scores, reverse=True)


def test_block_boundary_items_retrievable(store, index):
    """Items at block and shard boundaries must carry correct global ids."""
    _, data = store
    for i in (0, 511, 512, 699, 700, 1399, 1400, N - 1):
        res = index.search(data[i], 3)
        assert res[0][0] == i, f"boundary item {i} → {res[:2]}"


def test_block_size_invariance(store):
    """The streamed merge is exact: results identical for any block size."""
    d, data = store
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    small = StreamingIndex.build_from_store(
        d, params, max_clusters=20, radius=20.0, block_rows=300,
        sample_rows=N,
    )
    big = StreamingIndex.build_from_store(
        d, params, max_clusters=20, radius=20.0, block_rows=8192,
        sample_rows=N,
    )
    rng = np.random.default_rng(2)
    for i in rng.integers(0, N, 8):
        q = data[i] + rng.normal(0, 0.05, F).astype(np.float32)
        a = small.search(q, K)
        b = big.search(q, K)
        assert [j for j, _ in a] == [j for j, _ in b]
        np.testing.assert_allclose(
            [s for _, s in a], [s for _, s in b], rtol=1e-5, atol=1e-6
        )


def test_batched_matches_serial(store, index):
    _, data = store
    rng = np.random.default_rng(3)
    qidx = rng.integers(0, N, 6)
    idx, sc = index.search_batch(data[qidx], K)
    for r, i in enumerate(qidx):
        serial = index.search(data[i], K)
        assert idx[r].tolist() == [j for j, _ in serial]
        np.testing.assert_allclose(
            sc[r], [s for _, s in serial], rtol=1e-5, atol=1e-6
        )


def test_resume_from_disk(store, index):
    _, data = store
    loaded = StreamingIndex.load(index.directory)
    assert loaded.n_items == N and loaded.n_features == F
    assert loaded.min_lambdas == pytest.approx(index.min_lambdas)
    q = data[7]
    assert loaded.search(q, 5) == index.search(q, 5)


def test_wrong_dim_query_raises(index):
    with pytest.raises(ValueError, match="dimension"):
        index.search(np.ones(F + 3, np.float32), 5)
    with pytest.raises(ValueError, match="dimension"):
        index.search_batch(np.ones((2, F + 3), np.float32), 5)


def test_k_exceeds_n_clamped(store, index):
    _, data = store
    res = index.search(data[0], 10 * N)
    assert len(res) == N


def test_lambda_matches_inmemory_formula(store, index):
    """Streamed λ == one-shot λ against the same graph (the streaming
    chunking must not change the math)."""
    d, data = store
    import jax.numpy as jnp

    from matternet_rs_tpu.ops import taumode as tm

    lam_stream = np.fromfile(d / "lambdas.bin", np.float32)
    lam_direct = np.asarray(
        tm.taumode_lambdas_auto(
            jnp.asarray(data), index.gl.matrix,
            index.taumode.mode, index.taumode.param,
        )
    )
    np.testing.assert_allclose(lam_stream, lam_direct, rtol=1e-5, atol=1e-6)


def test_quantized_streaming_high_overlap(store, index):
    _, data = store
    rng = np.random.default_rng(5)
    overlaps = []
    for i in rng.integers(0, N, 8):
        q = data[i] + rng.normal(0, 0.05, F).astype(np.float32)
        exact = [j for j, _ in index.search(q, K)]
        quant = [j for j, _ in index.search(q, K, quantized=True)]
        overlaps.append(len(set(exact) & set(quant)) / K)
    assert np.mean(overlaps) >= 0.85, f"bf16 stream overlap {np.mean(overlaps)}"
    # self-query survives quantization
    res = index.search(data[9], 3, quantized=True)
    assert res[0][0] == 9


def test_quantized_streaming_batch(store, index):
    _, data = store
    idx, _ = index.search_batch(data[[4, 8]], 5, quantized=True)
    assert idx[0][0] == 4 and idx[1][0] == 8


def test_build_resume_after_crash(tmp_path):
    """Kill the λ pass mid-way; resume completes to a bit-identical index."""
    data = make_energy_test_dataset(2000, 16, seed=31).astype(np.float32)
    params = GraphParams(eps=1.0, k=5, topk=5, sparsity_check=False)

    d_full = tmp_path / "full"
    shard_store.write_shards(data, d_full, rows_per_shard=600)
    full = StreamingIndex.build_from_store(
        d_full, params, max_clusters=15, radius=20.0, block_rows=256,
        sample_rows=2000,
    )
    lam_full = np.fromfile(d_full / "lambdas.bin", np.float32)

    d_crash = tmp_path / "crash"
    shard_store.write_shards(data, d_crash, rows_per_shard=600)
    StreamingIndex.build_from_store(
        d_crash, params, max_clusters=15, radius=20.0, block_rows=256,
        sample_rows=2000,
    )
    # Simulate a crash mid-λ-pass: keep the graph checkpoint, truncate the
    # λ file to 1.5 blocks (the partial tail must be discarded on resume).
    with open(d_crash / "lambdas.bin", "r+b") as fh:
        fh.truncate(int(1.5 * 256) * 4)
    resumed = StreamingIndex.build_from_store(
        d_crash, params, max_clusters=15, radius=20.0, block_rows=256,
        sample_rows=2000, resume=True,
    )
    lam_res = np.fromfile(d_crash / "lambdas.bin", np.float32)
    np.testing.assert_array_equal(lam_res, lam_full)
    assert resumed.min_lambdas == pytest.approx(full.min_lambdas)
    assert resumed.range_lambdas == pytest.approx(full.range_lambdas)
    q = data[33]
    assert resumed.search(q, 5) == full.search(q, 5)


def test_build_resume_noop_when_complete(tmp_path):
    """Resume over a finished build recomputes nothing (λ file untouched)."""
    data = make_energy_test_dataset(1000, 16, seed=32).astype(np.float32)
    params = GraphParams(eps=1.0, k=5, topk=5, sparsity_check=False)
    d = tmp_path / "done"
    shard_store.write_shards(data, d, rows_per_shard=400)
    StreamingIndex.build_from_store(
        d, params, max_clusters=10, radius=20.0, block_rows=250,
        sample_rows=1000,
    )
    before = (d / "lambdas.bin").read_bytes()
    StreamingIndex.build_from_store(
        d, params, max_clusters=10, radius=20.0, block_rows=250,
        sample_rows=1000, resume=True,
    )
    assert (d / "lambdas.bin").read_bytes() == before


def test_energy_store_roundtrip(tmp_path):
    """Energy-built index → shared store → streamed energy search matches
    the in-memory energy search (one format, energy mode included)."""
    from matternet_rs_tpu import energymaps as em
    from matternet_rs_tpu.builder import ArrowSpaceBuilder
    from matternet_rs_tpu.parallel import make_mesh
    from matternet_rs_tpu.parallel.index import ShardedArrowSpace

    data = make_energy_test_dataset(400, 24, seed=41).astype(np.float32)
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
    if aspace.projection is not None:
        pytest.skip("projection-active energy store not covered here")
    sa = ShardedArrowSpace.from_arrowspace(aspace, gl, mesh=make_mesh(8))
    d = tmp_path / "estore"
    sa.to_store(d)

    si = StreamingIndex.load(d)
    assert si.sub_centroids is not None
    res_stream = si.search_energy(data[9], k=8)
    res_mem = em.search_energy(aspace, data[9], gl, k=8)
    assert [i for i, _ in res_stream] == [i for i, _ in res_mem]
    # Distributed resume keeps energy mode too.
    sa2 = ShardedArrowSpace.load_from_store(d, mesh=make_mesh(8))
    assert sa2.sub_centroids is not None
    res_dist = sa2.search_energy(data[9], k=8)
    assert [i for i, _ in res_dist] == [i for i, _ in res_mem]


def test_energy_store_blend_search_also_works(tmp_path):
    """On an energy-mode store, blended search_batch routes query λ
    through the sub-centroids (the energy graph's node dim need not
    match n_features)."""
    from matternet_rs_tpu import energymaps as em
    from matternet_rs_tpu.builder import ArrowSpaceBuilder
    from matternet_rs_tpu.parallel import make_mesh
    from matternet_rs_tpu.parallel.index import ShardedArrowSpace

    data = make_energy_test_dataset(300, 20, seed=42).astype(np.float32)
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 5)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=12, radius=16.0)
        .with_dims_reduction(True)
        .with_seed(6)
    )
    aspace, gl = b.build_energy(
        data, em.EnergyParams(optical_tokens=10, neighbor_k=4, candidate_m=8)
    )
    if aspace.projection is not None:
        pytest.skip("projection-active store not covered")
    sa = ShardedArrowSpace.from_arrowspace(aspace, gl, mesh=make_mesh(8))
    d = tmp_path / "estore2"
    sa.to_store(d)
    si = StreamingIndex.load(d)
    res = si.search(data[11], k=5)          # blended path on energy store
    assert res[0][0] == 11


def test_store_roundtrip_with_projection(tmp_path):
    """A JL-projected index persists its projection through the store:
    original-dim queries keep working on all three consumers (was
    silently dropped → shape crash)."""
    from matternet_rs_tpu import energymaps as em
    from matternet_rs_tpu.builder import ArrowSpaceBuilder
    from matternet_rs_tpu.parallel import make_mesh
    from matternet_rs_tpu.parallel.index import ShardedArrowSpace

    rng = np.random.default_rng(7)
    data = make_energy_test_dataset(300, 128, seed=7).astype(np.float32)
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 5)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=40, radius=120.0)
        .with_dims_reduction(True)
        .with_seed(9)
    )
    aspace, gl = b.build_energy(
        data, em.EnergyParams(optical_tokens=16, neighbor_k=5, candidate_m=8)
    )
    if aspace.projection is None:
        pytest.skip("projection not triggered for this config")
    sa = ShardedArrowSpace.from_arrowspace(aspace, gl, mesh=make_mesh(8))
    d = tmp_path / "pstore"
    sa.to_store(d)

    si = StreamingIndex.load(d)
    assert si.projection is not None
    assert si.projection.original_dim == 128
    res = si.search_energy(data[10], k=5)          # original-dim query
    mem = em.search_energy(aspace, data[10], gl, k=5)
    assert [i for i, _ in res] == [i for i, _ in mem]

    sa2 = ShardedArrowSpace.load_from_store(d, mesh=make_mesh(8))
    assert sa2.projection is not None
    res2 = sa2.search_energy(data[10], k=5)
    assert [i for i, _ in res2] == [i for i, _ in mem]


@pytest.mark.parametrize("seed", range(2))
def test_streaming_matches_inmemory_builder_end_to_end(seed, tmp_path):
    """Full-sample streaming build == the in-memory builder build (same
    clustering inputs → same centroids → same graph → same λ → identical
    blended ranking), fuzzed over random shard/block geometry."""
    from matternet_rs_tpu.builder import ArrowSpaceBuilder

    rng = np.random.default_rng(7000 + seed)
    n = int(rng.integers(400, 900))
    f = int(rng.integers(8, 40))
    data = make_energy_test_dataset(n, f, seed=seed).astype(np.float32)
    eps, k_g = float(rng.uniform(0.7, 1.0)), int(rng.integers(4, 7))
    mc, rad = int(rng.integers(8, 20)), float(rng.uniform(10.0, 30.0))
    # The builder applies the reference topk heuristic (builder.rs:785-793);
    # use the same value so the graphs are identical.
    topk = 3 if k_g <= 5 else 4

    d = tmp_path / "s"
    shard_store.write_shards(
        data, d, rows_per_shard=int(rng.integers(60, 300))
    )
    params = GraphParams(eps=eps, k=k_g, topk=topk, sparsity_check=False)
    si = StreamingIndex.build_from_store(
        d, params, max_clusters=mc, radius=rad,
        block_rows=int(rng.integers(50, 400)), sample_rows=n,
    )

    b = (ArrowSpaceBuilder()
         .with_lambda_graph(eps, k_g)
         .with_sparsity_check(False)
         .with_cluster_params(max_clusters=mc, radius=rad)
         .with_sampling(None))
    aspace, gl = b.build(data)

    for qi in rng.integers(0, n, 5):
        q = data[qi] + rng.normal(0, 0.05, f).astype(np.float32)
        stream = si.search(q, k=10)
        ql = aspace.prepare_query_item(q, gl)
        mem = aspace.search_lambda_aware(q, ql, 10)
        assert [i for i, _ in stream] == [i for i, _ in mem], f"seed {seed}"
        np.testing.assert_allclose(
            [s for _, s in stream], [s for _, s in mem], rtol=1e-4, atol=1e-5
        )


def test_ell_backed_graph_persists_and_roundtrips(tmp_path, monkeypatch):
    """A store built with the direct-ELL graph (F ≥ DIRECT_ELL_N) persists
    the O(F·k) ELL arrays — not a dense [F, F] graph.bin — and
    load() reproduces the exact same rankings."""
    from matternet_rs_tpu.ops import laplacian as lap_ops

    monkeypatch.setattr(lap_ops, "DIRECT_ELL_N", 16)   # force the route
    d = tmp_path / "ell_store"
    data = make_energy_test_dataset(600, F, seed=33).astype(np.float32)
    shard_store.write_shards(data, d, rows_per_shard=200)
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    idx = StreamingIndex.build_from_store(
        d, params, max_clusters=12, radius=20.0, block_rows=256,
        sample_rows=600,
    )
    assert idx.gl.is_ell_backed
    assert (d / "graph_ell.npz").exists()
    assert not (d / "graph.bin").exists()

    idx2 = StreamingIndex.load(d)
    assert idx2.gl.is_ell_backed
    q = data[17] + 0.01
    r1 = idx.search(q, K)
    r2 = idx2.search(q, K)
    assert [i for i, _ in r1] == [i for i, _ in r2]
    np.testing.assert_allclose(
        [s for _, s in r1], [s for _, s in r2], atol=1e-6
    )
    assert r1[0][0] == 17
