"""ShardedArrowSpace tests: distributed build + query vs single-device."""

import numpy as np
import pytest

import jax

from matternet_rs_tpu.builder import ArrowSpaceBuilder
from matternet_rs_tpu.parallel.index import ShardedArrowSpace
from matternet_rs_tpu.utils.fixtures import make_gaussian_blob


@pytest.fixture(scope="module")
def built():
    data = make_gaussian_blob(200, 0.4).astype(np.float32)
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 6)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=12, radius=4.0)
        .with_deterministic_clustering(True)
    )
    aspace, gl = b.build(data)
    return aspace, gl, data


def test_from_arrowspace_search_matches(built):
    aspace, gl, data = built
    sharded = ShardedArrowSpace.from_arrowspace(aspace, gl, n_devices=4)
    q = data[42]
    q_lam = aspace.prepare_query_item(q, gl)
    single = aspace.search_lambda_aware(q, q_lam, 8)
    dist = sharded.search(q, 8, query_lambda=q_lam)
    assert [i for i, _ in single] == [i for i, _ in dist]
    for (_, s1), (_, s2) in zip(single, dist):
        assert s1 == pytest.approx(s2, abs=1e-5)


def test_from_shards_matches_single_device_build(built):
    aspace, gl, data = built
    # Distributed λ build from 4 raw shards against the same graph.
    shards = np.array_split(data, 4)
    sharded = ShardedArrowSpace.from_shards(shards, gl, aspace.taumode, n_devices=4)
    lam_single = np.asarray(aspace.lambdas)
    lam_dist = np.asarray(sharded.lambdas)[: len(data)]
    assert np.allclose(lam_dist, lam_single, atol=1e-5)
    assert sharded.min_lambdas == pytest.approx(aspace.min_lambdas, abs=1e-5)
    assert sharded.range_lambdas == pytest.approx(aspace.range_lambdas, abs=1e-5)


def test_query_lambda_consistency(built):
    aspace, gl, data = built
    sharded = ShardedArrowSpace.from_arrowspace(aspace, gl, n_devices=8)
    for i in (0, 99):
        assert sharded.prepare_query_lambda(data[i]) == pytest.approx(
            aspace.prepare_query_item(data[i], gl), abs=1e-5
        )


def test_search_cache_reuse(built):
    aspace, gl, data = built
    sharded = ShardedArrowSpace.from_arrowspace(aspace, gl, n_devices=2)
    sharded.search(data[0], 5)
    sharded.search(data[1], 5)
    assert len(sharded._search_cache) == 1     # one compile per k


def test_multislice_index_search(built):
    from matternet_rs_tpu.parallel.mesh import make_mesh_2d

    aspace, gl, data = built
    mesh = make_mesh_2d(2, 4)
    sharded = ShardedArrowSpace.from_arrowspace(aspace, gl, mesh=mesh)
    q = data[7]
    q_lam = aspace.prepare_query_item(q, gl)
    single = aspace.search_lambda_aware(q, q_lam, 6)
    dist = sharded.search(q, 6, query_lambda=q_lam)
    assert [i for i, _ in single] == [i for i, _ in dist]


def test_from_shards_multislice_mesh(built):
    from matternet_rs_tpu.parallel.mesh import make_mesh_2d

    aspace, gl, data = built
    mesh = make_mesh_2d(2, 4)
    shards = np.array_split(data, 8)
    sharded = ShardedArrowSpace.from_shards(shards, gl, aspace.taumode, mesh=mesh)
    lam_single = np.asarray(aspace.lambdas)
    lam_dist = np.asarray(sharded.lambdas)[: len(data)]
    assert np.allclose(lam_dist, lam_single, atol=1e-5)
    q = data[17]
    q_lam = aspace.prepare_query_item(q, gl)
    single = aspace.search_lambda_aware(q, q_lam, 6)
    dist = sharded.search(q, 6, query_lambda=q_lam)
    assert [i for i, _ in single] == [i for i, _ in dist]


def test_batched_distributed_matches_serial():
    import jax.numpy as jnp

    from matternet_rs_tpu.graph import GraphParams
    from matternet_rs_tpu.parallel import make_mesh
    from matternet_rs_tpu.parallel.index import ShardedArrowSpace
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    data = make_energy_test_dataset(600, 16, seed=8).astype(np.float32)
    params = GraphParams(eps=1.0, k=5, topk=5, sparsity_check=False)
    mesh = make_mesh(8)
    sa = ShardedArrowSpace.distributed_build(
        [data[:250], data[250:]], params, k_clusters=10, mesh=mesh
    )
    rng = np.random.default_rng(4)
    qidx = rng.integers(0, 600, 6)
    idx, sc = sa.search_batch(data[qidx], k=5)
    assert idx.shape == (6, 5)
    for r, i in enumerate(qidx):
        serial = sa.search(data[i], k=5)
        assert idx[r].tolist() == [j for j, _ in serial]
        np.testing.assert_allclose(
            sc[r], [s for _, s in serial], rtol=1e-5, atol=1e-6
        )


def test_batched_distributed_2d_mesh():
    from matternet_rs_tpu.graph import GraphParams
    from matternet_rs_tpu.parallel import make_mesh_2d
    from matternet_rs_tpu.parallel.index import ShardedArrowSpace
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    data = make_energy_test_dataset(400, 16, seed=9).astype(np.float32)
    params = GraphParams(eps=1.0, k=5, topk=5, sparsity_check=False)
    sa = ShardedArrowSpace.distributed_build(
        [data], params, k_clusters=8, mesh=make_mesh_2d(2, 4)
    )
    idx, _ = sa.search_batch(data[[3, 7]], k=5)
    assert idx[0][0] == 3 and idx[1][0] == 7


def test_distributed_spectral_embedding():
    from matternet_rs_tpu.graph import GraphParams
    from matternet_rs_tpu.parallel import make_mesh
    from matternet_rs_tpu.parallel.index import ShardedArrowSpace

    rng = np.random.default_rng(6)
    centers = rng.normal(size=(3, 12)) * 6.0
    labels = rng.integers(0, 3, 240)
    data = (centers[labels] + 0.3 * rng.normal(size=(240, 12))).astype(np.float32)
    params = GraphParams(eps=0.8, k=6, topk=6, sparsity_check=False)
    sa = ShardedArrowSpace.distributed_build(
        [data], params, k_clusters=6, mesh=make_mesh(8)
    )
    vals, vecs = sa.spectral_embedding(4, iters=120, reverse_k=240)
    assert vecs.shape == (240, 4)
    emb = vecs[:, 1:]
    d = ((emb[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    agree = (labels[d.argmin(1)] == labels).mean()
    assert agree > 0.85, f"embedding 1-NN agreement {agree}"


def test_batched_distributed_with_projection():
    """Regression: with an active JL projection, batched distributed search
    must project only the λ computation — scoring stays original-dim."""
    import jax.numpy as jnp

    from matternet_rs_tpu.builder import ArrowSpaceBuilder
    from matternet_rs_tpu.parallel import make_mesh
    from matternet_rs_tpu.parallel.index import ShardedArrowSpace
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    data = make_energy_test_dataset(300, 128, seed=12).astype(np.float32)
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 5)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=40, radius=120.0)
        .with_dims_reduction(True)
        .with_sampling(None)
    )
    aspace, gl = b.build(data)
    if aspace.projection is None:
        import pytest

        pytest.skip("projection not triggered for this config")
    sa = ShardedArrowSpace.from_arrowspace(aspace, gl, mesh=make_mesh(8))
    idx, sc = sa.search_batch(data[[5, 9]], k=5)
    assert idx[0][0] == 5 and idx[1][0] == 9
    serial = sa.search(data[5], k=5)
    assert idx[0].tolist() == [j for j, _ in serial]


def test_k_exceeds_per_shard_rows():
    """Regression: k beyond the per-device shard size must still return
    min(k, gathered) results, exactly matching the single-device scan."""
    from matternet_rs_tpu.graph import GraphParams
    from matternet_rs_tpu.parallel import make_mesh
    from matternet_rs_tpu.parallel.index import ShardedArrowSpace
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    data = make_energy_test_dataset(160, 16, seed=13).astype(np.float32)
    params = GraphParams(eps=1.0, k=5, topk=5, sparsity_check=False)
    sa = ShardedArrowSpace.distributed_build(
        [data], params, k_clusters=6, mesh=make_mesh(8)
    )
    # 20 rows per shard; ask for 60.
    serial = sa.search(data[3], k=60)
    assert len(serial) == 60
    idx, sc = sa.search_batch(data[[3]], k=60)
    assert idx.shape[1] == 60
    assert idx[0].tolist() == [j for j, _ in serial]
    eres = sa.search_energy(data[3], k=60)
    assert len(eres) == 60


def test_store_roundtrip_distributed_and_streaming(tmp_path):
    """One on-disk format, three consumers: distributed save → distributed
    resume (identical results) AND single-chip StreamingIndex over the
    same directory (identical ranking)."""
    from matternet_rs_tpu.graph import GraphParams
    from matternet_rs_tpu.index.streaming import StreamingIndex
    from matternet_rs_tpu.parallel import make_mesh
    from matternet_rs_tpu.parallel.index import ShardedArrowSpace
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    data = make_energy_test_dataset(500, 16, seed=15).astype(np.float32)
    params = GraphParams(eps=1.0, k=5, topk=5, sparsity_check=False)
    mesh = make_mesh(8)
    sa = ShardedArrowSpace.distributed_build(
        [data[:200], data[200:]], params, k_clusters=8, mesh=mesh
    )
    d = tmp_path / "store"
    sa.to_store(d)

    # Distributed resume: same results, no recompute.
    sa2 = ShardedArrowSpace.load_from_store(d, mesh=mesh)
    assert sa2.n_items == 500
    for i in (3, 123, 499):
        assert sa.search(data[i], k=5) == sa2.search(data[i], k=5)
    np.testing.assert_allclose(
        np.asarray(sa.lambdas)[:500], np.asarray(sa2.lambdas)[:500], atol=1e-6
    )

    # Single-chip out-of-core consumer on the same directory.
    si = StreamingIndex.load(d)
    res_stream = si.search(data[7], k=5)
    res_dist = sa.search(data[7], k=5)
    assert [i for i, _ in res_stream] == [i for i, _ in res_dist]


def test_distributed_hybrid_matches_serial():
    """Distributed hybrid == serial hybrid (incl. the global-semantic-top
    precedence), fuzzed over random configs and near-duplicate rows."""
    import jax.numpy as jnp

    from matternet_rs_tpu.graph import GraphParams
    from matternet_rs_tpu.ops import search as search_ops
    from matternet_rs_tpu.parallel import make_mesh
    from matternet_rs_tpu.parallel.index import ShardedArrowSpace
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    for seed in (0, 1):
        rng = np.random.default_rng(6000 + seed)
        n = int(rng.integers(150, 400))
        data = make_energy_test_dataset(n, 16, seed=seed).astype(np.float32)
        # Plant an exact duplicate so the high-cosine (>0.9999) branch fires.
        data[7] = data[3]
        params = GraphParams(eps=1.0, k=5, topk=5, sparsity_check=False)
        sa = ShardedArrowSpace.distributed_build(
            [data], params, k_clusters=8, mesh=make_mesh(8)
        )
        qi = int(rng.integers(0, n))
        ql = sa.prepare_query_lambda(data[qi])
        k = int(rng.integers(4, 10))
        dist = sa.search_hybrid(data[qi], k=k, query_lambda=ql)
        s_idx, s_sc = search_ops.search_lambda_aware_hybrid(
            jnp.asarray(data),
            jnp.sqrt(jnp.sum(jnp.asarray(data) ** 2, axis=-1)),
            sa.lambdas[:n], jnp.asarray(data[qi]), jnp.float32(ql), k,
        )
        s_idx = [int(i) for i, s in zip(np.asarray(s_idx), np.asarray(s_sc))
                 if np.isfinite(s)]
        assert [i for i, _ in dist] == s_idx, f"seed {seed}"


def test_distributed_range_search_matches_serial():
    from matternet_rs_tpu.graph import GraphParams
    from matternet_rs_tpu.parallel import make_mesh
    from matternet_rs_tpu.parallel.index import ShardedArrowSpace
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    data = make_energy_test_dataset(300, 16, seed=3).astype(np.float32)
    params = GraphParams(eps=1.0, k=5, topk=5, sparsity_check=False)
    sa = ShardedArrowSpace.distributed_build(
        [data], params, k_clusters=8, mesh=make_mesh(8)
    )
    ql = sa.prepare_query_lambda(data[5])
    got = dict(sa.range_search(data[5], eps=0.05, query_lambda=ql))
    lam = np.asarray(sa.lambdas)[:300]
    expect = {
        i: ql - lam[i] for i in range(300) if (ql - lam[i]) <= 0.05
    }
    assert set(got) == set(expect)
    for i in got:
        assert got[i] == pytest.approx(expect[i], abs=1e-6)


def test_distributed_hybrid_global_topk_eligibility():
    """Pinned adversarial case (review repro): a row that is its shard's
    LOCAL λ-top-1 but not in the GLOBAL λ-top-k must not become eligible —
    serial hybrid excludes it. λ is hand-set for full control."""
    import jax.numpy as jnp

    from matternet_rs_tpu.core import ArrowSpace
    from matternet_rs_tpu.graph import GraphLaplacian, GraphParams
    from matternet_rs_tpu.ops import search as search_ops
    from matternet_rs_tpu.parallel import make_mesh
    from matternet_rs_tpu.parallel.index import ShardedArrowSpace

    F = 8
    n = 16                                 # 2 rows per device on 8 devices
    q = np.zeros(F, np.float32)
    q[0] = 1.0
    rng = np.random.default_rng(0)
    data = rng.normal(0, 0.3, (n, F)).astype(np.float32)
    data[:, 0] += 2.0                      # moderate cos to q for all
    # Row 0 (shard 0): exact duplicate → cos 1 > SEMANTIC_THRESHOLD.
    data[0] = q
    # Row 2 (shard 1): very high cos but below the 0.9999 threshold.
    data[2] = q + np.array([0.0, 0.012] + [0.0] * (F - 2), np.float32)

    aspace = ArrowSpace.from_items(data)
    lam = np.full(n, 0.2, np.float32)
    lam[0] = 0.5                           # query λ matches row 2, not row 0
    lam[2] = 0.5
    aspace.lambdas = jnp.asarray(lam)
    aspace.min_lambdas, aspace.max_lambdas, aspace.range_lambdas = 0.0, 1.0, 1.0
    params = GraphParams(eps=1.0, k=3, topk=3, sparsity_check=False)
    L = jnp.eye(F)
    gl = GraphLaplacian(matrix=L, init_data=L, nnodes=n, graph_params=params)

    sa = ShardedArrowSpace.from_arrowspace(aspace, gl, mesh=make_mesh(8))
    for k in (1, 2, 4):
        dist = sa.search_hybrid(q, k=k, query_lambda=0.5)
        s_idx, s_sc = search_ops.search_lambda_aware_hybrid(
            jnp.asarray(data), aspace.norms, aspace.lambdas,
            jnp.asarray(q), jnp.float32(0.5), k,
        )
        serial = [int(i) for i, s in zip(np.asarray(s_idx), np.asarray(s_sc))
                  if np.isfinite(s)]
        assert [i for i, _ in dist] == serial, f"k={k}"
        np.testing.assert_allclose(
            [s for _, s in dist],
            [float(s) for s in np.asarray(s_sc)[: len(serial)]], atol=1e-6,
        )


def test_to_store_scrubs_stale_sketch(built, tmp_path):
    """to_store over a directory holding a previous index's sketch pair
    must remove it — sketch builds trust an existing sketch.bin without
    validation, so a stale pair would silently serve int8 scans
    quantized from the OLD corpus (review finding)."""
    from matternet_rs_tpu.index.streaming import (
        SKETCH_FILE,
        SKETCH_META_FILE,
    )

    aspace, gl, data = built
    sa = ShardedArrowSpace.from_arrowspace(aspace, gl, n_devices=4)
    d = tmp_path / "store"
    d.mkdir()
    (d / SKETCH_FILE).write_bytes(b"\x01" * 64)        # stale pair
    np.savez(d / SKETCH_META_FILE, mult=np.ones(4, np.float32))
    sa.to_store(d)
    assert not (d / SKETCH_FILE).exists()
    assert not (d / SKETCH_META_FILE).exists()


def test_to_store_scrub_precedes_corpus_write(built, tmp_path, monkeypatch):
    """The stale-sketch scrub must run BEFORE write_shards: a crash after
    the new corpus lands but before the scrub would pair the NEW corpus
    with the OLD corpus's sketch, and sketch builds trust an existing
    sketch.bin without validation (review finding — the streaming
    fresh-build path orders its scrub the same way)."""
    from matternet_rs_tpu.index.streaming import (
        SKETCH_FILE,
        SKETCH_META_FILE,
    )
    from matternet_rs_tpu.storage import shards as shard_store

    aspace, gl, data = built
    sa = ShardedArrowSpace.from_arrowspace(aspace, gl, n_devices=4)
    d = tmp_path / "store"
    d.mkdir()
    (d / SKETCH_FILE).write_bytes(b"\x01" * 64)        # stale pair
    np.savez(d / SKETCH_META_FILE, mult=np.ones(4, np.float32))

    def boom(*a, **k):
        raise RuntimeError("simulated crash during corpus write")

    monkeypatch.setattr(shard_store, "write_shards", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        sa.to_store(d)
    # Crash window: the stale pair must already be gone.
    assert not (d / SKETCH_FILE).exists()
    assert not (d / SKETCH_META_FILE).exists()


def test_serial_and_batched_lambda_prep_are_one_path():
    """Serial prepare_query_lambda delegates to the batched λ-prep
    (review finding: a difference-form serial variant could flip the
    sub-centroid argmin vs the batched ‖q‖²+‖c‖²−2⟨q,c⟩ decomposition
    under f32 cancellation). Probe exact midpoints between sub-centroid
    pairs — worst-case tie inputs — plus corpus queries, in both energy
    and eigen modes."""
    from matternet_rs_tpu import energymaps as em
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    data = make_energy_test_dataset(300, 16, seed=11).astype(np.float32)
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 5)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=8, radius=20.0)
        .with_dims_reduction(True)
    )
    aspace, gl = b.build_energy(data, em.EnergyParams(optical_tokens=12))
    sa = ShardedArrowSpace.from_arrowspace(aspace, gl, n_devices=8)
    assert sa.sub_centroids is not None      # energy mode is live
    sub_c = np.asarray(sa.sub_centroids)
    # Near-midpoints between sub-centroid pairs: the d-gap is ~1% of the
    # pair distance — far inside the regime where the old difference-form
    # serial path could disagree with the batched decomposition, but
    # outside f32 matmul-reorder noise (EXACT midpoints are bit-ties
    # whose argmin legitimately varies with batch-dependent tiling).
    mids = [
        (sub_c[i] + sub_c[j]) / 2.0 + 5e-3 * (sub_c[i] - sub_c[j])
        for i in range(min(4, len(sub_c)))
        for j in range(i + 1, min(4, len(sub_c)))
    ]
    queries = np.stack(mids + [data[0], data[150], data[299]])
    batch = np.asarray(sa.prepare_query_lambdas_batch(queries))
    # Energy mode looks up the SAME sub-centroid λ array on both paths
    # (the engineered 1% gap protects the argmin), so exact equality is
    # the contract here.
    for q, bl in zip(queries, batch):
        assert sa.prepare_query_lambda(q) == float(bl)

    # Eigen mode (no sub-centroids): same delegation contract — but the
    # λ values come from f32 taumode matmuls whose PADDED batch shape
    # differs between the B=1 and B=3 dispatches, so on TPU MXU tiling
    # the results can differ in the last ulp (ADVICE r3 #2): tight
    # tolerance instead of bit-equality.
    sa_eig = ShardedArrowSpace.from_shards(
        [data[:100], data[100:]], gl, n_devices=4
    )
    assert sa_eig.sub_centroids is None
    b2 = np.asarray(sa_eig.prepare_query_lambdas_batch(queries[:3]))
    for q, bl in zip(queries[:3], b2):
        np.testing.assert_allclose(
            sa_eig.prepare_query_lambda(q), float(bl), rtol=1e-6
        )
