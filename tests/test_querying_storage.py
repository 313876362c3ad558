"""Query/projection + storage roundtrip tests.

Ports behaviours of src_legacy/tests/test_querying_proj.rs (projection
consistency, λ preparation, top-k exactness, JL distance preservation),
test_reduction.rs, and storage/test_storage.rs + test_load_from_storage.rs
(dense/sparse/λ roundtrips, checkpoint completeness, resume-to-search).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from matternet_rs_tpu import eigenmaps
from matternet_rs_tpu.builder import ArrowSpaceBuilder
from matternet_rs_tpu.reduction import ImplicitProjection, compute_jl_dimension
from matternet_rs_tpu.storage import StorageError, parquet as pq
from matternet_rs_tpu.utils.fixtures import make_gaussian_blob, make_moons_hd


# --- JL reduction ----------------------------------------------------------


def test_jl_dimension_formula():
    # r = ceil(8 ln n / eps²) clamped [32, F]
    assert compute_jl_dimension(17, 384, 0.5) == max(
        32, int(np.ceil(8 * np.log(17) / 0.25))
    )
    assert compute_jl_dimension(100, 16, 0.3) == 16     # F < 32 preserved
    assert compute_jl_dimension(10_000, 4096, 0.3) >= 32


def test_jl_distance_preservation():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(200, 512)).astype(np.float32)
    r = compute_jl_dimension(200, 512, 0.3)
    proj = ImplicitProjection(512, r, seed=9)
    Xp = np.asarray(proj.project(X))
    # Sampled pairwise distance ratios within (1 ± 0.5) — loose JL check.
    idx = rng.integers(0, 200, size=(100, 2))
    d_orig = np.linalg.norm(X[idx[:, 0]] - X[idx[:, 1]], axis=1)
    d_proj = np.linalg.norm(Xp[idx[:, 0]] - Xp[idx[:, 1]], axis=1)
    valid = d_orig > 1e-6
    ratios = d_proj[valid] / d_orig[valid]
    assert (ratios > 0.5).all() and (ratios < 1.5).all()


def test_jl_seed_determinism():
    p1 = ImplicitProjection(64, 32, seed=5)
    p2 = ImplicitProjection(64, 32, seed=5)
    p3 = ImplicitProjection(64, 32, seed=6)
    x = jnp.ones(64)
    assert np.allclose(np.asarray(p1.project(x)), np.asarray(p2.project(x)))
    assert not np.allclose(np.asarray(p1.project(x)), np.asarray(p3.project(x)))


def test_projection_scale():
    # rows scaled by 1/sqrt(r): E[‖Px‖²] = ‖x‖².
    proj = ImplicitProjection(1000, 250, seed=1)
    rng = np.random.default_rng(2)
    X = rng.normal(size=(50, 1000)).astype(np.float32)
    norms_o = np.linalg.norm(X, axis=1)
    norms_p = np.linalg.norm(np.asarray(proj.project(X)), axis=1)
    assert np.abs(norms_p / norms_o - 1.0).mean() < 0.2


# --- Query preparation consistency ----------------------------------------


@pytest.fixture(scope="module")
def projected_index():
    data = make_moons_hd(150, 0.05, 0.01, 128, seed=4).astype(np.float32)
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 5)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=12, radius=4.0)
        .with_deterministic_clustering(True)
        .with_dims_reduction(True, rp_eps=0.9)
        .with_seed(3)
    )
    aspace, gl = b.build(data)
    return aspace, gl, data


def test_query_lambda_consistency_with_index(projected_index):
    """An indexed item's prepared query λ matches its stored λ."""
    aspace, gl, data = projected_index
    for i in (0, 50, 149):
        q_lam = aspace.prepare_query_item(data[i], gl)
        stored = float(np.asarray(aspace.lambdas)[i])
        assert q_lam == pytest.approx(stored, abs=5e-4)


def test_topk_exactness(projected_index):
    """Device top-k matches a full numpy re-scoring."""
    aspace, gl, data = projected_index
    q = data[33]
    q_lam = aspace.prepare_query_item(q, gl)
    res = aspace.search_lambda_aware(q, q_lam, 10, alpha=0.7)

    X = np.asarray(aspace.data, np.float64)
    lam = np.asarray(aspace.lambdas, np.float64)
    cos = (X @ q) / np.maximum(
        np.linalg.norm(X, axis=1) * np.linalg.norm(q), 1e-12
    )
    scores = 0.7 * cos + 0.3 * (1.0 - np.minimum(np.abs(lam - q_lam), 1.0))
    ref_top = set(np.argsort(-scores)[:10].tolist())
    got_top = {i for i, _ in res}
    assert len(ref_top & got_top) >= 9     # f32-vs-f64 tie slack


# --- Storage ---------------------------------------------------------------


def test_dense_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    M = rng.normal(size=(37, 11))
    pq.save_dense_matrix(M, tmp_path, "m")
    got = pq.load_dense_matrix(tmp_path / "m.parquet")
    assert np.allclose(got, M)


def test_sparse_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    M = rng.normal(size=(20, 20)) * (rng.random((20, 20)) > 0.8)
    pq.save_sparse_matrix(M, tmp_path, "s")
    got = pq.load_sparse_matrix(tmp_path / "s.parquet")
    assert np.allclose(got, M)


def test_lambda_roundtrip(tmp_path):
    lam = np.linspace(0, 1, 55)
    pq.save_lambdas(lam, tmp_path, "lam")
    got = pq.load_lambdas(tmp_path / "lam.parquet")
    assert np.allclose(got, lam)


def test_missing_file_raises(tmp_path):
    with pytest.raises(StorageError):
        pq.load_dense_matrix(tmp_path / "nope.parquet")


def test_checkpoint_resume_search_identical(tmp_path):
    data = make_gaussian_blob(120, 0.4).astype(np.float32)
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 6)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=10, radius=4.0)
        .with_deterministic_clustering(True)
    )
    aspace, gl = b.build(data)
    pq.save_checkpoint(aspace, gl, b, tmp_path, "ckpt")

    files = {p.name for p in tmp_path.iterdir()}
    assert {
        "ckpt-raw_input.parquet", "ckpt-clustered-dm.parquet",
        "ckpt-gl-matrix.parquet", "ckpt-lambdas.parquet",
        "ckpt-arrowspace_metadata.json",
    } <= files

    a2, gl2 = pq.load_arrowspace(tmp_path, "ckpt")
    # λ, sorted index, and search results survive the roundtrip untouched.
    assert np.allclose(np.asarray(a2.lambdas), np.asarray(aspace.lambdas), atol=1e-6)
    r1 = eigenmaps.search(aspace, data[9], gl, 5)
    r2 = eigenmaps.search(a2, data[9], gl2, 5)
    assert [i for i, _ in r1] == [i for i, _ in r2]


def test_checkpoint_resume_with_projection(tmp_path, projected_index):
    """Seed-only JL state survives persistence (reference stores only the
    8-byte seed, core.rs:1599-1621)."""
    aspace, gl, data = projected_index
    b = ArrowSpaceBuilder()     # metadata carrier
    pq.save_checkpoint(aspace, gl, b, tmp_path, "proj")
    a2, gl2 = pq.load_arrowspace(tmp_path, "proj")
    assert a2.projection is not None
    assert a2.projection.seed == aspace.projection.seed
    q = data[5]
    assert a2.prepare_query_item(q, gl2) == pytest.approx(
        aspace.prepare_query_item(q, gl), abs=1e-5
    )


def test_builder_persistence_hooks(tmp_path):
    data = make_gaussian_blob(80, 0.4).astype(np.float32)
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 5)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=8, radius=4.0)
        .with_deterministic_clustering(True)
        .with_persistence("run1", tmp_path)
    )
    b.build(data)
    files = {p.name for p in tmp_path.iterdir()}
    for tag in ("raw_input", "clustered-dm", "laplacian-input", "gl-matrix", "lambdas"):
        assert f"run1-{tag}.parquet" in files
    assert "run1-arrowspace_metadata.json" in files


def test_metadata_typed_config_preserved(tmp_path):
    data = make_gaussian_blob(80, 0.4).astype(np.float32)
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(0.7, 9, p=3.0, sigma=0.2)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=8, radius=4.0)
        .with_deterministic_clustering(True)
    )
    aspace, gl = b.build(data)
    pq.save_arrowspace_metadata(aspace, b, tmp_path, "meta")
    import json

    doc = json.loads((tmp_path / "meta-arrowspace_metadata.json").read_text())
    assert doc["builder"]["lambda_eps"] == 0.7
    assert doc["builder"]["lambda_k"] == 9
    assert doc["builder"]["lambda_p"] == 3.0
    assert doc["builder"]["lambda_sigma"] == 0.2
    assert doc["arrowspace"]["taumode_mode"] == "median"


def test_multibatch_parquet_roundtrip(tmp_path):
    """Forced multi-row-group Parquet load stays correct
    (reference: parquet.rs:954-972 forced multi-batch test)."""
    import pyarrow.parquet as ppq
    import pyarrow as pa

    rng = np.random.default_rng(8)
    M = rng.normal(size=(1000, 6))
    cols = {f"col_{j}": pa.array(M[:, j]) for j in range(6)}
    table = pa.table(cols).replace_schema_metadata(
        {b"name": b"mb", b"n_rows": b"1000", b"n_cols": b"6"}
    )
    ppq.write_table(table, tmp_path / "mb.parquet", row_group_size=64)
    got = pq.load_dense_matrix(tmp_path / "mb.parquet")
    assert got.shape == (1000, 6)
    assert np.allclose(got, M)


def test_hybrid_union_semantics(projected_index):
    """Hybrid = λ-top-k ∪ high-cosine ∪ semantic-top-1, cosine precedence
    for high-semantic members (core.rs:1197-1323)."""
    aspace, gl, data = projected_index
    q = data[60]
    q_lam = aspace.prepare_query_item(q, gl)
    res = aspace.search_lambda_aware_hybrid(q, q_lam, 6)
    # Self-item has cosine 1.0 > 0.9999 → member with its cosine score.
    top_ids = [i for i, _ in res]
    assert 60 in top_ids
    score = dict(res)[60]
    assert score == pytest.approx(1.0, abs=1e-4)


def test_readonly_dir_raises_storage_error(tmp_path):
    """Reference: readonly-dir error tests (storage/test_storage.rs)."""
    import os
    import stat

    ro = tmp_path / "ro"
    ro.mkdir()
    os.chmod(ro, stat.S_IRUSR | stat.S_IXUSR)
    try:
        if os.access(ro, os.W_OK):     # running as root: chmod may not bind
            pytest.skip("process can write regardless of mode bits")
        with pytest.raises(StorageError):
            pq.save_lambdas(np.ones(5), ro, "x")
    finally:
        os.chmod(ro, stat.S_IRWXU)


def test_energy_checkpoint_resume(tmp_path):
    """Energy-mode state (sub-centroids, λ, centroid map) survives
    persistence; resumed search matches the original."""
    from matternet_rs_tpu import energymaps as emod
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    data = make_energy_test_dataset(150, 32, seed=2).astype(np.float32)
    b = (
        ArrowSpaceBuilder().with_lambda_graph(1.0, 5).with_sparsity_check(False)
        .with_cluster_params(max_clusters=25, radius=16.0)
        .with_deterministic_clustering(True).with_dims_reduction(True).with_seed(4)
    )
    aspace, gl = b.build_energy(
        data, emod.EnergyParams(optical_tokens=15, neighbor_k=5)
    )
    pq.save_checkpoint(aspace, gl, b, tmp_path, "en")
    a2, gl2 = pq.load_arrowspace(tmp_path, "en")
    assert gl2.energy
    assert a2.sub_centroids is not None
    r1 = emod.search_energy(aspace, data[40], gl, 5)
    r2 = emod.search_energy(a2, data[40], gl2, 5)
    assert [i for i, _ in r1] == [i for i, _ in r2]


def test_checkpoint_artifact_manifest(tmp_path):
    """Checkpoint completeness: every artifact the reference's combined
    writer emits (parquet.rs:592-683) exists on disk under its name."""
    from matternet_rs_tpu.builder import ArrowSpaceBuilder
    from matternet_rs_tpu.storage import parquet as pq
    from matternet_rs_tpu.utils.fixtures import make_gaussian_blob

    data = make_gaussian_blob(120, 0.4).astype(np.float32)
    b = (ArrowSpaceBuilder().with_lambda_graph(1.0, 5)
         .with_cluster_params(max_clusters=10, radius=5.0)
         .with_spectral(True).with_sparsity_check(False))
    aspace, gl = b.build(data)
    pq.save_checkpoint(aspace, gl, b, tmp_path, "m")

    expected = [
        "m-raw_input.parquet",
        "m-clustered-dm.parquet",
        "m-gl-matrix.parquet",
        "m-aspace-signals.parquet",     # spectral enabled
        "m-lambdas.parquet",
        "m-arrowspace_metadata.json",
    ]
    for fname in expected:
        assert (tmp_path / fname).exists(), f"missing artifact {fname}"
    # Energy-mode artifacts absent for an eigen build.
    assert not (tmp_path / "m-sub-centroids.parquet").exists()


# --- ported storage edge-case classes (test_storage.rs:162-545,
#     test_load_from_storage.rs:308-520) ------------------------------------


def _tiny_checkpoint(tmp_path, name="ck", n=80):
    data = make_gaussian_blob(n, 0.4).astype(np.float32)
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 6)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=8, radius=4.0)
        .with_deterministic_clustering(True)
    )
    aspace, gl = b.build(data)
    pq.save_checkpoint(aspace, gl, b, tmp_path, name)
    return data, aspace, gl, b


def test_sparse_matrix_empty_roundtrip(tmp_path):
    z = np.zeros((6, 6), np.float32)
    pq.save_sparse_matrix(z, tmp_path, "empty")
    back = pq.load_sparse_matrix(tmp_path / "empty.parquet")
    np.testing.assert_array_equal(back, z)


def test_dense_matrix_extreme_dimensions(tmp_path):
    for arr in (
        np.random.default_rng(0).standard_normal((1, 4096)).astype(np.float32),
        np.random.default_rng(1).standard_normal((4096, 1)).astype(np.float32),
    ):
        pq.save_dense_matrix(arr, tmp_path, "wide")
        back = pq.load_dense_matrix(tmp_path / "wide.parquet")
        assert back.shape == arr.shape
        np.testing.assert_allclose(back, arr, atol=1e-6)


def test_multiple_checkpoints_same_directory(tmp_path):
    d1, a1, g1, _ = _tiny_checkpoint(tmp_path, "alpha", n=70)
    d2, a2, g2, _ = _tiny_checkpoint(tmp_path, "beta", n=90)
    ra, gla = pq.load_arrowspace(tmp_path, "alpha")
    rb, glb = pq.load_arrowspace(tmp_path, "beta")
    assert ra.nitems == 70 and rb.nitems == 90
    np.testing.assert_allclose(
        np.asarray(ra.lambdas), np.asarray(a1.lambdas), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(rb.lambdas), np.asarray(a2.lambdas), atol=1e-6
    )


def test_lambda_count_mismatch_raises(tmp_path):
    _tiny_checkpoint(tmp_path, "ck")
    # Corrupt: replace the λ artifact with one of the wrong length.
    pq.save_lambdas(np.zeros(7, np.float32), tmp_path, "ck-lambdas")
    with pytest.raises(StorageError, match="lambda count"):
        pq.load_arrowspace(tmp_path, "ck")


def test_metadata_json_format(tmp_path):
    import json

    _tiny_checkpoint(tmp_path, "ck")
    doc = json.loads((tmp_path / "ck-arrowspace_metadata.json").read_text())
    assert doc["version"] == 1
    assert doc["name"] == "ck"
    for key in ("nfeatures", "nitems", "taumode_mode", "min_lambdas",
                "n_clusters"):
        assert key in doc["arrowspace"]
    for key in ("lambda_eps", "lambda_k", "synthesis_mode",
                "cluster_max_clusters"):
        assert key in doc["builder"]


def test_metadata_config_summary():
    b = ArrowSpaceBuilder().with_lambda_graph(0.5, 9).with_seed(3)
    s = pq.config_summary(b)
    assert "lambda_eps=0.5" in s
    assert "lambda_k=9" in s
    assert "synthesis" in s


def test_loaded_gl_matrix_structure(tmp_path):
    # Square, positive diagonal for connected nodes, reasonably sparse
    # (test_load_from_storage.rs:349-386).
    _tiny_checkpoint(tmp_path, "ck")
    from matternet_rs_tpu.graph import GraphParams

    gl = pq.load_graph_laplacian(tmp_path, "ck", GraphParams(eps=1.0, k=6))
    M = np.asarray(gl.dense())
    assert M.shape[0] == M.shape[1] == gl.nnodes
    d = np.diag(M)
    assert (d >= 0).all()
    assert (d > 0).any(), "at least some nodes must be connected"


def test_checkpoint_manifest_file_sizes(tmp_path):
    """Metadata carries a per-artifact FileInfo manifest with real on-disk
    sizes and the sparse nnz (test_storage.rs:530-543 file-size tracking +
    checkpoint metadata completeness, parquet.rs:663-683)."""
    import json

    _tiny_checkpoint(tmp_path, "ck")
    doc = json.loads((tmp_path / "ck-arrowspace_metadata.json").read_text())
    files = doc["files"]
    for key in ("raw_input", "clustered_dm", "gl_matrix", "lambdas"):
        info = files[key]
        actual = (tmp_path / info["filename"]).stat().st_size
        assert info["size_bytes"] == actual > 0
    assert files["gl_matrix"]["file_type"] == "sparse"
    assert files["gl_matrix"]["nnz"] > 0
    assert files["raw_input"]["rows"] == 80
    assert files["lambdas"]["rows"] == 80


def test_checkpoint_manifest_missing_artifact_raises(tmp_path):
    """A manifest entry whose file vanished must fail the resume up front
    (stronger than the reference, which only records the manifest)."""
    _tiny_checkpoint(tmp_path, "ck")
    (tmp_path / "ck-gl-matrix.parquet").unlink()
    with pytest.raises(StorageError, match="manifest lists artifact"):
        pq.load_arrowspace(tmp_path, "ck")


def test_save_arrowspace_overwrite_protection(tmp_path):
    """Second save of the same name overwrites cleanly
    (test_load_from_storage.rs:500-519)."""
    import time

    _, aspace, gl, b = _tiny_checkpoint(tmp_path, "v1")
    meta = tmp_path / "v1-arrowspace_metadata.json"
    mtime_v1 = meta.stat().st_mtime_ns
    time.sleep(0.02)
    pq.save_checkpoint(aspace, gl, b, tmp_path, "v1")
    assert meta.stat().st_mtime_ns > mtime_v1
    # Still loadable after the overwrite.
    a2, _ = pq.load_arrowspace(tmp_path, "v1")
    assert a2.nitems == aspace.nitems
