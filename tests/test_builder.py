"""Builder end-to-end tests (eigen pipeline).

Ports the reference build suite behaviours (src_legacy/tests/test_builder.rs,
test_eigenmaps.rs staged-vs-monolithic equivalence)."""

import numpy as np
import pytest

from matternet_rs_tpu import eigenmaps as em
from matternet_rs_tpu.builder import ArrowSpaceBuilder
from matternet_rs_tpu.core import ArrowSpace, TauMode
from matternet_rs_tpu.utils.fixtures import make_gaussian_blob, make_moons_hd


def small_builder(**kw) -> ArrowSpaceBuilder:
    b = ArrowSpaceBuilder().with_lambda_graph(1.0, 5).with_sparsity_check(False)
    b.with_cluster_params(max_clusters=12, radius=4.0)
    b.with_deterministic_clustering(True)
    for k, v in kw.items():
        setattr(b, k, v)
    return b


@pytest.fixture(scope="module")
def blob():
    return make_gaussian_blob(100, 0.4).astype(np.float32)


def test_build_end_to_end(blob):
    aspace, gl = small_builder().build(blob)
    assert aspace.nitems == 100
    lam = np.asarray(aspace.lambdas)
    assert lam.shape == (100,)
    assert np.isfinite(lam).all()
    assert lam.min() >= 0.0 and lam.max() <= 1.0
    assert gl.matrix.shape == (10, 10)   # F×F feature-space Laplacian
    assert gl.nnodes == 100
    assert aspace.lambdas_sorted is not None


def test_build_then_search_self_retrieval(blob):
    aspace, gl = small_builder().build(blob)
    res = em.search(aspace, blob[13], gl, k=5, alpha=0.7)
    assert res[0][0] == 13


def test_staged_equals_monolithic(blob):
    """The staged API must reproduce the builder's results
    (test_eigenmaps.rs:105-429)."""
    b1 = small_builder()
    aspace1, gl1 = b1.build(blob)

    b2 = small_builder()
    b2.define_result_k()
    aspace2, centroids = b2.start_clustering(blob)
    gl2 = em.eigenmaps(aspace2, b2, centroids, len(blob))
    em.compute_taumode(aspace2, gl2)
    aspace2.build_lambdas_sorted()

    assert np.allclose(np.asarray(gl1.matrix), np.asarray(gl2.matrix), atol=1e-6)
    assert np.allclose(
        np.asarray(aspace1.lambdas), np.asarray(aspace2.lambdas), atol=1e-6
    )
    q = blob[7]
    r1 = em.search(aspace1, q, gl1, 5)
    r2 = em.search(aspace2, q, gl2, 5)
    assert [i for i, _ in r1] == [i for i, _ in r2]


def test_build_with_spectral_signals(blob):
    aspace, gl = small_builder(prebuilt_spectral=True).build(blob)
    assert aspace.signals is not None
    assert aspace.signals.shape == gl.matrix.shape


def test_build_with_taumode_variants(blob):
    lam_med = np.asarray(small_builder().build(blob)[0].lambdas)
    b = small_builder()
    b.with_synthesis(TauMode.mean())
    lam_mean = np.asarray(b.build(blob)[0].lambdas)
    assert lam_med.shape == lam_mean.shape
    # Different τ policies yield different (normalized) distributions.
    assert not np.allclose(lam_med, lam_mean, atol=1e-6)


def test_build_heuristic_clustering_requires_seed(blob):
    b = ArrowSpaceBuilder().with_lambda_graph(1.0, 5).with_sparsity_check(False)
    with pytest.raises(ValueError, match="clustering_seed"):
        b.build(blob)


def test_build_heuristic_clustering_with_seed(blob):
    b = ArrowSpaceBuilder().with_lambda_graph(1.0, 5).with_sparsity_check(False)
    b.with_seed(42)
    aspace, gl = b.build(blob)
    assert aspace.n_clusters >= 2
    assert np.isfinite(np.asarray(aspace.lambdas)).all()


def test_define_result_k_heuristic():
    b = ArrowSpaceBuilder()
    b.lambda_k = 4
    b.define_result_k()
    assert b.lambda_topk == 3
    b.lambda_k = 8
    b.define_result_k()
    assert b.lambda_topk == 4
    b.lambda_k = 20
    b.lambda_topk = 11
    b.define_result_k()
    assert b.lambda_topk == 11   # left to the user for large k


def test_build_normalised_moons():
    data = make_moons_hd(80, 0.05, 0.01, 12, seed=5).astype(np.float32)
    b = small_builder(normalise=True)
    aspace, gl = b.build(data)
    assert np.isfinite(np.asarray(aspace.lambdas)).all()


def test_build_with_dims_reduction():
    data = make_moons_hd(120, 0.05, 0.01, 128, seed=6).astype(np.float32)
    b = ArrowSpaceBuilder().with_lambda_graph(1.0, 5).with_sparsity_check(False)
    b.with_cluster_params(max_clusters=10, radius=4.0)
    b.with_deterministic_clustering(True)
    b.with_dims_reduction(True, rp_eps=0.9)
    b.with_seed(7)
    aspace, gl = b.build(data)
    if aspace.projection is not None:
        assert gl.matrix.shape[0] == aspace.reduced_dim
        # Query path must still accept original-dim queries.
        res = em.search(aspace, data[3], gl, 5)
        assert len(res) == 5


def test_radius_impacts_cluster_count(blob):
    """Larger radius ⇒ fewer clusters (test_builder.rs radius-impact)."""
    def n_clusters(radius):
        b = small_builder()
        b.with_cluster_params(max_clusters=50, radius=radius)
        aspace, _ = b.build(blob)
        return aspace.n_clusters

    assert n_clusters(2.0) >= n_clusters(50.0)


def test_normalisation_changes_graph(blob):
    """normalise=True (column z-scoring) changes the Laplacian topology."""
    a1, gl1 = small_builder().build(blob)
    a2, gl2 = small_builder(normalise=True).build(blob)
    assert not np.allclose(np.asarray(gl1.matrix), np.asarray(gl2.matrix), atol=1e-6)


def test_eps_impacts_graph_density(blob):
    b_loose = small_builder()
    b_loose.lambda_eps = 1.0
    b_tight = small_builder()
    b_tight.lambda_eps = 0.05
    _, gl_loose = b_loose.build(blob)
    _, gl_tight = b_tight.build(blob)
    assert gl_tight.nnz(tol=1e-9) <= gl_loose.nnz(tol=1e-9)


def test_energy_vs_eigen_search_overlap():
    """Energy retrieval finds related items to eigen retrieval on structured
    data (test_energy_search.rs precision/recall-vs-standard behaviour —
    weak overlap assertion, the pipelines rank differently by design)."""
    from matternet_rs_tpu import energymaps as emod
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    data = make_energy_test_dataset(200, 32, seed=3).astype(np.float32)
    be = (
        ArrowSpaceBuilder().with_lambda_graph(1.0, 5).with_sparsity_check(False)
        .with_cluster_params(max_clusters=30, radius=16.0)
        .with_deterministic_clustering(True).with_dims_reduction(True).with_seed(5)
    )
    aspace_en, gl_en = be.build_energy(
        data, emod.EnergyParams(optical_tokens=20, neighbor_k=5)
    )
    # Same-cluster items: energy search should return same-cluster members
    # in its top-k (items 0-39 are cluster 0 of the fixture).
    res = emod.search_energy(aspace_en, data[5], gl_en, k=20)
    same_cluster = sum(1 for i, _ in res if i < 40)
    assert same_cluster >= 5


def test_alpha_one_is_pure_cosine(blob):
    """α=1 reduces λ-aware search to cosine ranking."""
    aspace, gl = small_builder().build(blob)
    q = blob[3]
    q_lam = aspace.prepare_query_item(q, gl)
    res = aspace.search_lambda_aware(q, q_lam, 5, alpha=1.0)
    X = np.asarray(aspace.data, np.float64)
    cos = (X @ q) / np.maximum(
        np.linalg.norm(X, axis=1) * np.linalg.norm(q), 1e-12
    )
    ref = np.argsort(-cos, kind="stable")[:5]
    assert len(set(i for i, _ in res) & set(ref.tolist())) >= 4


def test_device_resident_rebuild_matches_plain_build(blob):
    """``build(rows, device_rows=prev.data)`` (the parameter-sweep rebuild
    that skips the corpus H2D upload) must produce an index identical to a
    plain build: same clustering (host rows drive the exact scan), same
    graph, bit-equal λ (the device corpus IS the same buffer)."""
    import jax.numpy as jnp

    aspace1, gl1 = small_builder().build(blob)
    aspace2, gl2 = small_builder().build(blob, device_rows=aspace1.data)

    assert aspace2.data is aspace1.data          # reused, not re-uploaded
    np.testing.assert_array_equal(
        np.asarray(aspace1.lambdas), np.asarray(aspace2.lambdas)
    )
    np.testing.assert_array_equal(
        np.asarray(gl1.dense()), np.asarray(gl2.dense())
    )
    q = blob[7]
    ql1 = aspace1.prepare_query_item(q, gl1)
    ql2 = aspace2.prepare_query_item(q, gl2)
    assert ql1 == ql2
    assert aspace1.search_lambda_aware(q, ql1, 5) == \
        aspace2.search_lambda_aware(q, ql2, 5)

    # Shape-mismatched device_rows is rejected loudly.
    with pytest.raises(ValueError, match="device_rows shape"):
        small_builder().build(blob, device_rows=jnp.zeros((3, 3), jnp.float32))
    # A reduced-precision device copy no longer equals `rows` — rejected
    # rather than silently building the index from rounded data.
    with pytest.raises(ValueError, match="device_rows dtype"):
        small_builder().build(
            blob, device_rows=aspace1.data.astype(jnp.bfloat16)
        )
