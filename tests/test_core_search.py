"""ArrowSpace container + search path tests.

Covers the reference behaviours of core.rs: λ normalization invariants,
query preparation (incl. undecidable-query error and NaN rejection),
λ-aware / hybrid / sorted / range search (test_arrow.rs, test_querying_proj.rs).
"""

import time

import numpy as np
import pytest

from matternet_rs_tpu.core import ArrowSpace, TauMode, UndecidableQueryError
from matternet_rs_tpu.graph import GraphParams
from matternet_rs_tpu.index.sorted import SortedLambdas
from matternet_rs_tpu.ops import laplacian as lap
from matternet_rs_tpu.utils.fixtures import make_gaussian_blob


@pytest.fixture(scope="module")
def built():
    data = make_gaussian_blob(80, 0.5).astype(np.float32)
    aspace = ArrowSpace.from_items(data)
    params = GraphParams(eps=1.0, k=5, topk=5, sparsity_check=False)
    gl = lap.build_laplacian_from_k_cluster(
        data[:10], params, n_items=len(data)
    )
    aspace.compute_taumode(gl)
    aspace.build_lambdas_sorted()
    return aspace, gl, data


def test_lambdas_normalized_to_unit_interval(built):
    aspace, _, _ = built
    lam = np.asarray(aspace.lambdas)
    assert lam.min() >= -1e-6 and lam.max() <= 1.0 + 1e-6
    assert lam.max() == pytest.approx(1.0, abs=1e-5)
    assert lam.min() == pytest.approx(0.0, abs=1e-5)


def test_lambda_stats_consistent(built):
    aspace, _, _ = built
    assert aspace.range_lambdas >= 1e-9
    assert aspace.max_lambdas >= aspace.min_lambdas


def test_prepare_query_item(built):
    aspace, gl, data = built
    lam = aspace.prepare_query_item(data[3], gl)
    assert 0.0 <= lam <= 1.0


def test_prepare_query_rejects_nan(built):
    aspace, gl, data = built
    q = data[0].copy()
    q[0] = np.nan
    with pytest.raises(ValueError, match="non-finite"):
        aspace.prepare_query_item(q, gl)


def test_prepare_query_rejects_mismatched_dim(built):
    aspace, gl, _ = built
    with pytest.raises(ValueError):
        aspace.project_query(np.zeros(3, np.float32))


def test_zero_query_is_undecidable(built):
    aspace, gl, _ = built
    with pytest.raises(UndecidableQueryError):
        aspace.prepare_query_item(np.zeros(aspace.nfeatures, np.float32), gl)


def test_self_search_top1(built):
    """Self-retrieval: querying an indexed item returns it first."""
    aspace, gl, data = built
    for i in (0, 17, 42):
        lam = aspace.prepare_query_item(data[i], gl)
        res = aspace.search_lambda_aware(data[i], lam, 5, alpha=0.7)
        assert res[0][0] == i
        assert res[0][1] == pytest.approx(1.0, abs=1e-4)


def test_search_requires_prepared_lambda(built):
    aspace, _, data = built
    with pytest.raises(ValueError, match="prepare the item"):
        aspace.search_lambda_aware(data[0], 0.0, 5)


def test_search_scores_sorted_desc(built):
    aspace, gl, data = built
    lam = aspace.prepare_query_item(data[5], gl)
    res = aspace.search_lambda_aware(data[5], lam, 10)
    scores = [s for _, s in res]
    assert scores == sorted(scores, reverse=True)
    assert len(res) == 10


def test_hybrid_includes_semantic_top(built):
    aspace, gl, data = built
    q = data[7]
    lam = aspace.prepare_query_item(q, gl)
    res = aspace.search_lambda_aware_hybrid(q, lam, 5)
    # The semantic top-1 for a self-query is the item itself.
    assert any(i == 7 for i, _ in res)


def test_hybrid_matches_plain_on_small_k(built):
    aspace, gl, data = built
    q = data[11]
    lam = aspace.prepare_query_item(q, gl)
    plain = {i for i, _ in aspace.search_lambda_aware(q, lam, 3)}
    hybrid = {i for i, _ in aspace.search_lambda_aware_hybrid(q, lam, 3)}
    assert len(plain & hybrid) >= 1


def test_range_search(built):
    aspace, gl, data = built
    lam = aspace.prepare_query_item(data[2], gl)
    res = aspace.range_search(data[2], lam, eps=0.1)
    lamarr = np.asarray(aspace.lambdas)
    for i, d in res:
        assert lam - lamarr[i] <= 0.1 + 1e-6


def test_search_linear_sorted(built):
    aspace, gl, data = built
    res = aspace.search_linear_sorted(data[4], gl, 5)
    assert len(res) <= 5
    lamarr = np.asarray(aspace.lambdas)
    for i, l in res:
        assert l == pytest.approx(float(lamarr[i]), abs=1e-6)


# --- SortedLambdas unit behaviour ----------------------------------------


def test_sorted_lambdas_roundtrip():
    lam = np.array([0.5, 0.1, 0.9, 0.1, 0.3])
    idx = SortedLambdas.build_from(lam)
    vec = idx.to_vec()
    assert [v for v, _ in vec] == sorted(lam.tolist())
    # equal-λ ties keep ascending item order
    tie_items = [i for v, i in vec if v == 0.1]
    assert tie_items == [1, 3]


def test_sorted_lambdas_band_query():
    lam = np.linspace(0, 1, 101)
    idx = SortedLambdas.build_from(lam)
    out = idx.range_bylambda(0.5, k=5, p=2.0)
    assert len(out) == 5
    band = idx.std_dev / 4.0
    for i, l in out:
        assert abs(l - 0.5) <= band + 1e-9


def test_k_nearest_by_lambda_expanding():
    lam = np.linspace(0, 1, 50)
    idx = SortedLambdas.build_from(lam)
    out = idx.k_nearest_by_lambda(0.42, k=7, lambda_p=0.5)
    assert len(out) == 7
    dists = [abs(l - 0.42) for _, l in out]
    assert dists == sorted(dists)


def test_device_sorted_index_matches_host():
    from matternet_rs_tpu.index.sorted import DeviceSortedLambdas

    lam = np.linspace(0, 1, 101)
    host = SortedLambdas.build_from(lam)
    dev = DeviceSortedLambdas.build_from(lam)
    assert dev.std_dev == pytest.approx(host.std_dev, abs=1e-5)
    h = host.range_bylambda(0.5, 7, 2.0)
    d = dev.range_bylambda(0.5, 7, 2.0)
    assert [i for i, _ in h] == [i for i, _ in d]
    # Host fallbacks through the lazy view.
    hk = host.k_nearest_by_lambda(0.42, 5, 0.5)
    dk = dev.k_nearest_by_lambda(0.42, 5, 0.5)
    assert [i for i, _ in hk] == [i for i, _ in dk]


def test_banded_search_converges_to_full_scan(built):
    """With window >= N the banded search equals the full scan."""
    aspace, gl, data = built
    q = data[25]
    q_lam = aspace.prepare_query_item(q, gl)
    full = aspace.search_lambda_aware(q, q_lam, 5)
    banded = aspace.search_lambda_banded(q, q_lam, 5, window=4096)
    assert [i for i, _ in full] == [i for i, _ in banded]
    for (_, a), (_, b) in zip(full, banded):
        assert a == pytest.approx(b, abs=1e-5)


def test_banded_search_small_window_self_retrieval(built):
    aspace, gl, data = built
    q = data[33]
    q_lam = aspace.prepare_query_item(q, gl)
    res = aspace.search_lambda_banded(q, q_lam, 3, window=16)
    assert res[0][0] == 33     # self item is inside its own λ-band


def test_arrow_item_ops():
    from matternet_rs_tpu.core import ArrowItem

    a = ArrowItem([1.0, 2.0, 3.0], 0.5)
    b = ArrowItem([4.0, 5.0, 6.0], 0.6)
    assert a.dot(b) == pytest.approx(32.0)
    assert a.cosine_similarity(a) == pytest.approx(1.0)
    assert a.lambda_component_similarity(b) == pytest.approx(0.9)
    s = a.lambda_similarity(b, 0.7)
    assert 0.0 <= s <= 1.0
    a.scale(2.0)
    assert len(a) == 3 and a.item[0] == 2.0
    with pytest.raises(ValueError):
        a.dot(ArrowItem([1.0]))


def test_load_graph_laplacian_standalone(built, tmp_path):
    from matternet_rs_tpu.storage import parquet as pq

    aspace, gl, data = built
    pq.save_sparse_matrix(np.asarray(gl.matrix), tmp_path, "g-gl-matrix")
    pq.save_dense_matrix(np.asarray(gl.init_data), tmp_path, "g-clustered-dm")
    gl2 = pq.load_graph_laplacian(tmp_path, "g", gl.graph_params)
    assert np.allclose(np.asarray(gl2.matrix), np.asarray(gl.matrix), atol=1e-6)
    assert gl2.verify_properties()["symmetric"]


def test_approx_search_close_to_exact(built):
    aspace, gl, data = built
    q = data[12]
    q_lam = aspace.prepare_query_item(q, gl)
    exact = {i for i, _ in aspace.search_lambda_aware(q, q_lam, 10)}
    approx = {i for i, _ in aspace.search_lambda_aware(q, q_lam, 10, approx=True)}
    assert len(exact & approx) >= 8
    # Self-item always survives approximate selection.
    assert 12 in approx


def test_search_batch_matches_single(built):
    aspace, gl, data = built
    Q = data[[3, 8, 21]]
    idx, sc = aspace.search_batch(Q, gl, k=5)
    assert idx.shape == (3, 5)
    for b, qi in enumerate((3, 8, 21)):
        single = aspace.search_lambda_aware(
            data[qi], aspace.prepare_query_item(data[qi], gl), 5
        )
        assert idx[b].tolist() == [i for i, _ in single]


def test_add_items_incremental(built):
    aspace, gl, data = built
    n0 = aspace.nitems
    new = data[:3] + 0.01
    aspace.add_items(new, gl)
    assert aspace.nitems == n0 + 3
    # The inserted items are retrievable (near-duplicates of items 0-2).
    q = np.asarray(new[0])
    lam = aspace.prepare_query_item(q, gl)
    res = aspace.search_lambda_aware(q, lam, 3)
    assert res[0][0] in (0, n0)     # original or inserted twin wins
    with pytest.raises(ValueError, match="dimension"):
        aspace.add_items(np.ones((1, 3), np.float32), gl)


def test_search_k_nearest_by_lambda(built):
    aspace, gl, data = built
    res = aspace.search_k_nearest_by_lambda(data[6], gl, 5)
    assert 1 <= len(res) <= 5
    q_lam = aspace.prepare_query_item(data[6], gl)
    dists = [abs(l - q_lam) for _, l in res]
    assert dists == sorted(dists)


def test_tiled_batched_search_exact_across_tiles():
    """The tile-max pruned batched top-k (the production large-N exact
    selection) is EXACT at N spanning many tiles: equality with a flat
    full-sort ground truth, including tile-boundary padding and duplicate
    scores (tie indices may substitute; scores must be the exact
    multiset and the returned indices must score what they claim)."""
    import numpy as np
    import jax.numpy as jnp

    from matternet_rs_tpu.ops import search as search_ops

    rng = np.random.default_rng(0)
    n, f, b, k, tile = 20_000 + 37, 24, 7, 10, 1024   # non-multiple of tile
    X = rng.normal(size=(n, f)).astype(np.float32)
    X[500] = X[400]                                    # exact duplicate rows
    lambdas = rng.random(n).astype(np.float32)
    lambdas[500] = lambdas[400]                        # duplicate scores too
    queries = X[rng.integers(0, n, b)] + 0.01 * rng.normal(size=(b, f)).astype(np.float32)
    q_lams = rng.random(b).astype(np.float32)

    norms = np.linalg.norm(X, axis=1).astype(np.float32)
    idx, sc = search_ops.search_lambda_aware_tilemax(
        jnp.asarray(X), jnp.asarray(norms), jnp.asarray(lambdas),
        jnp.asarray(queries), jnp.asarray(q_lams), k,
        jnp.float32(0.7), tile=tile,
    )
    idx, sc = np.asarray(idx), np.asarray(sc)

    # Flat ground truth in f64 scoring of the SAME f32 score function.
    Xn = X / np.maximum(norms, 1e-12)[:, None]
    for qi in range(b):
        q = queries[qi]
        qn = max(np.linalg.norm(q), 1e-12)
        cos = (X @ q) / np.maximum(norms * qn, 1e-12)
        lam_sim = 1.0 - np.minimum(np.abs(lambdas - q_lams[qi]), 1.0)
        scores = 0.7 * cos + 0.3 * lam_sim
        gt_scores = np.sort(scores)[::-1][:k]
        np.testing.assert_allclose(np.sort(sc[qi])[::-1], gt_scores, atol=2e-5)
        # The returned indices really score what they claim.
        np.testing.assert_allclose(scores[idx[qi]], sc[qi], atol=2e-5)


# ---------------------------------------------------------------------------
# bf16 quantized scan (memory-bound throughput path, ops/search._scan_dots)
# ---------------------------------------------------------------------------


def test_quantized_scan_self_top1(built):
    aspace, gl, data = built
    ql = aspace.prepare_query_item(data[7], gl)
    res = aspace.search_lambda_aware(data[7], ql, 5, quantized=True)
    assert res[0][0] == 7


def test_quantized_scan_high_overlap_with_f32(built):
    aspace, gl, data = built
    rng = np.random.default_rng(4)
    overlaps = []
    for i in rng.integers(0, len(data), 16):
        q = data[i] + rng.normal(0, 0.05, data.shape[1]).astype(np.float32)
        ql = aspace.prepare_query_item(q, gl)
        exact = [j for j, _ in aspace.search_lambda_aware(q, ql, 10)]
        quant = [j for j, _ in aspace.search_lambda_aware(q, ql, 10, quantized=True)]
        overlaps.append(len(set(exact) & set(quant)) / 10)
    assert np.mean(overlaps) >= 0.9, f"bf16 overlap {np.mean(overlaps):.3f}"


def test_quantized_scan_scores_close(built):
    aspace, gl, data = built
    ql = aspace.prepare_query_item(data[3], gl)
    exact = dict(aspace.search_lambda_aware(data[3], ql, 10))
    quant = dict(aspace.search_lambda_aware(data[3], ql, 10, quantized=True))
    common = set(exact) & set(quant)
    assert common
    for i in common:
        assert abs(exact[i] - quant[i]) < 0.01


def test_quantized_batch_matches_serial(built):
    aspace, gl, data = built
    Q = data[[3, 9, 21]]
    idx, _ = aspace.search_batch(Q, gl, 5, quantized=True)
    for r, i in enumerate((3, 9, 21)):
        ql = aspace.prepare_query_item(data[i], gl)
        serial = aspace.search_lambda_aware(data[i], ql, 5, quantized=True)
        assert idx[r].tolist() == [j for j, _ in serial]


def test_quantized_cache_invalidated_on_add(built):
    aspace, gl, data = built
    aspace.enable_quantized_scan()
    n0 = aspace._data_bf16.shape[0]
    aspace.add_items(data[:2] + 0.01, gl)
    ql = aspace.prepare_query_item(data[5], gl)
    res = aspace.search_lambda_aware(data[5], ql, 5, quantized=True)
    assert aspace._data_bf16.shape[0] == n0 + 2
    assert res[0][0] == 5


def test_sorted_lambdas_zadd_insert():
    """Single sorted insert keeps order and tie semantics
    (sorted_index.rs:22-29)."""
    sl = SortedLambdas.build_from(np.array([0.1, 0.5, 0.9]))
    sl.zadd(7, 0.5)      # tie: appends after the existing 0.5
    sl.zadd(8, 0.0)      # new minimum
    sl.zadd(9, 1.0)      # new maximum
    assert sl.sorted_lambdas.tolist() == [0.0, 0.1, 0.5, 0.5, 0.9, 1.0]
    assert sl.sorted_indices.tolist() == [8, 0, 1, 7, 2, 9]
    # Band query still works over the mutated index.
    res = sl.range_bylambda(0.5, 10, 2.0)
    assert {i for i, _ in res} >= {1, 7}


def test_search_without_taumode_raises_clearly():
    """Searching before compute_taumode must fail with a clear message,
    not a tracer TypeError (test_eigenmaps.rs
    test_search_without_taumode_panics)."""
    data = make_gaussian_blob(60, 0.5).astype(np.float32)
    aspace = ArrowSpace.from_items(data)
    gl = lap.build_laplacian_from_k_cluster(
        data[:8], GraphParams(eps=1.0, k=5, sparsity_check=False),
        n_items=len(data),
    )
    with pytest.raises(RuntimeError, match="lambdas not computed"):
        aspace.search_lambda_aware(data[3], 0.5, 5)
    with pytest.raises(RuntimeError, match="lambdas not computed"):
        aspace.search_batch(data[:4], gl, 5)
    with pytest.raises(RuntimeError, match="lambdas not computed"):
        aspace.search_lambda_aware_hybrid(data[3], 0.5, 5)
    with pytest.raises(RuntimeError, match="lambdas not computed"):
        aspace.search_linear_sorted(data[3], gl, 5)
    with pytest.raises(RuntimeError, match="lambdas not computed"):
        aspace.range_search(data[3], 0.5, 0.1)


# int8 two-stage scan (int8 candidates + exact on-device rescore)
def test_int8_rescored_fused_routing_glue(monkeypatch):
    """When the fused predicate holds, the ``"int8_rescored"`` tier
    dispatches the maxima-first path with the INT8 corpus as the scan
    operand and the dequant multiplier as ``scan_rn`` (CPU always takes
    the XLA fallback — the platform-gated predicate is forced here to
    pin the glue the on-chip routing uses)."""
    import jax.numpy as jnp

    from matternet_rs_tpu import core as core_mod
    from matternet_rs_tpu.ops import search as so

    n, f, b, k = 64, 8, 4, 3
    rng_np = np.random.default_rng(0)
    X = jnp.asarray(rng_np.standard_normal((n, f), dtype=np.float32))
    X8, mult = core_mod._quantize_rows_device_jit(X)
    norms = jnp.sqrt(jnp.sum(X * X, axis=1))
    lams = jnp.asarray(rng_np.random(n, dtype=np.float32))
    seen = {}

    def fake_fused(Xs, Xf, nrm, lam, Qq, ql, kk, cand, alphas,
                   t=so.DEFAULT_TILE, scan_rn=None):
        seen["scan_dtype"] = Xs.dtype
        seen["scan_rn_is_mult"] = scan_rn is mult
        return (jnp.zeros((b, kk), jnp.int32),
                jnp.zeros((b, kk), jnp.float32))

    monkeypatch.setattr(so, "fused_rescored_path", lambda *a, **kw: True)
    monkeypatch.setattr(so, "fused_scan_rescored", fake_fused)
    core_mod._batched_search_i8r_jit.__wrapped__(
        X8, mult, X, norms, lams, X[:b], lams[:b],
        jnp.float32(0.0), jnp.float32(1.0), k, 16,
        jnp.full((b,), 0.7, jnp.float32), True,
    )
    assert seen["scan_dtype"] == jnp.int8
    assert seen["scan_rn_is_mult"]


def test_int8_auto_routes_by_batch_size(built, monkeypatch):
    """``quantized="int8_auto"`` applies the measured crossover: the
    maxima-first tier below 1024 padded queries, the pool-cut tier WITH
    approx selection from 1024 (TUNING "speed ladder")."""
    from matternet_rs_tpu import core as core_mod

    aspace, gl, data = built
    calls = []
    real_i8r = core_mod._batched_search_i8r_jit
    real_i8 = core_mod._batched_search_int8_jit

    def spy_i8r(*a, **kw):
        calls.append(("i8r", a[-1]))
        return real_i8r(*a, **kw)

    def spy_i8(*a, **kw):
        calls.append(("int8", a[-1]))          # last arg = approx
        return real_i8(*a, **kw)

    monkeypatch.setattr(core_mod, "_batched_search_i8r_jit", spy_i8r)
    monkeypatch.setattr(core_mod, "_batched_search_int8_jit", spy_i8)

    aspace.search_batch(data[:8], gl, 5, quantized="int8_auto")
    assert calls[-1] == ("i8r", False)
    big = np.repeat(data[:8], 128, axis=0)     # 1024 queries
    aspace.search_batch(big, gl, 5, quantized="int8_auto")
    assert calls[-1] == ("int8", True)         # pool-cut + approx forced


def test_int8_rescored_full_pool_matches_f32_exactly(built):
    """``candidates=N`` forces the pool-cut fallback whose rescore sees
    every row — the tier's exactness escape hatch, same contract as the
    bf16 rescored tiers."""
    aspace, gl, data = built
    Q = data[[3, 17, 41, 66]]
    ref_ids, ref_sc = aspace.search_batch(Q, gl, 5)
    got_ids, got_sc = aspace.search_batch(
        Q, gl, 5, quantized="int8_rescored", candidates=len(data)
    )
    np.testing.assert_array_equal(got_ids, ref_ids)
    np.testing.assert_allclose(got_sc, ref_sc, atol=1e-5)


def test_int8_rescored_default_pool_self_top1_and_overlap(built):
    aspace, gl, data = built
    Q = data[:16]
    got_ids, _ = aspace.search_batch(Q, gl, 5, quantized="int8_rescored")
    assert np.all(got_ids[:, 0] == np.arange(16))
    ref_ids, _ = aspace.search_batch(Q, gl, 5)
    overlap = np.mean([
        len(set(got_ids[i]) & set(ref_ids[i])) / 5.0 for i in range(16)
    ])
    assert overlap >= 0.8


def test_int8_rescored_scores_are_exact_on_candidates(built):
    """Returned scores come from the exact f32 rescore of the rows they
    name — never int8 approximations."""
    aspace, gl, data = built
    q = data[29]
    got_ids, got_sc = aspace.search_batch(
        q, gl, 8, quantized="int8_rescored"
    )
    ql = aspace.prepare_query_item(q, gl)
    exact = dict(aspace.search_lambda_aware(q, ql, len(data)))
    for i, s in zip(got_ids[0], got_sc[0]):
        assert s == pytest.approx(exact[int(i)], abs=1e-5)


def test_int8_scan_full_pool_matches_f32_exactly(built):
    """With candidates=N the rescore sees every row, so the int8 path
    must reproduce the exact f32 batch search bit-for-bit in ids and to
    f32 tolerance in scores (the rescore IS the parity kernel)."""
    aspace, gl, data = built
    Q = data[[3, 17, 41, 66]]
    ref_ids, ref_sc = aspace.search_batch(Q, gl, 5)
    got_ids, got_sc = aspace.search_batch(
        Q, gl, 5, quantized="int8", candidates=len(data)
    )
    np.testing.assert_array_equal(got_ids, ref_ids)
    np.testing.assert_allclose(got_sc, ref_sc, atol=1e-5)


def test_int8_scan_default_pool_self_top1_and_overlap(built):
    aspace, gl, data = built
    Q = data[:16]
    got_ids, _ = aspace.search_batch(Q, gl, 5, quantized="int8")
    assert np.all(got_ids[:, 0] == np.arange(16))
    ref_ids, _ = aspace.search_batch(Q, gl, 5)
    overlap = np.mean([
        len(set(got_ids[i]) & set(ref_ids[i])) / 5.0 for i in range(16)
    ])
    assert overlap >= 0.9


def test_int8_scan_scores_are_exact_on_candidates(built):
    """Scores of returned rows come from the f32 rescore, so they equal
    the f32 exact scores of those SAME rows (not int8 approximations)."""
    aspace, gl, data = built
    q = data[29]
    got_ids, got_sc = aspace.search_batch(q, gl, 8, quantized="int8")
    ql = aspace.prepare_query_item(q, gl)
    exact = dict(aspace.search_lambda_aware(q, ql, len(data)))
    for i, s in zip(got_ids[0], got_sc[0]):
        assert s == pytest.approx(exact[int(i)], abs=1e-5)


def test_int8_cache_invalidated_on_mutation(built):
    aspace, gl, data = built
    aspace._ensure_int8()
    assert aspace._i8_pair is not None
    aspace.set_item(5, np.asarray(data[5]) * 1.5)
    assert aspace._i8_pair is None
    aspace.recompute_lambdas(gl)
    # Restore the fixture for later tests.
    aspace.set_item(5, np.asarray(data[5]))
    aspace.recompute_lambdas(gl)
    aspace.build_lambdas_sorted()


def test_int8_mixed_alpha_batch(built):
    aspace, gl, data = built
    Q = data[[2, 9, 33, 50]]
    alphas = np.array([0.3, 0.9, 0.3, 0.9], np.float32)
    mixed, _ = aspace.search_batch(
        Q, gl, 5, alpha=alphas, quantized="int8", candidates=len(data)
    )
    a03, _ = aspace.search_batch(
        Q, gl, 5, alpha=0.3, quantized="int8", candidates=len(data)
    )
    a09, _ = aspace.search_batch(
        Q, gl, 5, alpha=0.9, quantized="int8", candidates=len(data)
    )
    np.testing.assert_array_equal(mixed[[0, 2]], a03[[0, 2]])
    np.testing.assert_array_equal(mixed[[1, 3]], a09[[1, 3]])


# bf16 rescored scan (bf16 candidates + exact on-device rescore — the
# int8 tier's structure at bf16 scan precision, VERDICT r3 #3)
def test_bf16_rescored_full_pool_matches_f32_exactly(built):
    """With candidates=N the rescore sees every row, so the bf16-rescored
    path must reproduce the exact f32 batch search bit-for-bit in ids and
    to f32 tolerance in scores (the rescore IS the parity kernel)."""
    aspace, gl, data = built
    Q = data[[3, 17, 41, 66]]
    ref_ids, ref_sc = aspace.search_batch(Q, gl, 5)
    got_ids, got_sc = aspace.search_batch(
        Q, gl, 5, quantized="bf16_rescored", candidates=len(data),
        allow_low_recall=True,
    )
    np.testing.assert_array_equal(got_ids, ref_ids)
    np.testing.assert_allclose(got_sc, ref_sc, atol=1e-5)


def test_bf16_rescored_default_pool_self_top1_and_overlap(built):
    aspace, gl, data = built
    Q = data[:16]
    got_ids, _ = aspace.search_batch(
        Q, gl, 5, quantized="bf16_rescored", allow_low_recall=True
    )
    assert np.all(got_ids[:, 0] == np.arange(16))
    ref_ids, _ = aspace.search_batch(Q, gl, 5)
    overlap = np.mean([
        len(set(got_ids[i]) & set(ref_ids[i])) / 5.0 for i in range(16)
    ])
    # bf16 candidate precision is tighter than int8's per-row grid, so
    # the default pool must do at least as well as int8's floor.
    assert overlap >= 0.9


def test_bf16_rescored_scores_are_exact_on_candidates(built):
    """Scores of returned rows come from the f32 rescore, so they equal
    the f32 exact scores of those SAME rows (not bf16 approximations)."""
    aspace, gl, data = built
    q = data[29]
    got_ids, got_sc = aspace.search_batch(
        q, gl, 8, quantized="bf16_rescored", allow_low_recall=True
    )
    ql = aspace.prepare_query_item(q, gl)
    exact = dict(aspace.search_lambda_aware(q, ql, len(data)))
    for i, s in zip(got_ids[0], got_sc[0]):
        assert s == pytest.approx(exact[int(i)], abs=1e-5)


# bf16x3 rescored scan (3-pass ≈ f32 scan precision + exact rescore —
# the recommended throughput tier; no quantized corpus copy)
def test_bf16x3_rescored_full_pool_matches_f32_exactly(built):
    aspace, gl, data = built
    Q = data[[3, 17, 41, 66]]
    ref_ids, ref_sc = aspace.search_batch(Q, gl, 5)
    got_ids, got_sc = aspace.search_batch(
        Q, gl, 5, quantized="bf16x3_rescored", candidates=len(data)
    )
    np.testing.assert_array_equal(got_ids, ref_ids)
    np.testing.assert_allclose(got_sc, ref_sc, atol=1e-5)


def test_bf16x3_rescored_default_pool_matches_exact(built):
    """Scan precision is ~f32-grade, so at test scale the default pool
    must reproduce the exact top-k set (unlike the 1-pass bf16 tier,
    which only guarantees overlap)."""
    aspace, gl, data = built
    Q = data[:16]
    got_ids, got_sc = aspace.search_batch(Q, gl, 5, quantized="bf16x3_rescored")
    ref_ids, ref_sc = aspace.search_batch(Q, gl, 5)
    assert np.all(got_ids[:, 0] == np.arange(16))
    np.testing.assert_array_equal(np.sort(got_ids, 1), np.sort(ref_ids, 1))
    np.testing.assert_allclose(np.sort(got_sc, 1), np.sort(ref_sc, 1),
                               atol=1e-5)


def test_unknown_quantized_tier_raises(built):
    """A mistyped tier string ("bf16x3", "int8-rescored", ...) must raise
    at the shared search_batch layer — not silently fall through the tier
    dispatch to the truthy-string bf16 scan with degraded recall."""
    from matternet_rs_tpu.core import QUANT_TIERS

    aspace, gl, data = built
    for bad in ("bf16x3", "int8-rescored", "INT8", "exact", "bf16"):
        assert bad not in QUANT_TIERS
        with pytest.raises(ValueError, match="unknown quantized tier"):
            aspace.search_batch(data[:4], gl, 5, quantized=bad)
    # Bools and every named tier still dispatch (the gated low-recall
    # tier with its explicit override).
    from matternet_rs_tpu.core import LOW_RECALL_TIERS

    for ok in (False, True, *QUANT_TIERS):
        idx, _ = aspace.search_batch(
            data[:4], gl, 5, quantized=ok,
            allow_low_recall=ok in LOW_RECALL_TIERS,
        )
        assert idx.shape == (4, 5)


def test_dominated_tier_gated(built):
    """VERDICT r4 #7: the dominated bf16_rescored rung (measured recall
    0.55 on the clustered fixture) must NOT be reachable without an
    explicit override — and the error must say what to use instead."""
    aspace, gl, data = built
    with pytest.raises(ValueError, match="dominated"):
        aspace.search_batch(data[:4], gl, 5, quantized="bf16_rescored")
    # The override works.
    idx, _ = aspace.search_batch(
        data[:4], gl, 5, quantized="bf16_rescored", allow_low_recall=True
    )
    assert idx.shape == (4, 5)


def test_auto_tier_routes_on_recall_target(built, monkeypatch):
    """``quantized="auto"`` (VERDICT r4 #7): the routing must pick the
    fastest tier whose MEASURED recall meets the target — never silently
    below it. target > 0.9875 → bf16x3_rescored (recall 1.0); the 0.95
    default → int8 pool-cut (0.9875 — int8_rescored's 0.875 would
    under-serve it); explicit low targets (≤ 0.875) unlock the fastest
    small-batch rung (int8_rescored) with the 1024-query crossover."""
    import matternet_rs_tpu.core as core_mod

    aspace, gl, data = built
    calls = []

    real_b3r = core_mod._batched_search_b3r_jit
    real_i8r = core_mod._batched_search_i8r_jit
    real_i8 = core_mod._batched_search_int8_jit
    monkeypatch.setattr(
        core_mod, "_batched_search_b3r_jit",
        lambda *a, **kw: calls.append("b3r") or real_b3r(*a, **kw),
    )
    monkeypatch.setattr(
        core_mod, "_batched_search_i8r_jit",
        lambda *a, **kw: calls.append("i8r") or real_i8r(*a, **kw),
    )
    monkeypatch.setattr(
        core_mod, "_batched_search_int8_jit",
        lambda *a, **kw: calls.append("i8") or real_i8(*a, **kw),
    )

    aspace.search_batch(data[:4], gl, 5, quantized="auto",
                        recall_target=0.99)
    assert calls[-1] == "b3r"
    # Default target 0.95: int8_rescored (0.875 measured) would silently
    # under-serve it — the pool-cut (0.9875) is the honest rung.
    aspace.search_batch(data[:4], gl, 5, quantized="auto")
    assert calls[-1] == "i8"
    # An explicitly recall-tolerant target unlocks the fastest rung.
    aspace.search_batch(data[:4], gl, 5, quantized="auto",
                        recall_target=0.8)
    assert calls[-1] == "i8r"
    big = np.repeat(data[:64], 16, axis=0)          # 1024 queries
    aspace.search_batch(big, gl, 5, quantized="auto", recall_target=0.8)
    assert calls[-1] == "i8"


def test_lazy_sketch_init_is_race_free(built):
    """The serving dispatch pool runs two workers concurrently, so the
    lazy int8/bf16 sketch builds must be single-shot under concurrent
    first use — without the _sketch_lock both workers would quantize
    (transient 2× HBM) and could pair a fresh sketch with a stale
    multiplier."""
    import threading

    aspace, gl, data = built
    aspace._i8_pair = None
    aspace._data_bf16 = None
    n_quant, n_bf16 = [0], [0]
    real_i8, real_bf16 = aspace.enable_int8_scan, aspace.enable_quantized_scan

    def slow_i8():
        n_quant[0] += 1
        time.sleep(0.05)         # widen the race window
        real_i8()

    def slow_bf16():
        n_bf16[0] += 1
        time.sleep(0.05)
        real_bf16()

    aspace.enable_int8_scan = slow_i8
    aspace.enable_quantized_scan = slow_bf16
    try:
        barrier = threading.Barrier(8)

        def worker():
            barrier.wait()
            i8, mult = aspace._ensure_int8()
            assert i8.shape[0] == mult.shape[0] == aspace.nitems
            assert aspace._scan_corpus(True).shape[0] == aspace.nitems

        threads = [threading.Thread(target=worker) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert n_quant[0] == 1, f"int8 quantize ran {n_quant[0]}×"
        assert n_bf16[0] == 1, f"bf16 copy ran {n_bf16[0]}×"
    finally:
        aspace.enable_int8_scan = real_i8
        aspace.enable_quantized_scan = real_bf16


def test_deepcopy_and_pickle_roundtrip(built):
    """Regression (round-4): the _sketch_lock runtime field must not break
    copy.deepcopy / pickle of a built ArrowSpace (threading.Lock is
    unpicklable; __getstate__/__setstate__ exclude it and recreate it)."""
    import copy
    import pickle

    aspace, gl, data = built
    aspace._ensure_int8()  # populate the lazy sketch caches too
    dup = copy.deepcopy(aspace)
    assert dup is not aspace
    assert dup._sketch_lock is not aspace._sketch_lock

    idx_a, _ = aspace.search_batch(data[:3], gl, 5)
    idx_b, _ = dup.search_batch(data[:3], gl, 5)
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))

    rt = pickle.loads(pickle.dumps(aspace))
    assert rt._sketch_lock is not aspace._sketch_lock
    idx_c, _ = rt.search_batch(data[:3], gl, 5)
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_c))
