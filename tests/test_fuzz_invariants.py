"""Seeded config-space fuzzing: random (dataset, builder-config) pairs must
uphold the framework's invariants end-to-end.

Beyond the reference's test strategy (SURVEY §4: "no fuzzing") — the
reference tests fixed configs; this sweeps the config space with
deterministic seeds so failures reproduce exactly.
"""

import numpy as np
import pytest

from matternet_rs_tpu.builder import ArrowSpaceBuilder
from matternet_rs_tpu.core import TauMode


def _random_config(rng):
    n = int(rng.integers(60, 400))
    f = int(rng.integers(8, 96))
    n_centers = int(rng.integers(2, 8))
    centers = rng.normal(size=(n_centers, f)) * rng.uniform(2.0, 10.0)
    data = (
        centers[rng.integers(0, n_centers, n)] + rng.normal(size=(n, f))
    ).astype(np.float32)

    tau = rng.choice(["median", "mean", "fixed", "percentile"])
    taumode = {
        "median": TauMode.median(),
        "mean": TauMode.mean(),
        "fixed": TauMode.fixed(float(rng.uniform(0.05, 0.95))),
        "percentile": TauMode.percentile(float(rng.uniform(0.1, 0.9))),
    }[tau]

    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(
            eps=float(rng.uniform(0.5, 1.0)),
            k=int(rng.integers(3, 9)),
        )
        .with_synthesis(taumode)
        .with_sparsity_check(False)
        .with_normalisation(bool(rng.integers(0, 2)))
        .with_cluster_params(
            max_clusters=int(rng.integers(4, max(5, n // 8))),
            radius=float(rng.uniform(5.0, 60.0)),
        )
        .with_sampling(None)
        .with_seed(int(rng.integers(0, 1000)))
    )
    if rng.random() < 0.3:
        b.with_spectral(True)
    return data, b


@pytest.mark.parametrize("seed", range(15))
def test_random_config_invariants(seed):
    rng = np.random.default_rng(1000 + seed)
    data, b = _random_config(rng)
    aspace, gl = b.build(data)

    # λ invariants.
    lam = np.asarray(aspace.lambdas)
    assert lam.shape == (len(data),)
    assert np.isfinite(lam).all()
    assert (lam >= 0).all() and (lam <= 1).all()
    assert aspace.range_lambdas > 0

    # Graph invariants.
    v = gl.verify_properties()
    assert v["symmetric"] and v["row_sums_zero"] and v["diag_nonneg"]

    # Self-retrieval: an exact duplicate query must rank itself first.
    from matternet_rs_tpu.core import UndecidableQueryError
    from matternet_rs_tpu.ops import taumode as tm_ops

    qi = int(rng.integers(0, len(data)))
    try:
        ql = aspace.prepare_query_item(data[qi], gl)
    except UndecidableQueryError:
        # Reference-faithful panic (core.rs:920-934) for raw λ ≈ 0 — only
        # acceptable when the item's raw λ really is ~0 (isolated in the
        # graph under this config), not a spurious rejection.
        import jax.numpy as jnp

        raw = float(
            tm_ops.synthetic_lambda(
                jnp.asarray(data[qi]), aspace.graph_for_taumode(gl),
                aspace.taumode.mode, aspace.taumode.param,
            )
        )
        assert abs(raw) <= 1e-12, f"spurious undecidable: raw λ = {raw}"
        return
    res = aspace.search_lambda_aware(data[qi], ql, 5)
    assert res[0][0] == qi, f"seed {seed}: self-query lost, got {res[:3]}"
    scores = [s for _, s in res]
    assert scores == sorted(scores, reverse=True)

    # Batched path agrees with serial on the same query.
    idx, _ = aspace.search_batch(data[qi][None, :], gl, 5)
    assert idx[0].tolist() == [i for i, _ in res]

    # Sorted index consistent with λ.
    aspace.build_lambdas_sorted()
    sl = aspace.lambdas_sorted
    import numpy as _np

    s_lam = _np.asarray(sl.sorted_lambdas)
    assert (_np.diff(s_lam) >= -1e-7).all()


@pytest.mark.parametrize("seed", range(6))
def test_random_config_checkpoint_roundtrip(seed, tmp_path):
    from matternet_rs_tpu.storage import parquet as pq

    rng = np.random.default_rng(2000 + seed)
    data, b = _random_config(rng)
    aspace, gl = b.build(data)
    pq.save_checkpoint(aspace, gl, b, tmp_path, f"fuzz{seed}")
    a2, g2 = pq.load_arrowspace(tmp_path, f"fuzz{seed}")
    qi = int(rng.integers(0, len(data)))
    ql1 = aspace.prepare_query_item(data[qi], gl)
    ql2 = a2.prepare_query_item(data[qi], g2)
    assert ql1 == pytest.approx(ql2, abs=1e-6)
    assert aspace.search_lambda_aware(data[qi], ql1, 5) == a2.search_lambda_aware(
        data[qi], ql2, 5
    )


@pytest.mark.parametrize("seed", range(7))
def test_random_energy_config_invariants(seed):
    from matternet_rs_tpu import energymaps as em

    rng = np.random.default_rng(3000 + seed)
    n = int(rng.integers(100, 300))
    f = int(rng.integers(16, 64))
    n_centers = int(rng.integers(2, 6))
    centers = rng.normal(size=(n_centers, f)) * rng.uniform(3.0, 8.0)
    data = (
        centers[rng.integers(0, n_centers, n)] + rng.normal(size=(n, f))
    ).astype(np.float32)
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(float(rng.uniform(0.6, 1.0)), int(rng.integers(3, 7)))
        .with_sparsity_check(False)
        .with_cluster_params(
            max_clusters=int(rng.integers(6, 24)),
            radius=float(rng.uniform(8.0, 40.0)),
        )
        .with_dims_reduction(True)
        .with_sampling(None)
        .with_seed(int(rng.integers(0, 1000)))
    )
    p = em.EnergyParams(
        optical_tokens=int(rng.integers(8, 30)),
        steps=int(rng.integers(1, 6)),
        neighbor_k=int(rng.integers(3, 10)),
        split_quantile=float(rng.uniform(0.7, 0.95)),
        candidate_m=int(rng.integers(6, 20)),
    )
    aspace, gl = b.build_energy(data, p)

    lam = np.asarray(aspace.lambdas)
    assert (lam >= 0).all() and (lam <= 1).all() and np.isfinite(lam).all()
    cm = np.asarray(aspace.centroid_map)
    S = aspace.sub_centroids.shape[0]
    assert cm.min() >= 0 and cm.max() < S
    assert aspace.range_lambdas > 0

    qi = int(rng.integers(0, n))
    res = em.search_energy(aspace, data[qi], gl, k=5)
    dists = [d for _, d in res]
    assert dists == sorted(dists)
    assert all(d >= -1e-9 for d in dists)
    idx, _ = em.search_energy_batch(aspace, data[qi][None, :], gl, 5)
    assert idx[0].tolist() == [i for i, _ in res]


@pytest.mark.parametrize("seed", range(4))
def test_random_distributed_matches_serial(seed):
    """Random configs: distributed build + search == the serial scan on the
    concatenated data (the exactness contract, fuzzed)."""
    import jax.numpy as jnp

    from matternet_rs_tpu.graph import GraphParams
    from matternet_rs_tpu.ops import search as search_ops
    from matternet_rs_tpu.parallel import make_mesh
    from matternet_rs_tpu.parallel.index import ShardedArrowSpace

    rng = np.random.default_rng(4000 + seed)
    n = int(rng.integers(120, 500))
    f = int(rng.integers(8, 48))
    data = rng.normal(size=(n, f)).astype(np.float32) * rng.uniform(0.5, 4.0)
    params = GraphParams(
        eps=float(rng.uniform(0.6, 1.0)), k=int(rng.integers(3, 8)),
        topk=int(rng.integers(3, 8)), sparsity_check=False,
    )
    cut = int(rng.integers(1, n - 1))
    sa = ShardedArrowSpace.distributed_build(
        [data[:cut], data[cut:]], params,
        k_clusters=int(rng.integers(4, 16)), mesh=make_mesh(8),
    )
    k = int(rng.integers(3, 12))
    qi = int(rng.integers(0, n))
    ql = sa.prepare_query_lambda(data[qi])
    dist_res = sa.search(data[qi], k=k)
    ser_idx, ser_sc = search_ops.search_lambda_aware(
        jnp.asarray(data),
        jnp.sqrt(jnp.sum(jnp.asarray(data) ** 2, axis=-1)),
        sa.lambdas[:n], jnp.asarray(data[qi]), jnp.float32(ql), k,
    )
    assert [i for i, _ in dist_res] == list(np.asarray(ser_idx)), (
        f"seed {seed}: distributed != serial"
    )


@pytest.mark.parametrize("seed", range(3))
def test_random_distributed_energy_matches_serial(seed):
    """Random configs: distributed energy search (λ-distance ascending +
    cosine tie-break) == a serial scan with the same score."""
    from matternet_rs_tpu.graph import GraphParams
    from matternet_rs_tpu.parallel import make_mesh
    from matternet_rs_tpu.parallel.index import ShardedArrowSpace

    rng = np.random.default_rng(5000 + seed)
    n = int(rng.integers(100, 400))
    f = int(rng.integers(8, 32))
    data = rng.normal(size=(n, f)).astype(np.float32)
    params = GraphParams(
        eps=float(rng.uniform(0.7, 1.0)), k=int(rng.integers(3, 7)),
        topk=int(rng.integers(3, 7)), sparsity_check=False,
    )
    sa = ShardedArrowSpace.distributed_build(
        [data], params, k_clusters=int(rng.integers(4, 12)), mesh=make_mesh(8)
    )
    k = int(rng.integers(3, 10))
    qi = int(rng.integers(0, n))
    ql = sa.prepare_query_lambda(data[qi])
    dist_res = sa.search_energy(data[qi], k=k)

    lam = np.asarray(sa.lambdas)[:n].astype(np.float64)
    lam_dist = np.abs(ql - lam)
    norms = np.linalg.norm(data, axis=1)
    cos = (data @ data[qi]) / (np.linalg.norm(data[qi]) * norms + 1e-9)
    scores = lam_dist + np.where(lam_dist < 1e-9, (1.0 - cos) * 1e-9, 0.0)
    order = np.lexsort((np.arange(n), scores.astype(np.float32)))[:k]
    assert [i for i, _ in dist_res] == order.tolist(), f"seed {seed}"


@pytest.mark.parametrize("seed", [2, 9, 31])
def test_random_banded_energy_matches_full_scan(seed):
    """Banded energy search distance parity under random corpora/λ grids:
    distances must match the full scan exactly whenever the window covers
    the tie groups (indices may differ only at exact cross-group |Δλ|
    ties, so the invariant pins the distance vector)."""
    import jax.numpy as jnp

    from matternet_rs_tpu import energymaps as em
    from matternet_rs_tpu.core import ArrowSpace

    rng = np.random.default_rng(seed)
    n = int(rng.integers(2000, 6000))
    f = int(rng.choice([8, 32, 96]))
    s = int(rng.integers(16, 200))
    data = rng.normal(size=(n, f)).astype(np.float32)
    aspace = ArrowSpace.from_items(data)
    aspace.sub_centroids = jnp.asarray(
        rng.normal(size=(s, f)).astype(np.float32)
    )
    sc_l = np.sort(rng.uniform(0, 1, s)).astype(np.float32)
    assign = rng.integers(0, s, n)
    aspace.subcentroid_lambdas = jnp.asarray(sc_l)
    aspace.lambdas = jnp.asarray(sc_l[assign])
    aspace.item_norms = jnp.sqrt(jnp.sum(aspace.data * aspace.data, axis=1))

    Q = data[rng.integers(0, n, 8)]
    ref_idx, ref_d = em.search_energy_batch(aspace, Q, None, 10)
    got_idx, got_d = em.search_energy_batch(
        aspace, Q, None, 10, candidates="auto"
    )
    np.testing.assert_allclose(got_d, ref_d, rtol=1e-6, atol=1e-10)
    # Indices must agree away from exact score ties.
    ties = np.isclose(ref_d[:, :-1], ref_d[:, 1:], rtol=0, atol=1e-12)
    for b in range(ref_d.shape[0]):
        if not ties[b].any():
            np.testing.assert_array_equal(got_idx[b], ref_idx[b])


@pytest.mark.parametrize("seed", range(6))
def test_random_tilemax_tie_dense_score_multiset_exact(seed):
    """Tilemax selection under ADVERSARIAL exact-score ties: quantized
    random scores (few distinct values, massive tie groups straddling
    every tile boundary). Contract (PARITY.md): the returned score
    multiset equals flat top_k's exactly; returned indices are distinct,
    in range, and really carry the scores they claim."""
    import jax
    import jax.numpy as jnp

    from matternet_rs_tpu.ops.search import tilemax_topk

    rng = np.random.default_rng(seed)
    n = int(rng.integers(5_000, 40_000))
    k = int(rng.choice([1, 5, 10, 32]))
    tile = int(rng.choice([256, 512, 1024]))
    levels = int(rng.choice([2, 3, 17]))
    scores_np = (
        rng.integers(0, levels, (4, n)).astype(np.float32) / levels
    )
    scores = jnp.asarray(scores_np)
    want_s, _ = jax.lax.top_k(scores, min(k, n))
    got_s, got_i = tilemax_topk(scores, k, tile=tile)
    got_s, got_i = np.asarray(got_s), np.asarray(got_i)
    np.testing.assert_array_equal(got_s, np.asarray(want_s))
    for row in range(4):
        ids = got_i[row]
        assert len(set(ids.tolist())) == len(ids)
        assert (0 <= ids).all() and (ids < n).all()
        np.testing.assert_array_equal(scores_np[row][ids], got_s[row])


@pytest.mark.parametrize("f,seed", [(256, 0), (256, 1), (512, 2), (1536, 3)])
def test_random_fused_wide_f_tie_corpus(f, seed, monkeypatch):
    """VERDICT r3 #5: the adversarial near-tie corpus pointed at the FUSED
    wide-F producer's routing envelope (128 < F ≤ 2048,
    n ≥ FUSED_TILEMAX_MIN_N). Coordinate-quantized integer corpora create
    massive exact score ties straddling tile boundaries, plus exact
    duplicate rows. Drives the PRODUCTION routing body
    (``search_lambda_aware_tilemax`` — the kernel ``search_batch``
    dispatches to at this n) with the Pallas kernels in interpret mode.

    PARITY.md self-consistent contract asserted: (a) returned top-k SCORES
    equal the flat kernel's within f32 accumulation-reorder distance,
    (b) every returned index really scores at/above the flat k-th score
    (set equality up to documented tie substitution), (c) rows whose
    k-boundary is tie-free match flat's indices exactly."""
    import functools

    import jax
    import jax.numpy as jnp

    from matternet_rs_tpu.ops import search as so
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    rng = np.random.default_rng(400 + seed)
    n = int(rng.integers(so.FUSED_TILEMAX_MIN_N + 1, 40_000))
    b, k = 16, int(rng.choice([5, 10]))
    levels = int(rng.choice([2, 3]))
    X = rng.integers(-levels, levels + 1, (n, f)).astype(np.float32)
    # Exact duplicate rows scattered across tiles (worst-case ties).
    X[rng.integers(0, n, n // 4)] = X[rng.integers(0, n, n // 4)]
    lams = (rng.integers(0, 4, n) / 4.0).astype(np.float32)   # quantized λ
    norms = np.linalg.norm(X, axis=1).astype(np.float32)
    q_rows = rng.integers(0, n, b)
    Q = X[q_rows].copy()                                      # exact-row queries
    qls = lams[q_rows].copy()
    alphas = np.full(b, 0.7, np.float32)

    monkeypatch.setattr(
        tmf, "scores_and_tilemax",
        functools.partial(tmf.scores_and_tilemax, interpret=True),
    )
    monkeypatch.setattr(
        tmf, "gather_subtiles",
        functools.partial(tmf.gather_subtiles, interpret=True),
    )
    real_supported = tmf.fused_supported

    def cpu_supported(nn, ff, bb, dtype, tile):
        # Everything but the TPU-platform gate (tests run on CPU).
        return (
            dtype == jnp.float32 and nn >= tile and ff <= tmf.MAX_FUSED_F_WIDE
            and tmf.MIN_FUSED_B <= bb <= tmf.MAX_FUSED_B
            and tile % (tmf.SUBS * 128) == 0
        )

    monkeypatch.setattr(tmf, "fused_supported", cpu_supported)
    assert real_supported is not tmf.fused_supported

    # The routing predicate search_batch consults must ADMIT this shape
    # (the envelope under test — if this goes False the test is vacuous).
    assert so.fused_fast_path(n, f, b, jnp.float32, k)

    Xd, nd, ld = jnp.asarray(X), jnp.asarray(norms), jnp.asarray(lams)
    Qd, qld, ad = jnp.asarray(Q), jnp.asarray(qls), jnp.asarray(alphas)
    # __wrapped__: the un-jitted routing body (no jit-cache pollution from
    # the interpret-mode monkeypatching).
    idx, top = so.search_lambda_aware_tilemax.__wrapped__(
        Xd, nd, ld, Qd, qld, k, ad
    )
    idx, top = np.asarray(idx), np.asarray(top)

    sref = np.asarray(so._batched_scores(Xd, nd, ld, Qd, qld, ad))
    ft, fi = jax.lax.top_k(jnp.asarray(sref), k)
    ft, fi = np.asarray(ft), np.asarray(fi)

    tol = 2e-5
    # (a) top-k score equality within the self-consistent tolerance.
    np.testing.assert_allclose(top, ft, atol=tol, rtol=1e-5)
    for row in range(b):
        # (b) distinct, in-range indices whose FLAT scores clear the flat
        # k-th score up to the tolerance (tie substitution only).
        ids = idx[row]
        assert len(set(ids.tolist())) == len(ids)
        assert (0 <= ids).all() and (ids < n).all()
        assert (sref[row][ids] >= ft[row][-1] - tol).all()
        # (c) a tie-free k-boundary forces exact index agreement.
        boundary_gap = ft[row][-1] - np.partition(sref[row], -(k + 1))[-(k + 1)]
        if boundary_gap > 2 * tol and not np.isclose(
            ft[row][:-1], ft[row][1:], rtol=0, atol=2 * tol
        ).any():
            np.testing.assert_array_equal(np.sort(ids), np.sort(fi[row]))
        # Self-query (exact corpus row) must recover itself or an exact
        # duplicate scoring identically.
        self_ok = q_rows[row] in ids.tolist() or np.isclose(
            sref[row][ids], sref[row][q_rows[row]], rtol=0, atol=tol
        ).any()
        assert self_ok


def _patch_rescored_interpret(monkeypatch):
    """Route the maxima-first rescored pipeline through interpret-mode
    Pallas on CPU: kernels in interpret mode, the TPU-platform gate in
    ``tilemax_only_supported`` replaced by its shape-only checks."""
    import functools

    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    monkeypatch.setattr(
        tmf, "tilemax_only",
        functools.partial(tmf.tilemax_only, interpret=True),
    )
    monkeypatch.setattr(
        tmf, "slab_dots_ring",
        functools.partial(tmf.slab_dots_ring, interpret=True),
    )

    def cpu_tilemax_only_supported(nn, ff, bb, tile, subs=tmf.SUBS):
        return (
            nn >= tile and ff <= tmf.MAX_FUSED_F_WIDE
            and tmf.MIN_FUSED_B <= bb <= tmf.MAX_FUSED_B
            and tile % (subs * 128) == 0
        )

    monkeypatch.setattr(
        tmf, "tilemax_only_supported", cpu_tilemax_only_supported
    )


def _tie_corpus(rng, n, f):
    """Coordinate-quantized integer corpus with exact duplicate rows
    scattered across slab boundaries — massive exact-score tie groups at
    sub-tile granularity (the rescored tiers' selection unit)."""
    levels = int(rng.choice([2, 3]))
    X = rng.integers(-levels, levels + 1, (n, f)).astype(np.float32)
    X[rng.integers(0, n, n // 4)] = X[rng.integers(0, n, n // 4)]
    lams = (rng.integers(0, 4, n) / 4.0).astype(np.float32)
    return X, lams


@pytest.mark.parametrize(
    "tier,seed", [("bf16x3", 0), ("bf16x3", 1), ("int8", 2), ("int8", 3)]
)
def test_random_fused_rescored_tie_corpus(tier, seed, monkeypatch):
    """VERDICT r4 #4: adversarial-tie fuzz for the maxima-first rescored
    selection (``ops/search.fused_scan_rescored`` — the sub-tile maxima
    producer + ring-DMA slab rescore behind ``quantized="int8_rescored"``
    and ``"bf16x3_rescored"``), interpret-mode Pallas on CPU.

    PARITY.md "Rescored tiers" contract asserted row-for-row:
    (a) EVERY returned score equals the exact flat blended score of that
        id — returned scores are always exact, for both scan precisions;
    (b) every returned id clears the flat k-th score minus the tier's
        scan-precision margin (approximation is candidate recall ONLY);
    (c) bf16x3 on an integer corpus has EXACT scan dots, so under
        engineered sub-tile tie floods the returned score multiset must
        equal flat top_k's (ids may tie-substitute — the documented
        contract);
    (d) indices distinct/in-range; exact-row self-queries recover
        themselves or an identically-scoring duplicate."""
    import jax
    import jax.numpy as jnp

    from matternet_rs_tpu.ops import search as so

    rng = np.random.default_rng(600 + seed)
    n = int(rng.integers(so.FUSED_TILEMAX_MIN_N + 1, 40_000))
    f = 128          # the slab ring's lane-aligned envelope (f % 128 == 0)
    b, k = 16, int(rng.choice([5, 10]))
    X, lams = _tie_corpus(rng, n, f)
    norms = np.linalg.norm(X, axis=1).astype(np.float32)
    q_rows = rng.integers(0, n, b)
    Q = X[q_rows].copy()
    qls = lams[q_rows].copy()
    alphas = np.full(b, 0.7, np.float32)

    _patch_rescored_interpret(monkeypatch)
    cand = max(4 * k, 32)
    # The routing predicate must ADMIT this shape or the test is vacuous.
    assert so.fused_rescored_path(n, f, b, k, cand)

    Xd = jnp.asarray(X)
    if tier == "int8":
        from matternet_rs_tpu.core import _quantize_rows_device_jit

        Xscan, scan_rn = _quantize_rows_device_jit(Xd)
        margin = 0.03          # int8 per-row-absmax grid ≈ 0.8% rel dots
    else:
        Xscan, scan_rn = Xd, None
        margin = 2e-5          # exact integer dots + ~2ulp rn epilogue
    idx, top = so.fused_scan_rescored(
        Xscan, Xd, jnp.asarray(norms), jnp.asarray(lams),
        jnp.asarray(Q), jnp.asarray(qls), k, cand, jnp.asarray(alphas),
        scan_rn=scan_rn,
    )
    idx, top = np.asarray(idx), np.asarray(top)

    sref = np.asarray(so._batched_scores(
        Xd, jnp.asarray(norms), jnp.asarray(lams), jnp.asarray(Q),
        jnp.asarray(qls), jnp.asarray(alphas),
    ))
    ft, _ = jax.lax.top_k(jnp.asarray(sref), k)
    ft = np.asarray(ft)

    tol = 2e-5
    for row in range(b):
        ids = idx[row]
        # (d) distinct, in-range.
        assert len(set(ids.tolist())) == len(ids)
        assert (0 <= ids).all() and (ids < n).all()
        # (a) returned-score EXACTNESS: rescored == flat exact per id.
        np.testing.assert_allclose(
            top[row], sref[row][ids], rtol=1e-6, atol=tol
        )
        # (b) candidate-recall-only: every id clears flat's k-th score
        # minus the scan-precision margin.
        assert (sref[row][ids] >= ft[row][-1] - margin - tol).all()
        # (c) exact-scan tier: score multiset equality under tie floods.
        if tier == "bf16x3":
            np.testing.assert_allclose(top[row], ft[row], rtol=0, atol=tol)
        # Self-query recovery (or an identically-scoring duplicate).
        assert q_rows[row] in ids.tolist() or np.isclose(
            sref[row][ids], sref[row][q_rows[row]], rtol=0,
            atol=margin + tol,
        ).any()


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_rescored_mask_from_pad_rows(seed, monkeypatch):
    """The sharded path's zero-pad contract on the rescored pipeline
    (``mask_from``): padded rows engineered to be ATTRACTIVE unmasked
    (λ equal to the query λ ⇒ blended score (1−α)·1 = 0.3 at cos 0)
    must never be returned, and the real rows' contract (score
    exactness + tie-flood multiset) must hold unchanged."""
    import jax
    import jax.numpy as jnp

    from matternet_rs_tpu.ops import search as so

    rng = np.random.default_rng(700 + seed)
    n = int(rng.integers(so.FUSED_TILEMAX_MIN_N + 1, 38_000))
    f = 128          # lane-aligned envelope (f % 128 == 0)
    b, k = 16, 10
    X, lams = _tie_corpus(rng, n, f)
    q_rows = rng.integers(0, n, b)
    Q = X[q_rows].copy()
    qls = lams[q_rows].copy()

    pad = int(rng.integers(1, 3000))
    Xp = np.concatenate([X, np.zeros((pad, f), np.float32)])
    # Adversarial pad λ: exactly the first query's λ.
    lamsp = np.concatenate([lams, np.full(pad, qls[0], np.float32)])
    normsp = np.linalg.norm(Xp, axis=1).astype(np.float32)
    alphas = np.full(b, 0.7, np.float32)

    _patch_rescored_interpret(monkeypatch)
    cand = max(4 * k, 32)
    assert so.fused_rescored_path(n + pad, f, b, k, cand)

    idx, top = so.fused_scan_rescored(
        jnp.asarray(Xp), jnp.asarray(Xp), jnp.asarray(normsp),
        jnp.asarray(lamsp), jnp.asarray(Q), jnp.asarray(qls), k, cand,
        jnp.asarray(alphas), mask_from=jnp.int32(n),
    )
    idx, top = np.asarray(idx), np.asarray(top)

    sref = np.asarray(so._batched_scores(
        jnp.asarray(X), jnp.asarray(np.linalg.norm(X, axis=1).astype(np.float32)),
        jnp.asarray(lams), jnp.asarray(Q), jnp.asarray(qls),
        jnp.asarray(alphas),
    ))
    ft, _ = jax.lax.top_k(jnp.asarray(sref), k)
    ft = np.asarray(ft)

    tol = 2e-5
    for row in range(b):
        ids = idx[row]
        # No padded id may EVER be returned.
        assert (ids < n).all(), f"pad row leaked: {ids[ids >= n]}"
        assert (0 <= ids).all() and len(set(ids.tolist())) == len(ids)
        np.testing.assert_allclose(
            top[row], sref[row][ids], rtol=1e-6, atol=tol
        )
        # Real-row tie-flood multiset contract, unchanged by the padding.
        np.testing.assert_allclose(top[row], ft[row], rtol=0, atol=tol)
