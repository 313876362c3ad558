"""Pallas kernel parity tests (interpret mode — tests run on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matternet_rs_tpu.graph import GraphParams
from matternet_rs_tpu.ops import laplacian as lap
from matternet_rs_tpu.ops import taumode as tm
from matternet_rs_tpu.ops.pallas import taumode_fused as tf


def _graph(f, seed=0):
    rng = np.random.default_rng(seed)
    nodes = rng.normal(size=(f, 30)).astype(np.float32)
    return lap.build_laplacian_matrix(
        nodes, GraphParams(eps=0.9, k=5, topk=5, sparsity_check=False)
    ).matrix


@pytest.mark.parametrize("n,f", [(300, 24), (256, 128), (1000, 60)])
def test_fused_matches_xla_reference(n, f):
    """Includes non-multiple N (pad) and non-128-multiple F (pad)."""
    L = _graph(f)
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    ref = tm.taumode_lambdas(X, L, tm.TAU_MEDIAN)
    tau = tm.select_tau(X, tm.TAU_MEDIAN)
    got = tf.taumode_lambdas_pallas(X, L, tau, interpret=True)
    assert np.allclose(np.asarray(ref), np.asarray(got), atol=2e-5)


def test_fused_zero_vectors():
    L = _graph(16)
    X = jnp.zeros((300, 16))
    tau = tm.select_tau(X, tm.TAU_MEDIAN)
    got = tf.taumode_lambdas_pallas(X, L, tau, interpret=True)
    assert np.allclose(np.asarray(got), 0.0)


def test_fused_fixed_tau():
    L = _graph(32, seed=2)
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.normal(size=(512, 32)).astype(np.float32))
    ref = tm.taumode_lambdas(X, L, tm.TAU_FIXED, 0.4)
    tau = jnp.full((512,), 0.4, jnp.float32)
    got = tf.taumode_lambdas_pallas(X, L, tau, interpret=True)
    assert np.allclose(np.asarray(ref), np.asarray(got), atol=2e-5)


def test_auto_path_on_cpu_falls_back():
    """On CPU the auto selector must use the XLA path (identical output)."""
    L = _graph(20, seed=4)
    rng = np.random.default_rng(5)
    X = jnp.asarray(rng.normal(size=(400, 20)).astype(np.float32))
    auto = tm.taumode_lambdas_auto(X, L, tm.TAU_MEDIAN)
    ref = tm.taumode_lambdas(X, L, tm.TAU_MEDIAN)
    assert np.allclose(np.asarray(auto), np.asarray(ref), atol=1e-7)


def test_pallas_supported_gating():
    assert not tf.pallas_supported(4096)     # above VMEM budget

def test_auto_path_chunking_consistency():
    """Chunked large-N auto path equals the single-shot XLA path."""
    import matternet_rs_tpu.ops.taumode as tmod

    L = _graph(16, seed=6)
    rng = np.random.default_rng(7)
    X = jnp.asarray(rng.normal(size=(1000, 16)).astype(np.float32))
    old = tmod.CHUNK_N
    try:
        tmod.CHUNK_N = 256          # force chunking on a small batch
        chunked = tmod.taumode_lambdas_auto(X, L, tmod.TAU_MEDIAN)
    finally:
        tmod.CHUNK_N = old
    ref = tmod.taumode_lambdas(X, L, tmod.TAU_MEDIAN)
    assert np.allclose(np.asarray(chunked), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("n,f", [(300, 384), (512, 300)])
def test_bigf_kernel_matches_xla(n, f):
    L = _graph(f, seed=8)
    rng = np.random.default_rng(9)
    X = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    X = X.at[3].set(0.0)
    ref = tm.taumode_lambdas(X, L, tm.TAU_MEDIAN)
    tau = tm.select_tau(X, tm.TAU_MEDIAN)
    got = tf.taumode_lambdas_pallas_bigf(X, L, tau, interpret=True)
    assert np.allclose(np.asarray(ref), np.asarray(got), atol=3e-5)
    assert float(got[3]) == 0.0


def test_fused_search_exact_interpret():
    """Streamed exact top-k kernel: exact agreement with a numpy rescore
    (kept as a Pallas reference implementation — see its docstring verdict)."""
    from matternet_rs_tpu.ops.pallas import search_fused as sf

    rng = np.random.default_rng(12)
    N, F, B, K = 3000, 64, 8, 10
    X = rng.normal(size=(N, F)).astype(np.float32)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    lam = rng.random(N).astype(np.float32)
    Qn = Xn[:B]
    ql = rng.random(B).astype(np.float32)
    idx_p, val_p = sf.search_fused_pallas(
        jnp.asarray(Xn), jnp.asarray(lam), jnp.asarray(Qn), jnp.asarray(ql),
        K, interpret=True,
    )
    cos = Qn @ Xn.T
    scores = 0.7 * cos + 0.3 * (1 - np.minimum(np.abs(lam[None, :] - ql[:, None]), 1.0))
    gt = np.argsort(-scores, axis=1)[:, :K]
    for b in range(B):
        assert set(np.asarray(idx_p)[b].tolist()) == set(gt[b].tolist())
        assert len(set(np.asarray(idx_p)[b].tolist())) == K


# ---------------------------------------------------------------------------
# Fused score+tilemax producer (ops/pallas/tilemax_fused.py)
# ---------------------------------------------------------------------------

def _fused_fixture(n, f, b, seed=7):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.standard_normal((n, f), dtype=np.float32))
    X = X.at[3].set(0.0)                       # exercises the guarded cosine
    norms = jnp.sqrt(jnp.sum(X * X, axis=1))
    lams = jnp.asarray(rng.random(n, dtype=np.float32))
    Q = jnp.asarray(rng.standard_normal((b, f), dtype=np.float32))
    ql = jnp.asarray(rng.random(b, dtype=np.float32))
    al = jnp.asarray(rng.uniform(0.3, 0.9, b).astype(np.float32))
    return X, norms, lams, Q, ql, al


@pytest.mark.parametrize("n,f,b,tile", [(9000, 64, 16, 2048), (4099, 32, 8, 4096)])
def test_scores_and_tilemax_matches_batched_scores(n, f, b, tile):
    """Interpret-mode producer == the XLA _batched_scores formula, and the
    sub-tile maxima == reshaped reductions of those scores. (On real TPU the
    match is bitwise inside the fused_supported envelope — pinned by the
    device validation sweep recorded in DESIGN.md.)"""
    from matternet_rs_tpu.ops import search as so
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    X, norms, lams, Q, ql, al = _fused_fixture(n, f, b)
    smain, submax = tmf.scores_and_tilemax(
        X, norms, lams, Q, ql, al, tile=tile, interpret=True
    )
    nt0 = n // tile
    n0 = nt0 * tile
    ts = tile // tmf.SUBS
    sref = np.asarray(so._batched_scores(X, norms, lams, Q, ql, al))[:, :n0]
    assert np.allclose(np.asarray(smain), sref, atol=1e-6, rtol=1e-6)
    tm_ref = sref.reshape(b, nt0 * tmf.SUBS, ts).max(axis=2)
    assert np.allclose(np.asarray(submax), tm_ref, atol=1e-6, rtol=1e-6)


def test_gather_subtiles_matches_take_along_axis():
    rng = np.random.default_rng(11)
    b, ns, ts = 16, 40, 128
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    S = jnp.asarray(rng.standard_normal((b, ns * ts), dtype=np.float32))
    sel = jnp.sort(
        jnp.asarray(rng.integers(0, ns, size=(b, 6), dtype=np.int32)), axis=1
    )
    got = tmf.gather_subtiles(S, sel, ts, interpret=True)
    ref = jnp.take_along_axis(
        S.reshape(b, ns, ts), sel[:, :, None], axis=1
    ).reshape(b, 6 * ts)
    assert (np.asarray(got) == np.asarray(ref)).all()


def test_fused_tilemax_full_path_interpret_matches_flat():
    """End-to-end: fused producer + DMA gather + selection == flat top_k
    (random data — away from exact ties)."""
    from matternet_rs_tpu.ops import search as so
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    n, f, b, tile, k = 9000, 64, 16, 2048, 5
    X, norms, lams, Q, ql, al = _fused_fixture(n, f, b, seed=3)
    nt0 = n // tile
    n0 = nt0 * tile
    ts = tile // tmf.SUBS
    ns = nt0 * tmf.SUBS
    smain, submax = tmf.scores_and_tilemax(
        X, norms, lams, Q, ql, al, tile=tile, interpret=True
    )
    sref = so._batched_scores(X, norms, lams, Q, ql, al)
    tail = sref[:, n0:]
    top, idx = so._tilemax_select(
        smain.reshape(b, ns, ts), submax, tail, n, k, 4,
        gather=lambda sel: tmf.gather_subtiles(smain, sel, ts, interpret=True),
    )
    ft, fi = jax.lax.top_k(sref, k)
    assert np.allclose(np.asarray(top), np.asarray(ft), atol=1e-6)
    assert (np.asarray(idx) == np.asarray(fi)).all()


def test_fused_supported_gating_envelope():
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    # B == 1 / bf16 / sub-tile corpora are outside the envelope
    assert not tmf.fused_supported(100000, 128, 1, jnp.float32, 2048)
    assert not tmf.fused_supported(100000, 128, 64, jnp.bfloat16, 2048)
    assert not tmf.fused_supported(1000, 128, 64, jnp.float32, 2048)
    # Wide-F self-consistent mode extends the envelope to
    # MAX_FUSED_F_WIDE, gated by the per-step VMEM budget.
    assert not tmf.fused_supported(
        100000, tmf.MAX_FUSED_F_WIDE + 1, 64, jnp.float32, 2048
    )
    assert not tmf.fused_supported(     # tile*f + b*f + b*tile blocks too big
        100000, 2048, tmf.MAX_FUSED_B, jnp.float32, 4096
    )
    assert tmf.fused_supported(100000, 2048, 64, jnp.float32, 2048) == (
        "tpu" in jax.devices()[0].platform.lower()
        or "axon" in jax.devices()[0].platform.lower()
    )
    assert not tmf.gather_supported(12, 14)    # B not 8-aligned
    assert not tmf.gather_supported(256, 200)  # c beyond compile cap
    assert tmf.gather_supported(256, 14)


@pytest.mark.parametrize("f", [256, 300, 1536])
def test_scores_and_tilemax_wide_f_self_consistent(f):
    """Wide-F (chunked-K) producer: scores within f32 accumulation-reorder
    distance of the XLA producer, sub-tile maxima exactly the reductions
    of the KERNEL's own scores (the self-consistency contract)."""
    from matternet_rs_tpu.ops import search as so
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    n, b, tile = 5000, 8, 2048
    X, norms, lams, Q, ql, al = _fused_fixture(n, f, b, seed=f)
    smain, submax = tmf.scores_and_tilemax(
        X, norms, lams, Q, ql, al, tile=tile, interpret=True
    )
    nt0 = n // tile
    n0 = nt0 * tile
    ts = tile // tmf.SUBS
    sref = np.asarray(so._batched_scores(X, norms, lams, Q, ql, al))[:, :n0]
    sm = np.asarray(smain)
    assert np.allclose(sm, sref, atol=1e-5, rtol=1e-5)
    tm_ref = sm.reshape(b, nt0 * tmf.SUBS, ts).max(axis=2)
    assert (np.asarray(submax) == tm_ref).all()


def test_scores_and_tilemax_mask_from():
    """mask_from turns rows >= it (and the masked tail) to -inf — the
    sharded path's padded-row mask; default leaves scores untouched."""
    from matternet_rs_tpu.ops import search as so
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    n, f, b, tile = 9000, 64, 16, 2048
    X, norms, lams, Q, ql, al = _fused_fixture(n, f, b, seed=5)
    nt0 = n // tile
    n0 = nt0 * tile
    mf = jnp.int32(5000)
    smain, submax = tmf.scores_and_tilemax(
        X, norms, lams, Q, ql, al, tile=tile, interpret=True, mask_from=mf
    )
    sref = np.asarray(so._batched_scores(X, norms, lams, Q, ql, al))[:, :n0]
    sm = np.asarray(smain)
    assert np.isneginf(sm[:, 5000:]).all()
    assert np.allclose(sm[:, :5000], sref[:, :5000], atol=1e-6, rtol=1e-6)
    ts = tile // tmf.SUBS
    tm = np.asarray(submax).reshape(b, nt0 * tmf.SUBS)
    masked = sref.copy()
    masked[:, 5000:] = -np.inf
    tm_ref = masked.reshape(b, nt0 * tmf.SUBS, ts).max(axis=2)
    finite = np.isfinite(tm_ref)
    assert (np.isneginf(tm) == np.isneginf(tm_ref)).all()
    assert np.allclose(tm[finite], tm_ref[finite], atol=1e-6, rtol=1e-6)


def _run_fused_tilemax_interpret(monkeypatch, X, norms, lams, Q, ql, k, al,
                                 mask_from):
    """Drive ops.search.fused_tilemax with the Pallas kernels forced into
    interpret mode (tests run on CPU)."""
    import functools

    from matternet_rs_tpu.ops import search as so
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    monkeypatch.setattr(
        tmf, "scores_and_tilemax",
        functools.partial(tmf.scores_and_tilemax, interpret=True),
    )
    monkeypatch.setattr(
        tmf, "gather_subtiles",
        functools.partial(tmf.gather_subtiles, interpret=True),
    )
    return so.fused_tilemax(X, norms, lams, Q, ql, k, al, mask_from=mask_from)


def test_fused_tilemax_masked_full_path(monkeypatch):
    """fused_tilemax with mask_from never returns masked rows and matches
    flat top_k over the masked scores."""
    from matternet_rs_tpu.ops import search as so

    n, f, b, k = 9000, 64, 16, 5
    X, norms, lams, Q, ql, al = _fused_fixture(n, f, b, seed=13)
    top, idx = _run_fused_tilemax_interpret(
        monkeypatch, X, norms, lams, Q, ql, k, al, jnp.int32(7001)
    )

    sref = np.array(so._batched_scores(X, norms, lams, Q, ql, al))
    sref[:, 7001:] = -np.inf
    ft, fi = jax.lax.top_k(jnp.asarray(sref), k)
    assert np.allclose(np.asarray(top), np.asarray(ft), atol=1e-6)
    assert (np.asarray(idx) == np.asarray(fi)).all()
    assert (np.asarray(idx) < 7001).all()


def test_fused_tilemax_masked_wide_f(monkeypatch):
    """Wide-F (chunked-K) producer × mask_from: the sharded path's
    padded-row mask composes with the self-consistent mode — masked rows
    never returned, selection matches flat top_k over the masked scores
    at f32 accumulation tolerance."""
    from matternet_rs_tpu.ops import search as so

    n, f, b, k = 9000, 300, 16, 5
    X, norms, lams, Q, ql, al = _fused_fixture(n, f, b, seed=21)
    top, idx = _run_fused_tilemax_interpret(
        monkeypatch, X, norms, lams, Q, ql, k, al, jnp.int32(6500)
    )

    sref = np.array(so._batched_scores(X, norms, lams, Q, ql, al))
    sref[:, 6500:] = -np.inf
    ft, fi = jax.lax.top_k(jnp.asarray(sref), k)
    assert np.allclose(np.asarray(top), np.asarray(ft), atol=1e-5, rtol=1e-5)
    assert (np.asarray(idx) < 6500).all()
    # index agreement away from near-ties: scores in this fixture are
    # spread, so the self-consistent reorder error cannot flip ranks
    assert (np.asarray(idx) == np.asarray(fi)).all()


# ---------------------------------------------------------------------------
# Maxima-first producer (tilemax_only) + fused_scan_rescored
# ---------------------------------------------------------------------------
def _bf16x3_reference_scores(X, norms, lams, Q, ql, al):
    """Host reference of the kernel's bf16x3 dots → blended scores."""
    from matternet_rs_tpu.ops import search as so

    qhi = Q.astype(jnp.bfloat16)
    qlo = (Q - qhi.astype(jnp.float32)).astype(jnp.bfloat16)
    xhi = X.astype(jnp.bfloat16)
    xlo = (X - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
    f32 = jnp.float32
    dots = (
        jnp.dot(qhi, xlo.T, preferred_element_type=f32)
        + jnp.dot(qlo, xhi.T, preferred_element_type=f32)
    ) + jnp.dot(qhi, xhi.T, preferred_element_type=f32)
    qn = jnp.sqrt(jnp.sum(Q * Q, axis=-1))
    cos = so._guarded_cosine(dots, norms[None, :] * qn[:, None])
    return so._blend(cos, lams[None, :], ql[:, None], al[:, None])


@pytest.mark.parametrize("scan_dtype", ["bf16", "f32", "int8"])
def test_tilemax_only_matches_reference_maxima(scan_dtype):
    """Interpret-mode maxima-first producer == sub-tile reductions of the
    reference blended scores at the matching scan precision (1-pass bf16 /
    3-pass bf16x3 / 1-pass lossless-upcast int8 with the dequant
    multiplier riding the ``rn`` factor)."""
    from matternet_rs_tpu.ops import search as so
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    n, f, b, tile = 9000, 64, 16, 2048
    X, norms, lams, Q, ql, al = _fused_fixture(n, f, b, seed=31)
    rn = None
    if scan_dtype == "bf16":
        Xs = X.astype(jnp.bfloat16)
        sref = np.asarray(
            so._batched_scores(Xs, norms, lams, Q, ql, al)
        )
    elif scan_dtype == "int8":
        from matternet_rs_tpu.core import _quantize_rows_device_jit

        Xs, rn = _quantize_rows_device_jit(X)
        dots = jnp.dot(
            Q.astype(jnp.bfloat16), Xs.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
        qn = jnp.sqrt(jnp.sum(Q * Q, axis=-1))
        cos = dots * rn[None, :] / jnp.maximum(qn[:, None], 1e-12)
        sref = np.asarray(
            so._blend(cos, lams[None, :], ql[:, None], al[:, None])
        )
    else:
        Xs = X
        sref = np.asarray(_bf16x3_reference_scores(X, norms, lams, Q, ql, al))
    submax = tmf.tilemax_only(
        Xs, norms, lams, Q, ql, al, tile=tile, interpret=True, rn=rn
    )
    nt0 = n // tile
    n0 = nt0 * tile
    ts = tile // tmf.SUBS
    tm_ref = sref[:, :n0].reshape(b, nt0 * tmf.SUBS, ts).max(axis=2)
    np.testing.assert_allclose(np.asarray(submax), tm_ref, atol=2e-6)


def test_bf16x3_dots_are_f32_grade():
    """The 3-pass hi/lo decomposition must sit within ~2^-20 relative of
    exact f64 dots — an order tighter than 1-pass bf16 (the property the
    bf16x3_rescored tier's recall rests on)."""
    rng = np.random.default_rng(5)
    # adversarial: large common offset (the clustered-corpus failure mode)
    X = (40.0 + rng.random((512, 64)) * 1.6 - 0.8).astype(np.float32)
    Q = X[:8] + rng.standard_normal((8, 64)).astype(np.float32) * 0.01
    exact = np.asarray(Q, np.float64) @ np.asarray(X, np.float64).T
    Xj, Qj = jnp.asarray(X), jnp.asarray(Q)
    qhi = Qj.astype(jnp.bfloat16); qlo = (Qj - qhi.astype(jnp.float32)).astype(jnp.bfloat16)
    xhi = Xj.astype(jnp.bfloat16); xlo = (Xj - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
    d3 = np.asarray(
        (jnp.dot(qhi, xlo.T, preferred_element_type=jnp.float32)
         + jnp.dot(qlo, xhi.T, preferred_element_type=jnp.float32))
        + jnp.dot(qhi, xhi.T, preferred_element_type=jnp.float32),
        np.float64,
    )
    d1 = np.asarray(
        jnp.dot(Qj.astype(jnp.bfloat16), Xj.astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32), np.float64)
    rel3 = np.abs(d3 - exact).max() / np.abs(exact).max()
    rel1 = np.abs(d1 - exact).max() / np.abs(exact).max()
    assert rel3 < 2.0 ** -18, rel3
    assert rel1 > 50 * rel3          # 1-pass bf16 is far coarser


@pytest.mark.parametrize("scan_dtype", ["bf16", "f32", "int8"])
def test_fused_scan_rescored_interpret(scan_dtype, monkeypatch):
    """End-to-end maxima-first scan + exact slab rescore in interpret
    mode: returned scores are EXACT rescores of the rows they name; on a
    spread fixture the result equals the exact f32 top-k; self-queries
    recover themselves at rank 1."""
    import functools

    from matternet_rs_tpu.ops import search as so
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    monkeypatch.setattr(
        tmf, "tilemax_only",
        functools.partial(tmf.tilemax_only, interpret=True),
    )
    monkeypatch.setattr(
        tmf, "slab_dots_ring",
        functools.partial(tmf.slab_dots_ring, interpret=True),
    )
    n, f, b, k = 9000, 64, 16, 5
    X, norms, lams, Q, ql, al = _fused_fixture(n, f, b, seed=33)
    srn = None
    if scan_dtype == "bf16":
        Xs = X.astype(jnp.bfloat16)
    elif scan_dtype == "int8":
        from matternet_rs_tpu.core import _quantize_rows_device_jit

        Xs, srn = _quantize_rows_device_jit(X)
    else:
        Xs = X
    idx, top = so.fused_scan_rescored(
        Xs, X, norms, lams, Q, ql, k, 64, al, scan_rn=srn
    )
    idx, top = np.asarray(idx), np.asarray(top)

    sref = np.asarray(so._batched_scores(X, norms, lams, Q, ql, al))
    ft, fi = jax.lax.top_k(jnp.asarray(sref), k)
    ft, fi = np.asarray(ft), np.asarray(fi)
    for row in range(b):
        np.testing.assert_allclose(sref[row][idx[row]], top[row], atol=1e-6)
        assert len(set(idx[row].tolist())) == k
    if scan_dtype == "int8":
        # int8's per-row absmax grid is coarser than bf16 rounding on a
        # spread standard-normal fixture — selection may legitimately
        # swap boundary rows whose true margins sit below the grid; the
        # rescore keeps every returned score exact (asserted above).
        overlap = np.mean([
            len(set(idx[r].tolist()) & set(fi[r].tolist())) / k
            for r in range(b)
        ])
        assert overlap >= 0.8, overlap
    else:
        # Spread fixture: both scan precisions recover the exact top-k set.
        assert (np.sort(idx, axis=1) == np.sort(fi, axis=1)).all()
    # Self-queries (exact corpus rows) rank themselves first.
    idx2, _ = so.fused_scan_rescored(
        Xs, X, norms, lams, X[:16], lams[:16], k, 64,
        jnp.full((16,), 0.7, jnp.float32), scan_rn=srn,
    )
    assert (np.asarray(idx2)[:, 0] == np.arange(16)).all()


def test_fused_scan_rescored_tie_dense_bf16x3_beats_bf16(monkeypatch):
    """The motivating case (measured at 1M on-chip: 1-pass bf16 recall
    0.725): a clustered corpus with a large common offset packs true
    top-k margins far below bf16 rounding of the dominant coordinate.
    bf16x3 scan must stay essentially exact; 1-pass bf16 must be worse
    (documenting the tier ladder, not just asserting superiority)."""
    import functools

    from matternet_rs_tpu.ops import search as so
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    monkeypatch.setattr(
        tmf, "tilemax_only",
        functools.partial(tmf.tilemax_only, interpret=True),
    )
    monkeypatch.setattr(
        tmf, "slab_dots_ring",
        functools.partial(tmf.slab_dots_ring, interpret=True),
    )
    n, f, b, k = 9000, 64, 8, 10
    X = jnp.asarray(
        make_energy_test_dataset(n, f, seed=44).astype(np.float32)
    )
    rng = np.random.default_rng(3)
    norms = jnp.sqrt(jnp.sum(X * X, axis=1))
    lams = jnp.asarray(rng.random(n, dtype=np.float32))
    qi = rng.integers(0, n, b)
    Q, ql = X[qi], lams[qi]
    al = jnp.full((b,), 0.7, jnp.float32)

    sref = np.asarray(so._batched_scores(X, norms, lams, Q, ql, al))
    fi = np.asarray(jax.lax.top_k(jnp.asarray(sref), k)[1])

    def recall(Xs):
        idx, _ = so.fused_scan_rescored(Xs, X, norms, lams, Q, ql, k, 64, al)
        idx = np.asarray(idx)
        return np.mean([
            len(set(idx[r].tolist()) & set(fi[r].tolist())) / k
            for r in range(b)
        ])

    r3 = recall(X)
    r1 = recall(X.astype(jnp.bfloat16))
    assert r3 >= 0.95, r3
    assert r1 <= r3, (r1, r3)
