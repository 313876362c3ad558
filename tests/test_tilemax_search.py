"""Tile-max pruned exact selection parity (ops/search.tilemax_topk).

The large-N exact batched scan replaces the flat ``lax.top_k`` over the
``[B, N]`` score matrix with a two-stage tile-max selection that is
provably score-exact (reference semantics unchanged: the scores are the
blended λ-aware scan of core.rs:1156-1193 — only the selection machinery
is TPU-restructured). These tests pin the selection against flat
``lax.top_k`` bit-for-bit on tie-free random inputs across tiling
regimes, dtypes, and the routed core entry points.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matternet_rs_tpu.ops import search as search_ops
from matternet_rs_tpu.ops.search import (
    search_lambda_aware_tilemax,
    tilemax_topk,
)


def _rand_scores(b, n, seed=0):
    rng = np.random.default_rng(seed)
    # Continuous uniform floats: exact-score ties have measure zero, so
    # index parity with flat top_k is deterministic.
    return jnp.asarray(rng.random((b, n)), jnp.float32)


@pytest.mark.parametrize(
    "b,n,k,tile",
    [
        (4, 10_000, 10, 512),      # padded remainder tile (10000 % 512 != 0)
        (7, 8_192, 5, 1024),       # exact tiling
        (3, 2_000, 10, 2048),      # c*t >= n fall-through (flat path)
        (2, 6_000, 1, 256),        # k=1
        (1, 5_003, 17, 512),       # prime N, single query
        (5, 4_096, 64, 256),       # k wider than one tile's top slots
    ],
)
def test_tilemax_matches_flat_topk(b, n, k, tile):
    scores = _rand_scores(b, n, seed=n + k)
    want_s, want_i = jax.lax.top_k(scores, min(k, n))
    got_s, got_i = tilemax_topk(scores, k, tile=tile)
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_tilemax_k_clamped_to_n():
    scores = _rand_scores(2, 37, seed=9)
    got_s, got_i = tilemax_topk(scores, 100, tile=16)
    want_s, want_i = jax.lax.top_k(scores, 37)
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_tilemax_all_equal_scores_returns_k_distinct():
    # Degenerate all-tie corpus: score multiset must still be exact and the
    # returned indices distinct (tie ORDER may differ from flat top_k at
    # the selection boundary — documented contract).
    scores = jnp.ones((3, 4096), jnp.float32)
    got_s, got_i = tilemax_topk(scores, 8, tile=256)
    assert np.asarray(got_s).tolist() == [[1.0] * 8] * 3
    for row in np.asarray(got_i):
        assert len(set(row.tolist())) == 8


def _fixture(n, f, b, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.standard_normal((n, f)), jnp.float32)
    norms = jnp.sqrt(jnp.sum(X * X, axis=1))
    lams = jnp.asarray(rng.random(n), jnp.float32)
    Q = jnp.asarray(rng.standard_normal((b, f)), jnp.float32)
    q_lams = jnp.asarray(rng.random(b), jnp.float32)
    return X, norms, lams, Q, q_lams


def _flat_batched(X, norms, lams, Q, q_lams, k, alphas):
    return jax.vmap(
        lambda q, ql, a: search_ops.search_lambda_aware(
            X, norms, lams, q, ql, k, a
        )
    )(Q, q_lams, alphas)


@pytest.mark.parametrize("n,f,tile", [(3_000, 32, 256), (5_120, 16, 512)])
def test_search_tilemax_matches_flat_search(n, f, tile):
    X, norms, lams, Q, q_lams = _fixture(n, f, 6, seed=n)
    alphas = jnp.full((6,), 0.7, jnp.float32)
    want_i, want_s = _flat_batched(X, norms, lams, Q, q_lams, 10, alphas)
    got_i, got_s = search_lambda_aware_tilemax(
        X, norms, lams, Q, q_lams, 10, alphas, tile=tile
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(want_s), rtol=0, atol=0
    )


def test_search_tilemax_per_query_alphas():
    X, norms, lams, Q, q_lams = _fixture(2_048, 24, 5, seed=3)
    alphas = jnp.asarray([0.1, 0.4, 0.7, 0.9, 1.0], jnp.float32)
    want_i, want_s = _flat_batched(X, norms, lams, Q, q_lams, 7, alphas)
    got_i, got_s = search_lambda_aware_tilemax(
        X, norms, lams, Q, q_lams, 7, alphas, tile=256
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))


def test_search_tilemax_scalar_alpha():
    X, norms, lams, Q, q_lams = _fixture(1_500, 16, 3, seed=5)
    alphas = jnp.full((3,), 0.5, jnp.float32)
    want_i, want_s = _flat_batched(X, norms, lams, Q, q_lams, 4, alphas)
    got_i, got_s = search_lambda_aware_tilemax(
        X, norms, lams, Q, q_lams, 4, jnp.float32(0.5), tile=128
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))


def test_search_tilemax_bf16_corpus_matches_bf16_flat():
    X, norms, lams, Q, q_lams = _fixture(3_072, 32, 4, seed=11)
    Xb = X.astype(jnp.bfloat16)
    alphas = jnp.full((4,), 0.7, jnp.float32)
    want_i, want_s = _flat_batched(Xb, norms, lams, Q, q_lams, 10, alphas)
    got_i, got_s = search_lambda_aware_tilemax(
        Xb, norms, lams, Q, q_lams, 10, alphas, tile=256
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    # The batched [B,F]×[F,N] bf16 matmul accumulates in a different
    # order than the vmapped matvec — scores agree to f32 ulps.
    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(want_s), rtol=0, atol=1e-6
    )


def test_core_search_batch_routes_tilemax_above_threshold():
    """End-to-end through ArrowSpace.search_batch at N ≥ TILEMAX_MIN_N:
    the routed exact path must rank identically to the single-query exact
    kernel (scores float-exact, indices equal off ties)."""
    from matternet_rs_tpu import core as core_mod
    from matternet_rs_tpu.core import ArrowSpace
    from matternet_rs_tpu.graph import GraphParams
    from matternet_rs_tpu.ops import laplacian as lap

    n, f = core_mod.TILEMAX_MIN_N, 8
    rng = np.random.default_rng(17)
    data = rng.standard_normal((n, f)).astype(np.float32)
    aspace = ArrowSpace.from_items(data)
    params = GraphParams(eps=1.0, k=4, topk=4, sparsity_check=False)
    gl = lap.build_laplacian_from_k_cluster(data[:8], params, n_items=n)
    aspace.compute_taumode(gl)

    Q = data[:4] + rng.standard_normal((4, f)).astype(np.float32) * 0.01
    got_i, got_s = aspace.search_batch(Q, gl, 10)
    for row, q in enumerate(Q):
        lam = aspace.prepare_query_item(q, gl)
        want = aspace.search_lambda_aware(q, lam, 10)
        assert [int(i) for i, _ in want] == got_i[row].tolist()
        np.testing.assert_allclose(
            [s for _, s in want], got_s[row], rtol=0, atol=1e-6
        )
