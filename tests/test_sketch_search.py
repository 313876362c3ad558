"""Resident-sketch out-of-core search: int8 sketch scan → disk fetch →
exact rescore (index/streaming.py build_sketch/search_batch_sketch) and
the random-row fetch underneath it (storage/shards.read_rows).

Reference counterpart: none (the reference is strictly in-memory,
SURVEY §2.4). The contract tested here: with a large-enough candidate
pool the two-stage search returns EXACTLY what the exact streamed scan
returns; with the default pool its recall stays high (the sketch stage
is the only approximation — the rescore is the parity-grade kernel).
"""

import numpy as np
import pytest

from matternet_rs_tpu.graph import GraphParams
from matternet_rs_tpu.index.streaming import (
    SKETCH_FILE,
    SKETCH_META_FILE,
    StreamingIndex,
    _quantize_rows,
)
from matternet_rs_tpu.storage import shards as shard_store
from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

N, F, K = 5000, 24, 10
BLK = 1024          # 5 blocks, ragged tail (5000 = 4*1024 + 904)


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    d = tmp_path_factory.mktemp("sketch_store")
    data = make_energy_test_dataset(N, F, seed=31).astype(np.float32)
    shard_store.write_shards(data, d, rows_per_shard=1100)   # 5 shards
    return d, data


@pytest.fixture(scope="module")
def index(store):
    d, _ = store
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    return StreamingIndex.build_from_store(
        d, params, max_clusters=20, radius=20.0, block_rows=BLK,
        sample_rows=N,
    )


# ---------------------------------------------------------------- read_rows
def test_read_rows_matches_corpus(store):
    d, data = store
    rng = np.random.default_rng(7)
    ids = rng.integers(0, N, 200)
    got = shard_store.read_rows(d, ids)
    np.testing.assert_array_equal(got, data[ids])


def test_read_rows_shard_boundaries(store):
    d, data = store
    ids = np.array([0, 1099, 1100, 2199, 2200, N - 1])
    np.testing.assert_array_equal(shard_store.read_rows(d, ids), data[ids])


def test_read_rows_preserves_order_and_duplicates(store):
    d, data = store
    ids = np.array([42, 7, 42, N - 1, 7])
    np.testing.assert_array_equal(shard_store.read_rows(d, ids), data[ids])


def test_read_rows_out_of_range(store):
    d, _ = store
    with pytest.raises(IndexError):
        shard_store.read_rows(d, np.array([N]))
    with pytest.raises(IndexError):
        shard_store.read_rows(d, np.array([-1]))
    assert shard_store.read_rows(d, np.array([], np.int64)).shape == (0, F)


# ---------------------------------------------------------------- quantizer
def test_quantize_rows_bounds_and_zero_rows():
    rng = np.random.default_rng(0)
    X = rng.normal(0, 3, (64, 17)).astype(np.float32)
    X[5] = 0.0
    q8, mult = _quantize_rows(X)
    assert q8.dtype == np.int8
    assert np.abs(q8).max() <= 127
    assert mult[5] == 0.0 and (q8[5] == 0).all()
    # Dequantized cosine ≈ true cosine for every row.
    v = rng.normal(0, 1, 17).astype(np.float32)
    approx = (q8 @ v) * mult / np.linalg.norm(v)
    true = (X @ v) / (np.linalg.norm(X, axis=1) + 1e-30) / np.linalg.norm(v)
    np.testing.assert_allclose(approx[mult > 0], true[mult > 0], atol=0.02)


# ------------------------------------------------------------------ search
def test_sketch_exact_when_candidates_cover(index, store):
    """candidates = block_rows (the cap) covers everything the sketch could
    rank wrong at this scale → ids match the exact streamed scan 1:1."""
    _, data = store
    rng = np.random.default_rng(11)
    q = data[rng.integers(0, N, 6)] + 0.05 * rng.normal(
        0, 1, (6, F)
    ).astype(np.float32)
    ex_i, ex_s = index.search_batch(q, K)
    sk_i, sk_s = index.search_batch_sketch(q, K, candidates=BLK)
    np.testing.assert_array_equal(sk_i, ex_i)
    np.testing.assert_allclose(sk_s, ex_s, rtol=1e-5, atol=1e-6)


def test_sketch_default_candidates_recall(index, store):
    _, data = store
    rng = np.random.default_rng(13)
    q = data[rng.integers(0, N, 16)] + 0.05 * rng.normal(
        0, 1, (16, F)
    ).astype(np.float32)
    ex_i, _ = index.search_batch(q, K)
    sk_i, _ = index.search_batch_sketch(q, K)
    overlap = np.mean(
        [len(set(a) & set(b)) / K for a, b in zip(ex_i, sk_i)]
    )
    assert overlap >= 0.9, f"sketch recall@{K} = {overlap}"


def test_sketch_self_query_top1(index, store):
    _, data = store
    for i in (0, BLK - 1, BLK, 4 * BLK, N - 1):   # block/tail boundaries
        res = index.search_sketch(data[i], 3)
        assert res[0][0] == i
        scores = [s for _, s in res]
        assert scores == sorted(scores, reverse=True)


def test_sketch_alpha_sweep_matches_exact(index, store):
    """λ-blend weighting flows through the sketch stage too."""
    _, data = store
    q = data[123] + 0.02 * np.random.default_rng(5).normal(0, 1, F).astype(
        np.float32
    )
    for alpha in (0.3, 0.95):
        ex = index.search(q, K, alpha=alpha)
        sk = index.search_sketch(q, K, alpha=alpha, candidates=BLK)
        assert [i for i, _ in ex] == [i for i, _ in sk]


def test_sketch_persist_roundtrip(index, store):
    """sketch.bin + sketch_meta.npz reload into an identical sketch."""
    d, data = store
    index.build_sketch(persist=True, force=True)
    assert (d / SKETCH_FILE).exists() and (d / SKETCH_META_FILE).exists()
    assert (d / SKETCH_FILE).stat().st_size == N * F   # 1 byte/elem

    fresh = StreamingIndex.load(d)
    fresh.block_rows = index.block_rows
    fresh.build_sketch()           # loads from the persisted files
    rng = np.random.default_rng(17)
    q = data[rng.integers(0, N, 4)]
    a_i, a_s = index.search_batch_sketch(q, K)
    b_i, b_s = fresh.search_batch_sketch(q, K)
    np.testing.assert_array_equal(a_i, b_i)
    np.testing.assert_allclose(a_s, b_s, rtol=1e-6)


def test_sketch_k_larger_than_candidates_floor(index, store):
    """candidates below k is floored to k — never fewer rows than asked."""
    _, data = store
    ids, sc = index.search_batch_sketch(data[7][None, :], 20, candidates=4)
    assert ids.shape == (1, 20)
    assert (ids >= 0).all()
    assert ids[0, 0] == 7


def test_sketch_unrefined_mode_matches_refined_ids(index, store):
    """refine=False serves straight from the sketch scan: ids must agree
    with the refined mode at high rate (the scan is ~exact at int8/bf16;
    only the rescore ordering can differ), shapes/padding as usual."""
    d, data = store
    q = data[[3, 400, 2222, 4901]]
    r_i, r_s = index.search_batch_sketch(q, K)
    u_i, u_s = index.search_batch_sketch(q, K, refine=False)
    assert u_i.shape == (4, K) and u_s.shape == (4, K)
    # Self-query must still win outright.
    assert list(u_i[:, 0]) == [3, 400, 2222, 4901]
    # Id overlap with the refined (exact-rescored) mode stays high.
    overlap = np.mean([
        len(set(u_i[b]) & set(r_i[b])) / K for b in range(4)
    ])
    assert overlap >= 0.8, f"unrefined overlap {overlap}"
    # Scores sorted descending and finite for valid rows.
    assert np.all(np.diff(u_s, axis=1) <= 1e-6)
    assert np.all(np.isfinite(u_s))


def test_sketch_unrefined_full_pool_score_parity(index, store):
    """With candidates = block size the scan is exhaustive, so the
    unrefined mode's result quality is bounded only by int8 score
    quantization. On a clustered corpus the rank-k boundary is a dense
    tie region (score gaps ≪ quantization step), so id sets may legally
    differ — the contract is that the returned items are AS GOOD as the
    exact ones: top-1 matches and the sorted score vectors agree to
    quantization tolerance."""
    d, data = store
    q = data[[17, 3101]]
    ex_i, ex_s = index.search_batch(q, K)
    u_i, u_s = index.search_batch_sketch(q, K, candidates=BLK, refine=False)
    ex_s = np.asarray(ex_s)
    for b in range(2):
        assert u_i[b, 0] == np.asarray(ex_i)[b, 0], b
        np.testing.assert_allclose(u_s[b], ex_s[b], atol=0.02, rtol=0.02)


# ----------------------------------------------------- energy-mode sketch
@pytest.fixture(scope="module")
def energy_index(tmp_path_factory):
    """Energy-mode shard store (in-memory energy build → unified store)."""
    from matternet_rs_tpu import energymaps as em
    from matternet_rs_tpu.builder import ArrowSpaceBuilder
    from matternet_rs_tpu.parallel import make_mesh
    from matternet_rs_tpu.parallel.index import ShardedArrowSpace

    data = make_energy_test_dataset(1200, 24, seed=47).astype(np.float32)
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
    d = tmp_path_factory.mktemp("energy_sketch_store")
    sa.to_store(d)
    idx = StreamingIndex.load(d)
    # Small blocks so the scan really merges across blocks.
    idx.block_rows = 512
    idx.build_sketch(persist=False)
    return idx, data


def test_energy_sketch_refined_matches_streamed(energy_index):
    """Exact-parity contract: candidates=block + exact rescore ⇒ the
    energy sketch search returns exactly the streamed energy scan."""
    idx, data = energy_index
    Q = data[[3, 99, 640, 1100]]
    ref_ids, ref_sc = idx.search_energy_batch(Q, 8)
    got_ids, got_sc = idx.search_energy_batch_sketch(
        Q, 8, candidates=idx.block_rows
    )
    np.testing.assert_array_equal(got_ids, ref_ids)
    np.testing.assert_allclose(got_sc, ref_sc, atol=1e-6)


def test_energy_sketch_refined_self_recall_and_unrefined_contract(
    energy_index,
):
    """Energy mode is maximally tie-dense (every item in a sub-centroid
    group shares λ EXACTLY), so the int8 tie-break can reorder the
    unrefined top-k inside a tie group — the documented dense-tie
    quantization regime (DESIGN.md). Contract: refined self-recall is
    perfect; unrefined still ranks by the exact resident λ (ascending
    λ-distance, and its λ-distances match the refined ones)."""
    idx, data = energy_index
    want = np.arange(0, 1200, 173)
    r_ids, r_sc = idx.search_energy_batch_sketch(
        data[want], 5, candidates=idx.block_rows
    )
    # Ground truth for energy semantics is the streamed exact scan (NOT
    # self-recall: the query λ routes via the L2-nearest sub-centroid
    # while item λ was assigned by λ-proximity, so self is not guaranteed
    # first even exactly — reference semantics, energymaps.rs:628-674).
    g_ids, g_sc = idx.search_energy_batch(data[want], 5)
    np.testing.assert_array_equal(r_ids, g_ids)
    ids, sc = idx.search_energy_batch_sketch(
        data[want], 5, refine=False, candidates=idx.block_rows
    )
    # λ-part of the unrefined score is exact ⇒ ascending order holds and
    # the λ-distance column matches the exact rescore to f32 rounding
    # (the tie-break term is ≤ 2e-9 by construction).
    assert np.all(np.diff(sc, axis=1) >= -1e-7)
    np.testing.assert_allclose(sc, r_sc, atol=1e-5)


def test_energy_sketch_single_query_wrapper(energy_index):
    idx, data = energy_index
    got = idx.search_energy_sketch(data[7], 5, candidates=idx.block_rows)
    ref = idx.search_energy(data[7], 5)
    assert [i for i, _ in got] == [i for i, _ in ref]


def test_energy_sketch_on_eigen_store_raises(index):
    idx = index
    with pytest.raises(ValueError, match="energy-mode"):
        idx.search_energy_batch_sketch(np.zeros((1, F), np.float32), 3)


# --------------------------------------------------------- emit_sketch fusion
def test_emit_sketch_during_lambda_pass_matches_standalone(store, tmp_path):
    """build_from_store(emit_sketch=True) writes sketch.bin/sketch_meta.npz
    byte-identical to the standalone build_sketch pass, and the fused-path
    index searches identically to one whose sketch was built separately."""
    d, data = store
    fused_dir = tmp_path / "fused_store"
    shard_store.write_shards(data, fused_dir, rows_per_shard=1100)
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    fused = StreamingIndex.build_from_store(
        fused_dir, params, max_clusters=20, radius=20.0, block_rows=BLK,
        sample_rows=N, emit_sketch=True,
    )
    assert (fused_dir / SKETCH_FILE).exists()
    assert (fused_dir / SKETCH_META_FILE).exists()

    # Byte-identical to the standalone quantize pass (same _quantize_rows).
    q8 = np.memmap(fused_dir / SKETCH_FILE, np.int8, "r", shape=(N, F))
    want_q8, want_mult = _quantize_rows(data)
    np.testing.assert_array_equal(np.asarray(q8), want_q8)
    with np.load(fused_dir / SKETCH_META_FILE) as z:
        np.testing.assert_array_equal(z["mult"], want_mult)

    # build_sketch now loads from the emitted files (no corpus re-read)
    # and searches exactly like a separately-sketched index.
    sep = StreamingIndex.build_from_store(
        fused_dir, params, max_clusters=20, radius=20.0, block_rows=BLK,
        sample_rows=N, resume=True,
    )
    rng = np.random.default_rng(3)
    Q = data[rng.integers(0, N, 16)]
    fi, fs = fused.search_batch_sketch(Q, K, candidates=N)
    si, ss = sep.search_batch_sketch(Q, K, candidates=N)
    np.testing.assert_array_equal(fi, si)
    np.testing.assert_allclose(fs, ss, rtol=0, atol=0)


def test_emit_sketch_skipped_on_resume_past_block0(store, tmp_path):
    """Resuming past block 0 must NOT emit a sketch (earlier blocks are
    never re-read, so the file would be incomplete)."""
    d, data = store
    rdir = tmp_path / "resume_store"
    shard_store.write_shards(data, rdir, rows_per_shard=1100)
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    full = StreamingIndex.build_from_store(
        rdir, params, max_clusters=20, radius=20.0, block_rows=BLK,
        sample_rows=N,
    )
    # Simulate a crash after 2 whole blocks: truncate the λ file.
    lam_path = rdir / "lambdas.bin"
    with open(lam_path, "r+b") as fh:
        fh.truncate(2 * BLK * 4)
    resumed = StreamingIndex.build_from_store(
        rdir, params, max_clusters=20, radius=20.0, block_rows=BLK,
        sample_rows=N, resume=True, emit_sketch=True,
    )
    assert not (rdir / SKETCH_FILE).exists()
    assert resumed.build_timings["lambda_rows_computed"] == N - 2 * BLK
    # λ file is complete and matches the uninterrupted build.
    lam_full = np.memmap(rdir / "lambdas.bin", np.float32, "r", shape=(N,))
    assert np.all(np.isfinite(np.asarray(lam_full)))
    assert resumed.n_items == full.n_items


def test_fresh_build_drops_stale_sketch(store, tmp_path):
    """Rebuilding over (possibly changed) shard data must not leave a
    sketch from the previous corpus: the pair is unlinked with
    lambdas.bin on a fresh build and re-created only on request."""
    d, data = store
    rdir = tmp_path / "fresh_drop"
    shard_store.write_shards(data, rdir, rows_per_shard=1100)
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    StreamingIndex.build_from_store(
        rdir, params, max_clusters=20, radius=20.0, block_rows=BLK,
        sample_rows=N, emit_sketch=True,
    )
    assert (rdir / SKETCH_FILE).exists()
    # Fresh (non-resume) rebuild without emit: stale pair must vanish.
    StreamingIndex.build_from_store(
        rdir, params, max_clusters=20, radius=20.0, block_rows=BLK,
        sample_rows=N,
    )
    assert not (rdir / SKETCH_FILE).exists()
    assert not (rdir / SKETCH_META_FILE).exists()


def test_resume_truncates_torn_write_past_block_boundary(store, tmp_path):
    """A crash can tear a write 1-3 bytes past a whole-block boundary; a
    float-count comparison would miss it and every later lambda row would
    shift. Resume must truncate back to the block boundary and produce a
    lambda file identical to the uninterrupted build."""
    d, data = store
    rdir = tmp_path / "torn"
    shard_store.write_shards(data, rdir, rows_per_shard=1100)
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    StreamingIndex.build_from_store(
        rdir, params, max_clusters=20, radius=20.0, block_rows=BLK,
        sample_rows=N,
    )
    lam_clean = np.fromfile(rdir / "lambdas.bin", np.float32)
    with open(rdir / "lambdas.bin", "r+b") as fh:
        fh.truncate(2 * BLK * 4 + 2)           # torn: 2 bytes past block 2
    resumed = StreamingIndex.build_from_store(
        rdir, params, max_clusters=20, radius=20.0, block_rows=BLK,
        sample_rows=N, resume=True,
    )
    assert resumed.build_timings["lambda_rows_computed"] == N - 2 * BLK
    lam_resumed = np.fromfile(rdir / "lambdas.bin", np.float32)
    np.testing.assert_array_equal(lam_resumed, lam_clean)


def test_sketch_search_k_exceeds_block_rows(index, store):
    """k > block_rows: the per-block top width is capped at the block
    while the kk-wide carry accumulates across blocks (previously
    lax.top_k(scores, kk>blk) raised — review finding). Exactness via
    candidates=N so every block contributes everything."""
    d, data = store
    k = BLK + 200                                  # 1224 > block_rows=1024
    ids, sc = index.search_batch_sketch(
        data[:2], k, candidates=N, refine=False
    )
    assert ids.shape == (2, k)
    valid = ids[ids >= 0]
    # ids must be globally unique per row and span multiple blocks
    for row in ids:
        r = row[row >= 0]
        assert len(np.unique(r)) == len(r)
        assert r.max() >= BLK                      # beyond the first block
    # self item leads each row (scores descending)
    assert ids[0, 0] == 0 and ids[1, 0] == 1
    assert np.all(np.diff(sc, axis=1) <= 1e-6)


def test_refine_candidates_all_invalid_ids(index):
    """An all-(-1) candidate matrix returns all-miss rows instead of
    IndexError-ing on the empty union (review finding)."""
    import jax.numpy as jnp

    ids = np.full((3, 8), -1, np.int64)
    Q = jnp.zeros((3, F), jnp.float32)
    ql = jnp.zeros((3,), jnp.float32)
    al = jnp.full((3,), 0.7, jnp.float32)
    gids, sc = index.refine_candidates(
        ids, Q, ql, al, jnp.float32(0.0), jnp.float32(1.0), 5
    )
    assert (gids == -1).all() and np.isneginf(sc).all()
    gids_e, sc_e = index.refine_energy_candidates(
        ids, Q, ql, jnp.float32(0.0), jnp.float32(1.0), 5
    )
    assert (gids_e == -1).all() and np.isposinf(sc_e).all()
