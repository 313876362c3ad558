"""Maxima-first resident-sketch scan (VERDICT r4 #5): the round-4
int8_rescored kernel routed into the out-of-core serving tier
(``index/streaming._sketch_maxfirst_topk``), interpret-mode Pallas on CPU.

Contract: identical to the carry scan's — returned sketch-mode scores
carry int8/bf16 quantization; ``refine=True`` rescores exactly from disk,
so with a wide candidate pool the refined results equal the carry-scan
path's refined results row for row.
"""

import functools

import numpy as np
import pytest

from matternet_rs_tpu.graph import GraphParams
from matternet_rs_tpu.index.streaming import StreamingIndex
from matternet_rs_tpu.storage import shards as shard_store

N, F, K = 34_000, 32, 10
BLK = 4096            # nb=9, flat 36864 = 18 tiles of 2048 — suffix pad


@pytest.fixture(scope="module")
def index(tmp_path_factory):
    d = tmp_path_factory.mktemp("maxfirst_store")
    rng = np.random.default_rng(19)
    centers = rng.normal(size=(8, F)) * 4.0
    data = (
        centers[rng.integers(0, 8, N)] + rng.normal(size=(N, F))
    ).astype(np.float32)
    shard_store.write_shards(data, d, rows_per_shard=9000)
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    idx = StreamingIndex.build_from_store(
        d, params, max_clusters=16, radius=20.0, block_rows=BLK,
        sample_rows=4096,
    )
    idx.build_sketch(persist=False)
    # The maxima-first path is a measured NEGATIVE at the production
    # shape (carry scan faster at every B — DESIGN.md); it stays
    # implemented behind this opt-in and these tests pin its contract.
    idx.sketch_maxfirst = True
    return idx, data


@pytest.fixture()
def interpret_pallas(monkeypatch):
    from matternet_rs_tpu.ops.pallas import tilemax_fused as tmf

    monkeypatch.setattr(
        tmf, "tilemax_only",
        functools.partial(tmf.tilemax_only, interpret=True),
    )
    monkeypatch.setattr(
        tmf, "slab_dots_ring",
        functools.partial(tmf.slab_dots_ring, interpret=True),
    )

    def cpu_supported(nn, ff, bb, tile, subs=tmf.SUBS):
        return (
            nn >= tile and ff <= tmf.MAX_FUSED_F_WIDE
            and tmf.MIN_FUSED_B <= bb <= tmf.MAX_FUSED_B
            and tile % (subs * 128) == 0
        )

    monkeypatch.setattr(tmf, "tilemax_only_supported", cpu_supported)


def test_envelope_admits_and_suffix_pad_detected(index, interpret_pallas):
    idx, _ = index
    assert idx._sketch_suffix_pad
    assert idx._sketch_fused_ok(16, K, 256)
    # Off-envelope shapes refuse: giant candidate pool (slab budget).
    assert not idx._sketch_fused_ok(16, K, 10**6)


def test_refined_matches_carry_scan_path(index, interpret_pallas, monkeypatch):
    """refine=True: both paths rescore EXACTLY from disk, so scores are
    parity-grade on whatever candidates each scan surfaces; the only
    permitted deviation is slab-granular candidate recall (the in-memory
    int8_rescored tier's contract — 0.875 measured at 1M). Asserted:
    high id overlap, identical scores where ids agree, and the fused
    path's scores never EXCEED the carry path's (its candidates are a
    recall-limited subset of the same exact ranking)."""
    idx, data = index
    rng = np.random.default_rng(3)
    Q = data[rng.choice(N, 16, replace=False)]

    ids_f, sc_f = idx.search_batch_sketch(Q, K, candidates=512)
    # Force the carry-scan path for the reference run.
    monkeypatch.setattr(
        StreamingIndex, "_sketch_fused_ok", lambda self, *a: False
    )
    ids_c, sc_c = idx.search_batch_sketch(Q, K, candidates=512)
    same = ids_f == ids_c
    assert same.mean() >= 0.95, f"slab-recall overlap {same.mean():.3f}"
    np.testing.assert_allclose(
        sc_f[same], sc_c[same], atol=1e-5
    )
    assert (sc_f <= sc_c + 1e-5).all()


def test_sketch_only_serving_self_recovery(index, interpret_pallas):
    """refine=False (the 100M-stretch serving mode): exact-row
    self-queries recover themselves from the maxima-first scan, and
    sketch-mode scores agree with the carry scan's dequant formula."""
    idx, data = index
    rng = np.random.default_rng(5)
    rows = rng.choice(N, 16, replace=False)
    Q = data[rows]
    ids, sc = idx.search_batch_sketch(Q, K, candidates=128, refine=False)
    assert (ids[:, 0] == rows).all()
    assert np.isfinite(sc[:, 0]).all()
    # Self-score ≈ 1·α + λ-sim·(1−α) at int8 precision.
    assert (sc[:, 0] > 0.95).all()


def test_single_query_and_odd_batch_pad(index, interpret_pallas):
    """B=1 and non-multiple-of-8 batches pad to the envelope and trim."""
    idx, data = index
    res = idx.search_sketch(data[77], K, candidates=128)
    assert res[0][0] == 77
    ids, _ = idx.search_batch_sketch(data[[1, 2, 3]], K, candidates=128)
    assert ids.shape == (3, K)
    assert (ids[:, 0] == [1, 2, 3]).all()


def test_carry_scan_still_used_off_envelope(index):
    """Without the interpret patches the platform gate keeps CPU on the
    carry scan — the fused path must never route on CPU silently."""
    idx, data = index
    assert not idx._sketch_fused_ok(16, K, 256)
    ids, _ = idx.search_batch_sketch(data[:8], K, candidates=128)
    assert (ids[:, 0] == np.arange(8)).all()


def test_auto_policy_scale_crossover(index, interpret_pallas):
    """The AUTO default (sketch_maxfirst=None) follows the measured
    scale crossover: below MAXFIRST_MIN_ROWS flat rows the carry scan
    is faster and auto must refuse; False forces carry at any scale."""
    from matternet_rs_tpu.index.streaming import MAXFIRST_MIN_ROWS

    idx, data = index
    assert N < MAXFIRST_MIN_ROWS        # this fixture sits below it
    try:
        idx.sketch_maxfirst = None
        assert not idx._sketch_fused_ok(16, K, 256)
        idx.sketch_maxfirst = False
        assert not idx._sketch_fused_ok(16, K, 256)
    finally:
        idx.sketch_maxfirst = True


def test_flat_copy_budget_guard_applies_to_aligned_f(index, monkeypatch):
    """The lazy flatten is a jit whose outputs cannot alias its inputs,
    so it allocates a SECOND resident [n, f_pad] int8 buffer for every
    F — aligned or not. The envelope must refuse the fused path when
    that copy exceeds the budget even when f_pad == f (a 100M×128
    corpus would otherwise double 12.8 GB of sketch HBM)."""
    from matternet_rs_tpu.ops import search as search_ops

    idx, _ = index

    class _FakeArr:
        def __init__(self, shape):
            self.shape = shape

    monkeypatch.setattr(
        search_ops, "fused_rescored_path", lambda *a, **kw: True
    )
    monkeypatch.setattr(idx, "sketch_maxfirst", True)
    monkeypatch.setattr(idx, "_sketch_suffix_pad", True)
    blk = 2048
    # 8M × 128 (aligned): flat copy 1.0 GiB — admitted.
    monkeypatch.setattr(
        idx, "_sketch", (_FakeArr((8_388_608 // blk, blk, 128)),) * 4
    )
    assert idx._sketch_fused_ok(256, 10, 64)
    # ~100M × 128 (aligned): flat copy ~12.8 GB — refused on budget,
    # even though F needs no padding.
    monkeypatch.setattr(
        idx, "_sketch",
        (_FakeArr(((100_663_296 // blk), blk, 128)),) * 4,
    )
    assert not idx._sketch_fused_ok(256, 10, 64)
    # Same N at 96 features (unaligned, f_pad=128): also refused.
    monkeypatch.setattr(
        idx, "_sketch",
        (_FakeArr(((100_663_296 // blk), blk, 96)),) * 4,
    )
    assert not idx._sketch_fused_ok(256, 10, 64)


def test_flat_views_single_shot_under_concurrent_first_use(index):
    """The serving dispatch pool runs two workers concurrently: the lazy
    flatten must run exactly once under racing first use (the lock
    mirrors ArrowSpace._sketch_lock — a lost race would transiently
    allocate a second full flat copy)."""
    import threading

    from matternet_rs_tpu.index import streaming as streaming_mod

    idx, _ = index
    idx._sketch_flat = None
    n_calls = [0]
    real = streaming_mod._sketch_flatten_jit

    def slow_flatten(*a, **kw):
        n_calls[0] += 1
        import time as _t

        _t.sleep(0.05)
        return real(*a, **kw)

    orig = streaming_mod._sketch_flatten_jit
    streaming_mod._sketch_flatten_jit = slow_flatten
    try:
        barrier = threading.Barrier(4)
        outs = [None] * 4

        def worker(i):
            barrier.wait()
            outs[i] = idx._sketch_flat_views()

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    finally:
        streaming_mod._sketch_flatten_jit = orig
    assert n_calls[0] == 1, f"flatten ran {n_calls[0]} times under race"
    assert all(o is outs[0] for o in outs)


def test_streaming_index_deepcopy_and_pickle_roundtrip(index):
    """The flatten lock is per-process runtime state: deepcopy/pickle of
    a built StreamingIndex must work (ArrowSpace regression class —
    VERDICT r4 weak #2) with the lock recreated fresh on the copy."""
    import copy

    idx, data = index
    c = copy.copy(idx)
    assert c._sketch_flat_lock is not None
    d = copy.deepcopy(idx)
    assert d._sketch_flat_lock is not None
    assert d._sketch_flat_lock is not idx._sketch_flat_lock
    assert d.n_items == idx.n_items


def test_suffix_padded_unit():
    """The shared suffix-pad invariant helper (one implementation for the
    single-chip sketch and the sharded one): full-then-partial-then-empty
    layouts pass; any real block after a partial one fails."""
    from matternet_rs_tpu.index.streaming import suffix_padded

    blk = 4
    assert suffix_padded([4, 4, 4], blk)            # all full
    assert suffix_padded([4, 4, 2], blk)            # trailing partial
    assert suffix_padded([4, 2, 0], blk)            # partial then empty pad
    assert suffix_padded([4, 0, 0], blk)            # empty pad blocks
    assert suffix_padded([2], blk)                  # single partial
    assert suffix_padded([], blk)                   # degenerate
    assert not suffix_padded([4, 2, 4], blk)        # real rows after partial
    assert not suffix_padded([2, 4], blk)
    assert not suffix_padded([4, 0, 2], blk)        # rows after an empty
