"""Maxima-first LOCAL scan on the mesh-sharded sketch
(parallel/sketch.py ``maxfirst=True`` route), interpret-mode Pallas.

Contract: identical to the carry local scan's — per-device slab-maxima
selection + sketch-precision rescore, global ids via the device base,
the SAME all-gather merge; refined results (exact disk rescore) agree
with the carry path at wide candidate pools, modulo slab-granular
candidate recall (the documented tier contract).
"""

import functools

import numpy as np
import pytest

from matternet_rs_tpu.graph import GraphParams
from matternet_rs_tpu.index.streaming import StreamingIndex
from matternet_rs_tpu.parallel.mesh import make_mesh
from matternet_rs_tpu.parallel.sketch import ShardedSketch
from matternet_rs_tpu.storage import shards as shard_store

N, F, K = 68_000, 128, 10
BLK = 4096        # 17 blocks → padded to 18 on 2 devices → 36864 rows/dev


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    d = tmp_path_factory.mktemp("shard_maxfirst_store")
    rng = np.random.default_rng(23)
    centers = rng.normal(size=(8, F)) * 4.0
    data = (
        centers[rng.integers(0, 8, N)] + rng.normal(size=(N, F))
    ).astype(np.float32)
    shard_store.write_shards(data, d, rows_per_shard=17_000)
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    idx = StreamingIndex.build_from_store(
        d, params, max_clusters=16, radius=20.0, block_rows=BLK,
        sample_rows=4096,
    )
    sk = ShardedSketch(idx, make_mesh(2), sketch_maxfirst=True)
    return sk, data


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


def test_envelope_and_policy(built, interpret_pallas):
    sk, _ = built
    assert sk._suffix_pad
    assert sk._maxfirst_ok(16, K, 64)            # forced True
    sk.sketch_maxfirst = None
    try:
        # Auto refuses below the per-device crossover (36864 < 4M).
        assert not sk._maxfirst_ok(16, K, 64)
        sk.sketch_maxfirst = False
        assert not sk._maxfirst_ok(16, K, 64)
    finally:
        sk.sketch_maxfirst = True


def test_refined_parity_with_carry(built, interpret_pallas):
    sk, data = built
    rng = np.random.default_rng(3)
    Q = data[rng.choice(N, 16, replace=False)]
    ids_f, sc_f = sk.search_batch(Q, K, candidates=512)
    sk.sketch_maxfirst = False
    try:
        ids_c, sc_c = sk.search_batch(Q, K, candidates=512)
    finally:
        sk.sketch_maxfirst = True
    same = ids_f == ids_c
    assert same.mean() >= 0.95, f"slab-recall overlap {same.mean():.3f}"
    np.testing.assert_allclose(sc_f[same], sc_c[same], atol=1e-5)
    # Both are exact disk rescores; a missed candidate can only lower.
    assert (sc_f <= sc_c + 1e-5).all()


def test_unrefined_self_recovery_and_batch_pad(built, interpret_pallas):
    sk, data = built
    rows = np.arange(5) * 13_000 + 7          # spread across both devices
    Q = data[rows]                            # B=5 → pads to 8
    ids, sc = sk.search_batch(Q, K, candidates=128, refine=False)
    assert ids.shape == (5, K)
    assert (ids[:, 0] == rows).all()
    assert (sc[:, 0] > 0.95).all()
    res = sk.search(data[40_000], K, candidates=128)
    assert res[0][0] == 40_000
