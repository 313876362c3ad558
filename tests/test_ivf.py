"""IVF-pruned search: layout invariants, recall vs the exact scan,
convergence to exactness at full probe width, batched/serial agreement.

Reference counterpart: none — the reference full-scans every query
(src_legacy/core.rs:1156-1193); this is the beyond-reference pruning path
built on the same stage-1 clustering.
"""

import numpy as np
import pytest

from matternet_rs_tpu.builder import ArrowSpaceBuilder
from matternet_rs_tpu.index.ivf import build_ivf
from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset


@pytest.fixture(scope="module")
def built():
    data = make_energy_test_dataset(2000, 32, seed=9).astype(np.float32)
    aspace, gl = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 6)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=24, radius=20.0)
        .with_sampling(None)
        .build(data)
    )
    aspace.build_ivf_index(bucket_size=64)
    return data, aspace, gl


def test_layout_every_item_exactly_once(built):
    data, aspace, _ = built
    items = np.asarray(aspace.ivf.bucket_items).ravel()
    real = items[items >= 0]
    assert len(real) == data.shape[0]
    assert len(np.unique(real)) == data.shape[0]


def test_layout_bucket_owners_valid(built):
    _, aspace, _ = built
    owners = np.asarray(aspace.ivf.bucket_centroid)
    assert owners.min() >= 0
    assert owners.max() < aspace.ivf.n_clusters
    # Bucket members really belong to the owner's cluster: nearest centroid
    # of each member is the bucket's centroid.
    cents = np.asarray(aspace.ivf.centroids)
    bi = np.asarray(aspace.ivf.bucket_items)
    X = np.asarray(aspace.data)
    for b in range(min(5, bi.shape[0])):
        members = bi[b][bi[b] >= 0]
        if len(members) == 0:
            continue
        d = ((X[members][:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assert (d.argmin(1) == owners[b]).all()


def test_outlier_items_reachable():
    # Force outliers: assignments with -1 rows must still land in a bucket.
    rng = np.random.default_rng(0)
    X = rng.normal(size=(300, 8)).astype(np.float32)
    a = rng.integers(0, 4, 300)
    a[:40] = -1
    ivf = build_ivf(X, assignments=a, bucket_size=32)
    items = np.asarray(ivf.bucket_items).ravel()
    assert len(items[items >= 0]) == 300


def test_full_probe_equals_exact_scan(built):
    data, aspace, gl = built
    q = data[17]
    ql = aspace.prepare_query_item(q, gl)
    exact = aspace.search_lambda_aware(q, ql, 10)
    pruned = aspace.search_lambda_aware_ivf(
        q, ql, 10, nprobe=aspace.ivf.n_buckets
    )
    assert [i for i, _ in exact] == [i for i, _ in pruned]
    np.testing.assert_allclose(
        [s for _, s in exact], [s for _, s in pruned], rtol=1e-5
    )


def test_recall_at_moderate_nprobe(built):
    data, aspace, gl = built
    rng = np.random.default_rng(3)
    qidx = rng.integers(0, data.shape[0], 32)
    hits = total = 0
    for i in qidx:
        q = data[i] + rng.normal(0, 0.05, data.shape[1]).astype(np.float32)
        ql = aspace.prepare_query_item(q, gl)
        exact = {j for j, _ in aspace.search_lambda_aware(q, ql, 10)}
        pruned = {j for j, _ in aspace.search_lambda_aware_ivf(q, ql, 10, nprobe=8)}
        hits += len(exact & pruned)
        total += len(exact)
    assert hits / total >= 0.85, f"recall {hits / total:.3f} too low at nprobe=8"


def test_self_query_top1(built):
    data, aspace, gl = built
    q = data[42]
    ql = aspace.prepare_query_item(q, gl)
    res = aspace.search_lambda_aware_ivf(q, ql, 5, nprobe=4)
    assert res[0][0] == 42


def test_batched_matches_serial(built):
    data, aspace, gl = built
    rng = np.random.default_rng(5)
    qidx = rng.integers(0, data.shape[0], 8)
    Q = data[qidx]
    bidx, bsc = aspace.search_batch_ivf(Q, gl, 10, nprobe=8)
    for r, i in enumerate(qidx):
        ql = aspace.prepare_query_item(data[i], gl)
        serial = aspace.search_lambda_aware_ivf(data[i], ql, 10, nprobe=8)
        assert bidx[r].tolist()[: len(serial)] == [j for j, _ in serial]


def test_deterministic(built):
    data, aspace, gl = built
    q = data[100]
    ql = aspace.prepare_query_item(q, gl)
    a = aspace.search_lambda_aware_ivf(q, ql, 10, nprobe=6)
    b = aspace.search_lambda_aware_ivf(q, ql, 10, nprobe=6)
    assert a == b


def test_kmeans_fallback_without_assignments():
    rng = np.random.default_rng(1)
    centers = rng.normal(size=(5, 16)) * 4
    X = (centers[rng.integers(0, 5, 500)] + rng.normal(size=(500, 16))).astype(
        np.float32
    )
    ivf = build_ivf(X, n_clusters=5, bucket_size=128)
    assert ivf.n_clusters == 5
    items = np.asarray(ivf.bucket_items).ravel()
    assert len(items[items >= 0]) == 500


def test_skewed_cluster_spans_buckets():
    rng = np.random.default_rng(2)
    # One giant cluster + one tiny one.
    X = np.concatenate(
        [
            rng.normal(0, 0.1, (900, 8)),
            rng.normal(10, 0.1, (30, 8)),
        ]
    ).astype(np.float32)
    a = np.concatenate([np.zeros(900, int), np.ones(30, int)])
    ivf = build_ivf(X, assignments=a, bucket_size=100)
    owners = np.asarray(ivf.bucket_centroid)
    assert (owners == 0).sum() == 9
    assert (owners == 1).sum() == 1
