"""Model-family façade tests (fit/query/save)."""

import numpy as np
import pytest

from matternet_rs_tpu.models import EigenIndex, EnergyIndex, SurffaceModel
from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset, make_gaussian_blob


def test_eigen_index_fit_query():
    data = make_gaussian_blob(150, 0.4).astype(np.float32)
    idx = EigenIndex(eps=1.0, k=6, max_clusters=12, radius=4.0).fit(data)
    res = idx.query(data[31], k=5)
    assert res[0][0] == 31
    assert idx.lambdas.shape == (150,)


def test_eigen_index_query_batch_tiers():
    """The façade's batched path exposes the tier ladder; every tier's
    self-queries recover themselves at rank 1 and scores of the exact
    tier match the single-query path."""
    data = make_gaussian_blob(150, 0.4).astype(np.float32)
    idx = EigenIndex(eps=1.0, k=6, max_clusters=12, radius=4.0).fit(data)
    for tier in (False, True, "auto", "int8", "int8_rescored",
                 "int8_auto", "bf16x3_rescored"):
        ids, sc = idx.query_batch(data[:8], k=5, quantized=tier)
        assert ids.shape == (8, 5)
        assert (ids[:, 0] == np.arange(8)).all(), tier
    ref = idx.query(data[31], k=5)
    ids, sc = idx.query_batch(data[31], k=5)
    assert ids[0][0] == ref[0][0]
    assert sc[0][0] == pytest.approx(ref[0][1], abs=1e-5)


def test_eigen_index_save_roundtrip(tmp_path):
    data = make_gaussian_blob(100, 0.4).astype(np.float32)
    idx = EigenIndex(eps=1.0, k=6, max_clusters=10, radius=4.0).fit(data)
    idx.save(tmp_path, "m")
    from matternet_rs_tpu.storage import parquet as pq

    a2, gl2 = pq.load_arrowspace(tmp_path, "m")
    assert a2.nitems == 100


def test_eigen_index_unfitted_raises():
    with pytest.raises(ValueError, match="fit"):
        EigenIndex().query(np.zeros(4), 3)


def test_energy_index_fit_query():
    data = make_energy_test_dataset(200, 32, seed=5).astype(np.float32)
    idx = EnergyIndex(max_clusters=30, radius=16.0, seed=11).fit(data)
    res = idx.query(data[50], k=5)
    assert len(res) == 5
    assert res[0][1] <= res[-1][1]


def test_surfface_model_fit():
    from matternet_rs_tpu import pipeline

    data = make_gaussian_blob(120, 0.4).astype(np.float32)
    cfg = pipeline.PipelineConfig(
        clustering=pipeline.ClusteringConfig(max_clusters=15, radius_threshold=16.0)
    )
    m = SurffaceModel(config=cfg).fit(data)
    assert m.lambdas.shape == (120,)
    assert m.centroids.shape[1] == 10
