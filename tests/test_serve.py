"""HTTP serving layer tests (real sockets on loopback)."""

import json
import urllib.request

import numpy as np
import pytest

from matternet_rs_tpu.builder import ArrowSpaceBuilder
from matternet_rs_tpu.serve import IndexService, serve
from matternet_rs_tpu.utils.fixtures import make_gaussian_blob


@pytest.fixture(scope="module")
def server():
    data = make_gaussian_blob(100, 0.4).astype(np.float32)
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 6)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=10, radius=4.0)
        .with_deterministic_clustering(True)
    )
    aspace, gl = b.build(data)
    service = IndexService(aspace, gl)
    srv = serve(service, port=0, block=False)     # ephemeral port
    port = srv.server_address[1]
    yield f"http://127.0.0.1:{port}", data
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, json.loads(r.read())


def _post(url, doc):
    req = urllib.request.Request(
        url, data=json.dumps(doc).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_and_info(server):
    base, _ = server
    code, doc = _get(base + "/health")
    assert code == 200 and doc["status"] == "ok"
    code, doc = _get(base + "/info")
    assert doc["n_items"] == 100 and not doc["energy_mode"]


def test_search_endpoint(server):
    base, data = server
    code, doc = _post(base + "/search", {"query": data[9].tolist(), "k": 5})
    assert code == 200
    assert doc["results"][0]["index"] == 9
    assert doc["results"][0]["score"] == pytest.approx(1.0, abs=1e-4)


def test_search_bad_body(server):
    base, _ = server
    code, doc = _post(base + "/search", {"k": 5})
    assert code == 400 and "query" in doc["error"]


def test_search_wrong_dim(server):
    base, _ = server
    code, doc = _post(base + "/search", {"query": [1.0, 2.0]})
    assert code == 400 and "dimension" in doc["error"]


def test_search_undecidable(server):
    base, _ = server
    code, doc = _post(base + "/search", {"query": [0.0] * 10})
    assert code == 422


def test_unknown_path(server):
    base, _ = server
    code, doc = _post(base + "/nope", {"query": [1.0] * 10})
    assert code == 404
