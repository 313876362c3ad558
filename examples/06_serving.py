"""HTTP serving with micro-batched concurrent dispatch.

Run: python examples/06_serving.py
"""
import json
import tempfile
import urllib.request

import numpy as np


def main():
    from matternet_rs_tpu import ArrowSpaceBuilder
    from matternet_rs_tpu.serve import IndexService, serve
    from matternet_rs_tpu.utils.fixtures import make_gaussian_blob

    X = make_gaussian_blob(500, 0.4).astype(np.float32)
    aspace, gl = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 6)
        .with_cluster_params(max_clusters=16, radius=6.0)
        .with_sparsity_check(False)
        .build(X)
    )
    service = IndexService(aspace, gl)
    server = serve(service, port=0, block=False)
    port = server.server_address[1]
    try:
        body = json.dumps({"query": X[9].tolist(), "k": 3}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            doc = json.loads(resp.read())
        print("HTTP top-3:", doc["results"])
        assert doc["results"][0]["index"] == 9
    finally:
        server.shutdown()
        service.close()
    return True


if __name__ == "__main__":
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    main()
