"""CLI end-to-end tests (build → persist → search → info)."""

import json

import numpy as np
import pytest

from matternet_rs_tpu.__main__ import main
from matternet_rs_tpu.utils.fixtures import make_gaussian_blob


@pytest.fixture()
def data_file(tmp_path):
    data = make_gaussian_blob(120, 0.4).astype(np.float32)
    path = tmp_path / "data.npy"
    np.save(path, data)
    qpath = tmp_path / "q.npy"
    np.save(qpath, data[7])
    return path, qpath, data


def test_cli_build_search_info(data_file, tmp_path, capsys):
    data_path, q_path, data = data_file
    out = tmp_path / "idx"

    main([
        "build", str(data_path), "--out", str(out), "--name", "t",
        "--max-clusters", "10", "--radius", "4.0",
    ])
    built = json.loads(capsys.readouterr().out)
    assert built["status"] == "built"
    assert built["n_items"] == 120

    main(["search", str(out), "--name", "t", "--query", str(q_path), "--k", "5"])
    res = json.loads(capsys.readouterr().out)
    assert res["results"][0][0]["index"] == 7
    assert res["results"][0][0]["score"] == pytest.approx(1.0, abs=1e-4)

    main(["info", str(out), "--name", "t"])
    meta = json.loads(capsys.readouterr().out)
    assert meta["arrowspace"]["nitems"] == 120


def test_cli_rejects_unknown_format(tmp_path):
    with pytest.raises(SystemExit):
        main(["build", "data.csv", "--out", str(tmp_path)])


def test_cli_shard_write_and_build_distributed(tmp_path, capsys):
    import json

    import numpy as np

    from matternet_rs_tpu.__main__ import main

    rng = np.random.default_rng(0)
    X = rng.normal(size=(600, 16)).astype(np.float32)
    data_path = tmp_path / "data.npy"
    np.save(data_path, X)
    q_path = tmp_path / "q.npy"
    np.save(q_path, X[7])
    store = tmp_path / "store"

    main(["shard-write", str(data_path), "--out", str(store),
          "--rows-per-shard", "250"])
    doc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert doc["n_rows"] == 600 and len(doc["shards"]) == 3

    main(["build-distributed", str(store), "--k-clusters", "8",
          "--n-devices", "4", "--query", str(q_path), "--topk", "5"])
    doc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert doc["n_items"] == 600 and doc["n_devices"] == 4
    assert doc["query_top"][0]["index"] == 7

    # Stage-1 mode flags (round 5): lloyd scale-escape + bounded serial
    # sample both build and answer the self-query.
    main(["build-distributed", str(store), "--k-clusters", "8",
          "--n-devices", "4", "--centroids", "lloyd",
          "--query", str(q_path), "--topk", "5"])
    doc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert doc["query_top"][0]["index"] == 7
    main(["build-distributed", str(store), "--k-clusters", "8",
          "--n-devices", "4", "--centroid-sample", "300",
          "--query", str(q_path), "--topk", "5"])
    doc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert doc["query_top"][0]["index"] == 7


def test_cli_streaming_build_and_search(data_file, tmp_path, capsys):
    data_path, q_path, data = data_file
    store = tmp_path / "store"

    main(["shard-write", str(data_path), "--out", str(store),
          "--rows-per-shard", "50"])
    sharded = json.loads(capsys.readouterr().out)
    assert sharded["n_rows"] == 120

    main(["build-streaming", str(store), "--max-clusters", "10",
          "--radius", "4.0", "--block-rows", "64", "--sample-rows", "120"])
    built = json.loads(capsys.readouterr().out)
    assert built["status"] == "built" and built["n_items"] == 120

    main(["search-streaming", str(store), "--query", str(q_path), "--k", "5"])
    res = json.loads(capsys.readouterr().out)
    assert res["results"][0][0]["index"] == 7

    # --sketch routes through the resident int8 sketch + exact rescore;
    # same top hit.
    main(["search-streaming", str(store), "--query", str(q_path), "--k",
          "5", "--sketch"])
    res_sk = json.loads(capsys.readouterr().out)
    assert res_sk["results"][0][0]["index"] == 7


def test_cli_streaming_build_emit_sketch(data_file, tmp_path, capsys):
    """--emit-sketch writes the sketch files during the lambda pass;
    --resume on a complete store is a no-op rebuild that still searches."""
    data_path, q_path, _ = data_file
    store = tmp_path / "store_es"
    main(["shard-write", str(data_path), "--out", str(store),
          "--rows-per-shard", "50"])
    capsys.readouterr()
    main(["build-streaming", str(store), "--max-clusters", "10",
          "--radius", "4.0", "--block-rows", "64", "--sample-rows", "120",
          "--emit-sketch"])
    built = json.loads(capsys.readouterr().out)
    assert built["status"] == "built"
    assert (store / "sketch.bin").exists()
    assert (store / "sketch_meta.npz").exists()

    main(["build-streaming", str(store), "--max-clusters", "10",
          "--radius", "4.0", "--block-rows", "64", "--sample-rows", "120",
          "--resume"])
    assert json.loads(capsys.readouterr().out)["status"] == "built"
    main(["search-streaming", str(store), "--query", str(q_path), "--k",
          "5", "--sketch"])
    assert json.loads(capsys.readouterr().out)["results"][0][0]["index"] == 7


def test_cli_distributed_save_then_stream_search(data_file, tmp_path, capsys):
    """Full CLI loop: shard-write → build-distributed --save-store →
    search-streaming on the saved index."""
    data_path, q_path, data = data_file
    store_in = tmp_path / "in"
    store_out = tmp_path / "out"

    main(["shard-write", str(data_path), "--out", str(store_in),
          "--rows-per-shard", "40"])
    capsys.readouterr()

    main(["build-distributed", str(store_in), "--k-clusters", "8",
          "--save-store", str(store_out)])
    built = json.loads(capsys.readouterr().out)
    assert built["status"] == "built"
    assert built["saved_store"] == str(store_out)

    main(["search-streaming", str(store_out), "--query", str(q_path),
          "--k", "5"])
    res = json.loads(capsys.readouterr().out)
    assert res["results"][0][0]["index"] == 7


def test_cli_serve_subprocess(data_file, tmp_path):
    """The serve subcommand boots, turns healthy, and answers queries —
    the one CLI path the in-process tests could not cover."""
    import json as _json
    import pathlib
    import socket
    import subprocess
    import sys
    import time
    import urllib.request

    data_path, q_path, data = data_file
    out = tmp_path / "idx"
    main(["build", str(data_path), "--out", str(out), "--name", "s",
          "--max-clusters", "10", "--radius", "4.0"])

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = pathlib.Path(__file__).resolve().parent.parent
    env = dict(__import__("os").environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(repo)
    proc = subprocess.Popen(
        [sys.executable, "-m", "matternet_rs_tpu", "serve", str(out),
         "--name", "s", "--port", str(port)],
        cwd=str(repo), env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        healthy = False
        for _ in range(60):
            time.sleep(1)
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/health", timeout=2
                ) as r:
                    healthy = _json.loads(r.read())["status"] == "ok"
                    break
            except Exception:
                continue
        assert healthy, "serve subprocess never became healthy"
        body = _json.dumps({"query": data[7].tolist(), "k": 3}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            doc = _json.loads(r.read())
        assert doc["results"][0]["index"] == 7
    finally:
        proc.terminate()
        proc.wait(timeout=30)
