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
