"""Profiling/observability utilities tests."""

import numpy as np

import jax.numpy as jnp

from matternet_rs_tpu.utils.profiling import (
    StageTimer,
    lambda_statistics,
    timed_block_until_ready,
)


def test_stage_timer_collects_and_reports():
    t = StageTimer()
    with t.stage("a", items=100):
        sum(range(1000))
    with t.stage("b", sync=jnp.ones(4) * 2):
        pass
    assert set(t.as_dict()) == {"a", "b"}
    assert t.total() >= 0
    report = t.report()
    assert "a:" in report and "total:" in report
    assert t.timings[0].items_per_sec is not None


def test_lambda_statistics():
    stats = lambda_statistics(np.linspace(0, 1, 11))
    assert stats["min"] == 0.0 and stats["max"] == 1.0
    assert stats["count"] == 11
    assert abs(stats["mean"] - 0.5) < 1e-9


def test_timed_block_until_ready():
    dt = timed_block_until_ready(jnp.ones(8).sum(), "sum")
    assert dt >= 0.0


def test_builder_emits_stage_timings(caplog):
    """VERDICT #9: builder.build logs one line per stage with throughput
    and exposes the timings dict."""
    import logging

    import numpy as np

    from matternet_rs_tpu.builder import ArrowSpaceBuilder
    from matternet_rs_tpu.utils.fixtures import make_gaussian_blob

    data = make_gaussian_blob(120, 0.4).astype(np.float32)
    b = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 6)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=10, radius=4.0)
        .with_deterministic_clustering(True)
    )
    with caplog.at_level(logging.INFO, logger="matternet_rs_tpu"):
        b.build(data)
    assert set(b.last_stage_timings) == {
        "clustering", "laplacian", "taumode", "sorted-index"
    }
    stage_lines = [r.message for r in caplog.records if r.message.startswith("stage ")]
    assert len(stage_lines) >= 4
    assert any("items/s" in ln for ln in stage_lines)
