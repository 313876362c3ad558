"""Benchmark: end-to-end index build + query throughput (BASELINE.json
config #1: synthetic 10k×128, plus a 1M×128 row, the energy pipeline, the
NumPy reference-oracle rows, and a spectral-embedding quality metric).

Prints the cumulative result JSON line {"metric", "value", "unit",
"vs_baseline", "extra"} after EVERY completed section (last line wins for
the driver's parser): a timeout or crash mid-run costs the remaining
sections, not the whole artifact. Round 3's only loss was exactly this —
every number existed, but the single end-of-process print was never
reached (VERDICT r3 #1).

The headline metric is query QPS on the λ-aware blended search (the
reference's hot query path, src_legacy/core.rs:1156-1193) over a built index.
``vs_baseline`` compares against a NumPy full-scan on the same host (the
reference itself publishes no numbers — BASELINE.md).

Build times: ``build_seconds_cold`` includes first-compile of every jitted
stage (fresh checkout / empty compile cache — the driver's situation);
``build_seconds_warm`` is a second identical build in the same process (the
production situation: programs compiled once, then reused for every rebuild
and every shard). The persistent compilation cache makes repeat *processes*
warm too, but it is not committed (76 MB of binaries), so the official cold
number stays honest.

Round-3 decomposition: the round-2 cold figure (147 s) was dominated by the
transport's per-process FIRST device→host transfer penalty (1.5–5 min for
even an 8-int download; every subsequent D2H is milliseconds). main() now
pays that cost on a dummy transfer, records it as
``transport_first_d2h_s``, and ``build_seconds_cold`` then measures what it
claims: real tracing+XLA-compile+execution (~12 s measured at 10k×128 —
seven jitted programs, ~15 s of XLA compile total, overlapping dispatch).

Reference rows (``oracle_*``): the NumPy f64 oracle — an independent port of
the reference's exact legacy algorithm (matternet_rs_tpu/oracle.py) — is
built and queried on the SAME data, queries, and ground truth, filling the
reference rows BASELINE.md promises: its recall@10 must match the TPU
build's (same formula ⇒ same ranking), and its build/query times are the
CPU baseline for the ≥10× build-throughput north star.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

K = 10

# v5e single-chip peaks for the roofline fields (public spec: 197 bf16
# TFLOP/s MXU, 819 GB/s HBM). f32 `Precision.HIGHEST` matmuls lower to the
# 6-pass bf16 decomposition on this part, so the exact scan's compute
# ceiling is ~197/6 ≈ 32.8 TFLOP/s — the "HIGHEST-matmul floor" DESIGN.md
# measures is a fraction of THIS number, not of the bf16 peak.
V5E_PEAK_BF16_TFLOPS = 197.0
V5E_F32_HIGHEST_PASSES = 6
V5E_PEAK_HBM_GBPS = 819.0


def _roofline(flops: float, bytes_moved: float, ms: float,
              passes) -> dict:
    """Achieved TFLOP/s + HBM GB/s vs the v5e peaks, from known shapes and
    the measured per-batch ms (no profiler reaches through the tunnel).
    ``passes`` = MXU passes per logical flop (6 for f32 HIGHEST, 3 for
    bf16x3, 1 for bf16/int8): the ceiling for LOGICAL throughput is the
    bf16 peak divided by the decomposition's pass count. ``True``/
    ``False`` accepted for compat (6 / 1 passes)."""
    if passes is True:
        passes = V5E_F32_HIGHEST_PASSES
    elif passes is False:
        passes = 1
    tflops = flops / (ms / 1e3) / 1e12
    gbps = bytes_moved / (ms / 1e3) / 1e9
    ceiling = V5E_PEAK_BF16_TFLOPS / passes
    return {
        "achieved_tflops": round(tflops, 2),
        "mxu_pct_of_ceiling": round(100 * tflops / ceiling, 1),
        "mxu_ceiling_tflops": round(ceiling, 1),
        "hbm_gbps": round(gbps, 1),
        "hbm_pct_of_peak": round(100 * gbps / V5E_PEAK_HBM_GBPS, 1),
    }


# Cumulative-emission state (set up by main): every completed section
# re-prints the full result JSON so the driver's last-line parse always
# has the best headline available at that point.
_EMIT_STATE: dict = {}


def _pick_headline(extra: dict) -> tuple[str, float, float]:
    """(metric, value, baseline_qps) — best available headline right now.

    Preference: 1M exact device QPS (the official metric — compute-bound,
    reproducible within a few %) → 10k device QPS → 10k transport QPS →
    the CPU oracle's own QPS (host-only rows exist but no device row yet).
    """
    c1m = extra.get("config_1m", {})
    dt_1m = c1m.get("device_time", {}).get("exact_f32", {})
    if dt_1m.get("device_qps") and c1m.get("baseline_numpy_qps"):
        return (
            "device_qps_1m_128d_lambda_aware_top10_exact",
            dt_1m["device_qps"],
            c1m["baseline_numpy_qps"],
        )
    n_k = _EMIT_STATE.get("N", 10_000) // 1000
    f = _EMIT_STATE.get("F", 128)
    dt = extra.get("device_time", {}).get("exact_f32", {})
    if dt.get("device_qps") and extra.get("baseline_numpy_qps"):
        return (
            f"device_qps_{n_k}k_{f}d_lambda_aware_top10",
            dt["device_qps"],
            extra["baseline_numpy_qps"],
        )
    if extra.get("query_qps_transport") and extra.get("baseline_numpy_qps"):
        return (
            f"transport_qps_{n_k}k_{f}d_lambda_aware_top10",
            extra["query_qps_transport"],
            extra["baseline_numpy_qps"],
        )
    return (
        "oracle_query_qps_cpu_reference_only",
        extra.get("oracle_query_qps", 0.0),
        extra.get("oracle_query_qps", 1.0),
    )


def _emit(extra: dict) -> None:
    """Print the cumulative result line (stdout owns the JSON contract;
    progress heartbeats go to stderr via ``_mark``)."""
    metric, value, base = _pick_headline(extra)
    result = {
        "metric": metric,
        "value": round(float(value), 1),
        "unit": "queries/s",
        "vs_baseline": round(float(value) / max(float(base), 1e-9), 2),
        "extra": extra,
    }
    print(json.dumps(result), flush=True)


def _numpy_baseline_qps(X, norms, lambdas, queries, q_lams, alpha=0.7):
    """Reference-style full scan per query (rayon loop → numpy vector ops:
    generous to the baseline)."""
    t0 = time.perf_counter()
    for q, ql in zip(queries, q_lams):
        qn = np.linalg.norm(q)
        cos = (X @ q) / np.maximum(norms * qn, 1e-12)
        lam_sim = 1.0 - np.minimum(np.abs(lambdas - ql), 1.0)
        scores = alpha * cos + (1 - alpha) * lam_sim
        np.argpartition(scores, -K)[-K:]
    dt = time.perf_counter() - t0
    return len(queries) / dt


def _make_builder(N):
    from matternet_rs_tpu.builder import ArrowSpaceBuilder

    return (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 6)
        .with_sparsity_check(False)
        .with_cluster_params(max_clusters=max(64, int(2 * N**0.5) // 8), radius=25.0)
        .with_sampling(None)
    )


def _qps_protocol(
    jax, jnp, aspace, data, n_queries=256, reps=10, approx=False,
    quantized=False,
):
    """Measured QPS with a DIFFERENT query batch per rep: the remote-TPU
    transport dedupes identical dispatches, so same-args timing loops lie."""
    # The PRODUCTION batched kernel (core._batched_search_jit) — same
    # routing (tilemax exact selection above TILEMAX_MIN_N, approx_max_k
    # for approx) as the device-time protocol, so the artifact's QPS and
    # device-time rows time the same kernel.
    from matternet_rs_tpu.core import _batched_search_jit

    N = data.shape[0]
    rng = np.random.default_rng(7)
    lam_np = np.asarray(aspace.lambdas)
    alphas = jnp.full((n_queries,), 0.7, jnp.float32)

    def batched(X, norms, lams, qs, qls, k, approx):
        return _batched_search_jit(X, norms, lams, qs, qls, k, alphas, approx)

    X_d = aspace._scan_corpus(quantized)
    norms_d, lams_d = aspace.norms, aspace.lambdas
    q_idx = rng.integers(0, N, n_queries)
    warm = batched(
        X_d, norms_d, lams_d, jnp.asarray(data[q_idx]),
        jnp.asarray(lam_np[q_idx]), K, approx,
    )
    jax.block_until_ready(warm)

    rep_batches = []
    for _ in range(reps):
        ridx = rng.integers(0, N, n_queries)
        rep_batches.append(
            (jnp.asarray(data[ridx]), jnp.asarray(lam_np[ridx]))
        )
    # Median of pipelined GROUPS: dispatches within a group overlap (the
    # realistic serving pattern — a per-batch barrier would add one ~40 ms
    # tunnel round-trip each), while the median across groups keeps one
    # congested-tunnel window from dominating the figure (measured >2×
    # spread between runs). The trailing scalar download is the only
    # reliable execution barrier on this transport.
    n_groups = 3
    per_group = max(1, len(rep_batches) // n_groups)
    times = []
    # Exactly n_groups chunks (remainder folds into the last one): a
    # leftover singleton group would have zero dispatch overlap and skew
    # the median low.
    starts = [g * per_group for g in range(n_groups)]
    for gi, g in enumerate(starts):
        end = len(rep_batches) if gi == n_groups - 1 else g + per_group
        group = rep_batches[g:end]
        if not group:
            continue
        t0 = time.perf_counter()
        for qb, qlb in group:
            out = batched(X_d, norms_d, lams_d, qb, qlb, K, approx)
        float(jnp.sum(out[1]))
        times.append((time.perf_counter() - t0) / len(group))
    qps = n_queries / float(np.median(times))
    return qps, (q_idx, np.asarray(warm[0])[:, 0])


def _device_time_protocol(jax, jnp, aspace, data, n_queries=256, n_batches=64,
                          approx=False, quantized=False, int8=False):
    """Device-time measurement (VERDICT r2 #2): stream ``n_batches``
    DISTINCT pipelined dispatches with ONE trailing barrier. The tunnel
    round-trip is paid once and amortized 1/n_batches, so wall/n_batches
    converges to per-batch device time — the reproducible number the
    transport-window protocol can't give. Returns (ms_per_batch, qps).

    ``int8=True`` measures the two-stage int8-scan + exact-rescore path
    (core.py ``_batched_search_int8_jit``)."""
    N = data.shape[0]
    rng = np.random.default_rng(13)
    lam_np = np.asarray(aspace.lambdas)

    if int8:
        from matternet_rs_tpu.core import _batched_search_int8_jit

        X8_d, i8m_d = aspace._ensure_int8()
        cand = aspace._int8_cand(K, None)
        alphas = jnp.full((n_queries,), 0.7, jnp.float32)
        zero, one = jnp.float32(0.0), jnp.float32(1.0)

        def run(qb, qlb):
            # qlb is already normalized λ → identity normalization.
            return _batched_search_int8_jit(
                X8_d, i8m_d, aspace.data, aspace.norms, aspace.lambdas,
                qb, qlb, zero, one, K, cand, alphas, approx,
            )
    elif quantized == "int8_rescored":
        from matternet_rs_tpu.core import _batched_search_i8r_jit

        X8_d, i8m_d = aspace._ensure_int8()
        cand = aspace._int8_cand(K, None)
        alphas = jnp.full((n_queries,), 0.7, jnp.float32)
        zero, one = jnp.float32(0.0), jnp.float32(1.0)

        def run(qb, qlb):
            return _batched_search_i8r_jit(
                X8_d, i8m_d, aspace.data, aspace.norms, aspace.lambdas,
                qb, qlb, zero, one, K, cand, alphas, approx,
            )
    elif quantized == "bf16_rescored":
        from matternet_rs_tpu.core import _batched_search_bf16r_jit

        Xb_d = aspace._scan_corpus(True)
        cand = aspace._int8_cand(K, None)
        alphas = jnp.full((n_queries,), 0.7, jnp.float32)
        zero, one = jnp.float32(0.0), jnp.float32(1.0)

        def run(qb, qlb):
            return _batched_search_bf16r_jit(
                Xb_d, aspace.data, aspace.norms, aspace.lambdas,
                qb, qlb, zero, one, K, cand, alphas, approx,
            )
    elif quantized == "bf16x3_rescored":
        from matternet_rs_tpu.core import _batched_search_b3r_jit

        cand = aspace._int8_cand(K, None)
        alphas = jnp.full((n_queries,), 0.7, jnp.float32)
        zero, one = jnp.float32(0.0), jnp.float32(1.0)

        def run(qb, qlb):
            return _batched_search_b3r_jit(
                aspace.data, aspace.norms, aspace.lambdas,
                qb, qlb, zero, one, K, cand, alphas, approx,
            )
    else:
        # The PRODUCTION batched kernel (core._batched_search_jit): exact
        # scans route through tile-max pruned selection above
        # TILEMAX_MIN_N, approx through approx_max_k — the measurement is
        # of the path serving actually dispatches.
        from matternet_rs_tpu.core import _batched_search_jit

        X_d = aspace._scan_corpus(quantized)
        norms_d, lams_d = aspace.norms, aspace.lambdas
        alphas = jnp.full((n_queries,), 0.7, jnp.float32)

        def run(qb, qlb):
            return _batched_search_jit(
                X_d, norms_d, lams_d, qb, qlb, K, alphas, approx
            )

    batches = []
    for _ in range(n_batches):
        ridx = rng.integers(0, N, n_queries)
        batches.append((jnp.asarray(data[ridx]), jnp.asarray(lam_np[ridx])))
    # Warm (compile + first-dispatch costs out of the measurement).
    out = run(*batches[0])
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for qb, qlb in batches:
        out = run(qb, qlb)
    float(jnp.sum(out[1]))                    # single trailing barrier
    dt = time.perf_counter() - t0
    return (dt / n_batches) * 1e3, n_queries * n_batches / dt


def bench_device_time(jax, jnp, aspace, data, extra):
    """Per-batch device time, device-only QPS, and effective HBM GB/s for
    the exact and bf16-approx scans, measured twice back-to-back — the
    agreement percentage is recorded so the headline's reproducibility is
    itself part of the artifact."""
    N, F = data.shape
    out = {}
    # Small corpora need a longer stream and an extra rep: at 10k a batch
    # is ~0.7 ms of device work, so 64 batches is ~45 ms total and one
    # tunnel hiccup inside the stream swings the figure 2× (measured
    # run_agreement 34% on a congested window). 256 batches × 3 reps
    # brings the 10k row to the same stability as the 1M row.
    small = N <= 65536
    n_batches = 256 if small else 64
    n_reps = 3 if small else 2
    for name, approx, quantized, bytes_per_batch, f32h in (
        ("exact_f32", False, False, N * F * 4 + N * 8, True),
        ("approx_bf16", True, True, N * F * 2 + N * 8, False),
    ):
        runs = [
            _device_time_protocol(
                jax, jnp, aspace, data, n_batches=n_batches,
                approx=approx, quantized=quantized,
            )
            for _ in range(n_reps)
        ]
        ms_all = sorted(r[0] for r in runs)
        agree = abs(ms_all[0] - ms_all[1]) / ms_all[1]  # best two
        ms = ms_all[0]                         # best-of-reps: least transport
        out[name] = {
            "device_ms_per_batch_256q": round(ms, 3),
            "device_qps": round(max(r[1] for r in runs), 1),
            "run_agreement_pct": round(100 * (1 - agree), 1),
            "hbm_gbps_effective": round(bytes_per_batch / (ms / 1e3) / 1e9, 1),
            "roofline": _roofline(
                2.0 * 256 * N * F, bytes_per_batch, ms, f32h
            ),
        }
    extra["device_time"] = out
    return out


def _recall_setup(data, rng, n_recall_q=128):
    """Noised queries + brute-force cosine ground truth. Host-only (shared
    by the oracle rows, which now run BEFORE any device work, overlapped
    with the transport warmup)."""
    F = data.shape[1]
    base_idx = rng.integers(0, data.shape[0], n_recall_q)
    noise_q = data[base_idx] + rng.normal(0, 0.05, (n_recall_q, F)).astype(
        np.float32
    )
    Xn = data / np.maximum(np.linalg.norm(data, axis=1, keepdims=True), 1e-12)
    Qn = noise_q / np.maximum(np.linalg.norm(noise_q, axis=1, keepdims=True), 1e-12)
    gt = np.argsort(-(Qn @ Xn.T), axis=1)[:, :K]
    return noise_q, gt


def _tpu_recall(jax, jnp, aspace, gl, noise_q, gt, alpha):
    import functools

    from matternet_rs_tpu.ops import search as search_ops
    from matternet_rs_tpu.ops import taumode as tm_ops

    raw_q = np.asarray(
        tm_ops.taumode_lambdas(
            jnp.asarray(noise_q), aspace.graph_for_taumode(gl),
            aspace.taumode.mode, aspace.taumode.param,
        )
    )
    q_lams = np.clip(
        (raw_q - aspace.min_lambdas) / aspace.range_lambdas, 0.0, 1.0
    ).astype(np.float32)

    @functools.partial(jax.jit, static_argnames=("k",))
    def batched(X, norms, lams, qs, qls, alpha, k):
        return jax.vmap(
            lambda q, ql: search_ops.search_lambda_aware(
                X, norms, lams, q, ql, k, alpha=alpha
            )
        )(qs, qls)

    idx, _ = batched(
        aspace.data, aspace.norms, aspace.lambdas,
        jnp.asarray(noise_q), jnp.asarray(q_lams), jnp.float32(alpha), K,
    )
    idx = np.asarray(idx)
    return float(
        np.mean(
            [len(set(idx[i].tolist()) & set(gt[i].tolist())) / K for i in range(len(gt))]
        )
    )


def bench_headline(jax, jnp, N, F, data, noise_q, gt, extra):
    # ---- build: cold (includes compile) then warm (jit cache hot) -------
    t0 = time.perf_counter()
    b = _make_builder(N)
    aspace, gl = b.build(data)
    jax.block_until_ready(aspace.lambdas)
    build_cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    b2 = _make_builder(N)
    aspace, gl = b2.build(data)
    jax.block_until_ready(aspace.lambdas)
    build_warm = time.perf_counter() - t0

    # ---- query throughput ------------------------------------------------
    qps, (q_idx, top1) = _qps_protocol(jax, jnp, aspace, data)
    qps_approx, _ = _qps_protocol(jax, jnp, aspace, data, approx=True)
    qps_bf16, (bq_idx, btop1) = _qps_protocol(
        jax, jnp, aspace, data, approx=True, quantized=True
    )
    self_recall = float((top1 == q_idx).mean())
    extra["query_qps_bf16_approx"] = round(qps_bf16, 1)
    extra["self_recall_at_1_bf16"] = float((btop1 == bq_idx).mean())

    # ---- recall@10 vs brute force (same queries/GT as the oracle rows) ---
    recall_blend = _tpu_recall(jax, jnp, aspace, gl, noise_q, gt, 0.7)
    recall_semantic = _tpu_recall(jax, jnp, aspace, gl, noise_q, gt, 0.95)

    # ---- numpy scan baseline ----------------------------------------------
    lam_np = np.asarray(aspace.lambdas)
    base_qps = _numpy_baseline_qps(
        data, np.linalg.norm(data, axis=1), lam_np, data[q_idx[:64]], lam_np[q_idx[:64]]
    )

    extra.update(
        {
            "build_seconds_cold": round(build_cold, 2),
            "build_seconds_warm": round(build_warm, 2),
            "query_qps_approx_selection": round(qps_approx, 1),
            "self_recall_at_1": self_recall,
            "recall_at_10_vs_bruteforce_alpha0.7": round(recall_blend, 4),
            "recall_at_10_vs_bruteforce_alpha0.95": round(recall_semantic, 4),
            "baseline_numpy_qps": round(base_qps, 1),
            "n_items": N,
            "n_features": F,
        }
    )
    # Oracle-relative rows (the oracle ran before any device work).
    if "oracle_build_seconds" in extra:
        extra["build_speedup_vs_numpy"] = round(
            extra["oracle_build_seconds"] / max(build_warm, 1e-9), 2
        )
    if "oracle_recall_at_10_alpha0.7" in extra:
        extra["recall_delta_tpu_minus_oracle_alpha0.7"] = round(
            recall_blend - extra["oracle_recall_at_10_alpha0.7"], 4
        )
    return qps, base_qps, aspace, gl, b2


def bench_oracle_rows(data, builder, noise_q, gt, extra):
    """Reference rows: NumPy f64 oracle on the same data/queries/GT.

    Host-only (pure NumPy): main() runs this WHILE the first-D2H transport
    warmup is in flight on a background thread, so the warmup's 1.5-20 min
    worst case no longer sits alone on the critical path (VERDICT r3 weak
    #2). The TPU-relative rows (build speedup, recall delta) are filled in
    by bench_headline once the device build exists."""
    from matternet_rs_tpu import oracle

    t0 = time.perf_counter()
    oi = oracle.full_build(
        data,
        max_clusters=builder.cluster_max_clusters,
        radius=builder.cluster_radius,
        eps=builder.lambda_eps,
        topk=builder.lambda_topk,
        p=builder.lambda_p,
        sigma=builder.lambda_sigma,
        normalise=builder.normalise,
        fast_lambdas=True,
    )
    oracle_build = time.perf_counter() - t0

    def oracle_recall(alpha):
        hits = 0
        for qi, q in enumerate(noise_q):
            ql = oi.prepare_query(q)
            got = {i for i, _ in oracle.search_lambda_aware(oi.data, oi.lambdas, q, ql, K, alpha)}
            hits += len(got & set(gt[qi].tolist()))
        return hits / (len(noise_q) * K)

    r07 = oracle_recall(0.7)
    r095 = oracle_recall(0.95)

    # Oracle query QPS: prepared-λ full scans (the reference's hot path).
    qls = [oi.prepare_query(q) for q in noise_q[:64]]
    t0 = time.perf_counter()
    for q, ql in zip(noise_q[:64], qls):
        oracle.search_lambda_aware(oi.data, oi.lambdas, q, ql, K, 0.7)
    oracle_qps = 64 / (time.perf_counter() - t0)

    extra.update(
        {
            "oracle_build_seconds": round(oracle_build, 2),
            "oracle_recall_at_10_alpha0.7": round(r07, 4),
            "oracle_recall_at_10_alpha0.95": round(r095, 4),
            "oracle_query_qps": round(oracle_qps, 1),
        }
    )


def bench_serve_burst(jax, jnp, aspace, gl, data, extra):
    """End-to-end HTTP serving burst on the real device (VERDICT r2 weak
    #5 follow-through): mixed (k, alpha, approx) traffic from 64 client
    threads through the micro-batcher — records wall QPS and the
    service's own p50/p99/occupancy telemetry. Every prior QPS row calls
    the batched kernels directly; this is the number a user of the HTTP
    surface actually sees."""
    import concurrent.futures
    import urllib.error
    import urllib.request

    from matternet_rs_tpu.serve import IndexService, serve

    service = IndexService(aspace, gl)
    srv = serve(service, port=0, block=False)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    rng = np.random.default_rng(23)
    n_req, n_threads = 2048, 64
    ridx = rng.integers(0, data.shape[0], n_req)
    ks = rng.choice([5, 10], n_req)
    alphas = rng.uniform(0.5, 0.9, n_req)
    approxes = rng.random(n_req) < 0.3

    def one(i):
        doc = {
            "query": data[ridx[i]].tolist(), "k": int(ks[i]),
            "alpha": float(alphas[i]), "approx": bool(approxes[i]),
        }
        req = urllib.request.Request(
            base + "/search", data=json.dumps(doc).encode(), method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                return r.status
        except urllib.error.HTTPError as e:
            # A single 4xx/5xx must count as a failed request, not abort
            # the whole section (urlopen raises on non-2xx).
            return e.code

    try:
        # Warm every (k, approx) program outside the measurement — the
        # request mix is random, so enumerate the combos explicitly
        # rather than hoping the first few requests cover them...
        for k in (5, 10):
            for approx in (False, True):
                doc = {
                    "query": data[ridx[0]].tolist(), "k": k,
                    "alpha": 0.7, "approx": approx,
                }
                req = urllib.request.Request(
                    base + "/search", data=json.dumps(doc).encode(),
                    method="POST",
                )
                with urllib.request.urlopen(req, timeout=120) as r:
                    r.read()
        # ...and warm the BATCHED programs (pow-2 padded batch sizes are
        # distinct compiled programs from the b=1 warm-up above) with a
        # short untimed burst of the same traffic mix.
        with concurrent.futures.ThreadPoolExecutor(n_threads) as ex:
            list(ex.map(one, range(min(256, n_req))))
        # Report occupancy/percentiles for the measured window only.
        service.reset_metrics()
        t0 = time.perf_counter()
        with concurrent.futures.ThreadPoolExecutor(n_threads) as ex:
            codes = list(ex.map(one, range(n_req)))
        wall = time.perf_counter() - t0
        ok = sum(c == 200 for c in codes)
        m = service.metrics()
        extra["serve_burst"] = {
            "n_requests": n_req,
            "n_threads": n_threads,
            "ok": ok,
            "wall_s": round(wall, 2),
            "http_qps": round(n_req / wall, 1),
            "mixed_traffic": "k in {5,10}, alpha U(0.5,0.9), 30% approx",
            **{k: v for k, v in m.items() if v is not None},
        }
        # 256-client phase (VERDICT r4 #8: re-run at 64 AND 256 clients):
        # same 2048-request mix at 4x the concurrency — shows whether the
        # adaptive batching keeps QPS scaling (bigger batches) and what
        # the unshaped wait tail costs when nothing sheds.
        service.reset_metrics()
        t0 = time.perf_counter()
        with concurrent.futures.ThreadPoolExecutor(256) as ex:
            codes = list(ex.map(one, range(n_req)))
        wall = time.perf_counter() - t0
        m = service.metrics()
        extra["serve_burst"]["clients_256"] = {
            "ok": sum(c == 200 for c in codes),
            "wall_s": round(wall, 2),
            "http_qps": round(n_req / wall, 1),
            **{k: v for k, v in m.items() if v is not None},
        }
        # Admission-control phase: engage the queue-depth bound (live
        # attribute, read under the cv at submit) and drive the same 256
        # clients — records how much load sheds as HTTP 429 vs completes,
        # and the completed requests' percentiles under the bound.
        service.max_queue_depth = 64
        service.reset_metrics()
        t0 = time.perf_counter()
        with concurrent.futures.ThreadPoolExecutor(256) as ex:
            codes = list(ex.map(one, range(1024)))
        wall = time.perf_counter() - t0
        m = service.metrics()
        extra["serve_burst"]["admission_256c_depth64"] = {
            "n_requests": 1024,
            "ok": sum(c == 200 for c in codes),
            "shed_429": sum(c == 429 for c in codes),
            "wall_s": round(wall, 2),
            "accepted_qps": round(sum(c == 200 for c in codes) / wall, 1),
            **{k: v for k, v in m.items() if v is not None},
        }
        service.max_queue_depth = None
    finally:
        srv.shutdown()
        service.close()


def bench_energy(jax, jnp, N, F, extra):
    """Energy-pipeline build + pure-λ search throughput + retrieval sanity."""
    from matternet_rs_tpu import energymaps as em
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    data = make_energy_test_dataset(N, F, seed=43).astype(np.float32)
    b = _make_builder(N).with_expected_items(N).with_dims_reduction(True)
    t0 = time.perf_counter()
    aspace, gl_energy = b.build_energy(data)
    jax.block_until_ready(aspace.lambdas)
    build_s = time.perf_counter() - t0

    rng = np.random.default_rng(11)
    q_idx = rng.integers(0, N, 256)
    # Batched path (the serving path): one fused dispatch per batch.
    idx, _ = em.search_energy_batch(aspace, data[q_idx], gl_energy, K)
    hits = float(np.mean([(i in idx[r].tolist()) for r, i in enumerate(q_idx)]))
    reps = []
    for _ in range(5):
        ridx = rng.integers(0, N, 256)
        reps.append(data[ridx])
    t0 = time.perf_counter()
    for Q in reps:
        idx, _ = em.search_energy_batch(aspace, Q, gl_energy, K)
    qps_batch = 256 * len(reps) / (time.perf_counter() - t0)
    # Serial path for comparison (per-query host round-trips).
    t0 = time.perf_counter()
    for i in q_idx[:16]:
        em.search_energy(aspace, data[i], gl_energy, K)
    qps_serial = 16 / (time.perf_counter() - t0)
    extra["energy"] = {
        "build_seconds": round(build_s, 2),
        "self_retrieval_at_10": round(hits, 4),
        "query_qps_batched": round(qps_batch, 1),
        "query_qps_serial": round(qps_serial, 1),
        "n_subcentroids": int(aspace.sub_centroids.shape[0]),
    }


def bench_energy_banded_1m(jax, jnp, extra):
    """Banded vs full-scan energy search at 1M×128 on a spread synthetic
    energy-shaped index (λ quantized to 2048 sub-centroid values — the
    regime the banded window is built for). Measures the serving kernels
    only: the index shape is what `build_energy` produces, constructed
    directly so the comparison isn't gated on a 1M energy build."""
    from matternet_rs_tpu import energymaps as em
    from matternet_rs_tpu.core import ArrowSpace

    N, F, S = int(os.environ.get("BENCH_EB_N", 1_000_000)), 128, 2048
    rng = np.random.default_rng(5)
    data = rng.normal(size=(N, F)).astype(np.float32)
    aspace = ArrowSpace.from_items(data)
    sub_c = rng.normal(size=(S, F)).astype(np.float32)
    sc_l = np.sort(rng.uniform(0.0, 1.0, S)).astype(np.float32)
    assign = rng.integers(0, S, N)
    aspace.sub_centroids = jnp.asarray(sub_c)
    aspace.subcentroid_lambdas = jnp.asarray(sc_l)
    aspace.lambdas = jnp.asarray(sc_l[assign])
    aspace.item_norms = jnp.sqrt(jnp.sum(aspace.data * aspace.data, axis=1))

    Q = data[rng.integers(0, N, 256)]
    out = {"n_items": N, "n_subcentroids": S,
           "max_lambda_tie_group": aspace.max_lambda_tie_group()}
    ref_idx = got_idx = None
    # banded_auto at B=256 now STREAMS (the break-even routing: B·2C >
    # N/10 — energymaps.search_energy_batch), so the row asserts auto is
    # never slower than the full scan; banded_forced measures the banded
    # kernel itself at the same batch for the record.
    forced = aspace.max_lambda_tie_group() + K
    for tag, kwargs in (("full_scan", {}),
                        ("banded_auto", {"candidates": "auto"}),
                        ("banded_forced", {"candidates": forced})):
        idx, _ = em.search_energy_batch(aspace, Q, None, K, **kwargs)  # warm
        if tag == "full_scan":
            ref_idx = idx
        elif tag == "banded_auto":
            got_idx = idx
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            em.search_energy_batch(aspace, Q, None, K, **kwargs)
        dt = (time.perf_counter() - t0) / reps
        out[f"{tag}_qps_batch256"] = round(256 / dt, 1)
        out[f"{tag}_ms_batch256"] = round(dt * 1e3, 2)
    # The banding WIN case: small batches, where the gathered window is
    # a tiny fraction of the corpus (B=8 · 2C ≈ 9k rows vs N=1M) — auto
    # routes banded there and the full-scan read is avoided per batch.
    Q8 = data[rng.integers(0, N, 8)]
    for tag, kwargs in (("full_scan_b8", {}),
                        ("banded_auto_b8", {"candidates": "auto"})):
        em.search_energy_batch(aspace, Q8, None, K, **kwargs)  # warm
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            em.search_energy_batch(aspace, Q8, None, K, **kwargs)
        dt = (time.perf_counter() - t0) / reps
        out[f"{tag}_qps"] = round(8 / dt, 1)
        out[f"{tag}_ms"] = round(dt * 1e3, 2)
    # Strict index equality can differ at exact cross-group |d-lambda| ties
    # (top_k index-order vs window-order); overlap is the robust parity view.
    out["banded_matches_full_scan"] = bool(np.array_equal(ref_idx, got_idx))
    out["banded_top10_overlap"] = round(float(np.mean([
        len(set(ref_idx[i].tolist()) & set(got_idx[i].tolist())) / ref_idx.shape[1]
        for i in range(ref_idx.shape[0])
    ])), 4)
    out["banded_speedup"] = round(
        out["banded_auto_qps_batch256"] / max(out["full_scan_qps_batch256"],
                                              1e-9), 2,
    )

    # Device-time comparison (the transport rows above inherit whichever
    # congestion window the run lands in, which can bury the banded
    # path's HBM-read advantage): pipelined DISTINCT batches straight
    # into the underlying jits, one trailing barrier.
    from matternet_rs_tpu.energymaps import (
        _batched_energy_banded_jit,
        _batched_energy_search_jit,
        _sorted_lambda_arrays,
    )

    sc_dev = jnp.asarray(aspace.subcentroid_lambdas, jnp.float32)
    s_lam, s_idx = _sorted_lambda_arrays(aspace)
    cand = aspace.max_lambda_tie_group() + K
    nb = 24
    batches = [
        jnp.asarray(data[rng.integers(0, N, 256)]) for _ in range(nb)
    ]

    def full_run(Qb):
        return _batched_energy_search_jit(
            aspace.data, aspace.item_norms, aspace.lambdas,
            aspace.sub_centroids, sc_dev, Qb, Qb, K, False,
        )

    def band_run(Qb):
        return _batched_energy_banded_jit(
            aspace.data, aspace.item_norms, s_lam, s_idx,
            aspace.sub_centroids, sc_dev, Qb, Qb, K, cand,
        )

    for tag, run in (("full_scan", full_run), ("banded_forced", band_run)):
        o = run(batches[0])
        jax.block_until_ready(o)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            for Qb in batches:
                o = run(Qb)
            float(jnp.sum(o[1]))
            best = min(best or 9e9, (time.perf_counter() - t0) / nb)
        out[f"{tag}_device_ms_batch256"] = round(best * 1e3, 2)
        out[f"{tag}_device_qps"] = round(256 / best, 1)
    out["banded_device_speedup_at_b256"] = round(
        out["banded_forced_device_qps"] / max(out["full_scan_device_qps"],
                                              1e-9), 2,
    )
    extra["energy_banded_1m"] = out


def bench_spectral_quality(jax, jnp, extra):
    """Spectral-embedding quality: LOBPCG vs dense eigensolver accuracy and
    neighbor-label preservation of the item-graph eigenmap embedding
    (BASELINE.json SIFT1M row: 'eigenmaps spectral-embedding quality
    parity' — synthetic stand-in, zero-egress sandbox)."""
    from matternet_rs_tpu.graph import GraphParams
    from matternet_rs_tpu.ops import eigensolver as eig
    from matternet_rs_tpu.ops import laplacian as lap_ops

    rng = np.random.default_rng(5)
    n, f, n_classes = 2048, 128, 8
    centers = rng.normal(size=(n_classes, f)) * 4.0
    labels = rng.integers(0, n_classes, n)
    X = (centers[labels] + rng.normal(size=(n, f))).astype(np.float32)

    params = GraphParams(eps=0.6, k=12, topk=12, p=2.0, sigma=None,
                         normalise=False, sparsity_check=False)
    gl = lap_ops.build_laplacian_matrix(X, params)  # item graph [n, n]

    k_eig = 16
    t0 = time.perf_counter()
    vals_l, vecs_l = eig.lobpcg_smallest(gl.matrix, k_eig, iters=100, seed=0)
    lobpcg_s = time.perf_counter() - t0
    vals_d, _ = eig.eigsh_dense(np.asarray(gl.matrix), k_eig)
    # Scaled error: |λ|+1e-2 in the denominator keeps the metric meaningful
    # on the (exactly zero) nullspace eigenvalues of disconnected graphs.
    eig_rel_err = float(np.max(np.abs(vals_l - vals_d) / (np.abs(vals_d) + 1e-2)))

    # Embedding quality: 10-NN label agreement in the eigenmap space.
    emb = vecs_l[:, 1:]  # drop the trivial constant vector
    d = ((emb[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    nn = np.argsort(d, axis=1)[:, :10]
    agree = float((labels[nn] == labels[:, None]).mean())

    extra["spectral"] = {
        "lobpcg_seconds": round(lobpcg_s, 2),
        "lobpcg_vs_dense_max_rel_eigval_err": round(eig_rel_err, 6),
        "embedding_10nn_label_agreement": round(agree, 4),
        "n_items": n,
        "k_eigenpairs": k_eig,
    }


def bench_build_throughput_100k(jax, jnp, extra):
    """Build-throughput north star (BASELINE.json: '≥10× graph+eigenmap
    build throughput'): warm TPU build vs the NumPy f64 oracle's fast path
    at 100k×128 — large enough that per-build fixed overheads stop
    dominating (at 10k they do, which is why the headline speedup looks
    small). Warm = every jitted stage already compiled, the production
    situation for repeated/sharded builds."""
    from matternet_rs_tpu import oracle
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    N, F = 100_000, 128
    data = make_energy_test_dataset(N, F, seed=42).astype(np.float32)
    b = _make_builder(N)
    aspace, gl = b.build(data)            # warming build (compiles)
    jax.block_until_ready(aspace.lambdas)
    t0 = time.perf_counter()
    b2 = _make_builder(N)
    aspace, gl = b2.build(data)
    jax.block_until_ready(aspace.lambdas)
    tpu_s = time.perf_counter() - t0

    # Decomposition: the corpus H2D upload dominates the warm build on
    # remote-attached TPUs (measured ~43 MB/s through the tunnel → ~1.2 s
    # of the warm build at 100k×128 — an environmental cost the NumPy
    # oracle never pays and co-located HBM would make milliseconds).
    t0 = time.perf_counter()
    d_up = jnp.asarray(data)
    float(jnp.sum(d_up))                  # scalar drain = true barrier
    h2d_s = time.perf_counter() - t0

    # Device-resident rebuild: the production parameter-sweep pattern —
    # same corpus already on the chip (builder.build(device_rows=…)), so
    # only clustering/graph/λ/sort run. A measured configuration, not an
    # arithmetic subtraction.
    t0 = time.perf_counter()
    b3 = _make_builder(N)
    aspace3, _gl3 = b3.build(data, device_rows=aspace.data)
    jax.block_until_ready(aspace3.lambdas)
    tpu_resident_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    oracle.full_build(
        data, max_clusters=b2.cluster_max_clusters, radius=b2.cluster_radius,
        eps=b2.lambda_eps, topk=b2.lambda_topk, p=b2.lambda_p,
        sigma=b2.lambda_sigma, normalise=b2.normalise, fast_lambdas=True,
    )
    np_s = time.perf_counter() - t0
    extra["build_100k"] = {
        "tpu_warm_seconds": round(tpu_s, 2),
        "corpus_h2d_seconds": round(h2d_s, 2),
        "tpu_warm_device_resident_seconds": round(tpu_resident_s, 2),
        "oracle_f64_seconds": round(np_s, 2),
        "build_speedup_vs_numpy": round(np_s / max(tpu_s, 1e-9), 1),
        "build_speedup_device_resident": round(
            np_s / max(tpu_resident_s, 1e-9), 1
        ),
    }


def bench_blend_quality(jax, jnp, extra):
    """The product claim, measured: on a fixture where cosine is ambiguous
    (same-direction items split into spectrally smooth vs rough styles with
    equal-magnitude noise), the λ blend improves precision@10 over pure
    cosine. VERDICT weak #2."""
    from matternet_rs_tpu.core import TauMode
    from matternet_rs_tpu.builder import ArrowSpaceBuilder
    from matternet_rs_tpu.utils.fixtures import make_cosine_tied_smoothness_dataset

    X, labels, styles = make_cosine_tied_smoothness_dataset(seed=0)
    aspace, gl = (
        ArrowSpaceBuilder()
        .with_lambda_graph(1.0, 6)
        .with_sparsity_check(False)
        .with_synthesis(TauMode.fixed(0.5))
        .with_cluster_params(max_clusters=80, radius=30.0)
        .with_sampling(None)
        .build(X)
    )

    def precision(alpha, seed=99):
        rng = np.random.default_rng(seed)
        ps = []
        for m in range(labels.max() + 1):
            rel = np.nonzero((labels == m) & (styles == 0))[0]
            q = X[rel[0]] + rng.normal(0, 0.03, X.shape[1]).astype(np.float32)
            ql = aspace.prepare_query_item(q, gl)
            res = aspace.search_lambda_aware(q, ql, K, alpha=alpha)
            ps.append(len({i for i, _ in res} & set(rel.tolist())) / K)
        return float(np.mean(ps))

    p_cos, p_blend = precision(1.0), precision(0.7)
    extra["blend_quality"] = {
        "precision_at_10_pure_cosine": round(p_cos, 4),
        "precision_at_10_blend_alpha0.7": round(p_blend, 4),
        "lambda_blend_gain": round(p_blend - p_cos, 4),
    }


def bench_largef(jax, jnp, extra):
    """DBpedia-scale feature dimension (BASELINE config #4 shape): the
    graph+λ build stages at F=1536 (Pallas F-tiled λ) and F=4096 (exact
    ELL sparse λ), vs the strongest practical NumPy baseline (the f64
    closed-form BLAS matmuls — the oracle's fast path). λ is
    row-independent, so throughputs are compared as items/sec."""
    from matternet_rs_tpu import oracle
    from matternet_rs_tpu.graph import GraphParams
    from matternet_rs_tpu.ops import laplacian as lap_ops
    from matternet_rs_tpu.ops import taumode as tm_ops

    rng = np.random.default_rng(3)
    out = {}
    # F=16384 exercises the round-3 direct-ELL construction: the graph
    # build never materializes [F, F] (a 1 GB × 3 dense wall otherwise) —
    # memory O(F·k) + one [row_tile, F] distance strip.
    # n_np trimmed round 5: λ is row-independent so items/sec is unchanged,
    # and the f64 BLAS rows were minutes of host time against the bench's
    # hard driver deadline (they helped kill the round-4 artifact).
    for F, n_tpu, n_np in (
        (1536, 50_000, 1_000), (4096, 20_000, 400), (16_384, 10_000, 200),
    ):
        X = rng.normal(size=(n_tpu, F)).astype(np.float32)
        cents = np.stack(
            [X[rng.choice(n_tpu, 20, replace=False)].mean(0) for _ in range(200)]
        )
        params = GraphParams(eps=1.0, k=6, topk=4, sparsity_check=False)

        t0 = time.perf_counter()
        gl = lap_ops.build_laplacian_from_k_cluster(
            jnp.asarray(cents), params, n_items=n_tpu
        )
        jax.block_until_ready(
            gl.ell().weights if gl.is_ell_backed else gl.matrix
        )
        graph_s = time.perf_counter() - t0

        Xd = jnp.asarray(X)
        graph = (
            gl.ell()
            if gl.is_ell_backed or F > tm_ops.SPARSE_F_THRESHOLD
            else gl.matrix
        )
        lam = tm_ops.taumode_lambdas_auto(Xd, graph, tm_ops.TAU_MEDIAN)
        float(jnp.sum(lam))                     # warm + true barrier
        t0 = time.perf_counter()
        lam = tm_ops.taumode_lambdas_auto(Xd, graph, tm_ops.TAU_MEDIAN)
        float(jnp.sum(lam))
        tpu_s = time.perf_counter() - t0

        if F <= 4096:
            L_np = np.asarray(gl.dense(), np.float64)
            t0 = time.perf_counter()
            oracle.taumode_lambdas_fast(X[:n_np].astype(np.float64), L_np)
            np_s = time.perf_counter() - t0
            np_ips = n_np / np_s
        else:
            # Densifying 16384² f64 for the oracle costs 2 GB + minutes;
            # extrapolate its O(F²) per-item cost from the F=4096 row.
            np_ips = out["F4096"]["lambda_items_per_sec_numpy_f64"] / 16.0
        tpu_ips = n_tpu / tpu_s
        out[f"F{F}"] = {
            "graph_build_seconds": round(graph_s, 3),
            "lambda_items_per_sec_tpu": round(tpu_ips, 1),
            "lambda_items_per_sec_numpy_f64": round(np_ips, 1),
            "lambda_speedup_vs_numpy": round(tpu_ips / np_ips, 1),
            "path": (
                "direct_ell_build" if gl.is_ell_backed
                else "ell_sparse" if F > tm_ops.SPARSE_F_THRESHOLD
                else "pallas_tiled"
            ),
        }
        # λ-engine roofline (VERDICT r3 #3, second half): the dense fused
        # Pallas kernel is 7 default-precision (1-pass bf16) [n,F]×[F,F]
        # matmuls reading X once from HBM with L VMEM-resident; the ELL
        # path has no matmuls — it is gather-bandwidth-bound at
        # (k+2)·n·F·4 bytes (k row gathers of Xᵀ + the resident/transpose
        # crossing), so only the HBM fields are meaningful there.
        if out[f"F{F}"]["path"] == "pallas_tiled":
            out[f"F{F}"]["roofline"] = dict(
                bound="mxu",
                **_roofline(
                    14.0 * n_tpu * F * F,
                    n_tpu * F * 4 + F * F * 4,
                    tpu_s * 1e3, 1,
                ),
            )
        else:
            k_deg = int(graph.indices.shape[1])
            gbps = (k_deg + 2.0) * n_tpu * F * 4 / tpu_s / 1e9
            out[f"F{F}"]["roofline"] = {
                "bound": "gather_bandwidth",
                "ell_k": k_deg,
                "hbm_gbps": round(gbps, 1),
                "hbm_pct_of_peak": round(100 * gbps / V5E_PEAK_HBM_GBPS, 1),
            }
        if gl.is_ell_backed:
            e = gl.ell()
            out[f"F{F}"]["graph_memory_mb"] = round(
                (e.indices.size * 4 + e.weights.size * 4 + e.diag.size * 4)
                / 1e6, 1,
            )
            out[f"F{F}"]["dense_would_be_mb"] = round(F * F * 4 / 1e6, 1)
    extra["largef"] = out


def bench_1m(jax, jnp, extra):
    """1M×128 row (BASELINE north star scale on one chip).

    Ordered so the HEADLINE (exact-f32 device QPS) lands — and is emitted —
    before the noisier transport rows: under a tight driver window the
    official metric survives even if this section is cut short."""
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    N, F = 1_000_000, 128
    data = make_energy_test_dataset(N, F, seed=44).astype(np.float32)
    t0 = time.perf_counter()
    b = _make_builder(N)
    aspace, gl = b.build(data)
    jax.block_until_ready(aspace.lambdas)
    build_s = time.perf_counter() - t0

    c1m = {"build_seconds": round(build_s, 2), "n_items": N}
    extra["config_1m"] = c1m

    # Reference-style numpy full scan at THIS scale (16 queries suffice —
    # one scan is 0.5 GB of memory traffic): the denominator of the
    # headline's vs_baseline now that the headline lives at 1M.
    rng = np.random.default_rng(7)
    base_idx = rng.integers(0, N, 16)
    lam_np = np.asarray(aspace.lambdas)
    c1m["baseline_numpy_qps"] = round(_numpy_baseline_qps(
        data, np.linalg.norm(data, axis=1), lam_np,
        data[base_idx], lam_np[base_idx],
    ), 2)

    # Device time at 1M — the headline protocol, with roofline accounting
    # (VERDICT r3 #3): achieved TFLOP/s + HBM GB/s vs v5e peaks from known
    # shapes and measured ms. Approx bytes include the [B, N] f32 score
    # write that approx_max_k reads back; the fused exact producer writes
    # the score matrix once (fast direction) and gathers ~c·ts candidates.
    B = 256
    score_write = B * N * 4
    tiers = [
        ("exact_f32", False, False, False,
         N * F * 4 + N * 8 + score_write, True),
        # Score write counted ONCE for the XLA tiers: a 2× (write +
        # top-k read-back) model exceeded the HBM peak on its own
        # measurement (approx_bf16: 2.3 GB modeled vs 819 GB/s × 2.13 ms
        # = 1.75 GB maximally movable), proving XLA fuses the
        # reduction's read with the producer — the [B, N] plane crosses
        # HBM once.
        ("approx_bf16", True, True, False,
         N * F * 2 + N * 8 + score_write, False),
        # int8 pool-cut (quantized="int8"): scan + one score-plane
        # crossing + exact rescore of per-candidate pools. (Key renamed
        # from "int8_rescored" — no parsed artifact before r4 carries the
        # old key; "int8_rescored" now names the maxima-first tier below,
        # matching the search_batch API values 1:1.)
        ("int8", True, False, True,
         N * (F + 8) + score_write, 1),
        # int8 maxima-first rescored (quantized="int8_rescored"): one
        # MXU pass over the lossless bf16 upcast of the int8 corpus (a
        # QUARTER of the f32 read), no [B, N] score write, exact slab
        # rescore. Fastest measured rung; dominates bf16_rescored on
        # speed, recall, and sketch memory.
        ("int8_rescored", True, "int8_rescored", False,
         N * (F + 8) + B * (K + 4) * 128 * F * 4, 1),
        # Maxima-first rescored tiers (no [B, N] score write at all):
        # scan corpus read + norms/λ + the exact slab-rescore DMA
        # (c=K+4 slabs × tile/RESCORE_SUBS=128 rows × F f32 per query,
        # streamed by the scalar-prefetch kernel).
        ("bf16_rescored", True, "bf16_rescored", False,
         N * F * 2 + N * 8 + B * (K + 4) * 128 * F * 4, 1),
        ("bf16x3_rescored", True, "bf16x3_rescored", False,
         N * F * 4 + N * 8 + B * (K + 4) * 128 * F * 4, 3),
    ]
    dt = {}
    for name, approx, quantized, int8, bytes_per_batch, f32h in tiers:
        try:
            # Best of THREE 32-dispatch windows: inter-window transport
            # congestion showed ~10% spread between full runs with two
            # (73.6k vs 74.9k headline across rehearsals); a third window
            # costs ~0.1 s device time and tightens the floor estimate.
            wins = [
                _device_time_protocol(
                    jax, jnp, aspace, data, n_batches=32,
                    approx=approx, quantized=quantized, int8=int8,
                )
                for _ in range(3)
            ]
            (ms1, qps1), (ms2, qps2) = sorted(wins)[:2]
            ms = min(ms1, ms2)
            dt[name] = {
                "device_ms_per_batch_256q": round(ms, 3),
                "device_qps": round(max(qps1, qps2), 1),
                "windows_ms": [round(w[0], 3) for w in wins],
                "run_agreement_pct": round(
                    100 * (1 - abs(ms1 - ms2) / max(ms1, ms2)), 1
                ),
                "hbm_gbps_effective": round(
                    bytes_per_batch / (ms / 1e3) / 1e9, 1
                ),
                "roofline": _roofline(
                    2.0 * B * N * F, bytes_per_batch, ms, f32h
                ),
            }
            c1m["device_time"] = dt
            if name == "exact_f32":
                _emit(extra)            # the headline exists: emit NOW
        except Exception as exc:  # noqa: BLE001
            c1m[f"error_device_time_{name}"] = repr(exc)[:200]
    # Rescored-tier quality: top-10 overlap vs the exact f32 scan on the
    # same queries (the candidate stage is the only approximation).
    try:
        from matternet_rs_tpu.core import (
            _batched_search_b3r_jit,
            _batched_search_bf16r_jit,
            _batched_search_i8r_jit,
            _batched_search_int8_jit,
            _batched_search_jit,
        )

        qv = jnp.asarray(data[base_idx])
        qlv = jnp.asarray(lam_np[base_idx])
        alphas16 = jnp.full((16,), 0.7, jnp.float32)
        zero, one = jnp.float32(0.0), jnp.float32(1.0)
        cand16 = aspace._int8_cand(K, None)
        ex_idx = np.asarray(_batched_search_jit(
            aspace.data, aspace.norms, aspace.lambdas,
            qv, qlv, K, alphas16, False,
        )[0])
        X8_d, i8m_d = aspace._ensure_int8()
        runs = {
            # approx_bf16 = the plain quantized=True + approx=True scan:
            # bf16-rounded SCORES and approx_max_k selection — measured so
            # the recall column covers every tier in the table, not just
            # the rescored ones.
            "approx_bf16": _batched_search_jit(
                aspace._scan_corpus(True), aspace.norms, aspace.lambdas,
                qv, qlv, K, alphas16, True,
            ),
            # approx over the f32 corpus isolates approx_max_k's own
            # recall from bf16 score rounding (goes to extra, not the
            # device_time table — there is no f32+approx timing row).
            "approx_f32": _batched_search_jit(
                aspace.data, aspace.norms, aspace.lambdas,
                qv, qlv, K, alphas16, True,
            ),
            "int8": _batched_search_int8_jit(
                X8_d, i8m_d, aspace.data, aspace.norms, aspace.lambdas,
                qv, qlv, zero, one, K, cand16, alphas16, True,
            ),
            "int8_rescored": _batched_search_i8r_jit(
                X8_d, i8m_d, aspace.data, aspace.norms, aspace.lambdas,
                qv, qlv, zero, one, K, cand16, alphas16, True,
            ),
            "bf16_rescored": _batched_search_bf16r_jit(
                aspace._scan_corpus(True), aspace.data, aspace.norms,
                aspace.lambdas, qv, qlv, zero, one, K, cand16, alphas16,
                True,
            ),
            "bf16x3_rescored": _batched_search_b3r_jit(
                aspace.data, aspace.norms, aspace.lambdas, qv, qlv,
                zero, one, K, cand16, alphas16, True,
            ),
        }
        for tag, (r_idx, _sc) in runs.items():
            r_idx = np.asarray(r_idx)
            rec = round(float(np.mean([
                len(set(r_idx[i].tolist()) & set(ex_idx[i].tolist())) / K
                for i in range(len(base_idx))
            ])), 4)
            if tag in dt:
                dt[tag]["recall_at_10_vs_exact"] = rec
            else:
                c1m.setdefault("recall_at_10_vs_exact", {})[tag] = rec
        # Exact-grade throughput headline (VERDICT r4 #4 done-criterion):
        # bf16x3_rescored's tie behavior is fuzz-pinned (adversarial
        # sub-tile tie floods assert score-multiset equality with flat
        # top-k — test_fuzz_invariants.py), so when this run ALSO
        # measures it at recall 1.0 and faster than exact, it is the
        # exact-grade headline row, recorded as such.
        b3 = dt.get("bf16x3_rescored", {})
        ex = dt.get("exact_f32", {})
        if (
            b3.get("recall_at_10_vs_exact") == 1.0
            and ex.get("device_ms_per_batch_256q")
            and b3.get("device_ms_per_batch_256q")
        ):
            c1m["exact_grade_headline"] = {
                "tier": "bf16x3_rescored",
                "device_qps": b3["device_qps"],
                "speedup_vs_exact": round(
                    ex["device_ms_per_batch_256q"]
                    / b3["device_ms_per_batch_256q"], 3,
                ),
                "basis": "recall 1.0 this run + fuzz-pinned tie contract",
            }
    except Exception as exc:  # noqa: BLE001
        c1m["error_rescored_recall"] = repr(exc)[:200]
    _emit(extra)

    # Transport-window QPS rows (noisy by construction — recorded for the
    # end-to-end view, never the headline).
    qps, (q_idx, top1) = _qps_protocol(jax, jnp, aspace, data, reps=4)
    qps_approx, _ = _qps_protocol(jax, jnp, aspace, data, reps=4, approx=True)
    qps_bf16, (bq_idx, btop1) = _qps_protocol(
        jax, jnp, aspace, data, reps=4, approx=True, quantized=True
    )
    c1m.update({
        "query_qps_exact": round(qps, 1),
        "query_qps_approx_selection": round(qps_approx, 1),
        "query_qps_bf16_approx": round(qps_bf16, 1),
        "self_recall_at_1": float((top1 == q_idx).mean()),
        "self_recall_at_1_bf16": float((btop1 == bq_idx).mean()),
    })

    # IVF-pruned search is deliberately NOT benchmarked here: measured on
    # this chip it loses to the flat fused scan at every batch size while
    # the corpus is HBM-resident (B=1: 22 ms vs 3.2 ms — random-row gathers
    # vs streaming the corpus through the MXU). See DESIGN.md "Negative
    # result: IVF pruning on HBM-resident corpora".


def _ooc_block_iter(n_rows, f, blk, seed=77):
    """Streamed synthetic corpus generator (clustered, like the fixtures):
    nothing N-sized on the host."""
    rng = np.random.default_rng(seed)
    centers = (rng.standard_normal((32, f)) * 4.0).astype(np.float32)
    done = 0
    while done < n_rows:
        b = min(blk, n_rows - done)
        labels = rng.integers(0, 32, b)
        yield (
            centers[labels] + rng.standard_normal((b, f)).astype(np.float32)
        )
        done += b


def bench_out_of_core_10m(jax, jnp, extra, remaining_s: float = 1e9):
    """The ≥10M out-of-core proof (VERDICT r2 #1 — the last unmeasured
    north-star axis). Writes a 10M×96 raw shard store (~3.8 GB on disk),
    runs the streamed two-pass build (sample→cluster→graph, then the λ
    pass through fixed-shape device chunks), interrupts the λ pass partway
    and resumes it (the crash-resume machinery, exercised at scale), then
    measures streamed search QPS (f32 and bf16-quantized) where HBM holds
    ONE block at a time. BASELINE.json Deep1B stretch row;
    index/streaming.py:100; storage/shards.py."""
    import shutil
    import tempfile

    from matternet_rs_tpu.graph import GraphParams
    from matternet_rs_tpu.index import streaming as streaming_mod
    from matternet_rs_tpu.index.streaming import StreamingIndex
    from matternet_rs_tpu.storage import shards as shard_store

    # Scale to the remaining budget (VERDICT r3 #1: a PRESENT out-of-core
    # section at reduced N beats a timed-out one at 10M — the store write
    # alone is minutes at the sandbox's sequential-disk floor). The scale
    # actually run is recorded in the row's n_items.
    if "BENCH_OOC_N" in os.environ:
        N = int(os.environ["BENCH_OOC_N"])
    elif remaining_s > 1100:
        # 10M measured 1044 s on this sandbox (r5 rehearsal: store write
        # + resume + streamed search + sketch build + before/after rows).
        N = 10_000_000
    elif remaining_s > 500:
        N = 2_500_000
    else:
        N = 1_000_000
    F = 96
    blk = 262_144
    keep = os.environ.get("BENCH_OOC_DIR")
    tmp = keep or tempfile.mkdtemp(prefix="matternet-ooc10m-")
    out = {"n_items": N, "n_features": F, "disk_gb": round(N * F * 4 / 1e9, 2)}
    try:
        # ---- ingest: stream-write the shard store -----------------------
        t0 = time.perf_counter()
        manifest_path = os.path.join(tmp, shard_store.MANIFEST)
        if not (keep and os.path.exists(manifest_path)):
            shard_store.write_shards(_ooc_block_iter(N, F, blk), tmp)
        out["store_write_s"] = round(time.perf_counter() - t0, 1)

        # ---- pure-IO drain rate (read-ahead reader, no compute) ---------
        t0 = time.perf_counter()
        rows = 0
        reader = shard_store.stream_blocks(tmp, blk)
        for block in reader:
            rows += len(block)
        reader.close()
        out["io_only_rows_per_sec"] = round(rows / (time.perf_counter() - t0), 1)

        params = GraphParams(eps=1.0, k=6, topk=4, sparsity_check=False)

        # ---- interrupted build + resume (crash-resume at scale) ---------
        # Crash = the block stream dies partway through the λ pass; the
        # machinery cares only that the process state is gone, which an
        # exception models exactly (tests/test_streaming_index.py fuzzes
        # byte-exactness of resume; here we exercise it at 10M).
        crash_after = max(1, N // (3 * blk))
        real_stream = shard_store.stream_blocks
        stream_call = [0]
        t_mark = [0.0, 0.0]

        def dying_stream(directory, block_rows, start_row=0):
            # Call 1 is the pass-1 sampling stream — let it finish so the
            # graph checkpoint exists; the SECOND stream (the λ pass) dies
            # after `crash_after` blocks.
            stream_call[0] += 1
            t_mark[stream_call[0] - 1] = time.perf_counter()
            inner = real_stream(directory, block_rows, start_row=start_row)
            if stream_call[0] == 1:
                return inner

            def gen():
                try:
                    for i, b in enumerate(inner):
                        if i >= crash_after:
                            raise RuntimeError("simulated crash mid-λ-pass")
                        yield b
                finally:
                    inner.close()

            return gen()

        streaming_mod.shard_store.stream_blocks = dying_stream
        t0 = time.perf_counter()
        try:
            StreamingIndex.build_from_store(
                tmp, params, max_clusters=128, radius=25.0, block_rows=blk,
            )
            out["crash_simulated"] = False       # should not happen
        except RuntimeError:
            out["crash_simulated"] = True
        finally:
            streaming_mod.shard_store.stream_blocks = real_stream
        t_crashed = time.perf_counter() - t0
        lam_file = os.path.join(tmp, streaming_mod.LAMBDA_FILE)
        out["rows_done_before_crash"] = os.path.getsize(lam_file) // 4

        t0 = time.perf_counter()
        idx = StreamingIndex.build_from_store(
            tmp, params, max_clusters=128, radius=25.0, block_rows=blk,
            resume=True,
        )
        t_resumed = time.perf_counter() - t0
        assert os.path.getsize(lam_file) == N * 4, "λ file incomplete"
        lam_rows = idx.build_timings["lambda_rows_computed"]
        out.update(
            {
                "build_to_crash_s": round(t_crashed, 1),
                "resume_build_s": round(t_resumed, 1),
                "resume_skipped_rows": N - lam_rows,
                "lambda_pass_rows_per_sec": round(
                    lam_rows / max(idx.build_timings["lambda_pass_s"], 1e-9), 1
                ),
                # Pass-1 (sample→cluster→graph) happened in the CRASHED
                # run; its wall clock is the gap between the two stream
                # openings there (the resume run skips pass 1 entirely).
                "sample_cluster_graph_s": round(t_mark[1] - t_mark[0], 1),
                "total_build_s_sum": round(t_crashed + t_resumed, 1),
            }
        )

        # ---- streamed search QPS (HBM holds one block) ------------------
        rng = np.random.default_rng(5)
        probe_rows = []
        want = sorted(rng.integers(0, N, 8).tolist())
        seen = 0
        reader = shard_store.stream_blocks(tmp, blk)
        for block in reader:
            for w in want:
                if seen <= w < seen + len(block):
                    probe_rows.append(np.array(block[w - seen]))
            seen += len(block)
        reader.close()
        Q = np.stack(probe_rows) + 0.01 * rng.standard_normal(
            (len(probe_rows), F)
        ).astype(np.float32)

        ids_exact = None
        for tag, quant in (("f32", False), ("bf16", True)):
            t0 = time.perf_counter()
            idx_r, _ = idx.search_batch(Q.astype(np.float32), 10, quantized=quant)
            dt = time.perf_counter() - t0
            if not quant:
                ids_exact = idx_r
            hits = np.mean(
                [w in idx_r[r].tolist() for r, w in enumerate(want)]
            )
            out[f"search_batch8_{tag}_s"] = round(dt, 1)
            out[f"search_qps_{tag}"] = round(len(Q) / dt, 2)
            out[f"scan_gbps_{tag}"] = round(
                N * F * (2 if quant else 4) / dt / 1e9, 2
            )
            out[f"self_recall_at_10_{tag}"] = float(hits)
        out["streamed_scan_note"] = (
            "restreams the full on-disk corpus per batch; bounded by the "
            "sandbox disk+tunnel floor (DESIGN.md), serving tier is the "
            "resident_sketch below"
        )

        # ---- resident-sketch search: int8 sketch scan + exact refine ----
        # The exact streamed scan above ships the whole corpus over the
        # host↔device link per query batch (transport-bound by design);
        # the sketch uploads a 1-byte/elem quantized copy ONCE and scans
        # it at HBM speed, fetching only top candidates from disk for the
        # parity-grade rescore. Recall is measured against the exact scan
        # it replaces.
        _mark("ooc: sketch build")
        t0 = time.perf_counter()
        idx.build_sketch(persist=True)
        sk = {
            "build_upload_s": round(time.perf_counter() - t0, 1),
            "device_bytes_gb": round(N * (F + 8) / 1e9, 2),
        }
        # Warm-restart path: reload the persisted 1-byte/elem sketch file
        # (streams through the native read-ahead reader — VERDICT r3 #7;
        # the 100M stretch paid 347 s here with plain memmap reads) and
        # re-upload. This is what a process restart pays instead of
        # re-quantizing the 4-byte corpus.
        idx._sketch = None
        t0 = time.perf_counter()
        idx.build_sketch(persist=True)
        sk["reload_upload_s"] = round(time.perf_counter() - t0, 1)
        sk["reload_gbps"] = round(
            N * F / max(sk["reload_upload_s"], 1e-9) / 1e9, 3
        )
        t0 = time.perf_counter()
        sk_ids, _ = idx.search_batch_sketch(Q.astype(np.float32), 10)
        sk["first_batch8_s"] = round(time.perf_counter() - t0, 2)  # compiles
        sk["recall_at_10_vs_exact_scan"] = float(
            np.mean(
                [
                    len(set(a.tolist()) & set(b.tolist())) / 10.0
                    for a, b in zip(sk_ids, ids_exact)
                ]
            )
        )
        sk["self_recall_at_10"] = float(
            np.mean([w in sk_ids[r].tolist() for r, w in enumerate(want)])
        )
        for bsz in (8, 64, 256, 1024):
            QB = np.repeat(Q, max(1, bsz // len(Q)), axis=0)[:bsz]
            idx.search_batch_sketch(QB, 10)          # warm this batch shape
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                idx.search_batch_sketch(QB, 10)
            dt = (time.perf_counter() - t0) / reps
            sk[f"search_qps_batch{bsz}"] = round(bsz / dt, 1)
            sk[f"search_ms_batch{bsz}"] = round(dt * 1e3, 1)

        # Sketch-only serving mode (refine=False): no disk rescore, only
        # [B, k] crosses the wire — the floor is the device scan itself.
        u_ids, _ = idx.search_batch_sketch(
            Q.astype(np.float32), 10, refine=False
        )
        sk["unrefined_recall_at_10_vs_exact_scan"] = float(
            np.mean(
                [
                    len(set(a.tolist()) & set(b.tolist())) / 10.0
                    for a, b in zip(u_ids, ids_exact)
                ]
            )
        )
        for bsz in (256, 1024):
            QB = np.repeat(Q, max(1, bsz // len(Q)), axis=0)[:bsz]
            idx.search_batch_sketch(QB, 10, refine=False)    # warm
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                idx.search_batch_sketch(QB, 10, refine=False)
            dt = (time.perf_counter() - t0) / reps
            sk[f"unrefined_qps_batch{bsz}"] = round(bsz / dt, 1)
            sk[f"unrefined_ms_batch{bsz}"] = round(dt * 1e3, 1)

        # Round-5 maxima-first sketch scan — the measured SCALE
        # CROSSOVER (DESIGN.md): the default rows above use the AUTO
        # policy (maxima-first from MAXFIRST_MIN_ROWS flat rows, carry
        # below). Measure BOTH paths forced at the same shapes so the
        # crossover stays an in-artifact measurement each round.
        try:
            idx.sketch_maxfirst = True
            sk["maxfirst_admissible"] = bool(
                idx._sketch_fused_ok(256, 10, 64)
            )
        finally:
            idx.sketch_maxfirst = None       # probe must not leak a force
        sk["default_engages_maxfirst"] = (
            sk["maxfirst_admissible"]
            and N >= streaming_mod.MAXFIRST_MIN_ROWS
        )
        if sk["maxfirst_admissible"]:
            _mark("ooc: maxfirst/carry before-after")
            try:
                for forced, tag in ((True, "maxfirst"), (False, "carry")):
                    idx.sketch_maxfirst = forced
                    for bsz in (256, 1024):
                        QB = np.repeat(
                            Q, max(1, bsz // len(Q)), axis=0
                        )[:bsz]
                        idx.search_batch_sketch(QB, 10, refine=False)
                        t0 = time.perf_counter()
                        reps = 3
                        for _ in range(reps):
                            idx.search_batch_sketch(QB, 10, refine=False)
                        dt = (time.perf_counter() - t0) / reps
                        sk[f"{tag}_unrefined_qps_batch{bsz}"] = round(
                            bsz / dt, 1
                        )
                for bsz in (256, 1024):
                    sk[f"maxfirst_vs_carry_batch{bsz}"] = round(
                        sk[f"maxfirst_unrefined_qps_batch{bsz}"]
                        / sk[f"carry_unrefined_qps_batch{bsz}"], 2,
                    )
            finally:
                idx.sketch_maxfirst = None       # restore AUTO
        out["resident_sketch"] = sk

        # ---- 8-virtual-device distributed build from a store ------------
        # The real chip is single-device, so the mesh path runs in a CPU
        # subprocess (the same virtual-mesh regime the test suite and the
        # driver's dryrun validate) on a store slice sized for one host
        # core — this measures the PATH at store scale, not TPU speed.
        out["distributed_store_build"] = _ooc_distributed_subprocess(F, blk)
    finally:
        if not keep:
            shutil.rmtree(tmp, ignore_errors=True)
    extra["out_of_core_10m"] = out


def bench_distributed_parity(jax, jnp, extra):
    """Distributed-vs-serial build equivalence, measured at 100k (VERDICT
    r2 #4): recall@10 overlap on shared queries, λ Spearman/Pearson/KS,
    centroid regime. Runs in a CPU subprocess (8 virtual devices — the
    real chip is single-device); the asserted version lives in
    tests/test_distributed_serial_parity.py."""
    import subprocess
    import sys

    script = """
import os, time, json
os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS','') + ' --xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from matternet_rs_tpu.builder import ArrowSpaceBuilder
from matternet_rs_tpu.graph import GraphParams
from matternet_rs_tpu.parallel import make_mesh
from matternet_rs_tpu.parallel.index import ShardedArrowSpace

N, F, K = 100_000, 32, 10
rng = np.random.default_rng(17)
centers = rng.normal(size=(16, F)) * 4.0
X = (centers[rng.integers(0, 16, N)] + rng.normal(size=(N, F))).astype(np.float32)
b = (ArrowSpaceBuilder().with_lambda_graph(1.0, 6).with_sparsity_check(False)
     .with_cluster_params(max_clusters=64, radius=25.0).with_sampling(None))
aspace, gl = b.build(X)
mesh = make_mesh(8)
shards = [X[:N//3], X[N//3:2*N//3], X[2*N//3:]]
# Lloyd mode FORCED for the divergence row (the DEFAULT is now
# centroids='serial', VERDICT r4 #6 — measured below as default_mode).
sa = ShardedArrowSpace.distributed_build(
    shards, GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False),
    k_clusters=aspace.n_clusters, mesh=mesh, centroids='lloyd')
# centroids='serial' (VERDICT r3 #4): serial incremental scan fixes the
# centroids, sharded graph/lambda stages are exact -> ranking-equivalent.
# Graph params must be the builder's POST-define_result_k ones (topk 4).
t0 = time.perf_counter()
sa_ser = ShardedArrowSpace.distributed_build(
    shards, b.graph_params(), k_clusters=64, radius=25.0,
    centroids='serial', mesh=mesh)
serial_mode_s = time.perf_counter() - t0

queries = X[rng.integers(0, N, 48)] + 0.05 * rng.normal(size=(48, F)).astype(np.float32)
queries = queries.astype(np.float32)
s_idx, _ = aspace.search_batch(queries, gl, K)
def overlap_of(dist_sa):
    ov = []
    for r, q in enumerate(queries):
        d_ids = [i for i, _ in dist_sa.search(q, k=K)]
        ov.append(len(set(s_idx[r].tolist()) & set(d_ids)) / K)
    return round(float(np.mean(ov)), 4)
lam_s = np.asarray(aspace.lambdas); lam_d = np.asarray(sa.lambdas)[:N]
lam_ser = np.asarray(sa_ser.lambdas)[:N]
rs = np.argsort(np.argsort(lam_s)); rd = np.argsort(np.argsort(lam_d))
grid = np.linspace(0, 1, 512)
cdf = lambda lam: np.searchsorted(np.sort(lam), grid, side='right') / N
print(json.dumps({
    'n_items': N,
    'recall_overlap_at_10': overlap_of(sa),
    'lambda_spearman': round(float(np.corrcoef(rs, rd)[0, 1]), 4),
    'lambda_pearson': round(float(np.corrcoef(lam_s, lam_d)[0, 1]), 4),
    'lambda_ks': round(float(np.max(np.abs(cdf(lam_s) - cdf(lam_d)))), 4),
    'n_clusters_serial': int(aspace.n_clusters),
    'serial_mode': {
        'recall_overlap_at_10': overlap_of(sa_ser),
        'lambda_max_abs_diff': round(float(np.max(np.abs(lam_ser - lam_s))), 6),
        'build_s': round(serial_mode_s, 1),
    },
    'default_mode': 'serial',
    'lloyd_row_note': 'lloyd forced above; the distributed_build DEFAULT is the serial (overlap-1.0) mode since r5',
}))
"""
    r = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=1200, cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    for line in reversed(r.stdout.strip().splitlines()):
        if line.startswith("{"):
            extra["distributed_parity_100k"] = json.loads(line)
            return
    extra["distributed_parity_100k"] = {"error": (r.stderr or r.stdout)[-300:]}


def _ooc_distributed_subprocess(f, blk, n_rows=200_000):
    import shutil
    import subprocess
    import sys
    import tempfile

    from matternet_rs_tpu.storage import shards as shard_store

    tmp = tempfile.mkdtemp(prefix="matternet-ooc-dist-")
    try:
        shard_store.write_shards(_ooc_block_iter(n_rows, f, blk, seed=88), tmp)
        script = f"""
import os, time, json
os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS','') + ' --xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from matternet_rs_tpu.graph import GraphParams
from matternet_rs_tpu.storage import shards as ss
t0 = time.perf_counter()
sa = ss.distributed_build_from_store(
    {tmp!r}, GraphParams(eps=1.0, k=6, topk=4, sparsity_check=False),
    k_clusters=32, n_devices=8, lloyd_iters=4,
)
build_s = time.perf_counter() - t0
reader = ss.stream_blocks({tmp!r}, 4096)
probe = next(reader)[17]; reader.close()
res = sa.search(probe, k=3)
print(json.dumps({{
    'build_s': round(build_s, 1),
    'rows_per_sec': round({n_rows} / build_s, 1),
    'n_rows': {n_rows}, 'n_devices': 8,
    'self_top1_ok': bool(res[0][0] == 17),
}}))
"""
        r = subprocess.run(
            [sys.executable, "-c", script], capture_output=True, text=True,
            timeout=900, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in reversed(r.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
        return {"error": (r.stderr or r.stdout)[-300:]}
    except Exception as exc:  # noqa: BLE001
        return {"error": repr(exc)[:300]}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _mark(msg: str) -> None:
    """Progress heartbeat on stderr (the JSON contract owns stdout): when a
    congested tunnel stalls a section, the driver's capture shows WHERE."""
    import sys

    print(f"bench[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    import pathlib
    import threading

    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: repeat bench runs skip first-compiles.
    # Configured BEFORE the warmup thread can initialize the backend.
    cache_dir = pathlib.Path(__file__).parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    t_start = time.perf_counter()
    # The driver window (~1800 s) is a HARD real-time deadline: the process
    # must exit rc 0 with the cumulative JSON on stdout before the driver's
    # timeout, or the round has no artifact of record (this killed rounds 3
    # AND 4). Three layers of defense (VERDICT r4 ask #1):
    #   (a) budget_s (default 1500) gates section STARTS, and each section
    #       also needs `remaining >= 1.5 × expected cost` (table below) so
    #       a section can't start with less time than it historically takes;
    #   (b) a watchdog armed at process start force-emits the cumulative
    #       JSON and os._exit(0) at deadline − 45 s no matter what is
    #       mid-flight;
    #   (c) sections are ordered headline-first, so whatever is lost to the
    #       gate is the least important tail.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", 1500))
    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", 1680))
    N = int(os.environ.get("BENCH_N", 10_000))
    F = int(os.environ.get("BENCH_F", 128))
    _EMIT_STATE.update({"N": N, "F": F})

    extra = {}

    def _watchdog():
        rem = (deadline_s - 45.0) - (time.perf_counter() - t_start)
        if rem > 0:
            time.sleep(rem)
        _mark("WATCHDOG: deadline - 45 s reached; emitting cumulative JSON "
              "and exiting 0")
        extra["watchdog_forced_exit"] = True
        # The main thread may be mutating `extra` mid-section — retry the
        # snapshot a few times if json serialization races a dict resize.
        for _ in range(5):
            try:
                _emit(extra)
                break
            except Exception:  # noqa: BLE001
                time.sleep(0.2)
        import sys as _sys

        _sys.stdout.flush()
        _sys.stderr.flush()
        os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    # THE round-2 cold-build mystery, isolated (VERDICT r2 weak #2): the
    # FIRST device→host transfer in a process costs 1.5–20 minutes on this
    # transport, regardless of size or program (measured: an 8-int
    # download after `jnp.arange(8)` = 88–296 s typical, 1206 s in the
    # round-3 driver capture). Round 4: the warmup runs on a BACKGROUND
    # thread while the main thread does every host-only section (data
    # generation, ground truth, the full NumPy-oracle reference rows) —
    # the warmup overlaps real work instead of blocking the run.
    warm_holder = {}

    def _warmup():
        t0 = time.perf_counter()
        warm_holder["backend"] = jax.default_backend()
        np.asarray(jnp.arange(8) * 1)
        warm_holder["s"] = round(time.perf_counter() - t0, 1)

    _mark("starting first-D2H transport warmup on a background thread")
    warm_thread = threading.Thread(target=_warmup, daemon=True)
    warm_thread.start()

    # ---- host-only sections, overlapped with the warmup -----------------
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    data = make_energy_test_dataset(N, F, seed=42).astype(np.float32)
    noise_q, gt = _recall_setup(data, np.random.default_rng(7))
    builder = _make_builder(N)
    _mark("oracle reference rows (host-only, overlapped with warmup)")
    try:
        bench_oracle_rows(data, builder, noise_q, gt, extra)
    except Exception as exc:  # noqa: BLE001
        import traceback

        traceback.print_exc()
        extra["error_oracle"] = repr(exc)[:200]
    _emit(extra)

    _mark("oracle done; joining the transport warmup")
    warm_thread.join()
    extra["transport_first_d2h_s"] = warm_holder.get("s")
    extra["backend"] = warm_holder.get("backend")
    _mark(f"warmup took {extra['transport_first_d2h_s']} s; headline build")

    # ---- headline: 10k build (cold/warm split) + query paths ------------
    aspace = gl = None
    try:
        qps, base_qps, aspace, gl, builder = bench_headline(
            jax, jnp, N, F, data, noise_q, gt, extra
        )
        extra["query_qps_transport"] = round(qps, 1)
    except Exception as exc:  # noqa: BLE001
        import traceback

        traceback.print_exc()
        extra["error_headline"] = repr(exc)[:200]
    _emit(extra)

    # Ordered by importance under the time budget (the 1M section carries
    # the official headline metric and runs FIRST; it emits itself as soon
    # as the exact-f32 device row lands). The 10k device-time rows are
    # cheap but transport-sensitive, so they come after the must-haves.
    def _ooc(jx, jn, ex):
        # Hand ooc only the budget NOT reserved for the sections after it
        # (r5 rehearsal: a fast cached 1m left remaining=1078s, ooc
        # self-scaled to 10M, ran 1044s, and every later section was
        # gate-skipped — the scale choice must see the true leftover).
        reserve = sum(
            expected_cost_s[n]
            for n in ("device_time_10k", "distparity", "serve_burst",
                      "largef", "energy", "energy_banded", "spectral",
                      "blend")
        )
        return bench_out_of_core_10m(
            jx, jn, ex,
            remaining_s=budget_s - (time.perf_counter() - t_start) - reserve,
        )

    # Expected per-section wall cost (seconds), seeded from the round-2/3/4
    # runs' stderr `_mark` timestamps and section-internal timing fields on
    # this sandbox's transport; the gate below refuses to START a section
    # with less than 1.5× this remaining. Measured durations are recorded
    # into `section_seconds` each run so the seeds can be re-calibrated.
    expected_cost_s = {
        "1m": 420.0,
        "build100k": 120.0,
        "ooc": 300.0,            # self-scales to its remaining_s argument
        # (minus the later sections' reserve); 1M-scale floor ~250 s
        "device_time_10k": 90.0,
        "distparity": 150.0,
        "serve_burst": 130.0,   # 64c + 256c + admission phases (round 5)
        "largef": 260.0,         # trimmed NumPy-f64 rows (round 5)
        "energy": 60.0,
        "energy_banded": 200.0,
        "spectral": 40.0,
        "blend": 30.0,
    }
    sections = [
        ("1m", bench_1m, (jax, jnp, extra)),
        ("build100k", bench_build_throughput_100k, (jax, jnp, extra)),
        ("ooc", _ooc, (jax, jnp, extra)),
        ("device_time_10k", bench_device_time, None),   # needs aspace
        ("distparity", bench_distributed_parity, (jax, jnp, extra)),
        ("serve_burst", bench_serve_burst, None),        # needs aspace
        ("largef", bench_largef, (jax, jnp, extra)),
        ("energy", bench_energy, (jax, jnp, N, F, extra)),
        ("energy_banded", bench_energy_banded_1m, (jax, jnp, extra)),
        ("spectral", bench_spectral_quality, (jax, jnp, extra)),
        ("blend", bench_blend_quality, (jax, jnp, extra)),
    ]
    section_seconds = extra.setdefault("section_seconds", {})
    for name, fn, args in sections:
        remaining = budget_s - (time.perf_counter() - t_start)
        if remaining <= 0:
            extra[f"skipped_{name}"] = "time budget exceeded"
            continue
        expected = expected_cost_s.get(name, 60.0)
        if remaining < 1.5 * expected:
            extra[f"skipped_{name}"] = (
                f"remaining {remaining:.0f}s < 1.5x expected {expected:.0f}s"
            )
            _mark(f"section {name} SKIPPED ({extra[f'skipped_{name}']})")
            continue
        if name == "1m" and os.environ.get("BENCH_SKIP_1M"):
            continue
        if name == "ooc" and os.environ.get("BENCH_SKIP_OOC"):
            continue
        if args is None:
            if aspace is None:
                extra[f"skipped_{name}"] = "headline build failed"
                continue
            args = (
                (jax, jnp, aspace, data, extra)
                if name == "device_time_10k"
                else (jax, jnp, aspace, gl, data, extra)
            )
        _mark(f"section {name} "
              f"(t+{time.perf_counter() - t_start:.0f}s)")
        t_sec = time.perf_counter()
        try:
            fn(*args)
        except Exception as exc:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            extra[f"error_{name}"] = repr(exc)[:200]
        section_seconds[name] = round(time.perf_counter() - t_sec, 1)
        _emit(extra)

    # Fold in the committed Deep1B-stretch artifact (scripts/stretch_100m.py
    # — a multi-hour single-shot run, not re-executed under bench's budget)
    # so the round artifact carries the 100M×96 out-of-core numbers.
    stretch_path = pathlib.Path(__file__).parent / "BENCH_STRETCH_100M.json"
    if stretch_path.exists():
        try:
            extra["stretch_100m"] = {
                "source": "BENCH_STRETCH_100M.json (scripts/stretch_100m.py)",
                **json.loads(stretch_path.read_text()),
            }
            extra["stretch_100m"].pop("dir", None)
        except Exception as exc:  # noqa: BLE001
            extra["error_stretch_100m"] = repr(exc)[:200]

    _emit(extra)


if __name__ == "__main__":
    # One retry: the remote-TPU transport occasionally drops a request with
    # a transient INTERNAL error; the driver's capture should survive that.
    try:
        main()
    except Exception as exc:  # noqa: BLE001
        import sys
        import traceback

        traceback.print_exc()
        print(f"bench: transient failure ({exc}); retrying once", file=sys.stderr)
        main()
