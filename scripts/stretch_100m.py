"""Deep1B-stretch out-of-core run: 100M×96 on one chip.

The BASELINE.json stretch config ("Deep1B 100M×96 shard") executed
end-to-end: stream-write a 38 GB shard store, streamed two-pass build
(sample→cluster→graph checkpoint, then the λ pass through fixed-shape
device chunks), then the resident-sketch serving path — the 10.4 GB
int8 sketch is device-resident in a single chip's 16 GB HBM while the
f32 corpus (38 GB) never fits.

Run: python scripts/stretch_100m.py [N]   (default 100_000_000)
Writes results JSON to BENCH_STRETCH_100M.json at the repo root and
progress lines to stderr. Not part of bench.py's budgeted sections —
this is a multi-hour single-shot proof.
"""

import json
import os
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def mark(msg):
    print(f"stretch[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    import jax

    cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from bench import _ooc_block_iter
    from matternet_rs_tpu.graph import GraphParams
    from matternet_rs_tpu.index.streaming import StreamingIndex
    from matternet_rs_tpu.storage import shards as shard_store

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    F, blk = 96, 262_144
    out = {
        "n_items": N, "n_features": F,
        "disk_gb": round(N * F * 4 / 1e9, 2),
        "sketch_device_gb": round(N * (F + 8) / 1e9, 2),
        "backend": jax.default_backend(),
    }
    tmp = os.environ.get("STRETCH_DIR") or tempfile.mkdtemp(
        prefix="matternet-stretch100m-"
    )
    out["dir"] = tmp
    keep_store = bool(os.environ.get("STRETCH_KEEP"))
    try:
        # Pay the first-D2H transport penalty outside the timings.
        import jax.numpy as jnp

        t0 = time.perf_counter()
        np.asarray(jnp.arange(8) * 1)
        out["transport_first_d2h_s"] = round(time.perf_counter() - t0, 1)

        manifest = os.path.join(tmp, shard_store.MANIFEST)
        if not os.path.exists(manifest):
            mark(f"writing {out['disk_gb']} GB store to {tmp}")
            t0 = time.perf_counter()
            shard_store.write_shards(_ooc_block_iter(N, F, blk), tmp)
            out["store_write_s"] = round(time.perf_counter() - t0, 1)
            mark(f"store written in {out['store_write_s']} s")

        params = GraphParams(eps=1.0, k=6, topk=4, sparsity_check=False)
        mark("streamed build (sample/cluster/graph + lambda pass)")
        t0 = time.perf_counter()
        idx = StreamingIndex.build_from_store(
            tmp, params, max_clusters=128, radius=25.0, block_rows=blk,
            resume=True, emit_sketch=True,
        )
        out["build_s"] = round(time.perf_counter() - t0, 1)
        bt = getattr(idx, "build_timings", None)
        if bt:
            out["build_timings"] = {k: round(v, 1) for k, v in bt.items()}
        # Rate over rows ACTUALLY computed this run — after a crash-resume
        # the λ pass skips finished rows, so N/build_s would overstate.
        rows = (bt or {}).get("lambda_rows_computed", N)
        lam_s = (bt or {}).get("lambda_pass_s", out["build_s"])
        out["lambda_pass_rows_per_sec"] = (
            round(rows / lam_s, 1) if lam_s else None
        )
        if rows < N:
            out["resume_skipped_rows"] = N - int(rows)
        mark(f"build done in {out['build_s']} s")

        # Device-resident sketch: the HBM-fit proof at 100M.
        mark("sketch quantize + upload")
        t0 = time.perf_counter()
        idx.build_sketch(persist=False)
        out["sketch_build_upload_s"] = round(time.perf_counter() - t0, 1)
        mark(f"sketch resident in {out['sketch_build_upload_s']} s")

        # Self-queries with known ground truth, spread across the corpus.
        want = np.linspace(7, N - 11, 64, dtype=np.int64)
        Q = shard_store.read_rows(tmp, want).astype(np.float32)

        t0 = time.perf_counter()
        r_ids, _ = idx.search_batch_sketch(Q, 10)
        out["first_batch64_s"] = round(time.perf_counter() - t0, 2)
        out["self_recall_at_10_refined"] = float(
            np.mean([w in r_ids[i].tolist() for i, w in enumerate(want)])
        )
        u_ids, _ = idx.search_batch_sketch(Q, 10, refine=False)
        out["self_recall_at_10_unrefined"] = float(
            np.mean([w in u_ids[i].tolist() for i, w in enumerate(want)])
        )
        out["unrefined_vs_refined_overlap_at_10"] = float(
            np.mean([
                len(set(u_ids[i].tolist()) & set(r_ids[i].tolist())) / 10.0
                for i in range(len(want))
            ])
        )

        for refine, tag in ((True, "refined"), (False, "unrefined")):
            for bsz in (256, 1024):
                QB = np.repeat(Q, max(1, bsz // len(Q)), axis=0)[:bsz]
                idx.search_batch_sketch(QB, 10, refine=refine)  # warm shape
                t0 = time.perf_counter()
                reps = 3
                for _ in range(reps):
                    idx.search_batch_sketch(QB, 10, refine=refine)
                dt = (time.perf_counter() - t0) / reps
                out[f"{tag}_qps_batch{bsz}"] = round(bsz / dt, 1)
                out[f"{tag}_ms_batch{bsz}"] = round(dt * 1e3, 1)
                mark(f"{tag} batch{bsz}: {out[f'{tag}_qps_batch{bsz}']} qps")
    finally:
        if not keep_store:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    out_path = pathlib.Path(__file__).resolve().parent.parent / (
        "BENCH_STRETCH_100M.json"
    )
    out_path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
