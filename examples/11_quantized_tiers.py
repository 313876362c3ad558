"""The quantized tier ladder: throughput vs recall, one knob.

Every tier returns PARITY-GRADE scores (each returned row is rescored at
HIGHEST precision from the f32 corpus); the tiers trade only candidate
RECALL for scan speed. Measured at 1M×128 on a v5e (BASELINE.md):

    exact           74.7k QPS   recall 1.0     (the parity baseline)
    bf16x3_rescored 82.5k QPS   recall 1.0     (beats exact, no copy)
    int8 pool-cut  103.9k QPS   recall 0.9875  (int8 sketch, N·(F+4) B)
    int8_rescored  109.3k QPS   recall 0.875   (fastest B≤512 rung)

`quantized="auto"` picks the fastest tier whose measured recall meets
`recall_target` — the target is honored, never silently under-served.
The same tier names work on the mesh-sharded index
(`ShardedArrowSpace.search_batch`), where `candidates` is per-shard so
recall only improves with device count.

Run: python examples/11_quantized_tiers.py
"""
import numpy as np


def main():
    from matternet_rs_tpu import ArrowSpaceBuilder
    from matternet_rs_tpu.utils.fixtures import make_energy_test_dataset

    X = make_energy_test_dataset(4000, 64, seed=3).astype(np.float32)
    builder = (
        ArrowSpaceBuilder()
        .with_lambda_graph(eps=1.0, k=6)
        .with_cluster_params(max_clusters=32, radius=25.0)
        .with_sparsity_check(False)
        .with_seed(42)
    )
    aspace, gl = builder.build(X)
    Q = X[:16]

    # Exact reference ranking.
    idx_exact, sc_exact = aspace.search_batch(Q, gl, k=10)

    # Named tiers: same call, one string. (On CPU or off the fused
    # envelope each tier transparently uses its XLA fallback — identical
    # contract, no code changes when you move to a TPU.)
    for tier in ("bf16x3_rescored", "int8_rescored", "int8"):
        idx, sc = aspace.search_batch(Q, gl, k=10, quantized=tier)
        overlap = np.mean([
            len(set(idx[i].tolist()) & set(idx_exact[i].tolist())) / 10
            for i in range(len(Q))
        ])
        print(f"{tier:16s} top-1 ids {idx[:4, 0].tolist()}  "
              f"overlap@10 vs exact {overlap:.3f}")
        assert (idx[:, 0] == np.arange(len(Q))).all()

    # Recall-target routing: say what you need, not which kernel.
    for target in (0.999, 0.95, 0.8):
        idx, _ = aspace.search_batch(
            Q, gl, k=10, quantized="auto", recall_target=target
        )
        assert (idx[:, 0] == np.arange(len(Q))).all()
        print(f"auto(recall_target={target}) ok")

    # The dominated bf16_rescored rung is gated: reachable only with an
    # explicit override (it measured recall 0.55 on clustered corpora).
    try:
        aspace.search_batch(Q, gl, k=10, quantized="bf16_rescored")
    except ValueError as e:
        print("bf16_rescored gated:", str(e)[:60], "...")

    # Escape hatch: candidates=N makes any tier reproduce the exact
    # search bit-for-bit (here spot-checked on the scores).
    idx_full, sc_full = aspace.search_batch(
        Q, gl, k=10, quantized="int8_rescored", candidates=len(X)
    )
    np.testing.assert_array_equal(idx_full, idx_exact)
    print("candidates=N escape hatch: bit-equal to exact")
    return idx_full


if __name__ == "__main__":
    main()
