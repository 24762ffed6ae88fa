"""Benchmark: banded SWIPE cell-update throughput on the available device.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's AVX2 SWIPE inner loop runs at ~15-40 ps/cell on a
modern core (reference tools/benchmark.cpp:304-328), i.e. ~25-65 GCUPS/core;
vs_baseline is measured against 40 GCUPS (an optimistic single-core figure).
"""
import json
import time

import numpy as np

BASELINE_GCUPS = 40.0


def main():
    import jax

    from diamond_tpu.ops.swipe_pallas import banded_swipe_pallas, prepare_pallas_batch
    from diamond_tpu.stats.score_matrix import ScoreMatrix

    rng = np.random.default_rng(0)
    m = ScoreMatrix("BLOSUM62")
    qlen, B, T = 480, 2048, 512
    q = rng.integers(0, 20, qlen).astype(np.int8)
    jobs = [(rng.integers(0, 20, T).astype(np.int8), -64, 64) for _ in range(B)]
    tgt, bmask, ppad, band_, _ = prepare_pallas_batch(q, None, m.matrix32, jobs)
    go, ge = m.gap_open + m.gap_extend, m.gap_extend

    def run():
        return banded_swipe_pallas(tgt, bmask, ppad, go, ge, band_)

    jax.block_until_ready(run())  # compile
    # the chip may be time-shared through a tunnel; take the best of
    # several timed windows so contention doesn't masquerade as kernel
    # speed (the best window is the hardware's actual throughput)
    n_iter = 20
    best_dt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            jax.block_until_ready(run())
        best_dt = min(best_dt, (time.perf_counter() - t0) / n_iter)

    cells = float(B) * tgt.shape[0] * band_
    gcups = cells / best_dt / 1e9
    print(json.dumps({
        "metric": "banded_swipe_gcups",
        "value": round(gcups, 2),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / BASELINE_GCUPS, 2),
    }))


if __name__ == "__main__":
    main()
