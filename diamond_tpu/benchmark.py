"""Kernel microbenchmarks (reference tools/benchmark.cpp:555-608
`diamond benchmark`): per-kernel cell-update timings in ps/cell plus
GCUPS, run on the active JAX device.
"""
from __future__ import annotations

import time

import numpy as np


def _time(fn, n_iter=20):
    """Best of several timed windows (a time-shared chip otherwise reports
    contention as kernel slowness)."""
    import jax

    jax.block_until_ready(fn())  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            jax.block_until_ready(fn())
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def run_benchmark():
    import jax

    from diamond_tpu.ops.swipe_jax import banded_swipe_uniform, prepare_uniform_batch
    from diamond_tpu.ops.swipe_pallas import banded_swipe_pallas, prepare_pallas_batch
    from diamond_tpu.stats.score_matrix import ScoreMatrix

    dev = jax.devices()[0]
    print(f"Device: {dev.platform} ({dev.device_kind})")
    rng = np.random.default_rng(0)
    m = ScoreMatrix("BLOSUM62")
    go, ge = m.gap_open + m.gap_extend, m.gap_extend

    rows = []

    # banded SWIPE, pallas kernel (the production extension kernel)
    qlen, B, T, band = 480, 2048, 512, 128
    q = rng.integers(0, 20, qlen).astype(np.int8)
    jobs = [(rng.integers(0, 20, T).astype(np.int8), -band // 2, band // 2)
            for _ in range(B)]
    tgt, bmask, ppad, band_p, _ = prepare_pallas_batch(q, None, m.matrix32, jobs)
    dt = _time(lambda: banded_swipe_pallas(tgt, bmask, ppad, go, ge, band_p))
    cells = float(B) * tgt.shape[0] * band_p
    rows.append(("banded SWIPE (pallas)", cells, dt))

    # banded SWIPE, XLA one-hot path
    tgt2, bmask2, ppad2, band_u, _ = prepare_uniform_batch(
        q, None, m.matrix32, jobs[:256])
    dt = _time(lambda: banded_swipe_uniform(tgt2, bmask2, ppad2, go, ge, band_u))
    cells = 256.0 * tgt2.shape[0] * band_u
    rows.append(("banded SWIPE (XLA one-hot)", cells, dt))

    # full-matrix SWIPE via full-band
    T2 = 256
    jobs_f = [(rng.integers(0, 20, T2).astype(np.int8), -(T2 - 1), qlen)
              for _ in range(64)]
    tgt3, bmask3, ppad3, band_f, _ = prepare_pallas_batch(
        q, None, m.matrix32, jobs_f)
    dt = _time(lambda: banded_swipe_pallas(tgt3, bmask3, ppad3, go, ge, band_f))
    cells = 64.0 * tgt3.shape[0] * band_f
    rows.append(("full-matrix SWIPE (pallas)", cells, dt))

    # 3-frame (frameshift) banded SWIPE — blastx -F device kernel
    from diamond_tpu.ops.swipe3_pallas import (banded_swipe3_pallas,
                                               prepare_swipe3_batch)

    q3 = [rng.integers(0, 20, qlen).astype(np.int8) for _ in range(3)]
    jobs3 = [(rng.integers(0, 20, 384).astype(np.int8), -32, 32)
             for _ in range(256)]
    t3, bm3, pr3, band3, _ = prepare_swipe3_batch(q3, m.matrix32, jobs3,
                                                  tile_b=128)
    dt = _time(lambda: banded_swipe3_pallas(t3, bm3, pr3, go, ge, 15,
                                            band3, tile_b=128))
    cells = 256.0 * t3.shape[0] * 3 * band3
    rows.append(("3-frame banded SWIPE (pallas)", cells, dt))

    # stage-1 fingerprint identity as one-hot MXU matmul (seeding hot
    # loop 1; one "cell" = one fingerprint letter comparison)
    from diamond_tpu.ops.stage12_jax import (TILE_Q, TILE_S,
                                             _stage1_matmul_kernel)

    L12 = 1 << 20
    letters12 = rng.integers(0, 20, L12 + 512).astype(np.int8)
    G12 = 512
    qp_t = rng.integers(256, L12, (G12, TILE_Q)).astype(np.int32)
    sp_t = rng.integers(256, L12, (G12, TILE_S)).astype(np.int32)
    import jax.numpy as jnp

    l12 = jnp.asarray(letters12)
    qp_d, sp_d = jnp.asarray(qp_t), jnp.asarray(sp_t)
    dt = _time(lambda: _stage1_matmul_kernel(l12, l12, qp_d, sp_d,
                                             TILE_Q, TILE_S))
    cells = float(G12) * TILE_Q * TILE_S * 48
    rows.append(("stage1 fingerprint (MXU)", cells, dt))

    # host-native (C++) kernels, when the toolchain is available
    from diamond_tpu import native

    if native.lib() is not None:
        from diamond_tpu.data.block import Block
        from diamond_tpu.ops.banded_swipe import banded_swipe_batch_np
        from diamond_tpu.search import stages

        def _time_host(fn, n_iter=3):
            fn()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(n_iter):
                    fn()
                best = min(best, (time.perf_counter() - t0) / n_iter)
            return best

        jobs_h = [(rng.integers(0, 20, T).astype(np.int8), -64, 64)
                  for _ in range(64)]
        dt = _time_host(lambda: banded_swipe_batch_np(
            q, None, jobs_h, m.matrix32, m.gap_open, m.gap_extend))
        rows.append(("banded SWIPE (C++ host)", 64.0 * T * 128, dt))

        seqs = [rng.integers(0, 20, 300).astype(np.int8) for _ in range(64)]
        blk = Block.from_sequences(seqs, [str(i) for i in range(64)])
        N = 20000
        qp = (blk.starts[rng.integers(0, 64, N)] + 50).astype(np.int64)
        sp = (blk.starts[rng.integers(0, 64, N)] + 50).astype(np.int64)
        dt = _time_host(lambda: stages.stage2_scores(
            blk.letters, blk.letters, qp, sp, m.matrix32, 48, True))
        rows.append(("ungapped window (C++ host)", N * 96.0, dt))
        dt = _time_host(lambda: stages.stage1_filter(
            blk.letters, blk.letters, qp, sp, 26))
        rows.append(("fingerprint filter (C++ host)", N * 48.0, dt))

    print(f"{'kernel':<30} {'ps/cell':>10} {'GCUPS':>10}")
    for name, cells, dt in rows:
        ps = dt / cells * 1e12
        gcups = cells / dt / 1e9
        print(f"{name:<30} {ps:>10.2f} {gcups:>10.1f}")
