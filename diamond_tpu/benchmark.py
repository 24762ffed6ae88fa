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

    # multi-query slot-packed device kernel (the production extension
    # path: DeviceDP packs 4 query slots per tile, K=128 one-hot)
    from diamond_tpu.ops.swipe_device import DeviceDP

    ddp = DeviceDP(m.matrix32, m.gap_open, m.gap_extend)
    reqs = []
    for _ in range(128):
        qm = rng.integers(0, 20, 420).astype(np.int8)
        jm = [(rng.integers(0, 20, 448).astype(np.int8), -64, 65)
              for _ in range(3)]
        reqs.append((qm, None, jm))
    from diamond_tpu.ops import swipe_device as _sd

    def _run_multi():
        return ddp.run_many(reqs)

    _run_multi()  # compile
    _sd.reset_dispatch_stats()
    best_multi = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _run_multi()
        best_multi = min(best_multi, time.perf_counter() - t0)
    real_cells = 128 * 3 * 448.0 * 129
    rows.append(("multi-query SWIPE (slot-packed)", real_cells, best_multi))

    # host-native (C++) kernels, when the toolchain is available
    from diamond_tpu import native

    if native.lib() is not None:
        from diamond_tpu.data.block import Block
        from diamond_tpu.ops.banded_swipe import banded_swipe_batch_np
        from diamond_tpu.search import stages
        from diamond_tpu.stats.cbs import hauser_bias_i8

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

        # CBS variant: Hauser per-position bias folded into the profile
        bias_h = hauser_bias_i8(q, m.matrix32, m.background_scores)
        dt = _time_host(lambda: banded_swipe_batch_np(
            q, bias_h, jobs_h, m.matrix32, m.gap_open, m.gap_extend))
        rows.append(("banded SWIPE+CBS (C++ host)", 64.0 * T * 128, dt))

        # traceback variant: mask-emitting fill + walk (the fused
        # round-1 production engine; reference benchmark.cpp's
        # swipe+traceback cases)
        dt = _time_host(lambda: banded_swipe_batch_np(
            q, None, jobs_h, m.matrix32, m.gap_open, m.gap_extend,
            traceback=True))
        rows.append(("banded SWIPE+TB (C++ host)", 64.0 * T * 128, dt))

        # reversed stats pass (BackwardCell twin)
        from diamond_tpu.ops.banded_swipe import backward_stats_pass_np

        tgt_b = jobs_h[0][0]
        dt = _time_host(lambda: [backward_stats_pass_np(
            q, None, tgt_b, len(tgt_b), -64, 64, m.matrix32,
            m.gap_open, m.gap_extend) for _ in range(8)])
        rows.append(("reversed stats (C++ host)", 8.0 * T * 128, dt))

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

        # Hauser bias build (CBS profile prep; cells = letters)
        L_b = int(blk.lengths.sum())
        dt = _time_host(lambda: native.hauser_bias_block_native(
            blk.letters, blk.starts, blk.lengths, m.matrix32,
            m.background_scores))
        rows.append(("hauser bias (C++ host)", float(L_b), dt))

        # tantan repeat masking (cells = letters)
        from diamond_tpu.masking.tantan import Tantan

        tn = Tantan(m.matrix32)
        dt = _time_host(lambda: native.tantan_repeat_prob_many(
            blk.letters, blk.starts, blk.lengths, tn.ratios,
            float(tn.p_repeat), float(tn.p_repeat_end),
            float(tn.repeat_growth)))
        rows.append(("tantan masking (C++ host)", float(L_b), dt))

        # seed radix sort (cells = keys)
        keys = rng.integers(0, 1 << 48, 1 << 20).astype(np.uint64)
        pos = np.arange(1 << 20, dtype=np.int64)
        dt = _time_host(lambda: stages._sorted_kv(keys.copy(), pos.copy(),
                                                  inplace=True))
        rows.append(("seed radix sort (C++ host)", float(1 << 20), dt))

        # full-matrix SWIPE, host striped engine (--swipe scoring path:
        # full-band jobs route to swipe_full16/32 in swipe_lanes.cc;
        # reference benchmark.cpp swipe() full-matrix cases)
        T_f = 300
        jobs_full = [(rng.integers(0, 20, T_f).astype(np.int8),
                      -(T_f - 1), qlen) for _ in range(64)]
        dt = _time_host(lambda: banded_swipe_batch_np(
            q, None, jobs_full, m.matrix32, m.gap_open, m.gap_extend))
        rows.append(("full-matrix SWIPE (C++ host)", 64.0 * T_f * qlen, dt))

    # pregathered Pallas stage-2 (the design PERF.md's routing verdict
    # names; cells = window letters scanned per pair)
    from diamond_tpu.ops.stage2_pallas import stage2_pallas

    N2 = 1 << 17
    W2 = 96
    qw8 = rng.integers(0, 20, (W2, N2)).astype(np.int8)
    sw8 = rng.integers(0, 20, (W2, N2)).astype(np.int8)
    meta2 = np.zeros((8, N2), np.int32)
    meta2[0] = 40
    meta2[1] = 40
    meta2[2] = 20
    import jax.numpy as _jnp

    q2d, s2d, md2 = map(_jnp.asarray, (qw8, sw8, meta2))
    m2d = _jnp.asarray(np.ascontiguousarray(m.matrix32[:32, :32],
                                            dtype=np.int32))

    def _s2():
        k, b, i = stage2_pallas(q2d, s2d, md2, m2d, 26, 48, 512, False)
        return _jnp.sum(b)  # force execution (not a cached buffer handle)

    dt = _time(lambda: _s2(), n_iter=3)
    rows.append(("stage2 pregathered (pallas)", float(N2) * W2, dt))

    # diagonal-scan gapped filter (reference benchmark.cpp diag_scores,
    # dp/scan_diags.cpp): per-diagonal Kadane over a 128-diag band
    from diamond_tpu.align.gapped_filter import make_profile8, scan_diags

    m8 = np.clip(m.matrix32, -128, 127)
    prof8 = make_profile8(q, None, m8)
    tgt_d = rng.integers(0, 20, T).astype(np.int8)
    def _diag():
        return scan_diags(prof8, qlen, tgt_d, -64, 0, T, 128)
    t0 = time.perf_counter()
    for _ in range(5):
        _diag()
    dt = (time.perf_counter() - t0) / 5
    rows.append(("diag scores / gapped filter", float(T) * 128, dt))

    # CBS mode-4 matrix adjust (reference benchmark.cpp matrix_adjust:
    # the NCBI constrained-Newton solve; cells = solver target-frequency
    # entries per solve, 20x20)
    from diamond_tpu.stats import cbs as cbs_mod
    from diamond_tpu.stats import matrix_adjust as ma

    tl = rng.integers(0, 20, 400).astype(np.int8)
    qc = cbs_mod.composition(q)
    def _adjust():
        return cbs_mod.target_matrix(m, qc, qlen, 4, tl, ma.RULE_USER_RE)
    _adjust()
    t0 = time.perf_counter()
    for _ in range(20):
        _adjust()
    dt = (time.perf_counter() - t0) / 20
    rows.append(("matrix adjust CBS4 (solve)", 400.0, dt))

    # e-value engine throughput (reference benchmark.cpp evalue()):
    # vectorized host pass and the jit device twin
    scores_e = rng.integers(30, 300, 1 << 18).astype(np.int64)
    tlens_e = rng.integers(100, 2000, 1 << 18).astype(np.int64)
    def _ev_host():
        return m.evalue(scores_e, qlen, tlens_e)
    _ev_host()
    t0 = time.perf_counter()
    for _ in range(5):
        _ev_host()
    dt = (time.perf_counter() - t0) / 5
    rows.append(("evalue batch (host)", float(1 << 18), dt))

    from diamond_tpu.stats.evalue import evalue_jax

    gp = getattr(m, "gumbel", None)
    if gp is not None:
        import jax.numpy as jnp

        s_d = jnp.asarray(scores_e)
        t_d = jnp.asarray(tlens_e)
        dt = _time(lambda: evalue_jax(gp, s_d, qlen, t_d), n_iter=5)
        rows.append(("evalue batch (device)", float(1 << 18), dt))

    print(f"{'kernel':<30} {'ps/cell':>10} {'GCUPS':>10}")
    for name, cells, dt in rows:
        ps = dt / cells * 1e12
        gcups = cells / dt / 1e9
        print(f"{name:<30} {ps:>10.2f} {gcups:>10.1f}")
