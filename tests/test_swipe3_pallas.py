"""Device 3-frame (frameshift) banded-SWIPE kernel parity.

ops/swipe3_pallas vs the numpy oracle ops/swipe3._forward_np on random
jobs (interpret mode on CPU; compiled on a real chip), and the -F 15
pipeline golden with the device kernel forced on real TPU hardware.
"""
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from diamond_tpu.stats.score_matrix import ScoreMatrix

TD = "/root/reference/src/test"


def _tpu_present():
    from diamond_tpu.utils.device import probe_default_backend

    try:
        return probe_default_backend() not in ("cpu", "gpu", "none")
    except Exception:
        return False


def _run_parity(interpret: bool, trials: int, seed: int = 4):
    from diamond_tpu.ops.swipe3 import _forward_np
    from diamond_tpu.ops.swipe3_pallas import (banded_swipe3_pallas,
                                               prepare_swipe3_batch)

    m = ScoreMatrix("BLOSUM62")
    go, ge, fs = m.gap_open + m.gap_extend, m.gap_extend, 15
    rng = np.random.default_rng(seed)
    for _ in range(trials):
        qlen0 = int(rng.integers(40, 200))
        qlens = [qlen0, max(qlen0 - int(rng.integers(0, 2)), 1),
                 max(qlen0 - int(rng.integers(0, 2)), 1)]
        q_frames = [rng.integers(0, 24, L).astype(np.int8) for L in qlens]
        jobs = []
        for _ in range(int(rng.integers(3, 9))):
            tlen = int(rng.integers(30, 250))
            t = rng.integers(0, 24, tlen).astype(np.int8)
            d0 = int(rng.integers(-tlen + 2, qlen0 - 3))
            d1 = min(d0 + int(rng.integers(4, 40)), qlen0)
            if d1 <= d0:
                d1 = d0 + 1
            jobs.append((t, d0, d1))
        t_idx, bmask, prof, band_q, meta = prepare_swipe3_batch(
            q_frames, m.matrix32, jobs, tile_b=8)
        best_d, mc_d = banded_swipe3_pallas(
            t_idx, bmask, prof, go, ge, fs, band_q, tile_b=8,
            interpret=interpret)
        best_d, mc_d = np.asarray(best_d), np.asarray(mc_d)
        for k, (t, d0, d1) in enumerate(jobs):
            band = d1 - d0
            i1_init = max(d1 - 1, 0)
            i0_init = i1_init + 1 - band
            j0 = i1_init - (d1 - 1)
            q64 = [np.asarray(f, dtype=np.int64) & 31 for f in q_frames]
            t64 = np.asarray(t, dtype=np.int64) & 31
            _S, best, max_col, _cd = _forward_np(
                q64, qlens, t64, qlens[0], len(t), m.matrix32, go, ge, fs,
                i0_init, i1_init, j0, band * 3, len(t) - j0)
            assert int(best_d[k]) == best, (k, d0, d1)
            if best > 0:
                assert int(mc_d[k]) - meta["shifts"][k] == max_col


def test_swipe3_kernel_vs_oracle_interpret():
    _run_parity(interpret=True, trials=6)


@pytest.mark.skipif(not _tpu_present(), reason="no TPU attached")
@pytest.mark.slow
def test_swipe3_kernel_vs_oracle_on_tpu():
    _run_parity(interpret=False, trials=10, seed=11)


@pytest.mark.skipif(not _tpu_present(), reason="no TPU attached")
@pytest.mark.slow
def test_frameshift_device_golden_on_tpu():
    """--long-reads (-F 15 + range culling + --top 10) nanopore golden
    with the score-only 3-frame DP forced onto the chip: byte-identical
    (the traceback round stays native)."""
    import io
    from contextlib import redirect_stdout

    from diamond_tpu.cli import main

    os.environ["DIAMOND_TPU_DEVICE_DP"] = "1"
    os.environ["DIAMOND_TPU_DP_MIN_CELLS"] = "0"
    buf = io.StringIO()
    try:
        with redirect_stdout(buf):
            main(["blastx", "-q", f"{TD}/SRR14011045_1.fna.gz",
                  "-d", f"{TD}/data.faa", "--long-reads", "-c", "1",
                  "--quiet"])
    finally:
        os.environ.pop("DIAMOND_TPU_DEVICE_DP", None)
        os.environ.pop("DIAMOND_TPU_DP_MIN_CELLS", None)
    lines = buf.getvalue().splitlines()
    gold = os.path.join(os.path.dirname(__file__), "goldens",
                        "blastx-longreads-data.out")
    assert lines == open(gold).read().splitlines()
