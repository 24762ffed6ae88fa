"""Parity: the pregathered Pallas stage-1/2 kernel (ops/stage2_pallas)
against a pure-numpy oracle of the stage12_jax._stage12_kernel semantics
(fingerprint identity count, query-side delimiter clip, uint8-saturating
Kadane) — the XLA twin itself is pinned to the fused native host pass
(leftmost.cc) by the existing golden/device tests.

The oracle is numpy-only so this test never depends on the tunneled chip
backend; the pallas kernel runs in eager interpret mode (jit-wrapped
interpret pallas_calls wedge on the axon plugin)."""
import numpy as np
import pytest

pytest.importorskip("jax")

from diamond_tpu.ops.stage2_pallas import (WINDOW_LEFT, FP_LEN,
                                           stage2_pregathered)
from diamond_tpu.stats.score_matrix import ScoreMatrix


def _letters(rng, n):
    """Letter stream with interspersed delimiters and a 64-letter
    delimiter margin on both ends (like Block padding)."""
    core = rng.integers(0, 20, n).astype(np.int8)
    core[rng.random(n) < 0.02] = 31  # sequence delimiters
    return np.concatenate([np.full(64, 31, np.int8), core,
                           np.full(64, 31, np.int8)])


def _oracle(q_letters, s_letters, qp, sp, windows, cutoffs, m32,
            hamming_id, max_window):
    """stage12_jax._stage12_kernel formulas in numpy."""
    N = len(qp)
    keep = np.zeros(N, dtype=bool)
    scores = np.zeros(N, dtype=np.int64)
    for k in range(N):
        qw = q_letters[qp[k] - WINDOW_LEFT: qp[k] - WINDOW_LEFT + FP_LEN]
        sw = s_letters[sp[k] - WINDOW_LEFT: sp[k] - WINDOW_LEFT + FP_LEN]
        ident = int(((qw & 31) == (sw & 31)).sum())
        offs = np.arange(-max_window, max_window)
        q2 = q_letters[qp[k] + offs]
        s2 = s_letters[sp[k] + offs]
        in_win = np.abs(offs) < windows[k]
        is_d = (q2 == 31) & in_win
        lh = is_d[:max_window][::-1]
        wl = int(np.argmax(lh)) if lh.any() else int(windows[k])
        rh = is_d[max_window:]
        wr = int(np.argmax(rh)) if rh.any() else int(windows[k])
        st = best = 0
        for o, a, b in zip(offs, q2, s2):
            v = int(m32[a & 31, b & 31]) if (-wl <= o < wr) else -(10 ** 9)
            st = min(max(st + v, 0), 255)
            best = max(best, st)
        scores[k] = best
        keep[k] = (ident >= hamming_id) and (best > cutoffs[k])
    return keep, scores


@pytest.mark.parametrize("seed", [0, 1])
def test_stage2_pallas_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    m = ScoreMatrix("BLOSUM62")
    q_letters = _letters(rng, 2000)
    s_letters = _letters(rng, 3000)
    N = 700  # not a tile multiple: exercises padding
    qp = rng.integers(64, 64 + 2000, N).astype(np.int64)
    sp = rng.integers(64, 64 + 3000, N).astype(np.int64)
    # make some pairs locally identical so stage 1 passes realistically
    for k in range(0, N, 3):
        lo, hi = max(0, qp[k] - 20), qp[k] + 36
        seg = q_letters[lo:hi]
        s_letters[sp[k] - (qp[k] - lo): sp[k] + (hi - qp[k])] = seg
    windows = rng.integers(10, 49, N).astype(np.int32)
    cutoffs = rng.integers(10, 40, N).astype(np.int32)
    max_window = int(windows.max())
    hamming_id = 26

    keep_ref, score_ref = _oracle(q_letters, s_letters, qp, sp, windows,
                                  cutoffs, m.matrix32, hamming_id,
                                  max_window)
    keep_p, score_p = stage2_pregathered(
        q_letters, s_letters, qp, sp, windows, cutoffs, m.matrix32,
        hamming_id, max_window, interpret=True)

    np.testing.assert_array_equal(keep_p, keep_ref)
    np.testing.assert_array_equal(score_p, score_ref)
