"""Banded SWIPE oracle tests vs a brute-force full Smith-Waterman."""
import numpy as np
import pytest

from diamond_tpu.constants.alphabet import encode
from diamond_tpu.ops.banded_swipe import banded_swipe_np
from diamond_tpu.stats.cbs import hauser_correction
from diamond_tpu.stats.score_matrix import ScoreMatrix


def full_sw(q, t, matrix, bias, go, ge):
    """Textbook full-matrix local SW with affine gaps, floor-0 on E/F."""
    qn, tn = len(q), len(t)
    H = np.zeros((qn + 1, tn + 1), dtype=np.int64)
    E = np.zeros((qn + 1, tn + 1), dtype=np.int64)
    F = np.zeros((qn + 1, tn + 1), dtype=np.int64)
    best = 0
    for i in range(1, qn + 1):
        for j in range(1, tn + 1):
            E[i, j] = max(E[i, j - 1] - ge, H[i, j - 1] - go, 0)
            F[i, j] = max(F[i - 1, j] - ge, H[i - 1, j] - go, 0)
            s = matrix[q[i - 1] & 31, t[j - 1] & 31] + (bias[i - 1] if bias is not None else 0)
            H[i, j] = max(0, H[i - 1, j - 1] + s, E[i, j], F[i, j])
            best = max(best, H[i, j])
    return int(best)


@pytest.fixture(scope="module")
def m():
    return ScoreMatrix("BLOSUM62")


def test_self_alignment_score(m):
    seq = encode("EELSEAERKAVQAMWARLYANCEDVGVAILVRFFVNFPSAKQYFSQFKHMEDPLEMERSPQLRKHACRVMGALNTVVENL")
    _, bias = hauser_correction(seq, m.matrix32, m.background_scores)
    r = banded_swipe_np(seq, seq, -32, 33, m.matrix32, bias, m.gap_open, m.gap_extend,
                        traceback=True)
    expected = int(m.matrix32[seq, seq].sum() + bias.sum())
    assert r.score == expected
    assert r.identities == len(seq)
    assert r.mismatches == 0 and r.gaps == 0
    assert r.query_range == (0, len(seq))
    assert r.subject_range == (0, len(seq))


@pytest.mark.parametrize("seed", range(8))
def test_vs_full_sw(m, seed):
    rng = np.random.default_rng(seed)
    qn, tn = int(rng.integers(20, 90)), int(rng.integers(20, 90))
    q = rng.integers(0, 20, qn).astype(np.int8)
    t = rng.integers(0, 20, tn).astype(np.int8)
    # plant a homologous region
    ln = 15
    qi, ti = rng.integers(0, qn - ln), rng.integers(0, tn - ln)
    t[ti : ti + ln] = q[qi : qi + ln]
    go = m.gap_open + m.gap_extend
    # full-width band == full SW
    r = banded_swipe_np(q, t, -(tn - 1), qn, m.matrix32, None, m.gap_open, m.gap_extend,
                        traceback=True)
    expected = full_sw(q, t, m.matrix32, None, go, m.gap_extend)
    assert r.score == expected
    # traceback consistency: recompute score from transcript
    s = 0
    i, j = r.query_range[0], r.subject_range[0]
    k = 0
    ops = r.transcript
    while k < len(ops):
        op, val = ops[k]
        if op in ("M", "S"):
            s += m.matrix32[q[i], t[j]]
            i += 1
            j += 1
            k += 1
        elif op == "I":
            s -= go + (val - 1) * m.gap_extend
            i += val
            k += 1
        else:
            ln2 = 0
            while k < len(ops) and ops[k][0] == "D":
                ln2 += 1
                j += 1
                k += 1
            s -= go + (ln2 - 1) * m.gap_extend
    assert s == r.score
    assert i == r.query_range[1] and j == r.subject_range[1]


def test_band_restriction(m):
    rng = np.random.default_rng(42)
    q = rng.integers(0, 20, 60).astype(np.int8)
    t = q.copy()  # identical; optimal on diagonal 0
    r = banded_swipe_np(q, t, -2, 3, m.matrix32, None, m.gap_open, m.gap_extend)
    assert r.score == int(m.matrix32[q, q].sum())
