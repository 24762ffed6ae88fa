"""Golden tests for the statistics stack (score matrices, e-values, CBS).

Golden values come from the reference's committed regression outputs
(reference src/test/diamond-test-blastp-default.out) — self-alignment lines
pin down the exact raw score -> bitscore/e-value mapping including the
Hauser composition bias.
"""
import os

import numpy as np
import pytest

from diamond_tpu.constants.alphabet import encode, decode, AMINO_ACID_ALPHABET
from diamond_tpu.output.format import format_double, print_e
from diamond_tpu.stats.cbs import hauser_correction
from diamond_tpu.stats.score_matrix import ScoreMatrix

from slowmark import slow_extended

DATA_FAA = "/root/reference/src/test/data.faa"


def read_fasta(path):
    seqs, name, chunks = {}, None, []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                if name is not None:
                    seqs[name] = "".join(chunks)
                name = line[1:].split()[0]
                chunks = []
            elif line:
                chunks.append(line)
    if name is not None:
        seqs[name] = "".join(chunks)
    return {k: v.upper() for k, v in seqs.items()}


@pytest.fixture(scope="module")
def data_faa():
    return read_fasta(DATA_FAA)


@pytest.fixture(scope="module")
def blosum62(data_faa):
    db_letters = sum(len(s) for s in data_faa.values())
    return ScoreMatrix("BLOSUM62", db_letters=db_letters)


def test_alphabet_roundtrip():
    s = "ARNDCQEGHILKMFPSTWYVBJZX"
    assert decode(encode(s)) == s
    assert len(AMINO_ACID_ALPHABET) == 26


def test_blosum62_values():
    m = ScoreMatrix("BLOSUM62")
    assert m(0, 0) == 4          # A-A
    assert m(4, 4) == 9          # C-C
    assert m(17, 17) == 11       # W-W
    assert m(0, 1) == -1         # A-R
    assert m.gap_open == 11 and m.gap_extend == 1
    assert abs(m.lam - 0.267) < 1e-12
    assert abs(m.k - 0.041) < 1e-12
    assert m.bias == 12


def test_blosum50_defaults():
    m = ScoreMatrix("BLOSUM50")
    assert m.gap_open == 13 and m.gap_extend == 2


def test_ideal_lambda():
    # NCBI's ungapped lambda for BLOSUM62 under Robinson freqs ~ 0.3176
    m = ScoreMatrix("BLOSUM62")
    assert abs(m.ideal_lambda - 0.3176) < 2e-3


def _self_score(m, seq):
    e = encode(seq)
    raw = int(m.matrix32[e, e].sum())
    _, bias = hauser_correction(e, m.matrix32, m.background_scores)
    return raw + int(bias.sum())


GOLDEN_SELF = [
    # (name, length, evalue str, bitscore str) from diamond-test-blastp-default.out
    ("d2dc3a_", 172, "5.04e-125", "343"),
    ("d1x9fc_", 149, "3.87e-111", "306"),
    ("d3g46a_", 146, "3.89e-105", "290"),
    ("d1cg5b_", 141, "3.00e-102", "283"),
]


@pytest.mark.parametrize("name,length,ev,bs", GOLDEN_SELF)
def test_golden_self_hits(data_faa, blosum62, name, length, ev, bs):
    seq = data_faa[name]
    assert len(seq) == length
    score = _self_score(blosum62, seq)
    assert format_double(blosum62.bitscore(score)) == bs
    assert print_e(float(blosum62.evalue(score, length, length))) == ev


def test_golden_cross_hit(data_faa, blosum62):
    # d1cg5b_ vs d1gcvb_: 2.71e-20  75.1 (needs alignment; test bitscore fmt only)
    assert format_double(75.1) == "75.1"
    assert format_double(343.19) == "343"
    assert print_e(2.705e-20) == "2.71e-20"
    assert print_e(0.0) == "0.0"


def test_hauser_brute_force(blosum62):
    """Compare the vectorized Hauser correction against a direct scalar port
    of the reference loop (hauser_correction.cpp:53-106)."""
    rng = np.random.default_rng(0)
    m = blosum62
    for L in [1, 2, 5, 20, 21, 40, 41, 42, 80, 173]:
        seq = rng.integers(0, 24, size=L)  # includes X/stop letters
        window = 40
        # scalar port
        scores = np.zeros(26, dtype=np.int64)
        out = np.zeros(L)
        window_half = min(window // 2, L - 1)
        n = h = mm = t = 0
        bg = m.background_scores

        def add(l):
            for i in range(20):
                scores[i] += m(l, i)

        def sub(l):
            for i in range(20):
                scores[i] -= m(l, i)

        def calc(mm, n):
            r = seq[mm]
            if r < 20:
                out[mm] = bg[r] - float(scores[r] - m(r, r)) / (n - 1)

        while n < window_half and h < L:
            n += 1; add(seq[h]); h += 1
        while n < window + 1 and h < L:
            n += 1; add(seq[h]); calc(mm, n); h += 1; mm += 1
        while h < L:
            add(seq[h]); sub(seq[t]); calc(mm, n); h += 1; t += 1; mm += 1
        while mm < L and n > window_half + 1:
            n -= 1; sub(seq[t]); calc(mm, n); t += 1; mm += 1
        while mm < L:
            calc(mm, n); mm += 1

        got, _ = hauser_correction(seq, m.matrix32, m.background_scores, window)
        np.testing.assert_allclose(got, out, atol=1e-9, err_msg=f"L={L}")


def test_evalue_vs_bitscore_consistency(blosum62):
    m = blosum62
    for s in [50, 100, 300, 879]:
        b = m.bitscore(s)
        assert m.rawscore(b) == s


@slow_extended
def test_custom_matrix_params():
    """--custom-matrix Gumbel parameters from the island-method simulation
    (stats/alp.py) agree with the reference's ALP values within
    simulation tolerance.  Fixture: BLOSUM62 written as a custom file;
    the reference binary's ALP run reports Lambda=0.2724 K=0.0498
    (vs 0.267/0.041 in the precomputed table — ALP itself deviates)."""
    import numpy as np

    from diamond_tpu.constants.alphabet import AMINO_ACID_ALPHABET
    from diamond_tpu.stats.alp import island_lambda_k
    from diamond_tpu.stats.score_matrix import MATRICES, ScoreMatrix

    m = ScoreMatrix("BLOSUM62")
    bg = np.asarray(MATRICES["BLOSUM62"]["background_freqs"],
                    dtype=np.float64)[:20]
    bg = bg / bg.sum()
    m20 = np.ascontiguousarray(m.matrix32[:20, :20], dtype=np.int32)
    lam, K = island_lambda_k(m20, bg, 11, 1, seed=1)
    assert abs(lam - 0.2724) / 0.2724 < 0.05
    assert 0.015 < K < 0.15


def test_scalar_evalue_bit_exact():
    """The scalar fast paths of evalue/bitscore/bitscore_corrected must be
    bit-identical to the vectorized numpy paths (golden outputs print
    e-values to full precision, so one ulp would flip bytes)."""
    import numpy as np

    import diamond_tpu.stats.evalue as ev
    from diamond_tpu.stats.score_matrix import get_matrix

    rng = np.random.default_rng(7)
    for name in ("BLOSUM62", "PAM250"):
        m = get_matrix(name)
        m.set_db_letters(176816)
        scores = rng.integers(15, 900, 500)
        qlens = rng.integers(20, 3000, 500)
        slens = rng.integers(20, 3000, 500)
        vec_ev = m.evalue(scores, qlens, slens)
        vec_bs = m.bitscore(scores)
        vec_bc = ev.bitscore_corrected(
            m.gumbel, scores.astype(np.float64), qlens, slens)
        vec_nm = m.evalue_norm(scores, qlens, slens)
        for i in range(500):
            s, q, t = int(scores[i]), int(qlens[i]), int(slens[i])
            assert m.evalue(s, q, t) == vec_ev[i]
            assert m.bitscore(s) == vec_bs[i]
            assert m.bitscore_corrected(float(s), q, t) == vec_bc[i]
            assert m.evalue_norm(s, q, t) == vec_nm[i]
