"""Native C++ components vs their Python twin oracles."""
import numpy as np
import pytest

from diamond_tpu import native
from diamond_tpu.constants.alphabet import encode
from diamond_tpu.data.fasta import read_fasta
from diamond_tpu.masking.tantan import Tantan
from diamond_tpu.stats.score_matrix import ScoreMatrix

TD = "/root/reference/src/test"


@pytest.fixture(scope="module")
def masker():
    return Tantan(ScoreMatrix("BLOSUM62").matrix32)


def test_native_builds():
    assert native.lib() is not None


def test_tantan_bit_identical(masker):
    """Native scan must match the Python/numpy float32 oracle bitwise
    (pairwise summation, -ffp-contract=off)."""
    if native.lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(7)
    seqs = [encode(s.decode().upper())
            for _, s in list(read_fasta(f"{TD}/data.faa"))[:40]]
    seqs += [rng.integers(0, 20, n).astype(np.int8) for n in
             (1, 5, 15, 16, 17, 49, 50, 51, 200)]
    # repeat-rich sequence
    seqs.append(np.tile(np.arange(7, dtype=np.int8), 60))
    for seq in seqs:
        a = native.tantan_repeat_prob(
            np.asarray(seq, dtype=np.int8), masker.ratios,
            float(masker.p_repeat), float(masker.p_repeat_end),
            float(masker.repeat_growth))
        saved = native._lib
        native._lib = None
        try:
            b = masker.repeat_prob(seq)
        finally:
            native._lib = saved
        assert a.tobytes() == b.tobytes()


def test_xdrop_bit_identical():
    """Native x-drop extension vs the Python oracle on block views."""
    import diamond_tpu.native as native
    from diamond_tpu.align.chain import xdrop_ungapped
    from diamond_tpu.data.block import Block

    if native.lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(11)
    m = ScoreMatrix("BLOSUM62").matrix32
    seqs = [rng.integers(0, 20, int(n)).astype(np.int8)
            for n in rng.integers(20, 200, 30)]
    b = Block.from_sequences(seqs, [f"s{i}" for i in range(len(seqs))])
    for trial in range(300):
        qi_ = int(rng.integers(0, len(seqs)))
        ti_ = int(rng.integers(0, len(seqs)))
        qs = int(b.starts[qi_])
        ts = int(b.starts[ti_])
        qa = int(rng.integers(0, b.lengths[qi_]))
        sa = int(rng.integers(0, b.lengths[ti_]))
        bias = (rng.integers(-3, 4, int(b.lengths[qi_])).astype(np.int8)
                if trial % 2 else None)
        qv = b.letters[qs:]
        tv = b.letters[ts:]
        a = xdrop_ungapped(qv, bias, tv, qa, sa, m, 77)
        saved = native._lib
        native._lib = None
        try:
            c = xdrop_ungapped(qv, bias, tv, qa, sa, m, 77)
        finally:
            native._lib = saved
        assert (a.i, a.j, a.len, a.score) == (c.i, c.j, c.len, c.score)


def test_xdrop_chain_bit_identical():
    """Batched native extension loop vs the Python fallback in
    align/extend.py (_extend_hits)."""
    from diamond_tpu.align.extend import _extend_hits
    from diamond_tpu.data.block import Block

    if native.lib() is None:
        pytest.skip("no native toolchain")

    class H:
        def __init__(self, i, j):
            self.i, self.j = i, j

        @property
        def diag(self):
            return self.i - self.j

    rng = np.random.default_rng(23)
    m = ScoreMatrix("BLOSUM62").matrix32
    seqs = [rng.integers(0, 20, int(n)).astype(np.int8)
            for n in rng.integers(30, 300, 20)]
    b = Block.from_sequences(seqs, [f"s{i}" for i in range(len(seqs))])
    for trial in range(120):
        qi_ = int(rng.integers(0, len(seqs)))
        ti_ = int(rng.integers(0, len(seqs)))
        qv = b.letters[int(b.starts[qi_]):]
        tv = b.letters[int(b.starts[ti_]):]
        nh = int(rng.integers(2, 12))
        hits = [H(int(rng.integers(0, b.lengths[qi_])),
                  int(rng.integers(0, b.lengths[ti_]))) for _ in range(nh)]
        hits.sort(key=lambda h: (h.i - h.j, h.j))
        bias = (rng.integers(-3, 4, int(b.lengths[qi_])).astype(np.int8)
                if trial % 2 else None)
        a = _extend_hits(qv, bias, tv, hits, m, 77)
        saved = native._lib
        native._lib = None
        try:
            c = _extend_hits(qv, bias, tv, hits, m, 77)
        finally:
            native._lib = saved
        assert [(s.i, s.j, s.len, s.score) for s in a] == \
               [(s.i, s.j, s.len, s.score) for s in c]


def test_leftmost_verify_bit_identical():
    """Native left-most verification vs the numpy batch oracle, all
    (chunked, left) variants."""
    import diamond_tpu.search.left_most_batch as lmb
    from diamond_tpu.seed.reduction import MURPHY10
    from diamond_tpu.seed.shapes import Shape

    if native.lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(5)
    shape = Shape("111101011101111")
    L = 4000
    q = rng.integers(0, 24, L).astype(np.int8)
    s = rng.integers(0, 24, L).astype(np.int8)
    for a in (q, s):
        a[rng.integers(0, L, 30)] = 31
    for chunked in (False, True):
        for left in (False, True):
            N = 400
            qs = rng.integers(60, L - 100, N).astype(np.int64)
            ss = rng.integers(60, L - 100, N).astype(np.int64)
            hit_bits = rng.integers(0, 1 << 33, N, dtype=np.uint64)
            match_masks = rng.integers(0, 1 << 49, N, dtype=np.uint64)
            match_masks[:80] |= np.uint64(shape.mask)
            args = (q, s, qs, ss, hit_bits, match_masks, left, shape,
                    MURPHY10, chunked, 37, 91, 127, 26)
            a = lmb._verify_batch(*args)
            saved = native._lib
            native._lib = None
            try:
                b = lmb._verify_batch(*args)
            finally:
                native._lib = saved
            assert (a == b).all()


def test_banded_swipe_batch_bit_identical():
    """Native banded-SWIPE batch DP vs the numpy twin: scores, best cells,
    transcripts, and alignment stats."""
    import diamond_tpu.ops.banded_swipe as bs

    if native.lib() is None:
        pytest.skip("no native toolchain")
    m = ScoreMatrix("BLOSUM62").matrix32
    rng = np.random.default_rng(3)
    for trial in range(25):
        qlen = int(rng.integers(30, 400))
        query = rng.integers(0, 24, qlen).astype(np.int8)
        bias = (rng.integers(-2, 3, qlen).astype(np.int8)
                if trial % 2 else None)
        jobs = []
        for _ in range(int(rng.integers(1, 9))):
            tlen = int(rng.integers(20, 300))
            t = rng.integers(0, 24, tlen).astype(np.int8)
            d0 = int(rng.integers(-tlen + 5, qlen - 5))
            band = int(rng.integers(8, 80))
            jobs.append((t, d0, d0 + band))
        for tb in (False, True):
            a = bs.banded_swipe_batch_np(query, bias, jobs, m, 11, 1,
                                         traceback=tb)
            saved = native._lib
            native._lib = None
            try:
                b = bs.banded_swipe_batch_np(query, bias, jobs, m, 11, 1,
                                             traceback=tb)
            finally:
                native._lib = saved
            for x, y in zip(a, b):
                if not tb:
                    assert x[0] == y[0]
                    if x[0] > 0:
                        assert x == y
                else:
                    assert x.score == y.score
                    if x.score > 0:
                        assert (x.transcript, x.query_range,
                                x.subject_range, x.identities, x.mismatches,
                                x.positives, x.gap_openings, x.gaps,
                                x.length, x.max_col, x.max_row) == \
                               (y.transcript, y.query_range,
                                y.subject_range, y.identities, y.mismatches,
                                y.positives, y.gap_openings, y.gaps,
                                y.length, y.max_col, y.max_row)


def test_stage_filters_bit_identical():
    """Native stage-1 fingerprint filter and stage-2 diagonal scores vs
    the numpy twins."""
    import diamond_tpu.search.stages as st
    from diamond_tpu.data.block import Block

    if native.lib() is None:
        pytest.skip("no native toolchain")
    m = ScoreMatrix("BLOSUM62").matrix32
    rng = np.random.default_rng(9)
    seqs = [rng.integers(0, 24, int(n)).astype(np.int8)
            for n in rng.integers(10, 400, 60)]
    b = Block.from_sequences(seqs, [f"s{i}" for i in range(len(seqs))])
    N = 3000
    idx = rng.integers(0, len(seqs), N)
    qp = (b.starts[idx]
          + (rng.random(N) * b.lengths[idx]).astype(np.int64)).astype(np.int64)
    idx2 = rng.integers(0, len(seqs), N)
    sp = (b.starts[idx2]
          + (rng.random(N) * b.lengths[idx2]).astype(np.int64)).astype(np.int64)

    def both(fn, *args):
        a = fn(*args)
        saved = native._lib
        native._lib = None
        try:
            c = fn(*args)
        finally:
            native._lib = saved
        return a, c

    for clamp in (True, False):
        a, c = both(st.stage2_scores, b.letters, b.letters, qp, sp, m, 48,
                    clamp)
        assert (a == c).all()
    a, c = both(st.stage1_filter, b.letters, b.letters, qp, sp, 26)
    assert (a == c).all()


def test_extract_seeds_bit_identical():
    """Native whole-array seed extraction vs the numpy twin across shapes
    and reductions."""
    from diamond_tpu.seed.reduction import MURPHY10, NO_REDUCTION
    from diamond_tpu.seed.shapes import Shape

    if native.lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(17)
    letters = rng.integers(0, 32, 5000).astype(np.int8)
    for red in (MURPHY10, NO_REDUCTION):
        reduced = red(letters)
        for code in ("111101110111", "1101110101101111", "1111111",
                     "110100100010111"):
            shape = Shape(code)
            a = shape.extract_seeds(reduced, red.size)
            saved = native._lib
            native._lib = None
            try:
                b = shape.extract_seeds(reduced, red.size)
            finally:
                native._lib = saved
            assert (a[0] == b[0]).all() and (a[1] == b[1]).all()


def test_tantan_batched_bit_identical(masker):
    """Batched native tantan over a block vs per-sequence scans."""
    from diamond_tpu.data.block import Block

    if native.lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(19)
    seqs = [rng.integers(0, 20, int(n)).astype(np.int8)
            for n in (1, 17, 50, 200, 333)]
    seqs.append(np.tile(np.arange(7, dtype=np.int8), 40))
    b = Block.from_sequences(seqs, [str(i) for i in range(len(seqs))])
    probs = native.tantan_repeat_prob_many(
        b.letters, b.starts, b.lengths, masker.ratios,
        float(masker.p_repeat), float(masker.p_repeat_end),
        float(masker.repeat_growth))
    for i in range(len(b)):
        s = int(b.starts[i])
        L = int(b.lengths[i])
        single = masker.repeat_prob(b.letters[s : s + L])
        assert probs[s : s + L].tobytes() == np.asarray(
            single, dtype=np.float32).tobytes()


def test_motif_block_scan_matches_oracle():
    """Whole-block motif range scan vs the per-sequence oracle."""
    from diamond_tpu.constants.alphabet import encode
    from diamond_tpu.data.block import Block
    from diamond_tpu.masking.motifs import find_motif_ranges
    from diamond_tpu.search.pipeline import motif_mask_ranges

    seqs, ids = [], []
    for h, s in list(read_fasta(f"{TD}/data.faa"))[:120]:
        seqs.append(encode(s.decode().upper()))
        ids.append(str(h))
    rng = np.random.default_rng(2)
    for n in rng.integers(5, 300, 100):
        seqs.append(rng.integers(0, 26, int(n)).astype(np.int8))
        ids.append("r")
    b = Block.from_sequences(seqs, ids)
    got = motif_mask_ranges(b)
    want = []
    for i in range(len(b)):
        s = int(b.starts[i])
        L = int(b.lengths[i])
        for bb, ee in find_motif_ranges(b.letters[s : s + L]):
            want.append((s + bb, s + ee))
    assert got == want


def test_hauser_bias_native_parity():
    """Native sliding-window Hauser bias == numpy prefix-matrix path,
    bit-exact, across lengths shorter and longer than the window."""
    import numpy as np

    from diamond_tpu import native
    from diamond_tpu.stats.cbs import hauser_correction
    from diamond_tpu.stats.score_matrix import ScoreMatrix

    if native.lib() is None:
        import pytest

        pytest.skip("native library unavailable")
    m = ScoreMatrix("BLOSUM62")
    rng = np.random.default_rng(3)
    for L in (1, 5, 20, 39, 40, 41, 80, 613):
        letters = rng.integers(0, 26, L).astype(np.int8)
        _, ref = hauser_correction(letters, m.matrix32, m.background_scores)
        got = native.hauser_bias_native(letters, m.matrix32,
                                        m.background_scores)
        assert np.array_equal(ref, got), L


def test_3frame_forward_bit_identical():
    """Native 3-frame forward pass vs the Python recurrence: identical
    S matrix / best / max_col / cols_done on random frames and bands."""
    if native.lib() is None:
        pytest.skip("no native toolchain")
    from diamond_tpu.ops import swipe3

    mat = ScoreMatrix("BLOSUM62")
    m32 = np.ascontiguousarray(mat.matrix32, dtype=np.int32)
    go, ge, fs = 12, 1, 15
    rng = np.random.default_rng(11)
    for trial in range(30):
        dna_len = int(rng.integers(30, 400))
        qlens = [(dna_len - f) // 3 for f in range(3)]
        q_frames = [rng.integers(0, 24, n).astype(np.int8) for n in qlens]
        tlen = int(rng.integers(10, 300))
        target = rng.integers(0, 24, tlen).astype(np.int8)
        d_begin = int(rng.integers(-(tlen - 1), max(qlens[0] - 1, 1)))
        band = int(rng.integers(3, 64))
        d_end = d_begin + band
        i1_init = max(d_end - 1, 0)
        j0 = i1_init - (d_end - 1)
        ncols = tlen - j0
        if ncols <= 0:
            continue
        q = [f.astype(np.int64) & 31 for f in q_frames]
        t = target.astype(np.int64) & 31
        S_py, best_py, mc_py, cd_py = swipe3._forward_np(
            q, qlens, t, qlens[0], tlen, m32, go, ge, fs,
            i1_init + 1 - band, i1_init, j0, band * 3, ncols)
        got = native.banded_3frame_forward_native(
            q_frames, target, d_begin, d_end, m32, go, ge, fs)
        assert got is not None
        S_c, best_c, mc_c, cd_c = got
        assert (best_c, mc_c, cd_c) == (best_py, mc_py, cd_py), trial
        assert np.array_equal(S_c, S_py.astype(np.int32)), trial
