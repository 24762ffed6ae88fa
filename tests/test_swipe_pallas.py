"""Pallas kernel vs oracle (interpret mode on CPU)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from diamond_tpu.ops.banded_swipe import banded_swipe_batch_np
from diamond_tpu.stats.score_matrix import ScoreMatrix


def test_pallas_interpret_matches_oracle():
    from jax.experimental import pallas as pl
    import diamond_tpu.ops.swipe_pallas as sp

    m = ScoreMatrix("BLOSUM62")
    rng = np.random.default_rng(3)
    q = rng.integers(0, 20, 30).astype(np.int8)
    jobs = []
    for _ in range(5):
        t = rng.integers(0, 20, 26).astype(np.int8)
        t[3:19] = q[5:21]
        jobs.append((t, -12, 13))
    tgt, bmask, ppad, band, meta = sp.prepare_pallas_batch(q, None, m.matrix32,
                                                           jobs, tile_b=8)
    # interpret-mode pallas_call (patch through the module's call)
    import functools
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        best, mc, mr = sp.banded_swipe_pallas.__wrapped__(
            tgt, bmask, ppad, m.gap_open + m.gap_extend, m.gap_extend, band,
            tile_b=8)
    finally:
        pl.pallas_call = orig
    ref = banded_swipe_batch_np(q, None, jobs, m.matrix32, m.gap_open,
                                m.gap_extend)
    for k, (s, jj, ii) in enumerate(ref):
        assert int(best[k]) == s
        if s > 0:
            j_true = int(mc[k]) - meta["shifts"][k]
            i_true = int(mc[k]) - meta["C"] + int(mr[k])
            assert (j_true, i_true) == (jj, ii)
