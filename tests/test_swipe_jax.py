"""JAX batched banded SW vs the numpy oracle."""
import numpy as np
import pytest

from diamond_tpu.ops.banded_swipe import banded_swipe_np
from diamond_tpu.ops.swipe_jax import SwipeBatcher
from diamond_tpu.stats.score_matrix import ScoreMatrix
from diamond_tpu.stats.cbs import hauser_correction


@pytest.fixture(scope="module")
def m():
    return ScoreMatrix("BLOSUM62")


@pytest.mark.parametrize("seed", range(4))
def test_batch_matches_oracle(m, seed):
    rng = np.random.default_rng(seed)
    qn = int(rng.integers(40, 120))
    q = rng.integers(0, 20, qn).astype(np.int8)
    _, bias = hauser_correction(q, m.matrix32, m.background_scores)
    jobs = []
    expected = []
    for _ in range(13):
        tn = int(rng.integers(30, 150))
        t = rng.integers(0, 20, tn).astype(np.int8)
        ln = min(20, qn // 2, tn // 2)
        qi = int(rng.integers(0, qn - ln))
        ti = int(rng.integers(0, tn - ln))
        t[ti : ti + ln] = q[qi : qi + ln]
        d = qi - ti
        d0 = max(d - 20, -(tn - 1))
        d1 = min(d + 21, qn)
        jobs.append((t, d0, d1))
        r = banded_swipe_np(q, t, d0, d1, m.matrix32, bias, m.gap_open, m.gap_extend)
        expected.append((r.score, r.max_col, r.max_row))
    batcher = SwipeBatcher(m.matrix32, m.gap_open, m.gap_extend)
    got = batcher.run(q, bias, jobs)
    for k, ((s, mc, mr), (es, emc, emr)) in enumerate(zip(got, expected)):
        assert s == es, f"job {k}: score {s} != {es}"
        if s > 0:
            assert (mc, mr) == (emc, emr), f"job {k}: argmax mismatch"
