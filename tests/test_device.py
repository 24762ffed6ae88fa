"""On-device parity: the pallas DP kernel and the wave driver against the
numpy oracle and the committed goldens, ON REAL TPU HARDWARE when present.

When no TPU is attached (CI on CPU), the hardware tests skip and a cheap
interpret-mode scheduler test still runs, so the cross-query packing logic
(ops/swipe_device.DeviceDP) is always covered.

The contract being pinned: device scores are exact int32 — a default TPU
run is byte-identical to the host path (the reference's determinism
contract, reference src/test/test.cmake:1-12).
"""
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from diamond_tpu.ops.banded_swipe import banded_swipe_batch_np
from diamond_tpu.ops.swipe_device import DeviceDP
from diamond_tpu.stats.score_matrix import ScoreMatrix

TD = "/root/reference/src/test"


def _tpu_present():
    """Bounded TPU presence check.  jax.devices() must NOT be called at
    collection time: the axon plugin hijacks get_backend and initializes
    the tunneled chip even under JAX_PLATFORMS=cpu — with a stalled
    tunnel that hangs pytest collection forever.  The subprocess probe
    (utils/device.py) is time-bounded and disk-cached."""
    from diamond_tpu.utils.device import probe_default_backend

    try:
        return probe_default_backend() not in ("cpu", "gpu", "none")
    except Exception:
        return False


def _tpu_device():
    if not _tpu_present():
        return None
    try:
        for d in jax.devices():
            if d.platform not in ("cpu", "gpu"):
                return d  # tpu or a tpu plugin platform (e.g. axon)
    except Exception:
        return None
    return None


def _random_requests(seed=11, n_queries=6, max_jobs=60):
    m = ScoreMatrix("BLOSUM62")
    rng = np.random.default_rng(seed)
    reqs = []
    for r in range(n_queries):
        qlen = int(rng.integers(15, 400))
        q = rng.integers(0, 20, qlen).astype(np.int8)
        bias = (rng.integers(-4, 5, qlen).astype(np.int32)
                if r % 2 else None)
        jobs = []
        for _ in range(int(rng.integers(1, max_jobs))):
            tl = int(rng.integers(8, 500))
            t = rng.integers(0, 20, tl).astype(np.int8)
            k = max(min(qlen - 1, tl - 2, 20), 0)
            t[2 : 2 + k] = q[1 : 1 + k]
            d0 = int(rng.integers(-tl + 1, max(-tl + 2, qlen - 5)))
            d1 = min(d0 + int(rng.integers(4, 150)), qlen)
            if d1 <= d0:
                d1 = d0 + 1
            jobs.append((t, d0, d1))
        reqs.append((q, bias, jobs))
    return m, reqs


def _check(m, reqs, out):
    for (q, bias, jobs), res in zip(reqs, out):
        ref = banded_swipe_batch_np(q, bias, jobs, m.matrix32, m.gap_open,
                                    m.gap_extend)
        for k, (a, b) in enumerate(zip(res, ref)):
            assert a == b, (k, a, b)


def test_device_scheduler_interpret():
    """Cross-query packing vs oracle (interpret mode; always runs)."""
    m, reqs = _random_requests(seed=3, n_queries=4, max_jobs=20)
    dev = DeviceDP(m.matrix32, m.gap_open, m.gap_extend, tile_b=8,
                   interpret=True)
    _check(m, reqs, dev.run_many(reqs))


def test_device_scheduler_mesh_sharded():
    """--mesh N path: mega-batch tiles shard_map'ed over the 'db' axis of
    an 8-device virtual CPU mesh (conftest.py XLA_FLAGS), exact parity
    with the oracle."""
    from diamond_tpu.parallel.sharded import make_mesh

    mesh = make_mesh(platform="cpu")
    if mesh.devices.size < 2:
        pytest.skip("needs a multi-device CPU mesh")
    m, reqs = _random_requests(seed=5, n_queries=5, max_jobs=30)
    dev = DeviceDP(m.matrix32, m.gap_open, m.gap_extend, tile_b=8,
                   interpret=True, mesh=mesh)
    _check(m, reqs, dev.run_many(reqs))


@pytest.mark.skipif(not _tpu_present(), reason="no TPU attached")
def test_device_kernel_vs_oracle_on_tpu():
    """Pallas kernel on the real chip: irregular bands/lengths vs oracle."""
    m, reqs = _random_requests(seed=11, n_queries=8, max_jobs=80)
    dev = DeviceDP(m.matrix32, m.gap_open, m.gap_extend)
    _check(m, reqs, dev.run_many(reqs))


@pytest.mark.skipif(not _tpu_present(), reason="no TPU attached")
@pytest.mark.slow
def test_device_golden_blastp_on_tpu():
    """Full blastp golden with the wave driver on the real chip:
    byte-identical to the committed reference expectation."""
    from diamond_tpu.align.wave import extend_wave  # noqa: F401
    from tests.test_golden_e2e import golden, run_blastp

    saved = {k: os.environ.get(k) for k in ("DIAMOND_TPU_DEVICE_DP",
                                            "DIAMOND_TPU_DP_MIN_CELLS")}
    os.environ["DIAMOND_TPU_DEVICE_DP"] = "1"
    os.environ["DIAMOND_TPU_DP_MIN_CELLS"] = "0"  # route every job on-chip
    try:
        lines = run_blastp(f"{TD}/data.faa", f"{TD}/data.faa")
    finally:
        for k, v in saved.items():  # restore (conftest pins the "0"
            if v is None:           # kill-switch for the rest of the suite)
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert lines == golden("diamond-test-blastp-default.out")


def _sweep_case(seed=7, n_queries=3, n_targets=40):
    """Random full-matrix (--swipe) case + oracle scores."""
    m = ScoreMatrix("BLOSUM62")
    rng = np.random.default_rng(seed)
    queries = []
    for r in range(n_queries):
        qlen = int(rng.integers(20, 300))
        q = rng.integers(0, 20, qlen).astype(np.int8)
        bias = (rng.integers(-4, 5, qlen).astype(np.int32)
                if r % 2 else None)
        queries.append((q, bias))
    targets = [rng.integers(0, 20, int(rng.integers(10, 400))).astype(np.int8)
               for _ in range(n_targets)]
    return m, queries, targets


def _check_sweep(m, queries, targets, res):
    for (q, bias), row in zip(queries, res):
        jobs = [(t, -(len(t) - 1), len(q)) for t in targets]
        ref = banded_swipe_batch_np(q, bias, jobs, m.matrix32, m.gap_open,
                                    m.gap_extend)
        for t, (a, b) in enumerate(zip(row, ref)):
            assert a == b, (t, a, b)


def test_swipe_sweep_interpret():
    """--swipe device sweep (SwipeSweep) vs the full-band oracle
    (interpret mode; always runs)."""
    from diamond_tpu.ops.swipe_device import SwipeSweep

    m, queries, targets = _sweep_case()
    sweep = SwipeSweep(m.matrix32, m.gap_open, m.gap_extend, interpret=True)
    _check_sweep(m, queries, targets, sweep.run(queries, targets))


@pytest.mark.skipif(not _tpu_present(), reason="no TPU attached")
def test_swipe_sweep_on_tpu():
    """--swipe device sweep on the real chip: exact int32 parity."""
    from diamond_tpu.ops.swipe_device import SwipeSweep

    m, queries, targets = _sweep_case(seed=13, n_queries=2, n_targets=24)
    sweep = SwipeSweep(m.matrix32, m.gap_open, m.gap_extend)
    _check_sweep(m, queries, targets, sweep.run(queries, targets))


def test_stage12_device_parity():
    """Device stage-1/2 (ops/stage12_jax) vs the native fused pass on
    random pairs: exact keep/score parity (runs on any backend)."""
    from diamond_tpu import native
    from diamond_tpu.ops.stage12_jax import Stage12Device

    m = ScoreMatrix("BLOSUM62")
    rng = np.random.default_rng(2)
    L = 100_000
    letters = rng.integers(0, 20, L + 512).astype(np.int8)
    letters[:256] = 31
    letters[-256:] = 31
    # sprinkle delimiters so the clip logic is exercised
    letters[rng.integers(300, L, 200)] = 31
    N = 5000
    qp = rng.integers(300, L, N).astype(np.int64)
    sp = rng.integers(300, L, N).astype(np.int64)
    win = np.full(N, 48, np.int64)
    cut = np.full(N, 19, np.int32)
    dev = Stage12Device(m.matrix32)
    k, s = dev.run(letters, letters, qp, sp, win, cut, 11)
    kn = native.stage1_filter_native(letters, letters, qp, sp, 11)
    if kn is None:
        pytest.skip("native library unavailable")
    sn = native.stage2_scores_native(letters, letters, qp, sp, m.matrix32,
                                     48, True)
    keep_n = kn & (sn > cut)
    assert (k == keep_n).all()
    assert (s[k] == np.minimum(sn, 255)[k]).all()


@pytest.mark.skipif(not _tpu_present(), reason="no TPU attached")
@pytest.mark.slow
def test_stage12_device_golden_on_tpu():
    """data.faa self-search with stage-1/2 on the chip: byte-identical."""
    from tests.test_golden_e2e import golden, run_blastp

    os.environ["DIAMOND_TPU_STAGE12"] = "1"
    try:
        lines = run_blastp(f"{TD}/data.faa", f"{TD}/data.faa")
    finally:
        os.environ.pop("DIAMOND_TPU_STAGE12", None)
    assert lines == golden("diamond-test-blastp-default.out")


def test_stage12_matmul_groups_parity():
    """run_join (one-hot MXU matmul stage 1 for large all-vs-all seed
    groups + fused kernel tail) vs run (fused kernel for every pair):
    identical keep/scores in expanded-pair order (any backend)."""
    from diamond_tpu.ops.stage12_jax import MATMUL_MIN_PAIRS, Stage12Device
    from diamond_tpu.search.stages import SeedJoin, expand_pairs

    m = ScoreMatrix("BLOSUM62")
    rng = np.random.default_rng(5)
    L = 60_000
    letters = rng.integers(0, 20, L + 512).astype(np.int8)
    letters[:256] = 31
    letters[-256:] = 31
    letters[rng.integers(300, L, 120)] = 31
    # group sizes straddling the matmul threshold, including tiles that
    # need q- and s-side splitting
    sizes = [(1, 1), (3, 5), (2, 300), (20, 40), (9, 130), (1, 700),
             (40, 17), (2, 2)]
    q_pos, s_pos, q_start, s_start = [], [], [0], [0]
    for nq, ns in sizes:
        q_pos.extend(rng.integers(300, L, nq))
        s_pos.extend(rng.integers(300, L, ns))
        q_start.append(len(q_pos))
        s_start.append(len(s_pos))
    join = SeedJoin(
        keys=np.arange(len(sizes), dtype=np.uint64),
        q_start=np.array(q_start, dtype=np.int64),
        q_pos=np.array(q_pos, dtype=np.int64),
        s_start=np.array(s_start, dtype=np.int64),
        s_pos=np.array(s_pos, dtype=np.int64))
    assert any(nq * ns >= MATMUL_MIN_PAIRS for nq, ns in sizes)
    qp, sp = expand_pairs(join)
    win = np.full(len(qp), 48, np.int64)
    cut = np.full(len(qp), 15, np.int32)
    dev = Stage12Device(m.matrix32)
    k1, s1 = dev.run_join(letters, letters, join, qp, sp, win, cut, 11)
    k2, s2 = dev.run(letters, letters, qp, sp, win, cut, 11)
    assert (k1 == k2).all()
    assert (s1[k1] == s2[k1]).all()
