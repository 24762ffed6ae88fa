"""Multi-worker out-of-core clustering (cluster/multinode.py).

Covers the three contracts the reference's multinode design carries
(reference src/cluster/multinode/multinode.cpp:73-289, len_sort.cpp):

1. N workers == 1 worker, byte-identical output (work distribution must
   not change results — edges are merged in combo order).
2. Crash recovery: a worker that dies mid-combo leaves its claim on the
   WIP stack; a relaunch with --mp-recover requeues and finishes the
   round with identical output.
3. Streaming len_sort: the input is never fully resident (two-pass spool
   with an RSS bound).

Output-contract note: the multinode path blocks the input into
length-sorted volumes and searches volume pairs, so borderline cluster
assignments can differ from the in-memory cascade (`diamond linclust`
without --multiprocessing) exactly as the reference's output depends on
its block decomposition; the canonical single-machine result is the
in-memory cascade (byte-identical to the reference binary,
tests/test_linclust.py), and the multinode contract is the three
invariants above.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

TD = "/root/reference/src/test"


def _run_workers(tmp_path, n_workers, tag, env_extra=None, db=None):
    out = tmp_path / f"out_{tag}.tsv"
    tmpdir = tmp_path / f"mp_{tag}"
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "JAX_PLATFORM_NAME": "cpu"})
    env.pop("PALLAS_AXON_POOL_IPS", None)
    if env_extra:
        env.update(env_extra)
    args = [sys.executable, "-m", "diamond_tpu.cli", "linclust",
            "-d", db or f"{TD}/data.faa", "-o", str(out),
            "--multiprocessing", "--parallel-tmpdir", str(tmpdir),
            "--approx-id", "0", "-b", "0.00002"]
    procs = [subprocess.Popen(args, cwd="/root/repo", env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE)
             for _ in range(n_workers)]
    rcs = [p.wait(timeout=1200) for p in procs]
    errs = b"\n".join(p.stderr.read()[-500:] for p in procs)
    return out, tmpdir, rcs, errs, args, env


@pytest.mark.slow
def test_two_workers_equal_one(tmp_path):
    out1, _, rcs, errs, _, _ = _run_workers(tmp_path, 1, "w1")
    assert all(r == 0 for r in rcs), errs
    out2, _, rcs, errs, _, _ = _run_workers(tmp_path, 2, "w2")
    assert all(r == 0 for r in rcs), errs
    a = out1.read_text()
    assert a == out2.read_text()
    assert len(a.splitlines()) == 389  # one line per input record


@pytest.mark.slow
def test_crash_recovery(tmp_path):
    # baseline
    out_ok, _, rcs, errs, _, _ = _run_workers(tmp_path, 1, "ok")
    assert all(r == 0 for r in rcs), errs
    # worker dies while holding its 2nd claimed combo
    out, tmpdir, rcs, errs, args, env = _run_workers(
        tmp_path, 1, "crash",
        env_extra={"DIAMOND_TPU_MP_DIE_ON_CLAIM": "2"})
    assert rcs[0] == 17, errs  # the injected hard exit
    wip = tmpdir / "round_0" / "wip.stack"
    assert wip.exists() and wip.read_text().strip()
    # relaunch with --mp-recover: requeues the WIP combo and finishes
    env2 = dict(env)
    env2.pop("DIAMOND_TPU_MP_DIE_ON_CLAIM", None)
    r = subprocess.run(args + ["--mp-recover"], cwd="/root/repo", env=env2,
                       capture_output=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-500:]
    assert out.read_text() == out_ok.read_text()


def test_streaming_len_sort_rss(tmp_path):
    """create_streaming never materializes the input: 120 MB of
    generated sequences pass through with a small RSS delta."""
    import resource

    from diamond_tpu.cluster.multinode import VolumedFile

    n, ln = 30_000, 4_000  # 120 MB of letters

    def reader():
        rng = np.random.default_rng(3)
        aas = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", dtype=np.uint8)
        for i in range(n):
            # vary lengths so the sort is nontrivial
            m = ln + (i % 17) * 8
            yield f"s{i}", aas[rng.integers(0, 20, m)].tobytes().decode()

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    v = VolumedFile.create_streaming(reader, str(tmp_path), 20_000_000)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert v.n_records == n
    assert len(v.volumes) >= 6
    # lengths descend across the volume order
    lens = []
    for vi in range(len(v.volumes)):
        blk = v.load_block(vi)
        lens.extend(int(x) for x in blk.lengths)
    assert lens == sorted(lens, reverse=True)
    # RSS delta well under the 120 MB of letters (ids+meta only)
    assert (rss1 - rss0) * 1024 < 60_000_000, (rss0, rss1)


def test_read_records_roundtrip(tmp_path):
    from diamond_tpu.cluster.multinode import VolumedFile

    recs = [(f"q{i}", "ACDEFGHIKL" * (3 + i % 5)) for i in range(40)]
    v = VolumedFile.create_streaming(lambda: iter(recs), str(tmp_path), 200)
    want = [0, 3, 7, 19, 39]
    got = list(v.read_records(want))
    assert [g[0] for g in got] == [v.ids[o] for o in want]
    by_id = dict(recs)
    for sid, seq in got:
        assert seq.upper() == by_id[sid].upper()
