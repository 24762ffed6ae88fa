"""Multi-process blocked search (checkpoint/resume), seed index
(makeidx/--target-indexed), and tracing flags.

Reference: util/parallel/{filestack.h,atomic.h}, double_indexed.cpp:346-430
(--multiprocessing / --mp-init / --mp-recover), data/index.cpp (makeidx),
util/log_stream.h (verbosity levels).
"""
import os
import subprocess
import sys

import pytest

from diamond_tpu.utils.device import cpu_subprocess_env

TD = "/root/reference/src/test"


def run_cli(args, **kw):
    kw.setdefault("env", cpu_subprocess_env())
    return subprocess.run([sys.executable, "-m", "diamond_tpu.cli"] + args,
                          capture_output=True, text=True, cwd="/root/repo",
                          **kw)


def test_filestack_and_counter(tmp_path):
    from diamond_tpu.parallel.mp import AtomicCounter, FileStack

    st = FileStack(str(tmp_path / "s.stack"))
    st.push("a")
    st.push("b")
    assert st.pop() == "b"
    st.push("c")
    assert sorted(st.lines()) == ["a", "c"]
    assert st.remove("a")
    assert not st.remove("a")
    assert st.pop() == "c"
    assert st.pop() is None

    c = AtomicCounter(str(tmp_path / "c.txt"))
    assert c.fetch_add() == 0
    assert c.fetch_add(5) == 1
    assert c.get() == 6


def test_mp_init_recover(tmp_path):
    from diamond_tpu.parallel import mp

    d = str(tmp_path / "work")
    mp.mp_init(d, 2, 3)
    todo = mp.FileStack(os.path.join(d, "todo.stack"))
    assert len(todo.lines()) == 6
    # simulate a crash: one combo in WIP without a checkpoint, one with
    wip = mp.FileStack(os.path.join(d, "wip.stack"))
    wip.push("0 1")
    wip.push("1 2")
    import pickle

    with open(os.path.join(d, "combo_1_2.pkl"), "wb") as f:
        pickle.dump({}, f)
    todo.remove("0 1")
    todo.remove("1 2")
    assert mp.mp_recover(d) == 1   # only the un-checkpointed combo requeued
    assert "0 1" in todo.lines()
    assert wip.lines() == []


@pytest.mark.slow
def test_mp_blocked_golden(tmp_path):
    """Two-phase mp run reproduces the blocked golden byte-identically."""
    d = str(tmp_path / "mp")
    r = run_cli(["blastp", "-q", f"{TD}/data.faa", "-d", f"{TD}/data.faa",
                 "-c", "1", "-b", "0.00002", "--mp-init",
                 "--parallel-tmpdir", d])
    assert r.returncode == 0, r.stderr
    r = run_cli(["blastp", "-q", f"{TD}/data.faa", "-d", f"{TD}/data.faa",
                 "-c", "1", "-b", "0.00002", "--multiprocessing",
                 "--parallel-tmpdir", d])
    assert r.returncode == 0, r.stderr
    with open(f"{TD}/diamond-test-blastp-blocked.out") as f:
        assert r.stdout.splitlines() == f.read().splitlines()


@pytest.mark.slow
def test_target_indexed_golden(tmp_path):
    """makeidx + --target-indexed == non-indexed search byte-identically."""
    db = str(tmp_path / "data.faa")
    import shutil

    shutil.copy(f"{TD}/data.faa", db)
    r = run_cli(["makeidx", "-d", db])
    assert r.returncode == 0, r.stderr
    assert os.path.exists(db + ".seed_idx")
    r = run_cli(["blastp", "-q", f"{TD}/1.faa", "-d", db,
                 "--target-indexed"])
    assert r.returncode == 0, r.stderr
    r2 = run_cli(["blastp", "-q", f"{TD}/1.faa", "-d", db])
    assert r.stdout == r2.stdout


def test_verbose_tracing():
    r = run_cli(["blastp", "-q", f"{TD}/1.faa", "-d", f"{TD}/2.faa", "-v"])
    assert r.returncode == 0
    assert "Masking sequences" in r.stderr
    assert "Total time" in r.stderr
    assert "SEED_HITS" in r.stderr


def test_hit_buffer_spill_roundtrip():
    """Disk-binned hit spill preserves per-query production order
    (reference search/hit_buffer.cpp contract)."""
    import numpy as np

    from diamond_tpu.search.hit_buffer import HitBuffer

    rng = np.random.default_rng(0)
    buf = HitBuffer(n_queries=100, n_bins=4, cap_rows=500)
    chunks = []
    for _ in range(20):
        n = int(rng.integers(50, 200))
        arr = np.empty((n, 4), dtype=np.int64)
        arr[:, 0] = rng.integers(0, 100, n)
        arr[:, 1:] = rng.integers(0, 1000, (n, 3))
        chunks.append(arr.copy())
        buf.append(arr)
    buf.finish()
    assert buf.spilled
    got = np.concatenate(list(buf.bins()))
    ref = np.concatenate(chunks)
    # per query id, row order must equal production order
    for q in range(100):
        a = got[got[:, 0] == q]
        b = ref[ref[:, 0] == q]
        assert np.array_equal(a, b), q


@pytest.mark.slow
def test_query_indexed_algo_output_identical():
    """--algo 1 (query-indexed: DB seeds probe the sorted query keys, no
    DB-side seed sort — reference double_indexed.cpp:267-294,
    setup.cpp:311-320) is output-identical to --algo 0."""
    import subprocess
    import sys

    import tempfile

    from diamond_tpu.data.fasta import read_fasta

    recs = list(read_fasta(f"{TD}/data.faa"))[:3]
    qf = tempfile.NamedTemporaryFile("w", suffix=".faa", delete=False)
    for sid, seq in recs:
        qf.write(f">{sid}\n{seq.decode()}\n")
    qf.close()

    def run(algo):
        r = subprocess.run(
            [sys.executable, "-m", "diamond_tpu.cli", "blastp",
             "-q", qf.name, "-d", f"{TD}/data.faa",
             "--algo", algo, "-e", "10"],
            capture_output=True, text=True, cwd="/root/repo",
            env=cpu_subprocess_env())
        assert r.returncode == 0, r.stderr
        return r.stdout

    a0 = run("0")
    a1 = run("1")
    assert a0 == a1
    assert a0  # nonempty


def test_query_indexed_auto_rule():
    """Auto selection mirrors the reference thresholds."""
    from diamond_tpu.data.block import Block
    from diamond_tpu.search.config import SearchConfig
    from diamond_tpu.search.pipeline import Pipeline
    from diamond_tpu.stats.score_matrix import ScoreMatrix

    import numpy as np

    small = Block.from_sequences(
        [np.zeros(100, dtype=np.int8)], ["q"])
    big = Block.from_sequences(
        [np.zeros(100_000, dtype=np.int8) for _ in range(3)],
        ["a", "b", "c"])
    cfg = SearchConfig(matrix=ScoreMatrix("BLOSUM62"))
    assert Pipeline(cfg, small, big)._query_indexed       # 100*2000 < 300k
    assert not Pipeline(cfg, big, big)._query_indexed     # self / large
    cfg0 = SearchConfig(matrix=ScoreMatrix("BLOSUM62"), algo="0")
    assert not Pipeline(cfg0, small, big)._query_indexed
