"""Device-mesh sharded scoring vs the numpy oracle (8 virtual CPU devices;
see conftest.py XLA_FLAGS)."""
import os

import numpy as np
import pytest

from diamond_tpu.data.block import Block
from diamond_tpu.data.fasta import read_fasta
from diamond_tpu.ops.banded_swipe import banded_swipe_batch_np
from diamond_tpu.parallel.sharded import make_mesh, sharded_full_scores
from diamond_tpu.stats.score_matrix import ScoreMatrix

from slowmark import slow_extended

TD = "/root/reference/src/test"


def test_sharded_full_scores_match_oracle():
    recs = list(read_fasta(f"{TD}/data.faa"))[:37]  # odd count -> padding
    tblock = Block.from_sequences([r[1].upper() for r in recs],
                                  [r[0] for r in recs])
    q = tblock.seq(0)
    m = ScoreMatrix("BLOSUM62")
    # request the host platform explicitly: a TPU plugin may own the
    # default platform even under the test env (see conftest.py)
    mesh = make_mesh(platform="cpu")
    assert mesh.devices.size == 8, mesh
    scores = sharded_full_scores(mesh, q, None, tblock, m.matrix32,
                                 m.gap_open, m.gap_extend)
    jobs = [(tblock.seq(t), -(len(tblock.seq(t)) - 1), len(q))
            for t in range(len(tblock))]
    ref = [s for s, _, _ in banded_swipe_batch_np(
        q, None, jobs, m.matrix32, m.gap_open, m.gap_extend)]
    assert scores.shape[0] == len(ref)
    assert np.array_equal(scores, np.array(ref))


@slow_extended
def test_cli_swipe_mesh_byte_identical(tmp_path):
    """blastp --swipe --mesh 8 through the CLI == single-device output."""
    import os
    import subprocess
    import sys

    TD = "/root/reference/src/test"
    q = tmp_path / "q.faa"
    db = tmp_path / "db.faa"
    with open(f"{TD}/data.faa") as f:
        lines = f.readlines()
    q.write_text("".join(lines[:6]))
    db.write_text("".join(lines[:60]))
    outs = []
    for mesh in (0, 8):
        out = tmp_path / f"m{mesh}.out"
        from diamond_tpu.utils.device import cpu_subprocess_env

        env = cpu_subprocess_env()
        if mesh:
            env.update(XLA_FLAGS="--xla_force_host_platform_device_count=8")
        args = [sys.executable, "-m", "diamond_tpu.cli", "blastp",
                "-q", str(q), "-d", str(db), "--swipe", "-o", str(out)]
        if mesh:
            args += ["--mesh", str(mesh)]
        subprocess.run(args, check=True, cwd="/root/repo", env=env,
                       capture_output=True)
        outs.append(out.read_bytes())
    assert outs[0] == outs[1]
