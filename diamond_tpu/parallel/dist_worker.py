"""One process of a multi-process (jax.distributed) sharded search check.

The TPU-native replacement of the reference's multi-node search
coordination (reference src/run/double_indexed.cpp:346-396,
src/util/parallel/multiprocessing.cpp): every host joins one JAX runtime
through the coordination service, the global mesh spans all processes'
devices (ICI inside a host, DCN/Gloo across), and the sharded scoring
step runs with cross-process collectives instead of shared-filesystem
work stacks.

Usage (spawned by tests/test_distributed.py and
__graft_entry__.dryrun_multichip):

    python -m diamond_tpu.parallel.dist_worker PID NPROC PORT

Every process builds the same inputs deterministically, runs the
DB-sharded full-matrix scorer over the GLOBAL mesh, and asserts the
gathered scores equal the single-process numpy oracle — proving the
cross-process collectives carry real search traffic, not just a barrier.
"""
import sys


def main(pid: int, nproc: int, port: str) -> None:
    from diamond_tpu.utils.device import init_distributed

    assert init_distributed(f"127.0.0.1:{port}", nproc, pid)
    import jax
    import numpy as np

    assert jax.process_count() == nproc, jax.process_count()

    from diamond_tpu.data.block import Block
    from diamond_tpu.ops.banded_swipe import banded_swipe_batch_np
    from diamond_tpu.parallel.sharded import make_mesh, sharded_full_scores
    from diamond_tpu.stats.score_matrix import ScoreMatrix

    rng = np.random.default_rng(9)
    m = ScoreMatrix("BLOSUM62")
    seqs = [rng.integers(0, 20, int(n)).astype(np.int8)
            for n in rng.integers(30, 120, 4 * jax.device_count() + 3)]
    tblock = Block.from_sequences(seqs, [f"t{i}" for i in range(len(seqs))])
    q = tblock.seq(1)
    mesh = make_mesh()  # ALL devices of ALL processes
    scores = sharded_full_scores(mesh, q, None, tblock, m.matrix32,
                                 m.gap_open, m.gap_extend)
    jobs = [(tblock.seq(t), -(len(tblock.seq(t)) - 1), len(q))
            for t in range(len(tblock))]
    ref = np.array([s for s, _, _ in banded_swipe_batch_np(
        q, None, jobs, m.matrix32, m.gap_open, m.gap_extend)])
    assert np.array_equal(scores, ref), (scores[:8], ref[:8])
    print(f"dist worker {pid}/{nproc} OK: {len(ref)} targets sharded over "
          f"{jax.device_count()} devices in {jax.process_count()} processes",
          flush=True)


def spawn_workers(nproc: int = 2, devices_per_proc: int = 4,
                  timeout_s: float = 600.0):
    """Spawn nproc dist_worker processes on localhost CPU devices and wait;
    returns the list of worker stdouts.  Raises on any failure."""
    import os
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "JAX_PLATFORM_NAME": "cpu",
        "XLA_FLAGS":
            f"--xla_force_host_platform_device_count={devices_per_proc}",
    })
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [subprocess.Popen(
        [_sys.executable, "-m", "diamond_tpu.parallel.dist_worker",
         str(i), str(nproc), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(nproc)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=timeout_s)
        if p.returncode != 0:
            for q in procs:
                q.kill()
            raise RuntimeError(f"dist worker failed: {err[-800:]}")
        outs.append(out)
    return outs


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
