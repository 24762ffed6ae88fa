"""Multi-process jax.distributed exercise (SURVEY §2.9.5-6).

Two coordinator-joined processes, 4 virtual CPU devices each, run the
DB-sharded full-matrix scorer over the 8-device GLOBAL mesh and check
the all-gathered scores against the single-process numpy oracle —
the DCN(process) axis carries real search collectives (Gloo on CPU),
replacing the reference's shared-filesystem work stacks
(reference src/run/double_indexed.cpp:346-396,
src/util/parallel/multiprocessing.cpp).
"""
import pytest

pytest.importorskip("jax")


@pytest.mark.slow
def test_two_process_sharded_search():
    from diamond_tpu.parallel.dist_worker import spawn_workers

    outs = spawn_workers(nproc=2, devices_per_proc=4)
    assert all("OK" in o for o in outs), outs
    assert all("in 2 processes" in o for o in outs), outs
