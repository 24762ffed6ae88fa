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


@pytest.mark.slow
def test_two_process_full_blastp_byte_identical():
    """Complete blastp pipeline (masking -> seeding -> extension ->
    tabular output) split across 2 jax.distributed processes; the merged
    output must be byte-identical to one process running the same blocks
    (the reference's N=1 == N=k multiprocessing contract, reference
    double_indexed.cpp:346-430, join_blocks.cpp)."""
    import re

    from diamond_tpu.parallel.dist_search import (single_process_reference,
                                                  spawn)

    outs = spawn(nproc=2)
    shas = {re.search(r"sha (\w+)", o).group(1) for o in outs}
    assert len(shas) == 1, outs  # both processes joined identically
    ref_sha, lines = single_process_reference(nproc=2)
    assert lines, "single-process reference produced no output"
    assert shas == {ref_sha}, (shas, ref_sha)
