"""Full blastp search split across jax.distributed processes.

The TPU-native form of the reference's multi-process DB-split search
(reference src/run/double_indexed.cpp:346-430 with
src/util/parallel/multiprocessing.cpp work stacks, and the N=1 == N=k
output contract of src/output/join_blocks.cpp): the target database is
split into one letter-capped block per process, every process runs the
COMPLETE pipeline (masking -> seeding -> stage 1/2 -> extension) on its
shard with global database statistics, and the per-shard match sets are
exchanged over the jax.distributed coordination fabric (DCN collectives
— the reference's shared-filesystem join files become an allgather) as
compact binary HSP rows + packed transcripts (parallel/match_codec, the
reference's IntermediateRecord representation, output/output.h:67-95).
The contract test runs 1,000 queries against the full split nr_10k.
Process 0 re-culls globally exactly like the single-process blocked
join, so the distributed output is byte-identical to one process
running all blocks.

Usage (spawned by tests/test_distributed.py):

    python -m diamond_tpu.parallel.dist_search PID NPROC PORT
"""
import sys


def _gather_bytes(payload: bytes):
    """Allgather variable-length byte strings across processes via the
    global mesh (pad to max length; lengths gathered first)."""
    import jax
    import numpy as np
    from jax.experimental import multihost_utils as mh

    n = np.array([len(payload)], dtype=np.int64)
    lens = np.asarray(mh.process_allgather(n)).reshape(-1)
    cap = int(lens.max())
    buf = np.zeros(cap, dtype=np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, dtype=np.uint8)
    allbuf = np.asarray(mh.process_allgather(buf))
    allbuf = allbuf.reshape(jax.process_count(), cap)
    return [allbuf[p, : int(lens[p])].tobytes()
            for p in range(len(lens))]


def run_worker(pid: int, nproc: int, port: str, n_queries: int = 1000,
               n_targets: int = 10000) -> str:
    from diamond_tpu.utils.device import init_distributed

    assert init_distributed(f"127.0.0.1:{port}", nproc, pid)
    import jax
    import numpy as np

    assert jax.process_count() == nproc

    from diamond_tpu.data.blastdb import BlastDB
    from diamond_tpu.data.block import Block
    from diamond_tpu.output.tabular import format_results
    from diamond_tpu.search.blocked import _join, _run_combo, split_blocks
    from diamond_tpu.search.config import SearchConfig
    from diamond_tpu.stats.score_matrix import ScoreMatrix

    ids, seqs = BlastDB("/root/reference/src/test/blast/nr_10k").load()
    q_ids, q_seqs = ids[:n_queries], seqs[:n_queries]
    t_ids, t_seqs = ids[:n_targets], seqs[:n_targets]
    total_letters = sum(len(s) for s in t_seqs)

    # one letter-capped target block per process (same boundary rule as
    # the single-process blocked driver, so chunking is identical)
    cap = max(total_letters // nproc + 1, 1)
    t_blocks, t_bases = split_blocks(t_seqs, t_ids, cap)
    assert len(t_blocks) == nproc, (len(t_blocks), nproc)

    cfg = SearchConfig(matrix=ScoreMatrix("BLOSUM62"), sensitivity="default")
    cfg.matrix.set_db_letters(total_letters)
    qb = Block.from_sequences(q_seqs, q_ids)
    res = _run_combo(cfg, qb, t_blocks[pid], total_letters)
    local = {qid: [(t_bases[pid] + m.target_block_id, m) for m in matches]
             for qid, matches in res.items()}

    # the shard exchange: compact binary HSP rows + packed transcripts
    # (match_codec — the reference's IntermediateRecord streams,
    # output/output.h:67-95), NOT pickled object graphs; every process
    # then joins identically (deterministic)
    from diamond_tpu.parallel.match_codec import decode, encode

    shards = _gather_bytes(encode(local))
    merged: dict[int, list] = {}
    for blob in shards:
        for gqid, items in decode(blob).items():
            merged.setdefault(gqid, []).extend(items)
    joined = _join(cfg, merged)

    # render with a global target block for ids/lengths
    tb_all = Block.from_sequences(t_seqs, t_ids)
    results = {qid: [type(m)(target_block_id=goid, hsp=m.hsp,
                             filter_evalue=m.filter_evalue,
                             filter_score=m.filter_score)
                     for goid, m in items]
               for qid, items in joined.items()}
    lines = list(format_results(results, qb, tb_all))
    import hashlib

    sha = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    print(f"dist search {pid}/{nproc} OK: {len(lines)} lines sha {sha}",
          flush=True)
    return sha


def main(pid: int, nproc: int, port: str) -> None:
    run_worker(pid, nproc, port)


def single_process_reference(n_queries: int = 1000,
                             n_targets: int = 10000, nproc: int = 2):
    """The N=1 side of the contract: same chunking, one process."""
    import hashlib

    from diamond_tpu.data.blastdb import BlastDB
    from diamond_tpu.data.block import Block
    from diamond_tpu.output.tabular import format_results
    from diamond_tpu.search.blocked import blocked_search
    from diamond_tpu.search.config import SearchConfig
    from diamond_tpu.stats.score_matrix import ScoreMatrix

    ids, seqs = BlastDB("/root/reference/src/test/blast/nr_10k").load()
    q_ids, q_seqs = ids[:n_queries], seqs[:n_queries]
    t_ids, t_seqs = ids[:n_targets], seqs[:n_targets]
    total_letters = sum(len(s) for s in t_seqs)
    cap_gb = (total_letters // nproc + 1) / 1e9
    cfg = SearchConfig(matrix=ScoreMatrix("BLOSUM62"), sensitivity="default")
    joined = blocked_search(cfg, q_seqs, q_ids, t_seqs, t_ids, cap_gb)
    qb = Block.from_sequences(q_seqs, q_ids)
    tb_all = Block.from_sequences(t_seqs, t_ids)
    results = {qid: [type(m)(target_block_id=goid, hsp=m.hsp,
                             filter_evalue=m.filter_evalue,
                             filter_score=m.filter_score)
                     for goid, m in items]
               for qid, items in joined.items()}
    lines = list(format_results(results, qb, tb_all))
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16], lines


def spawn(nproc: int = 2, devices_per_proc: int = 4, timeout_s: float = 900.0):
    """Spawn nproc full-search workers; returns their stdouts."""
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
        "DIAMOND_TPU_DEVICE_DP": "0",
        "XLA_FLAGS":
            f"--xla_force_host_platform_device_count={devices_per_proc}",
    })
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [subprocess.Popen(
        [_sys.executable, "-m", "diamond_tpu.parallel.dist_search",
         str(i), str(nproc), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(nproc)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=timeout_s)
        if p.returncode != 0:
            for q in procs:
                q.kill()
            raise RuntimeError(f"dist search worker failed: {err[-800:]}")
        outs.append(out)
    return outs


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
