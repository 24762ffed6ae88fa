"""Global ranking (-g) golden regression.

Reference configs: CMakeLists.txt galaxy_9 (blastx --global-ranking 10) and
blastp-global-ranking (--sensitive -s1 -g10 -k0 blocked); goldens minted
from the reference binary (tests/goldens/*global-ranking*, galaxy9-*).
"""
import os
import subprocess
import sys

import pytest

from slowmark import slow_extended

from diamond_tpu.utils.device import cpu_subprocess_env

TD = "/root/reference/src/test"
GOLD = os.path.join(os.path.dirname(__file__), "goldens")


def run_cli(args):
    r = subprocess.run([sys.executable, "-m", "diamond_tpu.cli"] + args,
                       capture_output=True, text=True, cwd="/root/repo",
        env=cpu_subprocess_env())
    assert r.returncode == 0, r.stderr
    return r.stdout.splitlines()


def golden(name):
    with open(os.path.join(GOLD, name)) as f:
        return f.read().splitlines()


def assert_golden_mod_stats_delta(lines, g):
    """Byte-identical (the round-3 reversed-BackwardCell gating fix killed
    the old 2-line cooptimal-path allowance)."""
    assert lines == g


@pytest.mark.slow
def test_global_ranking_1v2():
    lines = run_cli(["blastp", "-q", f"{TD}/1.faa", "-d", f"{TD}/2.faa",
                     "-g", "10"])
    assert lines == golden("global-ranking-1v2.out")


@pytest.mark.slow
def test_global_ranking_blastx_galaxy9():
    """galaxy_9: blastx --global-ranking 10 --index-chunks 4 on db.dmnd."""
    lines = run_cli([
        "blastx", "--db", f"{TD}/galaxy/db.dmnd",
        "--query", f"{TD}/galaxy/nucleotide.fasta",
        "--query-gencode", "1", "--min-orf", "1",
        "-f", "6", "qseqid", "sseqid", "pident", "length", "mismatch",
        "gapopen", "qstart", "qend", "sstart", "send", "evalue", "bitscore",
        "--comp-based-stats", "1", "--masking", "tantan",
        "--max-target-seqs", "25", "--evalue", "0.001",
        "--motif-masking", "0",
        "--global-ranking", "10", "--index-chunks", "4"])
    assert lines == golden("galaxy9-global-ranking.out")


@slow_extended
def test_global_ranking_data():
    lines = run_cli(["blastp", "-q", f"{TD}/data.faa", "-d", f"{TD}/data.faa",
                     "-g", "10", "-c", "1"])
    assert_golden_mod_stats_delta(lines, golden("global-ranking-data.out"))


@slow_extended
def test_global_ranking_blocked_sensitive_s1():
    """blastp-global-ranking config scaled to data.faa: --sensitive -s1 -g10
    -k0 over letter-capped blocks (-b0.0002)."""
    lines = run_cli(["blastp", "-q", f"{TD}/data.faa", "-d", f"{TD}/data.faa",
                     "--sensitive", "-s", "1", "-g", "10", "-k", "0",
                     "-c", "1", "-b", "0.0002"])
    assert_golden_mod_stats_delta(lines,
                                  golden("global-ranking-blocked-data.out"))
