"""Frameshift (-F) 3-frame alignment and query-range culling goldens.

Reference: dp/swipe/banded_3frame_swipe.cpp, align/legacy/ (QueryMapper
pipeline), output/target_culling.h RangeCulling.  Goldens minted from the
reference binary.
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


def test_interval_partition():
    from diamond_tpu.align.frameshift import IntervalPartition

    p = IntervalPartition(2)
    p.insert(0, 100, 50)
    assert p.covered(0, 100) == 0  # count 1 < cap 2
    p.insert(50, 150, 60)
    assert p.covered(0, 100) == 50   # [50,100) has count 2
    assert p.covered(0, 200) == 50
    assert p.covered_min_score(50, 100, 55) == 0   # min score is 50
    assert p.covered_max_score(50, 100, 55) == 50  # max score is 60
    p.insert(60, 70, 70)
    # once count >= cap the min_score freezes (IntervalNode::add)
    assert p.covered_min_score(60, 70, 55) == 0
    assert p.covered_min_score(60, 70, 50) == 10


@pytest.mark.slow
def test_blastx_frameshift_galaxy():
    """galaxy config with -F 15 (3-frame DP, frameshift transcripts)."""
    lines = run_cli([
        "blastx", "--db", f"{TD}/galaxy/db.dmnd",
        "--query", f"{TD}/galaxy/nucleotide.fasta",
        "--query-gencode", "1", "--min-orf", "1", "-F", "15",
        "--comp-based-stats", "1", "--masking", "tantan",
        "--max-target-seqs", "25", "--evalue", "0.001",
        "--motif-masking", "0"])
    assert lines == golden("blastx-galaxy-fs.out")


@slow_extended
def test_blastx_long_reads_range_culling():
    """--long-reads = --range-culling --top 10 -F 15 on nanopore reads."""
    lines = run_cli(["blastx", "-q", f"{TD}/SRR14011045_1.fna.gz",
                     "-d", f"{TD}/data.faa", "--long-reads", "-c", "1"])
    assert lines == golden("blastx-longreads-data.out")


def test_range_culling_requires_frameshift():
    r = subprocess.run(
        [sys.executable, "-m", "diamond_tpu.cli", "blastx",
         "-q", f"{TD}/galaxy/nucleotide.fasta", "-d", f"{TD}/galaxy/db.dmnd",
         "--range-culling"],
        capture_output=True, text=True, cwd="/root/repo",
        env=cpu_subprocess_env())
    assert r.returncode != 0
    assert "frameshift" in (r.stderr + r.stdout)
