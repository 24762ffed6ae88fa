"""Iterated search (--iterate) and FASTER-mode (sketch seeding) goldens.

Reference semantics: setup.cpp:56-68 round cascade, double_indexed.cpp:
453-500 round loop + query_skip, :112-114 length-sorted targets in
linearized rounds, stage2.h:101 skip_left_most for sketch/linearized.
Goldens minted from the reference binary.
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


def test_rounds_for():
    from diamond_tpu.search.iterate import rounds_for

    assert rounds_for("default", None) == [("default", False)]
    assert rounds_for("default", []) == [
        ("faster", True), ("fast", True), ("linclust-40", True),
        ("default", False)]
    # linearized rounds sort first, then by sensitivity rank (reference
    # run/config.h:71-73 Round::operator<)
    assert rounds_for("sensitive", []) == [
        ("faster", True), ("fast", True), ("linclust-20", True),
        ("default", False), ("sensitive", False)]
    assert rounds_for("default", ["fast_lin"]) == [
        ("fast", True), ("default", False)]
    with pytest.raises(ValueError):
        rounds_for("default", ["sensitive"])  # above target
    with pytest.raises(ValueError):
        rounds_for("default", ["fast", "fast"])  # duplicate


@pytest.mark.slow
def test_iterate_1v2():
    lines = run_cli(["blastp", "-q", f"{TD}/1.faa", "-d", f"{TD}/2.faa",
                     "--iterate"])
    assert lines == golden("iterate-1v2.out")


@slow_extended
def test_iterate_data():
    from tests.test_global_ranking import assert_golden_mod_stats_delta

    lines = run_cli(["blastp", "-q", f"{TD}/data.faa", "-d", f"{TD}/data.faa",
                     "--iterate", "-c", "1"])
    assert_golden_mod_stats_delta(lines, golden("iterate-data.out"))


@slow_extended
def test_faster_data():
    """--faster: min-hash sketch seeding, left-most filter skipped."""
    lines = run_cli(["blastp", "-q", f"{TD}/data.faa", "-d", f"{TD}/data.faa",
                     "--faster", "-c", "1"])
    assert lines == golden("faster-data.out")
