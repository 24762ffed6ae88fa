"""Taxonomy database filters (--taxonlist/--taxon-exclude), per-species cap
(--taxon-k), and taxonomy output fields.

Reference: run/double_indexed.cpp:863-870, sequence_file.cpp:772-792
filter_by_taxonomy + :996-1034 contained, output/target_culling.h taxon_k.
Goldens minted from the reference binary on a makedb'd nr_300 subset with
the mini taxdump fixtures.
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


@pytest.fixture(scope="module")
def taxdb(tmp_path_factory):
    db = str(tmp_path_factory.mktemp("taxdb") / "nr300tax.dmnd")
    run_cli(["makedb", "--in", f"{TD}/nr_300.faa", "-d", db,
             "--taxonmap", f"{TD}/nr_10k.taxids.tsv",
             "--taxonnames", f"{TD}/mini_names.dmp",
             "--taxonnodes", f"{TD}/mini_nodes.dmp"])
    return db


@pytest.mark.slow
def test_taxonomy_fields(taxdb):
    """staxids/skingdoms/sphylums output (blastp_nr10k contract)."""
    lines = run_cli(["blastp", "-q", f"{GOLD}/q2.faa", "-d", taxdb,
                     "-c", "1", "-f", "6", "qseqid", "sseqid", "evalue",
                     "staxids", "skingdoms", "sphylums"])
    assert lines == golden("taxon-fields-q2.out")


@slow_extended
def test_taxonlist(taxdb):
    lines = run_cli(["blastp", "-q", f"{TD}/nr_300.faa", "-d", taxdb,
                     "--taxonlist", "2", "-k", "0", "-c", "1"])
    assert lines == golden("taxonlist-nr300.out")


@slow_extended
def test_taxon_exclude(taxdb):
    lines = run_cli(["blastp", "-q", f"{TD}/nr_300.faa", "-d", taxdb,
                     "--taxon-exclude", "2", "-k", "0", "-c", "1"])
    assert lines == golden("taxon-exclude-nr300.out")


@slow_extended
def test_taxon_k_blocked(taxdb):
    """--taxon-k acts in the blocked join (reference join_blocks.cpp:231)."""
    lines = run_cli(["blastp", "-q", f"{TD}/nr_300.faa", "-d", taxdb,
                     "--taxon-k", "1", "-k", "0", "-c", "1", "-b", "0.0001"])
    assert lines == golden("taxon-k-blocked-nr300.out")


def test_taxonlist_exclusive(taxdb):
    r = subprocess.run(
        [sys.executable, "-m", "diamond_tpu.cli", "blastp",
         "-q", f"{GOLD}/q2.faa", "-d", taxdb,
         "--taxonlist", "2", "--taxon-exclude", "3"],
        capture_output=True, text=True, cwd="/root/repo",
        env=cpu_subprocess_env())
    assert r.returncode != 0
    assert "mutually exclusive" in (r.stderr + r.stdout)
