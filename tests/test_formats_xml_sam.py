"""XML (-f5) and SAM (-f101) golden tests.

Goldens in tests/goldens/ were produced by the reference binary:
  diamond blastp -q 1.faa -d 2.faa -p1 -f {xml,sam}
  diamond blastp -q data.faa -d data.faa -p1 -f {xml,sam}
"""
import os

import pytest

from diamond_tpu.data.block import Block
from diamond_tpu.data.fasta import read_fasta
from diamond_tpu.output.sam import render_sam
from diamond_tpu.output.xml import render_xml
from diamond_tpu.search.config import SearchConfig
from diamond_tpu.search.pipeline import Pipeline
from diamond_tpu.stats.score_matrix import ScoreMatrix

from diamond_tpu.utils.device import cpu_subprocess_env

TD = "/root/reference/src/test"
GD = os.path.join(os.path.dirname(__file__), "goldens")


def _search(qp, dp):
    recs = list(read_fasta(qp))
    qb = Block.from_sequences([r[1].upper() for r in recs], [r[0] for r in recs])
    recs = list(read_fasta(dp))
    tb = Block.from_sequences([r[1].upper() for r in recs], [r[0] for r in recs])
    cfg = SearchConfig(matrix=ScoreMatrix("BLOSUM62"))
    return Pipeline(cfg, qb, tb).search(), qb, tb, cfg


def _cmp_sam(ours: str, golden_path: str):
    ref = open(golden_path).read().splitlines(keepends=True)
    got = ours.splitlines(keepends=True)
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        if a.startswith("@PG"):
            continue  # embeds the generating command line
        assert a == b


def test_xml_sam_1v2():
    res, qb, tb, cfg = _search(f"{TD}/1.faa", f"{TD}/2.faa")
    xml = render_xml(res, qb, tb, cfg.matrix, f"{TD}/2.faa", cfg.max_evalue)
    assert xml == open(f"{GD}/blastp-1v2.xml").read()
    _cmp_sam(render_sam(res, qb, tb, cfg.matrix), f"{GD}/blastp-1v2.sam")


@pytest.mark.slow
def test_xml_sam_data():
    res, qb, tb, cfg = _search(f"{TD}/data.faa", f"{TD}/data.faa")
    xml = render_xml(res, qb, tb, cfg.matrix, f"{TD}/data.faa",
                     cfg.max_evalue)
    assert xml == open(f"{GD}/blastp-data.xml").read()
    _cmp_sam(render_sam(res, qb, tb, cfg.matrix), f"{GD}/blastp-data.sam")


def test_json_flat_golden():
    """-f 104 json-flat (reference output_format.cpp:211): tab-indented
    objects, commas between one query's records only, no trailing newline."""
    import subprocess
    import sys

    gd = os.path.join(os.path.dirname(__file__), "goldens")
    r = subprocess.run(
        [sys.executable, "-m", "diamond_tpu.cli", "blastp",
         "-q", f"{gd}/j2.faa", "-d", f"{TD}/data.faa", "-c", "1",
         "-f", "104"],
        capture_output=True, text=True, cwd="/root/repo",
        env=cpu_subprocess_env())
    assert r.returncode == 0, r.stderr
    with open(f"{gd}/json-flat-j2.out") as f:
        assert r.stdout == f.read()
