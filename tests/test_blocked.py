"""Multi-block search (-b) golden test (reference double_indexed block swap +
join_blocks merge).  Gated: the full blocked data.faa self-search takes
~8 min on CPU — marked slow, in the default suite (verified byte-exact
2026-08-16, 731/731 lines of diamond-test-blastp-blocked.out)."""
import os

import pytest

from diamond_tpu.data.fasta import read_fasta
from diamond_tpu.output.tabular import format_match_line
from diamond_tpu.search.blocked import blocked_search, split_blocks
from diamond_tpu.search.config import SearchConfig
from diamond_tpu.stats.score_matrix import ScoreMatrix

from slowmark import slow_extended

TD = "/root/reference/src/test"


def test_split_blocks_boundary():
    """Boundary rule: cut after the sequence that reaches the cap."""
    seqs = [b"A" * 10, b"A" * 10, b"A" * 5, b"A" * 30]
    blocks, bases = split_blocks(seqs, list("abcd"), 20)
    assert [len(b) for b in blocks] == [2, 2]
    assert bases == [0, 2]


@slow_extended
def test_blocked_golden():
    recs = list(read_fasta(f"{TD}/data.faa"))
    seqs = [r[1].upper() for r in recs]
    ids = [r[0] for r in recs]
    cfg = SearchConfig(matrix=ScoreMatrix("BLOSUM62"), index_chunks=1)
    res = blocked_search(cfg, seqs, ids, list(seqs), list(ids), 0.00002)
    names = [i.split()[0] for i in ids]
    lines = []
    for gq in sorted(res):
        for gt, m in res[gq]:
            for h in m.hsp:
                lines.append(format_match_line(names[gq], names[gt], h))
    gold = open(f"{TD}/diamond-test-blastp-blocked.out").read().splitlines()
    assert lines == gold
