"""Seeded blastx (default double-indexed path over 6 translated contexts).

Goldens in tests/goldens/ minted with the reference binary:
  diamond blastx --db galaxy/db.dmnd --query galaxy/nucleotide.fasta
      --query-gencode 1 --min-orf 1 -p1 -c1
  diamond blastx -q SRR14011045_1.fna.gz -d data.faa -p4 -c1 -k0
"""
import os

import pytest

from diamond_tpu.data.block import Block
from diamond_tpu.data.dmnd import read_dmnd
from diamond_tpu.data.fasta import read_fasta, read_seqs
from diamond_tpu.output.tabular import format_results
from diamond_tpu.search.blastx import TranslatedQueries, blastx_search
from diamond_tpu.search.config import SearchConfig
from diamond_tpu.stats.score_matrix import ScoreMatrix

TD = "/root/reference/src/test"
GD = os.path.join(os.path.dirname(__file__), "goldens")


def _run(queries, tblock, **kw):
    cfg = SearchConfig(matrix=ScoreMatrix("BLOSUM62"), index_chunks=1, **kw)
    res = blastx_search(queries, tblock, cfg)
    return list(format_results(
        res, queries.block, tblock, dna_lens=queries.dna_lens,
        query_names=[i.split()[0] for i in queries.source_ids]))


def test_blastx_galaxy_default_golden():
    ids, seqs = read_dmnd(f"{TD}/galaxy/db.dmnd")
    tblock = Block.from_sequences([s & 31 for s in seqs], ids)
    recs = list(read_fasta(f"{TD}/galaxy/nucleotide.fasta"))
    queries = TranslatedQueries(recs, gencode=1, min_orf=1)
    lines = _run(queries, tblock)
    assert lines == open(f"{GD}/blastx-galaxy-default.out").read().splitlines()


@pytest.mark.slow
def test_blastx_nanopore_golden():
    recs = list(read_fasta(f"{TD}/data.faa"))
    tblock = Block.from_sequences([r[1].upper() for r in recs],
                                  [r[0] for r in recs])
    qrecs = list(read_seqs(f"{TD}/SRR14011045_1.fna.gz"))
    queries = TranslatedQueries(qrecs, gencode=1, min_orf=0)
    lines = _run(queries, tblock, max_target_seqs=0)
    assert lines == open(f"{GD}/blastx-nanopore-data.out").read().splitlines()
