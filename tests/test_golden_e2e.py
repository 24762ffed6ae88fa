"""End-to-end golden regression: byte-identical tabular output vs the
reference's committed test expectations (reference src/test/*.out,
CMakeLists.txt:535-572)."""
import os

import pytest

from diamond_tpu.data.block import Block
from diamond_tpu.data.fasta import read_fasta
from diamond_tpu.output.tabular import format_results
from diamond_tpu.search.config import SearchConfig
from diamond_tpu.search.pipeline import Pipeline
from diamond_tpu.stats.score_matrix import ScoreMatrix

TD = "/root/reference/src/test"


def run_blastp(query_path, db_path, sensitivity="default", **cfg_kw):
    recs = list(read_fasta(query_path))
    qb = Block.from_sequences([r[1].upper() for r in recs], [r[0] for r in recs])
    recs = list(read_fasta(db_path))
    tb = Block.from_sequences([r[1].upper() for r in recs], [r[0] for r in recs])
    cfg = SearchConfig(matrix=ScoreMatrix(cfg_kw.pop("matrix", "BLOSUM62")),
                       sensitivity=sensitivity, **cfg_kw)
    pipe = Pipeline(cfg, qb, tb)
    res = pipe.search()
    return list(format_results(res, qb, tb))


def golden(name):
    with open(os.path.join(TD, name)) as f:
        return f.read().splitlines()


@pytest.mark.slow
def test_blastp_default_golden():
    """diamond-test-blastp-default: blastp -q data.faa -d data.faa -p1."""
    lines = run_blastp(f"{TD}/data.faa", f"{TD}/data.faa")
    assert lines == golden("diamond-test-blastp-default.out")


@pytest.mark.slow
def test_blastp_1_vs_2():
    """blastp: blastp -q 1.faa -d 2.faa -p1 (single query vs single target)."""
    lines = run_blastp(f"{TD}/1.faa", f"{TD}/2.faa")
    assert lines == golden("blastp.out")


@pytest.mark.slow
def test_blastx_swipe_galaxy7():
    """galaxy_7: blastx --swipe vs prebuilt .dmnd, gencode 1, min-orf 1."""
    from diamond_tpu.data.block import Block
    from diamond_tpu.data.dmnd import read_dmnd
    from diamond_tpu.output.tabular import format_results
    from diamond_tpu.search.blastx import TranslatedQueries, blastx_swipe_all

    gd = f"{TD}/galaxy"
    ids, seqs = read_dmnd(f"{gd}/db.dmnd")
    tblock = Block.from_sequences([s & 31 for s in seqs], ids)
    recs = list(read_fasta(f"{gd}/nucleotide.fasta"))
    queries = TranslatedQueries(recs, gencode=1, min_orf=1)
    cfg = SearchConfig(matrix=ScoreMatrix("BLOSUM62"), comp_based_stats=1,
                       masking="tantan", motif_masking=False, max_evalue=0.001,
                       max_target_seqs=25, translated=True)
    res = blastx_swipe_all(queries, tblock, cfg)
    lines = list(format_results(
        res, queries.block, tblock, dna_lens=queries.dna_lens,
        query_names=[i.split()[0] for i in queries.source_ids]))
    assert lines == golden("galaxy_7.out")


@pytest.mark.slow
def test_blastp_formats_golden():
    """-f0 pairwise and PAF outputs (diamond-test-blastp-{pairwise,paf}-format)."""
    from diamond_tpu.data.block import Block
    from diamond_tpu.output.tabular import render_paf, render_pairwise
    from diamond_tpu.search.pipeline import Pipeline

    recs = list(read_fasta(f"{TD}/data.faa"))
    qb = Block.from_sequences([r[1].upper() for r in recs], [r[0] for r in recs])
    tb = Block.from_sequences([r[1].upper() for r in recs], [r[0] for r in recs])
    cfg = SearchConfig(matrix=ScoreMatrix("BLOSUM62"), index_chunks=1)
    res = Pipeline(cfg, qb, tb).search()
    pw = render_pairwise(res, qb, tb, cfg.matrix)
    with open(f"{TD}/diamond-test-blastp-pairwise-format.out") as f:
        assert pw == f.read()
    paf = render_paf(res, qb, tb, cfg.matrix)
    with open(f"{TD}/diamond-test-blastp-paf-format.out") as f:
        assert paf == f.read()


@pytest.mark.slow
def test_blastp_k3_top10_blosum50_golden():
    assert run_blastp(f"{TD}/data.faa", f"{TD}/data.faa", max_target_seqs=3) == \
        golden("diamond-test-blastp-target-seqs.out")
    assert run_blastp(f"{TD}/data.faa", f"{TD}/data.faa", toppercent=10.0) == \
        golden("diamond-test-blastp-top.out")
    assert run_blastp(f"{TD}/data.faa", f"{TD}/data.faa", matrix="BLOSUM50") == \
        golden("diamond-test-blastp-blosum50.out")


@pytest.mark.slow
def test_blastp_mid_sens_golden():
    assert run_blastp(f"{TD}/3.faa", f"{TD}/4.faa", sensitivity="mid-sensitive") == \
        golden("blastp-mid-sens.out")


@pytest.mark.slow
def test_blastp_more_sensitive_golden():
    """diamond-test-blastp-more-sensitive (16 shapes, banded-slow, gapped
    filter), byte-identical including the mismatch/gapopen columns from
    the reversed BackwardCell stats pass (reference
    swipe_wrapper.cpp:364-430).

    The query-indexed (--algo 1) and target-parallel goldens are
    byte-identical files to this golden in the reference tree, so this test
    covers those configurations' output contract as well."""
    lines = run_blastp(f"{TD}/data.faa", f"{TD}/data.faa",
                       sensitivity="more-sensitive", index_chunks=1)
    assert lines == golden("diamond-test-blastp-more-sensitive.out")


@pytest.mark.slow
def test_view_daa_golden():
    """view: render test.daa as tabular (reference view.out)."""
    from diamond_tpu.data.daa import view_daa

    assert view_daa(f"{TD}/test.daa") == golden("view.out")
