"""DAA archive writer/merger tests (reference legacy/daa/)."""
import numpy as np

from diamond_tpu.data.daa import DaaReader, merge_daa, view_daa, write_daa

TD = "/root/reference/src/test"


def test_merge_daa_roundtrip_byte_identical(tmp_path):
    """Re-packing the reference's test.daa reproduces it byte for byte."""
    out = str(tmp_path / "rt.daa")
    merge_daa([f"{TD}/test.daa"], out)
    assert open(out, "rb").read() == open(f"{TD}/test.daa", "rb").read()


def test_write_daa_view_consistency(tmp_path):
    """A written archive views back to the same tabular lines the search
    produced directly."""
    from diamond_tpu.data.block import Block
    from diamond_tpu.data.fasta import read_fasta
    from diamond_tpu.output.tabular import format_results
    from diamond_tpu.search.config import SearchConfig
    from diamond_tpu.search.pipeline import Pipeline
    from diamond_tpu.stats.score_matrix import ScoreMatrix

    recs = list(read_fasta(f"{TD}/1.faa"))
    qb = Block.from_sequences([r[1].upper() for r in recs], [r[0] for r in recs])
    recs = list(read_fasta(f"{TD}/2.faa"))
    tb = Block.from_sequences([r[1].upper() for r in recs], [r[0] for r in recs])
    cfg = SearchConfig(matrix=ScoreMatrix("BLOSUM62"))
    res = Pipeline(cfg, qb, tb).search()
    direct = list(format_results(res, qb, tb))
    assert direct

    out = str(tmp_path / "out.daa")
    write_daa(out, res, qb, tb, cfg.matrix, cfg.max_evalue)
    r = DaaReader(out)
    assert r.h.query_records == len(res)
    assert view_daa(out) == direct
