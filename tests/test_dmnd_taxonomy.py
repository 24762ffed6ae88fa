"""DMND format + taxonomy block tests (reference legacy/dmnd/, data/taxon_list)."""
import os
import shutil

import numpy as np
import pytest

from diamond_tpu.data.dmnd import read_dmnd, write_dmnd

TD = "/root/reference/src/test"
REF_BIN = "/tmp/dbuild/diamond"


def _fasta_records(path):
    from diamond_tpu.data.fasta import read_fasta

    return [(i, s.decode()) for i, s in read_fasta(path)]


def test_makedb_roundtrip(tmp_path):
    out = str(tmp_path / "db.dmnd")
    write_dmnd(out, _fasta_records(f"{TD}/data.faa"))
    ids, seqs = read_dmnd(out)
    recs = _fasta_records(f"{TD}/data.faa")
    assert ids == [r[0] for r in recs]
    assert len(seqs) == len(recs)
    assert len(seqs[0]) == len(recs[0][1])


@pytest.mark.skipif(not os.path.exists(REF_BIN),
                    reason="reference binary not built")
def test_makedb_byte_identical_to_reference(tmp_path):
    ref = str(tmp_path / "ref")
    ours = str(tmp_path / "ours.dmnd")
    os.system(f"{REF_BIN} makedb --in {TD}/data.faa -d {ref} --quiet")
    write_dmnd(ours, _fasta_records(f"{TD}/data.faa"))
    assert open(ref + ".dmnd", "rb").read() == open(ours, "rb").read()


@pytest.mark.skipif(not os.path.exists(REF_BIN),
                    reason="reference binary not built")
def test_makedb_taxonomy_byte_identical_to_reference(tmp_path):
    ref = str(tmp_path / "ref")
    ours = str(tmp_path / "ours.dmnd")
    taxargs = (f"--taxonmap {TD}/acc2taxid.tsv --taxonnodes {TD}/mini_nodes.dmp "
               f"--taxonnames {TD}/mini_names.dmp")
    os.system(f"{REF_BIN} makedb --in {TD}/1.faa -d {ref} {taxargs} --quiet "
              f"2>/dev/null")
    write_dmnd(ours, _fasta_records(f"{TD}/1.faa"),
               taxonmap=f"{TD}/acc2taxid.tsv",
               taxonnodes=f"{TD}/mini_nodes.dmp",
               taxonnames=f"{TD}/mini_names.dmp")
    assert open(ref + ".dmnd", "rb").read() == open(ours, "rb").read()


def test_taxonomy_fields_roundtrip(tmp_path):
    out = str(tmp_path / "db.dmnd")
    write_dmnd(out, _fasta_records(f"{TD}/1.faa"),
               taxonmap=f"{TD}/acc2taxid.tsv",
               taxonnodes=f"{TD}/mini_nodes.dmp",
               taxonnames=f"{TD}/mini_names.dmp")
    ids, seqs, tax = read_dmnd(out, with_taxonomy=True)
    assert tax.taxids(0) == [10090, 10091]
    assert tax.scientific_name(10090) == "Mus musculus"
    # kingdom walk: Mus musculus -> Metazoa (kingdom rank)
    from diamond_tpu.data.taxonomy import RANK_KINGDOM

    ks = tax.rank_taxids([10090], RANK_KINGDOM)
    assert tax.print_names(ks) == "Metazoa"
    # LCA of mouse and an unrelated taxid resolves through the nodes
    assert tax.nodes.get_lca(10090, 10090) == 10090


def test_varint_roundtrip():
    from diamond_tpu.data.taxonomy import read_varuint32, write_varuint32

    for x in [0, 1, 127, 128, 16383, 16384, 2097151, 2097152, 268435455,
              268435456, 4294967295]:
        buf = bytearray()
        write_varuint32(x, buf)
        v, pos = read_varuint32(bytes(buf), 0)
        assert v == x and pos == len(buf), x
