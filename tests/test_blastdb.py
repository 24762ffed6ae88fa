"""NCBI BLAST database reader: volume parsing, defline decode, alias +
SEQIDLIST filters, end-to-end search parity.

Fixture: reference src/test/blast/ (v5 protein db, 10k sequences, plus a
filtered alias with a 13-entry seqidlist; reference CTest blastp_blastdb /
blastp_blastaliasdb-seqidlist).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from diamond_tpu.constants.alphabet import encode
from diamond_tpu.data.blastdb import BlastDB, is_blastdb
from diamond_tpu.data.fasta import read_fasta

from diamond_tpu.utils.device import cpu_subprocess_env

TD = "/root/reference/src/test"
GOLD = os.path.join(os.path.dirname(__file__), "goldens")


def test_volume_header():
    db = BlastDB(f"{TD}/blast/nr_10k")
    v = db.volumes[0]
    assert v.version == 5 and v.is_protein
    assert v.num_oids == 10000
    assert v.total_length == 3972572


def test_sequences_match_fasta():
    """Every nr_300.faa sequence decodes byte-identically from the psq."""
    db = BlastDB(f"{TD}/blast/nr_10k")
    ids, seqs = db.load()
    by_acc = {i.split()[0]: s for i, s in zip(ids, seqs)}
    n = 0
    for rid, s in read_fasta(f"{TD}/nr_300.faa"):
        d = by_acc[rid.split()[0]]
        e = encode(s.decode().upper())
        assert len(e) == len(d) and (e == d).all()
        n += 1
    assert n == 300


def test_alias_seqidlist_filter():
    """The filtered alias keeps exactly the NSEQ/LENGTH of its .pal."""
    db = BlastDB(f"{TD}/blast/nr_10k_filtered")
    assert db.seqidlist is not None and len(db.seqidlist) == 13
    ids, seqs = db.load()
    assert len(ids) == 13
    assert sum(len(s) for s in seqs) == 10331


def test_is_blastdb():
    assert is_blastdb(f"{TD}/blast/nr_10k")
    assert is_blastdb(f"{TD}/blast/nr_10k_filtered")
    assert not is_blastdb(f"{TD}/data")


@pytest.mark.slow
def test_blastdb_search_golden():
    """blastp of 4 filtered-db sequences against the seqidlist alias db —
    byte-identical to the reference binary's output on the same input."""
    from diamond_tpu.tools_cmds import decode

    db = BlastDB(f"{TD}/blast/nr_10k_filtered")
    ids, seqs = db.load()
    qpath = "/tmp/dtpu_filt4.faa"
    with open(qpath, "w") as f:
        for i, s in zip(ids[:4], seqs[:4]):
            f.write(f">{i}\n{decode(s)}\n")
    r = subprocess.run(
        [sys.executable, "-m", "diamond_tpu.cli", "blastp", "-q", qpath,
         "-d", f"{TD}/blast/nr_10k_filtered", "-c", "1", "-k", "0"],
        capture_output=True, text=True, cwd="/root/repo",
        env=cpu_subprocess_env())
    assert r.returncode == 0, r.stderr
    with open(os.path.join(GOLD, "blastdb-filtered4.out")) as f:
        assert r.stdout.splitlines() == f.read().splitlines()
