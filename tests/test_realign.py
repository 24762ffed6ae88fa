"""realign golden test (reference cluster/realign.cpp).

Golden minted with the reference binary:
  diamond realign -d data.faa -p1 --clusters <linclust output>
Verified byte-exact 2026-08-16 (389/389 lines incl. fma-exact
approx_pident)."""
import os

import pytest

TD = "/root/reference/src/test"
GD = os.path.join(os.path.dirname(__file__), "goldens")


def test_approx_id_fma():
    from diamond_tpu.cluster.realign import approx_id

    assert approx_id(0, 0, 0) == 100.0
    assert approx_id(10 ** 6, 100, 100) == 100.0  # clamped
    assert approx_id(0, 100, 50) == 11.41


@pytest.mark.slow
def test_realign_golden():
    from diamond_tpu.cluster.realign import realign
    from diamond_tpu.data.fasta import read_fasta

    recs = list(read_fasta(f"{TD}/data.faa"))
    lines = realign([r[1].upper() for r in recs], [r[0] for r in recs],
                    open(f"{GD}/linclust-data.out").read().splitlines())
    assert lines == open(f"{GD}/realign-data.out").read().splitlines()
