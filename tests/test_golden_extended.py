"""Extended golden matrix — every data.faa sensitivity/CBS configuration.

Each case is a full data.faa self-search (~15 s on CPU after the round-2
native hot paths; was ~8-10 min).  Runs in the DEFAULT suite so
ultra-sensitive/CBS parity cannot rot silently; set
SKIP_EXTENDED_GOLDENS=1 to opt out on very slow windows.

Every configuration below is byte-identical to the reference golden
(the round-1 2-line BackwardCell tie delta was fixed by
native/src/backward_stats.cc in round 2; these asserts are exact so any
regression fails loudly).
"""
import os

import pytest

from test_golden_e2e import TD, golden, run_blastp

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(bool(os.environ.get("SKIP_EXTENDED_GOLDENS")),
                       reason="SKIP_EXTENDED_GOLDENS=1"),
]

CASES = [
    ("diamond-test-blastp-very-sensitive.out", dict(sensitivity="very-sensitive", index_chunks=1)),
    ("diamond-test-blastp-ultra-sensitive.out", dict(sensitivity="ultra-sensitive", index_chunks=1)),
    ("diamond-test-blastp-evalue.out", dict(sensitivity="more-sensitive", index_chunks=1, max_evalue=10000.0)),
    ("diamond-test-blastp-comp-based-stats-0.out", dict(sensitivity="more-sensitive", index_chunks=1, comp_based_stats=0)),
    ("diamond-test-blastp-comp-based-stats-2.out", dict(sensitivity="more-sensitive", index_chunks=1, comp_based_stats=2)),
    ("diamond-test-blastp-comp-based-stats-3.out", dict(sensitivity="more-sensitive", index_chunks=1, comp_based_stats=3)),
    ("diamond-test-blastp-comp-based-stats-4.out", dict(sensitivity="more-sensitive", index_chunks=1, comp_based_stats=4)),
]


@pytest.mark.parametrize("name,kw", CASES, ids=[c[0] for c in CASES])
def test_extended_golden(name, kw):
    lines = run_blastp(f"{TD}/data.faa", f"{TD}/data.faa", **kw)
    assert lines == golden(name)


def test_seg_masking():
    """--masking seg: NCBI SEG on the target block only (reference
    run/config.cpp:128-129, lib/blast/blast_seg.cpp); byte-identical to
    the reference binary on the data.faa self-search."""
    import io
    from contextlib import redirect_stdout

    from diamond_tpu.cli import main

    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["blastp", "-q", f"{TD}/data.faa", "-d", f"{TD}/data.faa",
              "--masking", "seg"])
    lines = buf.getvalue().splitlines()
    with open(os.path.join(os.path.dirname(__file__), "goldens",
                           "seg-masking-data.out")) as f:
        assert lines == f.read().splitlines()
