"""Per-HSP output filters (--id/--query-cover/--subject-cover/
--no-self-hits/--dbsize) and blastx --strand.

Reference: align/culling.cpp:155-199 filter_hsp/apply_filters,
double_indexed.cpp:900 (--dbsize override).  Goldens minted from the
reference binary.
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


@pytest.mark.slow
def test_strand_plus():
    lines = run_cli(["blastx", "--db", f"{TD}/galaxy/db.dmnd",
                     "--query", f"{TD}/galaxy/nucleotide.fasta",
                     "--min-orf", "1", "--strand", "plus"])
    assert lines == golden("blastx-strand-plus.out")


CASES = [
    ("filter-id40.out", ["--id", "40", "-k", "0"]),
    ("filter-qcover90.out", ["--query-cover", "90", "-k", "0"]),
    ("filter-noselfhits.out", ["--no-self-hits"]),
    ("filter-dbsize.out", ["--dbsize", "1000000000"]),
]


@slow_extended
@pytest.mark.parametrize("gold,flags", CASES, ids=[c[0] for c in CASES])
def test_filters(gold, flags):
    lines = run_cli(["blastp", "-q", f"{TD}/data.faa", "-d", f"{TD}/data.faa",
                     "-c", "1"] + flags)
    assert lines == golden(gold)


@pytest.mark.slow
def test_ext_none_seed_only():
    """--ext none reports raw seed positions (reference extend.cpp:137-166).
    Within-query order is nondeterministic in the reference (Search::Hit
    sorts by query only, ips4o unstable), so the contract is the hit SET."""
    lines = run_cli(["blastp", "-q", f"{TD}/1.faa", "-d", f"{TD}/2.faa",
                     "--ext", "none", "--max-hsps", "0"])
    assert sorted(lines) == sorted(golden("ext-none-1v2.out"))


@slow_extended
def test_freq_masking():
    """--freq-masking replaces the reduced complexity mask with the
    frequency cap (reference stage0.cpp:168-173, frequent_seeds.cpp) and
    disables motif masking (setup.cpp:323-324); the enumeration-level
    unreduced complexity cut stays active."""
    lines = run_cli(["blastp", "-q", f"{TD}/data.faa", "-d", f"{TD}/data.faa",
                     "--freq-masking", "-c", "1"])
    assert lines == golden("freq-masking-data.out")


def test_greedy_vertex_cover_tool(tmp_path):
    """Standalone greedy-vertex-cover (reference tools/
    greedy_vertex_cover.cpp); output matches the reference binary on the
    same quintuplet edge file."""
    m = tmp_path / "map.txt"
    e = tmp_path / "edges.tsv"
    m.write_text("a\nb\nc\nd\n")
    e.write_text("a\tb\t90\t95\t50\nb\tc\t95\t20\t40\nc\td\t90\t90\t30\n")
    lines = run_cli(["greedy-vertex-cover", "-d", str(m),
                     "--edges", str(e)])
    assert lines == ["a\ta", "a\tb", "c\tc", "c\td"]


@slow_extended
def test_approx_id_filter():
    """--approx-id filters HSPs by the score-derived identity estimate
    (reference culling.cpp:160-161, stats.cpp:113-118) AND raises the
    stage-1 Hamming cutoff (setup.cpp:70-78,343: >=50 -> 20, >=90 -> 30);
    the final traceback picks the per-target best HSP BEFORE the filter
    runs (gapped_final.cpp:146 inner_culling, then apply_filters) — no
    band fallback.  Byte-identical to the reference binary."""
    lines = run_cli(["blastp", "-q", f"{TD}/data.faa", "-d", f"{TD}/data.faa",
                     "--approx-id", "50", "-k", "0", "-c", "1"])
    assert lines == golden("approx-id50-data.out")


@pytest.mark.slow
def test_shape_mask():
    """--shape-mask custom seed shapes (reference setup.cpp:362)."""
    lines = run_cli(["blastp", "-q", f"{TD}/3.faa", "-d", f"{TD}/4.faa",
                     "--shape-mask", "1110101101", "1011010111",
                     "-e", "1000"])
    assert lines == golden("shape-mask-3v4.out")


@pytest.mark.slow
def test_minimizer_window():
    """--minimizer-window protein seeding (reference MinimizerIterator,
    seed_iterator.h:52-110; the reference only wires it for blastn, so the
    contract is functional: subsampled seeding still finds the alignment)."""
    lines = run_cli(["blastp", "-q", f"{TD}/1.faa", "-d", f"{TD}/2.faa",
                     "--minimizer-window", "5"])
    assert lines and lines[0].startswith("NP_001001178.1\tNP_620158.3")


def test_minimizer_select_dedup():
    import numpy as np

    from diamond_tpu.search.stages import minimizer_select

    keys = np.arange(20, dtype=np.uint64)
    valid = np.ones(20, dtype=bool)
    sel = minimizer_select(keys, valid, 5)
    assert len(sel) > 0
    # consecutive windows sharing a min collapse: strictly fewer than windows
    assert len(sel) <= 16
    assert np.all(np.diff(sel) > 0)


def test_parallel_extension_identical(tmp_path):
    """-p N forks per-query extension workers; output must be byte-identical
    to single-threaded (reference ReorderQueue determinism contract)."""
    from diamond_tpu.data.fasta import read_fasta

    sub = tmp_path / "sub.faa"
    recs = list(read_fasta(f"{TD}/data.faa"))[:10]
    with open(sub, "wb") as f:
        for h, s in recs:
            if isinstance(h, str):
                h = h.encode()
            f.write(b">" + h + b"\n" + s + b"\n")
    outs = []
    for p in ("1", "3"):
        out = tmp_path / f"p{p}.out"
        subprocess.run(
            [sys.executable, "-m", "diamond_tpu.cli", "blastp",
             "-q", str(sub), "-d", str(sub), "-p", p, "-o", str(out)],
            check=True, cwd="/root/repo", capture_output=True,
            env=cpu_subprocess_env())
        outs.append(out.read_bytes())
    assert outs[0] == outs[1]


@pytest.mark.slow
def test_parallel_seeding_and_extension_golden(tmp_path):
    """-p 3 forks BOTH the seed-partition stage-1/2 slices (reference
    stage0.cpp:158-197) and the per-query extension workers; the full
    data.faa self-search stays byte-identical to the single-threaded
    golden."""
    outs = []
    for p in ("1", "3"):
        out = tmp_path / f"pp{p}.out"
        subprocess.run(
            [sys.executable, "-m", "diamond_tpu.cli", "blastp",
             "-q", f"{TD}/data.faa", "-d", f"{TD}/data.faa", "-p", p,
             "-c", "1", "-o", str(out)],
            check=True, cwd="/root/repo", capture_output=True,
            env=cpu_subprocess_env())
        outs.append(out.read_text())
    assert outs[0] == outs[1]
    assert len(outs[0].splitlines()) > 700
