"""linclust golden test.

Golden minted with the reference binary:
  diamond linclust -d data.faa -p4 --approx-id 0

Verified 2026-08-16: 387/389 lines byte-exact; rounds 0 and 1 produce
IDENTICAL representative sets (382 and 362 reps).  One 2-member cluster
(d3l6ea1/d3guya1) picks the other member as representative — a round-2
seed-hit difference under investigation.
"""
import os

import numpy as np
import pytest

from diamond_tpu.cluster.linclust import (exact_seed_keys,
                                          greedy_vertex_cover_edges, murmur64,
                                          sketch_select)
from diamond_tpu.utils.device import cpu_subprocess_env

TD = "/root/reference/src/test"
GD = os.path.join(os.path.dirname(__file__), "goldens")


def test_gvc_semantics():
    """Reference GVC: max-degree first, larger node on ties, weight-based
    reassignment, recursive centroid merge."""
    # star: node 2 covers 0,1,3 (degree 3); node 0-1 mutual
    edges = [(2, 0, 5.0), (2, 1, 5.0), (2, 3, 5.0), (0, 1, 9.0), (1, 0, 9.0)]
    cl = greedy_vertex_cover_edges(5, edges)
    assert cl[2] == 2 and cl[0] == 2 and cl[1] == 2 and cl[3] == 2
    assert cl[4] == 4  # singleton
    # tie on degree -> larger node id becomes the representative
    edges = [(0, 1, 1.0), (1, 0, 1.0)]
    cl = greedy_vertex_cover_edges(2, edges)
    assert cl[1] == 1 and cl[0] == 1


def test_exact_seed_keys_match_digit_multiset():
    """The even/odd packing permutes digit positions but preserves the
    sampled letters (reference shape.h:114-152)."""
    from diamond_tpu.seed.shapes import Shape

    rng = np.random.default_rng(0)
    sh = Shape("111111111111")
    red = rng.integers(0, 10, 50).astype(np.int8)
    keys, valid = exact_seed_keys(red, sh, 10)
    assert valid.all()
    for p in range(3):
        digits = sorted(int(c) for c in str(int(keys[p])).zfill(12))
        expect = sorted(int(x) for x in red[p:p + 12])
        assert digits == expect


@pytest.mark.slow
def test_linclust_golden():
    from diamond_tpu.cluster.linclust import linclust
    from diamond_tpu.data.fasta import read_fasta

    recs = list(read_fasta(f"{TD}/data.faa"))
    pairs = linclust([r[1].upper() for r in recs], [r[0] for r in recs],
                     approx_id=0.0)
    lines = [f"{a}\t{b}" for a, b in pairs]
    gold = open(f"{GD}/linclust-data.out").read().splitlines()
    assert lines == gold


def test_linclust_reps_output(tmp_path):
    """linclust_reps (reference src/test/linclust_reps.cmake): --reps FASTA
    with exactly the representatives, id-only headers; --cluster-steps
    override."""
    import subprocess
    import sys

    clusters = tmp_path / "clusters.tsv"
    reps = tmp_path / "reps.faa"
    r = subprocess.run(
        [sys.executable, "-m", "diamond_tpu.cli", "linclust",
         "-d", "/root/reference/src/test/1.faa", "--approx-id", "0",
         "--cluster-steps", "faster_lin", "-o", str(clusters),
         "--reps", str(reps)],
        capture_output=True, text=True, cwd="/root/repo",
        env=cpu_subprocess_env())
    assert r.returncode == 0, r.stderr
    headers = [l for l in reps.read_text().splitlines() if l.startswith(">")]
    assert headers == [">NP_001001178.1"]
    self_lines = [l for l in clusters.read_text().splitlines()
                  if l.split("\t")[0] == l.split("\t")[1]]
    assert len(self_lines) == len(headers)


@pytest.mark.slow
def test_linclust_kmer_ranking_golden():
    """--kmer-ranking: linearized-stage pivots ranked by accumulated
    sqrt(seed-group size) instead of length (reference
    kmer_ranking.cpp:40-66, --kmer-ranking).  Golden minted from the
    reference binary; byte-identical including the float32 accumulation
    order."""
    from diamond_tpu.cluster.linclust import linclust
    from diamond_tpu.data.fasta import read_fasta

    recs = list(read_fasta(f"{TD}/data.faa"))
    pairs = linclust([r[1].upper() for r in recs], [r[0] for r in recs],
                     approx_id=0.0, kmer_ranking=True)
    lines = [f"{a}\t{b}" for a, b in pairs]
    gold = open(f"{GD}/linclust-kmer-ranking-data.out").read().splitlines()
    assert lines == gold
