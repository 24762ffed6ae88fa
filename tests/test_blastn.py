"""blastn (reference contrib/dna; functional contract — the reference
ships WITH_DNA off, so there is no golden output)."""
import subprocess
import sys

import numpy as np


def run_cli(args):
    r = subprocess.run([sys.executable, "-m", "diamond_tpu.cli"] + args,
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    return r.stdout.splitlines()


def test_minimizers_deterministic():
    from diamond_tpu.search.blastn import encode_dna, minimizers

    d = encode_dna("ACGTACGTGGCCTTAAGGCCTTACGTACGTAAACCCGGGTTT")
    p1, c1 = minimizers(d)
    p2, c2 = minimizers(d)
    assert np.array_equal(p1, p2) and np.array_equal(c1, c2)
    assert len(p1) > 0


def test_chain_anchors():
    from diamond_tpu.search.blastn import chain_anchors

    # colinear anchors chain together; an off-diagonal outlier doesn't
    anchors = [(10, 110), (30, 130), (55, 155), (400, 90)]
    chains = chain_anchors(anchors, k=15)
    assert chains
    top = chains[0][0]
    assert (10, 110) in top and (55, 155) in top
    assert (400, 90) not in top


def test_blastn_end_to_end(tmp_path):
    rng = np.random.default_rng(3)
    bases = "ACGT"
    core = "".join(rng.choice(list(bases), 120))
    target = ("".join(rng.choice(list(bases), 40)) + core
              + "".join(rng.choice(list(bases), 40)))
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc = "".join(comp[c] for c in reversed(core))
    q = tmp_path / "q.fa"
    t = tmp_path / "t.fa"
    q.write_text(f">plus\n{core}\n>minus\n{rc}\n")
    t.write_text(f">t1\n{target}\n")
    lines = run_cli(["blastn", "-q", str(q), "-d", str(t)])
    by_q = {l.split("\t")[0]: l.split("\t") for l in lines}
    assert by_q["plus"][2] == "100"
    assert int(by_q["plus"][8]) == 41 and int(by_q["plus"][9]) == 160
    # minus strand: subject coordinates reversed
    assert by_q["minus"][2] == "100"
    assert int(by_q["minus"][8]) == 160 and int(by_q["minus"][9]) == 41
