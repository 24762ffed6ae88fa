"""Exact ALP evaluer port vs the reference ALP library's output.

Ground truth: vectors minted by tools/alp_oracle.cpp, which builds
against /root/reference/src/lib/alp and runs initGapped with DIAMOND's
exact arguments (reference stats/score_matrix.cpp:184).  The port
(diamond_tpu/stats/alp_exact.py) reproduces the reference's RNG stream
and accuracy-driven control flow under the negligible-monotonic-clock
rule, and on this host tracks the oracle BIT-FOR-BIT (every parameter
identical at 17 digits on both committed vectors — verified round 5).

The assertions below use looser gates (1e-4 for lambda/K — the VERDICT
r04 contract — and 1e-3 for the FSC coefficients) so a 1-ulp libm
difference on another platform, which can flip one accuracy-loop
bound, fails loudly only if it moves a parameter beyond the contract.
"""
import os

import numpy as np
import pytest

VEC = os.path.join(os.path.dirname(__file__), "..", "tools", "alp_vectors")


def _load_vec(p):
    return {k: float(v) for k, v in
            (line.split() for line in open(p) if line.strip())}


@pytest.mark.slow
@pytest.mark.parametrize("name", ["blosum62", "custom1"])
def test_exact_evaluer_vs_alp_oracle(name):
    from diamond_tpu.stats.alp_exact import gapped_params_exact

    M = np.loadtxt(os.path.join(VEC, f"{name}.txt"), dtype=np.int64)
    bg = np.loadtxt(os.path.join(VEC, "bg.txt"))
    exp = _load_vec(os.path.join(VEC, f"expected_{name}_go11_ge1.txt"))
    out = gapped_params_exact(M, bg, None, 11, 1)

    def rel(a, b):
        return abs(a - b) / max(abs(b), 1e-300)

    # the byte contract for --custom-matrix e-values (VERDICT r04 #1)
    assert rel(out["lambda"], exp["lambda"]) < 1e-4
    assert rel(out["K"], exp["K"]) < 1e-4
    for k in ("C", "a_I", "a_J", "sigma", "alpha_I", "alpha_J", "a",
              "alpha", "gapless_a", "gapless_alpha", "b_I", "b_J",
              "beta_I", "beta_J", "tau"):
        assert rel(out[k], exp[k]) < 1e-3, (k, out[k], exp[k])


def test_exact_evaluer_rng_stream():
    """The Knuth additive generator matches the reference stream
    (first raw draws + uniform variates, minted from njn_random.cpp
    compiled on this host with seed 1)."""
    from diamond_tpu.stats.alp_exact import _Rand

    r = _Rand(1)
    assert [r.number() for _ in range(5)] == [
        73902710, 1005518751, 421776705, 756398104, 1668674573]
    v = [r.ran2() for _ in range(3)]
    assert v[0] == pytest.approx(0.43868380619151692, abs=0, rel=1e-15)
    assert v[1] == pytest.approx(0.11401660140325157, abs=0, rel=1e-15)


def test_gapless_a_alpha_vs_oracle():
    """Deterministic gapless a/alpha (LocalMaxStatMatrix port)."""
    from diamond_tpu.stats.alp_exact import gapless_a_alpha

    M = np.loadtxt(os.path.join(VEC, "blosum62.txt"), dtype=np.int64)
    bg = np.loadtxt(os.path.join(VEC, "bg.txt"))
    bgn = bg / bg.sum()
    a, alpha = gapless_a_alpha(M, list(bgn), list(bgn))
    assert a == pytest.approx(0.76221604082034389, rel=1e-12)
    assert alpha == pytest.approx(4.5270357589121266, rel=1e-12)


@pytest.mark.slow
def test_custom_matrix_cli_byte_identical():
    """blastp --custom-matrix end-to-end vs the reference binary's
    committed output (minted 2026-08-20 from /tmp/dbuild/diamond with
    the same 20x20 BLOSUM62-valued custom file): the exact evaluer
    makes custom-matrix e-values byte-identical."""
    import subprocess
    import sys

    from diamond_tpu.utils.device import cpu_subprocess_env

    gd = os.path.join(os.path.dirname(__file__), "goldens")
    r = subprocess.run(
        [sys.executable, "-m", "diamond_tpu.cli", "blastp",
         "-q", "/root/reference/src/test/1.faa",
         "-d", "/root/reference/src/test/2.faa",
         "--custom-matrix", f"{gd}/custom_blosum62_20x20.txt",
         "--gapopen", "11", "--gapextend", "1", "-f", "6"],
        capture_output=True, text=True, cwd="/root/repo",
        env=cpu_subprocess_env())
    assert r.returncode == 0, r.stderr
    assert r.stdout == ("NP_001001178.1\tNP_620158.3\t71.7\t527\t148\t1"
                        "\t2\t527\t65\t591\t7.98e-249\t692\n")
