"""Accuracy of the island-method ALP replacement against the reference
ALP library's exact output (vectors minted by tools/alp_oracle.cpp, which
builds against /root/reference/src/lib/alp and runs initGapped with
DIAMOND's exact arguments, reference stats/score_matrix.cpp:184).

The island method is an approximation: these tests pin its CURRENT
measured accuracy so regressions are caught, and the committed vectors
are the ground truth for the exact evaluer port (the remaining non-byte
stats path, VERDICT r03 item 7)."""
import os

import numpy as np
import pytest

VEC = os.path.join(os.path.dirname(__file__), "..", "tools", "alp_vectors")


def _load_vec(p):
    return {k: float(v) for k, v in
            (line.split() for line in open(p) if line.strip())}


@pytest.mark.slow
@pytest.mark.parametrize("name,lam_tol,k_tol", [
    ("blosum62", 0.04, 0.40),
    ("custom1", 0.06, 0.50),
])
def test_island_method_accuracy_vs_alp_oracle(name, lam_tol, k_tol):
    from diamond_tpu.stats.alp import gapped_params

    M = np.loadtxt(os.path.join(VEC, f"{name}.txt"), dtype=np.int64)
    bg = np.loadtxt(os.path.join(VEC, "bg.txt"))
    exp = _load_vec(os.path.join(VEC, f"expected_{name}_go11_ge1.txt"))
    p = gapped_params(M, bg, 11, 1)
    assert abs(p.lam - exp["lambda"]) / exp["lambda"] < lam_tol
    assert abs(p.K - exp["K"]) / exp["K"] < k_tol
    # FSC linear coefficients must at least have the right sign/scale
    assert exp["a_I"] > 0 and exp["alpha_I"] > 0
