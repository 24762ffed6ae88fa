"""Markov clustering (--cluster-algo mcl; reference contrib/mcl)."""
import subprocess
import sys

import numpy as np


from diamond_tpu.utils.device import cpu_subprocess_env

def test_mcl_interpretation():
    from diamond_tpu.cluster.mcl import _clusters_from_matrix, _mcl_dense

    # symmetric 2-node system converges to a doubly-stochastic fixpoint;
    # the attractor-system interpretation must merge it into one cluster
    M = np.array([[100.0, 99.7], [99.7, 100.0]], dtype=np.float32)
    M /= M.sum(axis=0, keepdims=True)
    out = _mcl_dense(M, 2, 2.0, 100, use_jax=False)
    a = _clusters_from_matrix(out)
    assert a[0] == a[1]


def test_mcl_cluster_graph():
    from diamond_tpu.cluster.mcl import mcl_cluster

    # two triangles + a bridge of weak weight; MCL splits at the bridge
    edges = []
    for grp in ([0, 1, 2], [3, 4, 5]):
        for i in grp:
            edges.append((i, i, 100.0))
            for j in grp:
                if i < j:
                    edges.append((i, j, 90.0))
                    edges.append((j, i, 90.0))
    edges.append((2, 3, 1.0))
    a = mcl_cluster(6, edges)
    assert a[0] == a[1] == a[2]
    assert a[3] == a[4] == a[5]
    assert a[0] != a[3]


def test_mcl_end_to_end(tmp_path):
    fa = tmp_path / "in.faa"
    seq_a = ("MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQAPILSRVGDGTQDNLSGAEKAVQVKVK"
             "ALPDAQFEVVHSLAKWKRQTLGQHDFSAGEGLYTHMKALRPDEDRLSPLHSVYVDQWDWE")
    seq_b = ("GSHMGSGAFGTVYKGLWIPEGEKVKIPVAIKELREATSPKANKEILDEAYVMASVDNPHV"
             "CRLLGICLTSTVQLITQLMPFGCLLDYVREHKDNIGSQYLLNWCVQIAKGMNYLEDRRLV")
    fa.write_text(f">a1\n{seq_a}\n>a2\n{seq_a}\n"
                  f">a3\n{seq_a[:32]}K{seq_a[33:]}\n"
                  f">b1\n{seq_b}\n>b2\n{seq_b}\n")
    r = subprocess.run(
        [sys.executable, "-m", "diamond_tpu.cli", "cluster", "-d", str(fa),
         "--cluster-algo", "mcl"],
        capture_output=True, text=True, cwd="/root/repo",
        env=cpu_subprocess_env())
    assert r.returncode == 0, r.stderr
    rep = {}
    for line in r.stdout.splitlines():
        c, m = line.split("\t")
        rep[m] = c
    assert rep["a1"] == rep["a2"] == rep["a3"]
    assert rep["b1"] == rep["b2"]
    assert rep["a1"] != rep["b1"]
