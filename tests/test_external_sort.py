"""External merge sort (reference util/algo/external_sort.h role): the
bounded-memory spill/merge path must produce exactly np.sort's order at
>=10x the memory cap, and the GVC edge-table consumer must be
byte-identical whether edges arrive as a list or through spill runs."""
import numpy as np

from diamond_tpu.utils.external_sort import EDGE_DTYPE, ExternalSorter


def test_external_sort_10x_cap(tmp_path):
    rng = np.random.default_rng(7)
    n = 1_500_000  # 36 MB of records vs a 2 MB cap = 18x
    recs = np.empty(n, dtype=EDGE_DTYPE)
    recs["n1"] = rng.integers(0, 4000, n)
    recs["n2"] = rng.integers(0, 4000, n)
    recs["w"] = rng.random(n) * 100
    xs = ExternalSorter(EDGE_DTYPE, mem_cap_bytes=2 << 20,
                        tmpdir=str(tmp_path))
    for lo in range(0, n, 41231):
        xs.push(recs[lo : lo + 41231])
    assert xs.spilled_runs >= 10
    out = np.concatenate(list(xs.sorted_chunks()))
    assert np.array_equal(out, np.sort(recs, kind="stable"))


def test_edge_graph_spilled_equals_list(tmp_path):
    from diamond_tpu.cluster.gvc import EdgeGraph, greedy_vertex_cover

    rng = np.random.default_rng(3)
    n_nodes = 300
    edges = [(int(a), int(b), float(w))
             for a, b, w in zip(rng.integers(0, n_nodes, 5000),
                                rng.integers(0, n_nodes, 5000),
                                rng.integers(50, 500, 5000))]
    g1 = EdgeGraph(n_nodes, list(edges))
    xs = ExternalSorter(EDGE_DTYPE, mem_cap_bytes=1024,
                        tmpdir=str(tmp_path))
    for lo in range(0, len(edges), 700):
        xs.push(np.array(edges[lo : lo + 700], dtype=EDGE_DTYPE))
    assert xs.spilled_runs >= 5
    g2 = EdgeGraph(n_nodes, xs)
    assert g1.nbr == g2.nbr
    assert g1.wt == g2.wt
    c1 = greedy_vertex_cover(g1)
    c2 = greedy_vertex_cover(g2)
    assert np.array_equal(c1, c2)
