"""Capture the real extension DP job streams (score + traceback) from an
nr_10k self-search into .npz files, for isolated native-engine replay
timing (tools/replay_dp_jobs.py).  Dev tool; not part of the package.

Usage: python tools/capture_dp_jobs.py [n_queries] [outdir]
"""
import sys
import time

import numpy as np

from diamond_tpu import native

OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dpjobs"
NQ = int(sys.argv[1]) if len(sys.argv) > 1 else 10000

calls = {"score": [], "tb": []}

_score0 = native.banded_swipe_score_multi_native
_tb0 = native.banded_swipe_tb_multi_native


def _cap(kind, args):
    (q_base, bias_base, q_off, q_len, use_bias, t_cat, t_off, t_len,
     d_begins, bands, matrix32, go, ge) = args
    calls[kind].append(dict(
        q_base=q_base.copy(), bias_base=None if bias_base is None else bias_base.copy(),
        q_off=q_off.copy(), q_len=q_len.copy(), use_bias=use_bias.copy(),
        t_cat=np.asarray(t_cat).copy(), t_off=t_off.copy(),
        t_len=t_len.copy(), d_begins=d_begins.copy(), bands=bands.copy(),
        matrix32=matrix32.copy(), go=go, ge=ge))


def score_cap(*args):
    _cap("score", args)
    return _score0(*args)


def tb_cap(*args):
    _cap("tb", args)
    return _tb0(*args)


native.banded_swipe_score_multi_native = score_cap
native.banded_swipe_tb_multi_native = tb_cap

from diamond_tpu.data.blastdb import BlastDB
from diamond_tpu.data.block import Block
from diamond_tpu.search.config import SearchConfig
from diamond_tpu.search.pipeline import Pipeline
from diamond_tpu.stats.score_matrix import ScoreMatrix

ids, seqs = BlastDB(__import__("os").environ.get("CAPTURE_DB", "/root/reference/src/test/blast/nr_10k")).load()
tb = Block.from_sequences(seqs, ids)
qb = Block.from_sequences(seqs[:NQ], ids[:NQ])
cfg = SearchConfig(matrix=ScoreMatrix("BLOSUM62"), sensitivity="default")
t0 = time.perf_counter()
res = Pipeline(cfg, qb, tb).search()
print("search wall", time.perf_counter() - t0)

import os

os.makedirs(OUT, exist_ok=True)
for kind in ("score", "tb"):
    for i, c in enumerate(calls[kind]):
        meta = {k: v for k, v in c.items() if isinstance(v, np.ndarray)}
        np.savez(os.path.join(OUT, f"{kind}_{i}.npz"), go=c["go"],
                 ge=c["ge"], **meta)
    print(kind, len(calls[kind]), "calls",
          sum(len(c["t_off"]) for c in calls[kind]), "jobs")
