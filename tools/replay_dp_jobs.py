"""Replay captured DP job streams through the native engines and time
them in isolation.  Usage: python tools/replay_dp_jobs.py [dir] [reps]"""
import glob
import sys
import time

import numpy as np

from diamond_tpu import native

D = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dpjobs"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def load(kind):
    out = []
    for f in sorted(glob.glob(f"{D}/{kind}_*.npz")):
        z = np.load(f, allow_pickle=False)
        c = {k: z[k] for k in z.files}
        c["go"] = int(c["go"])
        c["ge"] = int(c["ge"])
        if "bias_base" not in c:
            c["bias_base"] = None
        out.append(c)
    return out


def cells(c):
    j0 = np.maximum(0, -c["d_begins"] - c["bands"] + 1)
    j1 = np.minimum(c["t_len"], c["q_len"] - c["d_begins"])
    return int((np.maximum(j1 - j0, 0) * c["bands"]).sum())


def run(kind, fn):
    cs = load(kind)
    if not cs:
        print(kind, "none")
        return
    tot_cells = sum(cells(c) for c in cs)
    tot_jobs = sum(len(c["t_off"]) for c in cs)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        for c in cs:
            fn(c["q_base"], c["bias_base"], c["q_off"], c["q_len"],
               c["use_bias"], c["t_cat"], c["t_off"], c["t_len"],
               c["d_begins"], c["bands"], c["matrix32"], c["go"], c["ge"])
        best = min(best, time.perf_counter() - t0)
    print(f"{kind}: {best:.3f}s {tot_jobs} jobs {tot_cells/1e9:.3f} Gcells "
          f"-> {tot_cells/best/1e9:.3f} GCUPS")


if __name__ == "__main__":
    run("score", native.banded_swipe_score_multi_native)
    run("tb", native.banded_swipe_tb_multi_native)
