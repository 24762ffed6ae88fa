"""Generate a large protein DB by point-mutating nr_10k R times.

Deterministic (seeded per replica); writes FASTA. 100 replicas of the
4.4M-letter nr_10k fixture give a ~440M-letter DB (~550 MB FASTA) for
the out-of-core scale demonstration (VERDICT r03 item 3) and DP-heavy
device benchmarks.

Usage: python tools/make_bigdb.py OUT.faa [replicas=100] [mut_rate=0.05]
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from diamond_tpu.constants.alphabet import decode  # noqa: E402
from diamond_tpu.data.blastdb import BlastDB  # noqa: E402


def main():
    out = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    rate = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
    ids, seqs = BlastDB("/root/reference/src/test/blast/nr_10k").load()
    with open(out, "w") as f:
        for rep in range(reps):
            rng = np.random.default_rng(1000 + rep)
            for i, s in zip(ids, seqs):
                s = np.asarray(s, dtype=np.int8) & 31
                if rep > 0:
                    m = rng.random(len(s)) < rate
                    s = np.where(m, rng.integers(0, 20, len(s),
                                                 dtype=np.int8), s)
                t = decode(s.astype(np.int8))
                f.write(f">{i}_r{rep}\n")
                for j in range(0, len(t), 60):
                    f.write(t[j : j + 60] + "\n")
            print(f"replica {rep + 1}/{reps}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
