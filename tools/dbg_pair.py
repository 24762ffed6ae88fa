"""Debug: trace one (query,target) pair through the pipeline stages."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _ROOT)

import numpy as np

from diamond_tpu.data.block import Block
from diamond_tpu.data.fasta import read_fasta
from diamond_tpu.search.config import SearchConfig
from diamond_tpu.search.pipeline import Pipeline
from diamond_tpu.stats.score_matrix import ScoreMatrix

TD = "/root/reference/src/test"
QNAME, TNAME = sys.argv[1], sys.argv[2]
SENS = sys.argv[3] if len(sys.argv) > 3 else "more-sensitive"

recs = list(read_fasta(f"{TD}/data.faa"))
qb = Block.from_sequences([r[1].upper() for r in recs], [r[0] for r in recs])
tb = Block.from_sequences([r[1].upper() for r in recs], [r[0] for r in recs])
qid = qb.ids.index(QNAME)
tid = tb.ids.index(TNAME)
print("qid", qid, "tid", tid)

cfg = SearchConfig(matrix=ScoreMatrix("BLOSUM62"), sensitivity=SENS,
                   index_chunks=1)
pipe = Pipeline(cfg, qb, tb)

# monkeypatch _stage12 to trace
orig = pipe._stage12
trace = []

def patched(join, shape, sid, chunk, lo, hi):
    out = orig(join, shape, sid, chunk, lo, hi)
    for (q, sgpos, soff, score) in out:
        t, j = tb.global_to_local(np.array([sgpos]))
        if q == qid and int(t[0]) == tid:
            trace.append((sid, soff, int(j[0]), score))
    return out

pipe._stage12 = patched
res = pipe.search()
print(f"seed hits surviving stage1/2+leftmost for pair: {len(trace)}")
for t in trace[:20]:
    print("  shape %d qoff %d j %d score %d" % t)
ms = res.get(qid, [])
print("final matches for query:", [(tb.ids[m.target_block_id],
                                    m.hsp[0].score if m.hsp else None)
                                   for m in ms])
