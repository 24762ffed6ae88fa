"""Debug: per-stage survival counts of seed hits for one (query,target) pair."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _ROOT)

import numpy as np

from diamond_tpu.data.block import Block
from diamond_tpu.data.fasta import read_fasta
from diamond_tpu.search import stages
from diamond_tpu.search.config import SearchConfig
from diamond_tpu.search.left_most_batch import left_most_filter_batch
from diamond_tpu.search.pipeline import Pipeline, apply_ranges, restore_ranges, mask_block, motif_mask_ranges
from diamond_tpu.masking.tantan import Tantan
from diamond_tpu.stats.score_matrix import ScoreMatrix

TD = "/root/reference/src/test"
QNAME, TNAME = sys.argv[1], sys.argv[2]
SENS = sys.argv[3] if len(sys.argv) > 3 else "more-sensitive"

recs = list(read_fasta(f"{TD}/data.faa"))
qb = Block.from_sequences([r[1].upper() for r in recs], [r[0] for r in recs])
tb = qb
qid = qb.ids.index(QNAME)
tid = tb.ids.index(TNAME)
print("qid", qid, "tid", tid)

cfg = SearchConfig(matrix=ScoreMatrix("BLOSUM62"), sensitivity=SENS,
                   index_chunks=1)
pipe = Pipeline(cfg, qb, tb)

masker = Tantan(cfg.matrix.matrix32)
mask_block(tb, masker)
q_motif = motif_mask_ranges(qb) if cfg.motif_masking else []
pipe.query_seed_mask = np.zeros(len(qb.letters), dtype=bool)

for sid in range(len(cfg.shapes)):
    shape = cfg.shapes[sid]
    saved_q = apply_ranges(qb.letters, q_motif)
    q_keys, q_pos = stages.enumerate_seeds(qb, shape, cfg.reduction)
    restore_ranges(qb.letters, saved_q)
    keep = ~pipe.query_seed_mask[q_pos]
    q_keys_f, q_pos_f = q_keys[keep], q_pos[keep]
    for b, e in q_motif:
        pipe.query_seed_mask[max(b - shape.length + 1, 0):e] = True
    join = stages.seed_join(q_keys_f, q_pos_f, q_keys, q_pos)
    join2, masked_pos = pipe._complexity_mask(join, shape)
    if len(masked_pos):
        pipe.query_seed_mask[masked_pos] = True
    qp, sp = stages.expand_pairs(join2)
    qi, _ = qb.global_to_local(qp)
    si, _ = tb.global_to_local(sp)
    sel = (qi == qid) & (si == tid)
    n0 = int(sel.sum())
    if n0 == 0:
        # also check pre-complexity
        qp0, sp0 = stages.expand_pairs(join)
        qi0, _ = qb.global_to_local(qp0)
        si0, _ = tb.global_to_local(sp0)
        pre = int(((qi0 == qid) & (si0 == tid)).sum())
        print(f"shape {sid}: 0 pairs (pre-complexity {pre})")
        continue
    keep1 = stages.stage1_filter(qb.letters, tb.letters, qp, sp,
                                 cfg.hamming_filter_id)
    n1 = int((sel & keep1).sum())
    qp1, sp1 = qp[keep1], sp[keep1]
    sel1 = sel[keep1]
    qidx, qoff = qb.global_to_local(qp1)
    qlens = qb.lengths[qidx]
    cutoffs = pipe._cutoff_table(qlens)
    scores = stages.stage2_scores(qb.letters, tb.letters, qp1, sp1,
                                  cfg.matrix.matrix32)
    keep2 = scores > cutoffs
    n2 = int((sel1 & keep2).sum())
    qp2, sp2, sc2 = qp1[keep2], sp1[keep2], scores[keep2]
    sel2 = sel1[keep2]
    qidx2, qoff2 = qidx[keep2], qoff[keep2]
    chunked = cfg.index_chunks > 1
    current = pipe._matcher(sid + 1)
    previous = pipe._matcher(sid) if sid > 0 else pipe._matcher(0)
    wl, wr = stages.clip_window(qb.letters, qp2, 48)
    keep3 = left_most_filter_batch(
        qb.letters, tb.letters, pipe.query_seed_mask,
        cfg.reduction, qp2, sp2, qoff2.astype(np.int64), wl, wr,
        shape, sid, chunked, current, previous,
        0, cfg.seedp_count, cfg.seedp_mask, cfg.hamming_filter_id)
    n3 = int((sel2 & keep3).sum())
    if sel2.any():
        offs = qoff2[sel2]
        print(f"shape {sid}: join {n0} -> hamming {n1} -> ungapped {n2} -> leftmost {n3}; "
              f"scores {sc2[sel2][:8].tolist()} cutoffs {cutoffs[keep2][sel2][:8].tolist() if hasattr(cutoffs,'__len__') else cutoffs}")
    else:
        print(f"shape {sid}: join {n0} -> hamming {n1} -> ungapped {n2} -> leftmost {n3}")
