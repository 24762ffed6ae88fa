"""One-off exact emulation of the reference's BackwardCell reversed stats
pass (reference dp/swipe/cell_update.h:102-141, stat_cell.h) for one pair.

Scalar DP, per-cell, exact blend order:
  cell = diag + score(+bias); [update_stats: cell.mismatch += !id]
  set_max(cell, hgap)  -- tie -> hgap stats
  set_max(cell, vgap)  -- tie -> vgap stats
  clamp cell at 0      -- (saturation; stats reset when cell==0 via
                            update_open zero_mask)
  vgap -= ge; hgap -= ge
  open = cell - go; open.gapopen += 1; [zero-reset of cell stats if cell==0]
  set_max(hgap, open)  -- tie -> open stats
  set_max(vgap, open)  -- tie -> open stats
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")

import numpy as np


def backward_stats(q, t, d_begin, d_end, matrix32, bias, gap_open, gap_extend,
                   cell_i, cell_j):
    """Returns (score, mismatch, gapopen) at (cell_i, cell_j)."""
    qlen, tlen = len(q), len(t)
    band = d_end - d_begin
    go = gap_open + gap_extend
    ge = gap_extend
    NEG = -(10 ** 9)

    # state per band row: H (value, mis, gop), E similarly; F computed down
    Hv = np.zeros(band, np.int64); Hm = np.zeros(band, np.int64); Hg = np.zeros(band, np.int64)
    Ev = np.zeros(band + 1, np.int64); Em = np.zeros(band + 1, np.int64); Eg = np.zeros(band + 1, np.int64)

    out = None
    for j in range(tlen):
        i_lo = j + d_begin
        r_lo = max(0, -i_lo)
        r_hi = min(band, qlen - i_lo)
        nHv = np.zeros(band, np.int64); nHm = np.zeros(band, np.int64); nHg = np.zeros(band, np.int64)
        nEv = np.zeros(band, np.int64); nEm = np.zeros(band, np.int64); nEg = np.zeros(band, np.int64)
        if r_lo >= r_hi:
            Hv[:] = 0; Hm[:] = 0; Hg[:] = 0
            Ev[:band] = 0; Em[:band] = 0; Eg[:band] = 0
            continue
        Fv = 0; Fm = 0; Fg = 0
        for r in range(r_lo, r_hi):
            i = i_lo + r
            s = int(matrix32[q[i] & 31, t[j] & 31]) + (int(bias[i]) if bias is not None else 0)
            # diag pred: same row prev col
            cv = Hv[r] + s
            cm = Hm[r] + (0 if (q[i] & 31) == (t[j] & 31) else 1)
            cg = Hg[r]
            # set_max(cell, hgap): E enters row r from prev col row r+1
            ev, em, eg = Ev[r], Em[r], Eg[r]
            if ev >= cv:
                cv, cm, cg = ev, em, eg
            # set_max(cell, vgap)
            if Fv >= cv:
                cv, cm, cg = Fv, Fm, Fg
            if cv < 0:
                cv = 0
            if cv == 0:
                cm = 0; cg = 0
            if i == cell_i and j == cell_j:
                out = (cv, cm, cg)
            # gaps
            fv2 = Fv - ge; ev2 = ev - ge
            ov = cv - go
            om, og = cm, cg + 1
            # set_max(hgap, open)
            if ov >= ev2:
                nEv[r], nEm[r], nEg[r] = ov, om, og
            else:
                nEv[r], nEm[r], nEg[r] = ev2, em, eg
            if nEv[r] < 0:
                nEv[r] = 0
            # set_max(vgap, open)
            if ov >= fv2:
                Fv, Fm, Fg = ov, om, og
            else:
                Fv, Fm, Fg = fv2, Fm, Fg
            if Fv < 0:
                Fv = 0
            nHv[r], nHm[r], nHg[r] = cv, cm, cg
        Hv, Hm, Hg = nHv, nHm, nHg
        # horizontal pred shifts down one band row next column
        Ev[: band - 1] = nEv[1:]; Em[: band - 1] = nEm[1:]; Eg[: band - 1] = nEg[1:]
        Ev[band - 1:] = 0; Em[band - 1:] = 0; Eg[band - 1:] = 0
    return out


def main():
    from diamond_tpu.data.block import Block
    from diamond_tpu.data.fasta import read_fasta
    from diamond_tpu.ops.banded_swipe import banded_swipe_np
    from diamond_tpu.stats.cbs import hauser_correction
    from diamond_tpu.stats.score_matrix import ScoreMatrix
    from diamond_tpu.align.extend import band as bandf

    TD = "/root/reference/src/test"
    recs = list(read_fasta(f"{TD}/data.faa"))
    names = [r[0].split()[0] for r in recs]

    def seq(n):
        b = Block.from_sequences([recs[names.index(n)][1].upper()], [n])
        return b.seq(0).copy()

    m = ScoreMatrix("BLOSUM62")
    qn, tn, dmid = sys.argv[1], sys.argv[2], int(sys.argv[3])
    q = seq(qn)
    t = seq(tn)
    _, bias = hauser_correction(q, m.matrix32, m.background_scores)
    bb = bandf(len(q), "banded-slow")
    d0, d1 = dmid - bb, dmid + bb
    r = banded_swipe_np(q, t, d0, d1, m.matrix32, bias, m.gap_open,
                        m.gap_extend, traceback=True)
    print("fwd", r.score, r.query_range, r.subject_range,
          (r.mismatches, r.gap_openings))
    qlen = len(q)
    send = r.subject_range[1]
    qr = np.ascontiguousarray(q[::-1])
    tr = np.ascontiguousarray(t[:send][::-1])
    br = np.ascontiguousarray(bias[::-1])
    rd0 = qlen - send - (d1 - 1)
    rd1 = qlen - send - d0 + 1
    ci = qlen - 1 - r.query_range[0]
    cj = send - 1 - r.subject_range[0]
    out = backward_stats(qr, tr, rd0, rd1, m.matrix32, br, m.gap_open,
                         m.gap_extend, ci, cj)
    print("backward propagation at pinned cell:", out)


if __name__ == "__main__":
    main()
