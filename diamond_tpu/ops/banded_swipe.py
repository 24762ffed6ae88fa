"""Banded Smith-Waterman ("SWIPE") — numpy oracle and JAX batched kernel.

Semantics mirror the reference banded SWIPE (reference
src/dp/swipe/banded_swipe.h:200-360, cell_update.h:102-141):

  - local affine-gap DP restricted to diagonals d = i - j in [d_begin, d_end)
  - gap open charge = gap_open + gap_extend at opening
  - H, E (horizontal gap), F (vertical gap) all floored at 0 (the int8/16
    kernels saturate at the zero score, flooring every quantity)
  - per-query-position composition bias added to the match score
  - best cell = first column reaching the maximum; within a column, the last
    band row equal to the column max (reference VectorRowCounter,
    cell_update.h:36-53)
  - traceback priority at equal scores: vertical gap (insertion), then
    horizontal gap (deletion), then diagonal (reference trace-mask walk,
    banded_swipe.h:126-188, banded_matrix.h:382-402)
  - a gap run walks until the first cell whose open bit is set; the open bit
    wins ties (set_max(gap, open) keeps open on equality -> shortest run)

Band geometry: at column j (subject position), band row r holds query index
i = j + d_begin + r.  Diagonal predecessor (i-1, j-1) lives at the same band
row of the previous column; the horizontal predecessor (i, j-1) lives at band
row r+1 of the previous column.

The numpy version computes one (query, target) pair at a time and serves as
the traceback oracle.  The JAX twin (ops/swipe_jax.py) computes score-only
over batches of targets (channels = VPU lanes).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class BandedResult:
    score: int
    max_col: int        # subject position of best cell
    max_row: int        # query position of best cell
    # traceback products (None if score-only)
    transcript: list | None = None
    query_range: tuple | None = None
    subject_range: tuple | None = None
    identities: int = 0
    mismatches: int = 0
    positives: int = 0
    gap_openings: int = 0
    gaps: int = 0
    length: int = 0


def banded_swipe_np(query: np.ndarray, target: np.ndarray, d_begin: int, d_end: int,
                    matrix32: np.ndarray, bias: np.ndarray | None,
                    gap_open: int, gap_extend: int,
                    traceback: bool = False) -> BandedResult:
    """Reference-exact banded SW for one (query, target) pair."""
    qlen, tlen = len(query), len(target)
    band = d_end - d_begin
    go = gap_open + gap_extend
    ge = gap_extend

    q = np.asarray(query).astype(np.int64) & 31
    t = np.asarray(target).astype(np.int64) & 31
    b = np.zeros(qlen, dtype=np.int64) if bias is None else np.asarray(bias).astype(np.int64)
    sub = matrix32[q]  # (qlen, 32) substitution row per query position
    biased = sub + b[:, None]

    H = np.zeros(band, dtype=np.int64)   # previous column, indexed by band row
    E = np.zeros(band + 1, dtype=np.int64)  # E[r] = horizontal gap into row r (prev col row r+1)
    best = 0
    max_col = 0
    max_row_band = 0

    if traceback:
        gapv = np.zeros((tlen, band), dtype=bool)
        gaph = np.zeros((tlen, band), dtype=bool)
        openv = np.zeros((tlen, band), dtype=bool)
        openh = np.zeros((tlen, band), dtype=bool)
    Hnew = np.zeros(band, dtype=np.int64)
    Enew = np.zeros(band, dtype=np.int64)

    for j in range(tlen):
        i_lo = j + d_begin
        r_lo = max(0, -i_lo)
        r_hi = min(band, qlen - i_lo)
        Hnew[:] = 0
        Enew[:] = 0
        if r_lo >= r_hi:
            H[:] = 0
            E[:] = 0
            continue
        F = 0
        col_best = 0
        col_row = 0
        tl = t[j]
        scores = biased[i_lo + r_lo : i_lo + r_hi, tl]
        for r in range(r_lo, r_hi):
            diag = H[r]
            e = E[r]
            cur = diag + scores[r - r_lo]
            if e > cur:
                cur = e
            if F > cur:
                cur = F
            if cur < 0:
                cur = 0
            if traceback:
                gapv[j, r] = cur == F
                gaph[j, r] = cur == e
            if cur >= col_best:
                col_best = cur
                col_row = r
            opn = cur - go
            if opn < 0:
                opn = 0
            F -= ge
            if F < 0:
                F = 0
            Hnew[r] = cur
            # E entering (i, j+1) = max(E(i,j) - ge, H(i,j) - go, 0)
            e_next = e - ge
            if e_next < 0:
                e_next = 0
            if traceback:
                openv[j, r] = opn >= F
                openh[j, r] = opn >= e_next
            if opn > F:
                F = opn
            Enew[r] = e_next if e_next > opn else opn
        if col_best > best:
            best = col_best
            max_col = j
            max_row_band = col_row
        # re-index for next column: row r' at column j+1 has
        #   diag pred = row r' of column j        -> H stays in place
        #   horizontal pred = row r'+1 of column j -> shift E down by one
        H[:] = Hnew
        E[:band - 1] = Enew[1:]
        E[band - 1 :] = 0

    res = BandedResult(score=int(best), max_col=int(max_col),
                       max_row=int(max_col + d_begin + max_row_band))
    if not traceback or best == 0:
        return res
    _traceback(res, query, target, d_begin, d_end, matrix32, b, go, ge,
               gapv, gaph, openv, openh)
    return res


def _traceback(res, query, target, d_begin, d_end, matrix32, bias, go, ge,
               gapv, gaph, openv, openh):
    """Walk from the best cell following trace-mask priorities."""
    q = np.asarray(query).astype(np.int64) & 31
    t = np.asarray(target).astype(np.int64) & 31
    i, j = res.max_row, res.max_col
    end_score = res.score
    score = 0
    ops = []  # built reversed; (op, payload)
    identities = mismatches = positives = gap_openings = gaps = length = 0
    q_end, s_end = i + 1, j + 1
    band = d_end - d_begin

    def row(i, j):
        return i - j - d_begin

    while i >= 0 and j >= 0 and score < end_score:
        r = row(i, j)
        assert 0 <= r < band
        if gapv[j, r]:
            l = 0
            while True:
                l += 1
                i -= 1
                rr = row(i, j)
                if rr < 0 or (rr < band and openv[j, rr]) or i <= 0:
                    break
            ops.append(("I", l))
            gap_openings += 1
            gaps += l
            length += l
            score -= go + (l - 1) * ge
        elif gaph[j, r]:
            l = 0
            while True:
                l += 1
                j -= 1
                rr = row(i, j)
                if rr >= band or (rr >= 0 and openh[j, rr]) or j <= 0:
                    break
            # deletion letters pushed reversed: j+l down to j+1
            for k in range(l):
                ops.append(("D", int(t[j + l - k])))
            gap_openings += 1
            gaps += l
            length += l
            score -= go + (l - 1) * ge
        else:
            m = int(matrix32[q[i], t[j]])
            score += m + int(bias[i])
            if int(query[i]) == int(target[j]):
                ops.append(("M", 1))
                identities += 1
                positives += 1
            else:
                ops.append(("S", int(t[j])))
                mismatches += 1
                if m > 0:
                    positives += 1
            length += 1
            i -= 1
            j -= 1

    if score != end_score:
        raise RuntimeError("Traceback error.")
    ops.reverse()
    res.transcript = ops
    res.query_range = (i + 1, q_end)
    res.subject_range = (j + 1, s_end)
    res.identities = identities
    res.mismatches = mismatches
    res.positives = positives
    res.gap_openings = gap_openings
    res.gaps = gaps
    res.length = length
