"""Batched banded Smith-Waterman for TPU (JAX/XLA).

TPU-native redesign of the reference SWIPE family (reference
src/dp/swipe/banded_swipe.h, full_swipe.h): instead of 16/32 SIMD channels
with a sequential in-column row loop, every column update is fully
vectorized over [batch, band] using a lazy vertical-gap evaluation:

  F(r) = max(0, max_{k<r}(H0(k) - gap_open_total + (k - (r-1)) * gap_extend))

which is an (associative) prefix-max of g(k) = H0(k) + k*ge — XLA lowers it
to a logarithmic scan on the VPU.  Opening a vertical gap from a cell whose
value itself came from a vertical gap is always dominated by extending
(gap_open_total > gap_extend), so H0 (the cell value before the vertical-gap
max) is sufficient for the scan — scores are exactly the reference's.

The column loop is a lax.scan over subject positions with carried
[batch, band] state; batch = bucketed targets (channels), band padded to the
lane width.  Scores are exact int32.

The same column step powers banded and full-matrix (SWIPE) alignment: full
matrix is the band [-(tlen-1), qlen) rotated so the "band" axis is the whole
query (see full_swipe_scores).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG = jnp.int32(-(2 ** 30))


@partial(jax.jit, static_argnames=("gap_open_total", "gap_extend", "band", "qlen_pad"))
def banded_swipe_scores(qlen, targets_idx, tlens, d_begin, band_offset,
                        profile, gap_open_total, gap_extend, band, qlen_pad):
    """Score-only banded SW over a batch of targets.

    Args:
      qlen: scalar int32 true query length.
      targets_idx: [B, T] int32 target letters (&31), padded with 31.
      tlens: [B] int32 target lengths.
      d_begin: [B] int32 band start diagonal per target (band = d_end-d_begin
        shared; targets with narrower true bands must be pre-shifted/masked
        by the caller via d_begin and band padding).
      profile: [qlen_pad, 32] int32 substitution scores (+bias) per query
        position, i.e. matrix[q[i]] + bias[i], with padding rows = NEG.
      gap_open_total / gap_extend: ints.
      band: static band width.
      qlen_pad: static padded query length.

    Returns:
      (best [B], max_col [B], max_row [B]) — max_row is the query position
      of the best cell (last band row at the best column, first best column),
      matching the reference VectorRowCounter semantics.
    """
    B, T = targets_idx.shape
    go = jnp.int32(gap_open_total)
    ge = jnp.int32(gap_extend)
    r_ar = jnp.arange(band, dtype=jnp.int32)

    def col_step(carry, inp):
        H, E, best, max_col, max_row, j = carry
        t_letter, = inp
        # query index per band row: i = j + d_begin + r
        i_idx = j + d_begin[:, None] + r_ar[None, :]            # [B, band]
        valid = ((i_idx >= 0) & (i_idx < qlen) & (j < tlens)[:, None]
                 & (r_ar[None, :] >= band_offset[:, None]))  # STRICT_BAND mask
        i_clip = jnp.clip(i_idx, 0, qlen_pad - 1)
        scores = profile[i_clip, t_letter[:, None]]             # [B, band]
        scores = jnp.where(valid, scores, NEG)

        cur0 = jnp.maximum(jnp.maximum(H + scores, E), 0)
        cur0 = jnp.where(valid, cur0, 0)
        # lazy vertical gap: F(r) = max(0, cummax_{k<r}(cur0(k)-go+k*ge) - (r-1)*ge)
        g = cur0 - go + r_ar[None, :] * ge
        gmax = jax.lax.associative_scan(jnp.maximum, g, axis=1)
        gmax_excl = jnp.concatenate([jnp.full((B, 1), NEG), gmax[:, :-1]], axis=1)
        F = jnp.maximum(gmax_excl - (r_ar[None, :] - 1) * ge, 0)
        F = jnp.where(valid, F, 0)
        Hn = jnp.maximum(cur0, F)

        col_best = jnp.max(Hn, axis=1)
        # last row equal to the column max (VectorRowCounter)
        eq = Hn == col_best[:, None]
        col_row = (band - 1) - jnp.argmax(eq[:, ::-1], axis=1)
        upd = col_best > best
        best = jnp.where(upd, col_best, best)
        max_col = jnp.where(upd, j, max_col)
        max_row = jnp.where(upd, j + d_begin + col_row, max_row)

        E_out = jnp.maximum(jnp.maximum(E - ge, Hn - go), 0)
        E_out = jnp.where(valid, E_out, 0)
        # shift for next column: E enters at row r from old row r+1; H diag stays
        E_next = jnp.concatenate([E_out[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)
        return (Hn, E_next, best, max_col, max_row, j + 1), None

    H0 = jnp.zeros((B, band), jnp.int32)
    E0 = jnp.zeros((B, band), jnp.int32)
    init = (H0, E0, jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
            jnp.zeros(B, jnp.int32), jnp.int32(0))
    (H, E, best, max_col, max_row, _), _ = jax.lax.scan(
        col_step, init, (targets_idx.T,))
    return best, max_col, max_row


def make_profile(query: np.ndarray, bias, matrix32: np.ndarray, qlen_pad: int):
    """[qlen_pad, 32] substitution profile with bias folded in."""
    q = np.asarray(query).astype(np.int64) & 31
    qlen = len(q)
    prof = np.full((qlen_pad, 32), int(NEG), dtype=np.int32)
    rows = matrix32[q].astype(np.int32)
    if bias is not None:
        rows = rows + np.asarray(bias, dtype=np.int32)[:, None]
    prof[:qlen] = rows
    return prof


def pad_pow2(x: int, lo: int = 16) -> int:
    n = lo
    while n < x:
        n *= 2
    return n


class SwipeBatcher:
    """Buckets (target, band) work items into padded device batches."""

    def __init__(self, matrix32, gap_open: int, gap_extend: int):
        self.matrix32 = matrix32
        self.go = gap_open + gap_extend
        self.ge = gap_extend

    def run(self, query, bias, jobs):
        """jobs: list of (target_letters, d_begin, d_end).
        Returns list of (score, max_col, max_row)."""
        if not jobs:
            return []
        qlen = len(query)
        qlen_pad = pad_pow2(qlen)
        profile = jnp.asarray(make_profile(query, bias, self.matrix32, qlen_pad))
        band = pad_pow2(max(d1 - d0 for _, d0, d1 in jobs), 16)
        tmax = pad_pow2(max(len(t) for t, _, _ in jobs))
        B = len(jobs)
        tgt = np.full((B, tmax), 31, dtype=np.int32)
        tlens = np.zeros(B, dtype=np.int32)
        d_begin = np.zeros(B, dtype=np.int32)
        band_offset = np.zeros(B, dtype=np.int32)
        for k, (t, d0, d1) in enumerate(jobs):
            tgt[k, : len(t)] = np.asarray(t, dtype=np.int32) & 31
            tlens[k] = len(t)
            # shared band width; rows below the target's true d_begin are
            # masked out (reference STRICT_BAND, banded_swipe.h:212-224)
            d_begin[k] = d1 - band
            band_offset[k] = d0 - d_begin[k]
        best, mc, mr = banded_swipe_scores(
            jnp.int32(qlen), jnp.asarray(tgt), jnp.asarray(tlens),
            jnp.asarray(d_begin), jnp.asarray(band_offset), profile,
            self.go, self.ge, band, qlen_pad)
        best = np.asarray(best)
        mc = np.asarray(mc)
        mr = np.asarray(mr)
        return [(int(best[k]), int(mc[k]), int(mr[k])) for k in range(len(jobs))]
