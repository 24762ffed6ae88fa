"""Batched banded Smith-Waterman for TPU (JAX/XLA).

TPU-native redesign of the reference SWIPE family (reference
src/dp/swipe/banded_swipe.h, full_swipe.h).  Two key transformations make
the banded DP map onto the MXU/VPU instead of the reference's SIMD lanes:

1. **Uniform band via target shifting.**  Each target k with band
   [d0_k, d1_k) is prepended with s_k = C - d0_k padding letters
   (C = max(0, max_k d0_k)), so every cell's query index becomes
   i = j + r - C, *shared across the batch*.  The per-column substitution
   scores for all [batch, band] cells then factor as a one-hot matmul

       scores_j = onehot(t_letters[:, j]) @ profile[j-C : j-C+band].T

   i.e. [B,32] x [32,band] on the MXU — no gathers in the inner loop.

2. **Lazy vertical gap.**  The in-column sequential dependency
   F(r) = max(F(r-1)-ge, H(r-1)-go, 0) is replaced by the closed form
   F(r) = max(0, cummax_{k<r}(H0(k) - go + k*ge) - (r-1)*ge), an associative
   prefix-max (log-depth on the VPU).  Opening from a cell whose value came
   from a vertical gap is dominated by extending (go > ge), so H0 (the cell
   value before the vertical max) suffices and scores are exactly the
   reference's.

Scores are exact int32; the column loop is a lax.scan carrying [B, band].
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG = -(2 ** 20)  # large negative, safe from int32 overflow in adds


@partial(jax.jit, static_argnames=("gap_open_total", "gap_extend", "band"))
def banded_swipe_uniform(targets_1h, band_mask, profile_pad,
                         gap_open_total: int, gap_extend: int, band: int):
    """Score-only banded SW with the uniform-band formulation.

    Args:
      targets_1h: [T, B, 32] float32 one-hot target letters (shifted, padded
        with zero rows = all-pad).
      band_mask: [B, band] bool; False rows (above the target's true band
        width) are masked to the zero score (reference STRICT_BAND).
      profile_pad: [T + band, 32] int32 query profile rows such that column j
        reads rows [j, j+band); out-of-query rows = NEG.
      gap_open_total/gap_extend/band: static ints.

    Returns (best [B], max_col [B], max_rowband [B]) in shifted coordinates.
    """
    T, B, _ = targets_1h.shape
    go = jnp.int32(gap_open_total)
    ge = jnp.int32(gap_extend)
    r_ar = jnp.arange(band, dtype=jnp.int32)
    r_ge = r_ar * ge

    def col_step(carry, inp):
        H, E, best, max_col, max_row, j = carry
        t1h, prof_slice = inp  # [B, 32], [band, 32]
        scores = jax.lax.dot_general(
            t1h, prof_slice.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)  # [B, band]
        scores = jnp.where(band_mask, scores, NEG)
        valid = scores > NEG // 2  # in-band, in-query, in-target cells

        cur0 = jnp.maximum(jnp.maximum(H + scores, E), 0)
        g = cur0 - go + r_ge[None, :]
        gmax = jax.lax.associative_scan(jnp.maximum, g, axis=1)
        F = jnp.maximum(gmax - r_ge[None, :], 0)          # F at row r+1
        F = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), F[:, :-1]], axis=1)
        # zero invalid cells so gap scores can't tunnel through out-of-band /
        # out-of-query rows and re-enter the valid region
        Hn = jnp.where(valid, jnp.maximum(cur0, F), 0)

        col_best = jnp.max(Hn, axis=1)
        eq = Hn == col_best[:, None]
        col_row = (band - 1) - jnp.argmax(eq[:, ::-1], axis=1)
        upd = col_best > best
        best = jnp.where(upd, col_best, best)
        max_col = jnp.where(upd, j, max_col)
        max_row = jnp.where(upd, col_row, max_row)

        E_out = jnp.maximum(jnp.maximum(E - ge, Hn - go), 0)
        E_next = jnp.concatenate([E_out[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)
        return (Hn, E_next, best, max_col, max_row, j + 1), None

    # profile slices per column: [T, band, 32] strided windows
    idx = jnp.arange(T)[:, None] + jnp.arange(band)[None, :]
    prof_slices = profile_pad[idx]  # [T, band, 32]

    H0 = jnp.zeros((B, band), jnp.int32)
    E0 = jnp.zeros((B, band), jnp.int32)
    init = (H0, E0, jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
            jnp.zeros(B, jnp.int32), jnp.int32(0))
    (H, E, best, max_col, max_row, _), _ = jax.lax.scan(
        col_step, init, (targets_1h, prof_slices))
    return best, max_col, max_row


def _lazy_F_check():
    """F(r) defined over rows 0..band-1: F(0) = 0;
    F(r) = max(0, max_{k<r}(cur0(k) - go - (r-1-k) ge)).
    In the scan above: g(k) = cur0(k) - go + k*ge; gmax(r) = cummax up to r;
    F_at(r+1) = max(gmax(r) - r*ge, 0) -> shift right by one."""


def make_profile(query: np.ndarray, bias, matrix32: np.ndarray, qlen_pad: int):
    """[qlen_pad, 32] substitution profile with bias folded in."""
    q = np.asarray(query).astype(np.int64) & 31
    qlen = len(q)
    prof = np.full((qlen_pad, 32), NEG, dtype=np.int32)
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


def pad_band(x: int) -> int:
    """Band padding: pow2 up to 1024 (few compile shapes), then multiples
    of 1024 (a 4169-wide full-matrix band pads to 5120, not 8192 — pow2
    doubling wastes VMEM and cells at that scale)."""
    if x <= 1024:
        return pad_pow2(x, 16)
    return (x + 1023) // 1024 * 1024


def prepare_uniform_batch(query, bias, matrix32, jobs):
    """Build device inputs for banded_swipe_uniform from per-target bands.

    jobs: list of (target_letters, d_begin, d_end).
    Returns (targets_1h, band_mask, profile_pad, band, meta) where meta maps
    shifted coordinates back: true_subject_pos = j - shift_k,
    true_query_pos = j - C + rowband."""
    qlen = len(query)
    band = pad_pow2(max(d1 - d0 for _, d0, d1 in jobs), 16)
    # query index at (column j', row r) is i = j' - C + r for ALL targets:
    # i = j_true + d0 + r and j' = j_true + s with s = d0 + C >= 0.
    C = max(0, -min(d0 for _, d0, _ in jobs))
    shifts = [d0 + C for _, d0, _ in jobs]
    T = pad_pow2(max(len(t) + s for (t, _, _), s in zip(jobs, shifts)), 16)
    B = len(jobs)
    tgt = np.full((B, T), 31, dtype=np.int8)
    band_mask = np.zeros((B, band), dtype=bool)
    for k, ((t, d0, d1), s) in enumerate(zip(jobs, shifts)):
        tgt[k, s : s + len(t)] = np.asarray(t, dtype=np.int8) & 31
        band_mask[k, : d1 - d0] = True
    onehot = np.zeros((T, B, 32), dtype=np.float32)
    cols = np.arange(T)[:, None].repeat(B, 1)
    onehot[cols, np.arange(B)[None, :].repeat(T, 0), tgt.T] = 1.0
    # zero out pure padding columns' contribution? padding letter 31 ->
    # profile column 31 = NEG, handled by profile.
    profile_pad = np.full((T + band, 32), NEG, dtype=np.int32)
    prof = make_profile(query, bias, matrix32, qlen)
    # column j reads query rows [j - C, j - C + band)
    lo = -C
    for j_off in range(T + band):
        qi = lo + j_off
        if 0 <= qi < qlen:
            profile_pad[j_off] = prof[qi]
    meta = {"C": C, "shifts": shifts, "band": band}
    return (jnp.asarray(onehot), jnp.asarray(band_mask),
            jnp.asarray(profile_pad), band, meta)


class SwipeBatcher:
    """Buckets (target, band) work items into padded device batches."""

    def __init__(self, matrix32, gap_open: int, gap_extend: int):
        self.matrix32 = matrix32
        self.go = gap_open + gap_extend
        self.ge = gap_extend

    def run(self, query, bias, jobs):
        """jobs: list of (target_letters, d_begin, d_end).
        Returns list of (score, max_col, max_row) in true coordinates."""
        if not jobs:
            return []
        targets_1h, band_mask, profile_pad, band, meta = prepare_uniform_batch(
            query, bias, self.matrix32, jobs)
        best, mc, mr = banded_swipe_uniform(targets_1h, band_mask, profile_pad,
                                            self.go, self.ge, band)
        best = np.asarray(best)
        mc = np.asarray(mc)
        mr = np.asarray(mr)
        out = []
        for k in range(len(jobs)):
            j_true = int(mc[k]) - meta["shifts"][k]
            i_true = int(mc[k]) - meta["C"] + int(mr[k])
            out.append((int(best[k]), j_true, i_true))
        return out
