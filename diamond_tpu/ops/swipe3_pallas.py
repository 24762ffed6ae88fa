"""Pallas TPU kernel for the banded 3-frame (frameshift) Smith-Waterman.

Device twin of ops/swipe3._forward_np / native/src/swipe3.cc (reference
src/dp/swipe/banded_3frame_swipe.cpp:369-489): the DP band interleaves
the three frame translations (physical row r = 3*(query offset) + frame),
shifts one query position (3 rows) per target column, and each cell
extends from the same-frame diagonal, the two frameshift transitions
(rows r-1 / r+1 of the previous column, score - F penalty), the
within-frame affine gaps, and zero.

Kernel structure mirrors ops/swipe_pallas.py: S/H state in VMEM,
substitution scores from a one-hot fp32 MXU matmul against an
interleaved-frame profile (rows = 3*query_index + frame), and the
per-frame vertical-gap scan as a stride-3 log-depth shift-max (frames
are congruent mod 3, so power-of-two multiples of 3 never mix frames).
Score-only: returns (best, max_col) per job — the traceback round stays
on the host native path (the survivor set is tiny).

Exactness: the lazy-F single pass is exact for go >= ge (an F-sourced
reopening F - go never beats the F - ge gap chain the prefix-max already
carries), the same argument as the 2D kernel; frameshift transitions
read only the previous column, so they cannot interact with the scan.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diamond_tpu.ops.swipe_jax import pad_band, pad_pow2

NEG = -(2 ** 20)


def _prefix_max_stride3(g, R):
    """Inclusive prefix max along axis 1 restricted to rows congruent
    mod 3 (per-frame scan), via log-depth shifts of 3*2^k."""
    shift = 3
    while shift < R:
        rolled = pltpu.roll(g, shift, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
        g = jnp.maximum(g, jnp.where(col >= shift, rolled, NEG))
        shift *= 2
    return g


def _make_kernel3(T: int, band_q: int, go: int, ge: int, fs: int):
    R = 3 * band_q

    def kernel(t_idx_ref, band_mask_ref, profile_ref, best_ref, maxcol_ref,
               S_scr, H_scr):
        TB = S_scr.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (TB, R), 1)
        krow_ge = (col // 3) * ge
        bmask = band_mask_ref[:] != 0
        lane32 = jax.lax.broadcasted_iota(jnp.int32, (TB, 32), 1)

        S_scr[:] = jnp.zeros((TB, R), jnp.int32)
        H_scr[:] = jnp.zeros((TB, R), jnp.int32)

        def col_step(j, carry):
            best, maxcol = carry
            letters = t_idx_ref[j, :]                         # [TB]
            onehot = (letters[:, None] == lane32).astype(jnp.float32)
            prof = profile_ref[pl.ds(3 * j, R), :]            # [R, 32]
            scores = jax.lax.dot_general(
                onehot, prof.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            scores = jnp.where(bmask, scores, NEG)
            valid = scores > NEG // 2

            Sp = S_scr[:]
            Hp = H_scr[:]
            # horizontal gap arrives from row r+3 of the previous column
            # (the band shifts one query position per column)
            hg = pltpu.roll(Hp, R - 3, axis=1)
            hg = jnp.where(col < R - 3, hg, 0)
            # frameshift transitions: rows r-1 / r+1 of the previous
            # column (out-of-band reads are the reference's zero padding)
            sm4 = pltpu.roll(Sp, 1, axis=1)
            sm4 = jnp.where(col >= 1, sm4, 0)
            sm2 = pltpu.roll(Sp, R - 1, axis=1)
            sm2 = jnp.where(col < R - 1, sm2, 0)

            fsc = scores - fs
            cur0 = jnp.maximum(Sp + scores, sm4 + fsc)
            cur0 = jnp.maximum(cur0, sm2 + fsc)
            cur0 = jnp.maximum(jnp.maximum(cur0, hg), 0)

            g = jnp.where(valid, cur0 - go + krow_ge, NEG)
            gmax = _prefix_max_stride3(g, R)
            F = gmax - krow_ge
            Fs = pltpu.roll(F, 3, axis=1)
            Fs = jnp.where(col >= 3, Fs, NEG)
            Hn = jnp.where(valid, jnp.maximum(cur0, Fs), 0)

            col_best = jnp.max(Hn, axis=1)
            upd = col_best > best
            best = jnp.where(upd, col_best, best)
            maxcol = jnp.where(upd, j, maxcol)

            H_new = jnp.where(valid, jnp.maximum(hg - ge, Hn - go), 0)
            S_scr[:] = Hn
            H_scr[:] = H_new
            return best, maxcol

        z = jnp.zeros((TB,), jnp.int32)
        best, maxcol = jax.lax.fori_loop(0, T, col_step,
                                         (z, z - 1))
        best_ref[:] = best.reshape(best_ref.shape)
        maxcol_ref[:] = maxcol.reshape(maxcol_ref.shape)

    return kernel


@partial(jax.jit, static_argnames=("go", "ge", "fs", "band_q", "tile_b",
                                   "interpret"))
def banded_swipe3_pallas(t_idx, band_mask, profile3_pad, go: int, ge: int,
                         fs: int, band_q: int, tile_b: int = 64,
                         interpret: bool = False):
    """t_idx [T, B] int32 shifted target letters; band_mask [B, 3*band_q]
    int32; profile3_pad [(T + band_q)*3, 32] int32 interleaved-frame
    profile (column j reads rows [3j, 3j + 3*band_q)).  Returns
    (best [B], max_col [B]) — max_col in kernel column coordinates."""
    T, B = t_idx.shape
    assert B % tile_b == 0
    R = 3 * band_q
    kernel = _make_kernel3(T, band_q, go, ge, fs)
    grid = (B // tile_b,)
    out_shape = [jax.ShapeDtypeStruct((B // tile_b * 8, tile_b // 8),
                                      jnp.int32)] * 2
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, tile_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, R), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(((T + band_q) * 3, 32), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((8, tile_b // 8), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tile_b, R), jnp.int32),
            pltpu.VMEM((tile_b, R), jnp.int32),
        ],
        interpret=interpret,
    )(t_idx, band_mask, profile3_pad)
    return tuple(o.reshape(B) for o in out)


def prepare_swipe3_batch(q_frames, matrix32, jobs, tile_b: int = 64):
    """Pack 3-frame score-only jobs sharing one strand's frame
    translations.  jobs: [(target_letters, d_begin, d_end)].  Returns
    (t_idx, band_mask, profile3_pad, band_q, meta); meta carries the
    per-job column shift so max_col maps back to DP columns."""
    qlens = [len(f) for f in q_frames]
    band_q = pad_band(max(d1 - d0 for _, d0, d1 in jobs))
    R = 3 * band_q
    i0s, j0s = [], []
    for _t, d0, d1 in jobs:
        i1_init = max(d1 - 1, 0)
        i0s.append(i1_init + 1 - (d1 - d0))
        j0s.append(i1_init - (d1 - 1))
    C3 = max(0, -min(i0s))
    shifts = [i0 + C3 for i0 in i0s]
    T = pad_pow2(max(s + len(t) - j0 for (t, _, _), s, j0
                     in zip(jobs, shifts, j0s)), 16)
    B = (len(jobs) + tile_b - 1) // tile_b * tile_b
    tgt = np.full((B, T), 31, dtype=np.int32)
    band_mask = np.zeros((B, R), dtype=np.int32)
    for k, ((t, d0, d1), s, j0) in enumerate(zip(jobs, shifts, j0s)):
        tt = np.asarray(t, dtype=np.int32) & 31
        tgt[k, s : s + len(tt) - j0] = tt[j0:]
        band_mask[k, : 3 * (d1 - d0)] = 1
    # interleaved-frame profile: row 3*(C3 + i) + f = matrix row of
    # q_frames[f][i]; rows outside a frame's length stay NEG.  The scalar
    # recurrence stops the WHOLE row sweep at the first (i, f>0) with
    # i >= qlens[f] (ops/swipe3._forward_np `stop`), so every interleaved
    # row at or past that cell is uncomputed (zero): mask them all.
    prof = np.full(((T + band_q) * 3, 32), NEG, dtype=np.int32)
    stop_row = min(3 * qlens[1] + 1, 3 * qlens[2] + 2)
    for f in range(3):
        qf = np.asarray(q_frames[f]).astype(np.int64) & 31
        i_max = min(qlens[f], (T + band_q) - C3,
                    (stop_row - f + 2) // 3)
        if i_max > 0:
            rows = matrix32[qf[:i_max]].astype(np.int32)
            prof[3 * C3 + f : 3 * (C3 + i_max) + f : 3] = rows
    meta = {"shifts": shifts, "j0s": j0s, "band_q": band_q}
    return (jnp.asarray(tgt.T.copy()), jnp.asarray(band_mask),
            jnp.asarray(prof), band_q, meta)
