"""Pallas TPU kernel for the uniform-band banded Smith-Waterman.

Same math as ops/swipe_jax.banded_swipe_uniform but with the whole column
loop fused inside one kernel: H/E state and the query profile live in VMEM
for the kernel's lifetime, substitution scores come from an MXU one-hot
matmul, and the vertical-gap prefix-max runs as a log-depth shift-max
sequence on the VPU.

Grid: one program per tile of TB targets; targets are independent so tiles
parallelize trivially (reference SWIPE channels -> batch rows).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2 ** 20)


def _prefix_max_shift(g, band):
    """Inclusive prefix max along axis 1 via log-depth shifts."""
    shift = 1
    while shift < band:
        rolled = pltpu.roll(g, shift, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
        g = jnp.maximum(g, jnp.where(col >= shift, rolled, NEG))
        shift *= 2
    return g


def _make_kernel(T: int, band: int, go: int, ge: int):
    def kernel(t_idx_ref, band_mask_ref, profile_ref, best_ref, maxcol_ref,
               maxrow_ref, H_scr, E_scr, S_scr):
        TB = H_scr.shape[0]
        r_ge = jax.lax.broadcasted_iota(jnp.int32, (TB, band), 1) * ge
        col = jax.lax.broadcasted_iota(jnp.int32, (TB, band), 1)
        bmask = band_mask_ref[:] != 0
        lane32 = jax.lax.broadcasted_iota(jnp.int32, (TB, 32), 1)

        H_scr[:] = jnp.zeros((TB, band), jnp.int32)
        E_scr[:] = jnp.zeros((TB, band), jnp.int32)

        def col_scores(j):
            """fp32 one-hot matmul for column j's substitution scores.
            (bf16 was tried and is value-exact here, but the per-column
            int32->bf16 relayout of the profile slice costs more than the
            MXU saves — narrow dtypes cannot be dynamically sliced on the
            sublane axis in Mosaic, so the cast cannot be hoisted.)"""
            letters = t_idx_ref[j, :]                         # [TB]
            onehot = (letters[:, None] == lane32).astype(jnp.float32)
            prof = profile_ref[pl.ds(j, band), :]             # [band, 32]
            return jax.lax.dot_general(
                onehot, prof.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)

        def col_step(j, carry):
            # software pipeline: column j's scores were computed during
            # iteration j-1 (held in the S_scr scratch), so the MXU
            # matmul for column j+1 has no data dependence on this
            # iteration's VPU chain and the scheduler can overlap the two
            # units.  The target/profile inputs carry >= 8 padding
            # columns (prepare_pallas_batch) so j+1 never leaves bounds.
            best, maxcol, maxrow = carry
            scores_raw = S_scr[:]
            scores_next = col_scores(j + 1)
            scores = jnp.where(bmask, scores_raw, NEG)
            valid = scores > NEG // 2

            H = H_scr[:]
            E = E_scr[:]
            cur0 = jnp.maximum(jnp.maximum(H + scores, E), 0)
            g = cur0 - go + r_ge
            gmax = _prefix_max_shift(g, band)
            F = jnp.maximum(gmax - r_ge, 0)
            # F used at row r comes from rows < r: shift right by one
            Fs = pltpu.roll(F, 1, axis=1)
            Fs = jnp.where(col >= 1, Fs, 0)
            Hn = jnp.where(valid, jnp.maximum(cur0, Fs), 0)

            col_best = jnp.max(Hn, axis=1)
            eq = Hn == col_best[:, None]
            col_row = jnp.max(jnp.where(eq, col, -1), axis=1)
            upd = col_best > best
            best = jnp.where(upd, col_best, best)
            maxcol = jnp.where(upd, j, maxcol)
            maxrow = jnp.where(upd, col_row, maxrow)

            E_out = jnp.maximum(jnp.maximum(E - ge, Hn - go), 0)
            E_next = pltpu.roll(E_out, band - 1, axis=1)  # left-shift by one
            E_next = jnp.where(col < band - 1, E_next, 0)
            H_scr[:] = Hn
            E_scr[:] = E_next
            S_scr[:] = scores_next
            return best, maxcol, maxrow

        S_scr[:] = col_scores(0)
        z = jnp.zeros((TB,), jnp.int32)
        best, maxcol, maxrow = jax.lax.fori_loop(
            0, T - 8, col_step, (z, z, z))
        best_ref[:] = best.reshape(best_ref.shape)
        maxcol_ref[:] = maxcol.reshape(maxcol_ref.shape)
        maxrow_ref[:] = maxrow.reshape(maxrow_ref.shape)

    return kernel


@partial(jax.jit, static_argnames=("go", "ge", "band", "tile_b"))
def banded_swipe_pallas(t_idx, band_mask, profile_pad, go: int, ge: int,
                        band: int, tile_b: int = 256):
    """t_idx [T, B] int32 shifted target letters (column-major); band_mask
    [B, band] int32; profile_pad [T + band, 32] int32 (column j reads rows
    [j, j+band)).  Returns (best [B], max_col [B], max_rowband [B])."""
    T, B = t_idx.shape
    assert B % tile_b == 0
    kernel = _make_kernel(T, band, go, ge)
    grid = (B // tile_b,)
    rows = tile_b // 128 * 8
    out_shape = [jax.ShapeDtypeStruct((B // tile_b * 8, tile_b // 8), jnp.int32)] * 3
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, tile_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, band), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T + band, 32), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((8, tile_b // 8), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tile_b, band), jnp.int32),
            pltpu.VMEM((tile_b, band), jnp.int32),
            pltpu.VMEM((tile_b, band), jnp.int32),
        ],
    )(t_idx, band_mask, profile_pad)
    return tuple(o.reshape(B) for o in out)


def prepare_pallas_batch(query, bias, matrix32, jobs, tile_b: int = 256):
    """Pack jobs like swipe_jax.prepare_uniform_batch but with letter arrays
    (one-hot built in-kernel) and batch padded to tile_b."""
    from diamond_tpu.ops.swipe_jax import make_profile, pad_band, pad_pow2

    qlen = len(query)
    band = pad_band(max(d1 - d0 for _, d0, d1 in jobs))
    C = max(0, -min(d0 for _, d0, _ in jobs))
    shifts = [d0 + C for _, d0, _ in jobs]
    # +8 all-delimiter columns: the kernel's software pipeline prefetches
    # column j+1's scores, so the walk needs a one-column margin (rounded
    # to the sublane granule)
    T = pad_pow2(max(len(t) + s for (t, _, _), s in zip(jobs, shifts)), 16) + 8
    B = (len(jobs) + tile_b - 1) // tile_b * tile_b
    tgt = np.full((B, T), 31, dtype=np.int32)
    band_mask = np.zeros((B, band), dtype=np.int32)
    for k, ((t, d0, d1), s) in enumerate(zip(jobs, shifts)):
        tgt[k, s : s + len(t)] = np.asarray(t, dtype=np.int32) & 31
        band_mask[k, : d1 - d0] = 1
    profile_pad = np.full((T + band, 32), NEG, dtype=np.int32)
    prof = make_profile(query, bias, matrix32, qlen)
    lo = -C
    i0 = max(0, lo)
    i1 = min(qlen, lo + T + band)
    if i1 > i0:
        profile_pad[i0 - lo : i1 - lo] = prof[i0:i1]
    # fp32-exactness bound for the kernel's MXU matmul: the one-hot
    # contraction picks single integer entries, exact up to 2^24 in fp32
    fin = profile_pad[profile_pad != NEG]
    if len(fin) and int(np.abs(fin).max()) >= (1 << 24):
        raise ValueError("profile entry exceeds fp32-exact range")
    meta = {"C": C, "shifts": shifts, "band": band}
    return (jnp.asarray(tgt.T.copy()), jnp.asarray(band_mask),
            jnp.asarray(profile_pad), band, meta)
