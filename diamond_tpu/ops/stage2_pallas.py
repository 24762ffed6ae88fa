"""Pallas TPU kernel for the stage-1/2 seeding filter over host-pregathered
window tiles (the design named in PERF.md's seeding routing verdict).

Contrast with ops/stage12_jax.Stage12Device, which keeps the letter blocks
device-resident and gathers the per-pair windows ON the device: here the
HOST gathers the 2*max_window letter windows around every candidate seed
pair and ships them as int8 tiles; the kernel then runs entirely out of
VMEM — substitution scores from a 32-wide one-hot MXU matmul, the
delimiter clip as iota compares against per-pair (wl, wr), and the
uint8-saturating Kadane scan (reference src/search/stage2.h:74-154 +
src/dp/ungapped_simd.cpp) as a sequential walk over the window axis.

Exact integer parity with ops/stage12_jax._stage12_kernel (and therefore
with the fused native host pass in native/src/leftmost.cc); pinned by
tests/test_stage2_pallas.py on the CPU interpreter.

Measured verdict (PERF.md "Seeding on the chip"): the host pregather alone
costs about as much as the entire fused host pass — the tiles are ~100
random bytes per pair either way — so this kernel cannot beat the host
funnel end-to-end; it exists to replace the projection with a number.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(10 ** 9)
WINDOW_LEFT = 16   # fingerprint window [pos-16, pos+32)
FP_LEN = 48


def _make_kernel(W: int, max_window: int, hamming_id: int):
    def kernel(qw_ref, sw_ref, meta_ref, m2_ref, keep_ref, best_ref,
               ident_ref):
        tile = qw_ref.shape[1]
        lane32 = jax.lax.broadcasted_iota(jnp.int32, (tile, 32), 1)
        wl = meta_ref[0, :]
        wr = meta_ref[1, :]
        cut = meta_ref[2, :]
        m2f = m2_ref[:].astype(jnp.float32)

        def step(w, carry):
            st, best, ident = carry
            q = qw_ref[w, :]                               # [tile]
            s = sw_ref[w, :]
            # substitution score: one-hot(q) @ M2, row-selected by
            # one-hot(s) — fp32 exact for small-int matrix entries
            oh_q = (q[:, None] == lane32).astype(jnp.float32)
            qm = jax.lax.dot_general(
                oh_q, m2f, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [tile, 32]
            oh_s = (s[:, None] == lane32).astype(jnp.float32)
            vals = jnp.sum(qm * oh_s, axis=1).astype(jnp.int32)
            off = w - max_window                           # window offset
            valid = (off >= -wl) & (off < wr)
            vals = jnp.where(valid, vals, NEG)
            st = jnp.maximum(st + vals, 0)
            st = jnp.minimum(st, 255)      # uint8 saturation (stage2.h:113)
            best = jnp.maximum(best, st)
            in_fp = (off >= -WINDOW_LEFT) & (off < -WINDOW_LEFT + FP_LEN)
            ident = ident + jnp.where(in_fp & (q == s), 1, 0)
            return st, best, ident

        z = jnp.zeros((qw_ref.shape[1],), jnp.int32)
        st, best, ident = jax.lax.fori_loop(0, W, step, (z, z, z))
        keep = ((ident >= hamming_id) & (best > cut)).astype(jnp.int32)
        # [tile] lane vectors can't reshape onto sublanes in Mosaic, and
        # 1-row blocks are rejected; broadcast to the 8-row block instead
        # (row 0 is read back outside)
        shp = keep_ref.shape
        keep_ref[:] = jnp.broadcast_to(keep[None, :], shp)
        best_ref[:] = jnp.broadcast_to(best[None, :], shp)
        ident_ref[:] = jnp.broadcast_to(ident[None, :], shp)

    return kernel


@partial(jax.jit,
         static_argnames=("hamming_id", "max_window", "tile_n", "interpret"))
def stage2_pallas(qw8, sw8, meta, m2, hamming_id: int, max_window: int,
                  tile_n: int = 512, interpret: bool = False):
    """qw8/sw8 [W, N] int8 pregathered windows (W = 2*max_window, raw
    letters &31); meta [8, N] int32 rows (wl, wr, cutoff, 0...); m2
    [32, 32] int32.  N must be a multiple of tile_n.  Returns (keep [N]
    bool, best [N] int32, ident [N] int32)."""
    W, N = qw8.shape
    assert N % tile_n == 0
    qw = qw8.astype(jnp.int32)
    sw = sw8.astype(jnp.int32)
    kernel = _make_kernel(W, max_window, hamming_id)
    grid = (N // tile_n,)
    out_shape = [jax.ShapeDtypeStruct((N // tile_n * 8, tile_n),
                                      jnp.int32)] * 3
    keep, best, ident = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((W, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 32), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((8, tile_n), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(qw, sw, meta, m2)

    def row0(o):
        return o.reshape(N // tile_n, 8, tile_n)[:, 0, :].reshape(N)

    return (row0(keep) != 0, row0(best), row0(ident))


def pregather_windows(q_letters, s_letters, qp, sp, windows,
                      max_window: int = 48):
    """The HOST half of the pregathered design: gather the per-pair
    2*max_window letter windows and the query-side delimiter clips
    (wl, wr) — the same clip semantics as stage12_jax._stage12_kernel.

    Returns (qw8 [W, N] int8, sw8 [W, N] int8, wl [N] int32, wr [N] int32).
    This is the cost that decides the routing verdict: ~4*max_window
    random bytes per pair, which is the same memory traffic as the entire
    fused host pass."""
    qp = np.asarray(qp, dtype=np.int64)
    sp = np.asarray(sp, dtype=np.int64)
    offs = np.arange(-max_window, max_window, dtype=np.int64)
    qw = q_letters[qp[:, None] + offs[None, :]]
    sw = s_letters[sp[:, None] + offs[None, :]]
    in_win = np.abs(offs)[None, :] < np.asarray(windows)[:, None]
    is_d = (qw == 31) & in_win
    left_half = is_d[:, :max_window][:, ::-1]
    has_l = left_half.any(axis=1)
    first_l = np.argmax(left_half, axis=1)
    wl = np.where(has_l, first_l, windows).astype(np.int32)
    right_half = is_d[:, max_window:]
    has_r = right_half.any(axis=1)
    first_r = np.argmax(right_half, axis=1)
    wr = np.where(has_r, first_r, windows).astype(np.int32)
    return ((qw & 31).T.astype(np.int8), (sw & 31).T.astype(np.int8),
            wl, wr)


def stage2_pregathered(q_letters, s_letters, qp, sp, windows, cutoffs,
                       matrix32, hamming_id: int, max_window: int = 48,
                       tile_n: int = 512, interpret: bool = False):
    """End-to-end pregathered stage-1/2: host gather + device kernel.
    Same (keep, scores) contract as Stage12Device.run."""
    n = len(qp)
    # the fingerprint window spans [-16, +32) and the Kadane walk is
    # clipped to max_window: narrower windows silently under-count
    if max_window < 32:
        raise ValueError("max_window must be >= 32 (fingerprint span)")
    if n and int(np.max(windows)) > max_window:
        raise ValueError("window exceeds max_window (Kadane walk would "
                         "be truncated)")
    qw8, sw8, wl, wr = pregather_windows(q_letters, s_letters, qp, sp,
                                         windows, max_window)
    cap = (n + tile_n - 1) // tile_n * tile_n
    W = 2 * max_window
    qw_p = np.full((W, cap), 31, dtype=np.int8)
    sw_p = np.full((W, cap), 31, dtype=np.int8)
    qw_p[:, :n] = qw8
    sw_p[:, :n] = sw8
    meta = np.zeros((8, cap), dtype=np.int32)
    meta[0, :n] = wl
    meta[1, :n] = wr
    meta[2, :n] = np.asarray(cutoffs, dtype=np.int32)
    meta[2, n:] = 2 ** 30
    m2 = np.ascontiguousarray(matrix32[:32, :32], dtype=np.int32)
    # interpret mode must bypass jit: jit-wrapped interpret pallas_calls
    # wedge on the axon plugin backend (same workaround as
    # tests/test_swipe_pallas.py)
    fn = stage2_pallas.__wrapped__ if interpret else stage2_pallas
    keep, best, _ = fn(jnp.asarray(qw_p), jnp.asarray(sw_p),
                       jnp.asarray(meta), jnp.asarray(m2),
                       hamming_id, max_window, tile_n, interpret)
    return np.asarray(keep)[:n], np.asarray(best)[:n]
