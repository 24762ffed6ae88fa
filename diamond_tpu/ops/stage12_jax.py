"""Device stage-1/2 seeding filters (jax/XLA).

The two seeding hot loops (reference src/search/hamming/kernel.h:29-75
fingerprint filter, stage2.h:74-154 + dp/ungapped_simd.cpp window scan)
as one batched device computation over flat candidate-pair arrays:

- stage 1: identity count of the 48-letter windows around each (query,
  subject) seed pair — a masked equality reduction over the gathered
  windows (the letter blocks ship once per block; the per-pair window
  gathers happen on device).
- stage 2: best ungapped segment score on the seed diagonal within the
  query-side delimiter-clipped window — a vectorized Kadane scan over
  the window axis, with the uint8 saturation of the reference's SIMD
  path.

Exact integer parity with the fused native host pass
(native/src/leftmost.cc stage12_pipeline); the left-most dedup stays on
the host (bit-level pattern tables).  Enabled with DIAMOND_TPU_STAGE12=1
(the tunneled bench chip pays ~1s dispatch latency per call, so the
host path is the default route there; co-located TPU hosts flip it on).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG = -(10 ** 9)
WINDOW_LEFT = 16
FP_LEN = 48


@partial(jax.jit, static_argnames=("hamming_id", "max_window"))
def _stage12_kernel(q_letters, s_letters, m32, qp, sp, windows, cutoffs,
                    hamming_id: int, max_window: int):
    """qp/sp [N] int32 global seed positions; windows/cutoffs [N] int32.
    Returns (keep [N] bool, scores [N] int32)."""
    delim = jnp.int8(31)
    offs_fp = jnp.arange(-WINDOW_LEFT, -WINDOW_LEFT + FP_LEN,
                         dtype=jnp.int32)
    qw = q_letters[qp[:, None] + offs_fp[None, :]]
    sw = s_letters[sp[:, None] + offs_fp[None, :]]
    ident = jnp.sum((qw & 31) == (sw & 31), axis=1)
    keep1 = ident >= hamming_id

    offs = jnp.arange(-max_window, max_window, dtype=jnp.int32)
    qw2 = q_letters[qp[:, None] + offs[None, :]]
    sw2 = s_letters[sp[:, None] + offs[None, :]]
    # query-side delimiter clip within the per-pair window
    in_win = jnp.abs(offs)[None, :] < windows[:, None]
    is_d = (qw2 == delim) & in_win
    left_half = is_d[:, :max_window][:, ::-1]   # index 0 = pos-1
    has_l = left_half.any(axis=1)
    first_l = jnp.argmax(left_half, axis=1)
    wl = jnp.where(has_l, first_l, windows)
    right_half = is_d[:, max_window:]
    has_r = right_half.any(axis=1)
    first_r = jnp.argmax(right_half, axis=1)
    wr = jnp.where(has_r, first_r, windows)

    # substitution scores via a 1024-entry table gather
    vals = m32[(qw2.astype(jnp.int32) & 31) * 32
               + (sw2.astype(jnp.int32) & 31)]
    valid = (offs[None, :] >= -wl[:, None]) & (offs[None, :] < wr[:, None])
    vals = jnp.where(valid, vals, NEG)

    def kadane(carry, v):
        st, best = carry
        st = jnp.maximum(st + v, 0)
        st = jnp.minimum(st, 255)   # uint8 saturation (stage2.h:113)
        best = jnp.maximum(best, st)
        return (st, best), None

    z = jnp.zeros(qp.shape[0], dtype=jnp.int32)
    (st, best), _ = jax.lax.scan(kadane, (z, z), vals.T)
    return keep1 & (best > cutoffs), best


# Dispatch telemetry (always on): bench.py reads these after an e2e run.
dispatch_count = 0
dispatch_pairs = 0
dispatch_wait_s = 0.0   # wall time inside run (send+compute+read)


def reset_dispatch_stats():
    global dispatch_count, dispatch_pairs, dispatch_wait_s
    dispatch_count = 0
    dispatch_pairs = 0
    dispatch_wait_s = 0.0


class Stage12Device:
    """Device twin of the fused native stage-1/2 pass."""

    def __init__(self, matrix32, chunk: int = 1 << 20):
        self.matrix_flat = jnp.asarray(
            np.ascontiguousarray(matrix32, dtype=np.int32).reshape(-1))
        self.chunk = chunk
        self._dev_blocks = {}

    def _block(self, letters):
        key = id(letters)
        d = self._dev_blocks.get(key)
        if d is None:
            d = jnp.asarray(np.ascontiguousarray(letters, dtype=np.int8))
            self._dev_blocks[key] = d
        return d

    def run(self, q_letters, s_letters, qp, sp, windows, cutoffs,
            hamming_id: int):
        import time as _time

        global dispatch_wait_s
        _t0 = _time.perf_counter()
        try:
            return self._run(q_letters, s_letters, qp, sp, windows,
                             cutoffs, hamming_id)
        finally:
            dispatch_wait_s += _time.perf_counter() - _t0

    def _run(self, q_letters, s_letters, qp, sp, windows, cutoffs,
             hamming_id: int):
        """All-numpy in/out; chunks the pair list to bound device memory.
        Returns (keep bool [N], scores int32 [N])."""
        ql = self._block(q_letters)
        sl = self._block(s_letters)
        n = len(qp)
        keep = np.empty(n, dtype=bool)
        scores = np.empty(n, dtype=np.int32)
        max_window = int(windows.max()) if n else 48
        global dispatch_count, dispatch_pairs
        for lo in range(0, n, self.chunk):
            hi = min(lo + self.chunk, n)
            m = hi - lo
            dispatch_count += 1
            dispatch_pairs += m
            # pad to a pow2 bucket so compile shapes stay few
            cap = 1 << max(int(np.ceil(np.log2(max(m, 1024)))), 10)
            pad = cap - m

            def arr(a, fill):
                out = np.full(cap, fill, dtype=np.int32)
                out[:m] = a[lo:hi].astype(np.int32)
                return jnp.asarray(out)

            k, sc = _stage12_kernel(
                ql, sl, self.matrix_flat,
                arr(qp, 256), arr(sp, 256),  # pad points at block padding
                arr(windows, 1), arr(cutoffs, 2 ** 30),
                hamming_id, max_window)
            keep[lo:hi] = np.asarray(k)[:m]
            scores[lo:hi] = np.asarray(sc)[:m]
        return keep, scores
