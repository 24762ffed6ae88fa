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

# A seed group (all query occurrences x all target occurrences) with at
# least this many candidate pairs runs stage 1 as a one-hot MXU matmul
# over its all-vs-all tile; smaller groups stay on the fused pair kernel
# (the VPU gather path) where MXU tiles would be mostly padding.
MATMUL_MIN_PAIRS = 512
TILE_Q = 8     # query occurrences per matmul tile
TILE_S = 128   # target occurrences per matmul tile (MXU lane width)


@partial(jax.jit, static_argnames=("TQ", "TS"))
def _stage1_matmul_kernel(q_letters, s_letters, qp_tile, sp_tile,
                          TQ: int, TS: int):
    """Stage-1 fingerprint identity counts as a one-hot MXU matmul
    (SURVEY §7; reference src/search/hamming/kernel.h:29-75 computes the
    same all-vs-all byte-match popcount with SIMD tiles).

    qp_tile [G, TQ] / sp_tile [G, TS]: int32 global seed positions of the
    query/target occurrences of one seed group per tile (padded entries
    repeat a valid position; the caller masks them out).  Each 48-letter
    fingerprint window becomes a 48x32 one-hot (bf16 — exact for 0/1
    values), and identity counts are the [G, TQ, TS] batched matmul over
    the contracted 1536 axis with fp32 accumulation (counts <= 48,
    exact)."""
    offs_fp = jnp.arange(-WINDOW_LEFT, -WINDOW_LEFT + FP_LEN,
                         dtype=jnp.int32)
    qw = q_letters[qp_tile[:, :, None] + offs_fp[None, None, :]] & 31
    sw = s_letters[sp_tile[:, :, None] + offs_fp[None, None, :]] & 31
    q1 = jax.nn.one_hot(qw, 32, dtype=jnp.bfloat16).reshape(
        qp_tile.shape[0], TQ, FP_LEN * 32)
    s1 = jax.nn.one_hot(sw, 32, dtype=jnp.bfloat16).reshape(
        sp_tile.shape[0], TS, FP_LEN * 32)
    counts = jax.lax.dot_general(
        q1, s1, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    return counts.astype(jnp.int32)


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

    def run_join(self, q_letters, s_letters, join, qp, sp, windows,
                 cutoffs, hamming_id: int):
        """Like run(), but with the seed-group structure available:
        large all-vs-all groups run stage 1 as the one-hot MXU matmul
        (one [TILE_Q, TILE_S] tile per sub-block), and only their
        survivors (plus every small-group pair) reach the fused pair
        kernel.  Results stay aligned with the expanded (qp, sp) pair
        order, so output bytes are unchanged."""
        import time as _time

        global dispatch_count, dispatch_wait_s
        q_counts = np.diff(join.q_start)
        s_counts = np.diff(join.s_start)
        totals = (q_counts * s_counts).astype(np.int64)
        big = np.nonzero(totals >= MATMUL_MIN_PAIRS)[0]
        if len(big) == 0:
            return self.run(q_letters, s_letters, qp, sp, windows, cutoffs,
                            hamming_id)
        t0 = _time.perf_counter()
        n = len(qp)
        pair_starts = np.zeros(len(totals) + 1, dtype=np.int64)
        np.cumsum(totals, out=pair_starts[1:])
        is_big = np.zeros(n, dtype=bool)
        for g in big:
            is_big[pair_starts[g] : pair_starts[g + 1]] = True
        keep1 = np.zeros(n, dtype=bool)

        tiles = []  # (group, q_lo, s_lo)
        for g in big:
            for ql in range(0, int(q_counts[g]), TILE_Q):
                for sl in range(0, int(s_counts[g]), TILE_S):
                    tiles.append((int(g), ql, sl))
        ql_dev = self._block(q_letters)
        sl_dev = self._block(s_letters)
        GCAP = 1024
        pos = 0
        while pos < len(tiles):
            chunk = tiles[pos : pos + GCAP]
            pos += len(chunk)
            G = 1 << max(int(np.ceil(np.log2(len(chunk)))), 0)
            qp_t = np.empty((G, TILE_Q), dtype=np.int32)
            sp_t = np.empty((G, TILE_S), dtype=np.int32)
            for k in range(G):
                g, ql, sl = chunk[min(k, len(chunk) - 1)]
                qs = join.q_pos[join.q_start[g] + ql :
                                join.q_start[g] + min(ql + TILE_Q,
                                                      q_counts[g])]
                ss = join.s_pos[join.s_start[g] + sl :
                                join.s_start[g] + min(sl + TILE_S,
                                                      s_counts[g])]
                qp_t[k, : len(qs)] = qs
                qp_t[k, len(qs) :] = qs[0]
                sp_t[k, : len(ss)] = ss
                sp_t[k, len(ss) :] = ss[0]
            dispatch_count += 1
            counts = np.asarray(_stage1_matmul_kernel(
                ql_dev, sl_dev, jnp.asarray(qp_t), jnp.asarray(sp_t),
                TILE_Q, TILE_S))
            for k, (g, ql, sl) in enumerate(chunk):
                nq = min(TILE_Q, int(q_counts[g]) - ql)
                ns = min(TILE_S, int(s_counts[g]) - sl)
                rows = (pair_starts[g] + (ql + np.arange(nq)[:, None])
                        * s_counts[g] + sl + np.arange(ns)[None, :])
                keep1[rows.ravel()] = \
                    (counts[k, :nq, :ns] >= hamming_id).ravel()
        dispatch_wait_s += _time.perf_counter() - t0

        sel = np.nonzero(~is_big | keep1)[0]
        keep = np.zeros(n, dtype=bool)
        scores = np.zeros(n, dtype=np.int32)
        if len(sel):
            k2, s2 = self.run(q_letters, s_letters, qp[sel], sp[sel],
                              windows[sel], cutoffs[sel], hamming_id)
            keep[sel] = k2
            scores[sel] = s2
        return keep, scores

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
