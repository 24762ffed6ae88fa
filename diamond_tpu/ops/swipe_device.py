"""Cross-query batched banded-SWIPE scheduling for the TPU.

The round-1 kernel (ops/swipe_pallas.py) batches the DP jobs of ONE query
per call: the query profile is shared by every tile of the batch.  Real
searches produce tens-to-hundreds of jobs per query — far too few to feed
the chip — so this module generalizes the kernel with a *per-tile profile*:
the grid gains one flat tile axis, every tile holds the jobs of a single
query, and a stacked [G, T+band, 32] profile array gives each tile its own
query profile.  One pallas_call then serves the banded DP of an entire
wave of queries (the reference's per-thread `align_queries` partition,
src/align/align.cpp:203-269, becomes a device mega-batch).

Compile-shape discipline: the jit signature is (T, band, G, tile_b), so
T and band are pow2-quantized, G is drawn from a fixed pow2 ladder (big
batches split into G_CAP-sized calls), and targets ship per fixed-size call.  All
pallas calls of a run_many dispatch asynchronously before any result is
read back, so host packing overlaps device compute.  A persistent XLA
compilation cache (JAX_COMPILATION_CACHE_DIR or /tmp) amortizes the
remaining compiles across processes.

Scores are exact int32 (same math as the numpy oracle
ops/banded_swipe.py; see tests/test_swipe_pallas.py, tests/test_device.py).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diamond_tpu.ops.swipe_jax import pad_band, pad_pow2

NEG = -(2 ** 20)

# Per-job cell cap for the device path: jobs above this (huge full-matrix
# bands) fall back to the host C++ batch.  Bounded by VMEM: the t_idx
# block pads tile_b to 128 lanes, so its footprint is T*128*4 bytes
# (double-buffered), plus the (T+band, 32->128-lane) profile block —
# T=4096 with band<=512 stays under the ~16 MB scoped VMEM limit.
MAX_DEVICE_T = 4096
MAX_DEVICE_BAND = 512
MAX_DEVICE_CELLS = 2 << 20

G_CAP = 128  # tiles per pallas call; larger batches loop at this size

# Queries per tile: each tile packs SLOTS query slots of SLOT_ROWS job
# rows; the profile widens to SLOTS*32 one-hot columns (K=128 exactly
# fills the MXU's contraction dim, so the widened matmul costs the same
# MXU pass as K=32).  Real extension waves carry only ~2-6 DP jobs per
# query, so one-query-per-tile packing left >90% of tile rows dead —
# this is the occupancy fix (VERDICT r03: 4.5G padded vs 0.5G real
# cells).
SLOTS = 4  # per-tile query slots; slot rows = tile_b // SLOTS


# Dispatch telemetry (always on; two int adds per pallas call).  bench.py
# reads these after an e2e run to report the device call count and the
# padded cell volume, and to derive the co-located latency projection.
dispatch_count = 0
dispatch_cells = 0
dispatch_wait_s = 0.0   # wall time inside run_many (pack+send+compute+read)


def reset_dispatch_stats():
    global dispatch_count, dispatch_cells, dispatch_wait_s
    dispatch_count = 0
    dispatch_cells = 0
    dispatch_wait_s = 0.0


HOST_DP_GCUPS = 1.5e9  # measured striped16 AVX-512 rate (PERF.md)

_measured_min_cells: int | None = None


def _measure_dispatch_latency() -> float:
    """One tiny jit dispatch+readback, best of 2 (seconds).  A co-located
    chip measures ~1e-4; this dev host's tunneled chip ~1s."""
    import time

    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.int32)
    jax.block_until_ready(f(x))  # compile
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def _min_device_cells() -> int:
    """Cost-based routing threshold: a job goes to the device only when its
    padded cell count is at least this (smaller jobs run faster on the
    host C++ path once per-dispatch latency is counted).

    DIAMOND_TPU_DP_MIN_CELLS pins it (0 sends every job to the chip).
    Unset, the threshold is MEASURED at first use: dispatch latency x the
    host engine's ~1.5 GCUPS — a co-located chip (~0.1-1 ms dispatch)
    gets a ~0.2-1.5M-cell threshold and absorbs the heavy tail, while
    this dev host's ~1 s tunnel prices essentially all extension jobs
    onto the host path (the kernel benchmarks, --swipe and the stage-1/2
    device twins still exercise the chip)."""
    v = os.environ.get("DIAMOND_TPU_DP_MIN_CELLS")
    if v is not None and v != "":
        return int(v)
    global _measured_min_cells
    if _measured_min_cells is None:
        try:
            lat = _measure_dispatch_latency()
        except Exception:
            lat = 1.0
        _measured_min_cells = max(256 * 1024, int(lat * HOST_DP_GCUPS))
    return _measured_min_cells

_cache_set = False


def _ensure_compile_cache():
    """Persistent XLA compilation cache so kernel shapes compile once per
    machine, not once per process."""
    global _cache_set
    if _cache_set:
        return
    _cache_set = True
    try:
        d = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           f"/tmp/diamond_tpu_xla_cache_{os.getuid()}")
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def _prefix_max_shift(g, band):
    """Inclusive prefix max along axis 1 via log-depth shifts."""
    shift = 1
    while shift < band:
        rolled = pltpu.roll(g, shift, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
        g = jnp.maximum(g, jnp.where(col >= shift, rolled, NEG))
        shift *= 2
    return g


def _make_kernel(T: int, band: int, go: int, ge: int, K: int = 32):
    def kernel(t_idx_ref, band_mask_ref, profile_ref, best_ref, maxcol_ref,
               maxrow_ref, H_scr, E_scr, S_scr):
        TB = H_scr.shape[0]
        r_ge = jax.lax.broadcasted_iota(jnp.int32, (TB, band), 1) * ge
        col = jax.lax.broadcasted_iota(jnp.int32, (TB, band), 1)
        bmask = band_mask_ref[:] != 0
        lane32 = jax.lax.broadcasted_iota(jnp.int32, (TB, K), 1)

        H_scr[:] = jnp.zeros((TB, band), jnp.int32)
        E_scr[:] = jnp.zeros((TB, band), jnp.int32)

        def col_scores(j):
            # fp32 one-hot matmul: exact for |score| < 2^24 incl. the NEG
            # sentinel (bf16 would truncate it).  With K = SLOTS*32 the
            # letter value carries its slot offset, selecting that
            # slot's 32 profile columns.
            letters = t_idx_ref[j, :]                         # [TB] int32
            onehot = (letters[:, None] == lane32).astype(jnp.float32)
            prof = profile_ref[pl.ds(j, band), :]             # [band, K]
            return jax.lax.dot_general(
                onehot, prof.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)

        def col_step(j, carry):
            # software pipeline (see ops/swipe_pallas.py): column j's
            # scores come from the S_scr scratch filled in iteration
            # j-1, so the MXU matmul for j+1 overlaps this iteration's
            # VPU chain; pad_T adds the 8-column prefetch margin.
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
        best, maxcol, maxrow = jax.lax.fori_loop(0, T - 8, col_step,
                                                 (z, z, z))
        best_ref[:] = best.reshape(best_ref.shape)
        maxcol_ref[:] = maxcol.reshape(maxcol_ref.shape)
        maxrow_ref[:] = maxrow.reshape(maxrow_ref.shape)

    return kernel


@partial(jax.jit,
         static_argnames=("go", "ge", "band", "T", "tile_b", "interpret"))
def banded_swipe_pallas_multi(t_idx8, band_mask8, q_let8, q_bias8, q_valid8,
                              matrix32, go: int, ge: int,
                              band: int, T: int, tile_b: int = 32,
                              interpret: bool = False):
    """Multi-query banded SWIPE with on-device profile construction.

    Each tile packs SLOTS query slots of SLOT_ROWS job rows; the tile's
    profile is the horizontal concat of its slots' 32-column profiles
    (K = SLOTS*32 = 128, exactly the MXU contraction width), and target
    letters carry their slot offset (letter + 32*slot, int8-safe).

    Host->device transfer is int8 only: t_idx8 [G*T, tile_b] shifted,
    slot-offset target letters (tile g's columns are rows [g*T, (g+1)*T));
    band_mask8 [G*tile_b, band]; q_let8/q_bias8/q_valid8 [G*SLOTS*(T+band)]
    query letters / Hauser bias / in-query flags per (tile, slot) profile
    row.  The int32 profile (matrix row + bias, NEG outside the query) is
    built here with a one-hot MXU matmul, so the widened profile never
    crosses the host boundary.  Returns (best [B], max_col [B],
    max_rowband [B]), B = G*tile_b.
    """
    GT, _tb = t_idx8.shape
    T_pb = T + band
    G = GT // T
    B = G * tile_b
    K = SLOTS * 32
    assert _tb == tile_b and q_let8.shape[0] == G * SLOTS * T_pb
    lanes = jnp.arange(32, dtype=jnp.int32)[None, :]
    onehot = (q_let8.astype(jnp.int32)[:, None] == lanes).astype(jnp.float32)
    prof = jax.lax.dot_general(
        onehot, matrix32.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    prof = prof + q_bias8.astype(jnp.int32)[:, None]
    prof = jnp.where(q_valid8.astype(jnp.int32)[:, None] != 0, prof, NEG)
    # [G*SLOTS*T_pb, 32] -> [G*T_pb, SLOTS*32] (slot s occupies columns
    # [32s, 32s+32) of its tile's profile rows)
    profiles = prof.reshape(G, SLOTS, T_pb, 32).transpose(0, 2, 1, 3) \
        .reshape(G * T_pb, K)
    t_idx = t_idx8.astype(jnp.int32)
    band_mask = band_mask8.astype(jnp.int32)
    kernel = _make_kernel(T, band, go, ge, K)
    out_shape = [jax.ShapeDtypeStruct((G * 8, tile_b // 8), jnp.int32)] * 3
    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((T, tile_b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, band), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_pb, K), lambda i: (i, 0),
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
        interpret=interpret,
    )(t_idx, band_mask, profiles)
    return tuple(o.reshape(B) for o in out)


def banded_swipe_pallas_sharded(mesh, t_idx8, band_mask8, q_let8, q_bias8,
                                q_valid8, matrix32, go: int, ge: int,
                                band: int, T: int, tile_b: int = 32,
                                interpret: bool = False):
    """Mesh-sharded multi-query banded SWIPE: tiles split across the
    mesh's 'db' axis (G divisible by the device count); each device runs
    the pallas kernel over its tile shard (the reference's multi-process
    DB sharding, double_indexed.cpp:346-396, as ICI-parallel tiles)."""
    from jax.sharding import PartitionSpec as P

    def per_shard(ti, bm, ql, qb, qv):
        return banded_swipe_pallas_multi(ti, bm, ql, qb, qv, matrix32,
                                         go, ge, band, T, tile_b, interpret)

    fn = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("db", None), P("db", None), P("db"), P("db"), P("db")),
        out_specs=(P("db"), P("db"), P("db")),
        check_vma=False,
    )
    return fn(t_idx8, band_mask8, q_let8, q_bias8, q_valid8)


def job_fits_device(tgt_len: int, d0: int, d1: int) -> bool:
    band = pad_band(d1 - d0)
    T = pad_T(tgt_len + max(0, -d0))
    cells = T * band
    # pad_T returns ladder + 8 pipeline-margin columns; the margin does
    # not count against the VMEM tier limit (T=4096-class shapes fit)
    return (T <= MAX_DEVICE_T + 8 and band <= MAX_DEVICE_BAND
            and cells <= MAX_DEVICE_CELLS
            and cells >= _min_device_cells())


# target-length quantization ladder: ~1.5x steps instead of pow2 —
# halves the dead-column waste for ~1.5x the compile-shape count (all
# shapes land in the persistent XLA cache)
_T_LADDER = (16, 32, 64, 128, 256, 384, 512, 768, 1024, 1536, 2048,
             3072, 4096)


def pad_T(x: int) -> int:
    # +8 all-delimiter columns: the kernel's software pipeline prefetches
    # column j+1's scores (see _make_kernel), so the walk needs a
    # one-column margin rounded to the sublane granule
    for n in _T_LADDER:
        if n >= x:
            return n + 8
    return pad_pow2(x, 16) + 8


class _Group:
    """The jobs of one request that share a padded band."""

    __slots__ = ("req", "idx", "jobs", "C", "shifts", "band", "T")

    def __init__(self, req: int, idx: list, jobs: list, band: int):
        self.req = req
        self.idx = idx          # positions in the request's job list
        self.jobs = jobs
        self.band = band
        self.C = max(0, -min(d0 for _, d0, _ in jobs))
        self.shifts = [d0 + self.C for _, d0, _ in jobs]
        self.T = pad_T(max(len(t) + s
                           for (t, _, _), s in zip(jobs, self.shifts)))


class DeviceDP:
    """Cross-query score-only banded DP batcher.

    run_many(requests) with requests = [(query, bias_or_None, jobs)], jobs =
    [(target_letters, d_begin, d_end)], returns per-request lists of
    (score, subject_pos, query_pos) exactly like the score-only output of
    ops/banded_swipe.banded_swipe_batch_np.
    """

    def __init__(self, matrix32, gap_open: int, gap_extend: int,
                 tile_b: int = 16, interpret: bool = False, mesh=None):
        _ensure_compile_cache()
        self.mesh = mesh  # jax Mesh: tiles shard over its 'db' axis
        self.matrix32 = matrix32
        self._m32 = jnp.asarray(np.ascontiguousarray(matrix32,
                                                     dtype=np.int32))
        self.go = gap_open + gap_extend
        self.ge = gap_extend
        self.tile_b = tile_b
        self.interpret = interpret

    def run_many(self, requests):
        import time as _time

        global dispatch_wait_s
        _t0 = _time.perf_counter()
        try:
            return self._run_many(requests)
        finally:
            dispatch_wait_s += _time.perf_counter() - _t0

    def _run_many(self, requests):
        out = [[None] * len(jobs) for _, _, jobs in requests]
        # group jobs per request by (padded band, target-span bucket):
        # the span key keeps one long target from padding every short
        # job of the group to its T (--swipe requests carry thousands of
        # mixed-length full-band jobs per query)
        groups: list[_Group] = []
        for r, (_, _, jobs) in enumerate(requests):
            by_key: dict[tuple, list] = {}
            for k, (t, d0, d1) in enumerate(jobs):
                key = (pad_band(d1 - d0), pad_T(len(t) + max(0, -d0)))
                by_key.setdefault(key, []).append(k)
            for (band, _), idx in by_key.items():
                groups.append(_Group(r, idx, [jobs[k] for k in idx], band))
        # bucket groups by kernel shape
        buckets: dict[tuple, list[_Group]] = {}
        for g in groups:
            buckets.setdefault((g.T, g.band), []).append(g)
        # dispatch ALL calls first (async), then read back
        pending = []
        for (T, band), grps in buckets.items():
            pending.extend(self._dispatch_bucket(T, band, grps, requests))
        for dev_out, tiles, tile_b in pending:
            best, mc, mr = (np.asarray(o) for o in dev_out)
            slot_rows = tile_b // SLOTS
            for gnum, slotlist in enumerate(tiles):
                for snum, (g, lo, hi) in enumerate(slotlist):
                    base = gnum * tile_b + snum * slot_rows
                    for k in range(lo, hi):
                        row = base + k - lo
                        j_true = int(mc[row]) - g.shifts[k]
                        i_true = int(mc[row]) - g.C + int(mr[row])
                        out[g.req][g.idx[k]] = (int(best[row]), j_true,
                                                i_true)
        return out

    def _dispatch_bucket(self, T, band, grps, requests):
        # slot chunks (one group's jobs, <= SLOT_ROWS each), then SLOTS
        # chunks per tile — tiles mix queries, so occupancy tracks the
        # real job count instead of jobs-per-query
        slot_rows = self.tile_b // SLOTS
        slots = []
        for g in grps:
            for lo in range(0, len(g.jobs), slot_rows):
                slots.append((g, lo, min(lo + slot_rows, len(g.jobs))))
        tiles = [slots[i : i + SLOTS] for i in range(0, len(slots), SLOTS)]
        # fixed pow2 call sizes for compile reuse
        pending = []
        pos = 0
        g_min = self.mesh.devices.size if self.mesh is not None else 1
        while pos < len(tiles):
            n_left = len(tiles) - pos
            G = G_CAP if n_left >= G_CAP else max(pad_pow2(n_left, 1),
                                                  g_min)
            chunk = tiles[pos : pos + min(G, n_left)]
            pos += len(chunk)
            pending.append(self._launch(T, band, G, chunk, requests))
        return pending

    def _launch(self, T, band, G, tiles, requests):
        global dispatch_count, dispatch_cells
        dispatch_count += 1
        dispatch_cells += G * self.tile_b * T * band
        tile_b = self.tile_b
        B = G * tile_b
        T_pb = T + band
        t_idx = np.full((B, T), 31, dtype=np.int8)
        band_mask = np.zeros((B, band), dtype=np.int8)
        q_let = np.zeros((G, SLOTS, T_pb), dtype=np.int8)
        q_bias = np.zeros((G, SLOTS, T_pb), dtype=np.int8)
        q_valid = np.zeros((G, SLOTS, T_pb), dtype=np.int8)
        slot_rows = tile_b // SLOTS
        for gnum, slotlist in enumerate(tiles):
            for snum, (g, lo, hi) in enumerate(slotlist):
                base = gnum * tile_b + snum * slot_rows
                off = np.int8(32 * snum)
                for k in range(lo, hi):
                    t, d0, d1 = g.jobs[k]
                    s = g.shifts[k]
                    row = base + k - lo
                    t_idx[row, s : s + len(t)] = \
                        (np.asarray(t, dtype=np.int8) & 31) + off
                    band_mask[row, : d1 - d0] = 1
                query, bias, _ = requests[g.req]
                qlen = len(query)
                lo_q = -g.C  # profile row j maps to query index lo_q + j
                i0 = max(0, lo_q)
                i1 = min(qlen, lo_q + T_pb)
                if i1 > i0:
                    q_let[gnum, snum, i0 - lo_q : i1 - lo_q] = \
                        np.asarray(query[i0:i1], dtype=np.int8) & 31
                    q_valid[gnum, snum, i0 - lo_q : i1 - lo_q] = 1
                    if bias is not None:
                        q_bias[gnum, snum, i0 - lo_q : i1 - lo_q] = \
                            np.asarray(bias[i0:i1], dtype=np.int8)
        t2 = np.ascontiguousarray(
            t_idx.reshape(G, tile_b, T).swapaxes(1, 2)).reshape(G * T,
                                                                tile_b)
        if self.mesh is not None:
            dev_out = banded_swipe_pallas_sharded(
                self.mesh, jnp.asarray(t2), jnp.asarray(band_mask),
                jnp.asarray(q_let.reshape(G * SLOTS * T_pb)),
                jnp.asarray(q_bias.reshape(G * SLOTS * T_pb)),
                jnp.asarray(q_valid.reshape(G * SLOTS * T_pb)),
                self._m32, self.go, self.ge, band, T, tile_b,
                self.interpret)
        else:
            dev_out = banded_swipe_pallas_multi(
                jnp.asarray(t2), jnp.asarray(band_mask),
                jnp.asarray(q_let.reshape(G * SLOTS * T_pb)),
                jnp.asarray(q_bias.reshape(G * SLOTS * T_pb)),
                jnp.asarray(q_valid.reshape(G * SLOTS * T_pb)),
                self._m32, self.go, self.ge, band, T, tile_b,
                self.interpret)
        return dev_out, tiles, tile_b


# ---------------------------------------------------------------------------
# --swipe sweep: device-resident target chunks
# ---------------------------------------------------------------------------

def _make_kernel_sweep(T: int, band: int, go: int, ge: int):
    """Full-matrix sweep kernel: like _make_kernel but the band validity
    comes from a per-row band length (r < qlen + tlen_row - 1) instead of
    a shipped [TB, band] mask, and the single query profile block is
    shared by every tile — so the target block (t_idx) is the only large
    input and it lives on device across calls."""
    def kernel(t_idx_ref, band_len_ref, profile_ref, best_ref, maxcol_ref,
               maxrow_ref, H_scr, E_scr):
        TB = H_scr.shape[0]
        r_ge = jax.lax.broadcasted_iota(jnp.int32, (TB, band), 1) * ge
        col = jax.lax.broadcasted_iota(jnp.int32, (TB, band), 1)
        bl = band_len_ref[0, 0, :]                         # [TB] int32
        bmask = col < bl[:, None]
        lane32 = jax.lax.broadcasted_iota(jnp.int32, (TB, 32), 1)

        H_scr[:] = jnp.zeros((TB, band), jnp.int32)
        E_scr[:] = jnp.zeros((TB, band), jnp.int32)

        def col_step(j, carry):
            best, maxcol, maxrow = carry
            letters = t_idx_ref[j, :]
            onehot = (letters[:, None] == lane32).astype(jnp.float32)
            prof = profile_ref[pl.ds(j, band), :]
            scores = jax.lax.dot_general(
                onehot, prof.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            scores = jnp.where(bmask, scores, NEG)
            valid = scores > NEG // 2

            H = H_scr[:]
            E = E_scr[:]
            cur0 = jnp.maximum(jnp.maximum(H + scores, E), 0)
            g = cur0 - go + r_ge
            gmax = _prefix_max_shift(g, band)
            F = jnp.maximum(gmax - r_ge, 0)
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
            E_next = pltpu.roll(E_out, band - 1, axis=1)
            E_next = jnp.where(col < band - 1, E_next, 0)
            H_scr[:] = Hn
            E_scr[:] = E_next
            return best, maxcol, maxrow

        z = jnp.zeros((TB,), jnp.int32)
        best, maxcol, maxrow = jax.lax.fori_loop(0, T, col_step, (z, z, z))
        best_ref[:] = best.reshape(best_ref.shape)
        maxcol_ref[:] = maxcol.reshape(maxcol_ref.shape)
        maxrow_ref[:] = maxrow.reshape(maxrow_ref.shape)

    return kernel


@partial(jax.jit,
         static_argnames=("go", "ge", "band", "T", "tile_b", "interpret"))
def banded_swipe_pallas_sweep(t_idx8, band_len32, q_let8, q_bias8, q_valid8,
                              matrix32, go: int, ge: int, band: int, T: int,
                              tile_b: int = 16, interpret: bool = False):
    """One query against a device-resident target chunk.

    t_idx8 [G*T, tile_b] int8 target letters (pass the SAME device array
    across calls — it is transferred once); band_len32 [G, 8, tile_b]
    int32 per-row full-band widths in plane 0 (qlen + tlen - 1, 0 = dead
    row; the 8-row plane axis satisfies Mosaic's sublane block minimum);
    q_let8/q_bias8/q_valid8 [T_pb] the query profile rows (row j = query
    index j - C_chunk).  Returns (best, max_col, max_row) per row
    [G*tile_b]."""
    GT, _tb = t_idx8.shape
    T_pb = T + band
    G = GT // T
    B = G * tile_b
    lanes = jnp.arange(32, dtype=jnp.int32)[None, :]
    onehot = (q_let8.astype(jnp.int32)[:, None] == lanes).astype(jnp.float32)
    prof = jax.lax.dot_general(
        onehot, matrix32.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    prof = prof + q_bias8.astype(jnp.int32)[:, None]
    profiles = jnp.where(q_valid8.astype(jnp.int32)[:, None] != 0, prof, NEG)
    t_idx = t_idx8.astype(jnp.int32)
    kernel = _make_kernel_sweep(T, band, go, ge)
    out_shape = [jax.ShapeDtypeStruct((G * 8, tile_b // 8), jnp.int32)] * 3
    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((T, tile_b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile_b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_pb, 32), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((8, tile_b // 8), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tile_b, band), jnp.int32),
            pltpu.VMEM((tile_b, band), jnp.int32),
        ],
        interpret=interpret,
    )(t_idx, band_len32, profiles)
    return tuple(o.reshape(B) for o in out)


class SwipeSweep:
    """--swipe device scheduler: targets bucket by length class, each
    bucket's letter block ships to the device ONCE, and every query then
    sweeps the resident chunks with a ~KB profile transfer per call —
    the HBM-resident target block the full-matrix mode wants (the role
    of the reference's in-RAM block in full_db.cpp)."""

    QCLASS = 256  # query-length quantum for band bucketing

    def __init__(self, matrix32, gap_open: int, gap_extend: int,
                 tile_b: int = 16, interpret: bool = False):
        _ensure_compile_cache()
        self._m32 = jnp.asarray(np.ascontiguousarray(matrix32,
                                                     dtype=np.int32))
        self.go = gap_open + gap_extend
        self.ge = gap_extend
        self.tile_b = tile_b
        self.interpret = interpret

    def run(self, queries, targets):
        """queries: [(q_letters, bias_or_None)]; targets: [t_letters].
        Returns res[nq][nt] = (score, max_col, max_row)."""
        tile_b = self.tile_b
        order = sorted(range(len(targets)), key=lambda t: len(targets[t]))
        chunks = []   # (T, C, tidx_dev, rows: [target idx], tlen arr)
        cap = G_CAP * tile_b
        for lo in range(0, len(order), cap):
            rows = order[lo : lo + cap]
            tl = np.fromiter((len(targets[t]) for t in rows),
                             dtype=np.int64, count=len(rows))
            C = int(tl.max()) - 1
            T = pad_T(int(tl.max()))
            G = max(pad_pow2(-(-len(rows) // tile_b), 1), 1)
            t_idx = np.full((G * tile_b, T), 31, dtype=np.int8)
            for x, t in enumerate(rows):
                s = C - (int(tl[x]) - 1)
                t_idx[x, s : s + int(tl[x])] = \
                    np.asarray(targets[t], dtype=np.int8) & 31
            t2 = np.ascontiguousarray(
                t_idx.reshape(G, tile_b, T).swapaxes(1, 2)).reshape(
                    G * T, tile_b)
            chunks.append((T, C, G, jnp.asarray(t2), rows, tl))
        res = [[None] * len(targets) for _ in queries]
        pending = []
        for qi, (q, bias) in enumerate(queries):
            qlen = len(q)
            qclass = -(-max(qlen, 1) // self.QCLASS) * self.QCLASS
            for (T, C, G, t2, rows, tl) in chunks:
                band = pad_band(qclass + C)
                T_pb = T + band
                q_let = np.zeros(T_pb, dtype=np.int8)
                q_bias = np.zeros(T_pb, dtype=np.int8)
                q_valid = np.zeros(T_pb, dtype=np.int8)
                hi = min(C + qlen, T_pb)
                q_let[C : hi] = np.asarray(q[: hi - C], dtype=np.int8) & 31
                q_valid[C : hi] = 1
                if bias is not None:
                    q_bias[C : hi] = np.asarray(bias[: hi - C],
                                                dtype=np.int8)
                flat = np.zeros(G * tile_b, dtype=np.int32)
                flat[: len(rows)] = (qlen + tl - 1).astype(np.int32)
                bl = np.zeros((G, 8, tile_b), dtype=np.int32)
                bl[:, 0, :] = flat.reshape(G, tile_b)
                global dispatch_count, dispatch_cells
                dispatch_count += 1
                dispatch_cells += G * tile_b * T * band
                # interpret mode must bypass jit: jit-wrapped interpret
                # pallas_calls wedge on the axon plugin backend (same
                # workaround as stage2_pallas)
                fn = (banded_swipe_pallas_sweep.__wrapped__
                      if self.interpret else banded_swipe_pallas_sweep)
                dev = fn(
                    t2, jnp.asarray(bl),
                    jnp.asarray(q_let), jnp.asarray(q_bias),
                    jnp.asarray(q_valid), self._m32, self.go, self.ge,
                    band, T, tile_b, self.interpret)
                pending.append((qi, rows, tl, C, dev))
        import time as _time

        global dispatch_wait_s
        _t0 = _time.perf_counter()
        for qi, rows, tl, C, dev in pending:
            best, mc, mr = (np.asarray(o) for o in dev)
            for x, t in enumerate(rows):
                s = C - (int(tl[x]) - 1)
                j_true = int(mc[x]) - s
                i_true = j_true - (int(tl[x]) - 1) + int(mr[x])
                res[qi][t] = (int(best[x]), j_true, i_true)
        dispatch_wait_s += _time.perf_counter() - _t0
        return res


# ---------------------------------------------------------------------------
# --swipe full-matrix sweep, row-indexed: state indexed by QUERY position
# (Qpad lanes) instead of by diagonal, so the per-pair cell count is
# T x Qpad — independent of target length — where the diagonal-banded
# sweep above pays T x (qlen + tlen - 1).  This is the full-matrix twin
# of the reference's inter-sequence SWIPE (dp/swipe/full_swipe.h,
# full_matrix.h): lanes are query positions, the sublane axis carries
# tile_b targets, and the whole DB letter block lives on device across
# every query's calls.
# ---------------------------------------------------------------------------

def _make_kernel_full(T: int, Q: int, go: int, ge: int):
    """Score-only local affine SW, one column (target position) per
    fori step.  Recurrence (column j = target position, row i = query
    position):
      E[i][j] = max(H[i][j-1] - go, E[i][j-1] - ge)   (elementwise)
      F[i][j] = max(H[i-1][j] - go, F[i-1][j] - ge)   (lazy-F prefix max)
      H[i][j] = max(0, H[i-1][j-1] + S(q_i, t_j), E[i][j], F[i][j])
    Same lazy-F prefix-max formulation as _make_kernel_sweep; exact
    because go >= ge makes re-opening inside a gap non-optimal.  The
    column loop bound is the PER-TILE max target length (scalar
    prefetch), so trailing pad columns cost no compute — only transfer
    (the dead-column clamp of the host engines, and the role of the
    reference's per-channel target lengths in full_swipe.h)."""
    def kernel(bounds_ref, t_idx_ref, profile_ref, best_ref):
        TB = t_idx_ref.shape[1]
        g = pl.program_id(1)
        n_cols = bounds_ref[g]
        i_ge = jax.lax.broadcasted_iota(jnp.int32, (TB, Q), 1) * ge
        row = jax.lax.broadcasted_iota(jnp.int32, (TB, Q), 1)
        lane32 = jax.lax.broadcasted_iota(jnp.int32, (TB, 32), 1)
        prof_f = profile_ref[:].astype(jnp.float32)          # [Q, 32]

        def col_step(j, carry):
            H, E, bestH = carry
            letters = t_idx_ref[j, :]
            onehot = (letters[:, None] == lane32).astype(jnp.float32)
            scores = jax.lax.dot_general(
                onehot, prof_f,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            valid = scores > NEG // 2
            diag = pltpu.roll(H, 1, axis=1)
            diag = jnp.where(row >= 1, diag, 0)
            cur0 = jnp.maximum(jnp.maximum(diag + scores, E), 0)
            g2 = cur0 - go + i_ge
            gmax = _prefix_max_shift(g2, Q)
            F = jnp.maximum(gmax - i_ge, 0)
            Fs = pltpu.roll(F, 1, axis=1)
            Fs = jnp.where(row >= 1, Fs, 0)
            Hn = jnp.where(valid, jnp.maximum(cur0, Fs), 0)
            bestH = jnp.maximum(bestH, Hn)
            E_out = jnp.maximum(jnp.maximum(E - ge, Hn - go), 0)
            return Hn, E_out, bestH

        z = jnp.zeros((TB, Q), jnp.int32)
        _, _, bestH = jax.lax.fori_loop(0, n_cols, col_step, (z, z, z))
        best = jnp.max(bestH, axis=1)                        # [TB]
        best_ref[:] = best.reshape(best_ref.shape)

    return kernel


@partial(jax.jit,
         static_argnames=("go", "ge", "Q", "T", "tile_b", "interpret"))
def full_swipe_pallas_sweep(bounds32, t_idx8, q_let8, q_bias8, q_valid8,
                            matrix32, go: int, ge: int, Q: int, T: int,
                            tile_b: int = 16, interpret: bool = False):
    """NQ queries x (G * tile_b) device-resident targets in one call.

    bounds32 [G] int32 per-tile column counts (max target length in the
    tile; 0 = dead tile, costs nothing); t_idx8 [G*T, tile_b] int8 target
    letters (pass the SAME device array across calls — transferred once
    per target chunk); q_let8 / q_bias8 / q_valid8 [NQ*Q] int8 query
    profile rows.  Profiles are built in-jit (one-hot MXU matmul), so
    the per-call host->device traffic is ~3*NQ*Q bytes.  Returns best
    scores [NQ, G*tile_b] int32."""
    GT, _tb = t_idx8.shape
    G = GT // T
    NQ = q_let8.shape[0] // Q
    lanes = jnp.arange(32, dtype=jnp.int32)[None, :]
    onehot = (q_let8.astype(jnp.int32)[:, None] == lanes).astype(jnp.float32)
    prof = jax.lax.dot_general(
        onehot, matrix32.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    prof = prof + q_bias8.astype(jnp.int32)[:, None]
    profiles = jnp.where(q_valid8.astype(jnp.int32)[:, None] != 0, prof, NEG)
    t_idx = t_idx8.astype(jnp.int32)
    kernel = _make_kernel_full(T, Q, go, ge)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NQ, G),
        in_specs=[
            pl.BlockSpec((T, tile_b), lambda q, g, b: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, 32), lambda q, g, b: (q, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile_b // 8), lambda q, g, b: (q * G + g, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NQ * G * 8, tile_b // 8), jnp.int32),
        interpret=interpret,
    )(bounds32, t_idx, profiles)
    return out.reshape(NQ, G * tile_b)


# --swipe shape ladders: every axis is quantized so the set of compiled
# kernel shapes stays small while dead padding costs (almost) nothing:
# pad COLUMNS cost transfer only (per-tile dynamic loop bound), dead
# TILES cost nothing (bound 0), and dead QUERY grid steps (valid=0,
# ragged last group padded up the NQ ladder) cost only their sweep's
# all-zero compute — microseconds against a per-call tunnel overhead of
# tens of ms.
_FULL_T_TIERS = (512, 2048, 8192)       # target-length tiers
_FULL_G = {512: 512, 2048: 128, 8192: 16}   # tiles per call by tier
_FULL_NQ = (32, 16, 8, 4, 2, 1)         # query-group size ladder (pow2)


def _full_q_pad(qlen: int) -> int:
    """Query rows padded to a ~1.25x ladder (lane width: multiples of
    128)."""
    for n in (128, 256, 384, 512, 640, 768, 1024, 1280, 1536, 2048,
              2560, 3072, 4096, 6144, 8192):
        if n >= qlen:
            return n
    return pad_pow2(qlen, 128)


class FullSweep:
    """--swipe device scheduler, fully vectorized: the target block packs
    once per chunk (numpy gather from the Block's concatenated letters),
    ships once, and every query group then sweeps the resident chunks.
    No per-target Python loops anywhere — results come back as one
    [nq, nt] int32 score matrix (the role of the reference's full-DB
    SWIPE driver, src/align/full_db.cpp + dp/swipe/full_swipe.h)."""

    # per-axis caps: the (Q, T) shape pair must fit scoped VMEM —
    # Q=6144 x T=16384 measured 36K over the 16M limit and Q=8192 x
    # T=512 measured 100K over at tile_b=16 (the lazy-F prefix temps
    # scale with tile_b x Q).  Row classes above 4096 therefore run at
    # tile_b=8, which halves every [tile_b, Q] term and fits Q=8192
    # comfortably; both axes cap at 8192 and anything longer takes the
    # host striped engine, overlapped with the device wait (swipe_all).
    MAX_LEN = 8192       # walked targets
    MAX_ROW_LEN = 8192   # query rows (tile_b=8 above Q=4096)

    def __init__(self, matrix32, gap_open: int, gap_extend: int,
                 tile_b: int = 16, interpret: bool = False):
        _ensure_compile_cache()
        self._m32 = jnp.asarray(np.ascontiguousarray(matrix32,
                                                     dtype=np.int32))
        self.go = gap_open + gap_extend
        self.ge = gap_extend
        self.tile_b = tile_b
        self.interpret = interpret

    def _pack_chunks(self, tblock, t_order, tile_b):
        """Length-sorted targets -> [(T, G, bsum, bounds, t2, rows)].
        rows index positions within t_order."""
        tl = tblock.lengths[t_order].astype(np.int64)
        tstarts = tblock.starts[t_order]
        order = np.argsort(tl, kind="stable")
        letters = tblock.letters
        chunks = []
        lo = 0
        while lo < len(order):
            # chunk ends at the tier boundary or the row cap
            T = next(t for t in _FULL_T_TIERS if t >= tl[order[lo]])
            G = _FULL_G[T]
            cap = G * tile_b
            hi = min(lo + cap,
                     int(np.searchsorted(tl[order], T, side="right")))
            rows = order[lo:hi]
            lo = hi
            L = tl[rows]
            nrows = len(rows)
            cols = np.arange(T, dtype=np.int64)[None, :]
            src = tstarts[rows][:, None] + np.minimum(cols, L[:, None] - 1)
            t_idx = np.full((G * tile_b, T), 31, dtype=np.int8)
            np.bitwise_and(letters[src], 31, out=t_idx[:nrows],
                           where=cols < L[:, None])
            t2 = np.ascontiguousarray(
                t_idx.reshape(G, tile_b, T).swapaxes(1, 2)).reshape(
                    G * T, tile_b)
            bounds = np.zeros(G, dtype=np.int32)
            ntiles = -(-nrows // tile_b)
            pad = np.zeros(ntiles * tile_b - nrows, dtype=np.int64)
            bounds[:ntiles] = np.concatenate([L, pad]).reshape(
                ntiles, tile_b).max(axis=1).astype(np.int32)
            chunks.append((T, G, int(bounds.sum()), bounds, t2, rows))
        return chunks

    def run_block(self, queries, tblock, t_order):
        """queries: [(q_letters, bias_or_None)]; t_order: target block
        ids to sweep (all lengths must be in (0, MAX_LEN]).  Returns
        scores [len(queries), len(t_order)] int32."""
        return self.dispatch_block(queries, tblock, t_order).wait()

    def dispatch_block(self, queries, tblock, t_order):
        """Async variant of run_block: every pallas call is dispatched
        before returning, so host work (the long-sequence tail, result
        formatting) overlaps device compute; .wait() on the returned
        handle blocks for the readback."""
        global dispatch_count, dispatch_cells, dispatch_wait_s
        import time as _time

        t_order = np.asarray(t_order, dtype=np.int64)
        chunk_cache = {}

        def chunks_for(tile_b):
            # rows classes above 4096 use tile_b=8 (VMEM; see MAX_ROW_LEN)
            if tile_b not in chunk_cache:
                cs = self._pack_chunks(tblock, t_order, tile_b)
                # ship the target chunks (device-resident for every query
                # group); transfer time is tunnel/HBM wait, not host work
                # — count it with the dispatch wait so the co-located
                # projection removes it
                _t0 = _time.perf_counter()
                global dispatch_wait_s
                chunk_cache[tile_b] = [
                    (T, G, bsum, jnp.asarray(bounds), jnp.asarray(t2), rows)
                    for (T, G, bsum, bounds, t2, rows) in cs]
                dispatch_wait_s += _time.perf_counter() - _t0
            return chunk_cache[tile_b]

        qlens = np.fromiter((len(q) for q, _ in queries), dtype=np.int64,
                            count=len(queries))
        qpads = np.asarray([_full_q_pad(int(x)) for x in qlens])
        out = np.zeros((len(queries), len(t_order)), dtype=np.int32)
        pending = []
        fn = (full_swipe_pallas_sweep.__wrapped__
              if self.interpret else full_swipe_pallas_sweep)
        for Q in np.unique(qpads):
            cls = np.nonzero(qpads == Q)[0]
            Q = int(Q)
            tile_b = self.tile_b if Q <= 4096 else 8
            chunks = chunks_for(tile_b)
            for c0 in range(0, len(cls), _FULL_NQ[0]):
                qidx = cls[c0 : c0 + _FULL_NQ[0]]
                # ragged last group pads up the NQ ladder with dead
                # (valid=0) query rows
                NQ = next(n for n in reversed(_FULL_NQ)
                          if n >= len(qidx))
                q_let = np.zeros((NQ, Q), dtype=np.int8)
                q_bias = np.zeros((NQ, Q), dtype=np.int8)
                q_valid = np.zeros((NQ, Q), dtype=np.int8)
                for r, qi in enumerate(qidx):
                    q, bias = queries[qi]
                    q_let[r, : len(q)] = np.asarray(q, dtype=np.int8) & 31
                    q_valid[r, : len(q)] = 1
                    if bias is not None:
                        q_bias[r, : len(q)] = np.asarray(bias,
                                                         dtype=np.int8)
                # profile transfers + dispatches block on the link, not
                # on host compute: count them as wait so the co-located
                # projection prices them at HBM speed
                _t0 = _time.perf_counter()
                ql = jnp.asarray(q_let.reshape(NQ * Q))
                qb = jnp.asarray(q_bias.reshape(NQ * Q))
                qv = jnp.asarray(q_valid.reshape(NQ * Q))
                for (T, G, bsum, bounds, t2, rows) in chunks:
                    dispatch_count += 1
                    dispatch_cells += NQ * Q * tile_b * bsum
                    dev = fn(bounds, t2, ql, qb, qv, self._m32, self.go,
                             self.ge, Q, T, tile_b, self.interpret)
                    pending.append((qidx, rows, dev))
                dispatch_wait_s += _time.perf_counter() - _t0
        class _Pending:
            def wait(_self):
                global dispatch_wait_s
                _t0 = _time.perf_counter()
                for qidx, rows, dev in pending:
                    # the readback is the only blocking step — every
                    # call above dispatched asynchronously
                    out[np.ix_(qidx, rows)] = \
                        np.asarray(dev)[: len(qidx), : len(rows)]
                dispatch_wait_s += _time.perf_counter() - _t0
                return out

        return _Pending()
