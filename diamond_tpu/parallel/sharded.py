"""Multi-chip sharded search: DB shards per device, collective top-k merge.

TPU-native replacement of the reference's out-of-core block swap and
multi-process shared-filesystem coordination (reference
src/run/double_indexed.cpp:346-430, src/util/parallel/): the reference DB
(targets) shards across the mesh's 'db' axis, queries are replicated, each
device runs the banded SW scoring over its shard, and per-shard top-k
tables merge with an all-gather — no temp files, no file locks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, platform: str | None = None) -> Mesh:
    devs = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("db",))


def sharded_swipe_topk(mesh: Mesh, targets_1h, band_mask, profile_pad,
                       gap_open_total: int, gap_extend: int, band: int,
                       k: int = 25):
    """Score a replicated query against a device-sharded target batch and
    return the global top-k (scores, global target indices).

    targets_1h: [T, B, 32] one-hot targets, B divisible by mesh size;
    sharded over 'db' on the batch axis.  Returns replicated
    (scores [k], indices [k])."""
    from diamond_tpu.ops.swipe_jax import banded_swipe_uniform

    n_dev = mesh.devices.size
    B = targets_1h.shape[1]
    assert B % n_dev == 0
    shard = B // n_dev

    def per_shard(t1h_s, mask_s):
        best, _, _ = banded_swipe_uniform(t1h_s, mask_s, profile_pad,
                                          gap_open_total, gap_extend, band)
        kk = min(k, shard)
        scores, idx = jax.lax.top_k(best, kk)
        gidx = idx + jax.lax.axis_index("db") * shard
        all_scores = jax.lax.all_gather(scores, "db", tiled=True)
        all_idx = jax.lax.all_gather(gidx, "db", tiled=True)
        g_scores, g_pos = jax.lax.top_k(all_scores,
                                        min(k, all_scores.shape[0]))
        return g_scores, all_idx[g_pos]

    fn = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(None, "db", None), P("db", None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(targets_1h, band_mask)


def sharded_full_scores(mesh: Mesh, query, bias, tblock, matrix32,
                        gap_open: int, gap_extend: int):
    """Production-semantics sharded full-matrix scoring: score one query
    against every sequence of a target block with the DB sharded over the
    mesh's 'db' axis; returns the per-target scores replicated on host.

    This is the multi-chip form of the --swipe / global-ranking final
    extension first round (align/swipe_all.py): devices do the
    O(B*T*band) DP over their shard; the host applies the identical
    culling (sort + _output_range) on the gathered [B] score vector, so
    results match the single-chip path exactly.

    On TPU devices the per-shard DP runs the Pallas kernel (~7x the XLA
    one-hot twin); elsewhere (CPU test meshes) the XLA twin.  Both share
    exact int32 semantics with the host oracle."""
    n_dev = mesh.devices.size
    use_pallas = mesh.devices.flat[0].platform == "tpu"
    qlen = len(query)
    jobs = []
    for t in range(len(tblock)):
        tgt = tblock.seq(t)
        jobs.append((tgt, -(max(len(tgt), 1) - 1), qlen))
    # pad the batch to a mesh multiple with empty jobs (the pallas branch
    # re-pads to its tile size below)
    B0 = len(jobs)
    while len(jobs) % n_dev:
        jobs.append((np.zeros(1, dtype=np.int8), 0, 1))

    if use_pallas:
        from diamond_tpu.ops.swipe_jax import pad_band
        from diamond_tpu.ops.swipe_pallas import (banded_swipe_pallas,
                                                  prepare_pallas_batch)

        # keep the kernel's VMEM footprint (2 scratch [tile_b, band] int32
        # planes + ~5 live [tile_b, band] column temporaries + the
        # [T, tile_b] target block) inside the ~16 MB scoped budget
        band_est = pad_band(max(d1 - d0 for _, d0, d1 in jobs))
        tile_b = 256 if band_est <= 1024 else \
            128 if band_est <= 2048 else 64
        use_pallas = band_est <= 6144
        pad_unit = n_dev * tile_b
        while len(jobs) % pad_unit:
            jobs.append((np.zeros(1, dtype=np.int8), 0, 1))
        t_idx, bmask, ppad, band, _ = prepare_pallas_batch(
            query, bias, matrix32, jobs, tile_b=tile_b)
        t_idx = shard_batch_axis(mesh, t_idx, 1)
        bmask = shard_batch_axis(mesh, bmask, 0)
        ppad = replicate(mesh, ppad)

        def per_shard(ti_s, mask_s):
            best, _, _ = banded_swipe_pallas(ti_s, mask_s, ppad,
                                             gap_open + gap_extend,
                                             gap_extend, band,
                                             tile_b=tile_b)
            return jax.lax.all_gather(best, "db", tiled=True)

        fn = jax.shard_map(per_shard, mesh=mesh,
                           in_specs=(P(None, "db"), P("db", None)),
                           out_specs=P(), check_vma=False)
        scores = np.asarray(fn(t_idx, bmask))
        return scores[:B0]

    from diamond_tpu.ops.swipe_jax import banded_swipe_uniform, prepare_uniform_batch

    t1h, bmask, ppad, band, _ = prepare_uniform_batch(query, bias, matrix32,
                                                      jobs)
    t1h = shard_batch_axis(mesh, t1h, 1)
    bmask = shard_batch_axis(mesh, bmask, 0)
    ppad = replicate(mesh, ppad)

    def per_shard(t1h_s, mask_s):
        best, _, _ = banded_swipe_uniform(t1h_s, mask_s, ppad,
                                          gap_open + gap_extend, gap_extend,
                                          band)
        return jax.lax.all_gather(best, "db", tiled=True)

    fn = jax.shard_map(per_shard, mesh=mesh,
                       in_specs=(P(None, "db", None), P("db", None)),
                       out_specs=P(), check_vma=False)
    scores = np.asarray(fn(t1h, bmask))
    return scores[:B0]


def _put(mesh: Mesh, x, spec: P):
    """Host array -> global sharded array.  make_array_from_callback also
    covers meshes spanning multiple PROCESSES (jax.distributed), where
    device_put of a host value would hit non-addressable devices; every
    process constructs only its addressable shards from the same
    (deterministically built) host array."""
    x = np.asarray(x)
    return jax.make_array_from_callback(
        x.shape, NamedSharding(mesh, spec), lambda idx: x[idx])


def replicate(mesh: Mesh, x):
    return _put(mesh, x, P())


def shard_batch_axis(mesh: Mesh, x, axis: int):
    spec = [None] * np.asarray(x).ndim
    spec[axis] = "db"
    return _put(mesh, x, P(*spec))
