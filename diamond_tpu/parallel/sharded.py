"""Multi-chip sharded search: DB shards per device, collective top-k merge.

TPU-native replacement of the reference's out-of-core block swap and
multi-process shared-filesystem coordination (reference
src/run/double_indexed.cpp:346-430, src/util/parallel/): the reference DB
(targets) shards across the mesh's 'db' axis, queries are replicated, each
device runs the banded/full SW scoring over its shard, and per-shard top-k
tables merge with an all-gather — no temp files, no file locks.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("db",))


def sharded_swipe_topk(mesh: Mesh, profile, targets, tlens, d_begin, band_offset,
                       gap_open_total: int, gap_extend: int, band: int,
                       qlen: int, qlen_pad: int, k: int = 25):
    """Score a replicated query against a device-sharded target batch and
    return the global top-k (scores, global target indices).

    targets: [B, T] int32, B divisible by mesh size; sharded over 'db'.
    Returns (scores [k], indices [k]) replicated.
    """
    from diamond_tpu.ops.swipe_jax import banded_swipe_scores

    n_dev = mesh.devices.size
    B = targets.shape[0]
    assert B % n_dev == 0
    shard = B // n_dev

    def per_shard(targets_s, tlens_s, d_begin_s, band_offset_s):
        best, _, _ = banded_swipe_scores(
            jnp.int32(qlen), targets_s, tlens_s, d_begin_s, band_offset_s,
            profile, gap_open_total, gap_extend, band, qlen_pad)
        # local top-k with global indices
        kk = min(k, shard)
        scores, idx = jax.lax.top_k(best, kk)
        gidx = idx + jax.lax.axis_index("db") * shard
        # gather across shards and reduce to global top-k
        all_scores = jax.lax.all_gather(scores, "db", tiled=True)
        all_idx = jax.lax.all_gather(gidx, "db", tiled=True)
        g_scores, g_pos = jax.lax.top_k(all_scores, min(k, all_scores.shape[0]))
        return g_scores, all_idx[g_pos]

    fn = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("db"), P("db"), P("db"), P("db")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(targets, tlens, d_begin, band_offset)


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_batch(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P("db")))
