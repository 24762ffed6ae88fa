"""Device dispatch policy.

The TPU is the default production engine: when the default JAX backend is
a TPU, banded DP runs on the chip through the wave driver
(align/wave.py), with DIAMOND_TPU_DEVICE_DP as override/kill-switch:

  unset / ""  -> auto: use the device iff jax.default_backend() == "tpu"
  "0"         -> never (host numpy/C++ only)
  anything else -> force the device path (also on CPU, where the pallas
                   kernel runs in interpret mode if
                   DIAMOND_TPU_DP_INTERPRET is set)
"""
from __future__ import annotations

import os

_backend_cache: str | None = None


def _default_backend() -> str:
    global _backend_cache
    if _backend_cache is None:
        try:
            import jax

            _backend_cache = jax.default_backend()
        except Exception:
            _backend_cache = "none"
    return _backend_cache


def device_dp_enabled() -> bool:
    v = os.environ.get("DIAMOND_TPU_DEVICE_DP")
    if v == "0":
        return False
    if v:
        return True
    return _default_backend() == "tpu"


def dp_interpret() -> bool:
    return bool(os.environ.get("DIAMOND_TPU_DP_INTERPRET"))


_distributed_up = False


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Multi-host bring-up: jax.distributed.initialize so every host of a
    TPU pod slice joins one runtime and jax.devices() spans the slice
    (the reference's --mp multi-node file coordination,
    src/util/parallel/multiprocessing.cpp, replaced by the JAX
    coordination service — ICI/DCN collectives instead of a shared
    filesystem).  Arguments come from --coordinator/--num-procs/--proc-id
    or the standard JAX_COORDINATOR_ADDRESS etc. env vars; with neither
    present this is a no-op (single-host).  Idempotent."""
    global _distributed_up
    if _distributed_up:
        return True
    if coordinator is None and not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return False
    import jax

    kw = {}
    if coordinator is not None:
        kw["coordinator_address"] = coordinator
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)
    _distributed_up = True
    return True
