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
