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

import json
import os
import subprocess
import sys
import time

_backend_cache: str | None = None

# A tunneled TPU plugin (axon) blocks FOREVER inside PJRT client init when
# the chip is unreachable — jax.devices()/default_backend() never return
# and no exception fires.  When such a plugin may own the default
# platform, the first backend query runs in a subprocess under a timeout;
# the result is cached on disk with a TTL so repeated CLI invocations
# don't re-pay the probe.
_PROBE_OK_TTL = 600.0     # reachable chip: re-verify every 10 min
_PROBE_FAIL_TTL = 120.0   # unreachable: retry sooner (tunnel may return)


def _probe_path() -> str:
    return os.path.join("/tmp", f"diamond_tpu_probe_{os.getuid()}.json")


def _hang_risk() -> bool:
    """True when backend init may hang instead of failing (the axon
    sitecustomize registers its PJRT plugin iff this var is set)."""
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS"))


def probe_default_backend(timeout_s: float | None = None) -> str:
    """jax.default_backend(), bounded: subprocess + timeout + disk cache
    when a tunneled TPU plugin might hang init.  Returns "none" when the
    probe fails or times out (callers fall back to the host path)."""
    if not _hang_risk():
        try:
            import jax

            return jax.default_backend()
        except Exception:
            return "none"
    if timeout_s is None:
        timeout_s = float(os.environ.get("DIAMOND_TPU_PROBE_TIMEOUT", "75"))
    path = _probe_path()
    try:
        with open(path) as f:
            rec = json.load(f)
        ttl = _PROBE_OK_TTL if rec["backend"] != "none" else _PROBE_FAIL_TTL
        if time.time() - rec["ts"] < ttl:
            return rec["backend"]
    except Exception:
        pass
    backend = "none"
    try:
        # also time one trivial dispatch: a chip that answers init but
        # takes many seconds per call is unusable (stalled tunnel) — the
        # probe reports it as "none" so callers stay on the host path
        code = ("import time, jax, jax.numpy as jnp; "
                "b = jax.default_backend(); "
                "x = jnp.zeros(8, jnp.int32); "
                "jax.block_until_ready(x + 1); "
                "t0 = time.perf_counter(); "
                "jax.block_until_ready(x + 2); "
                "print(b, time.perf_counter() - t0)")
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s)
        if r.returncode == 0 and r.stdout.strip():
            parts = r.stdout.strip().splitlines()[-1].split()
            backend = parts[0]
            lat = float(parts[1]) if len(parts) > 1 else 0.0
            max_lat = float(os.environ.get(
                "DIAMOND_TPU_PROBE_MAX_DISPATCH", "5.0"))
            if backend not in ("cpu", "gpu") and lat > max_lat:
                backend = "none"
    except Exception:
        backend = "none"
    try:
        tmp = f"{path}.tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"ts": time.time(), "backend": backend}, f)
        os.replace(tmp, path)
    except OSError:
        pass
    return backend


def pin_cpu_platform() -> None:
    """Route this process AND its children to the CPU backend: counter
    the axon plugin's programmatic jax_platforms="axon,cpu" selection
    and keep spawned subprocesses (CLI workers, mp combos) from
    re-registering the plugin via sitecustomize."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def cpu_subprocess_env(extra=None) -> dict:
    """Environment for a child process that must never touch the device:
    JAX pinned to CPU, the device DP/seeding routes disabled, and the
    axon plugin's pool address removed so it cannot re-register.  Golden
    CLI subprocesses use this unconditionally — a mid-run tunnel stall
    must not be able to hang work that never needed the chip."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["DIAMOND_TPU_DEVICE_DP"] = "0"
    env["DIAMOND_TPU_STAGE12"] = "0"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    if extra:
        env.update(extra)
    return env


def ensure_reachable_default_platform() -> str:
    """Probe the default backend (bounded) and, when a TPU plugin is
    registered but its chip is unreachable, pin the process to CPU so
    later jax use cannot hang.  Returns the usable backend name."""
    backend = probe_default_backend()
    if backend == "none" and _hang_risk():
        pin_cpu_platform()
        backend = "cpu"
    return backend


def _default_backend() -> str:
    global _backend_cache
    if _backend_cache is None:
        _backend_cache = ensure_reachable_default_platform()
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


def stage12_device_enabled() -> bool:
    """Stage-1/2 seeding on the accelerator (cost-routed like the DP).

    DIAMOND_TPU_STAGE12 overrides: "0" never, any other set value forces
    the device path (byte-identical — pinned by
    tests/test_device.py::test_stage12_device_golden_on_tpu).  Unset =
    auto, which is HOST: measured on the v5e (PERF.md round 3), the
    stage-1 all-vs-all tile as a one-hot MXU matmul beats the host ~100x
    (954 vs 8.9 G letter-comparisons/s), but the stage-2 window scan is
    memory-bound on linear data (~8 us/pair on-device vs ~0.13 us/pair
    in the fused native pass — the device pays HBM round trips for ~100
    int ops over ~100 bytes per pair), and stage 2 dominates the funnel
    at every sensitivity.  The device seeding path therefore only wins
    when something else already forced the data on-chip; routing it by
    default would slow co-located deployments too."""
    v = os.environ.get("DIAMOND_TPU_STAGE12")
    if v == "0":
        return False
    if v:
        return True
    return False


def measure_transfer_latency(nbytes: int = 4 << 20) -> float:
    """Round-trip time of an nbytes host->device transfer plus a scalar
    readback, best of 2 (seconds).  The tiny-op dispatch probe under-
    estimates a network-tunneled chip whose cost is per-byte, not
    per-call; this is the routing signal for transfer-heavy stages."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    buf = np.zeros(nbytes, dtype=np.int8)
    f = jax.jit(lambda x: x.sum())
    jax.block_until_ready(f(jnp.asarray(buf)))  # compile
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(f(jnp.asarray(buf)))
        best = min(best, time.perf_counter() - t0)
    return best


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
