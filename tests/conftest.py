import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs the
# multi-chip path). Must be set before jax import.
# NOTE: the default platform is left alone (a TPU plugin may own it and a
# forced CPU default slows the DP-heavy golden tests several-fold).  Tests
# that need the virtual multi-device CPU mesh request it explicitly via
# jax.devices("cpu") / make_mesh(platform="cpu"); the device-count flag
# below must be set before the first backend initialization.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# The device engine auto-enables when a TPU owns the default backend
# (utils/device.py).  On this host the chip sits behind a ~1.4 s/call
# tunnel AND is a single device shared by the pytest process and the CLI
# subprocesses the golden tests spawn — routing every golden's DP through
# it serializes the suite into tens of minutes.  Default the kill-switch
# ON for tests; the on-hardware tests (tests/test_device.py) explicitly
# opt back in per-test.
os.environ.setdefault("DIAMOND_TPU_DEVICE_DP", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()


def pytest_configure(config):
    """Pin the test process to CPU when the tunneled chip is unusable.

    The axon PJRT plugin selects its platform programmatically (env
    JAX_PLATFORMS alone does not stop jax.backends() from initializing
    it), and a stalled tunnel hangs that init for minutes — enough to
    hang the whole suite at the first jax dispatch.  The bounded probe
    (subprocess + timeout + disk cache) decides once: healthy chip ->
    leave the default platform so tests/test_device.py exercises real
    hardware; stalled/absent -> pin_cpu_platform() for this process and
    all CLI subprocesses the golden tests spawn."""
    from diamond_tpu.utils.device import ensure_reachable_default_platform

    ensure_reachable_default_platform()
