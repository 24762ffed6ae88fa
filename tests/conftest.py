import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs the
# multi-chip path). Must be set before jax import.
os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may set e.g. 'axon'
# some PJRT plugins (axon) override jax_platforms programmatically at
# registration; the legacy JAX_PLATFORM_NAME still takes precedence
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
