"""Test configuration: force CPU jax with 8 virtual devices (multi-chip sharding tests
run on a virtual mesh; real-TPU behavior is exercised by bench.py on hardware)."""
import os

# Must run before jax is imported anywhere.  The session environment pins
# JAX_PLATFORMS=axon (the tunneled TPU); unit tests always run on host CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
