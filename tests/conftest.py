"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (Ulysses sequence parallelism, FSDP-style param
sharding) is exercised on host CPU devices so the suite needs no TPU
hardware; `bench.py` is what runs on the real chip.
"""

import os

# Must be set before jax is imported anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
