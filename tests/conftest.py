"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (Ulysses sequence parallelism, FSDP-style param
sharding) is exercised on host CPU devices so the suite needs no TPU
hardware; `bench.py` is what runs on the real chip.

Note: this environment's sitecustomize forcibly registers an `axon` TPU
PJRT plugin and sets ``jax_platforms="axon,cpu"`` on jax import, ignoring
``JAX_PLATFORMS``; initializing that backend tunnels to remote hardware and
can stall for minutes. We override the config back to pure CPU before any
backend is initialized.
"""

import os

# Must be set before jax initializes any backend.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
