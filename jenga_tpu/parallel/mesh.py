"""Device mesh construction and parameter sharding policies.

TPU-native replacement for the reference's process-group plumbing
(`/root/reference/hyvideo/inference.py:166-190`,
`/root/reference/jenga_wan.py:885-921`: NCCL init + xfuser
``initialize_model_parallel``): one ``jax.sharding.Mesh`` with a sequence-
parallel axis, plus NamedSharding helpers. FSDP-style weight sharding
(reference `/root/reference/wan/distributed/fsdp.py:11-41`) maps to
sharding each large weight matrix over the mesh axis and letting XLA
insert the per-layer all-gathers.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_sp_mesh", "shard_params_fsdp", "replicate"]


def make_sp_mesh(devices=None, axis: str = "sp") -> Mesh:
    """1-D sequence-parallel mesh over all (or given) devices; lays the
    axis over ICI on real TPU slices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree onto the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_params_fsdp(params, mesh: Mesh, axis: str = "sp",
                      min_size: int = 2 ** 16):
    """Shard every large weight over the mesh axis (ZeRO-3 style).

    Each array is sharded along its largest dimension divisible by the axis
    size; small tensors (norms, biases, modulations) stay replicated. XLA
    all-gathers weights just-in-time per layer, which is the TPU equivalent
    of FSDP FULL_SHARD gathering.
    """
    n = mesh.shape[axis]

    def place(x):
        if x.size < min_size:
            return jax.device_put(x, NamedSharding(mesh, P()))
        dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
        for d in dims:
            if x.shape[d] % n == 0:
                spec = [None] * x.ndim
                spec[d] = axis
                return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, params)
