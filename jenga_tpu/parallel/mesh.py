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

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["init_distributed", "make_sp_mesh", "make_multihost_sp_mesh",
           "shard_params_fsdp", "replicate"]

_DIST_INITIALIZED = False


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> int:
    """Multi-process runtime init — the TPU-native counterpart of the
    reference's ``dist.init_process_group("nccl")`` + xfuser
    ``init_distributed_environment`` (`/root/reference/hyvideo/
    inference.py:166-190`, `/root/reference/jenga_wan.py:885-921`).

    On TPU pods the coordinator/process arguments come from the runtime
    environment and may all be omitted; single-process runs (no
    coordinator configured anywhere) are a no-op. Idempotent. Returns the
    process count.
    """
    global _DIST_INITIALIZED
    if _DIST_INITIALIZED:
        return jax.process_count()
    # Only an explicit coordinator (argument or launch-env variable set by
    # a multi-process launcher) triggers real init: single-process runs —
    # including single-host TPU VMs, whose env can carry pod-shaped
    # variables — are a no-op, like the reference's world_size==1 path.
    env_coord = (os.environ.get("JAX_COORDINATOR_ADDRESS")
                 or os.environ.get("COORDINATOR_ADDRESS"))
    if coordinator_address is None and env_coord is None \
            and (num_processes is None or num_processes == 1):
        return 1   # single-process: nothing to initialize
    from jax._src import xla_bridge
    if xla_bridge.backends_are_initialized():
        raise RuntimeError(
            "init_distributed() must run before any JAX computation "
            "initializes the backend (call it first in main())")
    jax.distributed.initialize(
        coordinator_address=coordinator_address or env_coord,
        num_processes=num_processes, process_id=process_id,
        local_device_ids=local_device_ids)
    _DIST_INITIALIZED = True
    return jax.process_count()


def make_sp_mesh(devices=None, axis: str = "sp", ring: int = 1) -> Mesh:
    """Sequence-parallel mesh over all (or given) devices; lays the axis
    over ICI on real TPU slices.

    ``ring > 1`` builds the explicit 2-D ``ring x ulysses`` composition
    (the reference asserts ``world == ring_degree * ulysses_degree``,
    `/root/reference/hyvideo/config.py:451-468`): axes ``("ring", axis)``
    with the ulysses axis innermost (neighboring ICI links carry the
    all-to-all; the ring rides the outer loop)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if ring <= 1:
        return Mesh(devices, (axis,))
    if devices.size % ring:
        raise ValueError(
            f"world ({devices.size}) must equal ring ({ring}) x ulysses "
            f"({devices.size / ring:.2f}) — the reference's composition "
            f"contract (hyvideo/config.py:451-468)")
    return Mesh(devices.reshape(ring, devices.size // ring),
                ("ring", axis))


def make_multihost_sp_mesh(axis: str = "sp", dcn_axis: str = "dp") -> Mesh:
    """Multi-host mesh: sequence parallelism within each host's ICI
    domain, data (batch/prompt) parallelism across hosts over DCN — the
    layout where Ulysses all-to-alls never cross the slow inter-host
    links. Requires :func:`init_distributed` on every process first."""
    from jax.experimental import mesh_utils

    procs = jax.process_count()
    local = jax.local_device_count()
    if procs == 1:
        return Mesh(np.asarray(jax.devices()).reshape(1, local),
                    (dcn_axis, axis))
    try:
        # TPU pods: lay the sp axis over each slice's ICI domain
        dev = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, local), dcn_mesh_shape=(procs, 1))
    except ValueError:
        # backends without slice topology (multi-process CPU — the
        # tests/test_distributed_init.py path): group by owning process,
        # which is exactly the "ICI domain" of a host-local backend
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        dev = np.asarray(devs).reshape(procs, local)
    return Mesh(dev, (dcn_axis, axis))


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
