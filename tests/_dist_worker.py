"""Worker for the 2-process ``jax.distributed`` test (see
tests/test_distributed_init.py). Run as:

    python tests/_dist_worker.py <process_id> <num_processes> <port>

Each process initializes the JAX distributed runtime against a local
coordinator (the executed counterpart of the reference's
``dist.init_process_group`` + xfuser world setup,
`/root/reference/hyvideo/inference.py:166-190`), builds the multi-host
mesh, and runs one cross-process psum.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

# Force the CPU backend before any JAX backend initializes: this
# environment's sitecustomize force-registers a remote TPU plugin (same
# trick as tests/conftest.py / jenga_tpu/_dryrun_worker.py).
os.environ.setdefault("XLA_FLAGS", "")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from jenga_tpu.parallel.mesh import (  # noqa: E402
    init_distributed, make_multihost_sp_mesh)


def main() -> None:
    n = init_distributed(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=nproc, process_id=pid)
    assert n == nproc, f"process_count {n} != {nproc}"
    assert jax.process_count() == nproc
    # idempotence: a second call must be a no-op, not a re-init crash
    assert init_distributed() == nproc

    mesh = make_multihost_sp_mesh()          # ('dp' across procs, 'sp' local)
    assert mesh.shape["dp"] == nproc

    # one real cross-process collective: psum over the dp axis
    local = np.full((1, jax.local_device_count(), 4), float(pid + 1),
                    np.float32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp", "sp", None)), local)

    @jax.jit
    def total(x):
        return jax.numpy.sum(x)             # cross-process all-reduce

    out = float(total(garr))
    expect = sum((i + 1) * jax.local_device_count() * 4
                 for i in range(nproc))
    assert abs(out - expect) < 1e-6, f"psum wrong: {out} != {expect}"
    print(f"DIST_OK pid={pid} procs={jax.process_count()} "
          f"devices={jax.device_count()}", flush=True)


if __name__ == "__main__":
    main()
