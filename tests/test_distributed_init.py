"""Executed multi-process runtime init (VERDICT r2 item 6).

Spawns TWO real OS processes that each call
``jenga_tpu.parallel.mesh.init_distributed`` (→
``jax.distributed.initialize``) against a local coordinator, build the
multi-host ``(dp, sp)`` mesh, and run one cross-process all-reduce —
the executed counterpart of the reference's NCCL process-group init
(`/root/reference/hyvideo/inference.py:166-190`,
`/root/reference/jenga_wan.py:885-921`), which the single-process test
in tests/test_ring_attention.py cannot cover.
"""

import os
import socket
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_init():
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=_REPO + os.pathsep + os.environ.get("PYTHONPATH",
                                                              ""))
    # each process gets 2 virtual CPU devices -> 4-device (2, 2) mesh
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=2")
    worker = os.path.join(_REPO, "tests", "_dist_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=_REPO)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"worker {pid} failed (rc={p.returncode}):\n{out[-3000:]}"
        assert f"DIST_OK pid={pid} procs=2 devices=4" in out, out[-3000:]
