"""CI coverage for the multichip dryrun cases (jenga_tpu/_dryrun_worker).

The driver executes the full 7-case dryrun between rounds; these tests
run a fast subset in CI (4-device mesh on the suite's virtual 8-CPU
backend) so a regression in the mesh paths is caught by pytest, not
first by the driver. The worker module is import-safe under the test
session: its platform overrides are no-ops once conftest has already
forced CPU.
"""

import pytest


@pytest.fixture(scope="module")
def worker():
    from jenga_tpu import _dryrun_worker as w
    return w


def test_wan_cfg_step_mesh_equivalence(worker):
    worker.wan_step(4)


def test_hy_joint_q8_mesh_equivalence(worker):
    worker.hyvideo_step(4)


def test_hy_ring_fallback_mesh_equivalence(worker):
    worker.hyvideo_ring_fallback(4)


def test_wan_turbo_stage_switch_mesh_equivalence(worker):
    worker.wan_turbo_switch(4)
