"""Fidelity harness: trajectory format round-trip, recorder hooks, and
cross-implementation comparison plumbing."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from jenga_tpu.pipelines.loss_eval import (load_trajectory,
                                           reference_fidelity_report,
                                           save_trajectory, trajectory_mse)


def test_trajectory_roundtrip(tmp_path):
    path = str(tmp_path / "traj.npz")
    lat = [np.random.randn(4, 3, 8, 8).astype(np.float32) for _ in range(5)]
    meta = {"seed": 7, "shift": 8.0, "steps": 5, "impl": "reference"}
    save_trajectory(path, lat, meta)
    back, meta2 = load_trajectory(path)
    assert meta2 == meta
    assert len(back) == 5
    for a, b in zip(lat, back):
        np.testing.assert_array_equal(a, b)


def test_reference_fidelity_report(tmp_path):
    path = str(tmp_path / "ref.npz")
    ref = [np.full((2, 2), float(i), np.float32) for i in range(4)]
    save_trajectory(path, ref, {"seed": 0})
    ours = [r + 0.1 for r in ref]
    rep = reference_fidelity_report(ours, path)
    assert rep["steps_compared"] == 4
    assert len(rep["per_step_mse"]) == 4
    np.testing.assert_allclose(rep["per_step_mse"], [0.01] * 4, atol=1e-6)
    assert rep["final_mse"] < 0.011
    assert rep["meta"] == {"seed": 0}


def test_pipeline_on_step_records_full_trajectory(tmp_path):
    """The Wan pipeline's on_step hook yields one latent per denoise step,
    ready for save_trajectory."""
    from jenga_tpu.models.wan import WanConfig, init_wan_params
    from jenga_tpu.pipelines.wan_t2v import WanT2VOptions, WanT2VPipeline

    cfg = WanConfig(dim=64, ffn_dim=128, freq_dim=32, num_heads=2,
                    num_layers=1, text_dim=32, text_len=8, dtype="float32")
    pipe = WanT2VPipeline(cfg, init_wan_params(jax.random.PRNGKey(0), cfg))
    opts = WanT2VOptions(size=(64, 64), frame_num=5, sampling_steps=3,
                         teacache_thresh=None, sa_drop_rates=(0.0, 0.0))
    trace = []
    ctx = jnp.zeros((8, cfg.text_dim))
    final = pipe.generate(ctx, ctx, opts, decode=False,
                          on_step=lambda i, lat: trace.append(np.asarray(lat)))
    assert len(trace) == 3
    np.testing.assert_array_equal(trace[-1], np.asarray(final))
    # round-trip through the file format and self-compare: zero error
    path = str(tmp_path / "self.npz")
    save_trajectory(path, trace, {"impl": "jenga_tpu"})
    rep = reference_fidelity_report(trace, path)
    assert rep["final_mse"] == 0.0


def test_recorder_tool_wraps_scheduler(tmp_path):
    """tools/record_reference.py's attach_recorder captures step outputs
    from a scheduler-like object."""
    sys.path.insert(0, "tools")
    try:
        from record_reference import TrajectoryRecorder, attach_recorder
    finally:
        sys.path.pop(0)

    class FakeOut:
        def __init__(self, x):
            self.prev_sample = x

    class FakeScheduler:
        def step(self, v, t, x):
            return FakeOut(x - 0.1 * v)

    rec = TrajectoryRecorder({"seed": 1})
    sched = attach_recorder(FakeScheduler(), rec)
    x = np.ones((2, 2), np.float32)
    for _ in range(3):
        x = sched.step(np.ones_like(x), 0, x).prev_sample
    path = str(tmp_path / "rec.npz")
    rec.save(path)
    back, meta = load_trajectory(path)
    assert len(back) == 3 and meta == {"seed": 1}
    np.testing.assert_allclose(back[-1], 0.7, atol=1e-6)
