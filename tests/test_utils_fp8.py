"""fp8 weight storage, video IO, and profiling util tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from jenga_tpu.models.fp8 import quantize_linear_fp8, quantize_tree_fp8
from jenga_tpu.models.layers import linear
from jenga_tpu.utils.video import make_grid, save_video, to_uint8_frames


def test_fp8_linear_close_to_f32():
    key = jax.random.PRNGKey(0)
    p = {"w": jax.random.normal(key, (64, 32)) * 0.1,
         "b": jnp.zeros((32,))}
    q = quantize_linear_fp8(p)
    assert q["w8"].dtype == jnp.float8_e4m3fn
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 64))
    y32 = linear(p, x)
    y8 = linear(q, x)
    # e4m3 has ~2 decimal digits; relative error should be small
    rel = float(jnp.abs(y8 - y32).max() / (jnp.abs(y32).max() + 1e-6))
    assert rel < 0.1


def test_fp8_tree_quantizes_only_large_linears():
    tree = {"big": {"w": jnp.ones((512, 512))},
            "small": {"w": jnp.ones((4, 4))},
            "norm": jnp.ones((64,))}
    q = quantize_tree_fp8(tree, min_size=1024)
    assert "w8" in q["big"] and "w" in q["small"]
    assert q["norm"].shape == (64,)


def test_wan_model_runs_with_fp8_weights():
    from jenga_tpu.models.wan import WanConfig, init_wan_params, wan_forward
    cfg = WanConfig(dim=128, ffn_dim=256, freq_dim=32, num_heads=2,
                    num_layers=1, text_dim=64, text_len=8, dtype="float32")
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    q = quantize_tree_fp8(params, min_size=128 * 128)
    x = jnp.ones((1, cfg.in_dim, 2, 8, 8)) * 0.1
    ctx = jnp.zeros((1, cfg.text_len, cfg.text_dim))
    out = wan_forward(q, cfg, x, jnp.array([100.0]), ctx)
    assert np.isfinite(np.asarray(out)).all()


def test_video_frames_and_grid(tmp_path):
    v = np.linspace(-1, 1, 3 * 4 * 8 * 8).reshape(3, 4, 8, 8)
    frames = to_uint8_frames(v)
    assert frames.shape == (4, 8, 8, 3)
    assert frames.min() >= 0 and frames.max() <= 255
    grid = make_grid([v, v, v])
    assert grid.shape[0] == 4
    path = save_video(str(tmp_path / "out.gif"), v, fps=4)
    assert os.path.exists(path)


def test_stage_timer():
    from jenga_tpu.utils.profiling import StageTimer
    t = StageTimer()
    with t.span("a"):
        pass
    with t.span("a"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2


def test_trajectory_mse_and_fidelity():
    from jenga_tpu.pipelines.loss_eval import trajectory_mse
    a = [np.zeros((2, 2)), np.ones((2, 2))]
    b = [np.zeros((2, 2)), np.zeros((2, 2))]
    assert trajectory_mse(a, b) == [0.0, 1.0]


def test_prompt_expander_modes():
    from jenga_tpu.text.prompt_extend import PromptExpander
    calls = {}

    def fake_chat(system, user):
        calls["system"] = system
        calls["user"] = user
        return "  expanded prompt  "

    ex = PromptExpander(chat_fn=fake_chat, mode="i2v")
    out = ex("make it rain", image_description="a street")
    assert out == "expanded prompt"
    assert "image-to-video" in calls["system"]
    assert "a street" in calls["user"]
