"""Wan I2V pipeline tests (CPU, tiny model)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from jenga_tpu.models.wan import WanConfig, init_wan_params
from jenga_tpu.pipelines.wan_i2v import (
    WanI2VOptions,
    WanI2VPipeline,
    build_i2v_mask,
    i2v_latent_size,
)

TINY = WanConfig(model_type="i2v", in_dim=36, dim=128, ffn_dim=256,
                 freq_dim=32, num_heads=2, num_layers=2, text_dim=64,
                 text_len=16, dtype="float32")


def test_i2v_mask_layout():
    msk = build_i2v_mask(9, 4, 6)
    assert msk.shape == (4, 3, 4, 6)  # 4 channels, (9-1)/4+1... = 3 frames
    # first latent frame fully on in all 4 channels, later frames off
    np.testing.assert_array_equal(msk[:, 0], 1.0)
    np.testing.assert_array_equal(msk[:, 1:], 0.0)


def test_latent_size_budget():
    lat_h, lat_w = i2v_latent_size(720, 1280, 720 * 1280)
    assert lat_h % 2 == 0 and lat_w % 2 == 0
    assert abs((lat_h * 8) * (lat_w * 8) - 720 * 1280) / (720 * 1280) < 0.1


def test_generate_i2v_runs():
    params = init_wan_params(jax.random.PRNGKey(0), TINY)
    params["head"]["linear"]["w"] = jax.random.normal(
        jax.random.PRNGKey(9), params["head"]["linear"]["w"].shape,
        jnp.float32) * 0.05
    pipe = WanI2VPipeline(TINY, params)
    opts = WanI2VOptions(sampling_steps=4, sa_drop_rates=(0.6,),
                         p_remain=0.9, teacache_thresh=None, seed=5,
                         shift=5.0)
    frame_num, lat_h, lat_w = 9, 8, 12
    t_lat = 3
    img_lat = jnp.zeros((16, t_lat, lat_h, lat_w)).at[:, 0].set(0.3)
    clip_fea = jax.random.normal(jax.random.PRNGKey(1), (257, 1280))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (7, TINY.text_dim))
    out = pipe.generate_i2v(img_lat, clip_fea, ctx, jnp.zeros_like(ctx),
                            frame_num, lat_h, lat_w, opts, decode=False)
    assert out.shape == (16, t_lat, lat_h, lat_w)
    assert np.isfinite(np.asarray(out)).all()
