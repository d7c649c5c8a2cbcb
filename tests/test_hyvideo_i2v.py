"""HunyuanVideo I2V pipeline tests (CPU, tiny model)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from jenga_tpu.models.hyvideo import HYVideoConfig, init_hyvideo_params
from jenga_tpu.pipelines.hyvideo_i2v import (
    HYI2VOptions,
    HYVideoI2VPipeline,
    generate_crop_size_list,
    get_closest_ratio,
)

TINY_TR = HYVideoConfig(hidden_size=128, heads_num=2, double_blocks=1,
                        single_blocks=1, rope_dim_list=(16, 24, 24),
                        text_states_dim=48, text_states_dim_2=24,
                        refiner_depth=1, guidance_embed=True,
                        i2v_condition_type="token_replace", dtype="float32")
TINY_LC = dataclasses.replace(TINY_TR, in_channels=33,
                              i2v_condition_type=None)


def _pipe(cfg):
    params = init_hyvideo_params(jax.random.PRNGKey(0), cfg)
    params["final_layer"]["linear"]["w"] = jax.random.normal(
        jax.random.PRNGKey(8),
        params["final_layer"]["linear"]["w"].shape, jnp.float32) * 0.05
    return HYVideoI2VPipeline(cfg, params)


def _cond(key, cfg):
    txt = jax.random.normal(key, (6, cfg.text_states_dim))
    mask = jnp.ones((6,), jnp.int32)
    txt2 = jax.random.normal(jax.random.fold_in(key, 1),
                             (cfg.text_states_dim_2,))
    return txt, mask, txt2


OPTS = HYI2VOptions(size=(96, 64), video_length=5, num_inference_steps=4,
                    sa_drop_rates=(0.5,), p_remain=0.5,
                    res_rate_list=(1.0,), step_rate_list=(1.0,),
                    scheduler_shift_list=(5.0,),
                    non_skip_steps=(0, 1, 3), seed=7)


def test_token_replace_pins_first_frame():
    pipe = _pipe(TINY_TR)
    txt, mask, txt2 = _cond(jax.random.PRNGKey(1), TINY_TR)
    lt = 1 + (5 - 1) // 4
    img_lat = jnp.full((16, 1, 8, 12), 0.25)
    out = pipe.generate_i2v([img_lat], txt, mask, txt2, OPTS, decode=False)
    assert out.shape == (16, lt, 8, 12)
    # frame 0 must be the clean image latent, untouched by the solver
    np.testing.assert_allclose(np.asarray(out[:, 0]), 0.25, atol=1e-6)


def test_latent_concat_runs():
    pipe = _pipe(TINY_LC)
    txt, mask, txt2 = _cond(jax.random.PRNGKey(2), TINY_LC)
    opts = dataclasses.replace(OPTS, i2v_condition_type="latent_concat",
                               i2v_stability=False)
    img_lat = jnp.full((16, 1, 8, 12), 0.1)
    out = pipe.generate_i2v([img_lat], txt, mask, txt2, opts, decode=False)
    lt = 1 + (5 - 1) // 4
    assert out.shape == (16, lt, 8, 12)
    assert np.isfinite(np.asarray(out)).all()


def test_i2v_prores_multires():
    pipe = _pipe(TINY_TR)
    txt, mask, txt2 = _cond(jax.random.PRNGKey(3), TINY_TR)
    opts = dataclasses.replace(
        OPTS, size=(192, 128), num_inference_steps=4,
        res_rate_list=(0.5, 1.0), step_rate_list=(0.5, 1.0),
        scheduler_shift_list=(5.0, 7.0), sa_drop_rates=(0.5, 0.6),
        non_skip_steps=tuple(range(4)))
    img_lats = [jnp.full((16, 1, 8, 12), 0.2),
                jnp.full((16, 1, 16, 24), 0.2)]
    out = pipe.generate_i2v(img_lats, txt, mask, txt2, opts, decode=False)
    lt = 1 + (5 - 1) // 4
    assert out.shape == (16, lt, 16, 24)
    np.testing.assert_allclose(np.asarray(out[:, 0]), 0.2, atol=1e-6)


def test_bucketing_helpers():
    buckets = generate_crop_size_list(base_size=64, patch_size=16)
    assert all(w * h <= 64 * 64 + 16 * 16 for w, h in buckets)
    ratios = [h / w for w, h in buckets]
    (bw, bh), r = get_closest_ratio(32.0, 64.0, ratios, buckets)
    assert abs(bh / bw - 0.5) == min(abs(q - 0.5) for q in ratios)
