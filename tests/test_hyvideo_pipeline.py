"""HunyuanVideo ProRes pipeline tests on a tiny model (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from jenga_tpu.diffusion.flow_match import flow_match_schedule
from jenga_tpu.models.hyvideo import HYVideoConfig, init_hyvideo_params
from jenga_tpu.pipelines.hyvideo_t2v import HYT2VOptions, HYVideoT2VPipeline

TINY = HYVideoConfig(hidden_size=128, heads_num=2, double_blocks=1,
                     single_blocks=2, rope_dim_list=(16, 24, 24),
                     text_states_dim=48, text_states_dim_2=24,
                     refiner_depth=1, guidance_embed=True, dtype="float32")


def _pipe():
    params = init_hyvideo_params(jax.random.PRNGKey(0), TINY)
    params["final_layer"]["linear"]["w"] = jax.random.normal(
        jax.random.PRNGKey(8),
        params["final_layer"]["linear"]["w"].shape, jnp.float32) * 0.05
    return HYVideoT2VPipeline(TINY, params)


def _text(key):
    txt = jax.random.normal(key, (6, TINY.text_states_dim))
    mask = jnp.ones((6,), jnp.int32)
    txt2 = jax.random.normal(jax.random.fold_in(key, 1),
                             (TINY.text_states_dim_2,))
    return txt, mask, txt2


class TestFlowMatchSchedule:
    def test_shift_changes_sigmas(self):
        a = flow_match_schedule(10, shift=1.0)
        b = flow_match_schedule(10, shift=7.0)
        assert a.sigmas[5] < b.sigmas[5]  # shift pushes mass to high noise

    def test_predict_x0_renoise_roundtrip(self):
        """renoise(predict_x0(x, v), noise=eps) at the same step recovers x
        when v is the exact flow velocity eps - x0."""
        s = flow_match_schedule(10, shift=5.0)
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (4,))
        eps = jax.random.normal(jax.random.fold_in(key, 1), (4,))
        i = 3
        sig = float(s.sigmas[i])
        x = (1 - sig) * x0 + sig * eps
        v = eps - x0  # d x / d sigma
        clean = s.predict_x0(i, x, v)
        np.testing.assert_allclose(np.asarray(clean), np.asarray(x0),
                                   atol=1e-5)
        back = s.renoise_to_step(i, clean, eps)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                                   atol=1e-5)

    def test_euler_integrates_linear_field(self):
        s = flow_match_schedule(40, shift=3.0)
        key = jax.random.PRNGKey(2)
        x0 = jax.random.normal(key, (4,))
        eps = jax.random.normal(jax.random.fold_in(key, 1), (4,))
        x = eps
        for i in range(s.num_steps):
            x = s.step(i, x, eps - x0)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


class TestHYPipeline:
    OPTS = HYT2VOptions(size=(96, 64), video_length=5,
                        num_inference_steps=6, flow_shift=7.0,
                        sa_drop_rates=(0.6, 0.7), p_remain=0.5,
                        res_rate_list=(1.0, 1.0), step_rate_list=(0.5, 1.0),
                        scheduler_shift_list=(7.0, 7.0),
                        non_skip_steps=(0, 1, 3, 5), seed=4)

    def test_base_two_stage_same_res(self):
        pipe = _pipe()
        txt, mask, txt2 = _text(jax.random.PRNGKey(1))
        out = pipe.generate(txt, mask, txt2, self.OPTS, decode=False)
        lt = 1 + (5 - 1) // 4
        assert out.shape == (TINY.in_channels, lt, 64 // 16 * 2, 96 // 16 * 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_prores_multi_resolution(self):
        pipe = _pipe()
        opts = HYT2VOptions(size=(192, 128), video_length=5,
                            num_inference_steps=6,
                            sa_drop_rates=(0.6, 0.7), p_remain=0.5,
                            res_rate_list=(0.5, 1.0),
                            step_rate_list=(0.5, 1.0),
                            scheduler_shift_list=(7.0, 9.0),
                            scale_txt_amp=1.0,
                            non_skip_steps=tuple(range(6)), seed=5)
        txt, mask, txt2 = _text(jax.random.PRNGKey(2))
        out = pipe.generate(txt, mask, txt2, opts, decode=False)
        lt = 2
        assert out.shape == (TINY.in_channels, lt, 128 // 16 * 2,
                             192 // 16 * 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_cfg_branch(self):
        pipe = _pipe()
        key = jax.random.PRNGKey(3)
        pos = _text(key)
        neg = _text(jax.random.fold_in(key, 9))
        opts = HYT2VOptions(size=(96, 64), video_length=5,
                            num_inference_steps=4, guidance_scale=4.0,
                            sa_drop_rates=(0.0,), p_remain=0.5,
                            res_rate_list=(1.0,), step_rate_list=(1.0,),
                            scheduler_shift_list=(7.0,),
                            enable_skip=False, seed=6)
        out = pipe.generate(pos[0], pos[1], pos[2], opts, negative=neg,
                            decode=False)
        assert np.isfinite(np.asarray(out)).all()

    def test_skip_changes_vs_full_compute(self):
        pipe = _pipe()
        txt, mask, txt2 = _text(jax.random.PRNGKey(4))
        full_opts = HYT2VOptions(**{**self.OPTS.__dict__,
                                    "non_skip_steps": tuple(range(6))})
        a = pipe.generate(txt, mask, txt2, self.OPTS, decode=False)
        b = pipe.generate(txt, mask, txt2, full_opts, decode=False)
        # skipping reuses residuals -> different (but finite) trajectory
        assert np.isfinite(np.asarray(a)).all()
        assert not np.allclose(np.asarray(a), np.asarray(b))
