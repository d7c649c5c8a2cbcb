"""End-to-end Wan T2V sampler tests on a tiny model (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jenga_tpu.diffusion.skip import (
    fixed_compute_schedule,
    teacache_compute_schedule,
)
from jenga_tpu.diffusion.unipc import (
    unipc_add_noise,
    unipc_init,
    unipc_schedule,
    unipc_step,
    unipc_step_to_zero,
)
from jenga_tpu.models.wan import WanConfig, init_wan_params
from jenga_tpu.pipelines.wan_t2v import WanT2VOptions, WanT2VPipeline

TINY = WanConfig(dim=128, ffn_dim=256, freq_dim=32, num_heads=2,
                 num_layers=2, text_dim=64, text_len=16, dtype="float32")


def _pipeline():
    params = init_wan_params(jax.random.PRNGKey(0), TINY)
    # non-zero head so the trajectory actually moves
    params["head"]["linear"]["w"] = jax.random.normal(
        jax.random.PRNGKey(9),
        params["head"]["linear"]["w"].shape, jnp.float32) * 0.05
    return WanT2VPipeline(TINY, params)


OPTS = WanT2VOptions(size=(96, 64), frame_num=9, sampling_steps=6,
                     shift=5.0, sa_drop_rates=(0.75,), p_remain=0.9,
                     teacache_thresh=None, seed=3)


class TestUniPC:
    def test_schedule_monotone_and_terminal_zero(self):
        s = unipc_schedule(20, shift=5.0)
        assert s.sigmas[0] > 0.9
        assert s.sigmas[-1] == 0.0
        assert (np.diff(s.sigmas) < 0).all()

    def test_step_to_zero_is_x0(self):
        s = unipc_schedule(10, shift=3.0)
        x = jnp.ones((1, 4))
        v = jnp.full((1, 4), 2.0)
        x0 = unipc_step_to_zero(s, 3, v, x)
        np.testing.assert_allclose(np.asarray(x0),
                                   1.0 - float(s.sigmas[3]) * 2.0)

    def test_add_noise_roundtrip(self):
        s = unipc_schedule(10, shift=3.0)
        clean = jnp.full((2, 2), 0.5)
        noise = jnp.full((2, 2), -1.0)
        noisy = unipc_add_noise(s, 4, clean, noise)
        sig = float(s.sigmas[4])
        np.testing.assert_allclose(np.asarray(noisy),
                                   (1 - sig) * 0.5 + sig * -1.0, rtol=1e-6)

    def test_full_solve_linear_model_converges(self):
        """With v = x - x0 (exact linear flow field), UniPC must recover x0
        nearly exactly: x_sigma = (1-sigma) x0 + sigma eps, v = eps - x0."""
        key = jax.random.PRNGKey(1)
        x0 = jax.random.normal(key, (4, 4))
        eps = jax.random.normal(jax.random.fold_in(key, 1), (4, 4))
        s = unipc_schedule(12, shift=3.0)
        state = unipc_init(s)
        x = eps  # sigma=1 start
        for i in range(s.num_steps):
            v = eps - x0  # exact velocity, constant
            state, x = unipc_step(s, state, v, x)
        # reference-exact sigma grid starts at 0.999 while the initial noise
        # sits at sigma=1 (the reference's own approximation): ~2e-3 bound
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=2.5e-3)

    def test_corrector_disable_resets_order(self):
        s = unipc_schedule(8, shift=3.0)
        state = unipc_init(s, disable_corrector=(0, 1, 2))
        x = jnp.ones((2, 2))
        v = jnp.full((2, 2), 0.1)
        state, x = unipc_step(s, state, v, x)
        assert state.disable_corrector == ()
        assert state.this_order == 1


class TestSkipSchedules:
    def test_fixed_schedule(self):
        sched = fixed_compute_schedule(10, (0, 3, 7), stage_starts=(5,))
        assert list(np.nonzero(sched)[0]) == [0, 3, 5, 7]

    def test_teacache_replay(self):
        metrics = [0.0, 0.001, 0.001, 0.5, 0.001, 0.001, 0.6, 0.001]
        sched = teacache_compute_schedule(
            metrics, thresh=0.1, coefficients=(1.0, 0.0),  # identity poly
            ret_steps=1, cutoff_steps=8)
        # step0 forced; small metrics accumulate under thresh -> skip;
        # large metric triggers compute + reset
        assert sched[0] and sched[3] and sched[6]
        assert not sched[1] and not sched[2]

    def test_teacache_accumulation(self):
        metrics = [0.0, 0.06, 0.06, 0.06, 0.06]
        sched = teacache_compute_schedule(
            metrics, thresh=0.1, coefficients=(1.0, 0.0),
            ret_steps=1, cutoff_steps=5)
        # 0.06 < 0.1 skip; 0.12 >= 0.1 compute+reset; repeat
        assert list(sched) == [True, False, True, False, True]


class TestPipeline:
    def test_generate_base(self):
        pipe = _pipeline()
        ctx = jax.random.normal(jax.random.PRNGKey(2), (10, TINY.text_dim))
        out = pipe.generate(ctx, jnp.zeros_like(ctx), OPTS, decode=False)
        c, f, lh, lw = pipe._latent_shape(OPTS)
        assert out.shape == (c, f, lh, lw)
        assert np.isfinite(np.asarray(out)).all()

    def test_generate_turbo_switches_resolution(self):
        pipe = _pipeline()
        opts = WanT2VOptions(size=(128, 96), frame_num=5, sampling_steps=6,
                             shift=5.0, sa_drop_rates=(0.6, 0.7),
                             enable_turbo=True, turbo_switch_step=3,
                             teacache_thresh=None, seed=1)
        ctx = jnp.zeros((4, TINY.text_dim))
        out = pipe.generate(ctx, ctx, opts, decode=False)
        c, f, lh, lw = pipe._latent_shape(opts)
        assert out.shape == (c, f, lh, lw)
        assert np.isfinite(np.asarray(out)).all()

    def test_generate_with_teacache(self):
        pipe = _pipeline()
        opts = WanT2VOptions(size=(96, 64), frame_num=5, sampling_steps=8,
                             shift=5.0, sa_drop_rates=(0.75,),
                             teacache_thresh=1e9,  # skip everything possible
                             use_ret_steps=False, seed=2)
        ctx = jnp.zeros((4, TINY.text_dim))
        out = pipe.generate(ctx, ctx, opts, decode=False)
        assert np.isfinite(np.asarray(out)).all()

    def test_seed_determinism(self):
        pipe = _pipeline()
        ctx = jnp.zeros((4, TINY.text_dim))
        a = pipe.generate(ctx, ctx, OPTS, decode=False)
        b = pipe.generate(ctx, ctx, OPTS, decode=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_joint_group_selection_close_to_per_row(self):
        """The TPU production carving granularity (q_group=4 +
        joint_sel: one pooled selection per 4 query blocks feeding the
        all-member shared-gather kernel) must track the per-row-selection
        trajectory end-to-end — the pipeline-level closeness evidence for
        the headline bench's joint-selection deviation (the reference
        always selects per 128-token row,
        `/root/reference/hyvideo/modules/attention_block_triton_diffres.py
        :198-295`)."""
        import dataclasses
        pipe = _pipeline()
        ctx = jax.random.normal(jax.random.PRNGKey(5), (10, TINY.text_dim))
        # big enough for 2 groups of 4 query blocks: grid (6, 12, 16)
        # = 1152 video tokens = 9 blocks
        per_row = WanT2VOptions(size=(256, 192), frame_num=21,
                                sampling_steps=4, shift=5.0,
                                sa_drop_rates=(0.6, 0.7), p_remain=0.7,
                                teacache_thresh=None, seed=3, q_group=1)
        joint = dataclasses.replace(per_row, q_group=4, joint_sel=True)
        a = pipe.generate(ctx, jnp.zeros_like(ctx), per_row, decode=False)
        b = pipe.generate(ctx, jnp.zeros_like(ctx), joint, decode=False)
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.isfinite(b).all()
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-8)
        assert rel < 0.05, f"joint-selection trajectory diverged: rel={rel}"


class TestDPM:
    def test_linear_field_convergence(self):
        from jenga_tpu.diffusion.dpm import dpm_init, dpm_schedule, dpm_step
        key = jax.random.PRNGKey(4)
        x0 = jax.random.normal(key, (4, 4))
        eps = jax.random.normal(jax.random.fold_in(key, 1), (4, 4))
        s = dpm_schedule(14, shift=3.0)
        state = dpm_init(s)
        x = eps
        for i in range(s.num_steps):
            sigma = float(s.sigmas[i])
            # exact velocity of the linear flow at the current point
            v = eps - x0
            state, x = dpm_step(s, state, v, x)
        # reference-exact sigma grid starts at 0.999 while the initial noise
        # sits at sigma=1 (the reference's own approximation): ~2e-3 bound
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=2.5e-3)

    def test_step_to_zero_and_add_noise(self):
        from jenga_tpu.diffusion.dpm import (dpm_add_noise, dpm_schedule,
                                             dpm_step_to_zero)
        s = dpm_schedule(10, shift=2.0)
        x = jnp.ones((2,))
        v = jnp.full((2,), 0.5)
        sig = float(s.sigmas[3])
        np.testing.assert_allclose(
            np.asarray(dpm_step_to_zero(s, 3, v, x)), 1 - sig * 0.5)
        np.testing.assert_allclose(
            np.asarray(dpm_add_noise(s, 3, x, v)),
            (1 - sig) * 1.0 + sig * 0.5, rtol=1e-6)
