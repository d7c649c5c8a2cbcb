"""HunyuanVideo image-to-video sampler (token_replace / latent_concat).

Extends the T2V ProRes stage machine with the reference's I2V conditioning
(`/root/reference/hyvideo_i2v/diffusion/pipelines/
pipeline_hunyuan_video_prores.py:485-706`, `/root/reference/jenga_hyi2v.py`):

  * per-stage VAE-encoded conditioning image latents (``image_latents`` is
    a list, one [C, 1, h, w] latent per ProRes stage);
  * ``token_replace``: the clean image latent is re-pinned as frame 0
    after every solver step (the solver integrates frames 1..F-1 only),
    and the model gives first-frame tokens the t=0 modulation;
  * ``latent_concat``: image latent + binary first-frame mask ride along
    as extra input channels (in_channels 16+16+1);
  * ``i2v_stability``: initial noise blended with the image latent
    (x = 0.999 n + 0.001 img).

Also provides the reference's aspect-ratio bucketing helpers
(`/root/reference/hyvideo_i2v/utils/data_utils.py:37-84`).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.flow_match import flow_match_schedule
from ..diffusion.skip import HYI2V_STEP_CALC, fixed_compute_schedule
from ..curves.blocks import build_curve_plan
from ..models import hyvideo as hy
from .hyvideo_t2v import HYT2VOptions, HYVideoT2VPipeline

__all__ = ["HYI2VOptions", "HYVideoI2VPipeline", "get_closest_ratio",
           "generate_crop_size_list"]


def generate_crop_size_list(base_size: int = 256, patch_size: int = 16,
                            max_ratio: float = 4.0):
    """All (w, h) buckets whose patch count equals base grid and whose
    aspect ratio is bounded (reference ``generate_crop_size_list``)."""
    num_patches = round((base_size / patch_size) ** 2)
    assert max_ratio >= 1.0
    crop_size_list = []
    wp, hp = num_patches, 1
    while wp > 0:
        if max(wp, hp) / min(wp, hp) <= max_ratio:
            crop_size_list.append((wp * patch_size, hp * patch_size))
        if (hp + 1) * wp <= num_patches:
            hp += 1
        else:
            wp -= 1
    return crop_size_list


def get_closest_ratio(height: float, width: float, ratios, buckets):
    """Pick the bucket whose aspect ratio is closest (reference
    ``get_closest_ratio``)."""
    aspect = float(height) / float(width)
    idx = int(np.argmin([abs(aspect - r) for r in ratios]))
    return buckets[idx], ratios[idx]


@dataclasses.dataclass(frozen=True)
class HYI2VOptions(HYT2VOptions):
    i2v_condition_type: str = "token_replace"   # | latent_concat
    i2v_stability: bool = True
    flow_shift: float = 5.0
    # reference i2v preset: initial shift 5.0 but stage re-shifts 7 7
    # (`/root/reference/scripts/hyi2v_jenga_base.sh:20,29`)
    scheduler_shift_list: tuple[float, ...] = (7.0, 7.0)
    non_skip_steps: tuple[int, ...] = HYI2V_STEP_CALC
    txt_block_num: int = 4


class HYVideoI2VPipeline(HYVideoT2VPipeline):
    """I2V sampler; model cfg must match the condition type
    (``HUNYUAN_VIDEO_I2V`` for latent_concat's 33 input channels)."""

    def generate_i2v(self, image_latents, text_states, text_mask,
                     text_states_2, opts: HYI2VOptions, negative=None,
                     decode: bool = True):
        """``image_latents``: list of per-stage [C, 1, h, w] clean latents
        (already VAE-scaled), one per ProRes stage."""
        from ..configs.validate import validate_hy_options
        validate_hy_options(opts)
        cfg = self.cfg
        shapes = self._stage_shapes(opts)
        assert len(image_latents) == len(shapes), \
            "need one conditioning latent per ProRes stage"
        n = opts.num_inference_steps
        splits = [int(n * r) for r in opts.step_rate_list]
        cfg_on = negative is not None and opts.guidance_scale > 1.0
        batch = 2 if cfg_on else 1
        cond = opts.i2v_condition_type

        def stack(pos, neg):
            a = jnp.asarray(pos)[None]
            if not cfg_on:
                return a
            return jnp.concatenate([jnp.asarray(neg)[None], a])

        txt = stack(text_states, negative[0] if cfg_on else None)
        mask = stack(text_mask, negative[1] if cfg_on else None)
        txt2 = stack(text_states_2, negative[2] if cfg_on else None)
        guidance = None
        if cfg.guidance_embed:
            g = (opts.embedded_guidance_scale or 1.0) * 1000.0
            guidance = jnp.full((batch,), g, jnp.float32)

        full_grid = shapes[-1][1]
        token_full = full_grid[1] * full_grid[2]
        stage_data = []
        for si, (lat, grid) in enumerate(shapes):
            plan = build_curve_plan(grid, opts.curve, 128)
            token_diff = (grid[1] * grid[2]) / token_full
            text_amp = (0.0 if token_diff == 1.0 or si > 0 else
                        -math.log2(math.sqrt(token_diff))
                        * opts.scale_txt_amp)
            carve = hy.make_hy_carve(
                cfg, plan,
                opts.sa_drop_rates[min(si, len(opts.sa_drop_rates) - 1)],
                opts.p_remain, text_amp=text_amp,
                txt_block_num=opts.txt_block_num,
                q_rows=getattr(opts, "q_group", 1),
                joint_sel=getattr(opts, "joint_sel", True))
            stage_data.append((lat, grid, carve,
                               self._stage_fns(carve)))

        compute = (fixed_compute_schedule(
            n, opts.non_skip_steps, stage_starts=[s + 1 for s in splits])
            if opts.enable_skip else np.ones(n, bool))

        key = jax.random.PRNGKey(opts.seed)
        key, k0 = jax.random.split(key)
        lat0 = shapes[0][0]
        img_lat = jnp.asarray(image_latents[0])[None]  # [1, C, 1, h, w]
        latents = jax.random.normal(
            k0, (1, 16, *lat0), jnp.float32)
        if opts.i2v_stability:
            # x = 0.999 noise + 0.001 image (reference `prores:499-501`)
            rep = jnp.broadcast_to(img_lat, latents.shape)
            latents = latents * 0.999 + rep * (1 - 0.999)
        if cond == "token_replace":
            latents = jnp.concatenate([img_lat, latents[:, :, 1:]], axis=2)

        schedule = flow_match_schedule(
            n, shift=opts.scheduler_shift_list[0], reverse=True)
        stage_idx = 0
        residual = None
        lat_shape, grid, carve, (full, skipped) = stage_data[0]

        def model_input(latents, img_lat, lat_shape):
            if cond != "latent_concat":
                return latents
            rep = jnp.broadcast_to(img_lat, (1, 16, *lat_shape))
            rep = jnp.concatenate([rep[:, :, :1],
                                   jnp.zeros_like(rep[:, :, 1:])], axis=2)
            m = jnp.zeros((1, 1, *lat_shape)).at[:, :, 0].set(1.0)
            return jnp.concatenate([latents, rep, m], axis=1)

        for i in range(n):
            t = jnp.full((batch,), schedule.timestep(i), jnp.float32)
            inp = model_input(latents, img_lat, lat_shape)
            x = jnp.concatenate([inp] * batch) if batch > 1 else inp

            if not compute[i] and residual is not None:
                v = skipped(self.params, x, t, txt, mask, txt2, guidance,
                            residual)
            else:
                v, residual = full(self.params, x, t, txt, mask, txt2,
                                   guidance)
            if cfg_on:
                v = v[0:1] + opts.guidance_scale * (v[1:2] - v[0:1])

            if i in splits and stage_idx + 1 < len(stage_data):
                stage_idx += 1
                lat_shape, grid, carve, (full, skipped) = \
                    stage_data[stage_idx]
                img_lat = jnp.asarray(image_latents[stage_idx])[None]
                if opts.res_rate_list[stage_idx - 1] != 1.0:
                    new_shift = opts.scheduler_shift_list[stage_idx]
                    schedule = flow_match_schedule(n, shift=new_shift,
                                                   reverse=True)
                    key, kn = jax.random.split(key)
                    noise = jax.random.normal(kn, (1, 16, *lat_shape),
                                              jnp.float32)
                    clean = schedule.predict_x0(i, latents, v)
                    clean = jax.image.resize(clean, (1, 16, *lat_shape),
                                             method="trilinear")
                    latents = schedule.renoise_to_step(i + 1, clean, noise)
                    if cond == "token_replace":
                        latents = jnp.concatenate(
                            [img_lat, latents[:, :, 1:]], axis=2)
                residual = None
                if opts.res_rate_list[stage_idx - 1] == 1.0:
                    latents = self._i2v_step(schedule, i, latents, v,
                                             img_lat, cond)
            else:
                latents = self._i2v_step(schedule, i, latents, v, img_lat,
                                         cond)

        latents = latents[0]
        if decode and self.vae_decode is not None:
            return self.vae_decode(latents)
        return latents

    @staticmethod
    def _i2v_step(schedule, i, latents, v, img_lat, cond):
        """token_replace integrates frames 1: and re-pins the clean frame 0
        (reference `prores:687-706`)."""
        if cond == "token_replace":
            rest = schedule.step(i, latents[:, :, 1:], v[:, :, 1:])
            return jnp.concatenate([img_lat, rest], axis=2)
        return schedule.step(i, latents, v)
