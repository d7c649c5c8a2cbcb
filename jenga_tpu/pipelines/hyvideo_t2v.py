"""HunyuanVideo T2V sampler: ProRes stage machine + carved MMDiT + skipping.

TPU-first redesign of the reference ``HunyuanVideoPipelineProRes.__call__``
(`/root/reference/hyvideo/diffusion/pipelines/
pipeline_hunyuan_video_prores.py:286-855`) and its driving script
(`/root/reference/jenga_hyvideo.py:236-318`):

  * each ProRes stage is its own jit specialization (shapes differ per
    stage, so per-stage compilation is the natural XLA structure);
  * the stage switch (x0-revert -> trilinear upsample -> re-noise ->
    scheduler re-shift) is host-level orchestration between stage loops;
  * fixed-list timestep skipping caches the curve-ordered image-stream
    trunk residual, and stage starts force a compute step;
  * the text-amplitude bias is a per-stage compile-time constant:
    ``-log2(sqrt(token_diff)) * scale`` at reduced resolution, 0 at full.

Presets (Base/Turbo/Flash/3Stage) are data — see
``jenga_tpu.configs.presets``.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.blocks import build_curve_plan
from ..diffusion.flow_match import flow_match_schedule
from ..diffusion.skip import HYVIDEO_NON_SKIP_STEPS, fixed_compute_schedule
from ..models import hyvideo as hy

__all__ = ["HYT2VOptions", "HYVideoT2VPipeline"]


@dataclasses.dataclass(frozen=True)
class HYT2VOptions:
    """Generation options (reference flag groups,
    `/root/reference/hyvideo/config.py:330-409`)."""
    size: tuple[int, int] = (1280, 720)     # (W, H) pixels
    video_length: int = 125                 # frames (4k+1)
    num_inference_steps: int = 50
    flow_shift: float = 7.0                 # base shift (stage 0)
    embedded_guidance_scale: float | None = 6.0
    guidance_scale: float = 1.0             # CFG (off for distilled)
    sa_drop_rates: tuple[float, ...] = (0.75, 0.85)
    p_remain: float = 0.3
    res_rate_list: tuple[float, ...] = (1.0, 1.0)
    step_rate_list: tuple[float, ...] = (0.5, 1.0)
    scheduler_shift_list: tuple[float, ...] = (7.0, 7.0)
    scale_txt_amp: float = 1.0
    txt_block_num: int = 2
    enable_skip: bool = True
    non_skip_steps: tuple[int, ...] = HYVIDEO_NON_SKIP_STEPS
    curve: str = "gilbert"
    seed: int = 0
    q_group: int = 1    # >1: shared-gather attention kernel (union block
                        # list per q_group query blocks; wins with real
                        # checkpoints whose attention is local)
    joint_sel: bool = True   # q_group>1: joint group selection (one pooled
                        # selection per q_group rows; union == density so
                        # gather bytes drop q_group x). False = exact
                        # reference per-128-row selection with union lists.


class HYVideoT2VPipeline:
    """Functional sampler around a HunyuanVideo MMDiT parameter tree."""

    VAE_STRIDE = (4, 8, 8)  # the "884" causal VAE

    def __init__(self, cfg: hy.HYVideoConfig, params, vae_decode=None,
                 mesh=None):
        self.cfg = cfg
        self.params = params
        self.vae_decode = vae_decode
        self.mesh = mesh    # sequence-parallel mesh (Ulysses in every attn)

    # ---------------------------------------------------------- stages

    def _stage_shapes(self, opts: HYT2VOptions):
        """Latent array shape and token grid per stage (reference
        ``latent_step_shapes``, `prores:420-424,567-575`)."""
        w, h = opts.size
        lt = 1 + (opts.video_length - 1) // self.VAE_STRIDE[0]
        shapes = []
        for rate in opts.res_rate_list:
            ph, pw = int(h * rate), int(w * rate)
            lat = (lt, ph // 16 * 2, pw // 16 * 2)
            grid = (lt, ph // 16, pw // 16)
            shapes.append((lat, grid))
        return shapes

    def _stage_fns(self, carve):
        # params AND carve are explicit arguments: closing over either
        # bakes multi-GB weights / ~60MB rope+curve tables into the HLO as
        # constants (compile blow-up; carve is a registered pytree whose
        # scalar fields are static metadata).
        cfg, mesh = self.cfg, self.mesh

        @jax.jit
        def full(params, carve, x, t, txt, mask, txt2, guidance):
            img, txth, aux = hy.hyvideo_embed(params, cfg, x, t, txt, mask,
                                              txt2, carve, guidance)
            img2 = hy.hyvideo_trunk(params, cfg, img, txth, aux, carve,
                                    mesh=mesh)
            v = hy.hyvideo_head(params, cfg, img2, aux, carve)
            return v, img2 - img

        @jax.jit
        def skipped(params, carve, x, t, txt, mask, txt2, guidance,
                    residual):
            img, txth, aux = hy.hyvideo_embed(params, cfg, x, t, txt, mask,
                                              txt2, carve, guidance)
            return hy.hyvideo_head(params, cfg, img + residual, aux, carve)

        def full_c(params, *a):
            return full(params, carve, *a)

        def skipped_c(params, *a):
            return skipped(params, carve, *a)

        return full_c, skipped_c

    # ---------------------------------------------------------- generate

    def generate(self, text_states, text_mask, text_states_2,
                 opts: HYT2VOptions, negative=None, decode: bool = True,
                 on_step=None, initial_latents=None, stage_noises=None):
        """Run the ProRes denoise loop.

        ``text_states`` [L, 4096] LLM token states, ``text_mask`` [L],
        ``text_states_2`` [768] CLIP pooled; ``negative`` an optional
        matching triple for CFG. Returns decoded video (with a VAE) or
        final latents [C, F, H, W] f32. ``stage_noises`` optionally maps
        stage index (1..) to the [C, F, H, W] re-noise draw used at that
        stage's switch (cross-implementation parity; the reference draws
        it from ``generator`` at the switch, `prores:700-707`).
        """
        from ..configs.validate import validate_hy_options
        validate_hy_options(opts)
        cfg = self.cfg
        shapes = self._stage_shapes(opts)
        n = opts.num_inference_steps
        splits = [int(n * r) for r in opts.step_rate_list]
        cfg_on = negative is not None and opts.guidance_scale > 1.0
        batch = 2 if cfg_on else 1

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

        # stage setups
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
                cfg, plan, opts.sa_drop_rates[min(si, len(
                    opts.sa_drop_rates) - 1)],
                opts.p_remain, text_amp=text_amp,
                txt_block_num=opts.txt_block_num, q_rows=opts.q_group,
                joint_sel=getattr(opts, "joint_sel", True))
            stage_data.append((lat, grid, carve,
                               self._stage_fns(carve)))

        # the switch happens after the forward at step s, so the *next*
        # step is the forced-compute stage start (reference sets
        # ``start_stage`` during the switch, consumed by the next forward)
        compute = (fixed_compute_schedule(
            n, opts.non_skip_steps, stage_starts=[s + 1 for s in splits])
            if opts.enable_skip else np.ones(n, bool))

        key = jax.random.PRNGKey(opts.seed)
        key, k0 = jax.random.split(key)
        lat0 = shapes[0][0]
        if initial_latents is not None:
            latents = jnp.asarray(initial_latents, jnp.float32)[None]
        else:
            latents = jax.random.normal(
                k0, (1, cfg.in_channels, *lat0), jnp.float32)

        # the INITIAL schedule uses flow_shift (reference builds the first
        # scheduler from args.flow_shift, `/root/reference/hyvideo/
        # inference.py:437`); scheduler_shift_list drives the re-shifts at
        # stage switches only
        schedule = flow_match_schedule(n, shift=opts.flow_shift,
                                       reverse=True)
        stage_idx = 0
        residual = None
        lat_shape, grid, carve, (full, skipped) = stage_data[0]

        for i in range(n):
            t = jnp.full((batch,), schedule.timestep(i), jnp.float32)
            x = (jnp.concatenate([latents] * batch)
                 if batch > 1 else latents)

            if not compute[i] and residual is not None:
                v = skipped(self.params, x, t, txt, mask, txt2, guidance,
                            residual)
            else:
                v, residual = full(self.params, x, t, txt, mask, txt2,
                                   guidance)

            if cfg_on:
                v = v[0:1] + opts.guidance_scale * (v[1:2] - v[0:1])

            if i in splits and stage_idx + 1 < len(stage_data):
                # ---- stage switch (reference `prores:697-773`)
                stage_idx += 1
                lat_shape, grid, carve, (full, skipped) = \
                    stage_data[stage_idx]
                if opts.res_rate_list[stage_idx - 1] != 1.0:
                    new_shift = opts.scheduler_shift_list[stage_idx]
                    schedule = flow_match_schedule(n, shift=new_shift,
                                                   reverse=True)
                    key, kn = jax.random.split(key)
                    if stage_noises is not None and stage_idx in stage_noises:
                        noise = jnp.asarray(stage_noises[stage_idx],
                                            jnp.float32)[None]
                    else:
                        noise = jax.random.normal(
                            kn, (1, cfg.in_channels, *lat_shape),
                            jnp.float32)
                    clean = schedule.predict_x0(i, latents, v)
                    clean = jax.image.resize(
                        clean, (1, cfg.in_channels, *lat_shape),
                        method="trilinear")
                    latents = schedule.renoise_to_step(i + 1, clean, noise)
                residual = None
                if opts.res_rate_list[stage_idx - 1] == 1.0:
                    latents = schedule.step(i, latents, v)
            else:
                latents = schedule.step(i, latents, v)

            if on_step is not None:
                # fidelity recording hook (see pipelines.loss_eval)
                on_step(i, latents[0])

        latents = latents[0]
        if decode and self.vae_decode is not None:
            return self.vae_decode(latents)
        return latents
