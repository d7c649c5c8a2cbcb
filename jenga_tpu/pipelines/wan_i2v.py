"""Wan2.1 image-to-video sampler: CLIP features + mask-concat conditioning.

Counterpart of the reference I2V path (`/root/reference/jenga_wan.py:
278-500`, `/root/reference/wan/image2video.py:29-347`): the conditioning
tensor ``y`` concatenates a 4-channel temporal mask (first frame = 1,
grouped by the VAE's 4x temporal stride) with the VAE encoding of the
first frame padded by zero frames, giving in_dim 16+4+16=36; CLIP ViT
features of the image enter through the decoupled cross-attention branch.
Carving/TeaCache reuse the T2V machinery.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.blocks import build_curve_plan
from .wan_t2v import _solver
from ..models import wan as wan_lib
from .wan_t2v import WanT2VOptions, WanT2VPipeline

__all__ = ["WanI2VOptions", "WanI2VPipeline", "build_i2v_mask",
           "i2v_latent_size"]


@dataclasses.dataclass(frozen=True)
class WanI2VOptions(WanT2VOptions):
    max_area: int = 720 * 1280
    shift: float = 5.0          # reference uses 3.0 for 480p sizes (the
                                # CLI applies that by max_area)
    sampling_steps: int = 40    # reference i2v default (jenga_wan.py:674)
    guide_scale: float = 5.0    # reference i2v default (argparse :814)
    enable_turbo: bool = False


def i2v_latent_size(img_h: int, img_w: int, max_area: int,
                    vae_stride=(4, 8, 8), patch=(1, 2, 2)):
    """Latent (h, w) for an image under the max-area budget
    (`/root/reference/jenga_wan.py:328-336`)."""
    aspect = img_h / img_w
    lat_h = round(np.sqrt(max_area * aspect) // vae_stride[1] //
                  patch[1] * patch[1])
    lat_w = round(np.sqrt(max_area / aspect) // vae_stride[2] //
                  patch[2] * patch[2])
    return int(lat_h), int(lat_w)


def build_i2v_mask(frame_num: int, lat_h: int, lat_w: int,
                   t_stride: int = 4):
    """4-channel first-frame mask in latent time (reference
    `/root/reference/jenga_wan.py:355-362`): frame 0 repeated t_stride
    times then zeros, grouped into [t_stride, T_lat, h, w]."""
    msk = np.ones((frame_num, lat_h, lat_w), np.float32)
    msk[1:] = 0.0
    msk = np.concatenate([np.repeat(msk[0:1], t_stride, axis=0), msk[1:]])
    t_lat = msk.shape[0] // t_stride
    msk = msk.reshape(t_lat, t_stride, lat_h, lat_w).transpose(1, 0, 2, 3)
    return msk


class WanI2VPipeline(WanT2VPipeline):
    """I2V sampler around a Wan i2v DiT (model_type='i2v', in_dim 36)."""

    def _stage_fns_i2v(self, carve):
        # params AND carve are explicit arguments (closing over either
        # bakes weights / rope+curve tables into the HLO as constants).
        cfg, mesh = self.cfg, self.mesh

        @jax.jit
        def full(params, carve, x2, t2, ctx2, y2, clip2, top_k):
            h0, aux = wan_lib.wan_embed(params, cfg, x2, t2, ctx2, carve,
                                        clip_fea=clip2, y=y2)
            h1 = wan_lib.wan_trunk(params, cfg, h0, aux, carve, top_k,
                                   mesh=mesh)
            v = wan_lib.wan_head(params, cfg, h1, aux, carve)
            return v, h1 - h0

        @jax.jit
        def skipped(params, carve, x2, t2, ctx2, y2, clip2, residual):
            h0, aux = wan_lib.wan_embed(params, cfg, x2, t2, ctx2, carve,
                                        clip_fea=clip2, y=y2)
            return wan_lib.wan_head(params, cfg, h0 + residual, aux, carve)

        dc = dataclasses.replace(carve, sa_drop_rate=0.0)

        def full_c(params, *a):
            return full(params, carve, *a)

        def full_dense_c(params, *a):
            return full(params, dc, *a, jnp.zeros((), jnp.int32))

        def skipped_c(params, *a):
            return skipped(params, carve, *a)

        return full_c, full_dense_c, skipped_c

    def generate_i2v(self, image_latent, clip_fea, context, context_null,
                     frame_num: int, lat_h: int, lat_w: int,
                     opts: WanI2VOptions, decode: bool = True):
        """``image_latent``: [16, T_lat, lat_h, lat_w] VAE encoding of the
        first frame + zero padding (already normalized); ``clip_fea``:
        [257, 1280] CLIP image tokens."""
        from ..configs.validate import validate_wan_options
        validate_wan_options(opts)
        cfg = self.cfg
        t_lat = (frame_num - 1) // self.VAE_STRIDE[0] + 1

        msk = jnp.asarray(build_i2v_mask(frame_num, lat_h, lat_w))
        y = jnp.concatenate([msk, jnp.asarray(image_latent)], axis=0)[None]
        y2 = jnp.concatenate([y, y])
        clip2 = jnp.stack([jnp.asarray(clip_fea)] * 2)

        def pad_ctx(x):
            x = jnp.asarray(x)[:cfg.text_len]
            return jnp.pad(x, ((0, cfg.text_len - x.shape[0]), (0, 0)))
        ctx2 = jnp.stack([pad_ctx(context), pad_ctx(context_null)])

        grid = (t_lat, lat_h // 2, lat_w // 2)
        plan = build_curve_plan(grid, opts.curve, 128)
        carve = wan_lib.make_wan_carve(
            cfg, plan, opts.sa_drop_rates[0], opts.p_remain,
            q_rows=getattr(opts, "q_group", 1),
            joint_sel=getattr(opts, "joint_sel", True))
        full, full_dense, skipped = self._stage_fns_i2v(carve)

        mk_sched, mk_init, do_step, _, _ = _solver(opts.solver)
        schedule = mk_sched(opts.sampling_steps, shift=opts.shift)
        state = mk_init(schedule)
        n = schedule.num_steps
        realized_t = np.array([schedule.timestep(i) for i in range(n)])
        compute = self._teacache_schedule(realized_t, opts, set())

        key = jax.random.PRNGKey(opts.seed)
        latents = jax.random.normal(key, (1, 16, t_lat, lat_h, lat_w),
                                    jnp.float32)
        residual = None
        nb = -(-carve.seqlen // 128)
        for idx in range(n):
            rates = opts.sa_drop_rates
            base = rates[0] if idx <= opts.turbo_switch_step else rates[-1]
            warm = idx / max(n - 1, 1) * 10.0
            drop = min(base, warm * base)

            t2 = jnp.full((2,), schedule.timestep(idx), jnp.float32)
            x2 = jnp.concatenate([latents, latents]).astype(jnp.float32)

            if not compute[idx] and residual is not None:
                v2 = skipped(self.params, x2, t2, ctx2, y2, clip2, residual)
            elif drop <= 0.25:
                v2, residual = full_dense(self.params, x2, t2, ctx2, y2,
                                          clip2)
            else:
                top_k = jnp.int32(max(int(nb * (1.0 - drop)), 1))
                v2, residual = full(self.params, x2, t2, ctx2, y2, clip2,
                                    top_k)

            v = v2[1:2] + opts.guide_scale * (v2[0:1] - v2[1:2])
            state, latents = do_step(schedule, state, v, latents)

        latents = latents[0]
        if decode and self.vae_decode is not None:
            return self.vae_decode(latents)
        return latents
