"""Runtime facade: load checkpoints, wire encoders + DiT + VAE + pipeline.

TPU-native counterpart of the reference's sampler layer
(`/root/reference/hyvideo/inference.py:116-693` ``HunyuanVideoSampler``,
`/root/reference/wan/text2video.py:27-109` ``WanT2V``): builds every
component from a checkpoint directory (converted on the fly from the
reference's torch files via ``jenga_tpu.convert``) or from random init for
smoke/benchmark runs, and exposes ``predict``-style entry points.

Checkpoint directory layout (same files the reference downloads,
`/root/reference/utils/model_down_hy.md`):
  hunyuan: transformers/*.pt (deepspeed or bare), vae/pytorch_model.pt,
           text_encoder/ (HF llava), text_encoder_2/ (HF CLIP)
  wan:     diffusion model .safetensors/.pth, Wan2.1_VAE.pth,
           models_t5_umt5-xxl-enc-bf16.pth
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import convert as C
from .codec import vae_hy, vae_wan
from .models import hyvideo as hy, wan as wan_lib
from .pipelines.hyvideo_i2v import HYVideoI2VPipeline
from .pipelines.hyvideo_t2v import HYVideoT2VPipeline
from .pipelines.wan_i2v import WanI2VPipeline
from .pipelines.wan_t2v import WanT2VPipeline

__all__ = ["HunyuanVideoSampler", "WanSampler"]


def _find(path, *names):
    for n in names:
        p = os.path.join(path, n)
        if os.path.exists(p):
            return p
    return None


class HunyuanVideoSampler:
    """T2V/I2V sampler for HunyuanVideo."""

    def __init__(self, cfg, params, vae_params=None, i2v=False):
        self.cfg = cfg
        self.params = params
        self.vae_params = vae_params
        self.vae_cfg = vae_hy.HYVAE_884_16C
        pipe_cls = HYVideoI2VPipeline if i2v else HYVideoT2VPipeline
        self.pipeline = pipe_cls(cfg, params, vae_decode=self.decode_latents)

    @classmethod
    def from_pretrained(cls, ckpt_dir: str | None = None, i2v: bool = False,
                        seed: int = 0, dtype: str = "bfloat16",
                        use_fp8: bool = False):
        cfg = dataclasses.replace(
            hy.HUNYUAN_VIDEO_I2V if i2v else hy.HUNYUAN_VIDEO_T2V,
            dtype=dtype)
        params = None
        vae_params = None
        if ckpt_dir:
            dit_path = _find(ckpt_dir, "pytorch_model_module.pt",
                             "mp_rank_00_model_states.pt",
                             "pytorch_model_ema.pt")
            if dit_path:
                sd = C.load_torch_state_dict(dit_path)
                params = jax.tree.map(jnp.asarray,
                                      C.convert_hyvideo_dit(sd, cfg))
            vae_path = _find(os.path.join(ckpt_dir, "vae"),
                             "pytorch_model.pt")
            if vae_path:
                vsd = C.load_torch_state_dict(vae_path)
                vae_params = jax.tree.map(
                    jnp.asarray, C.convert_hyvae(vsd, vae_hy.HYVAE_884_16C))
        if params is None:
            params = hy.init_hyvideo_params(jax.random.PRNGKey(seed), cfg)
        if use_fp8:
            from .models.fp8 import quantize_tree_fp8
            params = quantize_tree_fp8(params)
        return cls(cfg, params, vae_params, i2v=i2v)

    def decode_latents(self, latents):
        """latents [C, T, h, w] -> video [C, F, H, W] in [-1, 1]."""
        if self.vae_params is None:
            return latents
        z = jnp.asarray(latents)[None] / self.vae_cfg.scaling_factor
        video = vae_hy.vae_decode_tiled(self.vae_params, z, self.vae_cfg)
        return jnp.clip(video[0], -1.0, 1.0)

    def predict(self, text_states, text_mask, text_states_2, opts,
                negative=None, **kw):
        return self.pipeline.generate(text_states, text_mask, text_states_2,
                                      opts, negative=negative, **kw)


class WanSampler:
    """T2V/I2V sampler for Wan2.1."""

    CONFIGS = {
        "t2v-1.3B": wan_lib.WAN_T2V_1_3B,
        "t2v-14B": wan_lib.WAN_T2V_14B,
        "i2v-14B": wan_lib.WAN_I2V_14B,
    }

    def __init__(self, cfg, params, vae_params=None, model_id="wan-t2v-1.3b"):
        self.cfg = cfg
        self.params = params
        self.vae_params = vae_params
        self.vae_cfg = vae_wan.WAN_VAE_16Z
        i2v = cfg.model_type == "i2v"
        pipe_cls = WanI2VPipeline if i2v else WanT2VPipeline
        if i2v:
            self.pipeline = pipe_cls(cfg, params, model_id=model_id,
                                     vae_decode=self.decode_latents)
        else:
            self.pipeline = pipe_cls(cfg, params, model_id=model_id,
                                     vae_decode=self.decode_latents)

    @classmethod
    def from_pretrained(cls, task: str = "t2v-1.3B",
                        ckpt_dir: str | None = None, seed: int = 0,
                        dtype: str = "bfloat16"):
        cfg = dataclasses.replace(cls.CONFIGS[task], dtype=dtype)
        model_id = f"wan-{task.lower()}".replace("t2v-", "t2v-").replace(
            ".", ".")
        model_id = {"t2v-1.3B": "wan-t2v-1.3b", "t2v-14B": "wan-t2v-14b",
                    "i2v-14B": "wan-i2v-720p"}[task]
        params = None
        vae_params = None
        if ckpt_dir:
            dit = _find(ckpt_dir, "diffusion_pytorch_model.pth",
                        "diffusion_pytorch_model.safetensors")
            if dit and dit.endswith(".pth"):
                sd = C.load_torch_state_dict(dit)
                params = jax.tree.map(jnp.asarray,
                                      C.convert_wan_dit(sd, cfg))
            vp = _find(ckpt_dir, "Wan2.1_VAE.pth", "vae_step_411000.pth")
            if vp:
                vsd = C.load_torch_state_dict(vp)
                vae_params = jax.tree.map(
                    jnp.asarray, C.convert_wanvae(vsd, vae_wan.WAN_VAE_16Z))
        if params is None:
            params = wan_lib.init_wan_params(jax.random.PRNGKey(seed), cfg)
        return cls(cfg, params, vae_params, model_id=model_id)

    def decode_latents(self, latents):
        if self.vae_params is None:
            return latents
        z = jnp.asarray(latents)[None]
        video = vae_wan.wanvae_decode(self.vae_params, z, self.vae_cfg)
        return video[0]

    def generate(self, *args, **kw):
        return self.pipeline.generate(*args, **kw)
