"""Runtime facade: load checkpoints, wire encoders + DiT + VAE + pipeline.

TPU-native counterpart of the reference's sampler layer
(`/root/reference/hyvideo/inference.py:116-693` ``HunyuanVideoSampler``,
`/root/reference/wan/text2video.py:27-109` ``WanT2V``): builds every
component from a checkpoint directory (converted on the fly from the
reference's torch files via ``jenga_tpu.convert``) or from random init for
smoke/benchmark runs, and exposes ``predict``-style entry points that go
all the way from a text prompt (and image, for I2V) to decoded video.

Checkpoint directory layout (same files the reference downloads,
`/root/reference/utils/model_down_hy.md`):
  hunyuan: transformers/*.pt (deepspeed, bare, or fp8 + scale map),
           vae/pytorch_model.pt, text_encoder/ (HF llava dir),
           text_encoder_2/ (HF CLIP dir)
  wan:     diffusion model .safetensors (sharded ok) or .pth,
           Wan2.1_VAE.pth, models_t5_umt5-xxl-enc-bf16.pth,
           google/umt5-xxl/ tokenizer dir,
           models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth (i2v)
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

__all__ = ["HunyuanVideoSampler", "WanSampler", "load_image"]

# CLIP image preprocessing constants (`/root/reference/wan/modules/
# clip.py:418-420`)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

# default negative prompt applied when none is given (the reference
# substitutes ``config.sample_neg_prompt`` for empty negatives,
# `/root/reference/jenga_wan.py:109-110`,
# `/root/reference/wan/configs/shared_config.py:19`)
WAN_DEFAULT_NEGATIVE_PROMPT = (
    "色调艳丽，过曝，静态，细节模糊不清，字幕，风格，作品，画作，画面，静止，"
    "整体发灰，最差质量，低质量，JPEG压缩残留，丑陋的，残缺的，多余的手指，"
    "画得不好的手部，画得不好的脸部，畸形的，毁容的，形态畸形的肢体，"
    "手指融合，静止不动的画面，杂乱的背景，三条腿，背景人很多，倒着走")


def _find(path, *names):
    for n in names:
        p = os.path.join(path, n)
        if os.path.exists(p):
            return p
    return None


def load_image(path: str) -> np.ndarray:
    """Image file -> [3, H, W] f32 in [0, 1] (RGB)."""
    from PIL import Image
    img = Image.open(path).convert("RGB")
    return np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0


def _resize_chw(img: np.ndarray, h: int, w: int) -> jnp.ndarray:
    # bicubic: the reference preprocessing is bicubic for both the CLIP
    # tower (`/root/reference/wan/modules/clip.py:531-534`) and the I2V
    # first-frame VAE encode (mode='bicubic')
    return jax.image.resize(jnp.asarray(img), (img.shape[0], h, w),
                            method="cubic")


class HunyuanVideoSampler:
    """T2V/I2V sampler for HunyuanVideo."""

    TEXT_LEN = 256          # --text-len default
    SKIP_LAYER = 2          # --hidden-state-skip-layer default

    def __init__(self, cfg, params, vae_params=None, i2v=False,
                 text_encoder=None, text_encoder_2=None, mesh=None,
                 offload_to_host: bool = False):
        # cold-start: every ProRes stage is its own XLA program (minutes
        # cold at 115k tokens); the persistent cache makes process #2
        # start in seconds (COMPILE.json, RUNBOOK.md "Cold start").
        # ensure (not enable): the CLI's --compile-cache-dir /
        # --no-compile-cache decision, if one was made, wins.
        from .utils.compile_cache import ensure_compile_cache
        ensure_compile_cache()
        self.cfg = cfg
        if mesh is not None:
            from .parallel.mesh import shard_params_fsdp
            params = shard_params_fsdp(params, mesh)
        self.params = params
        # CPU offload (reference ``--use-cpu-offload``,
        # `/root/reference/hyvideo/inference.py:453-454`): VAE + text
        # encoder weights stay in host RAM, leaving HBM to the DiT. Text
        # encoding runs on the CPU backend (a 256-token prefill is cheap);
        # the conv-heavy VAE decode streams its weights to the device per
        # call instead (transient HBM, compute stays on the TPU).
        self.offload = offload_to_host
        if offload_to_host:
            cpu = jax.devices("cpu")[0]

            def to_host(tree):
                return (None if tree is None else
                        jax.tree.map(lambda x: jax.device_put(x, cpu), tree))

            vae_params = to_host(vae_params)
            if text_encoder is not None:
                tok, tcfg, tp = text_encoder
                text_encoder = (tok, tcfg, to_host(tp))
            if text_encoder_2 is not None:
                tok2, tcfg2, tp2 = text_encoder_2
                text_encoder_2 = (tok2, tcfg2, to_host(tp2))
        self.vae_params = vae_params
        self.vae_cfg = vae_hy.HYVAE_884_16C
        self.text_encoder = text_encoder        # (tokenizer, cfg, params)
        self.text_encoder_2 = text_encoder_2    # (tokenizer, cfg, params)
        pipe_cls = HYVideoI2VPipeline if i2v else HYVideoT2VPipeline
        self.pipeline = pipe_cls(cfg, params, vae_decode=self.decode_latents,
                                 mesh=mesh)

    @classmethod
    def from_pretrained(cls, ckpt_dir: str | None = None, i2v: bool = False,
                        seed: int = 0, dtype: str = "bfloat16",
                        use_fp8: bool = False, lora_path: str | None = None,
                        lora_alpha: float = 1.0, sp_degree: int = 1,
                        ring_degree: int = 1,
                        use_cpu_offload: bool = False):
        """``sp_degree`` > 1 builds a sequence-parallel mesh over the first
        N devices (Ulysses in every attention + FSDP param sharding) —
        the reference's --ulysses-degree
        (`/root/reference/jenga_hyvideo_multigpu.py:104-204`).
        ``ring_degree`` > 1 composes the explicit 2-D ring x ulysses mesh
        over ``ring_degree * sp_degree`` devices (reference
        ``world == ring_degree * ulysses_degree``,
        `/root/reference/hyvideo/config.py:451-468`); note carving
        requires ring_degree == 1 (dense ring attention otherwise)."""
        cfg = dataclasses.replace(
            hy.HUNYUAN_VIDEO_I2V if i2v else hy.HUNYUAN_VIDEO_T2V,
            dtype=dtype)
        params = None
        vae_params = None
        text_encoder = None
        text_encoder_2 = None
        if ckpt_dir:
            fp8_path = _find(ckpt_dir, "pytorch_model_module_fp8.pt",
                             "pytorch_model_fp8.pt")
            dit_path = _find(ckpt_dir, "pytorch_model_module.pt",
                             "mp_rank_00_model_states.pt",
                             "pytorch_model_ema.pt")
            if use_fp8 and fp8_path:
                sd = C.load_fp8_state_dict(fp8_path)
            elif dit_path:
                sd = C.load_torch_state_dict(dit_path)
            else:
                sd = None
            if sd is not None:
                if lora_path:
                    sd = C.merge_lora(sd, lora_path, alpha=lora_alpha,
                                      prefix="Hunyuan_video_I2V")
                params = jax.tree.map(jnp.asarray,
                                      C.convert_hyvideo_dit(sd, cfg))
            vae_path = _find(os.path.join(ckpt_dir, "vae"),
                             "pytorch_model.pt")
            if vae_path:
                vsd = C.load_torch_state_dict(vae_path)
                vae_params = jax.tree.map(
                    jnp.asarray, C.convert_hyvae(vsd, vae_hy.HYVAE_884_16C))
            text_encoder = cls._load_llm(os.path.join(ckpt_dir,
                                                      "text_encoder"))
            text_encoder_2 = cls._load_clip(os.path.join(ckpt_dir,
                                                         "text_encoder_2"))
        if params is None:
            params = hy.init_hyvideo_params(jax.random.PRNGKey(seed), cfg)
        if use_fp8:
            from .models.fp8 import quantize_tree_fp8
            params = quantize_tree_fp8(params)
        mesh = None
        ring_degree = max(1, int(ring_degree or 1))
        if (sp_degree and sp_degree > 1) or ring_degree > 1:
            from .parallel.mesh import make_sp_mesh
            mesh = make_sp_mesh(jax.devices()[:sp_degree * ring_degree],
                                ring=ring_degree)
        return cls(cfg, params, vae_params, i2v=i2v,
                   text_encoder=text_encoder, text_encoder_2=text_encoder_2,
                   mesh=mesh, offload_to_host=use_cpu_offload)

    # ---------------------------------------------------------- encoders

    @staticmethod
    def _hf_state_dict(path):
        """Load an HF model dir's weights (safetensors preferred)."""
        if _find(path, "model.safetensors", "model.safetensors.index.json"):
            return C.load_safetensors_state_dict(path)
        pt = _find(path, "pytorch_model.bin", "pytorch_model.pt")
        return C.load_torch_state_dict(pt) if pt else None

    @classmethod
    def _load_llm(cls, path):
        if not os.path.isdir(path):
            return None
        from .convert import encoders as E
        from .text import HFTokenizerAdapter
        from .text.llama import LlamaConfig
        sd = cls._hf_state_dict(path)
        if sd is None:
            return None
        cfg = cls._llama_cfg_from_dir(path)
        tok = HFTokenizerAdapter(path, max_length=cls.TEXT_LEN)
        if any("vision_tower" in k for k in sd):
            # llava checkpoint: also build the vision tower + projector so
            # I2V prompts can see the conditioning image
            from .text.clip import CLIP_L_VISION_336
            params = jax.tree.map(
                jnp.asarray, E.convert_llava(sd, cfg, CLIP_L_VISION_336))
            return (tok, cfg, params)
        params = jax.tree.map(jnp.asarray, E.convert_llama(sd, cfg))
        return (tok, cfg, params)

    @staticmethod
    def _llama_cfg_from_dir(path):
        import json
        from .text.llama import LlamaConfig
        cfg_path = os.path.join(path, "config.json")
        if not os.path.exists(cfg_path):
            return LlamaConfig()
        with open(cfg_path) as f:
            hf = json.load(f)
        if "text_config" in hf:     # llava wrapper
            hf = hf["text_config"]
        return LlamaConfig(
            vocab_size=hf.get("vocab_size", 128320),
            hidden_size=hf.get("hidden_size", 4096),
            intermediate_size=hf.get("intermediate_size", 14336),
            num_layers=hf.get("num_hidden_layers", 32),
            num_heads=hf.get("num_attention_heads", 32),
            num_kv_heads=hf.get("num_key_value_heads", 8),
            rope_theta=hf.get("rope_theta", 500000.0),
            rms_eps=hf.get("rms_norm_eps", 1e-5))

    @classmethod
    def _load_clip(cls, path):
        if not os.path.isdir(path):
            return None
        import json
        from .convert import encoders as E
        from .text import HFTokenizerAdapter
        from .text.clip import CLIPTextConfig
        sd = cls._hf_state_dict(path)
        if sd is None:
            return None
        ccfg = CLIPTextConfig()
        cfg_path = os.path.join(path, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                hf = json.load(f)
            hf = hf.get("text_config", hf)
            ccfg = CLIPTextConfig(
                vocab_size=hf.get("vocab_size", ccfg.vocab_size),
                hidden_size=hf.get("hidden_size", ccfg.hidden_size),
                intermediate_size=hf.get("intermediate_size",
                                         ccfg.intermediate_size),
                num_layers=hf.get("num_hidden_layers", ccfg.num_layers),
                num_heads=hf.get("num_attention_heads", ccfg.num_heads),
                max_positions=hf.get("max_position_embeddings",
                                     ccfg.max_positions),
                eos_token_id=hf.get("eos_token_id", ccfg.eos_token_id))
        params = jax.tree.map(jnp.asarray, E.convert_clip_text(sd, ccfg))
        tok = HFTokenizerAdapter(path, max_length=77)
        return (tok, ccfg, params)

    def encode_prompt(self, prompt: str, mode: str = "video"):
        """prompt -> (text_states [L, 4096], mask [L], pooled [768]).

        Mirrors the reference dual-encoder path
        (`/root/reference/hyvideo/text_encoder/__init__.py:308-357`):
        instruct template -> llama hidden_states[-(skip+1)] -> crop the
        template tokens; CLIP-L pooled vector alongside.
        """
        if self.text_encoder is None:
            raise RuntimeError(
                "no text encoder loaded: pass a ckpt_dir with text_encoder/ "
                "(HF llava dir) or feed pre-encoded embeddings to predict()")
        from .text import apply_hyvideo_template, crop_encoder_output
        from .text.llama import CROP_START, llama_hidden_states
        tok, lcfg, lparams = self.text_encoder
        if "llm" in lparams:          # llava checkpoint: text-only path
            lparams = lparams["llm"]
        crop = CROP_START[mode]
        ids, mask = tok(apply_hyvideo_template(prompt, mode),
                        max_length=self.TEXT_LEN + crop)
        depth = lcfg.num_layers - self.SKIP_LAYER
        states = llama_hidden_states(lparams, lcfg, jnp.asarray(ids),
                                     jnp.asarray(mask), num_layers=depth)
        hidden, mask = crop_encoder_output(np.asarray(states[-1]),
                                           np.asarray(mask), mode)
        pooled = np.zeros((self.cfg.text_states_dim_2,), np.float32)
        if self.text_encoder_2 is not None:
            from .text.clip import clip_text_encode
            tok2, ccfg, cparams = self.text_encoder_2
            ids2, _ = tok2(prompt, max_length=77)
            _, p = clip_text_encode(cparams, ccfg, jnp.asarray(ids2))
            pooled = np.asarray(p[0])
        return hidden[0], mask[0], pooled

    def encode_prompt_i2v(self, prompt: str, image, mode: str = "video",
                          i2v_condition_type: str = "token_replace"):
        """I2V prompt + image -> (states, mask, pooled): the full llava
        path — 336px image through the vision tower + projector, spliced
        at the <image> token, interleave-strided image tokens concatenated
        with cropped text tokens (reference
        `/root/reference/hyvideo_i2v/text_encoder/__init__.py:368-533`).
        """
        if self.text_encoder is None:
            raise RuntimeError("no text encoder loaded")
        tok, lcfg, lparams = self.text_encoder
        if "llm" not in lparams:
            raise RuntimeError(
                "I2V prompt encoding needs a llava checkpoint (with "
                "vision_tower weights) in text_encoder/")
        from .text.clip import CLIP_L_VISION_336
        from .text.llava import (I2V_TEMPLATE_INFO, extract_i2v_tokens,
                                 llava_encode)
        info = I2V_TEMPLATE_INFO[mode]
        text = info["template"].format(prompt)
        ids, mask = tok(text, max_length=self.TEXT_LEN + info["crop_start"])
        image_tok_id = tok.tok.convert_tokens_to_ids("<image>")
        pos_idx = np.nonzero(np.asarray(ids)[0] == image_tok_id)[0]
        if len(pos_idx) != 1:
            raise ValueError("template must contain exactly one <image> "
                             "token in the tokenizer vocabulary")
        vc = CLIP_L_VISION_336
        x = _resize_chw(np.asarray(image), vc.image_size, vc.image_size)
        x = (x - CLIP_MEAN[:, None, None]) / CLIP_STD[:, None, None]
        depth = lcfg.num_layers - self.SKIP_LAYER
        states, full_mask = llava_encode(
            lparams, lcfg, jnp.asarray(ids), jnp.asarray(mask), x[None],
            image_token_pos=int(pos_idx[0]), num_layers=depth,
            vision_cfg=vc)
        interleave = 2 if i2v_condition_type == "latent_concat" else 4
        hidden, out_mask = extract_i2v_tokens(
            np.asarray(states[-1]), np.asarray(full_mask), mode,
            image_embed_interleave=interleave, token_ids=np.asarray(ids))
        pooled = np.zeros((self.cfg.text_states_dim_2,), np.float32)
        if self.text_encoder_2 is not None:
            from .text.clip import clip_text_encode
            tok2, ccfg, cparams = self.text_encoder_2
            ids2, _ = tok2(prompt, max_length=77)
            _, p = clip_text_encode(cparams, ccfg, jnp.asarray(ids2))
            pooled = np.asarray(p[0])
        return hidden[0], out_mask[0], pooled

    # ---------------------------------------------------------- vae

    def _vae_params_for_compute(self):
        """Under offload, stream the (host-resident) VAE weights to the
        default device for the duration of one call — the copy is freed
        with the last reference, so HBM cost is transient."""
        if not self.offload:
            return self.vae_params
        # one batched transfer for the whole tree (per-leaf puts issue
        # hundreds of serial host->HBM copies)
        return jax.device_put(self.vae_params, jax.devices()[0])

    def decode_latents(self, latents):
        """latents [C, T, h, w] -> video [C, F, H, W] in [-1, 1]."""
        if self.vae_params is None:
            return latents
        z = jnp.asarray(latents)[None] / self.vae_cfg.scaling_factor
        video = vae_hy.vae_decode_tiled(self._vae_params_for_compute(), z,
                                        self.vae_cfg)
        return jnp.clip(video[0], -1.0, 1.0)

    def encode_image_latent(self, image, lat_h: int, lat_w: int):
        """[3, H, W] f32 in [0,1] -> [16, 1, lat_h, lat_w] scaled latent
        (the I2V per-stage conditioning latent, deterministic mode)."""
        if self.vae_params is None:
            raise RuntimeError("no VAE loaded (ckpt_dir without vae/)")
        x = _resize_chw(np.asarray(image), lat_h * 8, lat_w * 8)
        x = (x * 2.0 - 1.0)[None, :, None]      # [1, 3, 1, H, W]
        moments = vae_hy.vae_encode_tiled(self._vae_params_for_compute(), x,
                                          self.vae_cfg)
        mean = vae_hy.gaussian_sample(moments)
        return mean[0] * self.vae_cfg.scaling_factor

    # ---------------------------------------------------------- predict

    def predict(self, text_states, text_mask, text_states_2, opts,
                negative=None, **kw):
        """Pre-encoded entry point (tests, custom encoders)."""
        return self.pipeline.generate(text_states, text_mask, text_states_2,
                                      opts, negative=negative, **kw)

    def predict_prompt(self, prompt: str, opts, negative_prompt=None, **kw):
        """Full prompt -> video path."""
        enc = self.encode_prompt(prompt)
        neg = (self.encode_prompt(negative_prompt)
               if negative_prompt else None)
        return self.pipeline.generate(*enc, opts, negative=neg, **kw)


class WanSampler:
    """T2V/I2V sampler for Wan2.1."""

    CONFIGS = {
        "t2v-1.3B": wan_lib.WAN_T2V_1_3B,
        "t2v-14B": wan_lib.WAN_T2V_14B,
        "i2v-14B": wan_lib.WAN_I2V_14B,
    }
    T5_CKPT = "models_t5_umt5-xxl-enc-bf16.pth"
    T5_TOKENIZER = "google/umt5-xxl"
    CLIP_CKPT = "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth"

    def __init__(self, cfg, params, vae_params=None, model_id="wan-t2v-1.3b",
                 t5=None, clip_vision=None, mesh=None):
        from .utils.compile_cache import ensure_compile_cache
        ensure_compile_cache()   # see HunyuanVideoSampler.__init__
        self.cfg = cfg
        if mesh is not None:
            from .parallel.mesh import shard_params_fsdp
            params = shard_params_fsdp(params, mesh)
        self.params = params
        self.vae_params = vae_params
        self.vae_cfg = vae_wan.WAN_VAE_16Z
        self.t5 = t5                     # (tokenizer, cfg, params)
        self.clip_vision = clip_vision   # (cfg, params)
        i2v = cfg.model_type == "i2v"
        pipe_cls = WanI2VPipeline if i2v else WanT2VPipeline
        self.pipeline = pipe_cls(cfg, params, model_id=model_id,
                                 vae_decode=self.decode_latents, mesh=mesh)

    @classmethod
    def from_pretrained(cls, task: str = "t2v-1.3B",
                        ckpt_dir: str | None = None, seed: int = 0,
                        dtype: str = "bfloat16", t5_on_host: bool = False,
                        sp_degree: int = 1, ring_degree: int = 1):
        """``t5_on_host`` keeps the UMT5 weights + encode on host CPU
        (reference ``--t5_cpu``, `/root/reference/wan/text2video.py:60-66`)
        — on TPU this frees ~9GB HBM for the 14B DiT. ``sp_degree`` > 1
        builds an Ulysses sequence-parallel mesh + FSDP param sharding;
        ``ring_degree`` > 1 adds the outer ring axis (2-D ring x ulysses
        over ``ring_degree * sp_degree`` devices)."""
        cfg = dataclasses.replace(cls.CONFIGS[task], dtype=dtype)
        model_id = {"t2v-1.3B": "wan-t2v-1.3b", "t2v-14B": "wan-t2v-14b",
                    "i2v-14B": "wan-i2v-720p"}[task]
        params = None
        vae_params = None
        t5 = None
        clip_vision = None
        if ckpt_dir:
            sd = None
            pth = _find(ckpt_dir, "diffusion_pytorch_model.pth")
            if pth:
                sd = C.load_torch_state_dict(pth)
            else:
                try:
                    sd = C.load_safetensors_state_dict(ckpt_dir)
                except FileNotFoundError:
                    sd = None
            if sd is None:
                raise FileNotFoundError(
                    f"no DiT checkpoint (.pth or .safetensors) in "
                    f"{ckpt_dir}; refusing to silently run random weights")
            params = jax.tree.map(jnp.asarray, C.convert_wan_dit(sd, cfg))
            vp = _find(ckpt_dir, "Wan2.1_VAE.pth", "vae_step_411000.pth")
            if vp:
                vsd = C.load_torch_state_dict(vp)
                vae_params = jax.tree.map(
                    jnp.asarray, C.convert_wanvae(vsd, vae_wan.WAN_VAE_16Z))
            t5 = cls._load_t5(ckpt_dir, on_host=t5_on_host)
            if cfg.model_type == "i2v":
                clip_vision = cls._load_clip_vision(ckpt_dir)
        if params is None:
            params = wan_lib.init_wan_params(jax.random.PRNGKey(seed), cfg)
        mesh = None
        ring_degree = max(1, int(ring_degree or 1))
        if (sp_degree and sp_degree > 1) or ring_degree > 1:
            from .parallel.mesh import make_sp_mesh
            mesh = make_sp_mesh(jax.devices()[:sp_degree * ring_degree],
                                ring=ring_degree)
        return cls(cfg, params, vae_params, model_id=model_id, t5=t5,
                   clip_vision=clip_vision, mesh=mesh)

    @classmethod
    def _load_t5(cls, ckpt_dir, on_host: bool = False):
        from .convert import encoders as E
        from .text import HFTokenizerAdapter
        from .text.t5 import UMT5_XXL
        path = _find(ckpt_dir, cls.T5_CKPT)
        if path is None:
            return None
        sd = C.load_torch_state_dict(path)
        tree = E.convert_umt5_wan(sd, UMT5_XXL)
        if on_host:
            cpu = jax.devices("cpu")[0]
            params = jax.tree.map(lambda x: jax.device_put(x, cpu), tree)
        else:
            params = jax.tree.map(jnp.asarray, tree)
        tok_dir = os.path.join(ckpt_dir, cls.T5_TOKENIZER)
        tok = HFTokenizerAdapter(
            tok_dir if os.path.isdir(tok_dir) else "google/umt5-xxl",
            max_length=512)
        return (tok, UMT5_XXL, params)

    @classmethod
    def _load_clip_vision(cls, ckpt_dir):
        from .convert import encoders as E
        from .text.clip import CLIP_H_VISION
        path = _find(ckpt_dir, cls.CLIP_CKPT)
        if path is None:
            return None
        sd = C.load_torch_state_dict(path)
        params = jax.tree.map(jnp.asarray,
                              E.convert_clip_vision_wan(sd, CLIP_H_VISION))
        return (CLIP_H_VISION, params)

    def encode_prompt(self, prompt: str):
        """prompt -> [L_real, 4096] trimmed token states (the reference
        trims to the true sequence length,
        `/root/reference/wan/text2video.py:152-156`)."""
        if self.t5 is None:
            raise RuntimeError(
                f"no T5 loaded: ckpt dir must contain {self.T5_CKPT}")
        from .text.t5 import t5_encode
        tok, tcfg, tparams = self.t5
        ids, mask = tok(prompt)
        # run on whichever device holds the weights (host CPU under t5_cpu)
        dev = next(iter(jax.tree.leaves(tparams)[0].devices()))
        with jax.default_device(dev):
            states = t5_encode(tparams, tcfg, jnp.asarray(ids),
                               jnp.asarray(mask))
        n = int(np.asarray(mask).sum())
        return np.asarray(states[0])[:n]

    def encode_image_clip(self, image):
        """[3, H, W] f32 in [0,1] -> [257, 1280] ViT features
        (`/root/reference/wan/modules/clip.py:527-542``: resize 224,
        normalize, use_31_block)."""
        if self.clip_vision is None:
            raise RuntimeError(
                f"no CLIP loaded: ckpt dir must contain {self.CLIP_CKPT}")
        from .text.clip import clip_vision_encode
        ccfg, cparams = self.clip_vision
        x = _resize_chw(np.asarray(image), ccfg.image_size, ccfg.image_size)
        x = (x - CLIP_MEAN[:, None, None]) / CLIP_STD[:, None, None]
        feats = clip_vision_encode(cparams, ccfg, x[None],
                                   use_31_block=True)
        return np.asarray(feats[0])

    def encode_image_latent(self, image, frame_num: int, lat_h: int,
                            lat_w: int):
        """First frame + zero padding -> [16, T_lat, lat_h, lat_w] latent
        (`/root/reference/jenga_wan.py:365-379`)."""
        if self.vae_params is None:
            raise RuntimeError("no VAE loaded")
        h, w = lat_h * 8, lat_w * 8
        first = _resize_chw(np.asarray(image), h, w) * 2.0 - 1.0
        frames = jnp.concatenate(
            [first[:, None], jnp.zeros((3, frame_num - 1, h, w))], axis=1)
        return vae_wan.wanvae_encode(self.vae_params, frames[None],
                                     self.vae_cfg)[0]

    def decode_latents(self, latents):
        if self.vae_params is None:
            return latents
        z = jnp.asarray(latents)[None]
        video = vae_wan.wanvae_decode(self.vae_params, z, self.vae_cfg)
        return video[0]

    def generate(self, *args, **kw):
        return self.pipeline.generate(*args, **kw)

    def generate_prompt(self, prompt: str, opts, negative_prompt: str = "",
                        **kw):
        """Full prompt -> video path (T2V)."""
        ctx = self.encode_prompt(prompt)
        ctx_null = self.encode_prompt(
            negative_prompt or WAN_DEFAULT_NEGATIVE_PROMPT)
        return self.pipeline.generate(ctx, ctx_null, opts, **kw)

    def generate_image(self, image, prompt: str, opts,
                       negative_prompt: str = "", **kw):
        """Full image+prompt -> video path (I2V)."""
        from .pipelines.wan_i2v import i2v_latent_size
        ctx = self.encode_prompt(prompt)
        ctx_null = self.encode_prompt(
            negative_prompt or WAN_DEFAULT_NEGATIVE_PROMPT)
        img = np.asarray(image)
        lat_h, lat_w = i2v_latent_size(img.shape[1], img.shape[2],
                                       opts.max_area)
        clip_fea = self.encode_image_clip(img)
        img_lat = self.encode_image_latent(img, opts.frame_num, lat_h, lat_w)
        return self.pipeline.generate_i2v(
            img_lat, clip_fea, ctx, ctx_null, opts.frame_num, lat_h, lat_w,
            opts, **kw)
