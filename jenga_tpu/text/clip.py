"""CLIP text encoder (HunyuanVideo's ``clipL`` pooled conditioning) and
vision tower (Wan I2V image features), functional JAX.

The reference wraps HF ``CLIPTextModel`` for the 768-d pooled text vector
(`/root/reference/hyvideo/text_encoder/__init__.py:102-357`,
``output_key="pooler_output"``) and implements a scratch ViT-H/XLM-Roberta
CLIP for Wan I2V (`/root/reference/wan/modules/clip.py:22-542`). Here:
standard CLIP text transformer (causal mask, learned positions, quick-gelu)
with EOS pooling, and a ViT with pre-norm blocks for image features.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models import layers as L

__all__ = ["CLIPTextConfig", "CLIP_L_TEXT", "init_clip_text_params",
           "clip_text_encode", "CLIPVisionConfig", "CLIP_H_VISION",
           "init_clip_vision_params", "clip_vision_encode"]


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    eos_token_id: int = 49407
    dtype: str = "float32"


CLIP_L_TEXT = CLIPTextConfig()


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_layers: int = 32
    num_heads: int = 16
    act: str = "gelu"        # gelu (Wan ViT-H) | quick_gelu (HF CLIP-L)
    dtype: str = "float32"


CLIP_H_VISION = CLIPVisionConfig()
# llava's vision tower (CLIP ViT-L/14-336, HF layout)
CLIP_L_VISION_336 = CLIPVisionConfig(
    image_size=336, hidden_size=1024, intermediate_size=4096,
    num_layers=24, num_heads=16, act="quick_gelu")


def _lin(key, a, b, dtype):
    bound = math.sqrt(6.0 / (a + b))
    return {"w": jax.random.uniform(key, (a, b), dtype, -bound, bound),
            "b": jnp.zeros((b,), dtype)}


def _ln(c):
    return {"w": jnp.ones((c,), jnp.float32), "b": jnp.zeros((c,),
                                                             jnp.float32)}


def _block_init(nk, d, ffn, dtype):
    return {
        "ln1": _ln(d),
        "q": _lin(nk(), d, d, dtype), "k": _lin(nk(), d, d, dtype),
        "v": _lin(nk(), d, d, dtype), "o": _lin(nk(), d, d, dtype),
        "ln2": _ln(d),
        "fc1": _lin(nk(), d, ffn, dtype), "fc2": _lin(nk(), ffn, d, dtype),
    }


def _encoder_block(p, h, n, mask_bias=None, act=None):
    b, s, d = h.shape
    hd = d // n
    x = L.layer_norm(h, p["ln1"]["w"], p["ln1"]["b"], eps=1e-5)
    q = L.linear(p["q"], x).reshape(b, s, n, hd)
    k = L.linear(p["k"], x).reshape(b, s, n, hd)
    v = L.linear(p["v"], x).reshape(b, s, n, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * hd ** -0.5
    if mask_bias is not None:
        logits = logits + mask_bias
    a = jax.nn.softmax(logits, axis=-1)
    attn = jnp.einsum("bhqk,bkhd->bqhd", a,
                      v.astype(jnp.float32)).reshape(b, s, d)
    h = h + L.linear(p["o"], attn.astype(h.dtype))
    x = L.layer_norm(h, p["ln2"]["w"], p["ln2"]["b"], eps=1e-5)
    y = L.linear(p["fc2"], act(L.linear(p["fc1"], x)))
    return h + y


def init_clip_text_params(key, cfg: CLIPTextConfig = CLIP_L_TEXT):
    dtype = jnp.dtype(cfg.dtype)
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    nk = lambda: next(keys)
    d = cfg.hidden_size
    return {
        "token_embed": jax.random.normal(nk(), (cfg.vocab_size, d),
                                         dtype) * 0.02,
        "pos_embed": jax.random.normal(nk(), (cfg.max_positions, d),
                                       dtype) * 0.01,
        "blocks": [_block_init(nk, d, cfg.intermediate_size, dtype)
                   for _ in range(cfg.num_layers)],
        "final_ln": _ln(d),
    }


def clip_text_encode(params, cfg: CLIPTextConfig, token_ids):
    """ids [B, L<=77] -> (token_states [B, L, d], pooled [B, d]).

    Pooled = final-LN hidden state at the EOS (highest-id) token, matching
    HF CLIPTextModel's pooler.
    """
    b, s = token_ids.shape
    h = params["token_embed"][token_ids] + params["pos_embed"][:s]
    causal = jnp.tril(jnp.ones((s, s), bool))
    bias = jnp.where(causal, 0.0, -1e30)[None, None]
    quick_gelu = lambda x: x * jax.nn.sigmoid(1.702 * x)
    for p in params["blocks"]:
        h = _encoder_block(p, h, cfg.num_heads, bias, act=quick_gelu)
    h = L.layer_norm(h, params["final_ln"]["w"], params["final_ln"]["b"],
                     eps=1e-5)
    eos_pos = jnp.argmax(
        (token_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = h[jnp.arange(b), eos_pos]
    return h, pooled


def init_clip_vision_params(key, cfg: CLIPVisionConfig = CLIP_H_VISION):
    dtype = jnp.dtype(cfg.dtype)
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    nk = lambda: next(keys)
    d = cfg.hidden_size
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    return {
        "patch_embed": {"w": jax.random.normal(
            nk(), (3 * cfg.patch_size ** 2, d), dtype) * 0.02},
        "cls_token": jnp.zeros((1, 1, d), dtype),
        "pos_embed": jax.random.normal(nk(), (n_patches + 1, d),
                                       dtype) * 0.01,
        "pre_ln": _ln(d),
        "blocks": [_block_init(nk, d, cfg.intermediate_size, dtype)
                   for _ in range(cfg.num_layers)],
        "post_ln": _ln(d),
    }


def clip_vision_encode(params, cfg: CLIPVisionConfig, images,
                       use_31_block: bool = False,
                       feature_layer: int | None = None):
    """images [B, 3, H, W] (normalized) -> token features [B, 1+P, d]
    (cls first), the layout Wan I2V consumes as ``clip_fea`` [B, 257, d].

    ``use_31_block`` stops before the last transformer block and skips the
    post-norm — how Wan taps visual features
    (`/root/reference/wan/modules/clip.py:295-300,541`). ``feature_layer``
    (negative, HF ``vision_feature_layer`` convention) taps hidden_states
    [feature_layer] without the post-norm — llava uses -2."""
    b, c, hh, ww = images.shape
    p = cfg.patch_size
    gh, gw = hh // p, ww // p
    x = images.reshape(b, c, gh, p, gw, p).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(b, gh * gw, c * p * p)
    h = jnp.dot(x.astype(params["patch_embed"]["w"].dtype),
                params["patch_embed"]["w"])
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, h.shape[-1]))
    h = jnp.concatenate([cls, h], axis=1) + params["pos_embed"][:h.shape[1]
                                                               + 1]
    h = L.layer_norm(h, params["pre_ln"]["w"], params["pre_ln"]["b"],
                     eps=1e-5)
    # exact-erf gelu: the Wan ViT-H reference uses torch nn.GELU()
    # (`/root/reference/wan/modules/clip.py:183`), not the tanh approx
    act = (lambda x: x * jax.nn.sigmoid(1.702 * x)) \
        if cfg.act == "quick_gelu" \
        else (lambda x: jax.nn.gelu(x, approximate=False))
    n_blocks = len(params["blocks"])
    if use_31_block:
        n_blocks -= 1
    elif feature_layer is not None:
        # hidden_states[-1] = after all blocks; [-2] = one block earlier
        n_blocks += feature_layer + 1
    for blk in params["blocks"][:n_blocks]:
        h = _encoder_block(blk, h, cfg.num_heads, act=act)
    # all paths return raw transformer output: the Wan reference returns
    # self.transformer(x) without post-norm
    # (`/root/reference/wan/modules/clip.py:298-300`), and HF applies the
    # post-LN only to the pooled CLS — post-LN'ing every token matched no
    # reference. (post_ln params stay in the tree for converter coverage.)
    return h
