"""Llama-style causal LM encoder for HunyuanVideo's LLM text conditioning.

The reference wraps an HF llava/llama ``AutoModel`` and takes
``hidden_states[-(skip_layer+1)]`` with the instruction template cropped
off (`/root/reference/hyvideo/text_encoder/__init__.py:102-357`). This is
a from-scratch JAX llama (RMSNorm, rope, GQA, SwiGLU) exposing hidden
states at any depth, so the text path runs on TPU like everything else.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models import layers as L
from ..ops.flash_attention import dense_attention

__all__ = ["LlamaConfig", "init_llama_params", "llama_hidden_states",
           "PROMPT_TEMPLATE_VIDEO", "PROMPT_TEMPLATE_IMAGE",
           "NEGATIVE_PROMPT", "CROP_START"]

# reference templates (`/root/reference/hyvideo/constants.py:33-60`)
PROMPT_TEMPLATE_IMAGE = (
    "<|start_header_id|>system<|end_header_id|>\n\nDescribe the image by "
    "detailing the color, shape, size, texture, quantity, text, spatial "
    "relationships of the objects and background:<|eot_id|>"
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>")
PROMPT_TEMPLATE_VIDEO = (
    "<|start_header_id|>system<|end_header_id|>\n\nDescribe the video by "
    "detailing the following aspects: "
    "1. The main content and theme of the video."
    "2. The color, shape, size, texture, quantity, text, and spatial "
    "relationships of the objects."
    "3. Actions, events, behaviors temporal relationships, physical "
    "movement changes of the objects."
    "4. background environment, light, style and atmosphere."
    "5. camera angles, movements, and transitions used in the video:"
    "<|eot_id|><|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>")
NEGATIVE_PROMPT = (
    "Aerial view, aerial view, overexposed, low quality, deformation, a "
    "poor composition, bad hands, bad teeth, bad eyes, bad limbs, "
    "distortion")
CROP_START = {"image": 36, "video": 95}


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128320
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _lin(key, a, b, dtype):
    bound = math.sqrt(6.0 / (a + b))
    return {"w": jax.random.uniform(key, (a, b), dtype, -bound, bound)}


def init_llama_params(key, cfg: LlamaConfig):
    dtype = jnp.dtype(cfg.dtype)
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    nk = lambda: next(keys)
    d, kvd = cfg.hidden_size, cfg.num_kv_heads * cfg.head_dim

    def block():
        return {
            "input_norm": jnp.ones((d,), jnp.float32),
            "q": _lin(nk(), d, d, dtype),
            "k": _lin(nk(), d, kvd, dtype),
            "v": _lin(nk(), d, kvd, dtype),
            "o": _lin(nk(), d, d, dtype),
            "post_norm": jnp.ones((d,), jnp.float32),
            "gate": _lin(nk(), d, cfg.intermediate_size, dtype),
            "up": _lin(nk(), d, cfg.intermediate_size, dtype),
            "down": _lin(nk(), cfg.intermediate_size, d, dtype),
        }

    return {
        "embed": jax.random.normal(nk(), (cfg.vocab_size, d), dtype) * 0.02,
        "blocks": [block() for _ in range(cfg.num_layers)],
        "final_norm": jnp.ones((d,), jnp.float32),
    }


def llama_hidden_states(params, cfg: LlamaConfig, token_ids, attention_mask,
                        num_layers: int | None = None, inputs_embeds=None):
    """Run the causal LM; returns the hidden state after each block
    as a list (index 0 = embeddings), mirroring HF ``hidden_states``.

    ``num_layers`` truncates the stack (only layers up to the needed
    skip-layer depth need computing — the reference runs all 32 then
    indexes; we stop early, an easy TPU win). ``inputs_embeds`` bypasses
    the embedding lookup (llava splices image embeddings in).
    """
    h = (inputs_embeds if inputs_embeds is not None
         else params["embed"][token_ids])
    b, s, d = h.shape
    n, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    cos, sin = L.rope_table_1d(np.arange(s), hd, theta=cfg.rope_theta)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    mask = attention_mask.astype(bool)
    # causal + padding mask folded into a bias
    causal = jnp.tril(jnp.ones((s, s), bool))
    bias = jnp.where(causal[None] & mask[:, None, :], 0.0, -1e30)

    states = [h]
    depth = num_layers if num_layers is not None else cfg.num_layers
    for p in params["blocks"][:depth]:
        x = L.rms_norm(h, p["input_norm"], cfg.rms_eps)
        q = L.linear(p["q"], x).reshape(b, s, n, hd)
        k = L.linear(p["k"], x).reshape(b, s, nkv, hd)
        v = L.linear(p["v"], x).reshape(b, s, nkv, hd)
        # llama "half-rotate" rope: rotate_half convention over split halves
        q = _rope_half(q, cos, sin)
        k = _rope_half(k, cos, sin)
        if nkv != n:
            k = jnp.repeat(k, n // nkv, axis=2)
            v = jnp.repeat(v, n // nkv, axis=2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * hd ** -0.5
        logits = logits + bias[:, None]
        a = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", a, v.astype(jnp.float32))
        attn = attn.reshape(b, s, d).astype(h.dtype)
        h = h + L.linear(p["o"], attn)
        x = L.rms_norm(h, p["post_norm"], cfg.rms_eps)
        y = L.linear(p["down"],
                     jax.nn.silu(L.linear(p["gate"], x))
                     * L.linear(p["up"], x))
        h = h + y
        states.append(h)
    if depth == cfg.num_layers:
        # HF convention: the last hidden_states entry is the final-normed
        # output; intermediates (what hidden_state_skip_layer indexes) are
        # raw block outputs.
        states[-1] = L.rms_norm(h, params["final_norm"], cfg.rms_eps)
    return states


def _rope_half(x, cos, sin):
    """Llama convention: rotate (first half, second half) pairs."""
    hd = x.shape[-1]
    x1, x2 = x[..., :hd // 2], x[..., hd // 2:]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    return jnp.concatenate([xf1 * c - xf2 * s, xf2 * c + xf1 * s],
                           axis=-1).astype(x.dtype)
