"""XLM-Roberta text encoder (the text tower of Wan's CLIP-H).

Counterpart of `/root/reference/wan/modules/xlm_roberta.py:10-170`. Wan
inference only calls the CLIP *visual* tower, but the text tower ships
with the checkpoint (used for image-text alignment); implemented for
checkpoint-compatibility completeness: post-LN transformer with learned
positions, padding-masked bidirectional attention, GELU MLP.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..models import layers as L

__all__ = ["XLMRobertaConfig", "init_xlm_roberta_params",
           "xlm_roberta_encode"]


@dataclasses.dataclass(frozen=True)
class XLMRobertaConfig:
    vocab_size: int = 250002
    max_positions: int = 514
    type_size: int = 1
    pad_id: int = 1
    dim: int = 1024
    num_heads: int = 16
    num_layers: int = 24
    ffn_dim: int = 4096
    eps: float = 1e-5
    dtype: str = "float32"


def _lin(key, a, b, dtype):
    bound = math.sqrt(6.0 / (a + b))
    return {"w": jax.random.uniform(key, (a, b), dtype, -bound, bound),
            "b": jnp.zeros((b,), dtype)}


def _ln(c):
    return {"w": jnp.ones((c,), jnp.float32),
            "b": jnp.zeros((c,), jnp.float32)}


def init_xlm_roberta_params(key, cfg: XLMRobertaConfig):
    dtype = jnp.dtype(cfg.dtype)
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    nk = lambda: next(keys)
    d = cfg.dim

    def block():
        return {
            "q": _lin(nk(), d, d, dtype), "k": _lin(nk(), d, d, dtype),
            "v": _lin(nk(), d, d, dtype), "o": _lin(nk(), d, d, dtype),
            "ln1": _ln(d),
            "fc1": _lin(nk(), d, cfg.ffn_dim, dtype),
            "fc2": _lin(nk(), cfg.ffn_dim, d, dtype),
            "ln2": _ln(d),
        }

    return {
        "token_embed": jax.random.normal(nk(), (cfg.vocab_size, d),
                                         dtype) * 0.02,
        "type_embed": jnp.zeros((cfg.type_size, d), dtype),
        "pos_embed": jax.random.normal(nk(), (cfg.max_positions, d),
                                       dtype) * 0.02,
        "embed_ln": _ln(d),
        "blocks": [block() for _ in range(cfg.num_layers)],
    }


def xlm_roberta_encode(params, cfg: XLMRobertaConfig, token_ids):
    """ids [B, L] (pad_id padding) -> token states [B, L, dim]."""
    b, s = token_ids.shape
    mask = (token_ids != cfg.pad_id)
    # roberta position ids start at pad_id + 1 and only count real tokens
    pos = jnp.cumsum(mask.astype(jnp.int32), axis=1) * mask + cfg.pad_id
    h = (params["token_embed"][token_ids]
         + params["type_embed"][jnp.zeros_like(token_ids)]
         + params["pos_embed"][pos])
    h = L.layer_norm(h, params["embed_ln"]["w"], params["embed_ln"]["b"],
                     eps=cfg.eps)

    n = cfg.num_heads
    hd = cfg.dim // n
    bias = jnp.where(mask[:, None, None, :], 0.0, -1e30)
    for p in params["blocks"]:
        q = L.linear(p["q"], h).reshape(b, s, n, hd)
        k = L.linear(p["k"], h).reshape(b, s, n, hd)
        v = L.linear(p["v"], h).reshape(b, s, n, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * hd ** -0.5 + bias
        a = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", a, v.astype(jnp.float32))
        attn = attn.reshape(b, s, cfg.dim).astype(h.dtype)
        # post-LN (roberta convention)
        h = L.layer_norm(h + L.linear(p["o"], attn), p["ln1"]["w"],
                         p["ln1"]["b"], eps=cfg.eps)
        # exact-erf gelu (reference nn.GELU(),
        # `/root/reference/wan/modules/xlm_roberta.py:62`)
        y = L.linear(p["fc2"], jax.nn.gelu(L.linear(p["fc1"], h),
                                           approximate=False))
        h = L.layer_norm(h + y, p["ln2"]["w"], p["ln2"]["b"], eps=cfg.eps)
    return h
