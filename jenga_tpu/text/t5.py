"""UMT5-XXL text encoder (Wan), functional JAX.

From-scratch reimplementation of the reference's scratch T5
(`/root/reference/wan/modules/t5.py:20-513`): encoder-only, per-layer
relative position bias (umT5's ``shared_pos=False``), unscaled attention,
gated-GELU feed-forward, T5 RMS layernorm. umt5-xxl: vocab 256384, dim
4096, ffn 10240, 64 heads, 24 layers, 32 buckets.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models import layers as L

__all__ = ["T5Config", "UMT5_XXL", "init_t5_params", "t5_encode",
           "relative_position_bucket"]


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    max_dist: int = 128
    shared_pos: bool = False
    eps: float = 1e-6
    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.dim_attn // self.num_heads


UMT5_XXL = T5Config()


def relative_position_bucket(rel_pos: np.ndarray, num_buckets: int,
                             max_dist: int, bidirectional: bool = True
                             ) -> np.ndarray:
    """T5 log-bucketed relative positions (reference
    `/root/reference/wan/modules/t5.py:245-265`)."""
    rel_pos = np.asarray(rel_pos)
    if bidirectional:
        half = num_buckets // 2
        buckets = (rel_pos > 0).astype(np.int64) * half
        rel = np.abs(rel_pos)
    else:
        half = num_buckets
        buckets = np.zeros_like(rel_pos)
        rel = -np.minimum(rel_pos, 0)
    max_exact = half // 2
    with np.errstate(divide="ignore"):
        large = max_exact + (
            np.log(np.maximum(rel, 1) / max_exact)
            / math.log(max_dist / max_exact) * (half - max_exact)
        ).astype(np.int64)
    large = np.minimum(large, half - 1)
    buckets = buckets + np.where(rel < max_exact, rel, large)
    return buckets


def _lin(key, a, b, dtype):
    bound = math.sqrt(6.0 / (a + b))
    return {"w": jax.random.uniform(key, (a, b), dtype, -bound, bound)}


def init_t5_params(key, cfg: T5Config = UMT5_XXL):
    dtype = jnp.dtype(cfg.dtype)
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    nk = lambda: next(keys)
    d, da, df = cfg.dim, cfg.dim_attn, cfg.dim_ffn

    def block():
        p = {
            "norm1": jnp.ones((d,), jnp.float32),
            "q": _lin(nk(), d, da, dtype),
            "k": _lin(nk(), d, da, dtype),
            "v": _lin(nk(), d, da, dtype),
            "o": _lin(nk(), da, d, dtype),
            "norm2": jnp.ones((d,), jnp.float32),
            "gate": _lin(nk(), d, df, dtype),
            "fc1": _lin(nk(), d, df, dtype),
            "fc2": _lin(nk(), df, d, dtype),
        }
        if not cfg.shared_pos:
            p["rel_embedding"] = jax.random.normal(
                nk(), (cfg.num_buckets, cfg.num_heads), jnp.float32) \
                * (2 * cfg.num_buckets * cfg.num_heads) ** -0.5
        return p

    params = {
        "embed": jax.random.normal(nk(), (cfg.vocab_size, d), dtype),
        "blocks": [block() for _ in range(cfg.num_layers)],
        "final_norm": jnp.ones((d,), jnp.float32),
    }
    if cfg.shared_pos:
        params["rel_embedding"] = jax.random.normal(
            nk(), (cfg.num_buckets, cfg.num_heads), jnp.float32) \
            * (2 * cfg.num_buckets * cfg.num_heads) ** -0.5
    return params


def _t5_norm(x, w, eps):
    # T5 layernorm: rms without mean subtraction, scale only
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * w).astype(x.dtype)


def t5_encode(params, cfg: T5Config, token_ids, attention_mask):
    """ids [B, L], mask [B, L] -> token states [B, L, dim] (f32)."""
    b, s = token_ids.shape
    n, hd = cfg.num_heads, cfg.head_dim
    h = params["embed"][token_ids]

    rel = np.arange(s)[None, :] - np.arange(s)[:, None]
    buckets = jnp.asarray(relative_position_bucket(
        rel, cfg.num_buckets, cfg.max_dist))
    mask_bias = jnp.where(attention_mask.astype(bool)[:, None, None, :],
                          0.0, -1e30)

    for p in params["blocks"]:
        if cfg.shared_pos:
            pos_bias = params["rel_embedding"][buckets]
        else:
            pos_bias = p["rel_embedding"][buckets]      # [S, S, H]
        pos_bias = pos_bias.transpose(2, 0, 1)[None]     # [1, H, S, S]

        x = _t5_norm(h, p["norm1"], cfg.eps)
        q = L.linear(p["q"], x).reshape(b, s, n, hd)
        k = L.linear(p["k"], x).reshape(b, s, n, hd)
        v = L.linear(p["v"], x).reshape(b, s, n, hd)
        # T5 attention is unscaled
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32))
        logits = logits + pos_bias + mask_bias
        a = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", a, v.astype(jnp.float32))
        attn = attn.reshape(b, s, n * hd).astype(h.dtype)
        h = h + L.linear(p["o"], attn)

        x = _t5_norm(h, p["norm2"], cfg.eps)
        y = L.linear(p["fc2"],
                     L.linear(p["fc1"], x)
                     * jax.nn.gelu(L.linear(p["gate"], x),
                                   approximate=True))
        h = h + y

    return _t5_norm(h, params["final_norm"], cfg.eps).astype(jnp.float32)
