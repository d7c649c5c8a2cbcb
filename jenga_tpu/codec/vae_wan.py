"""Wan2.1 video VAE (z_dim 16, stride (4, 8, 8)), functional JAX.

Re-derivation of the reference ``WanVAE``
(`/root/reference/wan/modules/vae.py:17-663`). The reference streams
frames through every causal conv with a per-module ``feat_cache`` (chunks
of 1/4/4/... frames); that cache machinery is *exactly equivalent* to
running the full sequence through zero-front-padded causal convolutions,
which is what this implementation does — one big conv per layer is the
XLA/MXU-friendly formulation. The two temporally-special pieces:

  * ``downsample3d``: spatial stride-2 conv for all frames, then frame 0
    passes through untouched while frames [0..T-1] go through a VALID
    stride-2 temporal conv (windows [f0,f1,f2], [f2,f3,f4], ...), giving
    1 + (T-1)/2 frames;
  * ``upsample3d``: frame 0 is never doubled; frames 1..T-1 go through a
    2c-channel temporal conv (two zero frames of front padding, frame 0
    excluded) whose two channel halves interleave into doubled frames,
    then everything is spatially upsampled (nearest) + conv to c/2.

Normalization is channel-RMS per location; the only attention is the
per-frame single-head spatial attention in the middle blocks.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["WanVAEConfig", "WAN_VAE_16Z", "init_wanvae_params",
           "wanvae_encode", "wanvae_decode", "WAN_LATENT_MEAN",
           "WAN_LATENT_STD"]


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    dim: int = 96
    z_dim: int = 16
    dim_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_downsample: tuple[bool, ...] = (False, True, True)


WAN_VAE_16Z = WanVAEConfig()

# per-channel latent normalization (reference ``WanVAE.__init__``,
# `/root/reference/wan/modules/vae.py:619-640`)
WAN_LATENT_MEAN = np.array([
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921],
    np.float32)
WAN_LATENT_STD = np.array([
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160],
    np.float32)


# ------------------------------------------------------------------ ops


def _conv3d(p, x, stride=(1, 1, 1), tpad=None):
    """Conv3d with zero causal padding: time gets ``2*(kt//2)`` front pad
    (reference CausalConv3d, `/root/reference/wan/modules/vae.py:17-37`)."""
    w = p["w"]
    kt, kh, kw = w.shape[2:]
    tp = 2 * (kt // 2) if tpad is None else tpad
    x = jnp.pad(x, ((0, 0), (0, 0), (tp, 0),
                    (kh // 2, kh // 2), (kw // 2, kw // 2)))
    out = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, window_strides=stride, padding="VALID",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.float32)
    return (out + p["b"].reshape(1, -1, 1, 1, 1)).astype(x.dtype)


def _conv2d(p, x, stride=(1, 1), pad="SAME"):
    """Per-frame 2D conv on [B, C, T, H, W] (merged into one 3D conv)."""
    w = p["w"]  # [O, I, kh, kw]
    w3 = w[:, :, None]
    out = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w3, window_strides=(1, *stride), padding=pad,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.float32)
    return (out + p["b"].reshape(1, -1, 1, 1, 1)).astype(x.dtype)


def _rms_norm(p, x):
    """Channel-RMS per location: F.normalize(dim=1)*sqrt(C)*gamma."""
    c = x.shape[1]
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.sum(xf * xf, axis=1, keepdims=True) + 1e-12)
    out = n * math.sqrt(c) * p["g"].reshape(1, -1, 1, 1, 1)
    return out.astype(x.dtype)


def _resblock(p, x):
    h = _conv3d(p["conv1"], jax.nn.silu(_rms_norm(p["norm1"], x)))
    h = _conv3d(p["conv2"], jax.nn.silu(_rms_norm(p["norm2"], h)))
    if "shortcut" in p:
        x = _conv3d(p["shortcut"], x)
    return x + h


def _attention(p, x):
    """Per-frame single-head spatial attention
    (`/root/reference/wan/modules/vae.py:223-263`)."""
    b, c, t, h, w = x.shape
    xn = _rms_norm(p["norm"], x)
    qkv = _conv2d(p["qkv"], xn)  # [B, 3C, T, H, W]
    qkv = qkv.reshape(b, 3, c, t, h * w)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # [B, C, T, HW]
    logits = jnp.einsum("bctq,bctk->btqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (c ** -0.5)
    a = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("btqk,bctk->bctq", a, v.astype(jnp.float32))
    out = out.reshape(b, c, t, h, w).astype(x.dtype)
    return x + _conv2d(p["proj"], out)


def _downsample(p, x, temporal: bool):
    b, c, t, h, w = x.shape
    # spatial: zero-pad right/bottom by 1, stride-2 valid 3x3 conv
    xs = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 1)))
    xs = _conv2d(p["conv"], xs, stride=(2, 2), pad="VALID")
    if not temporal:
        return xs
    first = xs[:, :, :1]
    rest = _conv3d(p["time_conv"], xs, stride=(2, 1, 1), tpad=0)
    return jnp.concatenate([first, rest], axis=2)


def _upsample(p, x, temporal: bool):
    b, c, t, h, w = x.shape
    if temporal and t > 1:
        tail = x[:, :, 1:]
        # two zero frames of front padding, frame 0 excluded
        y = _conv3d(p["time_conv"], tail, tpad=2)     # [B, 2C, T-1, H, W]
        y = y.reshape(b, 2, c, t - 1, h, w)
        y = y.transpose(0, 2, 3, 1, 4, 5).reshape(b, c, 2 * (t - 1), h, w)
        x = jnp.concatenate([x[:, :, :1], y], axis=2)
    x = jnp.repeat(jnp.repeat(x, 2, axis=3), 2, axis=4)
    return _conv2d(p["conv"], x)


# ------------------------------------------------------------------ params


def _c3(key, ci, co, k=(3, 3, 3)):
    fan = ci * math.prod(k)
    bound = 1 / math.sqrt(fan)
    return {"w": jax.random.uniform(key, (co, ci, *k), jnp.float32,
                                    -bound, bound),
            "b": jnp.zeros((co,), jnp.float32)}


def _c2(key, ci, co, k=3):
    fan = ci * k * k
    bound = 1 / math.sqrt(fan)
    return {"w": jax.random.uniform(key, (co, ci, k, k), jnp.float32,
                                    -bound, bound),
            "b": jnp.zeros((co,), jnp.float32)}


def _rb_init(key, ci, co):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"norm1": {"g": jnp.ones((ci,), jnp.float32)},
         "conv1": _c3(k1, ci, co),
         "norm2": {"g": jnp.ones((co,), jnp.float32)},
         "conv2": _c3(k2, co, co)}
    if ci != co:
        p["shortcut"] = _c3(k3, ci, co, k=(1, 1, 1))
    return p


def _attn_init(key, c):
    k1, k2 = jax.random.split(key)
    return {"norm": {"g": jnp.ones((c,), jnp.float32)},
            "qkv": _c2(k1, c, 3 * c, k=1),
            "proj": {"w": jnp.zeros((c, c, 1, 1), jnp.float32),
                     "b": jnp.zeros((c,), jnp.float32)}}


def init_wanvae_params(key, cfg: WanVAEConfig = WAN_VAE_16Z):
    keys = iter(jax.random.split(key, 256))
    nk = lambda: next(keys)
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]

    # encoder
    enc = {"conv1": _c3(nk(), 3, dims[0]), "down": []}
    for i, (ci, co) in enumerate(zip(dims[:-1], dims[1:])):
        stage = {"res": []}
        c = ci
        for _ in range(cfg.num_res_blocks):
            stage["res"].append(_rb_init(nk(), c, co))
            c = co
        if i != len(cfg.dim_mult) - 1:
            stage["sample"] = {"conv": _c2(nk(), co, co)}
            if cfg.temporal_downsample[i]:
                stage["sample"]["time_conv"] = _c3(nk(), co, co, (3, 1, 1))
        enc["down"].append(stage)
    cm = dims[-1]
    enc["mid"] = {"res0": _rb_init(nk(), cm, cm), "attn": _attn_init(nk(), cm),
                  "res1": _rb_init(nk(), cm, cm)}
    enc["head_norm"] = {"g": jnp.ones((cm,), jnp.float32)}
    enc["head_conv"] = _c3(nk(), cm, 2 * cfg.z_dim)

    # decoder
    rdims = [cfg.dim * u for u in (cfg.dim_mult[-1],)
             + tuple(reversed(cfg.dim_mult))]
    t_up = tuple(reversed(cfg.temporal_downsample))
    dec = {"conv1": _c3(nk(), cfg.z_dim, rdims[0]), "up": []}
    dec["mid"] = {"res0": _rb_init(nk(), rdims[0], rdims[0]),
                  "attn": _attn_init(nk(), rdims[0]),
                  "res1": _rb_init(nk(), rdims[0], rdims[0])}
    for i, (ci, co) in enumerate(zip(rdims[:-1], rdims[1:])):
        if i in (1, 2, 3):
            ci = ci // 2  # the upsample conv halved the channels
        stage = {"res": []}
        c = ci
        for _ in range(cfg.num_res_blocks + 1):
            stage["res"].append(_rb_init(nk(), c, co))
            c = co
        if i != len(cfg.dim_mult) - 1:
            stage["sample"] = {"conv": _c2(nk(), co, co // 2)}
            if t_up[i]:
                stage["sample"]["time_conv"] = _c3(nk(), co, 2 * co,
                                                   (3, 1, 1))
        dec["up"].append(stage)
    dec["head_norm"] = {"g": jnp.ones((cfg.dim,), jnp.float32)}
    dec["head_conv"] = _c3(nk(), cfg.dim, 3)

    return {"encoder": enc, "decoder": dec,
            "conv1": _c3(nk(), 2 * cfg.z_dim, 2 * cfg.z_dim, (1, 1, 1)),
            "conv2": _c3(nk(), cfg.z_dim, cfg.z_dim, (1, 1, 1))}


# ------------------------------------------------------------------ model


def wanvae_encode(params, x, cfg: WanVAEConfig = WAN_VAE_16Z,
                  normalize: bool = True):
    """x [B, 3, F, H, W] in [-1, 1] -> normalized latent mean
    [B, z, 1+(F-1)/4, H/8, W/8]."""
    p = params["encoder"]
    h = _conv3d(p["conv1"], x)
    for i, stage in enumerate(p["down"]):
        for rb in stage["res"]:
            h = _resblock(rb, h)
        if "sample" in stage:
            h = _downsample(stage["sample"], h,
                            temporal=cfg.temporal_downsample[i])
    h = _resblock(p["mid"]["res0"], h)
    h = _attention(p["mid"]["attn"], h)
    h = _resblock(p["mid"]["res1"], h)
    h = _conv3d(p["head_conv"], jax.nn.silu(_rms_norm(p["head_norm"], h)))
    moments = _conv3d(params["conv1"], h)
    mu = moments[:, :cfg.z_dim]
    if normalize:
        mean = WAN_LATENT_MEAN.reshape(1, -1, 1, 1, 1)
        std = WAN_LATENT_STD.reshape(1, -1, 1, 1, 1)
        mu = (mu - mean) / std
    return mu


def wanvae_decode(params, z, cfg: WanVAEConfig = WAN_VAE_16Z,
                  normalize: bool = True):
    """z [B, z, T, h, w] normalized latents -> video [B, 3, F, H, W],
    clamped to [-1, 1]."""
    if normalize:
        mean = WAN_LATENT_MEAN.reshape(1, -1, 1, 1, 1)
        std = WAN_LATENT_STD.reshape(1, -1, 1, 1, 1)
        z = z * std + mean
    p = params["decoder"]
    t_up = tuple(reversed(cfg.temporal_downsample))
    h = _conv3d(params["conv2"], z)
    h = _conv3d(p["conv1"], h)
    h = _resblock(p["mid"]["res0"], h)
    h = _attention(p["mid"]["attn"], h)
    h = _resblock(p["mid"]["res1"], h)
    for i, stage in enumerate(p["up"]):
        for rb in stage["res"]:
            h = _resblock(rb, h)
        if "sample" in stage:
            h = _upsample(stage["sample"], h, temporal=t_up[i])
    h = _conv3d(p["head_conv"], jax.nn.silu(_rms_norm(p["head_norm"], h)))
    return jnp.clip(h, -1.0, 1.0)
