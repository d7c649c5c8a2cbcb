"""HunyuanVideo causal 3-D VAE ("884": 4x temporal / 8x spatial, 16ch).

Functional JAX implementation of the reference ``AutoencoderKLCausal3D``
(`/root/reference/hyvideo/vae/autoencoder_kl_causal_3d.py:53-620`,
blocks `/root/reference/hyvideo/vae/unet_causal_3d_blocks.py:37-764`,
encoder/decoder `/root/reference/hyvideo/vae/vae.py:32-355`):

  * CausalConv3d: replicate padding, time front-padded by k-1 (each output
    frame sees only itself and earlier frames);
  * encoder: conv_in -> 4 down blocks (2 resnets each; spatial stride-2
    convs on blocks 0-2, temporal on 1-2) -> mid (resnet, frame-causal
    single-head attention, resnet) -> groupnorm -> conv_out (2x latent);
  * decoder mirrors with nearest-neighbor upsampling where the first frame
    is upsampled spatially only (causal temporal upsample);
  * spatial + temporal tiled encode/decode with linear edge blending.

Convs run through ``lax.conv_general_dilated`` in NCDHW layout so XLA maps
them onto the MXU directly.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["HYVAEConfig", "init_hyvae_params", "vae_encode", "vae_decode",
           "vae_decode_tiled", "vae_encode_tiled", "gaussian_sample",
           "HYVAE_884_16C"]


@dataclasses.dataclass(frozen=True)
class HYVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    time_compression_ratio: int = 4
    spatial_compression_ratio: int = 8
    scaling_factor: float = 0.476986
    sample_tsize: int = 64          # temporal tile (video frames)
    sample_size: int = 256          # spatial tile (pixels)
    tile_overlap_factor: float = 0.25


HYVAE_884_16C = HYVAEConfig()


# ------------------------------------------------------------------ ops


def causal_conv3d(p, x, stride=(1, 1, 1)):
    """Replicate-padded causal 3-D conv; weight [O, I, kt, kh, kw]."""
    w = p["w"]
    kt, kh, kw = w.shape[2:]
    x = jnp.pad(x, ((0, 0), (0, 0), (kt - 1, 0),
                    (kh // 2, kh // 2), (kw // 2, kw // 2)), mode="edge")
    out = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, window_strides=stride, padding="VALID",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.float32)
    out = out + p["b"].reshape(1, -1, 1, 1, 1).astype(jnp.float32)
    return out.astype(x.dtype)


def group_norm(p, x, groups: int, eps: float = 1e-6):
    """GroupNorm over channels of [B, C, T, H, W], f32 statistics."""
    b, c, t, h, w = x.shape
    xf = x.astype(jnp.float32).reshape(b, groups, c // groups, t, h, w)
    mean = xf.mean(axis=(2, 3, 4, 5), keepdims=True)
    var = jnp.var(xf, axis=(2, 3, 4, 5), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, c, t, h, w)
    xf = xf * p["w"].reshape(1, -1, 1, 1, 1) + p["b"].reshape(1, -1, 1, 1, 1)
    return xf.astype(x.dtype)


def _resnet(p, x, groups):
    """GroupNorm-SiLU-conv x2 with (projected) residual."""
    h = causal_conv3d(p["conv1"], jax.nn.silu(
        group_norm(p["norm1"], x, groups)))
    h = causal_conv3d(p["conv2"], jax.nn.silu(
        group_norm(p["norm2"], h, groups)))
    if "shortcut" in p:
        x = causal_conv3d(p["shortcut"], x)
    return x + h


def _mid_attention(p, x, groups):
    """Single-head frame-causal attention over (T, H*W) tokens (reference
    ``UNetMidBlockCausal3D`` + ``prepare_causal_attention_mask``,
    `/root/reference/hyvideo/vae/unet_causal_3d_blocks.py:526-630,37-46`)."""
    b, c, t, hh, ww = x.shape
    res = x
    xn = group_norm(p["norm"], x, groups)
    tok = xn.reshape(b, c, t * hh * ww).transpose(0, 2, 1)  # [B, S, C]
    q = jnp.einsum("bsc,cd->bsd", tok, p["q"]["w"]) + p["q"]["b"]
    k = jnp.einsum("bsc,cd->bsd", tok, p["k"]["w"]) + p["k"]["b"]
    v = jnp.einsum("bsc,cd->bsd", tok, p["v"]["w"]) + p["v"]["b"]
    logits = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (c ** -0.5)
    frame = jnp.arange(t * hh * ww) // (hh * ww)
    causal = frame[:, None] >= frame[None, :]
    logits = jnp.where(causal[None], logits, -jnp.inf)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bqk,bkd->bqd", attn, v.astype(jnp.float32))
    out = jnp.einsum("bsd,dc->bsc", out.astype(tok.dtype), p["o"]["w"]) \
        + p["o"]["b"]
    out = out.transpose(0, 2, 1).reshape(b, c, t, hh, ww)
    return res + out.astype(res.dtype)


def _mid_block(p, x, groups):
    x = _resnet(p["resnet0"], x, groups)
    x = _mid_attention(p["attn"], x, groups)
    x = _resnet(p["resnet1"], x, groups)
    return x


def _upsample(p, x, factor):
    """Nearest-neighbor upsample; the first frame is never duplicated in
    time (causal), then a conv (reference ``UpsampleCausal3D.forward``,
    `/root/reference/hyvideo/vae/unet_causal_3d_blocks.py:129-182`)."""
    ft, fh, fw = factor
    b, c, t, h, w = x.shape
    if ft > 1 and t > 1:
        first, rest = x[:, :, :1], x[:, :, 1:]
        rest = jnp.repeat(jnp.repeat(jnp.repeat(rest, ft, 2), fh, 3), fw, 4)
        first = jnp.repeat(jnp.repeat(first, fh, 3), fw, 4)
        x = jnp.concatenate([first, rest], axis=2)
    else:
        x = jnp.repeat(jnp.repeat(x, fh, 3), fw, 4)
    return causal_conv3d(p["conv"], x)


# ------------------------------------------------------------------ params


def _conv_init(key, c_in, c_out, k=3, dtype=jnp.float32):
    fan_in = c_in * k * k * k
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(key, (c_out, c_in, k, k, k), dtype,
                                -bound, bound),
        "b": jnp.zeros((c_out,), dtype),
    }


def _norm_init(c):
    return {"w": jnp.ones((c,), jnp.float32), "b": jnp.zeros((c,),
                                                             jnp.float32)}


def _lin_init(key, c_in, c_out):
    bound = 1.0 / math.sqrt(c_in)
    return {"w": jax.random.uniform(key, (c_in, c_out), jnp.float32,
                                    -bound, bound),
            "b": jnp.zeros((c_out,), jnp.float32)}


def _resnet_init(key, c_in, c_out):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"norm1": _norm_init(c_in), "conv1": _conv_init(k1, c_in, c_out),
         "norm2": _norm_init(c_out), "conv2": _conv_init(k2, c_out, c_out)}
    if c_in != c_out:
        p["shortcut"] = _conv_init(k3, c_in, c_out, k=1)
    return p


def _mid_init(key, c):
    k0, k1, kq, kk, kv, ko = jax.random.split(key, 6)
    return {
        "resnet0": _resnet_init(k0, c, c),
        "resnet1": _resnet_init(k1, c, c),
        "attn": {"norm": _norm_init(c), "q": _lin_init(kq, c, c),
                 "k": _lin_init(kk, c, c), "v": _lin_init(kv, c, c),
                 "o": _lin_init(ko, c, c)},
    }


def _down_strides(cfg: HYVAEConfig):
    """Per-block downsample stride (None = no downsample); 884 layout:
    spatial on blocks 0..2, temporal on 1..2 (mirrors the decoder rules,
    `/root/reference/hyvideo/vae/vae.py:56-75,186-199`)."""
    n = len(cfg.block_out_channels)
    ns = int(np.log2(cfg.spatial_compression_ratio))
    nt = int(np.log2(cfg.time_compression_ratio))
    out = []
    for i in range(n):
        sp = i < ns
        tm = (i >= n - 1 - nt) and (i != n - 1)
        if not sp and not tm:
            out.append(None)
        else:
            out.append((2 if tm else 1, 2 if sp else 1, 2 if sp else 1))
    return out


# the decoder mirrors the encoder's 884 placement rule exactly
_up_factors = _down_strides


def init_hyvae_params(key, cfg: HYVAEConfig = HYVAE_884_16C):
    keys = iter(jax.random.split(key, 256))
    nk = lambda: next(keys)
    ch = cfg.block_out_channels
    lp = cfg.layers_per_block

    # encoder
    enc_blocks = []
    c_in = ch[0]
    for i, c_out in enumerate(ch):
        resnets = [_resnet_init(nk(), c_in if j == 0 else c_out, c_out)
                   for j in range(lp)]
        blk = {"resnets": resnets}
        stride = _down_strides(cfg)[i]
        if stride is not None:
            blk["down"] = _conv_init(nk(), c_out, c_out)
        enc_blocks.append(blk)
        c_in = c_out

    encoder = {
        "conv_in": _conv_init(nk(), cfg.in_channels, ch[0]),
        "blocks": enc_blocks,
        "mid": _mid_init(nk(), ch[-1]),
        "norm_out": _norm_init(ch[-1]),
        "conv_out": _conv_init(nk(), ch[-1], 2 * cfg.latent_channels),
    }

    # decoder
    rch = list(reversed(ch))
    dec_blocks = []
    c_in = rch[0]
    for i, c_out in enumerate(rch):
        resnets = [_resnet_init(nk(), c_in if j == 0 else c_out, c_out)
                   for j in range(lp + 1)]
        blk = {"resnets": resnets}
        factor = _up_factors(cfg)[i]
        if factor is not None:
            blk["up"] = {"conv": _conv_init(nk(), c_out, c_out)}
        dec_blocks.append(blk)
        c_in = c_out

    decoder = {
        "conv_in": _conv_init(nk(), cfg.latent_channels, ch[-1]),
        "mid": _mid_init(nk(), ch[-1]),
        "blocks": dec_blocks,
        "norm_out": _norm_init(ch[0]),
        "conv_out": _conv_init(nk(), ch[0], cfg.out_channels),
    }
    lc = cfg.latent_channels
    return {"encoder": encoder, "decoder": decoder,
            "quant_conv": _conv_init(nk(), 2 * lc, 2 * lc, k=1),
            "post_quant_conv": _conv_init(nk(), lc, lc, k=1)}


# ------------------------------------------------------------------ model


def _encoder(p, cfg, x):
    g = cfg.norm_num_groups
    h = causal_conv3d(p["conv_in"], x)
    strides = _down_strides(cfg)
    for blk, stride in zip(p["blocks"], strides):
        for r in blk["resnets"]:
            h = _resnet(r, h, g)
        if stride is not None:
            h = causal_conv3d(blk["down"], h, stride=stride)
    h = _mid_block(p["mid"], h, g)
    h = jax.nn.silu(group_norm(p["norm_out"], h, g))
    return causal_conv3d(p["conv_out"], h)


def _decoder(p, cfg, z):
    g = cfg.norm_num_groups
    h = causal_conv3d(p["conv_in"], z)
    h = _mid_block(p["mid"], h, g)
    factors = _up_factors(cfg)
    for blk, factor in zip(p["blocks"], factors):
        for r in blk["resnets"]:
            h = _resnet(r, h, g)
        if factor is not None:
            h = _upsample(blk["up"], h, factor)
    h = jax.nn.silu(group_norm(p["norm_out"], h, g))
    return causal_conv3d(p["conv_out"], h)


def vae_encode(params, x, cfg: HYVAEConfig = HYVAE_884_16C):
    """x [B, 3, F, H, W] in [-1, 1] -> moments [B, 2*latent, f, h, w]."""
    moments = _encoder(params["encoder"], cfg, x)
    return causal_conv3d(params["quant_conv"], moments)


def gaussian_sample(moments, key=None):
    """Sample (or take the mode when key is None) of the diagonal gaussian
    (reference ``DiagonalGaussianDistribution``,
    `/root/reference/hyvideo/vae/vae.py:294-355`)."""
    mean, logvar = jnp.split(moments, 2, axis=1)
    if key is None:
        return mean
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def vae_decode(params, z, cfg: HYVAEConfig = HYVAE_884_16C):
    """z [B, latent, f, h, w] (already un-scaled) -> video [B, 3, F, H, W]."""
    z = causal_conv3d(params["post_quant_conv"], z)
    return _decoder(params["decoder"], cfg, z)


# ------------------------------------------------------------- tiling


def _blend_h(a, b, extent):
    w = b.shape[-1]
    n = min(a.shape[-1], w, extent)
    if n <= 0:
        return b
    ramp = (jnp.arange(n) / n).reshape(1, 1, 1, 1, n)
    blended = a[..., -n:] * (1 - ramp) + b[..., :n] * ramp
    return jnp.concatenate([blended, b[..., n:]], axis=-1)


def _blend_v(a, b, extent):
    h = b.shape[-2]
    n = min(a.shape[-2], h, extent)
    if n <= 0:
        return b
    ramp = (jnp.arange(n) / n).reshape(1, 1, 1, n, 1)
    blended = a[..., -n:, :] * (1 - ramp) + b[..., :n, :] * ramp
    return jnp.concatenate([blended, b[..., n:, :]], axis=-2)


def _blend_t(a, b, extent):
    t = b.shape[2]
    n = min(a.shape[2], t, extent)
    if n <= 0:
        return b
    ramp = (jnp.arange(n) / n).reshape(1, 1, n, 1, 1)
    blended = a[:, :, -n:] * (1 - ramp) + b[:, :, :n] * ramp
    return jnp.concatenate([blended, b[:, :, n:]], axis=2)


def _spatial_tiled_decode_raw(params, z, cfg: HYVAEConfig):
    """Spatially tiled decode with linear seam blending (reference
    ``spatial_tiled_decode``, `/root/reference/hyvideo/vae/
    autoencoder_kl_causal_3d.py:361-460`); ``z`` already went through
    post_quant_conv."""
    tile_latent = cfg.sample_size // cfg.spatial_compression_ratio
    overlap = max(int(tile_latent * (1 - cfg.tile_overlap_factor)), 1)
    blend = int(cfg.sample_size * cfg.tile_overlap_factor)
    row_limit = cfg.sample_size - blend

    rows = []
    for i in range(0, z.shape[-2], overlap):
        row = []
        for j in range(0, z.shape[-1], overlap):
            tile = z[:, :, :, i:i + tile_latent, j:j + tile_latent]
            row.append(_decoder(params["decoder"], cfg, tile))
        rows.append(row)

    # The reference blends IN PLACE (`autoencoder_kl_causal_3d.py`
    # blend_v/blend_h mutate b), so each tile blends against the already-
    # blended neighbor; ``done`` holds the processed full-size tiles.
    done = [[None] * len(r) for r in rows]
    out_rows = []
    for i, row in enumerate(rows):
        out_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = _blend_v(done[i - 1][j], tile, blend)
            if j > 0:
                tile = _blend_h(done[i][j - 1], tile, blend)
            done[i][j] = tile
            out_row.append(tile)
        out_rows.append(jnp.concatenate(
            [t[..., :row_limit] for t in out_row], axis=-1))
    return jnp.concatenate([r[..., :row_limit, :] for r in out_rows],
                           axis=-2)


def vae_decode_tiled(params, z, cfg: HYVAEConfig = HYVAE_884_16C,
                     temporal: bool = True):
    """Temporal + spatial tiled decode (reference ``temporal_tiled_decode``,
    `/root/reference/hyvideo/vae/autoencoder_kl_causal_3d.py:500-532`).
    z [B, latent, f, h, w]."""
    tile_latent_t = cfg.sample_tsize // cfg.time_compression_ratio
    tile_latent_s = cfg.sample_size // cfg.spatial_compression_ratio
    f = z.shape[2]

    def decode_one(tile):
        if tile.shape[-1] > tile_latent_s or tile.shape[-2] > tile_latent_s:
            tile = causal_conv3d(params["post_quant_conv"], tile)
            # the spatial tiler applies the decoder per spatial tile
            return _spatial_tiled_decode_raw(params, tile, cfg)
        return vae_decode(params, tile, cfg)

    if not temporal or f <= tile_latent_t:
        return decode_one(z)

    overlap = max(int(tile_latent_t * (1 - cfg.tile_overlap_factor)), 1)
    blend = int(cfg.sample_tsize * cfg.tile_overlap_factor)
    limit = cfg.sample_tsize - blend

    tiles = []
    for start in range(0, f, overlap):
        dec = decode_one(z[:, :, start:start + tile_latent_t + 1])
        if start > 0:
            dec = dec[:, :, 1:]
        tiles.append(dec)
    parts = []
    prev = None
    for i, tile in enumerate(tiles):
        if i > 0:
            tile = _blend_t(prev, tile, blend)
            parts.append(tile[:, :, :limit])
        else:
            parts.append(tile[:, :, :limit + 1])
        prev = tile
    return jnp.concatenate(parts, axis=2)


def _encode_raw(params, cfg, x):
    """encoder + quant_conv (no tiling): x -> moments."""
    return causal_conv3d(params["quant_conv"], _encoder(params["encoder"],
                                                        cfg, x))


def _spatial_tiled_encode_raw(params, x, cfg: HYVAEConfig):
    """Spatially tiled encode with latent-space seam blending (reference
    ``spatial_tiled_encode``, `/root/reference/hyvideo/vae/
    autoencoder_kl_causal_3d.py:361-415`): pixel-space tiles of
    ``sample_size`` stepped by the pixel overlap, blended and cropped in
    latent space. Returns moments."""
    tile_px = cfg.sample_size
    overlap_px = int(tile_px * (1 - cfg.tile_overlap_factor))
    tile_lat = tile_px // cfg.spatial_compression_ratio
    blend = int(tile_lat * cfg.tile_overlap_factor)
    row_limit = tile_lat - blend

    rows = []
    for i in range(0, x.shape[-2], overlap_px):
        row = []
        for j in range(0, x.shape[-1], overlap_px):
            tile = x[:, :, :, i:i + tile_px, j:j + tile_px]
            row.append(_encode_raw(params, cfg, tile))
        rows.append(row)

    # blend against processed neighbors (the reference mutates in place)
    done = [[None] * len(r) for r in rows]
    out_rows = []
    for i, row in enumerate(rows):
        out_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = _blend_v(done[i - 1][j], tile, blend)
            if j > 0:
                tile = _blend_h(done[i][j - 1], tile, blend)
            done[i][j] = tile
            out_row.append(tile[..., :row_limit, :row_limit])
        out_rows.append(jnp.concatenate(out_row, axis=-1))
    return jnp.concatenate(out_rows, axis=-2)


def vae_encode_tiled(params, x, cfg: HYVAEConfig = HYVAE_884_16C,
                     temporal: bool = True):
    """Temporal + spatial tiled encode (reference ``temporal_tiled_encode``,
    `/root/reference/hyvideo/vae/autoencoder_kl_causal_3d.py:465-498`).
    x [B, 3, F, H, W] in [-1, 1] -> moments [B, 2*latent, f, h, w]."""
    def encode_one(tile):
        if (tile.shape[-1] > cfg.sample_size
                or tile.shape[-2] > cfg.sample_size):
            return _spatial_tiled_encode_raw(params, tile, cfg)
        return _encode_raw(params, cfg, tile)

    f = x.shape[2]
    if not temporal or f <= cfg.sample_tsize:
        return encode_one(x)

    overlap = int(cfg.sample_tsize * (1 - cfg.tile_overlap_factor))
    tile_lat_t = cfg.sample_tsize // cfg.time_compression_ratio
    blend = int(tile_lat_t * cfg.tile_overlap_factor)
    limit = tile_lat_t - blend

    tiles = []
    for start in range(0, f, overlap):
        enc = encode_one(x[:, :, start:start + cfg.sample_tsize + 1])
        if start > 0:
            enc = enc[:, :, 1:]
        tiles.append(enc)
    parts = []
    prev = None
    for i, tile in enumerate(tiles):
        if i > 0:
            tile = _blend_t(prev, tile, blend)
            parts.append(tile[:, :, :limit])
        else:
            parts.append(tile[:, :, :limit + 1])
        prev = tile
    return jnp.concatenate(parts, axis=2)
