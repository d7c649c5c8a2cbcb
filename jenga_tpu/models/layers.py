"""Shared functional building blocks for the DiT backbones.

Everything is a pure function over parameter pytrees (nested dicts of
jax.Arrays): no module system, no hidden state — parameters thread through
``pjit``/``shard_map`` untouched and every model is a single jittable
function. Covers the reference's sub-layer library
(`/root/reference/hyvideo/modules/{norm_layers,mlp_layers,modulate_layers,
embed_layers}.py` and `/root/reference/wan/modules/model_mul.py:16-117`)
re-expressed jnp-first.

Precision policy (mirrors the reference's autocast islands): weights live in
bf16, normalizations and modulation arithmetic run in f32, matmuls use bf16
inputs with f32 accumulation (XLA default on MXU with
``preferred_element_type``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "linear", "rms_norm", "layer_norm", "gelu_tanh", "silu",
    "sinusoidal_embedding", "modulate", "patchify_3d", "unpatchify_3d",
    "rope_table_1d", "rope_table_3d", "apply_rope",
]


def linear(p, x, precision=None):
    """Affine map with params {'w': [in, out], optional 'b': [out]}.

    Also accepts fp8 storage {'w8': e4m3, 'scale': f32} (see models.fp8):
    the weight is dequantized to bf16 right before the matmul, halving
    weight HBM traffic."""
    if "w8" in p:
        w = (p["w8"].astype(jnp.bfloat16)
             * p["scale"].astype(jnp.bfloat16))
    else:
        w = p["w"]
    y = jnp.dot(x, w, preferred_element_type=jnp.float32,
                precision=precision)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(x, weight=None, eps: float = 1e-6):
    """RMSNorm in f32, result cast back (reference WanRMSNorm / RMSNorm).

    The affine multiply happens in f32 BEFORE the cast: multiplying after
    would promote the result to the f32 weight dtype — which silently put
    the whole q/k stream (and through concat, the attention kernel's KV
    gather) in f32: 2x HBM bytes + f32 MXU, measured 1.8x slower at the HY
    720p shape."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm(x, weight=None, bias=None, eps: float = 1e-6):
    """LayerNorm computed in f32; affine optional (reference WanLayerNorm).

    Affine in f32 before the final cast — see rms_norm for why the order
    matters (f32 dtype leakage into every downstream matmul)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def silu(x):
    return jax.nn.silu(x)


def sinusoidal_embedding(dim: int, position, max_period: float = 10000.0,
                         flip_sin_cos: bool = True, downscale: float = 1.0):
    """1-D sinusoidal timestep embedding.

    ``flip_sin_cos=True`` gives [cos | sin] halves (Wan convention,
    `/root/reference/wan/modules/model_mul.py:16-26`); ``False`` gives
    [sin | cos] (HunyuanVideo's diffusers-style TimestepEmbedder).
    Computed in f64-precision numpy-compatible math via f32 (the f64 of the
    reference only matters for huge positions; timesteps are <= 1000).
    """
    half = dim // 2
    freqs = jnp.exp(
        -np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = position.astype(jnp.float32)[..., None] * freqs * downscale
    if flip_sin_cos:
        return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def modulate(x, shift=None, scale=None):
    """x * (1 + scale) + shift, broadcast over the token axis, in f32."""
    y = x.astype(jnp.float32)
    if scale is not None:
        y = y * (1.0 + scale.astype(jnp.float32))
    if shift is not None:
        y = y + shift.astype(jnp.float32)
    return y.astype(x.dtype)


def patchify_3d(p, x, patch: tuple[int, int, int]):
    """3-D conv patch embedding as reshape + one matmul (MXU-friendly).

    ``x``: [B, C, F, H, W]; kernel == stride == ``patch`` means the conv is
    exactly a block reshape followed by a dense projection, so we feed the
    MXU one big [B*L, C*pt*ph*pw] @ [C*pt*ph*pw, dim] matmul instead of a
    conv (reference uses nn.Conv3d,
    `/root/reference/wan/modules/model_mul.py:478-479`).
    Params: {'w': [C*pt*ph*pw, dim], 'b': [dim]}.
    Returns ([B, L, dim], grid) with grid = (F/pt, H/ph, W/pw).
    """
    b, c, f, h, w = x.shape
    pt, ph, pw = patch
    gt, gh, gw = f // pt, h // ph, w // pw
    x = x.reshape(b, c, gt, pt, gh, ph, gw, pw)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)  # B gt gh gw C pt ph pw
    x = x.reshape(b, gt * gh * gw, c * pt * ph * pw)
    return linear(p, x), (gt, gh, gw)


def unpatchify_3d(x, grid: tuple[int, int, int], patch: tuple[int, int, int],
                  out_channels: int, channel_last: bool = False):
    """Inverse of patchify: [B, L, ...] -> [B, C, F, H, W].

    The per-token feature layout differs between the two model families:
    HunyuanVideo's final layer emits (c, pt, ph, pw)
    (`/root/reference/hyvideo/modules/models.py:700-713`,
    einsum ``nthwcopq``) while Wan's head emits (pt, ph, pw, c)
    (`/root/reference/wan/modules/model.py:589-595`, einsum
    ``fhwpqrc->cfphqwr``) — ``channel_last=True`` selects the Wan order.
    """
    b = x.shape[0]
    gt, gh, gw = grid
    pt, ph, pw = patch
    if channel_last:
        x = x.reshape(b, gt, gh, gw, pt, ph, pw, out_channels)
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
    else:
        x = x.reshape(b, gt, gh, gw, out_channels, pt, ph, pw)
        x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    return x.reshape(b, out_channels, gt * pt, gh * ph, gw * pw)


def rope_table_1d(positions: np.ndarray, dim: int, theta: float = 10000.0):
    """cos/sin tables [len(positions), dim/2] in f32 via f64 host math."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    angles = np.outer(positions.astype(np.float64), freqs)
    return (np.cos(angles).astype(np.float32),
            np.sin(angles).astype(np.float32))


def rope_table_3d(grid: tuple[int, int, int], dims: tuple[int, int, int],
                  theta: float = 10000.0, order: np.ndarray | None = None,
                  positions: tuple | None = None):
    """Interleaved 3-D rope tables for a (t, h, w) token grid.

    ``dims`` are the per-axis rotary sub-dimensions (must sum to head_dim).
    Each token's table is the concatenation of its t-, h- and w-axis tables;
    ``order`` optionally permutes tokens (the hilbert ``freq_remap``,
    `/root/reference/wan/modules/model_mul.py:63-65`) so RoPE positions
    follow the curve reorder. ``positions`` optionally overrides the
    per-axis coordinate vectors (ProRes NTK rescaling uses fractional
    coordinates). Returns (cos, sin) of shape [S, head_dim//2], f32.
    """
    t, h, w = grid
    axes = []
    for size, dim, axis in zip(grid, dims, range(3)):
        pos = (positions[axis] if positions is not None
               else np.arange(size, dtype=np.float64))
        axes.append(rope_table_1d(np.asarray(pos), dim, theta))
    cos_t = np.broadcast_to(axes[0][0][:, None, None, :], (t, h, w, dims[0] // 2))
    sin_t = np.broadcast_to(axes[0][1][:, None, None, :], (t, h, w, dims[0] // 2))
    cos_h = np.broadcast_to(axes[1][0][None, :, None, :], (t, h, w, dims[1] // 2))
    sin_h = np.broadcast_to(axes[1][1][None, :, None, :], (t, h, w, dims[1] // 2))
    cos_w = np.broadcast_to(axes[2][0][None, None, :, :], (t, h, w, dims[2] // 2))
    sin_w = np.broadcast_to(axes[2][1][None, None, :, :], (t, h, w, dims[2] // 2))
    cos = np.concatenate([cos_t, cos_h, cos_w], axis=-1).reshape(t * h * w, -1)
    sin = np.concatenate([sin_t, sin_h, sin_w], axis=-1).reshape(t * h * w, -1)
    if order is not None:
        cos, sin = cos[order], sin[order]
    return cos.copy(), sin.copy()


_ROPE_SWAP = {}


def _rope_swap_matrix(d: int) -> np.ndarray:
    """±1 permutation matrix: (x @ P)[2i] = -x[2i+1], (x @ P)[2i+1] = x[2i]."""
    if d not in _ROPE_SWAP:
        p = np.zeros((d, d), np.float32)
        even = np.arange(0, d, 2)
        p[even + 1, even] = -1.0
        p[even, even + 1] = 1.0
        _ROPE_SWAP[d] = p
    return _ROPE_SWAP[d]


def apply_rope(x, cos, sin):
    """Rotate interleaved pairs: x [..., S, H, D], cos/sin [S, D/2], f32 math.

    Pair convention is interleaved (even, odd) lanes forming complex values,
    matching the reference's ``view_as_complex`` on a [..., D/2, 2] reshape
    (`/root/reference/wan/modules/model_mul.py:51-66`).

    TPU note: the naive stride-2 slice + re-interleave compiles to lane
    shuffles (~10x off the bandwidth roofline, measured on v5e). Instead the
    pair swap-and-negate runs as one exact ±1 permutation matmul on the MXU
    and the tables are lane-duplicated to full width, so the whole rotation
    is contiguous elementwise math:
      y = x * dup(cos) + swap(x) * dup(sin),
    identical f32 operations per element to the naive form (each output
    element is the same two-term product-sum).
    """
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    # the swap matmul runs in the INPUT dtype: a +/-1 permutation matrix is
    # exact in bf16 (pure negation/selection), and bf16 hits the full MXU
    # rate; the f32 accumulate keeps the result exact.
    swap = jnp.asarray(_rope_swap_matrix(d)).astype(x.dtype)
    xs = jax.lax.dot_general(
        x, swap, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    cf = jnp.repeat(cos.astype(jnp.float32), 2, axis=-1)[:, None, :]
    sf = jnp.repeat(sin.astype(jnp.float32), 2, axis=-1)[:, None, :]
    y = xf * cf + xs * sf
    return y.astype(x.dtype)
