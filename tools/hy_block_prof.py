"""Per-piece timing of one carved HY double/single block at 720p shape.

Splits a block's on-chip time into attention (planner+kernel) vs the rest
(projections, norms, modulation, MLP) to find non-attention fat.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.models import hyvideo as hy

cfg = hy.HUNYUAN_VIDEO_T2V
grid = (32, 45, 80)
lat = (32, 90, 160)
plan = build_curve_plan(grid, "gilbert", 128)
carve = hy.make_hy_carve(cfg, plan, sa_drop_rate=0.75, p_remain=0.05,
                         txt_block_num=2)

import dataclasses
cfg1 = dataclasses.replace(cfg, double_blocks=1, single_blocks=1)
params = hy.init_hyvideo_params(jax.random.PRNGKey(0), cfg1)

key = jax.random.PRNGKey(1)
s_img = plan.seq_len
txt_len = 256
img = jax.random.normal(key, (1, s_img, cfg.hidden_size), jnp.bfloat16)
txt = jax.random.normal(jax.random.fold_in(key, 1),
                        (1, txt_len, cfg.hidden_size), jnp.bfloat16)
vec = jax.random.normal(jax.random.fold_in(key, 2),
                        (1, cfg.hidden_size), jnp.float32)
rope_cos = jnp.asarray(carve.rope_cos)
rope_sin = jnp.asarray(carve.rope_sin)
seqlen = jnp.full((1,), s_img + txt_len, jnp.int32)
x_cat = jnp.concatenate([img, txt], axis=1)


def sync(o):
    lead = o[0] if isinstance(o, tuple) else o
    return float(jnp.sum(lead[..., ::257].astype(jnp.float32)))


def timeit(fn, *a, iters=3):
    sync(fn(*a))
    best = float("inf")
    for i in range(iters):
        aa = (a[0], a[1] * (1 + 0.001 * i)) + a[2:]
        t0 = time.perf_counter()
        sync(fn(*aa))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


@jax.jit
def dbl(params, img, txt):
    p = params["double_blocks"][0]
    return hy._double_block(p, img, txt, vec, cfg, carve, rope_cos, rope_sin,
                            seqlen, None, None, None)


@jax.jit
def sgl(params, x):
    p = params["single_blocks"][0]
    return hy._single_block(p, x, vec, cfg, carve, rope_cos, rope_sin,
                            txt_len, seqlen, None, None, None)


@jax.jit
def attn_only(params, img, txt):
    # q/k/v random-projected then joint attention — the attention core
    p = params["double_blocks"][0]
    dtype = img.dtype
    qkv = hy.L.linear(p["img_qkv"], img)
    b, s, _ = qkv.shape
    q, k, v = jnp.split(qkv.reshape(b, s, 3, cfg.heads_num, -1), 3, axis=2)
    q, k, v = (t.squeeze(2) for t in (q, k, v))
    tq, tk, tv = (jax.random.normal(jax.random.PRNGKey(9),
                                    (b, txt_len, cfg.heads_num, 128),
                                    dtype) for _ in range(3))
    q = jnp.concatenate([q, tq], axis=1)
    k = jnp.concatenate([k, tk], axis=1)
    v = jnp.concatenate([v, tv], axis=1)
    return hy._joint_attention(q, k, v, cfg, carve, s_img, seqlen)


t_d = timeit(dbl, params, img, txt)
t_s = timeit(sgl, params, x_cat)
t_a = timeit(attn_only, params, img, txt)

print(f"double block total {t_d:8.1f} ms")
print(f"single block total {t_s:8.1f} ms")
print(f"attention core     {t_a:8.1f} ms (qkv proj + planner + kernel)")
print(f"60-layer step est: {20 * t_d + 40 * t_s:.0f} ms")
print(f"double non-attn    {t_d - t_a:8.1f} ms (txt-attn dbl-counted ~small)")
