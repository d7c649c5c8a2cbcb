"""Decompose the carved HY attention path at the 720p flagship shape.

Times, on the real chip at (b=1, h=24, s=115456, d=128, nb=902):
  planner   = build_block_mask (pooled-QK top-p + adjacency + text)
  pack      = mask_to_block_lists + pack_block_lists
  kernel    = block_sparse_attention over the packed lists
  dense     = tile-tuned dense flash at the same shape (the bench baseline)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.ops.block_sparse_attention import block_sparse_attention
from jenga_tpu.ops.flash_attention import dense_attention
from jenga_tpu.sparse.planner import (build_block_mask, mask_to_block_lists,
                                      pack_block_lists)

DROP = float(os.environ.get("DROP", "0.75"))
b, h, d = 1, 24, 128
grid = (32, 45, 80)
plan = build_curve_plan(grid, "gilbert", 128)
s_img = plan.seq_len                   # 115200
s = -(-(s_img + 256) // 128) * 128     # + 2 text blocks = 115456
nb = s // 128
tsb = nb - 2
top_k = int((1.0 - DROP) * (s_img // 128))

key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
neighbors = jnp.asarray(plan.block_neighbors)


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0][..., ::257].astype(jnp.float32)))


def timeit(fn, *a, iters=4):
    sync(fn(*a))
    best = float("inf")
    for i in range(iters):
        aa = (a[0] * (1 + 0.001 * i),) + a[1:]
        t0 = time.perf_counter()
        sync(fn(*aa))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


@jax.jit
def planner(q, k):
    mask = build_block_mask(q[:, :, :tsb * 128], k, top_k=top_k,
                            p_remain=0.05, text_start_block=tsb,
                            text_blocks=2, block_neighbors=neighbors)
    full = jnp.ones((b, h, nb - tsb, nb), bool)
    return jnp.concatenate([mask, full], axis=2)


@jax.jit
def packed(q, k):
    mask = planner(q, k)
    return pack_block_lists(*mask_to_block_lists(mask), seqlens=s - 37)


lists = jax.block_until_ready(packed(q, k))
density = float(jnp.mean(lists[..., 0].astype(jnp.float32))) / nb


@jax.jit
def kern(q, k, v, lists):
    return block_sparse_attention(q, k, v, lists, text_amp=1.0,
                                  text_start_block=tsb)


t_plan = timeit(planner, q, k)
t_pack = timeit(packed, q, k)
t_kern = timeit(kern, q, k, v, lists)
t_dense = timeit(dense_attention, q, k, v, iters=2)

fl_dense = 4 * b * h * s * s * d
print(f"shape b={b} h={h} s={s} nb={nb} top_k={top_k} density={density:.3f}")
print(f"planner  {t_plan:8.1f} ms")
print(f"+pack    {t_pack:8.1f} ms  (pack alone ~{t_pack - t_plan:.1f})")
print(f"kernel   {t_kern:8.1f} ms  ({fl_dense * density / t_kern / 1e9:.0f} TFLOP/s effective)")
print(f"dense    {t_dense:8.1f} ms  ({fl_dense / t_dense / 1e9:.0f} TFLOP/s)")
print(f"carved total (plan+pack+kernel) {t_pack + t_kern:.1f} ms "
      f"vs dense {t_dense:.1f} -> {t_dense / (t_pack + t_kern):.2f}x")
