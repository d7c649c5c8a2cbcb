"""Does RoPE-structured block selection slow the gather kernel?

Builds lists three ways at the HY 720p shape and times the SAME kernel:
  rand   — lists from i.i.d. normal q/k (the sweep's regime)
  rope   — lists from the same q/k AFTER RoPE rotation (positional
           structure in pooled scores, as in the real model)
  diag   — adversarial: every row selects the same stride pattern
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.models import layers as L
from jenga_tpu.ops.block_sparse_attention import block_sparse_attention
from jenga_tpu.sparse import planner as P

b, h, d = 1, 24, 128
plan = build_curve_plan((32, 45, 80), "gilbert", 128)
s_img = plan.seq_len
s = -(-(s_img + 256) // 128) * 128
nb = s // 128
tsb = nb - 2

key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)

cos, sin = L.rope_table_3d((32, 45, 80), (16, 56, 56), theta=256.0,
                           order=plan.curve_order)
cos = jnp.asarray(cos)
sin = jnp.asarray(sin)


@jax.jit
def roped(q):
    qr = q[:, :, :s_img].transpose(0, 2, 1, 3)       # [b, s, h, d]
    qr = L.apply_rope(qr, cos, sin).transpose(0, 2, 1, 3)
    return jnp.concatenate([qr, q[:, :, s_img:]], axis=2)


@jax.jit
def make_lists(q, k):
    m = P.build_block_mask(q[:, :, :tsb * 128], k, top_k=225, p_remain=0.05,
                           text_start_block=tsb, text_blocks=2,
                           block_neighbors=jnp.asarray(plan.block_neighbors))
    full = jnp.ones((b, h, nb - tsb, nb), bool)
    return P.pack_block_lists(
        *P.mask_to_block_lists(jnp.concatenate([m, full], 2)))


lists_rand = jax.block_until_ready(make_lists(q, k))
lists_rope = jax.block_until_ready(make_lists(roped(q), roped(k)))

# adversarial stride pattern: every row picks blocks {0, 4, 8, ...}
stride_mask = (jnp.arange(nb)[None, None, None, :] % 4 == 0)
stride_mask = jnp.broadcast_to(stride_mask, (b, h, nb, nb))
stride_mask = stride_mask.at[..., tsb:].set(True)
lists_diag = jax.block_until_ready(
    P.pack_block_lists(*P.mask_to_block_lists(stride_mask)))


@jax.jit
def direct(q, k, v, lists):
    return block_sparse_attention(q, k, v, lists, text_start_block=tsb)


def sync(o):
    return float(jnp.sum(o[..., ::257].astype(jnp.float32)))


def timeit(fn, *a, iters=3):
    sync(fn(*a))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


print(f"counts rand {float(lists_rand[..., 0].mean()):.1f} "
      f"rope {float(lists_rope[..., 0].mean()):.1f} "
      f"diag {float(lists_diag[..., 0].mean()):.1f}", flush=True)
print(f"rand lists  {timeit(direct, q, k, v, lists_rand):8.1f} ms",
      flush=True)
print(f"rope lists  {timeit(direct, q, k, v, lists_rope):8.1f} ms",
      flush=True)
print(f"diag lists  {timeit(direct, q, k, v, lists_diag):8.1f} ms",
      flush=True)
