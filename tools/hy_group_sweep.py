"""DMA group-size sweep for the sparse kernel at the HY 720p shape."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.ops.block_sparse_attention import block_sparse_attention
from jenga_tpu.sparse import planner as P

b, h, d = 1, 24, 128
plan = build_curve_plan((32, 45, 80), "gilbert", 128)
s = -(-(plan.seq_len + 256) // 128) * 128
nb = s // 128
tsb = nb - 2
top_k = int(0.25 * (plan.seq_len // 128))

key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
neighbors = jnp.asarray(plan.block_neighbors)

@jax.jit
def make_lists(q, k):
    mask = P.build_block_mask(q[:, :, :tsb * 128], k, top_k=top_k,
                              p_remain=0.05, text_start_block=tsb,
                              text_blocks=2, block_neighbors=neighbors)
    full = jnp.ones((b, h, nb - tsb, nb), bool)
    mask = jnp.concatenate([mask, full], axis=2)
    return P.pack_block_lists(*P.mask_to_block_lists(mask))


lists = make_lists(q, k)
lists = jax.block_until_ready(lists)
density = float(jnp.mean(lists[..., 0].astype(jnp.float32))) / nb
gb = density * nb * h * nb * 128 * d * 2 * 2 / 1e9


def sync(x):
    return float(jnp.sum(x[..., ::257].astype(jnp.float32)))


def timeit(fn, *a, iters=4):
    sync(fn(*a))
    best = float("inf")
    for i in range(iters):
        aa = (a[0] * (1 + 0.001 * i),) + a[1:]
        t0 = time.perf_counter()
        sync(fn(*aa))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


print(f"density {density:.3f}, gather traffic {gb:.0f} GB "
      f"(roofline {gb / 0.819:.0f} ms at 819 GB/s)")
for grp in (8, 16, 24, 32):
    t = timeit(lambda q, k, v, l: block_sparse_attention(
        q, k, v, l, text_amp=1.0, text_start_block=tsb, group=grp),
        q, k, v, lists)
    print(f"group {grp:3d}: {t:8.1f} ms  ({gb / t * 1000:.0f} GB/s)")
