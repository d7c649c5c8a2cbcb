"""Which operand VALUES make the gather kernel slow?

The kernel measured 567ms with i.i.d. normal q/k/v but 1017ms with the
model's real activations (same lists, fresh buffers). Sweep synthetic
value regimes to find the slow path (subnormal exp2 args, bf16 inf in v,
large-magnitude logits...).
"""
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

key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)


@jax.jit
def make_lists(q, k):
    m = P.build_block_mask(q[:, :, :tsb * 128], k, top_k=225, p_remain=0.05,
                           text_start_block=tsb, text_blocks=2,
                           block_neighbors=jnp.asarray(plan.block_neighbors))
    full = jnp.ones((b, h, nb - tsb, nb), bool)
    return P.pack_block_lists(
        *P.mask_to_block_lists(jnp.concatenate([m, full], 2)))


lists = jax.block_until_ready(make_lists(q, k))


@jax.jit
def direct(q, k, v, lists):
    return block_sparse_attention(q, k, v, lists, text_start_block=tsb)


def sync(o):
    return float(jnp.sum(o[..., ::257].astype(jnp.float32)))


def timeit(*a, iters=3):
    sync(direct(*a))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(direct(*a))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


print(f"baseline (unit q/k/v)        {timeit(q, k, v, lists):8.1f} ms",
      flush=True)
print(f"q,k x10  (logits x100)       {timeit(q * 10, k * 10, v, lists):8.1f} ms",
      flush=True)
print(f"q,k x30  (logits x900)       {timeit(q * 30, k * 30, v, lists):8.1f} ms",
      flush=True)
print(f"v x1e4                       {timeit(q, k, v * 1e4, lists):8.1f} ms",
      flush=True)
vinf = v.at[0, 0, ::999].set(jnp.inf)
print(f"v with inf rows              {timeit(q, k, vinf, lists):8.1f} ms",
      flush=True)
qtiny = (q.astype(jnp.float32) * 1e-30).astype(jnp.bfloat16)
print(f"q subnormal-ish              {timeit(qtiny, k, v, lists):8.1f} ms",
      flush=True)
