"""Shared-gather (grouped) kernel vs per-row kernel at the HY 720p shape.

Two selection regimes at matched density (~27%, the Jenga-Base fraction):
  local  — each query row attends a contiguous window around its own
           position (the production pattern the paper measures: trained
           video DiT attention is spatio-temporally local, which is the
           premise of carving itself). Adjacent rows overlap heavily, so
           the union gather saves ~q_rows x HBM traffic.
  random — i.i.d. top-k selection (the synthetic-weights bench regime);
           little overlap, the grouped mode pays masked compute for
           nothing.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jenga_tpu.ops.block_sparse_attention import (
    block_sparse_attention, block_sparse_attention_grouped)
from jenga_tpu.sparse.planner import (mask_to_block_lists, pack_block_lists,
                                      pack_block_lists_grouped)

b, h, d = 1, 24, 128
s = 904 * 128          # 904 divides by q_rows {2,4,8}
nb = 904
tsb = nb - 2
density = 0.27
win = int(density * nb)

key = jax.random.PRNGKey(0)
kq, kk, kv, km = jax.random.split(key, 4)
q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)

rows = jnp.arange(nb)[:, None]
cols = jnp.arange(nb)[None, :]
center = jnp.clip(rows, win // 2, tsb - win // 2)
local = (jnp.abs(cols - center) <= win // 2)
local = jnp.broadcast_to(local[None, None], (b, h, nb, nb))
local = local.at[..., tsb:].set(True)
local = local.at[:, :, tsb:].set(True)

rand = jax.random.uniform(km, (b, h, nb, nb)) < density
rand = rand.at[:, :, jnp.arange(nb), jnp.arange(nb)].set(True)
rand = rand.at[..., tsb:].set(True)
rand = rand.at[:, :, tsb:].set(True)


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


per_row = jax.jit(lambda q, k, v, l: block_sparse_attention(
    q, k, v, l, text_start_block=tsb))


for name, mask in (("local", local), ("random", rand)):
    lists = jax.block_until_ready(
        pack_block_lists(*mask_to_block_lists(mask)))
    dens = float(mask.mean())
    t1 = timeit(per_row, q, k, v, lists)
    line = f"{name:6s} density {dens:.3f}: per-row {t1:7.1f} ms"
    for qr in (2, 4, 8):
        gl = jax.block_until_ready(pack_block_lists_grouped(mask, qr))
        ufrac = float(gl[..., 0].astype(jnp.float32).mean()) / nb
        tg = timeit(jax.jit(lambda q, k, v, l, qr=qr:
                            block_sparse_attention_grouped(
                                q, k, v, l, q_rows=qr,
                                text_start_block=tsb)), q, k, v, gl)
        line += f" | q_rows={qr}: {tg:7.1f} ms (union {ufrac:.3f})"
    print(line, flush=True)

# joint-selection mode (all_member=True): group-uniform mask, plain lists,
# no per-row membership masking — the production configuration.
print("joint selection (all_member):", flush=True)
for qr in (2, 4, 8):
    gmask = local.reshape(b, h, nb // qr, qr, nb)[:, :, :, 0]
    gmask = jnp.any(local.reshape(b, h, nb // qr, qr, nb), axis=3)
    gl = jax.block_until_ready(
        pack_block_lists(*mask_to_block_lists(gmask)))
    dens = float(gl[..., 0].astype(jnp.float32).mean()) / nb
    tg = timeit(jax.jit(lambda q, k, v, l, qr=qr:
                        block_sparse_attention_grouped(
                            q, k, v, l, q_rows=qr,
                            text_start_block=tsb, all_member=True)),
                q, k, v, gl)
    print(f"  q_rows={qr}: {tg:7.1f} ms (density {dens:.3f})", flush=True)
