"""KV-group width sweep for the joint (all_member) shared-gather kernel at
the HY-720p shape and Jenga-Base density — picks the production `group`
default for q_rows 4/8."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from jenga_tpu.utils.compile_cache import enable_repo_cache

enable_repo_cache(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax.numpy as jnp

from jenga_tpu.ops.block_sparse_attention import block_sparse_attention_grouped
from jenga_tpu.sparse.planner import mask_to_block_lists, pack_block_lists

b, h, d = 1, 24, 128
nb = 904
s = nb * 128
tsb = nb - 2
density = 0.27
win = int(density * nb)

key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
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


def sync(o):
    return float(jnp.sum(o[..., ::257].astype(jnp.float32)))


def timeit(fn, *a, iters=4):
    sync(fn(*a))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


for qr, groups in ((4, (8, 12, 16, 20)), (8, (8, 12, 16))):
    gmask = jnp.any(local.reshape(b, h, nb // qr, qr, nb), axis=3)
    gl = jax.block_until_ready(
        pack_block_lists(*mask_to_block_lists(gmask)))
    dens = float(gl[..., 0].astype(jnp.float32).mean()) / nb
    line = f"q_rows={qr} (density {dens:.3f}):"
    for grp in groups:
        try:
            tg = timeit(jax.jit(lambda q, k, v, l, qr=qr, grp=grp:
                                block_sparse_attention_grouped(
                                    q, k, v, l, q_rows=qr, group=grp,
                                    text_start_block=tsb,
                                    all_member=True)), q, k, v, gl)
            line += f"  g{grp}: {tg:6.1f} ms"
        except Exception as e:
            line += f"  g{grp}: FAIL({type(e).__name__})"
    print(line, flush=True)
