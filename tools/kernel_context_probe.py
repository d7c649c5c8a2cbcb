"""Why is the sparse kernel slower inside the block program?

Times the kernel at the HY 720p shape three ways:
  direct  — BHSD operands fed straight in (the sweep's measurement)
  transposed — operands produced by a BSHD->BHSD transpose inside the jit
  loop    — 4-iteration fori_loop around the transposed form (the model)
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
top_k = int(0.25 * (plan.seq_len // 128))

key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
qs = q.transpose(0, 2, 1, 3).copy()   # BSHD layouts
ks = k.transpose(0, 2, 1, 3).copy()
vs = v.transpose(0, 2, 1, 3).copy()
neighbors = jnp.asarray(plan.block_neighbors)


@jax.jit
def make_lists(q, k):
    mask = P.build_block_mask(q[:, :, :tsb * 128], k, top_k=top_k,
                              p_remain=0.05, text_start_block=tsb,
                              text_blocks=2, block_neighbors=neighbors)
    full = jnp.ones((b, h, nb - tsb, nb), bool)
    mask = jnp.concatenate([mask, full], axis=2)
    return P.pack_block_lists(*P.mask_to_block_lists(mask))


lists = jax.block_until_ready(make_lists(q, k))


def sync(x):
    return float(jnp.sum(x[..., ::1111].astype(jnp.float32)))


def timeit_loop(iters=3):
    float(inprog_loop(q, k, v))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(inprog_loop(q, k, v))
        best = min(best, time.perf_counter() - t0)
    return best / N * 1e3


def timeit(fn, *a, iters=3, n=1):
    sync(fn(*a))
    best = float("inf")
    for i in range(iters):
        aa = (a[0] * (1 + 0.001 * i),) + a[1:]
        t0 = time.perf_counter()
        sync(fn(*aa))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e3


@jax.jit
def direct(q, k, v, lists):
    return block_sparse_attention(q, k, v, lists, text_start_block=tsb)


@jax.jit
def transposed(qs, ks, vs, lists):
    return block_sparse_attention(
        qs.transpose(0, 2, 1, 3), ks.transpose(0, 2, 1, 3),
        vs.transpose(0, 2, 1, 3), lists, text_start_block=tsb)


N = 4


@jax.jit
def loop(qs, ks, vs, lists):
    def body(i, acc):
        o = block_sparse_attention(
            (qs * (1 + 1e-4 * i.astype(jnp.bfloat16))).transpose(0, 2, 1, 3),
            ks.transpose(0, 2, 1, 3), vs.transpose(0, 2, 1, 3),
            lists, text_start_block=tsb)
        return acc + jnp.sum(o[..., ::1111].astype(jnp.float32))
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))


@jax.jit
def inprog(q, k, v):
    mask = P.build_block_mask(q[:, :, :tsb * 128], k, top_k=top_k,
                              p_remain=0.05, text_start_block=tsb,
                              text_blocks=2, block_neighbors=neighbors)
    full = jnp.ones((b, h, nb - tsb, nb), bool)
    mask = jnp.concatenate([mask, full], axis=2)
    ll = P.pack_block_lists(*P.mask_to_block_lists(mask))
    return block_sparse_attention(q, k, v, ll, text_start_block=tsb)


@jax.jit
def inprog_loop(q, k, v):
    def body(i, acc):
        o = inprog(q * (1 + 1e-4 * i.astype(jnp.bfloat16)), k, v)
        return acc + jnp.sum(o[..., ::1111].astype(jnp.float32))
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))


print(f"direct     {timeit(direct, q, k, v, lists):8.1f} ms", flush=True)
print(f"inprog     {timeit(inprog, q, k, v):8.1f} ms", flush=True)
print(f"inprog_loop {float(inprog_loop(q, k, v)) * 0 + timeit_loop():8.1f} ms/iter", flush=True)
print(f"transposed {timeit(transposed, qs, ks, vs, lists):8.1f} ms")


def loop_sync(x):
    return float(x)


sync_ = sync
sync = loop_sync
print(f"loop       {timeit(loop, qs, ks, vs, lists, n=N):8.1f} ms/iter")
