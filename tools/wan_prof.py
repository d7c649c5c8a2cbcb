"""Decompose the Wan2.1-1.3B carved attention at the bench shape (b=2 CFG
batch, 12 heads, 32768 tokens, d=128). Each stage runs N chained
iterations inside ONE jit (fori_loop, perturbed inputs, strided
reduction against DCE) so the relay RTT / dispatch floor is amortized —
naive per-call timing overstated every stage by ~15-30 ms."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from jenga_tpu.utils.compile_cache import enable_repo_cache

enable_repo_cache(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax.numpy as jnp

from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.ops.flash_attention import dense_attention
from jenga_tpu.ops.block_sparse_attention import (
    block_sparse_attention_grouped)
from jenga_tpu.sparse.planner import (build_block_mask, mask_to_block_lists,
                                      pack_block_lists)

b, h, d = 2, 12, 128
grid = (21, 30, 52)
plan = build_curve_plan(grid, "sliced", 128)
s_real = plan.seq_len
s = -(-s_real // 128) * 128
nb = s // 128
print(f"tokens {s_real} padded {s} blocks {nb}", flush=True)

key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
neighbors = jnp.asarray(plan.block_neighbors)
seqlen = jnp.full((b,), s_real, jnp.int32)
N = 8


def timeit(fn, *a, iters=4):
    # float() materializes the scalar: on the axon relay backend
    # block_until_ready can return before execution finishes
    float(fn(*a))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / N


def chained(once):
    @jax.jit
    def f(q, k, v):
        def body(i, c):
            # 1 + 0.05*i survives bf16 rounding (eps ~0.008): a smaller
            # step rounds to exactly 1.0 and XLA hoists the whole body
            # out of the loop as loop-invariant
            scale = (1.0 + 0.05 * i.astype(jnp.float32)).astype(q.dtype)
            out = once(q * scale, k, v)
            return c + jnp.sum(out[..., ::13].astype(jnp.float32))
        return jax.lax.fori_loop(0, N, body, 0.0)
    return f


t_dense = timeit(chained(lambda q, k, v: dense_attention(q, k, v)), q, k, v)
print(f"dense flash      {t_dense:7.2f} ms/layer", flush=True)


def make_planner(tk):
    def planner(q, k, v=None):
        m = build_block_mask(q, k, top_k=tk, p_remain=0.15,
                             text_start_block=nb, text_blocks=0,
                             block_neighbors=neighbors, sel_group=4)
        u = jnp.any(m.reshape(b, h, nb // 4, 4, nb), axis=3)
        return pack_block_lists(*mask_to_block_lists(u), seqlens=seqlen)
    return planner


for drop in (0.75, 0.85):
    tk = int(nb * (1.0 - drop))
    planner = make_planner(tk)
    gl = jax.block_until_ready(jax.jit(planner)(q, k))
    dens = float(gl[..., 0].astype(jnp.float32).mean()) / nb
    t_plan = timeit(chained(lambda q, k, v: planner(q, k)
                            .astype(jnp.bfloat16)), q, k, v)

    def attn(q, k, v, planner=planner):
        return block_sparse_attention_grouped(
            q, k, v, planner(q, k), q_rows=4, text_start_block=nb,
            all_member=True)

    t_attn = timeit(chained(attn), q, k, v)
    ideal = t_dense * dens
    print(f"drop {drop}: density {dens:.3f}  planner {t_plan:6.2f} ms  "
          f"planner+kernel {t_attn:6.2f} ms (kernel ~{t_attn - t_plan:.1f},"
          f" ideal {ideal:.1f})  vs dense {t_dense:.2f}", flush=True)

kx = jax.random.normal(kk, (b, h, 512, d), jnp.bfloat16)
vx = jax.random.normal(kv, (b, h, 512, d), jnp.bfloat16)
t_x = timeit(chained(lambda q, k, v: dense_attention(q, kx, vx)), q, k, v)
print(f"cross-attn       {t_x:7.2f} ms/layer", flush=True)
