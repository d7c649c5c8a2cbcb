"""On-chip microbenchmarks: where does a carved DiT step spend its time?

Times, at the headline Wan2.1-1.3B bench shape (832x480x81f -> ~32.7k
tokens, batch 2 = both CFG branches):

  * raw MXU rate (a bf16 matmul chain sized like one FFN layer),
  * the carving planner alone (pooled-QK + top-p + packing),
  * the block-sparse Pallas kernel alone at production selection density,
  * the same kernel with full lists (the dense baseline arm),
  * one full carved forward / dense forward for cross-checking.

Usage: python tools/microbench.py  (run from the repo root, needs the TPU)
"""

import dataclasses
import os
import sys
import time

# Repo-root import shim: PYTHONPATH can't be used in this environment (it
# displaces the sitecustomize path that registers the TPU PJRT plugin).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.models.wan import (
    WAN_T2V_1_3B, init_wan_params, make_wan_carve, wan_forward)
from jenga_tpu.ops.block_sparse_attention import block_sparse_attention
from jenga_tpu.sparse.planner import plan_block_sparsity


def timeit(fn, *args, iters=4):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cfg = WAN_T2V_1_3B
    lat_f, lat_h, lat_w = 21, 60, 104
    grid = (lat_f, lat_h // 2, lat_w // 2)
    plan = build_curve_plan(grid, "sliced", 128)
    s = -(-plan.seq_len // 128) * 128
    b, h, d = 2, cfg.num_heads, cfg.dim // cfg.num_heads
    nb = s // 128
    print(f"tokens={plan.seq_len} padded={s} blocks={nb} heads={h} d={d}")

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
    neighbors = jnp.asarray(plan.block_neighbors)

    # --- raw MXU rate: one FFN layer's matmuls (x @ W1 @ W2) x 30 layers
    w1 = jax.random.normal(kq, (cfg.dim, cfg.ffn_dim), jnp.bfloat16)
    w2 = jax.random.normal(kk, (cfg.ffn_dim, cfg.dim), jnp.bfloat16)
    x = jax.random.normal(kv, (b, s, cfg.dim), jnp.bfloat16)

    @jax.jit
    def ffn_chain(x, w1, w2):
        for _ in range(30):
            x = jnp.tanh(x @ w1) @ w2
        return x

    t = timeit(ffn_chain, x, w1, w2)
    fl = 30 * 2 * 2 * b * s * cfg.dim * cfg.ffn_dim
    print(f"ffn chain (30 layers):   {t*1e3:8.1f} ms  "
          f"{fl/t/1e12:6.1f} TFLOP/s bf16")

    # --- planner alone
    top_k = int((1 - 0.75) * nb)

    @jax.jit
    def planner(q, k):
        return plan_block_sparsity(
            q, k, neighbors, top_k=top_k, p_remain=0.15,
            text_start_block=nb, text_blocks=0)

    t = timeit(planner, q, k)
    mask, lists = planner(q, k)
    frac = float(jnp.mean(jnp.sum(mask, -1) / nb))
    print(f"planner (1 layer):       {t*1e3:8.1f} ms  "
          f"selected {frac:.1%} of blocks")

    # --- sparse kernel at production density vs full lists
    @jax.jit
    def sparse(q, k, v, lists):
        return block_sparse_attention(q, k, v, lists)

    t_sp = timeit(sparse, q, k, v, lists)
    _, full_lists = jax.jit(lambda q, k: plan_block_sparsity(
        q, k, None, top_k=nb, p_remain=1.0,
        text_start_block=nb, text_blocks=0))(q, k)
    t_full = timeit(sparse, q, k, v, full_lists)
    att_fl = 4 * b * h * s * s * d
    print(f"kernel sparse ({frac:.0%}):     {t_sp*1e3:8.1f} ms  "
          f"{att_fl*frac/t_sp/1e12:6.1f} eff TFLOP/s")
    print(f"kernel full (100%):      {t_full*1e3:8.1f} ms  "
          f"{att_fl/t_full/1e12:6.1f} TFLOP/s")
    print(f"  -> kernel-only speedup {t_full/t_sp:5.2f}x; per carved layer: "
          f"planner+kernel = {(t+t_sp)*1e3:.1f} ms x30 = "
          f"{(t+t_sp)*30:.2f} s")

    # --- full forwards
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    x2 = jax.random.normal(key, (b, cfg.in_dim, lat_f, lat_h, lat_w),
                           jnp.float32)
    t2 = jnp.full((b,), 600.0, jnp.float32)
    ctx2 = jax.random.normal(key, (b, cfg.text_len, cfg.text_dim),
                             jnp.float32)
    carve = make_wan_carve(cfg, plan, sa_drop_rate=0.75, p_remain=0.15)
    dense_carve = dataclasses.replace(carve, sa_drop_rate=0.0)

    @jax.jit
    def carved(params, x2):
        return wan_forward(params, cfg, x2, t2, ctx2, carve=carve)

    @jax.jit
    def dense(params, x2):
        return wan_forward(params, cfg, x2, t2, ctx2, carve=dense_carve)

    t_c = timeit(carved, params, x2, iters=2)
    t_d = timeit(dense, params, x2, iters=2)
    print(f"carved forward:          {t_c*1e3:8.1f} ms")
    print(f"dense  forward:          {t_d*1e3:8.1f} ms  "
          f"(speedup {t_d/t_c:.2f}x)")
    print(f"unattributed carved time (not ffn/planner/kernel): "
          f"{t_c - (t + t_sp)*30 - timeit(ffn_chain, x, w1, w2):+.2f} s "
          f"(qkvo/cross-attn/norms/embed)")


if __name__ == "__main__":
    main()
