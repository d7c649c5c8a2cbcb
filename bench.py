"""Benchmark: Wan2.1-1.3B DiT denoise time, carved vs dense, on real TPU.

Mirrors the reference's headline measurement protocol (DiT-only wall time
per clip after warmup, `/root/reference/README.md:207-210`): Wan2.1-1.3B
T2V at 832x480x81f (~32k tokens), 50 steps x 2 CFG calls. The reference
numbers on 1xH800: dense 111 s/clip, Jenga-Base 26 s/clip (4.26x).

Prints ONE JSON line:
  value        = carved DiT seconds/clip on this chip
  vs_baseline  = our_speedup_vs_our_dense / reference_speedup(4.26)
                 (>1 means better relative carving gain than the reference)
"""

import json
import os
import time

import jax
import jax.numpy as jnp

QUICK = bool(int(os.environ.get("BENCH_QUICK", "0")))
REF_JENGA_BASE_SPEEDUP = 4.26   # /root/reference/README.md:207-210
REF_JENGA_BASE_SECONDS = 26.0


def main():
    from jenga_tpu.curves.blocks import build_curve_plan
    from jenga_tpu.models.wan import (
        WAN_T2V_1_3B, init_wan_params, make_wan_carve, wan_forward)
    import dataclasses

    cfg = WAN_T2V_1_3B
    if QUICK:
        cfg = dataclasses.replace(cfg, num_layers=4)

    # 832x480x81f -> latents (16, 21, 60, 104) -> token grid (21, 30, 52)
    lat_f, lat_h, lat_w = 21, 60, 104
    grid = (lat_f, lat_h // 2, lat_w // 2)

    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    x2 = jax.random.normal(key, (2, cfg.in_dim, lat_f, lat_h, lat_w),
                           jnp.float32)
    t2 = jnp.full((2,), 600.0, jnp.float32)
    ctx2 = jax.random.normal(jax.random.fold_in(key, 1),
                             (2, cfg.text_len, cfg.text_dim), jnp.float32)

    # With random weights pooled-QK attention is near-uniform, so the
    # preset's p_remain=0.9 would select ~90% of blocks; production
    # checkpoints have peaked attention and land near the top-k floor
    # (~(1-drop) + adjacency). Pin the bench to that regime.
    plan = build_curve_plan(grid, "sliced", 128)
    carve = make_wan_carve(cfg, plan, sa_drop_rate=0.75, p_remain=0.15)

    @jax.jit
    def carved(params, x2, t2, ctx2):
        return wan_forward(params, cfg, x2, t2, ctx2, carve=carve)

    # dense baseline through the same padded curve path (drop=0 -> dense
    # attention); carve=None would leave S=32760 un-padded and push the
    # stock flash kernel onto its slow segment-ids branch.
    dense_carve = dataclasses.replace(carve, sa_drop_rate=0.0)

    @jax.jit
    def dense(params, x2, t2, ctx2):
        return wan_forward(params, cfg, x2, t2, ctx2, carve=dense_carve)

    def timeit(fn, iters):
        out = fn(params, x2, t2, ctx2)          # compile + warmup
        out.block_until_ready()
        t0 = time.perf_counter()
        x = x2
        for _ in range(iters):
            # feed the output back in so every call is distinct work
            x = jnp.concatenate([out[:1], out[1:]]) * 0.5 + x * 0.5
            out = fn(params, x, t2, ctx2)
        out.block_until_ready()
        return (time.perf_counter() - t0) / iters

    iters = 1 if QUICK else 3
    steps = 50  # one fn call covers both CFG branches (batch of 2)
    t_carved = timeit(carved, iters)
    t_dense = timeit(dense, iters)

    carved_clip = t_carved * steps
    dense_clip = t_dense * steps
    speedup = dense_clip / carved_clip

    print(json.dumps({
        "metric": "Wan2.1-1.3B DiT s/clip, Jenga-Base carving, "
                  "832x480x81f, 50 steps (dense ref {:.1f}s, {:.2f}x "
                  "speedup vs our dense)".format(dense_clip, speedup),
        "value": round(carved_clip, 2),
        "unit": "s/clip",
        "vs_baseline": round(speedup / REF_JENGA_BASE_SPEEDUP, 3),
    }))


if __name__ == "__main__":
    main()
