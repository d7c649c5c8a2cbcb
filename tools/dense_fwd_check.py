"""Full dense Wan forward with tuned flash tiles (OOM + timing check)."""
import os, sys, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.models.wan import (
    WAN_T2V_1_3B, init_wan_params, make_wan_carve, wan_forward)

cfg = WAN_T2V_1_3B
lat = (21, 60, 104)
plan = build_curve_plan((21, 30, 52), "sliced", 128)
params = init_wan_params(jax.random.PRNGKey(0), cfg)
key = jax.random.PRNGKey(1)
x2 = jax.random.normal(key, (2, cfg.in_dim) + lat, jnp.float32)
t2 = jnp.full((2,), 600.0, jnp.float32)
ctx2 = jax.random.normal(key, (2, cfg.text_len, cfg.text_dim), jnp.float32)
carve = make_wan_carve(cfg, plan, sa_drop_rate=0.75, p_remain=0.15)
dense_carve = dataclasses.replace(carve, sa_drop_rate=0.0)

@jax.jit
def dense(params, x2):
    return wan_forward(params, cfg, x2, t2, ctx2, carve=dense_carve)

out = dense(params, x2); float(jnp.sum(out))
best = float("inf")
for i in range(3):
    t0 = time.perf_counter()
    float(jnp.sum(dense(params, x2 * (1 + 0.001 * i))))
    best = min(best, time.perf_counter() - t0)
print(f"dense forward (tuned flash): {best*1e3:.1f} ms")
