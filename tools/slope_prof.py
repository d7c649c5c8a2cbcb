"""Layer-count slope of the carved/dense Wan forward on TPU."""
import os, sys, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.models.wan import (
    WAN_T2V_1_3B, init_wan_params, make_wan_carve, wan_forward)

lat = (21, 60, 104)
grid = (21, 30, 52)
plan = build_curve_plan(grid, "sliced", 128)
key = jax.random.PRNGKey(1)

def sync(out):
    lead = out[0] if isinstance(out, tuple) else out
    return float(jnp.sum(lead))

def timeit(fn, *a, iters=3):
    sync(fn(*a))
    best = float("inf")
    for i in range(iters):
        t0 = time.perf_counter(); sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best

for nl in (2, 16, 30):
    cfg = dataclasses.replace(WAN_T2V_1_3B, num_layers=nl)
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    x2 = jax.random.normal(key, (2, cfg.in_dim) + lat, jnp.float32)
    t2 = jnp.full((2,), 600.0, jnp.float32)
    ctx2 = jax.random.normal(key, (2, cfg.text_len, cfg.text_dim), jnp.float32)
    carve = make_wan_carve(cfg, plan, sa_drop_rate=0.75, p_remain=0.15)

    @jax.jit
    def carved(params, x2):
        return wan_forward(params, cfg, x2, t2, ctx2, carve=carve)

    t = timeit(carved, params, x2)
    print(f"layers={nl:2d} carved forward: {t*1e3:8.1f} ms")
