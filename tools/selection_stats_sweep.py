"""Sweep input-smoothness scales / noise mix and report the planner's
selection density + shared-gather union fractions at the HY bench config
(tied q/k, first double block). One compile, many evals — the stats
program is input-shape-fixed."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
from jenga_tpu.utils.compile_cache import enable_repo_cache

enable_repo_cache(repo)

from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.models import hyvideo as hy

sys.path.insert(0, repo)
from bench import synth_latents, tie_qk_projections  # noqa: E402

grid = (32, 45, 80)
lat = (32, 90, 160)
cfg = dataclasses.replace(hy.HUNYUAN_VIDEO_T2V, double_blocks=1,
                          single_blocks=1)
params = tie_qk_projections(
    hy.init_hyvideo_params(jax.random.PRNGKey(0), cfg), cfg)
plan = build_curve_plan(grid, "gilbert", 128)
carve = hy.make_hy_carve(cfg, plan, sa_drop_rate=0.75, p_remain=0.05,
                         txt_block_num=2, q_rows=4)
key = jax.random.PRNGKey(1)
t = jnp.full((1,), 600.0, jnp.float32)
txt = jax.random.normal(jax.random.fold_in(key, 1),
                        (1, 256, cfg.text_states_dim), jnp.float32)
mask = jnp.ones((1, 256), jnp.int32)
txt2 = jax.random.normal(jax.random.fold_in(key, 2),
                         (1, cfg.text_states_dim_2), jnp.float32)
guidance = jnp.full((1,), 6000.0, jnp.float32)
nqb = plan.seq_len // 128
tk75 = jnp.int32(int(0.25 * nqb))


@jax.jit
def stats(params, carve, x, top_k):
    m = hy.hy_first_selection_mask(params, cfg, x, t, txt, mask, txt2,
                                   carve, guidance, top_k=top_k)
    b_, h_, nq, nk = m.shape
    out = [m.mean()]
    for g in (2, 4, 8):
        nqp = nq - nq % g
        mg = m[:, :, :nqp].reshape(b_, h_, nqp // g, g, nk)
        out.append(jnp.any(mg, axis=3).mean())
    return jnp.stack(out)


def smooth_at(tds, sds, sigma, seed=1):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    shape = (1, cfg.in_channels) + lat
    low = jax.random.normal(
        k1, (1, cfg.in_channels, max(1, lat[0] // tds),
             max(1, lat[1] // sds), max(1, lat[2] // sds)), jnp.float32)
    sm = jax.image.resize(low, shape, "trilinear")
    sm = sm / (jnp.std(sm) + 1e-6)
    return (1 - sigma) * sm + sigma * jax.random.normal(k2, shape,
                                                        jnp.float32)


configs = [("bench-default", synth_latents(key, (1, cfg.in_channels) + lat))]
for tds, sds, sig in [(8, 16, 0.6), (16, 32, 0.6), (8, 16, 0.3),
                      (16, 32, 0.3), (32, 64, 0.6), (4, 8, 0.0)]:
    configs.append((f"t/{tds} s/{sds} sig{sig}", smooth_at(tds, sds, sig)))

for name, x in configs:
    t0 = time.perf_counter()
    d, u2, u4, u8 = [float(v) for v in stats(params, carve, x, tk75)]
    print(f"{name:22s} density {d:.3f}  union2 {u2:.3f} union4 {u4:.3f} "
          f"union8 {u8:.3f}   ({time.perf_counter() - t0:.1f}s)",
          flush=True)
