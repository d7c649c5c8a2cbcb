"""Is the small-shape kernel gap gather-LOCALITY-bound? In-model probe.

The Wan Turbo stage-0 decomposition leaves a kernel_vs_ideal term
(~0.087 s of a 1.01 s step) that the r5 (q_rows, group) sweep proved no
tuning recovers. One structural lever remains untried: coalescing DMAs
over CONTIGUOUS block runs (the sort-compacted lists contain runs from
the adjacency forcing; a run-length kernel could fetch them in one
DMA). Before building that, this probe measures its upper bound
in-model: the same stage-0 forward with a replayed selection
(WanCarve.sel_mask) that is either

  planner — the real scattered selection (layer-0 planner output), or
  banded  — a fully contiguous band per group row at the SAME per-row
            density (the best case any coalescing scheme could reach:
            every gather is one contiguous range),

both through the identical sel_mask replay path (planner ablated in
both arms). banded << planner would mean DMA locality is the remaining
lever and a runs-coalescing kernel pays; banded ~= planner means the
kernel is NOT gather-bound at this shape and the residual is fixed
per-step structure + FLOP-share-model conservatism — closing the
question.

Measured 2026-08-20 (v5e, Wan turbo stage 0, 30 layers, min of 4):
  planner-mask replay 1020.9 ms   banded-mask replay 1022.7 ms
  (density 0.310 / 0.310; delta -0.2% — noise)
Verdict: NOT gather-locality-bound — even the perfect-coalescing best
case (every gather one contiguous range) buys nothing in-model, so a
run-length kernel has no headroom at this shape; the kernel_vs_ideal
residue is per-step structure plus FLOP-share-model conservatism,
closing the last open tuning question behind BENCH_WAN_TURBO.json's
decomposition.
"""
import dataclasses
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
from jenga_tpu.models.wan import (WAN_T2V_1_3B, init_wan_params,
                                  make_wan_carve, wan_forward,
                                  wan_first_selection_mask)
from bench import synth_latents
from tools.bench_wan import _tie_qk, _timeit

QROWS = 8
cfg = WAN_T2V_1_3B
key = jax.random.PRNGKey(1)
params = _tie_qk(init_wan_params(jax.random.PRNGKey(0), cfg))

lf, lh, lw = 21, 44, 78            # Turbo stage 0
drop = 0.75
grid = (lf, lh // 2, lw // 2)
plan = build_curve_plan(grid, "sliced", 128)
nb = -(-plan.seq_len // 128)
tk = jnp.int32(int(nb * (1.0 - drop)))
x2 = synth_latents(key, (2, cfg.in_dim, lf, lh, lw))
t2 = jnp.full((2,), 600.0, jnp.float32)
ctx2 = jax.random.normal(jax.random.fold_in(key, 1),
                         (2, cfg.text_len, cfg.text_dim), jnp.float32)
carve = make_wan_carve(cfg, plan, sa_drop_rate=drop, p_remain=0.15,
                       q_rows=QROWS, joint_sel=True)


@jax.jit
def fwd(params, carve, x2, top_k):
    return wan_forward(params, cfg, x2, t2, ctx2, carve=carve, top_k=top_k)


@jax.jit
def _sel(params, carve, x2, top_k):
    return wan_first_selection_mask(params, cfg, x2, t2, ctx2, carve,
                                    top_k)


mask_planner = jax.block_until_ready(_sel(params, carve, x2, tk))
b, h, nqb, nkb = mask_planner.shape

# banded mask, group-pooled like the planner's joint output: per 8-row
# group, one contiguous window matching that group's OWN selected count
# (so density matches group for group). nqb need not divide QROWS (the
# replay path pads internally) — index rows to groups explicitly.
ngr = -(-nqb // QROWS)
first_rows = jnp.minimum(jnp.arange(ngr) * QROWS, nqb - 1)
counts = mask_planner[:, :, first_rows, :].sum(-1)   # [b, h, ngr]
centers = jnp.arange(ngr) * QROWS + QROWS // 2
cols = jnp.arange(nkb)[None, None, None, :]
lo = jnp.clip(centers[None, None, :] - counts // 2, 0, None)
lo = jnp.minimum(lo, nkb - counts)             # keep window in range
band = (cols >= lo[..., None]) & (cols < (lo + counts)[..., None])
mask_banded = band[:, :, jnp.arange(nqb) // QROWS, :]  # [b, h, nqb, nkb]

d_p = float(mask_planner.mean())
d_b = float(mask_banded.mean())

fx_p = dataclasses.replace(carve, sel_mask=mask_planner)
fx_b = dataclasses.replace(carve, sel_mask=mask_banded)
t_p = _timeit(lambda p, xx: fwd(p, fx_p, xx, tk), params, x2, 4)
t_b = _timeit(lambda p, xx: fwd(p, fx_b, xx, tk), params, x2, 4)
print(f"planner-mask replay {t_p*1e3:.1f} ms (density {d_p:.3f})   "
      f"banded-mask replay {t_b*1e3:.1f} ms (density {d_b:.3f})   "
      f"delta {(t_p/t_b-1)*100:+.1f}%", flush=True)
