"""Whole-trunk ablation at the Wan-1.3B Turbo stage shapes: the true
in-model planner/kernel overhead, free of micro-harness artifacts.

Earlier per-op probes (wan_prof/wan_overhead_probe*) timed stages behind
an anti-DCE reduction whose cost depended on the stage's output size, so
their "planner 5 ms/layer" style decompositions carried multi-ms
systematic error. Here every arm is the FULL jitted model forward (embed
+ 30-layer trunk + head, CFG batch of 2) and the decomposition comes
from differences of whole-forward times:

  dense        — carve disabled (the bench denominator)
  carved       — production path (planner in-loop per layer)
  fixedlists   — same kernel, planner ablated: every layer reuses one
                 precomputed packed list (selection from layer-0 stats);
                 carved - fixedlists = true per-step planner cost
  ideal        — dense * (1 - attn_share + attn_share * density): the
                 zero-overhead ceiling model from bench_wan.py

Run stage 1 (full res, drop 0.85) and stage 0 (0.75 res, drop 0.75)
of the Turbo preset. BENCH_QROWS picks the selection group (default 8,
production).

Measured 2026-08-20 (v5e, 30 layers, production dot-ones pool):
  stage1 32k: dense 4129  carved 1846.7  fixedlists 1870.9  ideal 1820.4
              -> overhead +1.4%; planner -24 ms (i.e. ~0, within the
              min-of-4 shared-chip noise; the mask-as-operand arm pays a
              small relayout cost the in-model planner doesn't)
  stage0 18k: dense 1598  carved 1007.0  fixedlists 1021.7  ideal  962.1
              -> overhead +4.7%; planner -15 ms (~0)
The in-model planner is effectively free; the carved-vs-ideal gap is
kernel gather/pack cost at realized density plus FLOP-share model
conservatism — there is no recoverable per-step overhead left at these
shapes, so the Turbo vs_baseline ceiling is binding as measured.

Round-5 gather-group A/B (JENGA_GATHER_GROUP, v5e 2026-08-20): the
kernel-harness sweep (tools/smallshape_sweep.py) suggested group=4
beats the shipped group=8 by ~5% at the stage-0 shape; in-model it is
NEUTRAL —
  g4 (auto): s1 carved 1847.3 (kernel-vs-ideal +48.2 ms), s0 carved
             1006.1 (+51.5 ms)
  g8 forced: s1 carved 1848.7 (+49.1 ms), s0 carved 1010.0 (+52.1 ms)
so the production pick stays shape-independent and the ~5%-of-step
stage-0 kernel-vs-ideal term is a floor none of the swept (q_rows,
group) space recovers (see utils/device.py gather_group_pick).
"""
import dataclasses
import os, sys, time

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

QROWS = int(os.environ.get("BENCH_QROWS", "8"))
cfg = WAN_T2V_1_3B
key = jax.random.PRNGKey(1)
params = _tie_qk(init_wan_params(jax.random.PRNGKey(0), cfg))

STAGES = [
    # (label, latent grid f/h/w, drop)  — Turbo geometry from
    # jenga_tpu/pipelines/wan_t2v.py (lh0 = int(60*0.75)//2*2 = 44)
    ("stage1 32k", (21, 60, 104), 0.85),
    ("stage0 18k", (21, 44, 78), 0.75),
]

for label, (lf, lh, lw), drop in STAGES:
    grid = (lf, lh // 2, lw // 2)
    plan = build_curve_plan(grid, "sliced", 128)
    nb = -(-plan.seq_len // 128)
    tk = jnp.int32(int(nb * (1.0 - drop)))
    x2 = synth_latents(key, (2, cfg.in_dim, lf, lh, lw))
    t2 = jnp.full((2,), 600.0, jnp.float32)
    ctx2 = jax.random.normal(jax.random.fold_in(key, 1),
                             (2, cfg.text_len, cfg.text_dim), jnp.float32)
    carve = make_wan_carve(cfg, plan, sa_drop_rate=drop, p_remain=0.15,
                           q_rows=QROWS, joint_sel=QROWS > 1)
    dense_carve = dataclasses.replace(carve, sa_drop_rate=0.0)

    @jax.jit
    def fwd(params, carve, x2, top_k):
        return wan_forward(params, cfg, x2, t2, ctx2, carve=carve,
                           top_k=top_k)

    iters = 4
    t_dense = _timeit(lambda p, x: fwd(p, dense_carve, x, jnp.int32(0)),
                      params, x2, iters)
    t_carved = _timeit(lambda p, x: fwd(p, carve, x, tk), params, x2, iters)

    @jax.jit
    def _sel(params, carve, x2, top_k):
        return wan_first_selection_mask(params, cfg, x2, t2, ctx2,
                                        carve, top_k)
    mask0 = jax.block_until_ready(_sel(params, carve, x2, tk))
    density = float(mask0.mean())

    # planner-ablated arm: every layer replays layer-0's selection
    # (carve.sel_mask bypasses build_block_mask); carved - fixedlists =
    # the true per-step planner cost inside the compiled model
    fixed_carve = dataclasses.replace(carve, sel_mask=mask0)
    t_fixed = _timeit(lambda p, x: fwd(p, fixed_carve, x, tk),
                      params, x2, iters)

    s_tokens = nb * 128
    dm, ffn, lt = cfg.dim, cfg.ffn_dim, cfg.text_len
    lin_fl = s_tokens * dm * (12 * dm + 4 * ffn) + 4 * lt * dm * dm
    attn_fl = 4 * s_tokens * s_tokens * dm + 4 * s_tokens * lt * dm
    share = attn_fl / (attn_fl + lin_fl)
    ideal = t_dense * (1 - share + share * density)

    print(f"{label}: dense {t_dense*1e3:7.1f} ms  carved "
          f"{t_carved*1e3:7.1f} ms  fixedlists {t_fixed*1e3:7.1f} ms  "
          f"ideal {ideal*1e3:7.1f} ms  (overhead {(t_carved-ideal)*1e3:+6.1f}"
          f" ms = {(t_carved/ideal-1)*100:4.1f}%, planner "
          f"{(t_carved-t_fixed)*1e3:+6.1f} ms, kernel-vs-ideal "
          f"{(t_fixed-ideal)*1e3:+6.1f} ms)  density {density:.3f}  "
          f"attn_share {share:.2f}", flush=True)
