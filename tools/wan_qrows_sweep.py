"""Per-stage q_rows sweep + planner ablation at the Wan-1.3B Turbo stage
shapes, all at whole-model granularity (see wan_trunk_ablate.py for why
per-op probes mislead here).

For each stage shape and q_rows in {1, 4, 8} (8 = the production
default; 16 exists for the joint mode but measured 0-4% at these
shapes — tools/q16_sweep.py): time the full carved forward and report
realized density + the zero-overhead ideal at that density. Coarser groups gather less but
select more (union inflation); the sweet spot can differ between 18k and
32k tokens.

The planner-ablated arm replays a precomputed constant mask through
``WanCarve.sel_mask`` (same selection statistics, planner bypassed in
every layer), so ``carved - ablated`` is the true in-model planner cost
per step.

Measured 2026-08-20 (v5e, 30 layers): q8 beats q4 at stage 0 (+5.3% vs
+8.5% over ideal) and stage 1 — the production q_rows=8 default stands.
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
from jenga_tpu.models import wan as W
from bench import synth_latents
from tools.bench_wan import _tie_qk, _timeit

cfg = W.WAN_T2V_1_3B
key = jax.random.PRNGKey(1)
params = _tie_qk(W.init_wan_params(jax.random.PRNGKey(0), cfg))

STAGES = [
    ("stage0 18k", (21, 44, 78), 0.75),
    ("stage1 32k", (21, 60, 104), 0.85),
]
QR_LIST = [int(x) for x in os.environ.get("QR_LIST", "1,4,8").split(",")]

for label, (lf, lh, lw), drop in STAGES:
    grid = (lf, lh // 2, lw // 2)
    plan = build_curve_plan(grid, "sliced", 128)
    nb = -(-plan.seq_len // 128)
    tk = jnp.int32(int(nb * (1.0 - drop)))
    x2 = synth_latents(key, (2, cfg.in_dim, lf, lh, lw))
    t2 = jnp.full((2,), 600.0, jnp.float32)
    ctx2 = jax.random.normal(jax.random.fold_in(key, 1),
                             (2, cfg.text_len, cfg.text_dim), jnp.float32)

    s_tokens = nb * 128
    dm, ffn, lt = cfg.dim, cfg.ffn_dim, cfg.text_len
    lin_fl = s_tokens * dm * (12 * dm + 4 * ffn) + 4 * lt * dm * dm
    attn_fl = 4 * s_tokens * s_tokens * dm + 4 * s_tokens * lt * dm
    share = attn_fl / (attn_fl + lin_fl)

    dense_carve = W.make_wan_carve(cfg, plan, sa_drop_rate=0.0,
                                   p_remain=0.15)

    @jax.jit
    def fwd(params, carve, x2, top_k):
        return W.wan_forward(params, cfg, x2, t2, ctx2, carve=carve,
                             top_k=top_k)

    iters = 4
    t_dense = _timeit(lambda p, x: fwd(p, dense_carve, x, jnp.int32(0)),
                      params, x2, iters)
    print(f"{label}: dense {t_dense*1e3:7.1f} ms  (attn_share {share:.2f}, "
          f"nb {nb})", flush=True)

    for qr in QR_LIST:
        carve = W.make_wan_carve(cfg, plan, sa_drop_rate=drop,
                                 p_remain=0.15, q_rows=qr,
                                 joint_sel=qr > 1)

        @jax.jit
        def _sel(params, carve, x2, top_k):
            return W.wan_first_selection_mask(params, cfg, x2, t2, ctx2,
                                              carve, top_k)
        density = float(_sel(params, carve, x2, tk).mean())
        t_carved = _timeit(lambda p, x, c=carve: fwd(p, c, x, tk),
                           params, x2, iters)
        ideal = t_dense * (1 - share + share * density)
        print(f"  q_rows {qr:2d}: carved {t_carved*1e3:7.1f} ms  density "
              f"{density:.3f}  ideal {ideal*1e3:7.1f}  overhead "
              f"{(t_carved/ideal-1)*100:+5.1f}%", flush=True)

    # planner ablation at the production q_rows=8: constant mask with the
    # same selection statistics, planner bypassed inside every layer
    qr = 8
    carve = W.make_wan_carve(cfg, plan, sa_drop_rate=drop, p_remain=0.15,
                             q_rows=qr, joint_sel=True)
    mask_const = jax.block_until_ready(jax.jit(
        lambda p, c, x, t: W.wan_first_selection_mask(
            p, cfg, x, t2, ctx2, c, t))(params, carve, x2, tk))
    abl_carve = dataclasses.replace(carve, sel_mask=mask_const)
    t_abl = _timeit(lambda p, x: fwd(p, abl_carve, x, tk),
                    params, x2, iters)
    t_carved = _timeit(lambda p, x: fwd(p, carve, x, tk), params, x2, iters)
    print(f"  planner cost (q8): carved {t_carved*1e3:7.1f} - ablated "
          f"{t_abl*1e3:7.1f} = {(t_carved-t_abl)*1e3:+6.1f} ms/step",
          flush=True)
