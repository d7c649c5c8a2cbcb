"""On-chip carved-vs-dense fidelity run, HunyuanVideo architecture.

Counterpart of tools/fidelity_run.py for the HY production path (VERDICT
r3 weak-3): the flagship headline is HY, but FIDELITY.json previously
carried Wan rows only. This runs the full ProRes *Turbo* trajectory —
reduced-resolution stage 0 with in-kernel text amplification
(scale_txt_amp, txt_block_num=2), the stage switch (x̂₀ → interpolate →
re-noise → re-shifted schedule), and the fixed-skip residual-reuse
schedule — at reduced trunk depth, and appends three HY rows:

  * ``hy-turbo`` joint q8 carved vs dense  (carving + granularity cost)
  * ``hy-turbo`` per-row carved vs dense   (carving cost alone)
  * ``hy-turbo`` joint q8 vs per-row       (granularity cost alone)

Reference protocol being mirrored: the validation-loss pipeline
`/root/reference/hyvideo/diffusion/pipelines/
pipeline_hunyuan_video_loss.py:962-1058` (per-trajectory latent MSE) run
across the ProRes switch block (`pipeline_hunyuan_video_prores.py:
697-773`). Both arms share the same seed, stages, schedule, skip list,
and text amplification; only the attention carving differs.

As with the Wan rows, random weights make pooled-QK selection
near-random — the worst case for carving fidelity; trained checkpoints'
local attention does better (reference reports VBench within ~1%).
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from jenga_tpu.utils.compile_cache import enable_repo_cache

enable_repo_cache(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax.numpy as jnp

from jenga_tpu.models import hyvideo as hy
from jenga_tpu.pipelines.hyvideo_t2v import HYT2VOptions, HYVideoT2VPipeline

QUICK = bool(os.environ.get("BENCH_QUICK"))   # CPU smoke: tiny everything
if QUICK:
    # the image's sitecustomize ignores JAX_PLATFORMS; force CPU before
    # backend init so smoke runs never touch (or contend for) the chip
    jax.config.update("jax_platforms", "cpu")

# Production head geometry (3072 wide, 24 heads, d=128) at reduced trunk
# depth (2+4, the production 1:2 double:single mix) — the same
# depth-reduction protocol as bench.py, which the off-ceiling depth
# artifact (DEPTH_OFFCEILING.json) validates as depth-linear.
cfg = dataclasses.replace(hy.HUNYUAN_VIDEO_T2V, double_blocks=2,
                          single_blocks=4)
if QUICK:
    cfg = hy.HYVideoConfig(hidden_size=128, heads_num=2, double_blocks=1,
                           single_blocks=2, rope_dim_list=(16, 24, 24),
                           text_states_dim=64, text_states_dim_2=24,
                           refiner_depth=1, guidance_embed=True,
                           dtype="float32")
params = hy.init_hyvideo_params(jax.random.PRNGKey(0), cfg)
# final layer is zero-initialized (reference parity); random weights would
# make every velocity 0 and the comparison vacuous — give it a small
# random weight so the trajectory is non-degenerate (same protocol as
# tools/fidelity_run.py).
params["final_layer"]["linear"]["w"] = 0.02 * jax.random.normal(
    jax.random.PRNGKey(99), params["final_layer"]["linear"]["w"].shape,
    jnp.float32)
pipe = HYVideoT2VPipeline(cfg, params)

key = jax.random.PRNGKey(1)
txt = jax.random.normal(key, (100, cfg.text_states_dim), jnp.float32)
mask = jnp.ones((100,), jnp.int32)
txt2 = jax.random.normal(jax.random.fold_in(key, 1),
                         (cfg.text_states_dim_2,), jnp.float32)

# Turbo preset geometry at 960x512x33f: stage 0 runs 720x384 (res 0.75,
# token_diff < 1 so text_amp is ACTIVE), stage 1 full res; 20 steps split
# 10/20 across the switch; production-like fixed-skip list scaled to 20
# steps (compute the early steps + the non-skip anchors).
turbo = HYT2VOptions(
    size=(960, 512), video_length=33, num_inference_steps=20,
    sa_drop_rates=(0.7, 0.8), p_remain=0.3,
    res_rate_list=(0.75, 1.0), step_rate_list=(0.5, 1.0),
    scheduler_shift_list=(7.0, 9.0), scale_txt_amp=1.0, txt_block_num=2,
    enable_skip=True, non_skip_steps=(0, 1, 2, 3, 4, 5, 10, 11, 12, 15, 19),
    q_group=8, joint_sel=True, seed=7)
if QUICK:
    turbo = dataclasses.replace(
        turbo, size=(384, 256), video_length=5, num_inference_steps=4,
        step_rate_list=(0.5, 1.0), non_skip_steps=(0, 1, 3))
per_row = dataclasses.replace(turbo, q_group=1, joint_sel=False)
dense = dataclasses.replace(turbo, sa_drop_rates=(0.0, 0.0), q_group=1,
                            joint_sel=False)


def run(opts):
    return jnp.asarray(
        pipe.generate(txt, mask, txt2, opts, decode=False), jnp.float32)


def report(a, b, config):
    mse = float(jnp.mean((a - b) ** 2))
    rel = float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-8))
    r = {"final_mse": mse, "relative_error": rel,
         "dense_norm": float(jnp.linalg.norm(b)), "config": config}
    print(json.dumps(r))
    return r


lat_dense = run(dense)
lat_q8 = run(turbo)
lat_pr = run(per_row)

desc = ("QUICK-smoke (tiny cfg, artifact not written)" if QUICK else
        "hy-arch(3072x24h, 2+4 trunk) turbo 960x512x33f 20 steps, "
        "stages res .75(text_amp on)/1.0 switch@10, drop .7/.8 "
        "p_remain .3, fixed-skip 11/20 computed, random weights, "
        "matched seed")
rows = [
    report(lat_q8, lat_dense, f"{desc} — joint q_group=8 vs dense"),
    report(lat_pr, lat_dense, f"{desc} — per-row selection vs dense"),
    report(lat_q8, lat_pr, "same — joint q_group=8 vs per-row "
                           "(granularity cost alone)"),
]

if jax.default_backend() != "cpu":
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "FIDELITY.json")
    with open(out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"appended 3 hy rows to {out}", file=sys.stderr)
