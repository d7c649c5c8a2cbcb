"""On-chip carved-vs-dense fidelity: HY-I2V token_replace trajectory.

VERDICT r4 item 5a: first-frame conditioning interacts with carving —
token_replace re-pins the clean image latent as frame 0 after every
solver step and the model modulates first-frame tokens at t=0, while the
planner's first-frame/text blocks are always-on — and that interaction
had never been fidelity-measured. This runs the full I2V trajectory
(`pipelines/hyvideo_i2v.generate_i2v`, reference
`/root/reference/jenga_hyi2v.py:123-204`) carved vs dense at the same
seed/schedule and appends three rows to FIDELITY.json:

  * token_replace joint q8 carved vs dense
  * token_replace per-row carved vs dense
  * joint q8 vs per-row (granularity cost alone)

Same protocol caveat as every FIDELITY row: random weights make
pooled-QK selection near-random (the worst case); trained checkpoints'
local attention does better (reference reports VBench within ~1%).
BENCH_QUICK=1 runs a tiny CPU smoke (no artifact write).
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
from jenga_tpu.pipelines.hyvideo_i2v import HYI2VOptions, HYVideoI2VPipeline

QUICK = bool(os.environ.get("BENCH_QUICK"))
if QUICK:
    jax.config.update("jax_platforms", "cpu")

# token_replace keeps the T2V 16-channel input (the conditioning rides as
# a frame replacement, not extra channels); production head geometry at
# the depth-validated 2+4 reduced trunk (DEPTH_OFFCEILING.json)
cfg = dataclasses.replace(hy.HUNYUAN_VIDEO_T2V, double_blocks=2,
                          single_blocks=4,
                          i2v_condition_type="token_replace")
if QUICK:
    cfg = hy.HYVideoConfig(hidden_size=128, heads_num=2, double_blocks=1,
                           single_blocks=2, rope_dim_list=(16, 24, 24),
                           text_states_dim=64, text_states_dim_2=24,
                           refiner_depth=1, guidance_embed=True,
                           dtype="float32",
                           i2v_condition_type="token_replace")
params = hy.init_hyvideo_params(jax.random.PRNGKey(0), cfg)
# zero-init final layer would make the trajectory vacuous (see
# tools/fidelity_run.py); small random head instead
params["final_layer"]["linear"]["w"] = 0.02 * jax.random.normal(
    jax.random.PRNGKey(99), params["final_layer"]["linear"]["w"].shape,
    jnp.float32)
pipe = HYVideoI2VPipeline(cfg, params)

key = jax.random.PRNGKey(1)
txt = jax.random.normal(key, (100, cfg.text_states_dim), jnp.float32)
mask = jnp.ones((100,), jnp.int32)
txt2 = jax.random.normal(jax.random.fold_in(key, 1),
                         (cfg.text_states_dim_2,), jnp.float32)

size, frames, steps = (960, 512), 33, 20
if QUICK:
    size, frames, steps = (384, 256), 5, 4

base = HYI2VOptions(
    size=size, video_length=frames, num_inference_steps=steps,
    sa_drop_rates=(0.75, 0.85), p_remain=0.3,
    res_rate_list=(1.0,), step_rate_list=(1.0,),
    scheduler_shift_list=(7.0,), txt_block_num=2,
    i2v_condition_type="token_replace", i2v_stability=True,
    enable_skip=True,
    non_skip_steps=(0, 1, 2, 3, 4, 5, 10, 11, 12, 15, 19) if not QUICK
    else (0, 1, 3),
    q_group=8, joint_sel=True, seed=7)
per_row = dataclasses.replace(base, q_group=1, joint_sel=False)
dense = dataclasses.replace(base, sa_drop_rates=(0.0, 0.0), q_group=1,
                            joint_sel=False)

# one clean conditioning latent per ProRes stage (single stage here):
# synthetic but VAE-scaled-magnitude
lat_h, lat_w = size[1] // 8, size[0] // 8
img_lat = 0.5 * jax.random.normal(jax.random.fold_in(key, 2),
                                  (cfg.in_channels, 1, lat_h, lat_w),
                                  jnp.float32)


def run(opts):
    return jnp.asarray(
        pipe.generate_i2v([img_lat], txt, mask, txt2, opts, decode=False),
        jnp.float32)


def report(a, b, config):
    mse = float(jnp.mean((a - b) ** 2))
    rel = float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-8))
    r = {"final_mse": mse, "relative_error": rel,
         "dense_norm": float(jnp.linalg.norm(b)), "config": config}
    print(json.dumps(r))
    return r


lat_dense = run(dense)
lat_q8 = run(base)
lat_pr = run(per_row)

# token_replace invariant: frame 0 is the re-pinned clean latent in BOTH
# arms, so carving error must live in frames 1.. only
f0_err = float(jnp.linalg.norm(lat_q8[:, :1] - lat_dense[:, :1]))
assert f0_err < 1e-3, f"frame-0 pin broken under carving: {f0_err}"

desc = ("QUICK-smoke (tiny cfg, artifact not written)" if QUICK else
        "hy-i2v token_replace(3072x24h, 2+4 trunk) 960x512x33f 20 steps "
        "full-res stage, drop .75/.85 p_remain .3, fixed-skip 11/20 "
        "computed, i2v_stability, random weights + synthetic clean "
        "frame-0 latent, matched seed")
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
    print(f"appended 3 hy-i2v rows to {out}", file=sys.stderr)
