"""On-chip carved-vs-dense fidelity: Wan-14B ARCHITECTURE trajectory.

VERDICT r4 item 5b: all presets pin q_group=8 on the 14B architecture
too (dim 5120, 40 heads, cross-attention per block), but every committed
fidelity row ran the 1.3B (1536x12h) or HY architecture. This runs the
Jenga-Base trajectory on WAN_T2V_14B at reduced trunk depth (4 of 40
layers — the same depth-reduction protocol as BENCH_WAN14B.json, whose
depth-linearity evidence is DEPTH_OFFCEILING_WAN14B.json) and appends:

  * 14b-arch joint q8 carved vs dense
  * 14b-arch per-row carved vs dense
  * joint q8 vs per-row (granularity cost alone)

Random-weights caveat as in tools/fidelity_run.py. BENCH_QUICK=1 runs a
tiny CPU smoke (no artifact write).
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

from jenga_tpu.models.wan import WAN_T2V_14B, WanConfig, init_wan_params
from jenga_tpu.pipelines.loss_eval import carving_fidelity_report
from jenga_tpu.pipelines.wan_t2v import WanT2VOptions, WanT2VPipeline

QUICK = bool(os.environ.get("BENCH_QUICK"))
if QUICK:
    jax.config.update("jax_platforms", "cpu")

cfg = dataclasses.replace(WAN_T2V_14B, num_layers=4)
if QUICK:
    cfg = WanConfig(dim=128, ffn_dim=256, freq_dim=32, num_heads=2,
                    num_layers=2, text_dim=64, text_len=16,
                    dtype="float32")
params = init_wan_params(jax.random.PRNGKey(0), cfg)
params["head"]["linear"]["w"] = 0.02 * jax.random.normal(
    jax.random.PRNGKey(99), params["head"]["linear"]["w"].shape,
    jnp.float32)
pipe = WanT2VPipeline(cfg, params)

key = jax.random.PRNGKey(1)
ctx = jax.random.normal(key, (77, cfg.text_dim), jnp.float32)
ctx_null = jax.random.normal(jax.random.fold_in(key, 1),
                             (77, cfg.text_dim), jnp.float32)

size, frames, steps = (832, 480), 33, 20
if QUICK:
    size, frames, steps = (128, 64), 5, 4
base = WanT2VOptions(size=size, frame_num=frames, sampling_steps=steps,
                     teacache_thresh=None, seed=7)
carved_q8 = dataclasses.replace(base, sa_drop_rates=(0.75, 0.85),
                                p_remain=0.9, q_group=8, joint_sel=True)
carved_pr = dataclasses.replace(carved_q8, q_group=1, joint_sel=False)
dense = dataclasses.replace(base, sa_drop_rates=(0.0, 0.0))

desc = ("QUICK-smoke (tiny cfg, artifact not written)" if QUICK else
        "wan-14b-arch (5120x40h, 4/40 trunk) 832x480x33f 20 steps, "
        "Jenga-Base drop .75/.85 p_remain .9, random weights, matched "
        "seed")
rows = []
r = carving_fidelity_report(pipe, None, ctx, ctx_null, carved_q8, dense)
r["config"] = f"{desc} — joint q_group=8 vs dense"
rows.append(r)
print(json.dumps(r))
r = carving_fidelity_report(pipe, None, ctx, ctx_null, carved_pr, dense)
r["config"] = f"{desc} — per-row selection vs dense"
rows.append(r)
print(json.dumps(r))
r = carving_fidelity_report(pipe, None, ctx, ctx_null, carved_q8,
                            carved_pr)
r["config"] = "same — joint q_group=8 vs per-row (granularity cost alone)"
rows.append(r)
print(json.dumps(r))

if jax.default_backend() != "cpu":
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "FIDELITY.json")
    with open(out, "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"appended 3 wan-14b rows to {out}", file=sys.stderr)
