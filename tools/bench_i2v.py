"""HunyuanVideo-I2V benchmark on real TPU (BASELINE row 3: 1088x832x125f,
113K tokens, 50 steps — ref dense 1590 s/clip, Jenga-Base 323 s/clip =
4.92x on 1xH800, `/root/reference/README.md:186-190`).

Same measure-at-reduced-depth-and-extrapolate protocol as bench.py (1
double + 2 single blocks, x20; aligned-init + smooth-latent selection
realism — see bench.py's module docstring), but on the I2V variant of the
model: in_channels 33 (latent + image latent + mask concat), token_replace
conditioning (first-frame tokens carry the t=0 modulation vector through
every block, reference `/root/reference/jenga_hyi2v.py:78-130`),
``text_blocks=4`` (the I2V kernel default, `/root/reference/hyvideo_i2v/
modules/attention_block_triton_diffres.py:308` — llava text+image tokens
fill up to 512 condition slots), and the I2V fixed skip list ``step_calc``
(24 of 50 steps computed, `/root/reference/jenga_hyi2v.py:31-32`).

Prints ONE JSON line and writes BENCH_I2V.json.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench  # noqa: E402  (configures the persistent compile cache)
from bench import synth_latents, tie_qk_projections, timeit  # noqa: E402

REF_I2V_BASE_SPEEDUP = 4.92   # 1590/323, /root/reference/README.md:186-190
STEPS = 50
STAGE_SPLIT = 25              # I2V Base step-rate-list "0.5 1.0"


def main():
    from jenga_tpu.curves.blocks import build_curve_plan
    from jenga_tpu.diffusion.skip import (
        HYI2V_STEP_CALC, fixed_compute_schedule)
    from jenga_tpu.models import hyvideo as hy

    q_rows = int(os.environ.get("BENCH_QROWS", "8"))

    kerr = -1.0
    if jax.default_backend() != "cpu":
        kerr = bench.kernel_numerics_check(q_rows)
        assert kerr < 5e-2, f"kernel numerics check failed: {kerr}"

    # 1088x832 px x 125f -> latents (32, 104, 136) -> token grid
    # (32, 52, 68) = 113,152 video tokens (the README's "113K tokens")
    grid = (32, 52, 68)
    lat = (32, 104, 136)
    dbl, sgl = 1, 2
    depth_scale = (20 + 40) / (dbl + sgl)
    cfg = dataclasses.replace(hy.HUNYUAN_VIDEO_I2V,
                              double_blocks=dbl, single_blocks=sgl)

    params = tie_qk_projections(
        hy.init_hyvideo_params(jax.random.PRNGKey(0), cfg), cfg)
    key = jax.random.PRNGKey(1)
    # in_channels 33 = 16 noisy latent + 16 image latent + 1 binary mask
    x = synth_latents(key, (1, cfg.in_channels) + lat)
    t = jnp.full((1,), 600.0, jnp.float32)
    # 512 condition tokens -> text_blocks=4 (the I2V default)
    txt = jax.random.normal(jax.random.fold_in(key, 1),
                            (1, 512, cfg.text_states_dim), jnp.float32)
    mask = jnp.ones((1, 512), jnp.int32)
    txt2 = jax.random.normal(jax.random.fold_in(key, 2),
                             (1, cfg.text_states_dim_2), jnp.float32)
    guidance = jnp.full((1,), 6000.0, jnp.float32)

    plan = build_curve_plan(grid, "gilbert", 128)
    carve = hy.make_hy_carve(cfg, plan, sa_drop_rate=0.75, p_remain=0.05,
                             txt_block_num=4, q_rows=q_rows,
                             joint_sel=q_rows > 1)
    dense_carve = dataclasses.replace(carve, sa_drop_rate=0.0)
    nqb = plan.seq_len // 128
    tk75 = jnp.int32(int(0.25 * nqb))
    tk85 = jnp.int32(int(0.15 * nqb))

    @jax.jit
    def full_j(params, carve, x, top_k):
        img, txth, aux = hy.hyvideo_embed(params, cfg, x, t, txt, mask,
                                          txt2, carve, guidance)
        img2 = hy.hyvideo_trunk(params, cfg, img, txth, aux, carve,
                                top_k=top_k)
        return hy.hyvideo_head(params, cfg, img2, aux, carve), img2 - img

    @jax.jit
    def skipped_j(params, carve, x, residual):
        img, txth, aux = hy.hyvideo_embed(params, cfg, x, t, txt, mask,
                                          txt2, carve, guidance)
        return hy.hyvideo_head(params, cfg, img + residual, aux, carve)

    def note(msg):
        print(f"[bench_i2v] {msg}", file=sys.stderr, flush=True)

    iters = 2
    residual = jnp.zeros((1, -(-plan.seq_len // 128) * 128,
                          cfg.hidden_size), jnp.bfloat16)

    # the three 113k-token programs compile concurrently (the remote
    # compile service parallelizes) — same pattern as bench.py
    note("lowering + compiling 3 programs in parallel")
    from concurrent.futures import ThreadPoolExecutor
    lowered = [
        full_j.lower(params, carve, x, tk75),
        full_j.lower(params, dense_carve, x, jnp.int32(0)),
        skipped_j.lower(params, carve, x, residual),
    ]
    with ThreadPoolExecutor(3) as ex:
        carved_c, dense_c, skip_c = list(ex.map(lambda lw: lw.compile(),
                                                lowered))

    def carved75(p, xx):
        return carved_c(p, carve, xx, tk75)

    def carved85(p, xx):
        return carved_c(p, carve, xx, tk85)

    def dense_fn(p, xx):
        return dense_c(p, dense_carve, xx, jnp.int32(0))

    def skipped_fn(p, xx):
        return skip_c(p, carve, xx, residual)

    note("timing carved drop=0.75")
    t_c75 = timeit(carved75, (params, x), iters)
    note(f"carved75 {t_c75:.2f}s; timing carved drop=0.85")
    t_c85 = timeit(carved85, (params, x), iters)
    note(f"carved85 {t_c85:.2f}s; timing dense")
    t_dense = timeit(dense_fn, (params, x), iters)
    note(f"dense {t_dense:.2f}s; timing skip path")
    t_skip = timeit(skipped_fn, (params, x), iters)
    note(f"skip {t_skip:.3f}s")

    step_c75 = t_skip + (t_c75 - t_skip) * depth_scale
    step_c85 = t_skip + (t_c85 - t_skip) * depth_scale
    step_dense = t_skip + (t_dense - t_skip) * depth_scale

    compute = fixed_compute_schedule(STEPS, HYI2V_STEP_CALC,
                                     stage_starts=[STAGE_SPLIT + 1])
    n75 = int(compute[:STAGE_SPLIT + 1].sum())
    n85 = int(compute[STAGE_SPLIT + 1:].sum())
    n_skip = STEPS - n75 - n85

    carved_clip = n75 * step_c75 + n85 * step_c85 + n_skip * t_skip
    dense_clip = STEPS * step_dense
    speedup = dense_clip / carved_clip

    sel_desc = (f"joint {q_rows}-row group selection" if q_rows > 1
                else "per-row selection")
    line = json.dumps({
        "metric": "HunyuanVideo-I2V 1088x832x125f (113K tokens) 50-step DiT "
                  "s/clip, Jenga-Base carving (drop .75/.85, {}, "
                  "text_blocks=4, token_replace) + I2V step_calc skip "
                  "({}+{} computed, {} skipped), measured at {}/60 trunk "
                  "depth on one v5e and extrapolated; our dense {:.0f}s; "
                  "speedup {:.2f}x (ref 4.92x on H800); per-step carved "
                  "{:.2f}/{:.2f}s dense {:.2f}s skip {:.3f}s".format(
                      sel_desc, n75, n85, n_skip, dbl + sgl, dense_clip,
                      speedup, step_c75, step_c85, step_dense, t_skip),
        "value": round(carved_clip, 2),
        "unit": "s/clip",
        "kernel_max_err": round(kerr, 5),
        "q_rows": q_rows,
        "speedup": round(speedup, 2),
        "vs_baseline": round(speedup / REF_I2V_BASE_SPEEDUP, 3),
    })
    print(line, flush=True)
    if jax.default_backend() != "cpu":
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_I2V.json")
        with open(out, "w") as f:
            f.write(line + "\n")
        note(f"wrote {out}")


if __name__ == "__main__":
    main()
