"""HY Turbo / Flash / 3Stage preset benchmark on real TPU (BASELINE rows
3-5 of the HY table: ref 7.22x / 8.82x / 10.35x on 1xH800,
`/root/reference/README.md:79-82`).

Exercises the ProRes machinery's perf story: each preset runs its early
denoise steps at reduced spatial resolution (res_rate_list) with its own
drop rate and a stage-0 text-amplitude bias, then switches up. This bench
times one carved step per (stage grid, text_amp) at the production
720p x 125f config and composes the published step splits
(step_rate_list) with the reference's exact fixed skip schedule — the
same measure-at-reduced-depth-and-extrapolate protocol as bench.py
(1 double + 2 single blocks, x20; see bench.py's module docstring for
the aligned-init/smooth-latent selection realism and the honesty stats).

The dense comparator is the same 50-step full-resolution dense clip as
bench.py — exactly the reference's denominator (dense never runs
reduced-res stages).

Stage shapes/text-amp follow jenga_tpu/pipelines/hyvideo_t2v.py
(`_stage_shapes`; amp = -log2(sqrt(token_diff)) at stage 0 only), which
mirrors `/root/reference/hyvideo/diffusion/pipelines/
pipeline_hunyuan_video_prores.py:417-424,569-599`.

Prints one JSON line per preset and writes BENCH_PRORES.json.
"""

import dataclasses
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench  # noqa: E402  (configures the persistent compile cache)
from bench import synth_latents, tie_qk_projections, timeit  # noqa: E402

STEPS = 50
REF = {"turbo": 7.22, "flash": 8.82, "3stage": 10.35}
PRESETS = {
    # name: (drops, res_rates, step_rates)  — scripts/hyvideo_jenga_*.sh
    "turbo": ((0.7, 0.8), (0.75, 1.0), (0.5, 1.0)),
    "flash": ((0.8, 0.95), (0.75, 1.0), (0.5, 1.0)),
    "3stage": ((0.75, 0.85, 0.85), (0.5, 0.75, 1.0), (0.3, 0.5, 1.0)),
}


def main():
    from jenga_tpu.curves.blocks import build_curve_plan
    from jenga_tpu.diffusion.skip import (
        HYVIDEO_NON_SKIP_STEPS, fixed_compute_schedule)
    from jenga_tpu.models import hyvideo as hy

    q_rows = int(os.environ.get("BENCH_QROWS", "8"))
    dbl, sgl = 1, 2
    depth_scale = (20 + 40) / (dbl + sgl)
    cfg = dataclasses.replace(hy.HUNYUAN_VIDEO_T2V,
                              double_blocks=dbl, single_blocks=sgl)
    params = tie_qk_projections(
        hy.init_hyvideo_params(jax.random.PRNGKey(0), cfg), cfg)
    key = jax.random.PRNGKey(1)
    txt = jax.random.normal(jax.random.fold_in(key, 1),
                            (1, 256, cfg.text_states_dim), jnp.float32)
    mask = jnp.ones((1, 256), jnp.int32)
    txt2 = jax.random.normal(jax.random.fold_in(key, 2),
                             (1, cfg.text_states_dim_2), jnp.float32)
    t = jnp.full((1,), 600.0, jnp.float32)
    guidance = jnp.full((1,), 6000.0, jnp.float32)

    # stage geometry: 720p x 125f (pixels 1280x720, latent t=32) exactly as
    # pipelines/hyvideo_t2v._stage_shapes
    w_px, h_px, lt = 1280, 720, 32
    full_grid = (lt, h_px // 16, w_px // 16)               # (32, 45, 80)
    token_full = full_grid[1] * full_grid[2]

    def stage_geom(rate):
        ph, pw = int(h_px * rate), int(w_px * rate)
        grid = (lt, ph // 16, pw // 16)
        lat = (lt, ph // 16 * 2, pw // 16 * 2)
        td = (grid[1] * grid[2]) / token_full
        amp = 0.0 if td == 1.0 else -math.log2(math.sqrt(td))
        return grid, lat, amp

    def note(msg):
        print(f"[bench_prores] {msg}", file=sys.stderr, flush=True)

    # unique (rate, stage0?) -> programs + inputs. text_amp only applies
    # at stage 0 (reset after the first switch, reference J10), so a
    # reduced-res NON-first stage (3stage's middle) compiles with amp 0.
    def build(rate, first_stage):
        grid, lat, amp = stage_geom(rate)
        if not first_stage:
            amp = 0.0
        plan = build_curve_plan(grid, "gilbert", 128)
        carve = hy.make_hy_carve(cfg, plan, sa_drop_rate=0.75,
                                 p_remain=0.05, text_amp=amp,
                                 txt_block_num=2, q_rows=q_rows,
                                 joint_sel=q_rows > 1)
        x = synth_latents(jax.random.fold_in(key, hash(rate) % 97),
                          (1, cfg.in_channels) + lat)

        @jax.jit
        def full_j(params, carve, x, top_k):
            img, txth, aux = hy.hyvideo_embed(params, cfg, x, t, txt, mask,
                                              txt2, carve, guidance)
            img2 = hy.hyvideo_trunk(params, cfg, img, txth, aux, carve,
                                    top_k=top_k)
            return hy.hyvideo_head(params, cfg, img2, aux, carve), img2 - img

        s_pad = -(-plan.seq_len // 128) * 128

        @jax.jit
        def skip_j(params, carve, x, residual):
            img, txth, aux = hy.hyvideo_embed(params, cfg, x, t, txt, mask,
                                              txt2, carve, guidance)
            return hy.hyvideo_head(params, cfg, img + residual, aux, carve)

        residual = jnp.zeros((1, s_pad, cfg.hidden_size), jnp.bfloat16)
        return dict(grid=grid, nqb=plan.seq_len // 128, amp=amp,
                    carve=carve, x=x, residual=residual,
                    full_j=full_j, skip_j=skip_j)

    # measure each unique stage geometry once; lower everything first and
    # compile in parallel (the remote compile service parallelizes — four
    # serial 100k-token compiles dominated wall time otherwise)
    geoms = {}      # (rate, first) -> dict with measured times filled in
    needed = set()
    for drops, rates, _ in PRESETS.values():
        for si, r in enumerate(rates):
            needed.add((r, si == 0 and r != 1.0))
    from concurrent.futures import ThreadPoolExecutor
    jobs = []       # (key, slot, lowered)
    for rate, first in sorted(needed):
        m = build(rate, first)
        geoms[(rate, first)] = m
        note(f"lowering stage rate={rate} first={first} grid {m['grid']}")
        jobs.append(((rate, first), "carved_c", m["full_j"].lower(
            params, m["carve"], m["x"], jnp.int32(1))))
        jobs.append(((rate, first), "skip_c", m["skip_j"].lower(
            params, m["carve"], m["x"], m["residual"])))
        if rate == 1.0 and not first:
            jobs.append(((rate, first), "dense_c", m["full_j"].lower(
                params,
                dataclasses.replace(m["carve"], sa_drop_rate=0.0),
                m["x"], jnp.int32(0))))
    note(f"compiling {len(jobs)} programs in parallel")
    with ThreadPoolExecutor(len(jobs)) as ex:
        compiled = list(ex.map(lambda j: j[2].compile(), jobs))
    for (gkey, slot, _), comp in zip(jobs, compiled):
        geoms[gkey][slot] = comp

    for gkey, m in geoms.items():
        carve, x, residual = m["carve"], m["x"], m["residual"]
        m["carved"] = lambda tk, m=m, carve=carve, x=x: timeit(
            lambda p, xx: m["carved_c"](p, carve, xx, jnp.int32(tk)),
            (params, x), 2)
        m["skip"] = lambda m=m, carve=carve, x=x, residual=residual: timeit(
            lambda p, xx: m["skip_c"](p, carve, xx, residual),
            (params, x), 2)
        if "dense_c" in m:
            dcarve = dataclasses.replace(carve, sa_drop_rate=0.0)
            m["dense"] = lambda m=m, dcarve=dcarve, x=x: timeit(
                lambda p, xx: m["dense_c"](p, dcarve, xx, jnp.int32(0)),
                (params, x), 2)
        m["t_skip"] = m["skip"]()
        note(f"  grid {m['grid']} skip {m['t_skip']:.3f}s")
        m["t_carved"] = {}

    # dense comparator: full-res only (the reference's denominator)
    mfull = geoms[(1.0, False)]
    t_dense = mfull["dense"]()
    step_dense = mfull["t_skip"] + (t_dense - mfull["t_skip"]) * depth_scale
    dense_clip = STEPS * step_dense
    note(f"dense {t_dense:.2f}s/slice -> {dense_clip:.0f}s/clip")

    results = {}
    lines = []
    for name, (drops, rates, step_rates) in PRESETS.items():
        splits = [int(r * STEPS) for r in step_rates[:-1]]
        compute = fixed_compute_schedule(
            STEPS, HYVIDEO_NON_SKIP_STEPS,
            stage_starts=[s + 1 for s in splits])
        bounds = splits + [STEPS]
        carved_clip = 0.0
        stage_desc = []
        for si, (drop, rate) in enumerate(zip(drops, rates)):
            lo = 0 if si == 0 else bounds[si - 1] + 1
            hi = bounds[si]
            # the switch happens AFTER the forward at the split step, so
            # the split step itself still runs at the old stage (bench.py
            # convention, reference prores:697-773)
            if si < len(drops) - 1:
                hi = bounds[si] + 1
            lo_clamp, hi_clamp = max(0, lo), min(STEPS, hi)
            geom = geoms[(rate, si == 0 and rate != 1.0)]
            tk = int((1 - drop) * geom["nqb"])
            if tk not in geom["t_carved"]:
                geom["t_carved"][tk] = geom["carved"](tk)
                note(f"  {name} stage{si} rate={rate} drop={drop} "
                     f"carved {geom['t_carved'][tk]:.2f}s")
            t_c = geom["t_carved"][tk]
            step_c = geom["t_skip"] + (t_c - geom["t_skip"]) * depth_scale
            n_c = int(compute[lo_clamp:hi_clamp].sum())
            n_s = (hi_clamp - lo_clamp) - n_c
            carved_clip += n_c * step_c + n_s * geom["t_skip"]
            stage_desc.append(
                f"s{si}:r{rate}/d{drop} {n_c}c+{n_s}s @{step_c:.2f}s")
        speedup = dense_clip / carved_clip
        rec = {
            "metric": "HunyuanVideo T2V 720px125f 50-step DiT s/clip, "
                      f"Jenga-{name} (ProRes stages {'; '.join(stage_desc)}"
                      f", joint {q_rows}-row group selection, measured at "
                      f"{dbl + sgl}/60 trunk depth and extrapolated; our "
                      f"dense {dense_clip:.0f}s; speedup {speedup:.2f}x, "
                      f"ref {REF[name]:.2f}x on H800)",
            "value": round(carved_clip, 2),
            "unit": "s/clip",
            "preset": name,
            "speedup": round(speedup, 2),
            "vs_baseline": round(speedup / REF[name], 3),
        }
        results[name] = rec
        lines.append(json.dumps(rec))
        print(lines[-1], flush=True)

    if jax.default_backend() != "cpu":
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_PRORES.json")
        with open(out, "w") as f:
            f.write("\n".join(lines) + "\n")
        note(f"wrote {out}")


if __name__ == "__main__":
    main()
