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

Memory protocol: holding all four stage geometries' executables resident
while timing the full-res dense arm exhausts the 16GB chip, so each
unique geometry is measured in its own subprocess (BENCH_PRORES_GEOM
child mode) with a clean HBM — the persistent compile cache makes the
children warm. The full-res dense arm additionally gets its OWN child
(BENCH_PRORES_ARM=dense): even with one geometry resident, the carved
q_rows=8 executable + the dense executable together sit close enough to
the 16GB ceiling that the carved run RESOURCE_EXHAUSTs after the dense
one executes. The parent composes the per-stage times into the preset
clip times.

Prints one JSON line per preset and writes BENCH_PRORES.json.
"""

import dataclasses
import json
import math
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 50
REF = {"turbo": 7.22, "flash": 8.82, "3stage": 10.35}
PRESETS = {
    # name: (drops, res_rates, step_rates)  — scripts/hyvideo_jenga_*.sh
    "turbo": ((0.7, 0.8), (0.75, 1.0), (0.5, 1.0)),
    "flash": ((0.8, 0.95), (0.75, 1.0), (0.5, 1.0)),
    "3stage": ((0.75, 0.85, 0.85), (0.5, 0.75, 1.0), (0.3, 0.5, 1.0)),
}

# 720p x 125f (pixels 1280x720, latent t=32) exactly as
# pipelines/hyvideo_t2v._stage_shapes
W_PX, H_PX, LT = 1280, 720, 32


def stage_geom(rate):
    token_full = (H_PX // 16) * (W_PX // 16)
    ph, pw = int(H_PX * rate), int(W_PX * rate)
    grid = (LT, ph // 16, pw // 16)
    lat = (LT, ph // 16 * 2, pw // 16 * 2)
    td = (grid[1] * grid[2]) / token_full
    amp = 0.0 if td == 1.0 else -math.log2(math.sqrt(td))
    return grid, lat, amp


def note(msg):
    print(f"[bench_prores] {msg}", file=sys.stderr, flush=True)


def child_main(rate, first_stage, drops, arm="main"):
    """Measure one stage geometry on a clean chip; print one JSON line.
    arm="main": t_skip + t_carved per drop. arm="dense": t_dense only
    (full-res geometry; separate child — see module docstring)."""
    import jax
    import jax.numpy as jnp

    import bench  # noqa: F401  (configures the persistent compile cache)
    from bench import synth_latents, tie_qk_projections, timeit
    from jenga_tpu.curves.blocks import build_curve_plan
    from jenga_tpu.models import hyvideo as hy

    q_rows = int(os.environ.get("BENCH_QROWS", "8"))
    dbl, sgl = 1, 2
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

    grid, lat, amp = stage_geom(rate)
    if not first_stage:
        # text_amp only applies at stage 0 (reset after the first switch,
        # reference J10), so a reduced-res NON-first stage (3stage's
        # middle) compiles with amp 0.
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

    # lower against an abstract residual: a concrete zeros() here would
    # hold a 0.7GB device buffer through the carved timings below
    res_spec = jax.ShapeDtypeStruct((1, s_pad, cfg.hidden_size),
                                    jnp.bfloat16)

    from concurrent.futures import ThreadPoolExecutor
    dcarve = dataclasses.replace(carve, sa_drop_rate=0.0)
    if arm == "dense":
        jobs = [("dense_c", full_j.lower(params, dcarve, x, jnp.int32(0)))]
    else:
        jobs = [("carved_c", full_j.lower(params, carve, x, jnp.int32(1))),
                ("skip_c", skip_j.lower(params, carve, x, res_spec))]
    note(f"child rate={rate} first={first_stage} arm={arm} grid {grid}: "
         f"compiling {len(jobs)} programs in parallel")
    with ThreadPoolExecutor(len(jobs)) as ex:
        progs = dict(zip([j[0] for j in jobs],
                         ex.map(lambda j: j[1].compile(), jobs)))

    out = {"rate": rate, "first": first_stage, "nqb": plan.seq_len // 128,
           "amp": round(amp, 4)}
    if arm == "dense":
        out["t_dense"] = timeit(
            lambda p, xx: progs["dense_c"](p, dcarve, xx, jnp.int32(0)),
            (params, x), 2)
        note(f"  dense {out['t_dense']:.2f}s")
        print(json.dumps(out), flush=True)
        return
    # carved FIRST, skip last (bench.py's order): at the full-res
    # geometry the carved q_rows=8 executable needs nearly all free HBM
    # for its temps — timing it after the skip path has allocated the
    # residual buffer and its own temps RESOURCE_EXHAUSTs, while
    # carved-then-skip fits (the skip path is tiny).
    out["t_carved"] = {}
    out["density"] = {}
    out["t_fixed"] = {}
    # realized selection density (every geometry/drop — feeds the
    # per-preset ceiling_vs_baseline) + planner-ablated (sel_mask
    # replay) arm for the decomposition (VERDICT r4 weak-3: the
    # small-stage regime needed the same carved/fixedlists/ideal split
    # as the Wan artifacts). The replay arm runs at reduced-res
    # geometries only: at full res a third trunk executable does not
    # fit next to carved+skip on 16GB; the density program (embed + one
    # block's qk + planner) is small and safe everywhere.
    decompose = rate != 1.0

    @jax.jit
    def _sel(params, carve, x, top_k):
        m = hy.hy_first_selection_mask(params, cfg, x, t, txt, mask,
                                       txt2, carve, guidance=guidance,
                                       top_k=top_k)
        b_, h_, tsb_, nb_ = m.shape
        full = jnp.ones((b_, h_, nb_ - tsb_, nb_), bool)
        return jnp.concatenate([m, full], axis=2)

    for drop in sorted(set(drops)):
        tk = int((1 - drop) * out["nqb"])
        if str(tk) in out["t_carved"]:
            continue
        out["t_carved"][str(tk)] = timeit(
            lambda p, xx, tk=tk: progs["carved_c"](p, carve, xx,
                                                   jnp.int32(tk)),
            (params, x), 2)
        note(f"  drop={drop} top_k={tk} carved {out['t_carved'][str(tk)]:.2f}s")
        mask0 = jax.block_until_ready(_sel(params, carve, x,
                                           jnp.int32(tk)))
        # video-row density (text rows are always-full by protocol)
        tsb_ = out["nqb"]
        out["density"][str(tk)] = float(
            mask0[:, :, :tsb_].astype(jnp.float32).mean())
        if decompose:
            fixed = dataclasses.replace(carve, sel_mask=mask0)
            fixed_c = full_j.lower(params, fixed, x,
                                   jnp.int32(tk)).compile()
            out["t_fixed"][str(tk)] = timeit(
                lambda p, xx, tk=tk: fixed_c(p, fixed, xx, jnp.int32(tk)),
                (params, x), 2)
            del fixed_c
            note(f"    fixedlists {out['t_fixed'][str(tk)]:.2f}s")
        del mask0
        note(f"    density {out['density'][str(tk)]:.3f}")
    residual = jnp.zeros((1, s_pad, cfg.hidden_size), jnp.bfloat16)
    out["t_skip"] = timeit(
        lambda p, xx: progs["skip_c"](p, carve, xx, residual), (params, x), 2)
    note(f"  skip {out['t_skip']:.3f}s")
    print(json.dumps(out), flush=True)


def compose_presets(geoms, depth_scale, q_rows, meas_layers):
    """Compose per-geometry stage measurements into per-preset clip times.

    Pure function of the child measurements (unit-tested on CPU in
    tests/test_bench_compose.py). ``geoms`` maps ``(res_rate, is_reduced
    _first_stage)`` to the child JSON dict (``nqb``, ``t_skip``,
    ``t_carved[str(top_k)]``, and ``t_dense`` on the full-res entry).
    Stage arithmetic follows the reference: the fixed skip schedule
    restarts at each stage switch and the switch happens AFTER the
    forward at the split step, so the split step itself still runs at
    the old stage (reference pipeline_hunyuan_video_prores.py:697-773)."""
    from jenga_tpu.diffusion.skip import (
        HYVIDEO_NON_SKIP_STEPS, fixed_compute_schedule)

    mfull = geoms[(1.0, False)]
    t_dense = mfull["t_dense"]
    step_dense = mfull["t_skip"] + (t_dense - mfull["t_skip"]) * depth_scale
    dense_clip = STEPS * step_dense
    note(f"dense {t_dense:.2f}s/slice -> {dense_clip:.0f}s/clip")

    # attention FLOP share at the full-res joint sequence (HY per-layer
    # FLOPs, 2-per-MAC convention: double AND single blocks are both
    # 24*S*d^2 linear; attention 4*S^2*d) — the same conservative
    # FLOP-share ideal model as tools/bench_wan.py (attention's TIME
    # share exceeds its FLOP share on the MXU, so measured numbers can
    # land above the "ideal")
    d_model = 3072
    txt_blocks = 2
    s1_tok = (mfull["nqb"] + txt_blocks) * 128
    a_share = 4 * s1_tok / (4 * s1_tok + 24 * d_model)

    results = []
    for name, (drops, rates, step_rates) in PRESETS.items():
        splits = [int(r * STEPS) for r in step_rates[:-1]]
        compute = fixed_compute_schedule(
            STEPS, HYVIDEO_NON_SKIP_STEPS,
            stage_starts=[s + 1 for s in splits])
        bounds = splits + [STEPS]
        carved_clip = 0.0
        ideal_clip = 0.0          # zero-overhead kernel at realized
        have_density = True       # density: the preset's ceiling
        stage_desc = []
        decomp = {}
        densities = {}
        for si, (drop, rate) in enumerate(zip(drops, rates)):
            lo = 0 if si == 0 else bounds[si - 1] + 1
            hi = bounds[si]
            if si < len(drops) - 1:
                hi = bounds[si] + 1
            lo_clamp, hi_clamp = max(0, lo), min(STEPS, hi)
            geom = geoms[(rate, si == 0 and rate != 1.0)]
            tk = int((1 - drop) * geom["nqb"])
            t_c = geom["t_carved"][str(tk)]
            ext = lambda t, g=geom: g["t_skip"] + (t - g["t_skip"]) \
                * depth_scale
            step_c = ext(t_c)
            n_c = int(compute[lo_clamp:hi_clamp].sum())
            n_s = (hi_clamp - lo_clamp) - n_c
            carved_clip += n_c * step_c + n_s * geom["t_skip"]
            stage_desc.append(
                f"s{si}:r{rate}/d{drop} {n_c}c+{n_s}s @{step_c:.2f}s")
            if str(tk) in geom.get("density", {}):
                p_sel = geom["density"][str(tk)]
                r_tok = (geom["nqb"] + txt_blocks) * 128 / s1_tok
                ideal_step = step_dense * ((1 - a_share) * r_tok
                                           + a_share * r_tok * r_tok
                                           * p_sel)
                ideal_clip += n_c * ideal_step + n_s * geom["t_skip"]
                densities[f"s{si}"] = round(p_sel, 4)
                if str(tk) in geom.get("t_fixed", {}):
                    # carved/fixedlists/ideal split (reduced-res stages;
                    # the full-res decomposition regime is the flagship
                    # bench's). Nested under the density branch: the
                    # split's ideal_s IS this stage's ideal_step, so a
                    # t_fixed entry without its density must not reuse a
                    # stale ideal from another stage.
                    fixed = ext(geom["t_fixed"][str(tk)])
                    decomp[f"s{si}"] = {
                        "carved_s": round(step_c, 3),
                        "fixedlists_s": round(fixed, 3),
                        "ideal_s": round(ideal_step, 3),
                        "planner_s": round(step_c - fixed, 3),
                        "kernel_vs_ideal_s": round(fixed - ideal_step, 3),
                    }
            else:
                have_density = False
                if str(tk) in geom.get("t_fixed", {}):
                    raise ValueError(
                        f"stage s{si} (top_k {tk}) has a t_fixed entry "
                        "but no matching density — the decomposition's "
                        "ideal term would be undefined")
        speedup = dense_clip / carved_clip
        ceiling = (dense_clip / ideal_clip / REF[name]
                   if have_density and ideal_clip > 0 else -1.0)
        results.append({
            "metric": "HunyuanVideo T2V 720px125f 50-step DiT s/clip, "
                      f"Jenga-{name} (ProRes stages {'; '.join(stage_desc)}"
                      f", joint {q_rows}-row group selection, measured at "
                      f"{meas_layers}/60 trunk depth and extrapolated; our "
                      f"dense {dense_clip:.0f}s; speedup {speedup:.2f}x, "
                      f"ref {REF[name]:.2f}x on H800)",
            "value": round(carved_clip, 2),
            "unit": "s/clip",
            "preset": name,
            "density": densities,
            # zero-overhead-kernel clip at the realized densities under
            # the same conservative FLOP-share model as the Wan
            # artifacts (attention TIME share exceeds its FLOP share on
            # the MXU, so measured can exceed "ceiling")
            "ceiling_vs_baseline": round(ceiling, 3),
            "overhead_decomposition": decomp,
            "speedup": round(speedup, 2),
            "vs_baseline": round(speedup / REF[name], 3),
        })
    return results


def main():
    if os.environ.get("BENCH_PRORES_GEOM"):
        rate_s, first_s = os.environ["BENCH_PRORES_GEOM"].split(",")
        drops = [float(d) for d in
                 os.environ["BENCH_PRORES_DROPS"].split(",") if d]
        child_main(float(rate_s), first_s == "1", drops,
                   arm=os.environ.get("BENCH_PRORES_ARM", "main"))
        return
    from jenga_tpu.diffusion.skip import (
        HYVIDEO_NON_SKIP_STEPS, fixed_compute_schedule)

    q_rows = int(os.environ.get("BENCH_QROWS", "8"))
    dbl, sgl = 1, 2
    depth_scale = (20 + 40) / (dbl + sgl)

    # unique (rate, stage0?) -> drops needed at that geometry. text_amp
    # only applies at stage 0, so a reduced-res NON-first stage (3stage's
    # middle) is a distinct geometry from the same rate at stage 0.
    needed = {}
    for drops, rates, _ in PRESETS.values():
        for si, (d, r) in enumerate(zip(drops, rates)):
            needed.setdefault((r, si == 0 and r != 1.0), set()).add(d)

    # one clean-HBM subprocess per geometry (see module docstring); the
    # full-res dense comparator gets its own extra child
    def run_child(rate, first, drops, arm):
        env = dict(os.environ,
                   BENCH_PRORES_GEOM=f"{rate},{int(first)}",
                   BENCH_PRORES_DROPS=",".join(
                       str(d) for d in sorted(drops)),
                   BENCH_PRORES_ARM=arm)
        note(f"spawning child rate={rate} first={first} arm={arm} "
             f"drops={sorted(drops)}")
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, stdout=subprocess.PIPE, text=True)
        if proc.returncode != 0:
            raise RuntimeError(
                f"child ({rate},{first},{arm}) rc={proc.returncode}")
        return json.loads(proc.stdout.strip().splitlines()[-1])

    geoms = {}
    for (rate, first), drops in sorted(needed.items()):
        geoms[(rate, first)] = run_child(rate, first, drops, "main")
    geoms[(1.0, False)]["t_dense"] = run_child(
        1.0, False, [], "dense")["t_dense"]

    lines = [json.dumps(rec) for rec in
             compose_presets(geoms, depth_scale, q_rows, dbl + sgl)]
    for ln in lines:
        print(ln, flush=True)

    import jax  # deferred: the parent stays off-device while children run
    if jax.default_backend() != "cpu":
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_PRORES.json")
        with open(out, "w") as f:
            f.write("\n".join(lines) + "\n")
        note(f"wrote {out}")


if __name__ == "__main__":
    main()
