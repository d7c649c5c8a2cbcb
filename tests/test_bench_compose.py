"""Unit tests for the multi-stage bench compositions (tools/bench_prores.py
and tools/bench_wan.py's Turbo preset).

The on-chip children only produce per-geometry stage timings; turning
those into per-preset clip times is pure arithmetic (stage step ranges,
the switch-after-forward convention, the fixed skip schedule restarting
per stage, depth extrapolation). That arithmetic carries the three
HY-preset BASELINE rows and both Wan Turbo rows, so it is pinned here on
CPU with synthetic timings (reference conventions:
`/root/reference/hyvideo/diffusion/pipelines/
pipeline_hunyuan_video_prores.py:697-773`,
`/root/reference/jenga_wan.py:190-245`).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import bench_prores  # noqa: E402
import bench_wan  # noqa: E402

from jenga_tpu.diffusion.skip import (  # noqa: E402
    HYVIDEO_NON_SKIP_STEPS, fixed_compute_schedule)


def synth_geoms(t_skip=0.05, t_dense=4.0):
    """Synthetic child outputs for every geometry bench_prores spawns.

    Carved time is made proportional to top_k so the expected clip time
    can be recomputed independently below.
    """
    geoms = {}
    needed = {}
    for drops, rates, _ in bench_prores.PRESETS.values():
        for si, (d, r) in enumerate(zip(drops, rates)):
            needed.setdefault((r, si == 0 and r != 1.0), set()).add(d)
    for (rate, first), drops in needed.items():
        grid, _, _ = bench_prores.stage_geom(rate)
        nqb = -(-grid[0] * grid[1] * grid[2] // 128)
        g = {"rate": rate, "first": first, "nqb": nqb, "t_skip": t_skip,
             "t_carved": {}}
        for d in drops:
            tk = int((1 - d) * nqb)
            g["t_carved"][str(tk)] = t_skip + 0.002 * tk
        if (rate, first) == (1.0, False):
            g["t_dense"] = t_dense
        geoms[(rate, first)] = g
    return geoms


def test_compose_covers_all_presets_and_steps():
    geoms = synth_geoms()
    results = bench_prores.compose_presets(geoms, depth_scale=20.0,
                                           q_rows=8, meas_layers=3)
    names = [r["preset"] for r in results]
    assert names == list(bench_prores.PRESETS)
    for r in results:
        assert r["value"] > 0
        assert r["speedup"] > 1.0
        assert r["vs_baseline"] == round(
            r["speedup"] / bench_prores.REF[r["preset"]], 3)


def test_compose_turbo_matches_hand_rollout():
    """Recompute the turbo preset clip time by walking the 50 steps one
    by one with an independent stage/skip rollout and compare."""
    t_skip, depth_scale = 0.05, 20.0
    geoms = synth_geoms(t_skip=t_skip)
    results = {r["preset"]: r for r in bench_prores.compose_presets(
        geoms, depth_scale=depth_scale, q_rows=8, meas_layers=3)}

    drops, rates, step_rates = bench_prores.PRESETS["turbo"]
    split = int(step_rates[0] * 50)                   # 25
    compute = fixed_compute_schedule(50, HYVIDEO_NON_SKIP_STEPS,
                                     stage_starts=[split + 1])
    total = 0.0
    for idx in range(50):
        # switch AFTER the forward at the split step -> step `split`
        # itself still runs at stage 0
        si = 0 if idx <= split else 1
        geom = geoms[(rates[si], si == 0 and rates[si] != 1.0)]
        if compute[idx]:
            tk = int((1 - drops[si]) * geom["nqb"])
            t_c = geom["t_carved"][str(tk)]
            total += geom["t_skip"] + (t_c - geom["t_skip"]) * depth_scale
        else:
            total += geom["t_skip"]
    assert results["turbo"]["value"] == pytest.approx(total, rel=1e-6)


def _wan_stage(t_carved, t_skip, s_tokens, density, t_dense=None):
    m = {"t_carved": t_carved, "t_skip": t_skip, "s_tokens": s_tokens,
         "density": density}
    if t_dense is not None:
        m["t_dense"] = t_dense
    return m


def test_wan_turbo_compose_matches_hand_rollout():
    """Stage split: switch after the forward at step 25 -> 26 steps at
    stage 0, 24 at stage 1; TeaCache computes 25 of 50, pro-rated 13/12."""
    m0 = _wan_stage(1.0, 0.05, 18432, 0.30)
    m1 = _wan_stage(1.9, 0.05, 32768, 0.21, t_dense=4.2)
    c = bench_wan.compose_turbo(m0, m1, depth_scale=1.0, dim=1536,
                                ffn_dim=8960, text_len=512,
                                ref_speedup=6.16)
    assert (c["k0"], c["k1"]) == (26, 24)
    assert (c["n0"], c["n1"]) == (13, 12)
    total = (13 * 1.0 + (26 - 13) * 0.05
             + 12 * 1.9 + (24 - 12) * 0.05)
    assert c["carved_clip"] == pytest.approx(total)
    assert c["dense_clip"] == pytest.approx(50 * 4.2)
    assert c["speedup"] == pytest.approx(c["dense_clip"] / total)
    assert c["vs_baseline"] == pytest.approx(c["speedup"] / 6.16)


def test_wan_turbo_depth_extrapolation_scales_trunk_only():
    """depth_scale multiplies only the trunk delta above the skip path
    (embed+head), same rule as the Base bench and bench.py."""
    m0 = _wan_stage(1.0, 0.05, 18432, 0.30)
    m1 = _wan_stage(1.9, 0.05, 32768, 0.21, t_dense=4.2)
    kw = dict(dim=5120, ffn_dim=13824, text_len=512, ref_speedup=6.12)
    c1 = bench_wan.compose_turbo(m0, m1, depth_scale=1.0, **kw)
    c10 = bench_wan.compose_turbo(m0, m1, depth_scale=10.0, **kw)
    assert c10["step_c0"] == pytest.approx(0.05 + (1.0 - 0.05) * 10)
    assert c10["step_dense"] == pytest.approx(0.05 + (4.2 - 0.05) * 10)
    # skip-path cost is NOT scaled: skipped steps cost the same per clip
    skip_part = (26 - c1["n0"]) * 0.05 + (24 - c1["n1"]) * 0.05
    assert (c10["carved_clip"] - c10["n0"] * c10["step_c0"]
            - c10["n1"] * c10["step_c1"]) == pytest.approx(skip_part)


def test_warmup_drops_schedule():
    """Reference ramp min(drop, idx/49*10*drop) covers exactly steps 0-4;
    effective drops <= 0.25 mark the dense fallback
    (`/root/reference/jenga_wan.py:204-206`,
    `/root/reference/wan/modules/model_mul.py:152-159`)."""
    w = bench_wan.warmup_drops(0.75)
    assert [i for i, _ in w] == [0, 1, 2, 3, 4]
    assert w[0][1] == 0.0
    assert w[1][1] == pytest.approx(0.75 * 10 / 49)
    assert sum(1 for _, e in w if e <= 0.25) == 2
    # 14B turbo stage 0 (drop 0.5): three steps fall at/below the dense cut
    w = bench_wan.warmup_drops(0.5)
    assert len(w) == 5
    assert sum(1 for _, e in w if e <= 0.25) == 3


def test_wan_turbo_compose_warmup_term():
    """Warmup entries replace stage-0 computed steps and are costed at
    their own measured times (dense ones at the stage-0 dense step); the
    no-warmup model is strictly faster (ADVICE r3: it was biased low)."""
    warm = [
        {"idx": 0, "drop": 0.0, "dense": True, "t": 2.5, "density": 1.0},
        {"idx": 1, "drop": 0.153, "dense": True, "t": 2.5, "density": 1.0},
        {"idx": 2, "drop": 0.306, "dense": False, "t": 1.8, "density": 0.8},
        {"idx": 3, "drop": 0.459, "dense": False, "t": 1.5, "density": 0.65},
        {"idx": 4, "drop": 0.612, "dense": False, "t": 1.2, "density": 0.5},
    ]
    m0 = dict(_wan_stage(1.0, 0.05, 18432, 0.30, t_dense=2.5), warmup=warm)
    m1 = _wan_stage(1.9, 0.05, 32768, 0.21, t_dense=4.2)
    kw = dict(depth_scale=1.0, dim=1536, ffn_dim=8960, text_len=512,
              ref_speedup=6.16)
    c = bench_wan.compose_turbo(m0, m1, **kw)
    assert c["n0_full"] == 13 - 5
    total = (2 * 2.5 + 1.8 + 1.5 + 1.2          # 5 warmup steps
             + 8 * 1.0 + (26 - 13) * 0.05       # rest of stage 0
             + 12 * 1.9 + (24 - 12) * 0.05)     # stage 1
    assert c["carved_clip"] == pytest.approx(total)
    legacy = bench_wan.compose_turbo(
        _wan_stage(1.0, 0.05, 18432, 0.30, t_dense=2.5), m1, **kw)
    assert c["carved_clip"] > legacy["carved_clip"]
    assert c["dense_clip"] == legacy["dense_clip"]
    # the ceiling pays the same warmup schedule (dense warmup at density 1)
    assert c["ceiling_vs_baseline"] < legacy["ceiling_vs_baseline"]


def test_wan_turbo_compose_warmup_depth_extrapolation():
    """Warmup step costs extrapolate like every other step: skip path
    once + trunk delta x depth_scale."""
    warm = [{"idx": 0, "drop": 0.0, "dense": True, "t": 2.5, "density": 1.0},
            {"idx": 2, "drop": 0.3, "dense": False, "t": 1.8,
             "density": 0.8}]
    m0 = dict(_wan_stage(1.0, 0.05, 18432, 0.30, t_dense=2.5), warmup=warm)
    m1 = _wan_stage(1.9, 0.05, 32768, 0.21, t_dense=4.2)
    kw = dict(dim=5120, ffn_dim=13824, text_len=512, ref_speedup=6.12)
    c10 = bench_wan.compose_turbo(m0, m1, depth_scale=10.0, **kw)
    want = ((0.05 + (2.5 - 0.05) * 10)
            + (0.05 + (1.8 - 0.05) * 10))
    assert c10["warm_cost"] == pytest.approx(want)


def test_wan_turbo_ceiling_monotone_in_density():
    """A sparser realized selection raises the attainable ceiling; a
    missing density (CPU run) disables it."""
    m1 = _wan_stage(1.9, 0.05, 32768, 0.21, t_dense=4.2)
    kw = dict(depth_scale=1.0, dim=1536, ffn_dim=8960, text_len=512,
              ref_speedup=6.16)
    sparse = bench_wan.compose_turbo(
        _wan_stage(1.0, 0.05, 18432, 0.15), m1, **kw)
    dense = bench_wan.compose_turbo(
        _wan_stage(1.0, 0.05, 18432, 0.60), m1, **kw)
    assert sparse["ceiling_vs_baseline"] > dense["ceiling_vs_baseline"] > 0
    off = bench_wan.compose_turbo(
        _wan_stage(1.0, 0.05, 18432, -1.0), m1, **kw)
    assert off["ceiling_vs_baseline"] == -1.0


def test_compose_dense_comparator_is_full_res_only():
    geoms = synth_geoms(t_dense=8.0)
    doubled = bench_prores.compose_presets(geoms, depth_scale=20.0,
                                           q_rows=8, meas_layers=3)
    geoms = synth_geoms(t_dense=4.0)
    halved = bench_prores.compose_presets(geoms, depth_scale=20.0,
                                          q_rows=8, meas_layers=3)
    for d, h in zip(doubled, halved):
        # carved time identical; only the denominator moved
        assert d["value"] == h["value"]
        assert d["speedup"] > h["speedup"]


def test_compose_ceiling_and_decomposition():
    """Per-preset ceiling_vs_baseline (r5): densities at every geometry
    give a zero-overhead-kernel ideal clip; a fixedlists entry yields
    the carved/fixedlists/ideal decomposition reusing the same ideal
    step. Ceiling must be >= the measured vs_baseline when the carved
    arms carry overhead, and density=1 everywhere with carved == scaled
    dense would collapse ceiling toward vs_baseline."""
    geoms = synth_geoms()
    for g in geoms.values():
        g["density"] = {tk: 0.3 for tk in g["t_carved"]}
        if g["rate"] != 1.0:
            g["t_fixed"] = {tk: v * 0.98
                            for tk, v in g["t_carved"].items()}
    results = {r["preset"]: r for r in bench_prores.compose_presets(
        geoms, depth_scale=20.0, q_rows=8, meas_layers=3)}
    for name, r in results.items():
        assert r["ceiling_vs_baseline"] > 0
        assert r["density"], name
        for st, dec in r["overhead_decomposition"].items():
            assert dec["carved_s"] == pytest.approx(
                dec["fixedlists_s"] + dec["planner_s"], abs=1e-6)
            assert dec["fixedlists_s"] == pytest.approx(
                dec["ideal_s"] + dec["kernel_vs_ideal_s"], abs=1e-6)

    # ceiling is monotone: denser selections -> slower ideal -> lower
    # ceiling (the sanity property that catches sign/ratio errors)
    dense_geoms = synth_geoms()
    for g in dense_geoms.values():
        g["density"] = {tk: 0.9 for tk in g["t_carved"]}
    denser = {r["preset"]: r for r in bench_prores.compose_presets(
        dense_geoms, depth_scale=20.0, q_rows=8, meas_layers=3)}
    for name in results:
        assert denser[name]["ceiling_vs_baseline"] \
            < results[name]["ceiling_vs_baseline"], name

    # missing density at any geometry -> no ceiling claimed
    geoms2 = synth_geoms()
    for g in geoms2.values():
        g["density"] = {}
    res2 = bench_prores.compose_presets(geoms2, depth_scale=20.0,
                                        q_rows=8, meas_layers=3)
    assert all(r["ceiling_vs_baseline"] == -1.0 for r in res2)
