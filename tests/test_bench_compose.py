"""Unit tests for the ProRes bench composition (tools/bench_prores.py).

The on-chip children only produce per-geometry stage timings; turning
those into per-preset clip times is pure arithmetic (stage step ranges,
the switch-after-forward convention, the fixed skip schedule restarting
per stage, depth extrapolation). That arithmetic carries the three
HY-preset BASELINE rows, so it is pinned here on CPU with synthetic
timings (reference conventions:
`/root/reference/hyvideo/diffusion/pipelines/
pipeline_hunyuan_video_prores.py:697-773`).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import bench_prores  # noqa: E402

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
