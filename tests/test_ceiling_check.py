"""tools/ceiling_check.py — the falsifiable ceiling arithmetic.

The turbo path is cross-validated against tools/bench_wan.compose_turbo
(two independent implementations of the clip composition + FLOP-share
model must agree); the committed artifacts are checked when they carry
the ``raw`` field.
"""

import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.bench_wan import compose_turbo                     # noqa: E402
from tools.ceiling_check import (DEFAULT_ARTIFACTS, attn_share,  # noqa: E402
                                 check_record, recompute)


def synth_turbo_record():
    m0 = {"s_tokens": 18432, "t_carved": 0.9, "t_skip": 0.03,
          "t_dense": 1.5, "density": 0.30,
          "warmup": [
              {"idx": 0, "drop": 0.0, "dense": True, "t": 1.5,
               "density": 1.0},
              {"idx": 1, "drop": 0.153, "dense": True, "t": 1.5,
               "density": 1.0},
              {"idx": 2, "drop": 0.306, "dense": False, "t": 1.3,
               "density": 0.75},
              {"idx": 3, "drop": 0.459, "dense": False, "t": 1.2,
               "density": 0.6},
              {"idx": 4, "drop": 0.612, "dense": False, "t": 1.05,
               "density": 0.45}]}
    m1 = {"s_tokens": 32768, "t_carved": 1.8, "t_skip": 0.035,
          "t_dense": 4.1, "density": 0.21}
    dim, ffn, lt, ds, ref = 1536, 8960, 512, 1.0, 6.16
    c = compose_turbo(m0, m1, ds, dim, ffn, lt, ref)
    rec = {
        "value": round(c["carved_clip"], 2),
        "density_stage0": m0["density"], "density_stage1": m1["density"],
        "speedup": round(c["speedup"], 2),
        "vs_baseline": round(c["vs_baseline"], 3),
        "ceiling_vs_baseline": round(c["ceiling_vs_baseline"], 3),
        "raw": {"kind": "turbo", "ref_speedup": ref, "depth_scale": ds,
                "dim": dim, "ffn_dim": ffn, "text_len": lt,
                "m0": m0, "m1": m1, "steps": 50},
    }
    return rec


def test_turbo_recompute_matches_compose_turbo():
    rec = synth_turbo_record()
    assert check_record(rec, "synthetic") == []


def test_turbo_detects_drifted_claims():
    rec = synth_turbo_record()
    for fld, bump in (("speedup", 0.3), ("vs_baseline", 0.05),
                      ("ceiling_vs_baseline", 0.05), ("value", 5.0)):
        bad = dict(rec)
        bad[fld] = rec[fld] + bump
        assert check_record(bad, "drifted"), f"{fld} drift not caught"


def test_base_ideal_kernel_reaches_ceiling():
    """If every carved step ran exactly at the FLOP-share ideal, the
    recomputed speedup equals the recomputed ceiling (the definition of
    the ceiling)."""
    dim, ffn, lt, s = 1536, 8960, 512, 32768
    a = attn_share(s, dim, ffn, lt)
    t_dense, t_skip = 4.1, 0.035
    d75, d85 = 0.30, 0.21
    rec = {
        "value": 0.0, "density": d75, "density85": d85,
        "speedup": 0.0, "vs_baseline": 0.0, "ceiling_vs_baseline": 0.0,
        "raw": {"kind": "base", "ref_speedup": 4.26, "depth_scale": 1.0,
                "dim": dim, "ffn_dim": ffn, "text_len": lt, "s_tokens": s,
                "t_carved75": t_dense * (1 - a + a * d75),
                "t_carved85": t_dense * (1 - a + a * d85),
                "t_dense": t_dense, "t_skip": t_skip,
                "warmup": [{"idx": 0, "drop": 0.0, "dense": True,
                            "t": t_dense, "density": 1.0}],
                "n75_full": 12, "n85": 12, "n_comp": 25, "steps": 50},
    }
    # depth_scale 1: ext() is identity, so carved == ideal exactly...
    got = recompute(rec)
    assert got["speedup"] == pytest.approx(got["ceiling_vs_baseline"]
                                           * rec["raw"]["ref_speedup"],
                                           rel=1e-9)


@pytest.mark.parametrize("name", DEFAULT_ARTIFACTS)
def test_committed_artifacts(name):
    path = os.path.join(ROOT, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not present")
    rec = json.loads(open(path).read().strip().splitlines()[0])
    if "raw" not in rec:
        pytest.skip(f"{name} predates the raw field (regenerate via "
                    "tools/bench_wan.py)")
    assert check_record(rec, name) == []
