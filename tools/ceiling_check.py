"""Recompute the Wan artifacts' ceiling/headline claims from raw inputs.

VERDICT r4 item 8: the denominator-strength ceiling argument is
load-bearing for four BASELINE rows, so its arithmetic must be
falsifiable. ``tools/bench_wan.py`` embeds its raw per-stage
measurements under ``"raw"`` in BENCH_WAN*.json; this tool re-derives
``ceiling_vs_baseline``, ``speedup`` and ``vs_baseline`` from those with
INDEPENDENT straight-line arithmetic (no import of compose_turbo) and
exits nonzero if any committed claim drifts from the recomputation by
more than rounding tolerance.

Model being recomputed (documented in bench_wan.py):
  * attention FLOP share a at the full-res token count S:
      lin = S*d*(12d + 4*ffn) + 4*L*d^2,  attn = 4*S^2*d + 4*S*L*d,
      a = attn / (attn + lin)
  * ideal (zero-overhead-kernel) step at density p, token ratio r:
      step_dense * ((1-a)*r + a*r^2*p)        [r = 1 for Base]
  * clip compositions: TeaCache computes n_comp steps split across
    stages by step range; 5 warmup steps (always computed) replace
    stage-0 computed steps and are costed at their measured times
    (dense fallbacks at the dense step); skipped steps cost t_skip;
    depth extrapolation step = t_skip + (t - t_skip) * depth_scale.
  * ceiling_vs_baseline = (dense_clip / ideal_clip) / ref_speedup.

Run: python tools/ceiling_check.py [artifact.json ...]
(default: BENCH_WAN.json BENCH_WAN_TURBO.json BENCH_WAN14B.json
BENCH_WAN14B_TURBO.json at the repo root; artifacts without a "raw"
field are reported and skipped — regenerate them with bench_wan.py).
Unit-tested on CPU in tests/test_ceiling_check.py.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_ARTIFACTS = ["BENCH_WAN.json", "BENCH_WAN_TURBO.json",
                     "BENCH_WAN14B.json", "BENCH_WAN14B_TURBO.json"]


def attn_share(s_tokens, dim, ffn_dim, text_len):
    lin = s_tokens * dim * (12 * dim + 4 * ffn_dim) \
        + 4 * text_len * dim * dim
    attn = 4 * s_tokens * s_tokens * dim + 4 * s_tokens * text_len * dim
    return attn / (attn + lin)


def recompute(rec: dict) -> dict:
    """Independent re-derivation of the artifact's claims from rec['raw'].

    Returns {"speedup", "vs_baseline", "ceiling_vs_baseline"}.
    """
    raw = rec["raw"]
    ds = raw["depth_scale"]
    ref = raw["ref_speedup"]
    steps = raw["steps"]

    def ext(t, t_skip):
        return t_skip + (t - t_skip) * ds

    if raw["kind"] == "base":
        a = attn_share(raw["s_tokens"], raw["dim"], raw["ffn_dim"],
                       raw["text_len"])
        t_skip = raw["t_skip"]
        step_dense = ext(raw["t_dense"], t_skip)
        warm = raw["warmup"]
        warm_cost = sum(ext(w["t"], t_skip) for w in warm)
        carved = (warm_cost
                  + raw["n75_full"] * ext(raw["t_carved75"], t_skip)
                  + raw["n85"] * ext(raw["t_carved85"], t_skip)
                  + (steps - raw["n_comp"]) * t_skip)
        dense_clip = steps * step_dense

        def ideal(p):
            return step_dense * (1 - a + a * p)
        warm_ideal = sum(step_dense if w["dense"] else ideal(w["density"])
                         for w in warm)
        ideal_clip = (warm_ideal
                      + raw["n75_full"] * ideal(rec["density"])
                      + raw["n85"] * ideal(rec["density85"])
                      + (steps - raw["n_comp"]) * t_skip)
    else:                                   # turbo
        m0, m1 = raw["m0"], raw["m1"]
        a = attn_share(m1["s_tokens"], raw["dim"], raw["ffn_dim"],
                       raw["text_len"])
        r = m0["s_tokens"] / m1["s_tokens"]
        step_dense = ext(m1["t_dense"], m1["t_skip"])
        k0, k1 = 26, steps - 26             # switch after step 25
        n_comp = steps // 2
        n0 = round(n_comp * k0 / steps)
        n1 = n_comp - n0
        warm = m0.get("warmup", [])
        n0_full = max(n0 - len(warm), 0)
        step_dense0 = ext(m0["t_dense"], m0["t_skip"])
        warm_cost = sum(step_dense0 if w["dense"]
                        else ext(w["t"], m0["t_skip"]) for w in warm)
        carved = (warm_cost + n0_full * ext(m0["t_carved"], m0["t_skip"])
                  + (k0 - n0) * m0["t_skip"]
                  + n1 * ext(m1["t_carved"], m1["t_skip"])
                  + (k1 - n1) * m1["t_skip"])
        dense_clip = steps * step_dense

        def ideal0(p):
            return step_dense * ((1 - a) * r + a * r * r * p)
        warm_ideal = sum(ideal0(1.0 if w["dense"] else w["density"])
                         for w in warm)
        ideal_clip = (warm_ideal + n0_full * ideal0(m0["density"])
                      + (k0 - n0) * m0["t_skip"]
                      + n1 * step_dense * (1 - a + a * m1["density"])
                      + (k1 - n1) * m1["t_skip"])

    speedup = dense_clip / carved
    return {
        "speedup": speedup,
        "vs_baseline": speedup / ref,
        "ceiling_vs_baseline": (dense_clip / ideal_clip) / ref,
        "carved_clip": carved,
    }


def check_record(rec: dict, label: str = "?", tol: float = 5e-3) -> list:
    """Compare an artifact's claims to the recomputation; return a list
    of mismatch strings (empty = ok)."""
    got = recompute(rec)
    errs = []
    for fld in ("speedup", "vs_baseline", "ceiling_vs_baseline"):
        if fld not in rec:      # base artifacts carry no speedup field
            continue
        if abs(got[fld] - rec[fld]) > tol:
            errs.append(f"{label}: {fld} claimed {rec[fld]} but raw "
                        f"inputs give {got[fld]:.4f}")
    if abs(got["carved_clip"] - rec["value"]) > 0.01 * rec["value"]:
        errs.append(f"{label}: value claimed {rec['value']} but raw "
                    f"inputs give {got['carved_clip']:.2f}")
    return errs


def main(paths):
    paths = paths or [os.path.join(ROOT, p) for p in DEFAULT_ARTIFACTS]
    failures, checked = [], 0
    for path in paths:
        label = os.path.basename(path)
        if not os.path.exists(path):
            print(f"{label}: missing, skipped")
            continue
        with open(path) as f:
            rec = json.loads(f.read().strip().splitlines()[0])
        if "raw" not in rec:
            print(f"{label}: no 'raw' field (pre-r5 artifact) — "
                  "regenerate with tools/bench_wan.py")
            continue
        errs = check_record(rec, label)
        checked += 1
        if errs:
            failures += errs
            for e in errs:
                print(f"FAIL {e}")
        else:
            print(f"ok   {label}: speedup/vs_baseline/ceiling re-derive "
                  "from raw within tolerance")
    if failures:
        sys.exit(1)
    if not checked:
        print("nothing checked")


if __name__ == "__main__":
    main(sys.argv[1:])
