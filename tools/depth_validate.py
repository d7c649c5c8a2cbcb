"""Drift-bounded depth-extrapolation validation for the HY headline bench.

bench.py extrapolates the 720p x 125f trunk cost from 3 measured layers to
the production 60 (x20). A single BENCH_SCAN=1 (3-layer scan trunk) run and
a single BENCH_FULL=1 (6-layer) run minutes apart confound depth-linearity
with the time-shared chip's throughput drift (observed: carved +11% between
two runs, but dense also +4.5% — same-direction drift). Timing both depths
in ONE process is not possible: the 6-layer carved program alone runs close
to the 16GB HBM ceiling, so the two executables cannot be resident
together (measured: ResourceExhausted).

Protocol here: run bench.py in BENCH_SCAN and BENCH_FULL modes ALTERNATELY
``ROUNDS`` times each (3-6-3-6-...), collect each run's raw per-arm times
from the artifact it writes, and keep the per-arm MIN over rounds. Drift
windows on this chip are minutes long, so alternation at ~2-minute
granularity gives both depths the same exposure to fast windows; the min
over three exposures per depth is drift-consistent. The final artifacts are
rewritten with ``rounds`` recorded.

Prints the carved75/carved85/dense per-layer agreement ratios
(FULL/QUICK; 1.0 = extrapolation exact).
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROUNDS = int(os.environ.get("BENCH_ROUNDS", "3"))


def run_mode(mode_env: str, artifact: str):
    env = dict(os.environ, **{mode_env: "1"})
    r = subprocess.run([sys.executable, os.path.join(HERE, "bench.py")],
                       env=env, cwd=HERE, capture_output=True, text=True,
                       timeout=2400)
    if r.returncode != 0:
        print(r.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"bench.py {mode_env} failed rc={r.returncode}")
    with open(os.path.join(HERE, artifact)) as f:
        return json.load(f)


def main():
    best = {"BENCH_SCAN.json": None, "BENCH_FULL.json": None}
    plan = [("BENCH_SCAN", "BENCH_SCAN.json"),
            ("BENCH_FULL", "BENCH_FULL.json")] * ROUNDS
    for i, (mode, artifact) in enumerate(plan):
        raw = run_mode(mode, artifact)
        print(f"[depth_validate] round {i // 2} {mode}: {raw}",
              file=sys.stderr, flush=True)
        b = best[artifact]
        if b is None:
            best[artifact] = dict(raw)
        else:
            for k in ("t_c75", "t_c85", "t_dense", "t_skip"):
                b[k] = min(b[k], raw[k])
    for artifact, raw in best.items():
        raw["rounds"] = ROUNDS
        raw["protocol"] = "alternated min-of-rounds (tools/depth_validate)"
        with open(os.path.join(HERE, artifact), "w") as f:
            json.dump(raw, f)
            f.write("\n")
        print(f"[depth_validate] wrote {artifact}: {raw}",
              file=sys.stderr, flush=True)

    rs, rf = best["BENCH_SCAN.json"], best["BENCH_FULL.json"]
    pl = lambda r, arm: (r[arm] - r["t_skip"]) / r["layers"]
    print(json.dumps({
        "carved75_agreement": round(pl(rf, "t_c75") / pl(rs, "t_c75"), 4),
        "carved85_agreement": round(pl(rf, "t_c85") / pl(rs, "t_c85"), 4),
        "dense_agreement": round(pl(rf, "t_dense") / pl(rs, "t_dense"), 4),
    }))


if __name__ == "__main__":
    main()
