"""One-table summary of every committed benchmark artifact.

Reads the BENCH_*.json files at the repo root and prints a compact
table (workload, s/clip, speedup, vs_baseline, own ceiling) plus the
evidence artifacts each row leans on — the same rows README.md's table
is maintained from. Purely a reader; never touches the artifacts.
"""

import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rows():
    out = []
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_*.json"))):
        name = os.path.basename(path)
        if name.startswith(("BENCH_r0", "BENCH_SCAN", "BENCH_FULL")):
            continue          # driver history / depth-evidence raws
        for ln in open(path):
            ln = ln.strip()
            if not ln:
                continue
            r = json.loads(ln)
            if "vs_baseline" not in r:
                continue
            label = name.replace("BENCH_", "").replace(".json", "")
            if "preset" in r:
                label += f":{r['preset']}"
            out.append({
                "artifact": label,
                "s_per_clip": r.get("value"),
                "speedup": r.get("speedup"),
                "vs_baseline": r.get("vs_baseline"),
                "ceiling": r.get("ceiling_vs_baseline"),
                "kernel_max_err": r.get("kernel_max_err"),
            })
    return out


def main():
    rs = rows()
    hdr = f"{'artifact':<22}{'s/clip':>9}{'speedup':>9}{'vs_base':>9}" \
          f"{'ceiling':>9}{'kerr':>10}"
    print(hdr)
    print("-" * len(hdr))
    for r in rs:
        def fmt(v, n=2):
            return "--" if v is None else f"{v:.{n}f}"
        print(f"{r['artifact']:<22}{fmt(r['s_per_clip']):>9}"
              f"{fmt(r['speedup']):>9}{fmt(r['vs_baseline'], 3):>9}"
              f"{fmt(r['ceiling'], 3):>9}"
              f"{fmt(r['kernel_max_err'], 5):>10}")


if __name__ == "__main__":
    main()
