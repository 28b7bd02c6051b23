#!/usr/bin/env python3
"""Scaling-curvature report: per-query wall time vs scale factor.

Reads the three /tmp/bench_scale_sf{0.1,0.33,1}.json lines produced by
running graft.Bench over scripts/gen_scale.py data and prints a
markdown table of times plus the fitted growth exponent
alpha = log(t_sf1 / t_sf0.1) / log(10)  (1.0 = linear, <=~1.2 is
n log n territory at this size; higher = investigate). Queries faster
than FLOOR seconds at sf1 are reported but not flagged — sub-second
timings are dominated by fixed per-query overhead, not data volume.

Usage: python3 scripts/bench_scaling.py [floor_seconds]
"""
import json
import math
import sys

FLOOR = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
SFS = ["0.1", "0.33", "1"]


def main():
    runs = {}
    for sf in SFS:
        with open(f"/tmp/bench_scale_sf{sf}.json") as f:
            runs[sf] = json.load(f)
    qs = sorted(runs["1"]["queries"])
    print("| query | sf0.1 s | sf0.33 s | sf1 s | alpha |")
    print("|---|---|---|---|---|")
    flagged = []
    for q in qs:
        t = [runs[sf]["queries"].get(q, -1.0) for sf in SFS]
        if any(x < 0 for x in t):
            print(f"| {q} | {t[0]:.2f} | {t[1]:.2f} | {t[2]:.2f} | FAILED |")
            flagged.append((q, "failed"))
            continue
        alpha = math.log(max(t[2], 1e-3) / max(t[0], 1e-3)) / math.log(10)
        mark = ""
        if t[2] >= FLOOR and alpha > 1.25:
            mark = " **super-linear**"
            flagged.append((q, f"alpha={alpha:.2f}"))
        print(f"| {q} | {t[0]:.2f} | {t[1]:.2f} | {t[2]:.2f} | {alpha:.2f}{mark} |")
    # Bench's stdout line carries "value"; the BENCH_DETAIL.json sidecar
    # (full names, full precision — preferred input) carries "total".
    tot = [runs[sf].get("value", runs[sf].get("total")) for sf in SFS]
    print(f"| **total** | {tot[0]:.1f} | {tot[1]:.1f} | {tot[2]:.1f} | "
          f"{math.log(tot[2] / tot[0]) / math.log(10):.2f} |")
    print()
    if flagged:
        print("FLAGGED:", ", ".join(f"{q} ({why})" for q, why in flagged))
    else:
        print("No query scales worse than alpha 1.25 above the "
              f"{FLOOR}s floor.")


if __name__ == "__main__":
    main()
