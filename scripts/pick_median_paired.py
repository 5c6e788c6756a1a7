#!/usr/bin/env python3
"""Select the median paired-bench leg and stamp the round artifacts.

Usage: pick_median_paired.py <nRuns> <round>

Reads /tmp/gate_paired_{spark,duck}_{i}.json + /tmp/gate_paired_{i}.json
for i in 1..nRuns (produced by gate.sh leg 5), picks the leg whose
whole-suite total_ratio is the median, and writes the round artifacts
from THAT leg: BENCH_FULL_r{N}.json, DUCK_r{N}.json, PAIRED_r{N}.json.
The paired artifact gains a "dispersion" block carrying every leg's
totals and the selection rule, so a reader can audit that the committed
sample is the median, not a cherry-pick (VERDICT r15 #5: a single noisy
sample must never manufacture or hide a weak row).
"""
import json
import shutil
import sys


def main() -> None:
    n, rnd = int(sys.argv[1]), sys.argv[2]
    legs = []
    for i in range(1, n + 1):
        p = json.load(open(f"/tmp/gate_paired_{i}.json"))
        legs.append((i, p))
    ranked = sorted(legs, key=lambda t: t[1]["total_ratio"])
    mid_i, mid = ranked[len(ranked) // 2]
    mid["dispersion"] = {
        "rule": "median leg by whole-suite total_ratio over "
                f"{n} back-to-back paired runs (gate.sh leg 5)",
        "selected_leg": mid_i,
        "legs": [
            {"leg": i,
             "spark_total_sec": p["spark_total_sec"],
             "duck_total_sec": p["duck_total_sec"],
             "total_ratio": p["total_ratio"],
             "median_ratio": p["median_ratio"],
             "weak": sorted(p["weak"]),
             "box": p.get("box")}
            for i, p in legs
        ],
    }
    # r19 load guard: surface any leg that started on a contended box
    for i, p in legs:
        b = p.get("box") or {}
        if b.get("busy_pct", 0) > 25 or b.get("steal_pct", 0) > 2:
            print(f"WARNING: leg {i} pre-leg idle-window busy "
                  f"{b.get('busy_pct')}% / steal {b.get('steal_pct')}% — "
                  "foreign load; see BASELINE.md load-guard rule")
    shutil.copy(f"/tmp/gate_paired_spark_{mid_i}.json",
                f"BENCH_FULL_r{rnd}.json")
    shutil.copy(f"/tmp/gate_paired_duck_{mid_i}.json", f"DUCK_r{rnd}.json")
    json.dump(mid, open(f"PAIRED_r{rnd}.json", "w"), indent=1, sort_keys=True)
    print(f"paired median: leg {mid_i}/{n} committed — " + ", ".join(
        f"leg{i}={p['total_ratio']}x" for i, p in legs))


if __name__ == "__main__":
    main()
