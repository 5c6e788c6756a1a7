#!/usr/bin/env python3
"""Round-over-round bench comparison (VERDICT r14 #5): the aggregation
protocol the round report quotes, as a script over committed artifacts
instead of ad-hoc arithmetic.

Usage: bench_compare.py <BENCH_FULL_old.json> <BENCH_FULL_new.json>
                        [band_lo=0.77] [band_hi=1.3]

Protocol (stated here once, referenced by BASELINE.md): per query take
the MIN of the recorded run vector on each side ("runs" when present,
else the already-min "queries" value), ratio = new/old; report the
median ratio over the intersection, the total-time ratio, and every
query whose ratio falls outside [band_lo, band_hi] with its absolute
times (sub-0.5 s rows are flagged as noise-band — the JVM/scheduler
floor swings them run to run).
"""
import json
import sys


def best(bench: dict, name: str) -> float:
    runs = bench.get("runs", {}).get(name)
    if runs:
        good = [t for t in runs if t > 0]
        if good:
            return min(good)
    return bench["queries"].get(name, -1.0)


def main() -> None:
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    lo = float(sys.argv[3]) if len(sys.argv) > 3 else 0.77
    hi = float(sys.argv[4]) if len(sys.argv) > 4 else 1.3
    names = sorted(set(old["queries"]) & set(new["queries"]))
    rows = []
    for n in names:
        o, v = best(old, n), best(new, n)
        if o > 0 and v > 0:
            rows.append((n, o, v, v / o))
    only_old = sorted(set(old["queries"]) - set(new["queries"]))
    only_new = sorted(set(new["queries"]) - set(old["queries"]))
    ratios = sorted(r[3] for r in rows)
    median = ratios[len(ratios) // 2]
    tot_o = sum(r[1] for r in rows)
    tot_n = sum(r[2] for r in rows)
    print(f"{len(rows)} shared queries: total {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({tot_n / tot_o:.3f}x), median ratio {median:.3f}x")
    if only_old:
        print(f"dropped queries: {only_old}")
    if only_new:
        print(f"new queries: {only_new}")
    out = [r for r in rows if not (lo <= r[3] <= hi)]
    if not out:
        print(f"no query outside [{lo}, {hi}]")
    else:
        print(f"outside [{lo}, {hi}]:")
        for n, o, v, r in sorted(out, key=lambda t: -t[3]):
            noise = "  (noise-band: sub-0.5s)" if max(o, v) < 0.5 else ""
            print(f"  {n}: {o:.3f}s -> {v:.3f}s ({r:.2f}x){noise}")


if __name__ == "__main__":
    main()
