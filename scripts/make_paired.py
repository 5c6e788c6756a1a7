#!/usr/bin/env python3
"""Merge a Spark BENCH_FULL json and a bench_duckdb json into the
paired artifact the round report quotes (VERDICT r14 #8: the paired
run is gate-produced, not a manual step).

Usage: make_paired.py <spark_bench.json> <duck_bench.json> <out.json> \
                      [boxstate.json]

Per query: spark best, duckdb best, ratio spark/duck. Whole-suite:
totals over queries positive on BOTH sides, total ratio, median ratio,
and the weak set (ratio > 2 AND spark >= 1 s absolute — the VERDICT
weak-row criterion). Failures on either side are listed, never
silently dropped from the denominator.

The optional boxstate.json (scripts/boxstate.py output, sampled while
the gate was idle immediately before the leg) is embedded verbatim as
"box" — the r19 load guard: a leg whose pre-leg idle-window busy_pct
or steal_pct is high was contended by FOREIGN load, and the committed
artifact records that fact instead of absorbing it as engine drift.
"""
import json
import os
import sys


def main() -> None:
    spark = json.load(open(sys.argv[1]))
    duck = json.load(open(sys.argv[2]))
    box = json.load(open(sys.argv[4])) if len(sys.argv) > 4 else None
    sq, dq = spark["queries"], duck["queries"]
    rows = {}
    skipped = []
    for name in sorted(set(sq) | set(dq)):
        s = sq.get(name)
        d = dq.get(name)
        if s is None or d is None or s <= 0 or d is None or d <= 0:
            skipped.append(name)
            continue
        rows[name] = {"spark": s, "duck": d, "ratio": round(s / d, 4)}
    st = sum(r["spark"] for r in rows.values())
    dt = sum(r["duck"] for r in rows.values())
    ratios = sorted(r["ratio"] for r in rows.values())
    median = ratios[len(ratios) // 2] if ratios else None
    weak = {n: r for n, r in rows.items()
            if r["ratio"] > 2.0 and r["spark"] >= 1.0}
    out = {
        "protocol": os.environ.get(
            "PAIRED_PROTOCOL",
            "warm best-of-3 both sides, back-to-back same box, "
            "spark layout-normalized (see BASELINE.md)"),
        "sf": spark.get("sf"),
        "n_queries": len(rows),
        "spark_total_sec": round(st, 3),
        "duck_total_sec": round(dt, 3),
        "total_ratio": round(st / dt, 4) if dt else None,
        "median_ratio": median,
        "weak": weak,
        "skipped": skipped,
        "queries": rows,
    }
    if box is not None:
        out["box"] = box
    json.dump(out, open(sys.argv[3], "w"), indent=1, sort_keys=True)
    print(f"paired: {len(rows)} queries, spark {st:.1f}s vs duck {dt:.1f}s "
          f"= {st / dt:.2f}x total, median {median}x, "
          f"{len(weak)} weak ({sorted(weak)})")


if __name__ == "__main__":
    main()
