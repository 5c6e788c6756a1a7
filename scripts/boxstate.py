#!/usr/bin/env python3
"""Box-state probe for the paired-bench load guard (driver-side
tooling; VERDICT r18 #3: the r18 COMPARE artifact absorbed ~7% box
drift with no way to tell code regression from box state).

Samples /proc/stat for N seconds WHILE THE CALLER IS IDLE and reports
the busy/steal fraction over that window plus the load averages. The
window measurement is the load guard's signal: /proc/loadavg alone
cannot distinguish foreign load from the decay tail of the gate's own
just-finished Spark leg (a 32-thread bench leaves load1 at 10+ for a
minute after exit), but instantaneous CPU busy% sampled while the gate
runs nothing is foreign load by construction.

Usage: boxstate.py [seconds] > state.json
Output: {"busy_pct": .., "steal_pct": .., "load1": .., "load5": ..,
         "sample_sec": ..}
"""
import json
import sys
import time


def cpu_ticks():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    # user nice system idle iowait irq softirq steal ...
    idle = vals[3] + vals[4]
    steal = vals[7] if len(vals) > 7 else 0
    return sum(vals), idle, steal


def main() -> None:
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    t0, i0, s0 = cpu_ticks()
    time.sleep(secs)
    t1, i1, s1 = cpu_ticks()
    dt = max(1, t1 - t0)
    with open("/proc/loadavg") as f:
        la = f.read().split()
    out = {
        "busy_pct": round(100.0 * (dt - (i1 - i0)) / dt, 2),
        "steal_pct": round(100.0 * (s1 - s0) / dt, 2),
        "load1": float(la[0]),
        "load5": float(la[1]),
        "sample_sec": secs,
    }
    json.dump(out, sys.stdout)
    print()


if __name__ == "__main__":
    main()
