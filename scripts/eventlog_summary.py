#!/usr/bin/env python3
"""Offline job/stage attribution from a Spark event log (driver-side
tooling; NOT part of the Scala engine). Usage:

    python3 scripts/eventlog_summary.py /tmp/spark-events/<app-id> [queryFilter]

Bench labels every timed job with its query name via
setJobDescription (warm-pass jobs carry a `warm:` prefix and are
excluded here). Prints, per query: job count, summed job wall time,
stage task-time totals, and the top stages with shuffle bytes — the
poor man's Spark UI for a headless box (guide §1.5/§7.1).
"""
import json
import sys
from collections import defaultdict

path = sys.argv[1]
qfilter = sys.argv[2] if len(sys.argv) > 2 else None

jobs = {}           # jobId -> {desc, t0, t1, stages:[ids]}
stage_info = {}     # stageId -> dict
stage_attempt = {}

with open(path) as f:
    for line in f:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            desc = ev.get("Properties", {}).get("spark.job.description", "")
            jobs[jid] = {
                "desc": desc,
                "t0": ev["Submission Time"],
                "t1": None,
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
            }
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["t1"] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            stage_info[sid] = {
                "name": si.get("Stage Name", ""),
                "tasks": si.get("Number of Tasks", 0),
                "t0": si.get("Submission Time"),
                "t1": si.get("Completion Time"),
            }
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            m = ev.get("Task Metrics") or {}
            agg = stage_attempt.setdefault(sid, defaultdict(int))
            agg["task_ms"] += m.get("Executor Run Time", 0)
            agg["gc_ms"] += m.get("JVM GC Time", 0)
            agg["deser_ms"] += m.get("Executor Deserialize Time", 0)
            agg["result_ser_ms"] += m.get("Result Serialization Time", 0)
            sr = m.get("Shuffle Read Metrics") or {}
            agg["sh_read_b"] += sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
            agg["fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)
            sw = m.get("Shuffle Write Metrics") or {}
            agg["sh_write_b"] += sw.get("Shuffle Bytes Written", 0)
            inp = m.get("Input Metrics") or {}
            agg["input_b"] += inp.get("Bytes Read", 0)

per_query = defaultdict(lambda: {"jobs": 0, "wall_ms": 0, "task_ms": 0,
                                 "gc_ms": 0, "sh_b": 0, "stages": 0,
                                 "tasks": 0, "stage_wall_ms": 0})
for jid, j in sorted(jobs.items()):
    desc = j["desc"] or "(none)"
    if desc.startswith("warm:"):
        continue
    if qfilter and qfilter not in desc:
        continue
    q = per_query[desc]
    q["jobs"] += 1
    if j["t1"]:
        q["wall_ms"] += j["t1"] - j["t0"]
    for sid in j["stages"]:
        agg = stage_attempt.get(sid)
        si = stage_info.get(sid)
        if agg:
            q["task_ms"] += agg["task_ms"]
            q["gc_ms"] += agg["gc_ms"]
            q["sh_b"] += agg["sh_write_b"]
        if si:
            q["stages"] += 1
            q["tasks"] += si["tasks"]
            if si.get("t0") and si.get("t1"):
                q["stage_wall_ms"] += si["t1"] - si["t0"]

hdr = f"{'query':38s} {'jobs':>4s} {'wall_ms':>8s} {'stgwall':>8s} {'stages':>6s} {'tasks':>6s} {'task_ms':>8s} {'gc':>5s} {'shuf_kb':>8s}"
print(hdr)
for desc, q in sorted(per_query.items(), key=lambda kv: -kv[1]["wall_ms"]):
    print(f"{desc[:38]:38s} {q['jobs']:4d} {q['wall_ms']:8d} {q['stage_wall_ms']:8d} "
          f"{q['stages']:6d} {q['tasks']:6d} {q['task_ms']:8d} {q['gc_ms']:5d} {q['sh_b']//1024:8d}")

if qfilter:
    # stage-level detail for the filtered query
    print("\nstage detail (all jobs matching filter):")
    seen = set()
    for jid, j in sorted(jobs.items()):
        desc = j["desc"] or ""
        if desc.startswith("warm:") or qfilter not in desc:
            continue
        for sid in sorted(j["stages"]):
            if sid in seen:
                continue
            seen.add(sid)
            si = stage_info.get(sid, {})
            agg = stage_attempt.get(sid, {})
            wall = (si.get("t1") or 0) - (si.get("t0") or 0)
            print(f"  job {jid} stage {sid:4d} tasks={si.get('tasks', 0):3d} "
                  f"wall={wall:6d}ms task={agg.get('task_ms', 0):6d}ms "
                  f"gc={agg.get('gc_ms', 0):4d} shW={agg.get('sh_write_b', 0)//1024:6d}kB "
                  f"shR={agg.get('sh_read_b', 0)//1024:6d}kB in={agg.get('input_b', 0)//1024:6d}kB "
                  f"{si.get('name', '')[:70]}")
