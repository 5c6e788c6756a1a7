#!/usr/bin/env python3
"""DuckDB anchor timing for BASELINE.md: run every oracle SQL from a
Verify dump against an sf directory, threads=32, best-of-N warm runs.

Usage: bench_duckdb.py <sfDir> <oracle_sql.json> [runs=3]

Mirrors the protocol the Spark Bench uses (warm pass + best-of-N) so
the two anchors are comparable; reports per-query best and the total.

DUCK_TIMEOUT_SEC (env, default 0 = off): per-query wall budget,
enforced via con.interrupt() from a watchdog timer — the sf10 knob
(r19, VERDICT r18 #1): at 10x the sf1 volume some oracles (q80's
quadratic-in-bucket rerank mirror) would run for hours; a timed-out
query is recorded in "timeouts" with its budget and EXCLUDED from the
totals on both sides (make_paired drops one-sided rows into
"skipped"), then quoted in BASELINE.md as an engine win with the
Spark-side timing.
"""
import json
import multiprocessing
import os
import sys
import tempfile
import threading
import time

import duckdb

TIMEOUT = float(os.environ.get("DUCK_TIMEOUT_SEC", "0"))


def connect_views(sf_dir):
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    con.execute("PRAGMA memory_limit='60GB'")
    con.execute("PRAGMA temp_directory='/tmp/duck_spill'")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return con


def run_sql(con, sql) -> bool:
    """True = completed; False = hit the DUCK_TIMEOUT_SEC budget."""
    if TIMEOUT <= 0:
        con.execute(sql).fetchall()
        return True
    timer = threading.Timer(TIMEOUT, con.interrupt)
    timer.start()
    try:
        con.execute(sql).fetchall()
        return True
    except duckdb.Error as e:
        if "INTERRUPT" in str(e).upper():
            return False
        raise
    finally:
        timer.cancel()


def child_bench(sf_dir, sql, runs, result_path):
    """Budgeted-mode child: warm + best-of-N for ONE query, isolated so
    an oracle that overshoots DuckDB's memory accounting into a kernel
    kill (q106 at sf10) takes down only its own measurement."""
    try:
        con = connect_views(sf_dir)
        # DUCK_WARM_PASS=false: cold single-run protocol (the sf10
        # anchor — at that volume a warm pass doubles a multi-hour run;
        # the Spark side then also runs SPARK_GRAFT_WARM_PASS=false)
        if os.environ.get("DUCK_WARM_PASS", "true") == "true":
            if not run_sql(con, sql):  # warm (untimed)
                json.dump({"timeout": True}, open(result_path, "w"))
                return
        best = None
        for _ in range(runs):
            t0 = time.time()
            if not run_sql(con, sql):
                json.dump({"timeout": True}, open(result_path, "w"))
                return
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        json.dump({"best": best}, open(result_path, "w"))
    except Exception as e:  # noqa: BLE001 — recorded for the parent
        json.dump({"error": f"{type(e).__name__}: {e}"},
                  open(result_path, "w"))


def main() -> None:
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    oracle = json.load(open(oracle_path))
    results, timeouts = {}, {}

    if TIMEOUT > 0:
        tmpdir = tempfile.mkdtemp(prefix="duck_bench_")
        backstop = (runs + 1) * TIMEOUT + 60
        for name, sql in sorted(oracle.items()):
            rp = os.path.join(tmpdir, name + ".json")
            proc = multiprocessing.Process(
                target=child_bench, args=(sf_dir, sql, runs, rp))
            proc.start()
            proc.join(backstop)
            if proc.is_alive():
                proc.kill()
                proc.join()
            if not os.path.exists(rp):
                timeouts[name] = TIMEOUT
                results[name] = None
                print(f"OOM/KILL {name}: child exit {proc.exitcode} — "
                      "engine win", file=sys.stderr)
                continue
            r = json.load(open(rp))
            if r.get("timeout"):
                timeouts[name] = TIMEOUT
                results[name] = None
                print(f"TIMEOUT {name}: > {TIMEOUT}s", file=sys.stderr)
            elif "error" in r:
                results[name] = -1.0
                print(f"FAIL {name}: {r['error']}", file=sys.stderr)
            else:
                results[name] = r["best"]
    else:
        con = connect_views(sf_dir)
        # warm pass (untimed), then best-of-N
        for name, sql in sorted(oracle.items()):
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                print(f"WARM-FAIL {name}: {e}", file=sys.stderr)
        for name, sql in sorted(oracle.items()):
            best = None
            for _ in range(runs):
                t0 = time.time()
                try:
                    con.execute(sql).fetchall()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                except Exception:
                    best = -1.0
                    break
            results[name] = best

    total = sum(v for v in results.values() if v and v > 0)
    out = {"metric": "duckdb_total", "value": total,
           "unit": "sec", "runs": runs, "sf": sf_dir,
           "queries": results}
    if timeouts:
        out["timeouts"] = timeouts
    print(json.dumps(out))


if __name__ == "__main__":
    main()
