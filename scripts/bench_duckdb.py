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
import os
import sys
import threading
import time

import duckdb

TIMEOUT = float(os.environ.get("DUCK_TIMEOUT_SEC", "0"))


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


def main() -> None:
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    # warm pass (untimed), then best-of-N; a warm-pass timeout skips the
    # timed loop for that query outright (no point paying the budget 4x)
    timeouts = {}
    for name, sql in sorted(oracle.items()):
        try:
            if not run_sql(con, sql):
                timeouts[name] = TIMEOUT
                print(f"TIMEOUT {name}: > {TIMEOUT}s (warm)", file=sys.stderr)
        except Exception as e:
            print(f"WARM-FAIL {name}: {e}", file=sys.stderr)
    results = {}
    for name, sql in sorted(oracle.items()):
        if name in timeouts:
            results[name] = None
            continue
        best = None
        for _ in range(runs):
            t0 = time.time()
            try:
                if not run_sql(con, sql):
                    timeouts[name] = TIMEOUT
                    results[name] = None
                    break
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            except Exception:
                best = -1.0
                break
        else:
            results[name] = best
        if name not in results:
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
