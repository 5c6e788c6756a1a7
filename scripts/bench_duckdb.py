#!/usr/bin/env python3
"""DuckDB anchor timing for BASELINE.md: run every oracle SQL from a
Verify dump against an sf directory, threads=32, best-of-N warm runs.

Usage: bench_duckdb.py <sfDir> <oracle_sql.json> [runs=3]

Mirrors the protocol the Spark Bench uses (warm pass + best-of-N) so
the two anchors are comparable; reports per-query best and the total.
"""
import json
import os
import sys
import time

import duckdb


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
    # warm pass (untimed), then best-of-N
    for name, sql in sorted(oracle.items()):
        try:
            con.execute(sql).fetchall()
        except Exception as e:
            print(f"WARM-FAIL {name}: {e}", file=sys.stderr)
    results = {}
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
    print(json.dumps({"metric": "duckdb_total", "value": total,
                      "unit": "sec", "runs": runs, "sf": sf_dir,
                      "queries": results}))


if __name__ == "__main__":
    main()
