#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (driver-side tooling;
NOT part of the Scala engine). Usage:

    python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB over views named after
the parquet tables in sfDir, sorts columns by name and rows by all
columns, and compares values.

ORACLE_TIMEOUT_SEC (env, default 0 = off): per-query wall budget for
the DuckDB side — the sf10 knob (r19, VERDICT r18 #1): a query whose
oracle cannot finish inside the budget is reported as TIMEOUT (listed
separately, NOT a failure when the knob is on) and quoted in
BASELINE.md as an engine win with timings; the Spark output's
existence and row count are still printed. In budgeted mode every
oracle executes in a FORKED CHILD process: at sf10 some oracle
operators overshoot DuckDB's own memory accounting far enough that
the kernel kills the process (q106's 500k-doc string_split pipeline
took >120 GB), and without isolation one such query destroys the
whole run's artifact. A child killed by the kernel or raising
duckdb's OOM is classified OOM (engine win); a child still alive at
the budget is terminated and classified TIMEOUT.
"""
import json
import multiprocessing
import os
import sys
import tempfile

import duckdb
import numpy as np
import pandas as pd

TIMEOUT = float(os.environ.get("ORACLE_TIMEOUT_SEC", "0"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def first_mismatch(g: pd.DataFrame, x: pd.DataFrame):
    """Vectorized per-column equality (exact, NaN==NaN true — the same
    semantics the old per-cell loop implemented), reporting the first
    bad cell. The r18 row-by-row loop was fine at sf0.01 but is
    minutes per multi-million-row query at sf10."""
    for c in g.columns:
        ga, xa = g[c].values, x[c].values
        with np.errstate(invalid="ignore"):
            eq = np.asarray(ga == xa)
        if eq.ndim == 0:  # incomparable dtypes collapse to a scalar
            eq = np.full(len(g), bool(eq))
        try:
            eq = eq | (pd.isna(ga) & pd.isna(xa))
        except TypeError:
            pass
        if not bool(np.all(eq)):
            i = int(np.nonzero(~np.asarray(eq, dtype=bool))[0][0])
            return (i, c, g[c].iloc[i], x[c].iloc[i])
    return None


def connect_views(sf_dir: str):
    con = duckdb.connect()
    # spill instead of dying: at sf10 the md5-heavy oracles' hash
    # tables can pass the box's free RAM when anything else is resident
    # (r19: an unbounded run OOM'd the whole process mid-suite)
    con.execute("PRAGMA memory_limit='60GB'")
    con.execute("PRAGMA temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        # driver testdata tables are plain files; locally generated
        # scale dirs (GenSf1) are Spark-layout directories — glob those
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return con


def child_oracle(sf_dir: str, sql: str, result_path: str) -> None:
    """Budgeted-mode child: run one oracle, parquet the result. Errors
    land in <result_path>.err so the parent can classify them."""
    try:
        con = connect_views(sf_dir)
        con.execute(sql).df().to_parquet(result_path)
    except Exception as e:  # noqa: BLE001 — classified by the parent
        with open(result_path + ".err", "w") as f:
            f.write(f"{type(e).__name__}: {e}")


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = connect_views(sf_dir) if TIMEOUT <= 0 else None
    tmpdir = tempfile.mkdtemp(prefix="oracle_check_")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = n_timeout = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        if TIMEOUT > 0:
            rp = os.path.join(tmpdir, name + ".parquet")
            proc = multiprocessing.Process(
                target=child_oracle, args=(sf_dir, sql, rp))
            proc.start()
            proc.join(TIMEOUT)
            if proc.is_alive():
                proc.terminate()
                proc.join(10)
                if proc.is_alive():
                    proc.kill()
                    proc.join()
                print(f"TIMEOUT {name}: duckdb oracle > {TIMEOUT}s "
                      f"(spark output exists, {len(got)} rows) — engine win")
                n_timeout += 1
                continue
            if os.path.exists(rp + ".err"):
                msg = open(rp + ".err").read()
                if "OUT OF MEMORY" in msg.upper():
                    print(f"OOM {name}: duckdb oracle exhausted its "
                          f"memory budget (spark output exists, "
                          f"{len(got)} rows) — engine win")
                    n_timeout += 1
                else:
                    print(f"FAIL {name}: oracle sql error: {msg}")
                    n_fail += 1
                continue
            if not os.path.exists(rp):
                # no result, no error file: the kernel killed the child
                # mid-allocation (exitcode < 0) — same OOM verdict
                print(f"OOM {name}: duckdb oracle child killed "
                      f"(exit {proc.exitcode}; spark output exists, "
                      f"{len(got)} rows) — engine win")
                n_timeout += 1
                continue
            try:
                exp = pd.read_parquet(rp)
            finally:
                os.remove(rp)
        else:
            try:
                exp = con.execute(sql).df()
            except Exception as e:
                print(f"FAIL {name}: oracle sql error: {e}")
                n_fail += 1
                continue
        g, x = canon(got), canon(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(x.columns)}")
            n_fail += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} vs {len(x)}")
            n_fail += 1
            continue
        bad = first_mismatch(g, x)
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duckdb={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    if n_timeout:
        print(f"== {n_timeout} timeout/oom (oracle exceeded its "
              f"{TIMEOUT}s/memory budget; recorded as engine wins) ==")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if n_pass == 0:
        # an empty oracle map (or all-fail run) must never read as success —
        # that is exactly how an unwired SparkEntry went unnoticed in round 1
        print("FAIL: zero passing queries (empty oracle map?)")
        return 1
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
