#!/usr/bin/env python3
"""Head-to-head flagship throughput: the REFERENCE's own parser
(/root/reference/ena_build/parse_embl.py, loaded as-is by file path —
no code copied) versus graft.EnaMain, on an identical generated EMBL
corpus. Driver-side tooling, like check_oracle.py; NOT part of the
Scala engine.

Usage:
    python3 scripts/bench_flagship.py [n_files] [records_per_file] [workers]

The reference runs with a dict-backed stand-in for its MySQL IDMapper
(same (mapping, no_matches) contract as mysql_database.reverse_mapping)
so the comparison measures parsing + id-resolution + TSV emission on
both sides, not network round-trips the reference would otherwise pay.
Both single-process and multiprocessing-pool numbers are reported; the
pool matches the reference's n-single-threaded-workers design.
"""
import gzip
import importlib.util
import multiprocessing as mp
import os
import random
import shutil
import subprocess
import sys
import time

REF = "/root/reference/ena_build/parse_embl.py"
N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
RECORDS = int(sys.argv[2]) if len(sys.argv) > 2 else 500
WORKERS = int(sys.argv[3]) if len(sys.argv) > 3 else os.cpu_count()
WORK = "/tmp/flagship_bench"


def load_reference():
    spec = importlib.util.spec_from_file_location("ref_parse_embl", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class FakeIDMapper:
    """Duck-typed stand-in for mysql_database.IDMapper.reverse_mapping
    (same return contract: dict[str, list[str]], set[str])."""

    def __init__(self, mapping):
        self.mapping = mapping

    def reverse_mapping(self, foreign_ids, batch_size=1000):
        found = {f: self.mapping[f] for f in foreign_ids if f in self.mapping}
        no_match = set(foreign_ids) - found.keys()
        return found, no_match


def gen_corpus():
    rnd = random.Random(42)
    shutil.rmtree(WORK, ignore_errors=True)
    root = f"{WORK}/in/sequence/con"
    os.makedirs(root)
    idmap = {}
    for f in range(N_FILES):
        lines = []
        for r in range(RECORDS):
            rid = f"ENA{f:03d}R{r:05d}"
            struct = "circular" if r % 5 == 0 else "linear"
            ln = 10000
            lines.append(f"ID   {rid}; SV 1; {struct}; genomic DNA; STD; PRO; {ln} BP.")
            lines.append("OC   Bacteria; Proteobacteria.")
            for l in range(rnd.randint(1, 3)):
                a, b = sorted((rnd.randint(1, ln), rnd.randint(1, ln)))
                b = max(b, a + 1)
                pid = f"P{f:03d}_{r:05d}_{l}"
                if rnd.random() < 0.7:
                    idmap[f"{pid}.1"] = [f"U{pid}a", f"U{pid}b"][: rnd.randint(1, 2)]
                loc = (f"complement(join({a}..{b},{a}..{b}))"
                       if l % 2 else f"join({a}..{b})")
                lines.append(f"FT   CDS             {loc}")
                lines.append(f'FT                   /protein_id="{pid}.1"')
                lines.append(
                    f'FT                   /db_xref="UniProtKB/TrEMBL:F{pid}"')
        with gzip.open(f"{root}/rel_std_PRO_{f:03d}_r1.dat.gz", "wt") as fh:
            fh.write("\n".join(lines) + "\n")
    # idmapping parquet for the Spark side
    import pandas as pd
    rows = [(k, u) for k, us in idmap.items() for u in us]
    pd.DataFrame(rows, columns=["foreign_id", "uniprot_id"]).to_parquet(
        f"{WORK}/idmapping.parquet")
    return f"{WORK}/in", idmap


_worker_state = {}


def _init_worker(idmap):
    # one parser module + id-map per worker process, like the reference's
    # one DB connection per worker (dask_tasks.py:165) — NOT per task
    _worker_state["mod"] = load_reference()
    _worker_state["mapper"] = FakeIDMapper(idmap)


def _ref_one(args):
    path, out = args
    _worker_state["mod"].process_file(path, _worker_state["mapper"], out)
    n = 0
    if os.path.exists(out):
        with open(out) as fh:
            n = sum(1 for _ in fh)
    return n


def run_reference(in_root, idmap, pool_size):
    files = []
    for dirpath, _, names in os.walk(in_root):
        files += [os.path.join(dirpath, n) for n in names if n.endswith(".dat.gz")]
    outdir = f"{WORK}/ref_out_{pool_size}"
    os.makedirs(outdir, exist_ok=True)
    jobs = [(f, f"{outdir}/{i}.tab") for i, f in enumerate(sorted(files))]
    t0 = time.time()
    if pool_size == 1:
        _init_worker(idmap)
        rows = sum(_ref_one(j) for j in jobs)
    else:
        with mp.Pool(pool_size, initializer=_init_worker,
                     initargs=(idmap,)) as pool:
            rows = sum(pool.map(_ref_one, jobs))
    return time.time() - t0, rows


ADD_OPENS = [f"--add-opens=java.base/{p}=ALL-UNNAMED" for p in [
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
    "sun.security.action", "sun.util.calendar"]]


def run_graft(in_root):
    # plain `java` (sbt would add ~10s of its own startup); JVM + Spark
    # session startup still included — reported as-is
    cp = "/root/repo/target/scala-2.13/classes:" + "/opt/spark/jars/*"
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(WORKERS))
    t0 = time.time()
    subprocess.run(
        ["java"] + ADD_OPENS + [
         "-Xmx8g", "-Dspark.ui.enabled=false", "-cp", cp, "graft.EnaMain",
         f"{WORK}/graft_out", f"{WORK}/idmapping.parquet", in_root],
        cwd="/root/repo", check=True, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    wall = time.time() - t0
    rows = 0
    for dirpath, _, names in os.walk(f"{WORK}/graft_out"):
        for n in names:
            if n.startswith("part") and n.endswith(".csv"):
                with open(os.path.join(dirpath, n)) as fh:
                    rows += sum(1 for _ in fh)
    return wall, rows


def main():
    in_root, idmap = gen_corpus()
    total_mb = sum(
        os.path.getsize(os.path.join(d, n))
        for d, _, ns in os.walk(in_root) for n in ns) / 1e6
    print(f"corpus: {N_FILES} files x {RECORDS} records, {total_mb:.1f} MB gzipped")

    ref1, rows1 = run_reference(in_root, idmap, 1)
    print(f"reference 1-proc:   {ref1:7.2f}s  {rows1} rows")
    refN, rowsN = run_reference(in_root, idmap, WORKERS)
    print(f"reference {WORKERS}-proc:  {refN:7.2f}s  {rowsN} rows")
    g, rowsG = run_graft(in_root)
    print(f"graft EnaMain ({WORKERS} threads, incl. JVM+sbt startup): {g:7.2f}s  {rowsG} rows")
    if rowsG != rows1:
        print(f"WARNING: row mismatch graft={rowsG} reference={rows1}")


if __name__ == "__main__":
    main()
