"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and the order-insensitive multiset of values.

Hang-proof: a watchdog thread hard-exits the process if any single query
exceeds --timeout seconds (default 600), after flushing the per-query
results already gathered to stdout and RESULTS_PATH — so one wedged query
(round 1: the Louvain localCheckpoint stats explosion) can never void the
whole artifact. Re-run with `--skip <name>` to grade the rest.

Usage: python tools/check_correctness.py [--timeout S] [--skip name ...] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

RESULTS_PATH = "/tmp/check_correctness_results.json"

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from neo4j_graph_data_science_spark.session import get_spark  # noqa: E402
from neo4j_graph_data_science_spark.sources.tables import TABLES  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    argv = sys.argv[1:]
    timeout_s, skip = 600.0, set()
    rest = []
    i = 0
    while i < len(argv):
        if argv[i] == "--timeout":
            timeout_s = float(argv[i + 1]); i += 2
        elif argv[i] == "--skip":
            skip.add(argv[i + 1]); i += 2
        else:
            rest.append(argv[i]); i += 1
    only = set(rest)
    results: dict[str, str] = {}
    current = {"name": None, "start": 0.0}

    def _flush():
        with open(RESULTS_PATH, "w") as f:
            json.dump(results, f, indent=1)

    def _watchdog():
        while True:
            time.sleep(5)
            name = current["name"]
            if name and time.time() - current["start"] > timeout_s:
                results[name] = f"HANG >{timeout_s:.0f}s"
                _flush()
                print(f"\nHANG  {name}: exceeded {timeout_s:.0f}s watchdog; "
                      f"partial results in {RESULTS_PATH}", flush=True)
                os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    spark = get_spark("correctness_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if (only and name not in only) or name in skip:
            continue
        current["name"], current["start"] = name, time.time()
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            results[name] = f"spark error: {ex}"; _flush()
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{t_spark:.1f}s]")
            if len(sdf) == 0:
                print(f"  WARNING: empty result")
            results[name] = f"rows-only: {len(sdf)}"; _flush()
            current["name"] = None
            continue
        t1 = time.time()
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
            results[name] = f"duckdb error: {ex}"; _flush()
            current["name"] = None
            continue
        t_duck = time.time() - t1
        s, o = canon(sdf), canon(odf)
        status = []
        if len(s) != len(o):
            status.append(f"rowcount {len(s)} != {len(o)}")
        if list(s.columns) != list(o.columns):
            status.append(f"cols {list(s.columns)} != {list(o.columns)}")
        if not status:
            if len(s) and not s.equals(o):
                # locate mismatching cells
                diffs = []
                for c in s.columns:
                    if not s[c].equals(o[c]):
                        neq = (s[c] != o[c])
                        try:
                            neq = neq & ~(s[c].isna() & o[c].isna())
                        except Exception:
                            pass
                        n = int(neq.sum())
                        if n:
                            idx = neq[neq].index[0]
                            diffs.append(f"{c}: {n} diffs e.g. [{idx}] {s[c][idx]!r} != {o[c][idx]!r}")
                if diffs:
                    status.append("; ".join(diffs[:3]))
        if status:
            print(f"FAIL  {name}: {'; '.join(status)} [{t_spark:.1f}s/{t_duck:.1f}s]")
            failures.append(name)
            results[name] = f"FAIL: {'; '.join(status)}"
        else:
            print(f"OK    {name}: {len(s)} rows [{t_spark:.1f}s/{t_duck:.1f}s]")
            results[name] = "OK"
        _flush()
        current["name"] = None
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall checked queries OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
