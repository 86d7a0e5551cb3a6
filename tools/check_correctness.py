"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and the order-insensitive multiset of values.

Hang-proof, and CONTINUES past a hang: --timeout seconds (default 600) is
forwarded to the contract's own per-query watchdog (SPARK_GRAFT_QUERY_TIMEOUT
-> _guarded raises TimeoutError, job group cancelled), so a wedged Spark
query is recorded as an error and the sweep moves on; an overlong DuckDB
oracle is interrupted via con.interrupt() and likewise recorded. Only if a
query is still wedged at 2x the timeout (cancellation itself failed) does
the tool hard-exit after flushing the partial results to RESULTS_PATH —
re-run with `--skip <name>` to grade the rest.

Usage: python tools/check_correctness.py [--timeout S] [--skip name ...] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

RESULTS_PATH = "/tmp/check_correctness_results.json"


def _prescan_timeout() -> float:
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--timeout" and i + 1 < len(argv):
            return float(argv[i + 1])
    return 600.0


# must precede the entrymod import: _QUERY_TIMEOUT_S is read at module load
os.environ["SPARK_GRAFT_QUERY_TIMEOUT"] = str(_prescan_timeout())

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
    # phase: None | "spark" | "duck"; _guarded bounds the spark phase itself,
    # the watchdog below interrupts the duck phase, and hard-exits only if a
    # query is STILL running at 2x timeout (cancellation failed).
    current = {"name": None, "start": 0.0, "phase": None}

    def _flush():
        with open(RESULTS_PATH, "w") as f:
            json.dump(results, f, indent=1)

    def _watchdog():
        interrupted = None
        while True:
            time.sleep(5)
            name = current["name"]
            if not name:
                continue
            elapsed = time.time() - current["start"]
            if (current["phase"] == "duck" and elapsed > timeout_s
                    and interrupted != name):
                interrupted = name
                try:
                    con.interrupt()
                    print(f"\nSLOW  {name}: oracle exceeded {timeout_s:.0f}s; "
                          "duckdb interrupted", flush=True)
                except Exception:
                    pass
            if elapsed > 2 * timeout_s + 60:
                results[name] = f"HANG >{elapsed:.0f}s (cancellation failed)"
                _flush()
                print(f"\nHANG  {name}: wedged past 2x watchdog; partial "
                      f"results in {RESULTS_PATH}", flush=True)
                os._exit(3)

    spark = get_spark("correctness_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    threading.Thread(target=_watchdog, daemon=True).start()
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
        current["name"], current["start"], current["phase"] = name, time.time(), "spark"
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            results[name] = f"spark error: {ex}"; _flush()
            current["name"] = None
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
        current["start"], current["phase"] = time.time(), "duck"
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
