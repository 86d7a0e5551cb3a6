"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and the order-insensitive multiset of values.

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import sys
import time

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
    only = set(sys.argv[1:])
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
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{t_spark:.1f}s]")
            if len(sdf) == 0:
                print(f"  WARNING: empty result")
            continue
        t1 = time.time()
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
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
        else:
            print(f"OK    {name}: {len(s)} rows [{t_spark:.1f}s/{t_duck:.1f}s]")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall checked queries OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
