"""Oracle-SQL-vs-Spark parity for contract queries OUTSIDE the driver's
graded 50-query prefix (round-4 ADVICE, medium): the driver's
CORRECTNESS artifact grades exactly the first 50 registry entries, so an
error in the DuckDB replay SQL of a later entry (e.g. the hex cast in an
md5 oracle or a recursive reach CTE) would otherwise go undetected until
a judge rerun. This test IS the builder-gate protocol of
tools/check_correctness.py -- same canonicalization (sorted columns,
stringified objects, order-insensitive row multiset) -- run in-process at
sf0.001 for the cheap oracle-backed queries added after the prefix froze.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from neo4j_graph_data_science_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"

# post-prefix oracle-backed queries whose replay SQL is otherwise only
# exercised by out-of-band gate runs; keep this list in sync when new
# oracles land beyond registry position 50
CASES = [
    "bf_negative_cycle_ring",
    "bf_all_negative_cycles_ring",
    "celf_md5_events_sub",
    "graphsage_infer_md5_events_sub",
    "graphsage_infer_pool_md5_events_sub",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns),
                          kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", CASES)
def test_post_prefix_oracle_matches_spark(spark, duck, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    s = _canon(fn(spark, SF_DIR).toPandas())
    o = _canon(duck.execute(sql).df())
    assert list(s.columns) == list(o.columns)
    assert len(s) == len(o)
    if len(s):
        pd.testing.assert_frame_equal(s, o, check_dtype=False,
                                      check_exact=False, rtol=1e-6)
