"""Driver-contract smoke: entry() runs at sf0.001, a representative subset
of queries() matches oracle_sql() via DuckDB at sf0.001 (the full sweep at
sf0.01 is tools/check_correctness.py; this is the fast pytest regression
gate)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from neo4j_graph_data_science_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"

FAST_ORACLE_QUERIES = [
    "degree_events",
    "lpa_events",
    "wcc_events",
    "triangles_global",
    "token_stats_docs",
    "exact_dedup_docs",
    "scale_part_price",
    "vector_sims",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    rows = out.limit(5).collect()
    assert len(rows) > 0
    assert set(out.columns) == {"event_id", "score"}


def test_every_query_has_callable():
    qs = entrymod.queries()
    assert len(qs) >= 25
    assert set(entrymod.oracle_sql()) <= set(qs)


@pytest.mark.parametrize("name", FAST_ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    sdf = _canon(entrymod.queries()[name](spark, SF_DIR).toPandas())
    odf = _canon(duck.execute(entrymod.oracle_sql()[name]).df())
    assert list(sdf.columns) == list(odf.columns)
    assert len(sdf) == len(odf)
    pd.testing.assert_frame_equal(sdf, odf, check_dtype=False)
