"""gds.util.* surface (functions/util.py) — numeric guards, asNode joins,
version/exists."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from neo4j_graph_data_science_spark import GraphCatalog, from_edge_list
from neo4j_graph_data_science_spark.functions import util as U


def test_numeric_guards(spark):
    df = spark.createDataFrame(
        [(1, 1.5), (2, float("nan")), (3, float("inf")),
         (4, float("-inf")), (5, None)],
        "id long, x double",
    ).select(
        "id",
        U.is_finite(F.col("x")).alias("fin"),
        U.is_infinite(F.col("x")).alias("inf"),
    )
    got = {r["id"]: (r["fin"], r["inf"]) for r in df.collect()}
    # isInfinite == NOT isFinite per IsFiniteFunc.java:36-38 — NULL and NaN
    # count as infinite, matching the reference's `value == null ||
    # !Double.isFinite(value)`.
    assert got == {1: (True, False), 2: (False, True), 3: (False, True),
                   4: (False, True), 5: (False, True)}


def test_nan_infinity_literals(spark):
    row = spark.range(1).select(U.nan().alias("n"), U.infinity().alias("i")).first()
    assert math.isnan(row["n"]) and math.isinf(row["i"])


def test_as_nodes_and_node_property(spark):
    g = from_edge_list(spark, [(0, 1), (1, 2)])
    g = g.with_node_property(
        g.nodes.select("id", (F.col("id") * 10).alias("tag")), "tag"
    )
    res = spark.createDataFrame([(0, 0.5), (2, 0.25)], "id long, score double")
    joined = U.as_nodes(res, g)
    assert {(r["id"], r["tag"]) for r in joined.collect()} == {(0, 0), (2, 20)}
    one = U.node_property(res, g, "tag")
    assert set(one.columns) == {"id", "score", "tag"}


def test_version_and_exists(spark):
    assert U.version().count(".") == 2
    cat = GraphCatalog()
    g = from_edge_list(spark, [(0, 1)])
    cat.project("g1", g)
    assert U.graph_exists(cat, "g1") and not U.graph_exists(cat, "nope")
