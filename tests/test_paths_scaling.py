"""Unit tests: BFS / SSSP / collapsePath / topological sort, scalers,
link-prediction functions. Fixtures are tiny hand-computed graphs in the
style of the reference's GDL unit fixtures (FIXTURES.md section 4)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from neo4j_graph_data_science_spark.catalog import from_edge_list
from neo4j_graph_data_science_spark.functions.linkprediction import (
    link_prediction_scores,
)
from neo4j_graph_data_science_spark.operators.paths import (
    PathConfig,
    bfs,
    collapse_path,
    shortest_paths,
    topological_sort,
)
from neo4j_graph_data_science_spark.operators.scaling import scale_property


def test_bfs_hops(spark):
    # 0->1->2->3, 0->3 shortcut, 4 isolated
    g = from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (0, 3)], n_nodes=5)
    out = {r["id"]: r["dist"] for r in bfs(g, [0]).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 1}


def test_sssp_weighted(spark):
    # 0->1 (1.0), 1->2 (1.0), 0->2 (5.0): shortest to 2 is 2.0
    g = from_edge_list(spark, [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0)], n_nodes=3)
    out = {r["id"]: r["dist"] for r in shortest_paths(g, [0]).collect()}
    assert out == {0: 0.0, 1: 1.0, 2: 2.0}


def test_collapse_path_two_hop(spark):
    g = from_edge_list(spark, [(0, 1), (1, 2), (2, 3)], n_nodes=4)
    out = {(r["src"], r["dst"]) for r in collapse_path(g, ["REL", "REL"]).collect()}
    assert out == {(0, 2), (1, 3)}


def test_topological_levels(spark):
    # diamond DAG: 0 -> {1,2} -> 3; plus cycle 4<->5 must be omitted
    g = from_edge_list(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (5, 4)],
                       n_nodes=6)
    rows = {r["id"]: r["level"] for r in topological_sort(g).collect()}
    assert rows == {0: 0, 1: 1, 2: 1, 3: 2}


def test_scalers_match_reference_formulas(spark):
    vals = [1.0, 2.0, 3.0, 4.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, x double")
    mm = {r["id"]: r["x_minmax"] for r in scale_property(df, "x", "minmax").collect()}
    assert mm[0] == 0.0 and mm[3] == 1.0 and abs(mm[1] - 1 / 3) < 1e-12
    avg = sum(vals) / 4
    std = math.sqrt(sum((v - avg) ** 2 for v in vals) / 4)  # population std
    ss = {r["id"]: r["x_stdscore"] for r in scale_property(df, "x", "stdscore").collect()}
    assert abs(ss[0] - (1.0 - avg) / std) < 1e-9
    l2 = math.sqrt(sum(v * v for v in vals))
    l2s = {r["id"]: r["x_l2norm"] for r in scale_property(df, "x", "l2norm").collect()}
    assert abs(l2s[2] - 3.0 / l2) < 1e-12
    lg = {r["id"]: r["x_log"] for r in scale_property(df, "x", "log").collect()}
    assert abs(lg[1] - math.log(2.0)) < 1e-12
    # degenerate range -> all zeros (reference ZeroScaler fallback)
    cdf = spark.createDataFrame([(0, 7.0), (1, 7.0)], "id long, x double")
    zz = {r["id"]: r["x_minmax"] for r in scale_property(cdf, "x", "minmax").collect()}
    assert zz == {0: 0.0, 1: 0.0}


def test_link_prediction_known_graph(spark):
    # undirected: 0-1, 0-2, 1-2, 1-3  (N(0)={1,2}, N(1)={0,2,3}, N(2)={0,1}, N(3)={1})
    g = from_edge_list(spark, [(0, 1), (0, 2), (1, 2), (1, 3)], n_nodes=4)
    pairs = spark.createDataFrame([(0, 1), (2, 3)], "node1 long, node2 long")
    out = {(r["node1"], r["node2"]): r for r in
           link_prediction_scores(g, pairs).collect()}
    r01 = out[(0, 1)]
    assert r01["common_neighbors"] == 1            # {2}
    assert abs(r01["adamic_adar"] - 1 / math.log(2)) < 1e-9
    assert abs(r01["resource_allocation"] - 0.5) < 1e-12
    assert r01["preferential_attachment"] == 6     # 2*3
    assert r01["total_neighbors"] == 4             # 2+3-1
    r23 = out[(2, 3)]
    assert r23["common_neighbors"] == 1            # {1}
    assert r23["preferential_attachment"] == 2     # 2*1
