"""Parity pins for the subcritical single-task kernels
(plans/local_kernel.py): the local numpy loop must reproduce the
distributed Pregel loop's results — same init semantics, same tie-breaks,
same iteration accounting — because operators silently dispatch on edge
count. Forcing: small_graph_edges=huge forces the local path,
small_graph_edges=0 forces the distributed path, on the SAME graph."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_graph_data_science_spark import from_edge_list
from neo4j_graph_data_science_spark.operators.labelprop import (
    LabelPropagationConfig, label_propagation,
)
from neo4j_graph_data_science_spark.operators.pagerank import (
    PageRankConfig, page_rank,
)
from neo4j_graph_data_science_spark.operators.wcc import WccConfig, wcc

FORCE_LOCAL = 10**9
FORCE_DIST = 0

EDGES = [
    (0, 1), (1, 2), (2, 0), (0, 2), (2, 3), (3, 4), (4, 3),
    (5, 6), (6, 5), (1, 3), (4, 0), (7, 7),
]
WEIGHTED = [(a, b, float(1 + (a * 7 + b * 13) % 5)) for a, b in EDGES]


def _ranks(res):
    return {r["id"]: r["score"] for r in res.state.collect()}


@pytest.mark.parametrize("kwargs", [
    {},
    {"weighted": True},
    {"source_nodes": [0, 5]},
    {"tolerance": 1e-3},
    {"scaler": "minmax"},
])
def test_pagerank_local_matches_distributed(spark, kwargs):
    g = from_edge_list(spark, WEIGHTED, n_nodes=9)
    loc = page_rank(g, PageRankConfig(small_graph_edges=FORCE_LOCAL, **kwargs))
    dist = page_rank(g, PageRankConfig(small_graph_edges=FORCE_DIST, **kwargs))
    rl, rd = _ranks(loc), _ranks(dist)
    assert rl.keys() == rd.keys()
    for k in rl:
        assert rl[k] == pytest.approx(rd[k], abs=1e-9)
    assert loc.iterations == dist.iterations
    assert loc.converged == dist.converged
    assert loc.metrics and loc.metrics[0].get("kernel") == "local-task"
    assert not (dist.metrics and dist.metrics[0].get("kernel") == "local-task")


def test_pagerank_local_convergence_accounting(spark):
    # star graph converges fast; iteration counts must match the
    # distributed per-superstep check (GDS accounting incl. initial send)
    g = from_edge_list(spark, [(i, 0) for i in range(1, 6)], n_nodes=6)
    loc = page_rank(g, PageRankConfig(max_iterations=50, tolerance=1e-7,
                                      small_graph_edges=FORCE_LOCAL))
    dist = page_rank(g, PageRankConfig(max_iterations=50, tolerance=1e-7,
                                       small_graph_edges=FORCE_DIST))
    assert loc.converged and dist.converged
    assert loc.iterations == dist.iterations
    for k, v in _ranks(loc).items():
        assert v == pytest.approx(_ranks(dist)[k], abs=1e-12)


@pytest.mark.parametrize("kwargs", [
    {},
    {"consecutive_ids": True},
    {"threshold": 2.0},
])
def test_wcc_local_matches_distributed(spark, kwargs):
    g = from_edge_list(spark, WEIGHTED, n_nodes=10)  # node 9 isolated
    loc = wcc(g, WccConfig(small_graph_edges=FORCE_LOCAL, **kwargs))
    dist = wcc(g, WccConfig(small_graph_edges=FORCE_DIST, **kwargs))
    cl = {r["id"]: r["component"] for r in loc.state.collect()}
    cd = {r["id"]: r["component"] for r in dist.state.collect()}
    assert cl == cd


def test_wcc_local_seeded(spark):
    g = from_edge_list(spark, [(0, 1), (2, 3)], n_nodes=5)
    nodes = g.nodes.withColumn("seed", F.col("id") + 100)
    from neo4j_graph_data_science_spark.catalog import SparkGraph

    gs = SparkGraph(nodes=nodes, edges=g.edges)
    loc = wcc(gs, WccConfig(seed_property="seed",
                            small_graph_edges=FORCE_LOCAL))
    dist = wcc(gs, WccConfig(seed_property="seed",
                             small_graph_edges=FORCE_DIST))
    cl = {r["id"]: r["component"] for r in loc.state.collect()}
    cd = {r["id"]: r["component"] for r in dist.state.collect()}
    assert cl == cd
    assert cl[0] == cl[1] == 100 and cl[2] == cl[3] == 102 and cl[4] == 104


def test_lpa_local_matches_distributed(spark):
    g = from_edge_list(spark, EDGES, n_nodes=8)
    loc = label_propagation(
        g, LabelPropagationConfig(max_iterations=7,
                                  small_graph_edges=FORCE_LOCAL))
    dist = label_propagation(
        g, LabelPropagationConfig(max_iterations=7,
                                  small_graph_edges=FORCE_DIST))
    ll = {r["id"]: r["label"] for r in loc.state.collect()}
    ld = {r["id"]: r["label"] for r in dist.state.collect()}
    assert ll == ld
    assert loc.iterations == dist.iterations
    assert loc.converged == dist.converged


def test_lpa_local_directed_and_seeded(spark):
    g = from_edge_list(spark, [(0, 1), (1, 2), (3, 2)], n_nodes=4)
    from neo4j_graph_data_science_spark.catalog import SparkGraph

    nodes = g.nodes.withColumn("seed", F.lit(7) + F.col("id") % 2)
    gs = SparkGraph(nodes=nodes, edges=g.edges)
    for kwargs in ({"undirected": False}, {"seed_property": "seed"}):
        loc = label_propagation(
            gs, LabelPropagationConfig(max_iterations=5,
                                       small_graph_edges=FORCE_LOCAL,
                                       **kwargs))
        dist = label_propagation(
            gs, LabelPropagationConfig(max_iterations=5,
                                       small_graph_edges=FORCE_DIST,
                                       **kwargs))
        ll = {r["id"]: r["label"] for r in loc.state.collect()}
        ld = {r["id"]: r["label"] for r in dist.state.collect()}
        assert ll == ld, kwargs


def test_hits_local_matches_distributed(spark):
    from neo4j_graph_data_science_spark.operators.centrality import (
        HitsConfig, hits,
    )

    # parallel edge (0,1) twice: multigraph sums must be preserved
    g = from_edge_list(spark, EDGES + [(0, 1)], n_nodes=8)
    loc = hits(g, HitsConfig(hits_iterations=6,
                             small_graph_edges=FORCE_LOCAL))
    dist = hits(g, HitsConfig(hits_iterations=6,
                              small_graph_edges=FORCE_DIST))
    dl = {r["id"]: (r["auth"], r["hub"]) for r in loc.collect()}
    dd = {r["id"]: (r["auth"], r["hub"]) for r in dist.collect()}
    assert dl.keys() == dd.keys()
    for k in dl:
        assert dl[k][0] == pytest.approx(dd[k][0], abs=1e-9)
        assert dl[k][1] == pytest.approx(dd[k][1], abs=1e-9)


PATH_EDGES = [
    (0, 1, 1.0), (0, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0),  # two 0->3 ties
    (3, 4, 1.0), (4, 5, 2.5), (0, 8, 7.0), (8, 5, 0.5),
    (6, 7, 1.0),                                          # unreachable pair
]


def _path_rows(df):
    return sorted(
        (r["target"], r["total_cost"], tuple(r["node_ids"]),
         tuple(r["costs"]) if "costs" in df.columns else ())
        for r in df.collect())


def test_dijkstra_paths_local_matches_distributed(spark):
    from neo4j_graph_data_science_spark.operators.paths import (
        PathConfig, dijkstra,
    )

    g = from_edge_list(spark, PATH_EDGES, n_nodes=9)
    loc = dijkstra(g, 0, config=PathConfig(small_graph_edges=FORCE_LOCAL))
    dist = dijkstra(g, 0, config=PathConfig(small_graph_edges=FORCE_DIST))
    assert _path_rows(loc) == _path_rows(dist)
    # single target (exercises the pruned distributed path too)
    lt = dijkstra(g, 0, target=5,
                  config=PathConfig(small_graph_edges=FORCE_LOCAL))
    dt = dijkstra(g, 0, target=5,
                  config=PathConfig(small_graph_edges=FORCE_DIST))
    assert _path_rows(lt) == _path_rows(dt)
    assert _path_rows(lt)[0][2] == (0, 1, 3, 4, 5)
    # unreachable target
    assert dijkstra(g, 0, target=7,
                    config=PathConfig(small_graph_edges=FORCE_LOCAL)) \
        .collect() == []


def test_bfs_and_sssp_local_match_distributed(spark):
    from neo4j_graph_data_science_spark.operators.paths import (
        PathConfig, bfs, shortest_paths,
    )

    g = from_edge_list(spark, PATH_EDGES, n_nodes=9)
    for fn in (bfs, shortest_paths):
        loc = fn(g, [0, 6], PathConfig(small_graph_edges=FORCE_LOCAL))
        dist = fn(g, [0, 6], PathConfig(small_graph_edges=FORCE_DIST))
        dl = {r["id"]: r["dist"] for r in loc.collect()}
        dd = {r["id"]: r["dist"] for r in dist.collect()}
        assert dl == dd, fn.__name__
    # DataFrame-typed source set (the Steiner call shape)
    src_df = spark.createDataFrame([(0,), (6,)], "id long")
    loc = shortest_paths(g, src_df, PathConfig(small_graph_edges=FORCE_LOCAL))
    dd = {r["id"]: r["dist"] for r in shortest_paths(
        g, src_df, PathConfig(small_graph_edges=FORCE_DIST)).collect()}
    assert {r["id"]: r["dist"] for r in loc.collect()} == dd


def test_astar_local_matches_distributed(spark):
    from pyspark.sql import functions as SF

    from neo4j_graph_data_science_spark.operators.paths import (
        PathConfig, astar,
    )

    g = from_edge_list(spark, PATH_EDGES, n_nodes=9)
    h = g.nodes.select("id", SF.lit(0.0).alias("h"))
    loc = astar(g, 0, 5, h, PathConfig(small_graph_edges=FORCE_LOCAL))
    dist = astar(g, 0, 5, h, PathConfig(small_graph_edges=FORCE_DIST))
    lr, dr = loc.collect(), dist.collect()
    assert len(lr) == len(dr) == 1
    assert lr[0]["total_cost"] == dr[0]["total_cost"]
    assert list(lr[0]["node_ids"]) == list(dr[0]["node_ids"])


def test_scc_local_matches_distributed(spark):
    from neo4j_graph_data_science_spark.operators.scc import SccConfig, scc

    # two cycles bridged one-way, a chain, a self-loop, an isolate
    edges = [
        (0, 1), (1, 2), (2, 0),          # SCC {0,1,2}
        (2, 3), (3, 4), (4, 3),          # SCC {3,4}
        (5, 6),                          # singletons
        (7, 7),                          # self-loop singleton
    ]
    g = from_edge_list(spark, edges, n_nodes=9)
    loc = scc(g, SccConfig(small_graph_edges=FORCE_LOCAL))
    dist = scc(g, SccConfig(small_graph_edges=FORCE_DIST))
    cl = {r["id"]: r["component"] for r in loc.collect()}
    cd = {r["id"]: r["component"] for r in dist.collect()}
    assert cl == cd
    assert cl[0] == cl[1] == cl[2] == 0 and cl[3] == cl[4] == 3
    assert cl[5] == 5 and cl[6] == 6 and cl[7] == 7 and cl[8] == 8


def test_kill_switch_env(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_KERNEL", "0")
    g = from_edge_list(spark, EDGES, n_nodes=8)
    res = page_rank(g, PageRankConfig(small_graph_edges=FORCE_LOCAL))
    assert not (res.metrics and res.metrics[0].get("kernel") == "local-task")
