"""k-clique counting on known fixtures."""

from __future__ import annotations

from itertools import combinations

from neo4j_graph_data_science_spark.catalog import from_edge_list
from neo4j_graph_data_science_spark.operators.cliques import (
    CliqueCountingConfig,
    clique_counting,
)


def test_k5_complete_graph(spark):
    # K5: C(5,3)=10 triangles, C(5,4)=5 4-cliques, 1 5-clique
    edges = [(a, b) for a, b in combinations(range(5), 2)]
    g = from_edge_list(spark, edges, n_nodes=5)
    gdf, pdf = clique_counting(g, CliqueCountingConfig(max_k=5))
    got = {r["k"]: r["count"] for r in gdf.collect()}
    assert got == {3: 10, 4: 5, 5: 1}
    per = {(r["id"], r["k"]): r["count"] for r in pdf.collect()}
    # every node of K5 is in C(4,2)=6 triangles, C(4,3)=4 4-cliques, 1 5-clique
    for v in range(5):
        assert per[(v, 3)] == 6 and per[(v, 4)] == 4 and per[(v, 5)] == 1


def test_two_triangles_share_edge(spark):
    # {0,1,2} and {1,2,3}: two triangles, no 4-clique (0-3 missing)
    g = from_edge_list(spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)], n_nodes=4)
    gdf, pdf = clique_counting(g, CliqueCountingConfig(max_k=4))
    got = {r["k"]: r["count"] for r in gdf.collect()}
    assert got[3] == 2 and got.get(4, 0) == 0
    per = {(r["id"], r["k"]): r["count"] for r in pdf.collect()}
    assert per[(1, 3)] == 2 and per[(0, 3)] == 1
