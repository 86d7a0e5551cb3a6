"""Steiner tree heuristic + NN-Descent KNN."""

from __future__ import annotations

from neo4j_graph_data_science_spark.catalog import from_edge_list
from neo4j_graph_data_science_spark.operators.ann import (
    brute_force_topk,
    nn_descent_topk,
)
from neo4j_graph_data_science_spark.operators.spanningtree import steiner_tree


def test_steiner_connects_terminals(spark):
    # grid-ish: 0-1-2-3 chain, branch 1-4, branch 2-5 (all w1), detour 0-5 w10
    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (1, 4, 1.0),
             (2, 5, 1.0), (0, 5, 10.0)]
    g = from_edge_list(spark, edges, n_nodes=6)
    tree = steiner_tree(g, 0, [3, 4, 5])
    got = {(r["src"], r["dst"]) for r in tree.collect()}
    # cheapest union of shortest paths: 0-1,1-2,2-3,1-4,2-5 (total 5)
    assert got == {(0, 1), (1, 2), (2, 3), (1, 4), (2, 5)}
    total = sum(r["weight"] for r in tree.collect())
    assert total == 5.0


def test_nn_descent_recall(spark):
    import math
    rows = []
    # 3 clusters of 8 vectors in 6-d
    for c in range(3):
        base = [0.0] * 6
        base[c] = 5.0
        for i in range(8):
            v = list(base)
            v[(c + 1) % 6] += (i % 4) * 0.1
            rows.append((c * 8 + i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = brute_force_topk(df, df, k=3)
    approx = nn_descent_topk(df, k=3, iterations=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, recall
