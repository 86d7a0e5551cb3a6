"""DAG longest path + DFS preorder."""

from __future__ import annotations

from neo4j_graph_data_science_spark.catalog import from_edge_list
from neo4j_graph_data_science_spark.operators.paths import dag_longest_path, dfs


def test_dag_longest_path_unweighted(spark):
    # 0->1->2->3, shortcut 0->2, side 0->4
    g = from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (0, 2), (0, 4)],
                       n_nodes=5)
    rows = {r["target"]: r for r in dag_longest_path(g).collect()}
    assert rows[3]["total_cost"] == 3.0
    assert list(rows[3]["node_ids"]) == [0, 1, 2, 3]
    assert rows[2]["total_cost"] == 2.0
    assert rows[4]["total_cost"] == 1.0
    assert rows[0]["total_cost"] == 0.0 and list(rows[0]["node_ids"]) == [0]


def test_dag_longest_path_weighted(spark):
    g = from_edge_list(spark, [(0, 1, 1.0), (1, 3, 1.0), (0, 2, 5.0),
                               (2, 3, 1.0)], n_nodes=4)
    rows = {r["target"]: r for r in dag_longest_path(g, weighted=True).collect()}
    assert rows[3]["total_cost"] == 6.0
    assert list(rows[3]["node_ids"]) == [0, 2, 3]


def test_dfs_preorder(spark):
    # binary tree 0 -> (1,2), 1 -> (3,4): preorder with ascending-neighbor
    # order = 0,1,3,4,2
    g = from_edge_list(spark, [(0, 1), (0, 2), (1, 3), (1, 4)], n_nodes=5)
    order = {r["id"]: r["visit_order"] for r in dfs(g, 0).collect()}
    assert order == {0: 0, 1: 1, 3: 2, 4: 3, 2: 4}


def test_dfs_max_depth(spark):
    g = from_edge_list(spark, [(0, 1), (1, 2), (2, 3)], n_nodes=4)
    got = {r["id"] for r in dfs(g, 0, max_depth=1).collect()}
    assert got == {0, 1}
