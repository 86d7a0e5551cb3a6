"""Boruvka spanning forest vs a python Kruskal with the same tie-break."""

from __future__ import annotations

from neo4j_graph_data_science_spark.catalog import from_edge_list
from neo4j_graph_data_science_spark.operators.spanningtree import (
    SpanningTreeConfig,
    spanning_tree,
)


def _kruskal(edges, n, maximum=False):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    tree = []
    key = sorted(((w if not maximum else -w, min(a, b), max(a, b), w)
                  for a, b, w in edges))
    for _, a, b, w in key:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            tree.append((a, b, w))
    return sorted(tree)


EDGES = [(0, 1, 4.0), (0, 2, 1.0), (1, 2, 2.0), (1, 3, 5.0), (2, 3, 8.0),
         (3, 4, 3.0), (4, 5, 1.5), (3, 5, 9.0), (6, 7, 2.5)]  # 2 components


def test_mst_matches_kruskal(spark):
    g = from_edge_list(spark, EDGES, n_nodes=8)
    got = sorted((r["src"], r["dst"], r["weight"])
                 for r in spanning_tree(g).collect())
    assert got == _kruskal(EDGES, 8)
    assert len(got) == 6  # n - #components = 8 - 2


def test_maximum_spanning_tree(spark):
    g = from_edge_list(spark, EDGES, n_nodes=8)
    got = sorted((r["src"], r["dst"], r["weight"])
                 for r in spanning_tree(
                     g, config=SpanningTreeConfig(objective="maximum")).collect())
    assert got == _kruskal(EDGES, 8, maximum=True)


def test_start_node_restricts_component(spark):
    g = from_edge_list(spark, EDGES, n_nodes=8)
    got = sorted((r["src"], r["dst"]) for r in spanning_tree(g, start_node=6).collect())
    assert got == [(6, 7)]


def test_k_spanning_tree(spark):
    from neo4j_graph_data_science_spark.operators.spanningtree import (
        k_spanning_tree,
    )
    # chain 0-1-2-3-4 with one heavy edge (2-3, w 10): k=2 must cut there
    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 10.0), (3, 4, 1.0)]
    g = from_edge_list(spark, edges, n_nodes=5)
    comm = {r["id"]: r["community"] for r in k_spanning_tree(g, 2).collect()}
    assert comm[0] == comm[1] == comm[2]
    assert comm[3] == comm[4]
    assert comm[0] != comm[3]


def _prizes(spark, d):
    return spark.createDataFrame(list(d.items()), "id long, prize double")


def test_prize_steiner_severs_unprofitable_edge(spark):
    from neo4j_graph_data_science_spark.operators.spanningtree import (
        prize_steiner_tree,
    )
    # path 1-2 (1.0) -2-3 (5.0) -3-4 (1.0); prizes 2 each: the 5.0 edge
    # costs more than either side's subtree gain, so the tree splits and
    # the best half (tie -> min root id) survives: {1,2} net worth 3
    edges = [(1, 2, 1.0), (2, 3, 5.0), (3, 4, 1.0)]
    g = from_edge_list(spark, edges, n_nodes=0, node_ids=[1, 2, 3, 4])
    rows = prize_steiner_tree(
        g, _prizes(spark, {1: 2.0, 2: 2.0, 3: 2.0, 4: 2.0})).collect()
    got = {r["id"]: (r["parent"], r["cost"]) for r in rows}
    assert set(got) == {1, 2}
    assert got[2] == (-1, None)
    assert got[1] == (2, 1.0)


def test_prize_steiner_keeps_zero_prize_connector(spark):
    from neo4j_graph_data_science_spark.operators.spanningtree import (
        prize_steiner_tree,
    )
    # star: 1-0 (1.0), 0-2 (1.0), plus an unprofitable spur 0-3 (10.0, prize 1)
    edges = [(1, 0, 1.0), (0, 2, 1.0), (0, 3, 10.0)]
    g = from_edge_list(spark, edges, n_nodes=4)
    rows = prize_steiner_tree(
        g, _prizes(spark, {1: 5.0, 2: 5.0, 3: 1.0})).collect()
    got = {r["id"]: (r["parent"], r["cost"]) for r in rows}
    assert set(got) == {0, 1, 2}          # spur 3 pruned, connector 0 kept
    assert got[0] == (-1, None)
    assert got[1] == (0, 1.0) and got[2] == (0, 1.0)


def test_prize_steiner_isolated_high_prize_wins(spark):
    from neo4j_graph_data_science_spark.operators.spanningtree import (
        prize_steiner_tree,
    )
    # best solution is a singleton: isolated node 9 with prize 100
    edges = [(0, 1, 1.0), (1, 2, 1.0)]
    g = from_edge_list(spark, edges, n_nodes=0, node_ids=[0, 1, 2, 9])
    rows = prize_steiner_tree(
        g, _prizes(spark, {0: 1.0, 1: 1.0, 2: 1.0, 9: 100.0})).collect()
    assert {r["id"] for r in rows} == {9}
    assert rows[0]["parent"] == -1
