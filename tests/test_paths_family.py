"""Shortest-path family with path objects: Dijkstra/A*/Yens/Bellman-Ford/
delta-stepping vs hand-checked fixtures (Yens uses the textbook example
from the reference's paths/yens tests)."""

from __future__ import annotations

import pytest

from neo4j_graph_data_science_spark.catalog import from_edge_list
from neo4j_graph_data_science_spark.operators.paths import (
    PathConfig,
    astar,
    bellman_ford,
    delta_stepping,
    dijkstra,
    shortest_paths,
    yens,
)

# 0->1 w4, 0->2 w1, 2->1 w2, 1->3 w1, 2->3 w5
WG = [(0, 1, 4.0), (0, 2, 1.0), (2, 1, 2.0), (1, 3, 1.0), (2, 3, 5.0)]


def test_dijkstra_paths(spark):
    g = from_edge_list(spark, WG, n_nodes=4)
    rows = {r["target"]: r for r in dijkstra(g, 0).collect()}
    assert rows[1]["total_cost"] == 3.0
    assert list(rows[1]["node_ids"]) == [0, 2, 1]
    assert list(rows[1]["costs"]) == [0.0, 1.0, 3.0]
    assert rows[3]["total_cost"] == 4.0
    assert list(rows[3]["node_ids"]) == [0, 2, 1, 3]
    assert rows[2]["total_cost"] == 1.0


def test_dijkstra_source_target(spark):
    g = from_edge_list(spark, WG, n_nodes=4)
    rows = dijkstra(g, 0, target=3).collect()
    assert len(rows) == 1 and rows[0]["total_cost"] == 4.0


def test_astar_matches_dijkstra(spark):
    g = from_edge_list(spark, WG, n_nodes=4)
    # admissible heuristic: true remaining distance to 3 (tightest bound)
    h = spark.createDataFrame([(0, 4.0), (1, 1.0), (2, 3.0), (3, 0.0)],
                              "id long, h double")
    rows = astar(g, 0, 3, h).collect()
    assert len(rows) == 1
    assert rows[0]["total_cost"] == 4.0
    assert list(rows[0]["node_ids"]) == [0, 2, 1, 3]


def test_yens_k3(spark):
    # Yen's classic example: C0 D1 E2 F3 G4 H5
    edges = [(0, 1, 3.0), (0, 2, 2.0), (1, 3, 4.0), (2, 1, 1.0),
             (2, 3, 2.0), (2, 4, 3.0), (3, 4, 2.0), (3, 5, 1.0), (4, 5, 2.0)]
    g = from_edge_list(spark, edges, n_nodes=6)
    rows = yens(g, 0, 5, k=3).collect()
    got = [(r["total_cost"], list(r["node_ids"])) for r in rows]
    assert got[0] == (5.0, [0, 2, 3, 5])
    assert got[1] == (7.0, [0, 2, 4, 5])
    assert got[2][0] == 8.0


def test_bellman_ford_negative_cycle(spark):
    edges = [(0, 1, 1.0), (1, 2, -1.0), (2, 1, -1.0), (2, 3, 1.0), (0, 4, 5.0)]
    g = from_edge_list(spark, edges, n_nodes=5)
    rows = {r["id"]: r for r in bellman_ford(g, 0).collect()}
    assert not rows[0]["in_negative_cycle"] and rows[0]["dist"] == 0.0
    assert not rows[4]["in_negative_cycle"] and rows[4]["dist"] == 5.0
    for v in (1, 2, 3):
        assert rows[v]["in_negative_cycle"]
        assert rows[v]["dist"] == float("-inf")


def test_bellman_ford_negative_cycle_paths(spark):
    """BellmanFord.java:49 streams the actual cycle (NegativeCycle result),
    not just a taint flag: unique negative cycle 2->3->4->2 (cost -3),
    rotation-normalized to start at its min member."""
    from neo4j_graph_data_science_spark.operators.paths import (
        bellman_ford_negative_cycles,
    )

    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, -1.0), (3, 4, -1.0),
             (4, 2, -1.0), (4, 5, 2.0)]
    g = from_edge_list(spark, edges, n_nodes=6)
    rows = bellman_ford_negative_cycles(g, 0).collect()
    assert len(rows) == 1
    assert list(rows[0]["node_ids"]) == [2, 3, 4, 2]
    assert rows[0]["total_cost"] == -3.0


def test_bellman_ford_negative_cycles_empty_without_cycle(spark):
    from neo4j_graph_data_science_spark.operators.paths import (
        bellman_ford_negative_cycles,
    )

    g = from_edge_list(spark, WG, n_nodes=4)
    assert bellman_ford_negative_cycles(g, 0).count() == 0


def test_bellman_ford_no_cycle(spark):
    g = from_edge_list(spark, WG, n_nodes=4)
    rows = {r["id"]: r for r in bellman_ford(g, 0).collect()}
    assert all(not r["in_negative_cycle"] for r in rows.values())
    assert rows[3]["dist"] == 4.0


def test_delta_stepping_matches_sssp(spark):
    g = from_edge_list(spark, WG, n_nodes=4)
    exact = {r["id"]: r["dist"] for r in shortest_paths(g, [0]).collect()}
    ds = {r["id"]: r["dist"] for r in delta_stepping(g, 0, delta=2.0).collect()}
    assert ds == pytest.approx(exact)


def test_delta_stepping_heavy_edges_on_optimal_paths(spark):
    # every path to 1/2/3 crosses a HEAVY edge (w > delta): regression for
    # the heavy pass running after the light loop un-pends the bucket
    heavy = [(0, 1, 10.0), (1, 2, 1.0), (0, 2, 12.0), (2, 3, 5.0)]
    g = from_edge_list(spark, heavy, n_nodes=4)
    exact = {r["id"]: r["dist"] for r in shortest_paths(g, [0]).collect()}
    ds = {r["id"]: r["dist"] for r in delta_stepping(g, 0, delta=2.0).collect()}
    assert ds == pytest.approx(exact)
    assert ds[3] == 16.0


def test_dijkstra_target_pruned_matches_full_fixpoint(spark):
    # a graph with (a) equal-cost shortest-path TIES to the target so the
    # deterministic min-pred tie-break is exercised, and (b) a long tail
    # BEYOND the target that the pruned run never needs to finalize.
    edges = [
        (0, 1, 1.0), (0, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0),  # two 0->3 ties
        (3, 4, 1.0),                                          # target hop
        (4, 5, 1.0), (5, 6, 1.0), (6, 7, 1.0), (7, 8, 1.0),   # tail past tgt
        (0, 8, 1.0),                                          # decoy into tail
    ]
    g = from_edge_list(spark, edges, n_nodes=9)
    pruned = dijkstra(g, 0, target=4).collect()
    # full fixpoint for the same target: all-targets run, then filter
    full = [r for r in dijkstra(g, 0).collect() if r["target"] == 4]
    assert len(pruned) == 1 and len(full) == 1
    assert pruned[0]["total_cost"] == full[0]["total_cost"] == 3.0
    assert list(pruned[0]["node_ids"]) == list(full[0]["node_ids"]) == [0, 1, 3, 4]
    assert list(pruned[0]["costs"]) == list(full[0]["costs"])


def test_dijkstra_target_unreachable_pruned(spark):
    g = from_edge_list(spark, [(0, 1, 2.0)], n_nodes=3)
    assert dijkstra(g, 0, target=2).collect() == []


def test_dijkstra_zero_weight_falls_back(spark):
    # zero-weight edge on a shortest path: the positive-weight gate must
    # route to the full fixpoint and still return the right path
    edges = [(0, 1, 0.0), (1, 2, 1.0), (0, 2, 2.0)]
    g = from_edge_list(spark, edges, n_nodes=3)
    rows = dijkstra(g, 0, target=2).collect()
    assert len(rows) == 1
    assert rows[0]["total_cost"] == 1.0
    assert list(rows[0]["node_ids"]) == [0, 1, 2]


def test_bellman_ford_all_negative_cycles(spark):
    """The reference result type carries ALL discovered cycles
    (BellmanFord.java:49): two disjoint negative rings plus a self-loop,
    each reconstructed rotation-normalized, ordered by minimum member."""
    from neo4j_graph_data_science_spark.operators.paths import (
        bellman_ford_all_negative_cycles,
    )

    # three cycles fed IN PARALLEL from the source: a cycle downstream of
    # another negative cycle is masked in the predecessor graph (its preds
    # chase the unboundedly-decreasing upstream chain) -- the reference's
    # per-tainted-node pred traces discover the same set
    edges = [
        (0, 1, 1.0), (0, 10, 1.0), (0, 20, 1.0),     # source feeds
        (1, 2, -1.0), (2, 3, -1.0), (3, 1, -1.0),    # ring A: 1->2->3->1 (-3)
        (10, 11, -0.5), (11, 10, -0.5),              # ring B: 10->11 (-1)
        (20, 20, -2.0),                              # self-loop cycle at 20
    ]
    g = from_edge_list(spark, edges, node_ids=[0, 1, 2, 3, 10, 11, 20])
    rows = bellman_ford_all_negative_cycles(g, 0).collect()
    got = {tuple(r["node_ids"]): (r["index"], r["total_cost"]) for r in rows}
    assert (1, 2, 3, 1) in got and got[(1, 2, 3, 1)][1] == -3.0
    assert (10, 11, 10) in got and got[(10, 11, 10)][1] == -1.0
    assert (20, 20) in got and got[(20, 20)][1] == -2.0
    assert len(rows) == 3
    assert [r["index"] for r in sorted(rows, key=lambda r: min(r["node_ids"]))] == [0, 1, 2]


def test_bellman_ford_all_negative_cycles_empty(spark):
    from neo4j_graph_data_science_spark.operators.paths import (
        bellman_ford_all_negative_cycles,
    )

    g = from_edge_list(spark, WG, n_nodes=4)
    assert bellman_ford_all_negative_cycles(g, 0).count() == 0


def test_bellman_ford_all_cycles_drops_unfinished_walkers(spark):
    """A cycle longer than max_walk must be dropped, not emitted as a
    non-closed sequence with a partial cost."""
    from neo4j_graph_data_science_spark.operators.paths import (
        bellman_ford_all_negative_cycles,
    )

    edges = [(0, 1, 1.0),
             (1, 2, -1.0), (2, 3, -1.0), (3, 4, -1.0), (4, 1, -1.0)]
    g = from_edge_list(spark, edges, n_nodes=5)
    assert bellman_ford_all_negative_cycles(g, 0, max_walk=2).count() == 0
    full = bellman_ford_all_negative_cycles(g, 0).collect()
    assert len(full) == 1 and list(full[0].node_ids) == [1, 2, 3, 4, 1]

def test_yens_batched_multi_spur_parity(spark):
    """Round-4 verdict #5: in the distributed regime every k-iteration's
    spur candidates run as ONE multi-source masked Dijkstra
    (_multi_spur_dijkstra) instead of one collected Dijkstra per spur.
    Parity: the batched path (small_graph_edges=0 forces distributed)
    returns exactly the subcritical-kernel answer on Yen's classic
    example AND on a larger graph with unique weights; and dijkstra() is
    invoked only once (the initial path), proving the spur loop never
    falls back to per-spur jobs."""
    from neo4j_graph_data_science_spark.operators import paths as pmod

    edges = [(0, 1, 3.0), (0, 2, 2.0), (1, 3, 4.0), (2, 1, 1.0),
             (2, 3, 2.0), (2, 4, 3.0), (3, 4, 2.0), (3, 5, 1.0), (4, 5, 2.0)]
    g = from_edge_list(spark, edges, n_nodes=6)
    base = [(r["total_cost"], list(r["node_ids"]))
            for r in yens(g, 0, 5, k=3).collect()]

    calls = {"n": 0}
    orig = pmod.dijkstra

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    pmod.dijkstra = counting
    try:
        cfg = pmod.PathConfig(small_graph_edges=0)
        got = [(r["total_cost"], list(r["node_ids"]))
               for r in pmod.yens(g, 0, 5, k=3, config=cfg).collect()]
    finally:
        pmod.dijkstra = orig
    assert got == base
    assert calls["n"] == 1  # only the initial shortest path

    # larger graph, unique weights, deeper k: exclusion masks must bite
    big = [(i, (i * 7 + 3) % 40, 1.0 + ((i * 13) % 17) / 16.0)
           for i in range(40)] + \
          [(i, (i + 1) % 40, 1.0 + ((i * 5) % 11) / 8.0) for i in range(40)]
    g2 = from_edge_list(spark, big, n_nodes=40)
    base2 = [(round(r["total_cost"], 9), list(r["node_ids"]))
             for r in yens(g2, 0, 23, k=4).collect()]
    got2 = [(round(r["total_cost"], 9), list(r["node_ids"]))
            for r in yens(g2, 0, 23, k=4,
                          config=pmod.PathConfig(small_graph_edges=0)).collect()]
    assert got2 == base2
    assert len(got2) == 4
