"""SLLPA overlapping community structure."""

from __future__ import annotations

from neo4j_graph_data_science_spark.catalog import from_edge_list
from neo4j_graph_data_science_spark.operators.sllpa import SllpaConfig, sllpa


def test_sllpa_overlap_bridge(spark):
    # two 4-cliques sharing bridge node 4: the bridge should end up
    # associated with labels from both sides, interior nodes with one
    k1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]        # 0..3
    k2 = [(a, b) for a in range(5, 9) for b in range(a + 1, 9)]     # 5..8
    bridge = [(3, 4), (4, 5)]
    g = from_edge_list(spark, k1 + k2 + bridge, n_nodes=9)
    out = {r["id"]: list(r["community_ids"])
           for r in sllpa(g, SllpaConfig(max_iterations=12,
                                         min_association_strength=0.15)).collect()}
    assert all(len(v) >= 1 for v in out.values())
    # interior nodes of the two cliques must not share any community label
    left = set(out[0]) | set(out[1]) | set(out[2])
    right = set(out[6]) | set(out[7]) | set(out[8])
    assert left.isdisjoint(right)


def test_sllpa_single_clique_one_community(spark):
    k = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    g = from_edge_list(spark, k, n_nodes=5)
    out = {r["id"]: list(r["community_ids"]) for r in sllpa(g).collect()}
    # one dominant label shared by everyone
    from collections import Counter
    common = Counter(l for v in out.values() for l in v).most_common(1)[0]
    assert common[1] == 5
