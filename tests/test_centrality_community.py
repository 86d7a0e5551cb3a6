"""Unit tests: HITS, harmonic/closeness, k-core, K1-coloring, modularity,
conductance -- tiny hand-computed fixtures in the reference's GDL style."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from neo4j_graph_data_science_spark.catalog import from_edge_list
from neo4j_graph_data_science_spark.operators.centrality import (
    ClosenessConfig,
    HitsConfig,
    closeness_centrality,
    harmonic_centrality,
    hits,
)
from neo4j_graph_data_science_spark.operators.community import (
    conductance,
    k1_coloring,
    k_core,
    modularity,
)


def _hits_numpy(edges, n, iters):
    auth = np.zeros(n)
    hub = np.ones(n)
    for s, t in edges:
        auth[t] += 1.0
    auth /= np.linalg.norm(auth) or 1.0
    for _ in range(iters):
        a = np.zeros(n)
        for s, t in edges:
            a[t] += hub[s]
        a /= np.linalg.norm(a) or 1.0
        h = np.zeros(n)
        for s, t in edges:
            h[s] += a[t]
        h /= np.linalg.norm(h) or 1.0
        auth, hub = a, h
    return auth, hub


def test_hits_matches_numpy(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
    g = from_edge_list(spark, edges, n_nodes=4)
    out = {r["id"]: (r["auth"], r["hub"])
           for r in hits(g, HitsConfig(hits_iterations=5)).collect()}
    auth, hub = _hits_numpy(edges, 4, 5)
    for v in range(4):
        assert math.isclose(out[v][0], auth[v], abs_tol=1e-9), (v, out[v], auth[v])
        assert math.isclose(out[v][1], hub[v], abs_tol=1e-9), (v, out[v], hub[v])


def test_harmonic_path_graph(spark):
    # 0 -> 1 -> 2: d(0,1)=1, d(0,2)=2, d(1,2)=1
    g = from_edge_list(spark, [(0, 1), (1, 2)], n_nodes=3)
    out = {r["id"]: r["centrality"] for r in harmonic_centrality(g).collect()}
    assert math.isclose(out[0], 0.0, abs_tol=1e-12)
    assert math.isclose(out[1], (1.0) / 2, abs_tol=1e-12)
    assert math.isclose(out[2], (1.0 + 0.5) / 2, abs_tol=1e-12)


def test_closeness_undirected_path(spark):
    g = from_edge_list(spark, [(0, 1), (1, 0), (1, 2), (2, 1)], n_nodes=3)
    out = {r["id"]: r["centrality"] for r in closeness_centrality(g).collect()}
    # node 1: reaches {0,2} at dist 1 each: closeness = 2/2 = 1
    assert math.isclose(out[1], 1.0, abs_tol=1e-12)
    # node 0: dists {1:1, 2:2}: closeness = 2/3
    assert math.isclose(out[0], 2 / 3, abs_tol=1e-12)


def test_k_core_triangle_with_tail(spark):
    # triangle 0-1-2 (core 2), tail 2-3 (core 1), isolated 4 (core 0)
    g = from_edge_list(spark, [(0, 1), (1, 2), (0, 2), (2, 3)], n_nodes=5)
    out = {r["id"]: r["core"] for r in k_core(g).collect()}
    assert out == {0: 2, 1: 2, 2: 2, 3: 1, 4: 0}


def test_k_core_two_nested_cores(spark):
    # K4 on {0,1,2,3} (core 3) with pendant path 3-4-5
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    g = from_edge_list(spark, k4 + [(3, 4), (4, 5)], n_nodes=6)
    out = {r["id"]: r["core"] for r in k_core(g).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3, 4: 1, 5: 1}


def test_k1_coloring_valid(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 0), (1, 4)]
    g = from_edge_list(spark, edges, n_nodes=5)
    colors = {r["id"]: r["color"] for r in k1_coloring(g).collect()}
    for a, b in edges:
        assert colors[a] != colors[b], (a, b, colors)
    assert max(colors.values()) <= 4


def test_modularity_two_cliques(spark):
    # two triangles joined by one bridge; perfect 2-community split
    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(3, 4), (4, 5), (3, 5)]
    bridge = [(2, 3)]
    g = from_edge_list(spark, tri1 + tri2 + bridge, n_nodes=6)
    comm = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "id long, community long"
    )
    row = modularity(g, comm).collect()[0]
    # m=7; community degrees: c0 = 2+2+3=7, c1 = 7; intra = 3 each
    expected = sum(3 / 7 - (7 / 14) ** 2 for _ in range(2))
    assert math.isclose(row["modularity"], expected, abs_tol=1e-12)
    assert row["community_count"] == 2


def test_conductance_hand_computed(spark):
    # directed edges; community 0 = {0,1}, community 1 = {2,3}
    # from c0: internal 0->1; external 1->2 (w=1 each)
    # from c1: internal 2->3, 3->2; external 3->0
    g = from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (3, 2), (3, 0)], n_nodes=4)
    comm = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, community long"
    )
    out = {r["community"]: r["conductance"] for r in conductance(g, comm).collect()}
    assert math.isclose(out[0], 1 / 2, abs_tol=1e-12)
    assert math.isclose(out[1], 1 / 3, abs_tol=1e-12)
