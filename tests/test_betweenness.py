"""Brandes betweenness vs the reference's own expected values
(algo/src/test/java/org/neo4j/gds/betweenness/BetweennessCentralityTest.java:
LINE / CYCLE / CLIQUE_5 / CONNECTED_CYCLES / DIAMOND fixtures)."""

from __future__ import annotations

import pytest

from neo4j_graph_data_science_spark.catalog import from_edge_list
from neo4j_graph_data_science_spark.operators.betweenness import (
    BetweennessConfig,
    betweenness,
)

LINE = [(0, 1), (1, 2), (2, 3), (3, 4)]
CYCLE = [(0, 1), (1, 2), (2, 0)]
CLIQUE_5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
CONNECTED_CYCLES = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (0, 3), (3, 0)]
# a1=0 a2=1 b=2 c=3 d=4 e=5 f=6
DIAMOND = [(0, 2), (1, 2), (2, 3), (2, 4), (3, 5), (4, 5), (5, 6)]


def _scores(spark, edges, n, undirected=False, **kw):
    g = from_edge_list(spark, edges, n_nodes=n)
    res = betweenness(g, BetweennessConfig(undirected=undirected, **kw))
    return {r["id"]: r["score"] for r in res.collect()}


@pytest.mark.parametrize(
    "edges,n,undirected,expected",
    [
        (LINE, 5, False, {0: 0.0, 1: 3.0, 2: 4.0, 3: 3.0, 4: 0.0}),
        (CYCLE, 3, False, {0: 1.0, 1: 1.0, 2: 1.0}),
        (CLIQUE_5, 5, False, {i: 0.0 for i in range(5)}),
        (CLIQUE_5, 5, True, {i: 0.0 for i in range(5)}),
        (CONNECTED_CYCLES, 6, False,
         {0: 13.0, 1: 4.0, 2: 4.0, 3: 13.0, 4: 4.0, 5: 4.0}),
        (DIAMOND, 7, False,
         {0: 0.0, 1: 0.0, 2: 8.0, 3: 3.0, 4: 3.0, 5: 5.0, 6: 0.0}),
        (DIAMOND, 7, True,
         {0: 0.0, 1: 0.0, 2: 9.5, 3: 3.0, 4: 3.0, 5: 5.5, 6: 0.0}),
    ],
    ids=["line", "cycle", "clique5", "clique5_und", "conn_cycles",
         "diamond", "diamond_und"],
)
def test_reference_fixtures(spark, edges, n, undirected, expected):
    got = _scores(spark, edges, n, undirected)
    for node, exp in expected.items():
        assert got[node] == pytest.approx(exp, abs=1e-9), (node, got)


def test_sampling_full_equals_exact(spark):
    exact = _scores(spark, CONNECTED_CYCLES, 6)
    sampled = _scores(spark, CONNECTED_CYCLES, 6, sampling_size=6)
    assert sampled == pytest.approx(exact)


def test_sampling_subset_bounded(spark):
    # K < n: per-source dependencies are a subset of the exact sum
    exact = _scores(spark, CONNECTED_CYCLES, 6)
    sampled = _scores(spark, CONNECTED_CYCLES, 6, sampling_size=3)
    for node, v in sampled.items():
        assert v <= exact[node] + 1e-9


def test_exact_mode_auto_samples_above_node_limit(spark):
    """Scale guard: sampling_size=None on a graph above exact_node_limit
    downgrades to degree-weighted sampling with a warning (exact Brandes
    carries an O(V^2) pair frontier at scale); force_exact opts out."""
    import warnings

    edges = [(i, (i + 1) % 12) for i in range(12)] + [(0, 6)]
    g = from_edge_list(spark, edges, n_nodes=12)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = betweenness(g, BetweennessConfig(exact_node_limit=8)).collect()
    assert any("auto-sampling" in str(x.message) for x in w)
    assert len(out) == 12

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        betweenness(g, BetweennessConfig(exact_node_limit=8,
                                         force_exact=True)).collect()
    assert not any("auto-sampling" in str(x.message) for x in w)
