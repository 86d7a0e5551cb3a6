"""Golden-value parity for ArticleRank and Eigenvector against the
reference's own fixtures (PageRankTest.java nested ArticleRank/Eigenvector
classes, SCORE_PRECISION = 1e-5, maxIterations=40, tolerance=0)."""

from __future__ import annotations

import pytest

from neo4j_graph_data_science_spark.catalog import from_edge_list
from neo4j_graph_data_science_spark.operators.pagerank import (
    PageRankConfig,
    article_rank,
    eigenvector,
)

# a=0 b=1 c=2 d=3 e=4 f=5 g=6 h=7 i=8 j=9
AR_EDGES = [(1, 2), (2, 1), (3, 0), (3, 1), (4, 1), (4, 3), (4, 5),
            (5, 1), (5, 4)]
AR_EXPECTED = {0: 0.20720, 1: 0.47091, 2: 0.36067, 3: 0.19515, 4: 0.20720,
               5: 0.19515, 6: 0.15, 7: 0.15, 8: 0.15, 9: 0.15}

EV_EDGES_W = [(1, 2, 1.0), (2, 1, 3.0), (3, 0, 5.0), (3, 1, 5.0),
              (4, 1, 4.0), (4, 3, 4.0), (4, 5, 4.0), (5, 1, 10.0),
              (5, 4, 10.0)]
EV_EXPECTED = {0: 0.01262, 1: 0.71623, 2: 0.69740, 3: 0.01262, 4: 0.01262,
               5: 0.01262, 6: 0.0, 7: 0.0, 8: 0.0, 9: 0.0}
EV_EXPECTED_W = {0: 0.00210, 1: 0.70774, 2: 0.70645, 3: 0.00172, 4: 0.00210,
                 5: 0.00172, 6: 0.0, 7: 0.0, 8: 0.0, 9: 0.0}


def test_article_rank_golden(spark):
    g = from_edge_list(spark, AR_EDGES, n_nodes=10)
    res = article_rank(g, PageRankConfig(max_iterations=40, tolerance=0.0))
    got = {r["id"]: r["score"] for r in res.state.collect()}
    for node, exp in AR_EXPECTED.items():
        assert got[node] == pytest.approx(exp, abs=1e-5), node


def test_eigenvector_golden(spark):
    g = from_edge_list(spark, [(a, b) for a, b, _ in EV_EDGES_W], n_nodes=10)
    res = eigenvector(g, PageRankConfig(max_iterations=40, tolerance=0.0))
    got = {r["id"]: r["score"] for r in res.state.collect()}
    for node, exp in EV_EXPECTED.items():
        assert got[node] == pytest.approx(exp, abs=1e-5), node


def test_eigenvector_weighted_golden(spark):
    # the reference's weighted test runs maxIterations=10 (not 40)
    g = from_edge_list(spark, EV_EDGES_W, n_nodes=10)
    res = eigenvector(g, PageRankConfig(max_iterations=10, tolerance=0.0,
                                        weighted=True))
    got = {r["id"]: r["score"] for r in res.state.collect()}
    for node, exp in EV_EXPECTED_W.items():
        assert got[node] == pytest.approx(exp, abs=1e-5), node
