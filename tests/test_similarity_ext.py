"""Node similarity extensions: cosine on weights, filtered, bottomK."""

from __future__ import annotations

import pytest

from neo4j_graph_data_science_spark.operators.similarity import (
    NodeSimilarityConfig,
    node_similarity,
)


def _adj(spark):
    rows = [
        (1, "x", 1.0), (1, "y", 2.0),
        (2, "x", 2.0), (2, "y", 4.0),   # 2 is parallel to 1 -> cosine 1
        (3, "x", 1.0), (3, "z", 1.0),
        (4, "q", 1.0),
    ]
    return spark.createDataFrame(rows, "n long, nb string, w double")


def test_cosine_weighted(spark):
    out = node_similarity(_adj(spark), "n", "nb",
                          NodeSimilarityConfig(metric="cosine"), weight_col="w")
    got = {(r["node1"], r["node2"]): r["similarity"] for r in out.collect()}
    assert got[(1, 2)] == pytest.approx(1.0)
    # sim(1,3): dot=1*1=1 over x only; |1|=sqrt(5), |3|=sqrt(2)
    assert got[(1, 3)] == pytest.approx(1 / (5 ** 0.5 * 2 ** 0.5))


def test_filtered_sources_targets(spark):
    out = node_similarity(
        _adj(spark), "n", "nb",
        NodeSimilarityConfig(source_filter="node = 1", target_filter="node != 2"))
    got = {(r["node1"], r["node2"]) for r in out.collect()}
    assert got == {(1, 3)}


def test_bottom_k(spark):
    out = node_similarity(_adj(spark), "n", "nb",
                          NodeSimilarityConfig(bottom_k=1))
    got = {r["node1"]: r["node2"] for r in out.collect()}
    # node1's LEAST similar partner is 3 (jaccard 1/3 < 1.0 with 2)
    assert got[1] == 3
