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


def _vecs(spark, n=40, dim=8):
    rows = []
    for i in range(n):
        rows.append((i, [float((i * 7 + k * 13) % 10) + (1.0 if k == i % dim else 0.0)
                         for k in range(dim)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_topk_filters(spark):
    """Filtered KNN semantics (similarity/filteredknn/FilteredKnn.java):
    sources restricted up front, targets before the per-source top-k, so
    every surviving source still gets k MATCHING neighbors."""
    from neo4j_graph_data_science_spark.operators.ann import brute_force_topk

    emb = _vecs(spark)
    out = brute_force_topk(emb, emb, k=3, source_filter="node % 3 = 0",
                           target_filter="node % 2 = 1").collect()
    assert out, "filtered result must be non-empty"
    qs = {r["query_id"] for r in out}
    assert all(q % 3 == 0 for q in qs)
    assert all(r["neighbor_id"] % 2 == 1 for r in out)
    from collections import Counter

    counts = Counter(r["query_id"] for r in out)
    assert all(c == 3 for c in counts.values())


def test_filtered_knn_recall_vs_exact(spark):
    from neo4j_graph_data_science_spark.operators.ann import (
        brute_force_topk,
        filtered_knn,
    )

    emb = _vecs(spark)
    exact = brute_force_topk(emb, emb, k=3, source_filter="node % 3 = 0",
                             target_filter="node % 2 = 1").collect()
    approx = filtered_knn(emb, k=3, iterations=4, oversample=4,
                          source_filter="node % 3 = 0",
                          target_filter="node % 2 = 1").collect()
    qs = {r["query_id"] for r in approx}
    assert all(q % 3 == 0 for q in qs)
    assert all(r["neighbor_id"] % 2 == 1 for r in approx)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.6, recall
