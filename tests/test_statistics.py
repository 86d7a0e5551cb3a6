"""Statistics / post-processing helpers: histogram parity, minCommunitySize,
global topN, estimate mode."""

from __future__ import annotations

import pytest

from neo4j_graph_data_science_spark.catalog import from_edge_list
from neo4j_graph_data_science_spark.operators.statistics import (
    apply_min_community_size,
    community_summary,
    estimate,
    global_top_n,
    similarity_summary,
)


def _labels(spark):
    # communities: A x 6 nodes, B x 3, C x 1
    rows = ([(i, "A") for i in range(6)] + [(10 + i, "B") for i in range(3)]
            + [(20, "C")])
    return spark.createDataFrame(rows, "id long, community string")


def test_community_summary(spark):
    row = community_summary(_labels(spark)).collect()[0]
    assert row["communityCount"] == 3
    assert row["min"] == 1 and row["max"] == 6
    assert row["mean"] == pytest.approx(10 / 3)
    assert row["p50"] == pytest.approx(3.0)
    assert row["p100"] == pytest.approx(6.0)
    assert row["p1"] == pytest.approx(1.04)  # interpolated continuous quantile


def test_min_community_size(spark):
    out = apply_min_community_size(_labels(spark), 3).collect()
    assert len(out) == 9
    assert {r["community"] for r in out} == {"A", "B"}


def test_global_top_n(spark):
    df = spark.createDataFrame(
        [(1, 2, 0.9), (1, 3, 0.8), (2, 3, 0.9), (4, 5, 0.1)],
        "node1 long, node2 long, similarity double")
    top = global_top_n(df, 2).collect()
    assert [(r["node1"], r["node2"]) for r in top] == [(1, 2), (2, 3)]


def test_similarity_summary(spark):
    df = spark.createDataFrame([(float(i),) for i in range(101)],
                               "similarity double")
    row = similarity_summary(df).collect()[0]
    assert row["min"] == 0.0 and row["max"] == 100.0
    assert row["p50"] == pytest.approx(50.0)
    assert row["p999"] == pytest.approx(99.9)


def test_estimate_scales_with_graph(spark):
    g_small = from_edge_list(spark, [(0, 1), (1, 2)], n_nodes=3)
    g_big = from_edge_list(spark, [(i, i + 1) for i in range(99)], n_nodes=100)
    e_small = estimate(g_small, "pagerank")
    e_big = estimate(g_big, "pagerank")
    assert e_big["bytesMin"] > e_small["bytesMin"]
    assert e_small["bytesMax"] == 2 * e_small["bytesMin"]
    bc = estimate(g_small, "betweenness", sampling_size=2)
    assert bc["bytesMin"] > e_small["bytesMin"]


def test_memory_guard_fits(spark):
    from neo4j_graph_data_science_spark.operators.statistics import memory_guard

    g = from_edge_list(spark, [(0, 1), (1, 2)], n_nodes=3)
    est = memory_guard(g, "pagerank", spark)
    assert est["memoryBudgetBytes"] > est["bytesMin"]
    assert est["algorithm"] == "pagerank"


def test_memory_guard_refuses(spark, monkeypatch):
    """MemoryGuard parity (DefaultAlgorithmProcessingTemplate.java:59):
    a run whose estimate exceeds the session budget must refuse up front."""
    import neo4j_graph_data_science_spark.operators.statistics as st

    g = from_edge_list(spark, [(0, 1), (1, 2)], n_nodes=3)
    monkeypatch.setattr(st, "_session_memory_bytes", lambda s: 16)
    with pytest.raises(st.MemoryGuardError, match="exceeds"):
        st.memory_guard(g, "pagerank", spark)
