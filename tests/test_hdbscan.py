"""HDBSCAN (kNN-candidate mutual-reachability MST + cut extraction)."""

from __future__ import annotations

from neo4j_graph_data_science_spark.operators.clustering import (
    HdbscanConfig,
    hdbscan,
)


def test_hdbscan_two_blobs_and_noise(spark):
    rows = []
    # blob A around (0,0), blob B around (10,10), 2 far outliers
    for i in range(12):
        rows.append((i, [0.0 + (i % 4) * 0.1, 0.0 + (i % 3) * 0.1]))
        rows.append((100 + i, [10.0 + (i % 4) * 0.1, 10.0 + (i % 3) * 0.1]))
    rows += [(500, [50.0, 50.0]), (501, [-50.0, 40.0])]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    out = {r["id"]: r["cluster"]
           for r in hdbscan(df, HdbscanConfig(min_pts=3, knn_k=6,
                                              cut_distance=1.0,
                                              min_cluster_size=4)).collect()}
    a = {out[i] for i in range(12)}
    b = {out[100 + i] for i in range(12)}
    assert len(a) == 1 and len(b) == 1 and a != b
    assert -1 not in a and -1 not in b
    assert out[500] == -1 and out[501] == -1


def test_hdbscan_stability_extraction(spark):
    # no cut level: the condensed-tree excess-of-mass selection must find
    # the two blobs by itself and leave the outliers as noise
    rows = []
    for i in range(12):
        rows.append((i, [0.0 + (i % 4) * 0.1, 0.0 + (i % 3) * 0.1]))
        rows.append((100 + i, [10.0 + (i % 4) * 0.1, 10.0 + (i % 3) * 0.1]))
    rows += [(500, [50.0, 50.0]), (501, [-50.0, 40.0])]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    out = {r["id"]: r["cluster"]
           for r in hdbscan(df, HdbscanConfig(min_pts=3, knn_k=6,
                                              min_cluster_size=4,
                                              extraction="stability"))
           .collect()}
    a = {out[i] for i in range(12)}
    b = {out[100 + i] for i in range(12)}
    assert len(a) == 1 and len(b) == 1 and a != b
    assert -1 not in a and -1 not in b
    assert out[500] == -1 and out[501] == -1


def test_stability_mst_collect_guard(spark):
    """An oversized stability-mode MST collect is a clear error, not a
    driver OOM (round-2 verdict #9)."""
    import pytest

    rows = [(i, [float(i), 0.0]) for i in range(12)]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    with pytest.raises(ValueError, match="max_collected_mst_edges"):
        hdbscan(df, HdbscanConfig(min_pts=2, knn_k=4, extraction="stability",
                                  max_collected_mst_edges=3))
