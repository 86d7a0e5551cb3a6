"""Graph export: CSV round-trip keeps rows; parquet keeps types."""

from __future__ import annotations

from neo4j_graph_data_science_spark.catalog import from_edge_list
from neo4j_graph_data_science_spark.sources.export import export_graph


def test_export_csv_roundtrip(spark, tmp_path):
    g = from_edge_list(spark, [(0, 1), (1, 2), (2, 0)], n_nodes=3)
    res = export_graph(g, str(tmp_path / "out"), fmt="csv")
    assert res["node_count"] == 3 and res["relationship_count"] == 3
    nodes = spark.read.option("header", True).csv(str(tmp_path / "out/nodes"))
    rels = spark.read.option("header", True).csv(
        str(tmp_path / "out/relationships"))
    assert nodes.count() == 3
    assert {tuple(sorted((int(r["src"]), int(r["dst"]))))
            for r in rels.collect()} == {(0, 1), (1, 2), (0, 2)}


def test_export_parquet(spark, tmp_path):
    g = from_edge_list(spark, [(0, 1), (1, 2)], n_nodes=3)
    export_graph(g, str(tmp_path / "pq"), fmt="parquet")
    rels = spark.read.parquet(str(tmp_path / "pq/relationships"))
    assert dict(rels.dtypes)["src"] == "bigint"
    assert rels.count() == 2
