"""Graph export: nodes + relationships to CSV / parquet / Iceberg.

Reference: gds.graph.export (csv/GraphStoreToCsvExporter,
io/.../GraphStoreExporter.java) -- dumps the in-catalog graph as a nodes
table and a relationships table. Spark-first: both are plain DataFrame
writes, so the export inherits partitioned parallel IO; CSV gets headers
(the reference's csv layout), parquet/Iceberg keep types exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import SparkGraph


def export_graph(graph: SparkGraph, path: str, fmt: str = "csv",
                 original_ids: bool = True) -> dict:
    """Write {path}/nodes and {path}/relationships; returns counts.

    fmt: "csv" (headered, the gds.beta.graph.export.csv shape), "parquet",
    or "iceberg" (path is then a table-name prefix)."""
    if fmt not in ("csv", "parquet", "iceberg"):
        raise ValueError(f"unknown export format {fmt!r}")
    nodes = graph.nodes
    edges = graph.edges
    if original_ids and graph.id_map is not None:
        orig = [c for c in graph.id_map.columns if c != "id"][0]
        nodes = nodes.join(graph.id_map, "id", "left")
        m = graph.id_map
        edges = (
            edges.join(m.select(F.col("id").alias("src"),
                                F.col(orig).alias(f"src_{orig}")), "src", "left")
            .join(m.select(F.col("id").alias("dst"),
                           F.col(orig).alias(f"dst_{orig}")), "dst", "left")
        )

    def _write(df: DataFrame, name: str) -> None:
        if fmt == "csv":
            # arrays aren't CSV-representable: JSON-encode them
            cols = [
                F.to_json(c).alias(c) if t.startswith(("array", "struct"))
                else F.col(c)
                for c, t in df.dtypes
            ]
            df.select(*cols).write.mode("overwrite") \
                .option("header", True).csv(f"{path}/{name}")
        elif fmt == "parquet":
            df.write.mode("overwrite").parquet(f"{path}/{name}")
        else:
            df.writeTo(f"{path}_{name}").createOrReplace()

    _write(nodes, "nodes")
    _write(edges, "relationships")
    return {"node_count": nodes.count(), "relationship_count": edges.count(),
            "format": fmt, "path": path}
