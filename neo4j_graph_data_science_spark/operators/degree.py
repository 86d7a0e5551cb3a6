"""Degree centrality (reference algo/.../degree/DegreeCentrality.java:43).

in/out/undirected orientation, optionally weighted (sum of weights).
Pure groupBy -- map-side combined, one shuffle, Catalyst handles the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import SRC, W, SparkGraph


def degree_centrality(
    graph: SparkGraph, orientation: str = "NATURAL", weighted: bool = False
) -> DataFrame:
    """(id, score): degree under orientation; weighted sums edge weights."""
    e = graph.oriented_edges(orientation)
    agg = F.sum(W) if weighted else F.count(F.lit(1)).cast("double")
    deg = e.groupBy(F.col(SRC).alias("id")).agg(agg.alias("score"))
    return (
        graph.nodes.select("id")
        .join(deg, "id", "left")
        .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
    )
