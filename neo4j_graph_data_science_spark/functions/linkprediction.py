"""Link-prediction scoring functions (gds.alpha.linkprediction.*).

Reference: proc/.../UserFunctions -- adamicAdar, commonNeighbors,
preferentialAttachment, resourceAllocation, sameCommunity, totalNeighbors.
GDS evaluates them per node pair against the live Neo4j store; here they are
set-level DataFrame computations over an undirected neighbor table, scored
for an arbitrary DataFrame of candidate (node1, node2) pairs:

  commonNeighbors(u,v)          |N(u) & N(v)|
  adamicAdar(u,v)               sum_{w in N(u)&N(v)} 1/ln(deg(w))
  resourceAllocation(u,v)       sum_{w in N(u)&N(v)} 1/deg(w)
  preferentialAttachment(u,v)   deg(u) * deg(v)
  totalNeighbors(u,v)           |N(u) | N(v)|

Spark plan: candidates join the adjacency twice on the shared neighbor
(the same wedge join as node similarity), then one groupBy(pair) with all
the sums map-side combined; degree terms join in from one degree agg.
Neighbor-popularity skew is bounded by the candidate set (we never expand
the full pair space).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import DST, SRC, SparkGraph, register_cache


def _undirected_adj(graph: SparkGraph) -> DataFrame:
    """(n, nb) distinct undirected neighbor pairs (no self-loops)."""
    e = graph.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    return (
        e.select(F.col(SRC).alias("n"), F.col(DST).alias("nb"))
        .unionAll(e.select(F.col(DST).alias("n"), F.col(SRC).alias("nb")))
        .distinct()
    )


def link_prediction_scores(graph: SparkGraph, pairs: DataFrame) -> DataFrame:
    """Score candidate pairs: (node1, node2, common_neighbors, adamic_adar,
    resource_allocation, preferential_attachment, total_neighbors).

    ``pairs`` must have columns node1, node2.
    """
    adj = register_cache(_undirected_adj(graph).persist())
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))

    a1 = adj.select(F.col("n").alias("node1"), F.col("nb"))
    a2 = adj.select(F.col("n").alias("node2"), F.col("nb"))
    common = (
        pairs.join(a1, "node1")
        .join(a2, ["node2", "nb"])
        .join(deg.select(F.col("n").alias("nb"), F.col("deg").alias("_wdeg")), "nb")
        .groupBy("node1", "node2")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum(
                F.when(F.col("_wdeg") > 1, 1.0 / F.log(F.col("_wdeg"))).otherwise(0.0)
            ).alias("adamic_adar"),
            F.sum(1.0 / F.col("_wdeg")).alias("resource_allocation"),
        )
    )
    d1 = deg.select(F.col("n").alias("node1"), F.col("deg").alias("_d1"))
    d2 = deg.select(F.col("n").alias("node2"), F.col("deg").alias("_d2"))
    out = (
        pairs.join(common, ["node1", "node2"], "left")
        .join(d1, "node1", "left")
        .join(d2, "node2", "left")
        .select(
            "node1",
            "node2",
            F.coalesce("common_neighbors", F.lit(0)).cast("long").alias("common_neighbors"),
            F.coalesce("adamic_adar", F.lit(0.0)).alias("adamic_adar"),
            F.coalesce("resource_allocation", F.lit(0.0)).alias("resource_allocation"),
            (F.coalesce("_d1", F.lit(0)) * F.coalesce("_d2", F.lit(0)))
            .cast("long")
            .alias("preferential_attachment"),
            (
                F.coalesce("_d1", F.lit(0)) + F.coalesce("_d2", F.lit(0))
                - F.coalesce("common_neighbors", F.lit(0))
            ).cast("long").alias("total_neighbors"),
        )
    )
    return out


def same_community(labels: DataFrame, pairs: DataFrame, label_col: str = "label") -> DataFrame:
    """(node1, node2, same_community): 1 iff both nodes share a community
    label (gds.alpha.linkprediction.sameCommunity)."""
    l1 = labels.select(F.col("id").alias("node1"), F.col(label_col).alias("_l1"))
    l2 = labels.select(F.col("id").alias("node2"), F.col(label_col).alias("_l2"))
    return (
        pairs.join(l1, "node1").join(l2, "node2")
        .select(
            "node1", "node2",
            (F.col("_l1") == F.col("_l2")).cast("long").alias("same_community"),
        )
    )
