"""Node similarity: pairwise Jaccard/Overlap/Cosine on neighbor sets.

Reference: algo/src/main/java/org/neo4j/gds/similarity/nodesim/
NodeSimilarity.java:57 -- compares all node pairs that share at least one
neighbor; degree cutoff; topK per node / topN global; produces a similarity
relationship stream.

Spark formulation (the scalable shape GDS's bitset intersection cannot
take): self-join the (node, neighbor) adjacency on the shared neighbor ->
groupBy(pair).count() gives the intersection size; degrees join in for the
union; window row_number for topK. Shared-neighbor fan-out is quadratic in
neighbor popularity, so hot neighbors (celebrity items) dominate the
shuffle: ``max_fanout_neighbor_degree`` optionally drops neighbors with
more than N owners (exact for the remaining pairs; GDS's degreeCutoff is
the node-side analogue). All joins are shuffle hash joins on ids; AQE
splits residual skew.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass
class NodeSimilarityConfig:
    metric: str = "jaccard"          # jaccard | overlap
    top_k: int = 10                  # per-source neighbors kept
    degree_cutoff: int = 1           # min neighbor-set size (NodeSimilarity semantics)
    similarity_cutoff: float = 0.0
    max_fanout_neighbor_degree: int | None = None


def node_similarity(
    adjacency: DataFrame,
    node_col: str,
    neighbor_col: str,
    config: NodeSimilarityConfig | None = None,
) -> DataFrame:
    """(node1, node2, similarity): symmetric pairs, topK per node1.

    ``adjacency`` is a distinct (node, neighbor) relationship DF.
    """
    cfg = config or NodeSimilarityConfig()
    adj = adjacency.select(
        F.col(node_col).alias("n"), F.col(neighbor_col).alias("nb")
    ).distinct()

    deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    if cfg.degree_cutoff > 1:
        keep = deg.filter(F.col("deg") >= cfg.degree_cutoff).select("n")
        adj = adj.join(keep, "n", "left_semi")

    if cfg.max_fanout_neighbor_degree is not None:
        nb_deg = adj.groupBy("nb").agg(F.count(F.lit(1)).alias("_nd"))
        hot = nb_deg.filter(F.col("_nd") > cfg.max_fanout_neighbor_degree).select("nb")
        adj_joinable = adj.join(hot, "nb", "left_anti")
    else:
        adj_joinable = adj

    a = adj_joinable.select(F.col("n").alias("node1"), "nb")
    b = adj_joinable.select(F.col("n").alias("node2"), "nb")
    inter = (
        a.join(b, "nb")
        .filter(F.col("node1") != F.col("node2"))
        .groupBy("node1", "node2")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    d1 = deg.select(F.col("n").alias("node1"), F.col("deg").alias("_d1"))
    d2 = deg.select(F.col("n").alias("node2"), F.col("deg").alias("_d2"))
    paired = inter.join(d1, "node1").join(d2, "node2")
    if cfg.metric == "jaccard":
        sim = F.col("_inter") / (F.col("_d1") + F.col("_d2") - F.col("_inter"))
    elif cfg.metric == "overlap":
        sim = F.col("_inter") / F.least("_d1", "_d2")
    else:
        raise ValueError(f"unknown metric {cfg.metric}")
    scored = paired.select("node1", "node2", sim.alias("similarity")).filter(
        F.col("similarity") >= cfg.similarity_cutoff
    )
    win = Window.partitionBy("node1").orderBy(
        F.col("similarity").desc(), F.col("node2").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= cfg.top_k)
        .drop("_rn")
    )
