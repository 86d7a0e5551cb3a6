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

from ..catalog import register_cache


@dataclass
class NodeSimilarityConfig:
    metric: str = "jaccard"          # jaccard | overlap | cosine (weighted)
    top_k: int = 10                  # per-source neighbors kept
    bottom_k: int | None = None      # most-DISsimilar k instead (GDS bottomK)
    degree_cutoff: int = 1           # min neighbor-set size (NodeSimilarity semantics)
    similarity_cutoff: float = 0.0
    # Default BOUNDED (round-2 verdict #6): one celebrity neighbor with d
    # owners fans out d^2 pairs through the shared-neighbor join, which is
    # quadratic blow-up at 100x scale. 10k owners -> <=1e8 pair fragments
    # per hot neighbor, still shuffle-safe; pass None for the exact
    # all-pairs semantics (the DuckDB-oracle contract queries do).
    max_fanout_neighbor_degree: int | None = 10_000
    # filtered node similarity (similarity/filterednodesim/): restrict the
    # compared pairs by source / target predicate over the node id column.
    # Filtering happens BEFORE the pair join, so filtered runs shrink the
    # shuffle instead of post-filtering a full cross product.
    source_filter: str | None = None
    target_filter: str | None = None
    # Below this adjacency byte budget one side of the shared-neighbor
    # pair join rides as a broadcast hash table: pair generation and the
    # intersection partial-aggregate pipeline in ONE stage with no shuffle
    # of the quadratic pair stream. Above it (100-TB regime): shuffle
    # join on nb, as before. Budgeted in BYTES (rows x estimated width:
    # two longs + optional weight + row overhead), not rows, so the gate
    # stays honest when a weight column widens the rows.
    broadcast_max_adjacency_bytes: int = 512 * 1024 * 1024


def node_similarity(
    adjacency: DataFrame,
    node_col: str,
    neighbor_col: str,
    config: NodeSimilarityConfig | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """(node1, node2, similarity): symmetric pairs, topK per node1.

    ``adjacency`` is a distinct (node, neighbor) relationship DF;
    ``weight_col`` (cosine / weighted metrics) names a relationship-weight
    column on it.
    """
    cfg = config or NodeSimilarityConfig()
    wcol = [F.col(weight_col).alias("w")] if weight_col else []
    # persisted: referenced by deg, the fan-out guard, BOTH pair-join
    # sides, and the cosine norms -- without the cache the (often
    # expensive) upstream adjacency derivation re-runs per reference.
    # count() doubles as the broadcast-decision stat.
    adj = adjacency.select(
        F.col(node_col).alias("n"), F.col(neighbor_col).alias("nb"), *wcol
    ).distinct().persist()
    register_cache(adj)
    n_adj = adj.count()

    deg = register_cache(
        adj.groupBy("n").agg(F.count(F.lit(1)).alias("deg")).persist())
    if cfg.degree_cutoff > 1:
        keep = deg.filter(F.col("deg") >= cfg.degree_cutoff).select("n")
        adj = adj.join(keep, "n", "left_semi")

    if cfg.max_fanout_neighbor_degree is not None:
        nb_deg = adj.groupBy("nb").agg(F.count(F.lit(1)).alias("_nd"))
        hot = nb_deg.filter(F.col("_nd") > cfg.max_fanout_neighbor_degree).select("nb")
        adj_joinable = adj.join(hot, "nb", "left_anti")
    else:
        adj_joinable = adj

    a = adj_joinable.select(F.col("n").alias("node1"), "nb",
                            *([F.col("w").alias("_w1")] if weight_col else []))
    b = adj_joinable.select(F.col("n").alias("node2"), "nb",
                            *([F.col("w").alias("_w2")] if weight_col else []))
    # predicates are written over the pseudo-column `node`, e.g.
    # "node % 2 = 0" or "node IN (1,2,3)" -- rebound per side
    from ..catalog import bind_node_filter
    a = bind_node_filter(a, cfg.source_filter, "node1")
    b = bind_node_filter(b, cfg.target_filter, "node2")
    pair_aggs = [F.count(F.lit(1)).alias("_inter")]
    if weight_col:
        pair_aggs.append(F.sum(F.col("_w1") * F.col("_w2")).alias("_dot"))
    adj_row_bytes = 16 + (8 if weight_col else 0) + 16
    if n_adj * adj_row_bytes <= cfg.broadcast_max_adjacency_bytes:
        b = F.broadcast(b)
    inter = (
        a.join(b, "nb")
        .filter(F.col("node1") != F.col("node2"))
        .groupBy("node1", "node2")
        .agg(*pair_aggs)
    )
    d1 = deg.select(F.col("n").alias("node1"), F.col("deg").alias("_d1"))
    d2 = deg.select(F.col("n").alias("node2"), F.col("deg").alias("_d2"))
    paired = inter.join(d1, "node1").join(d2, "node2")
    if cfg.metric == "cosine":
        if not weight_col:
            raise ValueError("cosine metric needs weight_col")
        nrm = adj.groupBy("n").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("_n"))
        paired = (
            paired.join(nrm.select(F.col("n").alias("node1"),
                                   F.col("_n").alias("_n1")), "node1")
            .join(nrm.select(F.col("n").alias("node2"),
                             F.col("_n").alias("_n2")), "node2")
        )
        sim = F.col("_dot") / (F.col("_n1") * F.col("_n2"))
    elif cfg.metric == "jaccard":
        sim = F.col("_inter") / (F.col("_d1") + F.col("_d2") - F.col("_inter"))
    elif cfg.metric == "overlap":
        sim = F.col("_inter") / F.least("_d1", "_d2")
    else:
        raise ValueError(f"unknown metric {cfg.metric}")
    scored = paired.select("node1", "node2", sim.alias("similarity")).filter(
        F.col("similarity") >= cfg.similarity_cutoff
    )
    if cfg.bottom_k is not None:
        win = Window.partitionBy("node1").orderBy(
            F.col("similarity").asc(), F.col("node2").asc()
        )
        limit = cfg.bottom_k
    else:
        win = Window.partitionBy("node1").orderBy(
            F.col("similarity").desc(), F.col("node2").asc()
        )
        limit = cfg.top_k
    return (
        scored.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= limit)
        .drop("_rn")
    )
