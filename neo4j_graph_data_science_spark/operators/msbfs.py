"""Bit-parallel multi-source BFS (MS-BFS / ANP).

Reference: msbfs/ANPStrategy.java (+ msbfs/MultiSourceBFSAccessMethods.java)
-- GDS packs 64 BFS sources into one long bitmask so a single traversal
serves 64 searches, and harmonic/closeness/betweenness consume per-depth
"how many sources newly reached node v" counts without ever materializing
per-(source, node) rows.

DataFrame formulation: state is one row per (source-batch, node) carrying a
64-bit `visited` mask. One superstep for ALL batches at once:

  1. frontier ⋈ edges on src                      (co-partitioned join)
  2. groupBy(batch, dst).agg(bit_or(mask))        (ONE combined shuffle,
                                                   map-side partial bit_or)
  3. mask &~ visited, drop zero rows              (row-local)

Newly-set bits are counted with `bit_count`, all inside whole-stage
codegen. State is O(V * ceil(S/64)) rows instead of the O(V * S) pair
frontier the round-1 implementation carried -- the 64x batching is exactly
GDS's ANP trick, re-expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import DST, SRC, SparkGraph, bucketed_dense_ids
from ..plans.checkpoint import truncate
from ..plans.pregel import prepare_edges

# decode a 64-bit mask into its set bit positions, JVM-side
_BITS_EXPR = "filter(sequence(0, 63), b -> (shiftright(mask, b) & 1) = 1)"


def _msbfs_frontiers(
    edges: DataFrame, sources: DataFrame, max_depth: int
) -> tuple[DataFrame, DataFrame]:
    """Run the batched BFS; returns (frontiers, source_map).

    frontiers: (batch, id, mask, dist) -- bit b of mask set iff the batch's
    source with bit b first reaches `id` at hop distance `dist`.
    source_map: (_sid, batch, bit) -- which source owns which bit.
    """
    src = sources.select(F.col("id").alias("_sid")).distinct()
    # (batch, bit) assignment via partition-parallel dense ranks (the
    # bucket expr is coarse-monotonic in _sid, see bucketed_dense_ids)
    idx = bucketed_dense_ids(src, ["_sid"], F.floor(F.col("_sid") / F.lit(65536)))
    smap = truncate(
        idx.select(
            "_sid",
            F.shiftright("id", 6).alias("batch"),
            F.pmod("id", F.lit(64)).cast("int").alias("bit"),
        ),
        "msbfs_map",
    )
    init = smap.select(
        F.col("_sid").alias("id"),
        "batch",
        F.expr("shiftleft(cast(1 as bigint), bit)").alias("mask"),
    )
    visited = truncate(init, "msbfs_vis")
    frontier = visited
    out = truncate(
        init.select("batch", "id", "mask", F.lit(0).alias("dist")), "msbfs_out"
    )
    for depth in range(1, max_depth + 1):
        cand = (
            edges.join(
                frontier.select(F.col("id").alias(SRC), "batch", "mask"), SRC
            )
            .groupBy(F.col(DST).alias("id"), "batch")
            .agg(F.bit_or("mask").alias("_m"))
        )
        new = (
            cand.join(
                visited.select("batch", "id", F.col("mask").alias("_v")),
                ["batch", "id"],
                "left",
            )
            .select(
                "batch",
                "id",
                F.col("_m").bitwiseAND(
                    F.bitwise_not(F.coalesce("_v", F.lit(0).cast("long")))
                ).alias("mask"),
            )
            .filter(F.col("mask") != 0)
        )
        frontier = truncate(new, "msbfs_frontier")
        if frontier.isEmpty():
            break
        visited = truncate(
            visited.join(
                frontier.select("batch", "id", F.col("mask").alias("_n")),
                ["batch", "id"],
                "full",
            ).select(
                "batch",
                "id",
                F.coalesce("mask", F.lit(0).cast("long")).bitwiseOR(
                    F.coalesce("_n", F.lit(0).cast("long"))
                ).alias("mask"),
            ),
            "msbfs_vis",
        )
        out = truncate(
            out.unionByName(frontier.withColumn("dist", F.lit(depth))),
            "msbfs_out",
        )
    return out, smap


def msbfs_depth_counts(
    edges: DataFrame, sources: DataFrame, max_depth: int
) -> DataFrame:
    """(id, dist, cnt): how many of `sources` are at hop distance `dist`
    from node `id` (dist >= 1). The aggregation input is the bit-packed
    frontier -- O(V * S/64) rows -- never the (source, node) pair space."""
    out, _ = _msbfs_frontiers(edges, sources, max_depth)
    return (
        out.filter(F.col("dist") > 0)
        .groupBy("id", "dist")
        .agg(F.sum(F.bit_count("mask")).alias("cnt"))
    )


def all_shortest_paths(
    graph: SparkGraph,
    sources: list[int] | None = None,
    max_depth: int = 100,
    partitions: int | None = None,
) -> DataFrame:
    """(source, target, dist): unweighted all-shortest-paths stream
    (gds.allShortestPaths semantics for hop distances). The traversal is
    bit-packed; only this final stream decodes masks back into
    per-(source, target) rows -- callers that need aggregates should use
    msbfs_depth_counts instead and never pay the decode."""
    edges = prepare_edges(graph.edges.select(SRC, DST).distinct(), partitions)
    nodes = graph.nodes.select("id")
    src_df = (
        nodes
        if sources is None
        else nodes.filter(F.col("id").isin([int(s) for s in sources]))
    )
    out, smap = _msbfs_frontiers(edges, src_df, max_depth)
    bits = out.select(
        "batch", "id", "dist", F.explode(F.expr(_BITS_EXPR)).alias("bit")
    )
    res = bits.join(smap, ["batch", "bit"]).select(
        F.col("_sid").alias("source"), F.col("id").alias("target"), "dist"
    )
    edges.unpersist()
    return res
