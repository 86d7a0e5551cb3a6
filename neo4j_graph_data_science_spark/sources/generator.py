"""Random graph generation + graph sampling.

gds.graph.generate (reference core/src/main/java/org/neo4j/gds/beta/
generator/RandomGraphGenerator.java:63-111): n nodes, average degree d,
seeded degree/target distributions. Here all randomness is hash-derived
(xxhash64) so generation is deterministic, parallel (spark.range), and
identical at any cluster size -- the property the reference gets from a
seeded RNG, re-expressed for distributed execution.

gds.graph.sample.rwr (reference graph-sampling/.../rwr): random walk with
restart sampling -- iterative frontier expansion where each visited node
keeps a hash-chosen subset of its neighbors until the target node fraction
is reached.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import DST, REL, SRC, W, SparkGraph


@dataclass
class RandomGraphConfig:
    node_count: int = 1000
    average_degree: int = 4
    seed: int = 42
    rel_type: str = "REL"


def generate_random_graph(spark: SparkSession,
                          config: RandomGraphConfig | None = None) -> SparkGraph:
    """Uniform random graph: each node emits average_degree hash-chosen
    targets (self-loops filtered, parallel edges deduped)."""
    cfg = config or RandomGraphConfig()
    nodes = spark.range(cfg.node_count).select(F.col("id").cast("long"))
    edges = (
        nodes.select(
            F.col("id").alias(SRC),
            F.explode(F.sequence(F.lit(0), F.lit(cfg.average_degree - 1))).alias("_k"),
        )
        .select(
            SRC,
            F.pmod(
                F.xxhash64(F.col(SRC), F.col("_k"), F.lit(cfg.seed)),
                F.lit(cfg.node_count),
            ).alias(DST),
        )
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
        .select(SRC, DST, F.lit(cfg.rel_type).alias(REL), F.lit(1.0).alias(W))
    )
    return SparkGraph(nodes=nodes, edges=edges, name="random")


@dataclass
class RwrSampleConfig:
    sampling_ratio: float = 0.15
    start_nodes: tuple[int, ...] = (0,)
    fanout: int = 3              # hash-kept neighbors per expansion
    max_rounds: int = 50
    seed: int = 42


def rwr_sample(graph: SparkGraph, config: RwrSampleConfig | None = None) -> SparkGraph:
    """Random-walk-with-restart flavored subgraph sample: BFS-like frontier
    where each node keeps its ``fanout`` smallest-hash neighbors, until
    >= sampling_ratio of nodes are visited. Returns the induced subgraph."""
    cfg = config or RwrSampleConfig()
    n_total = graph.nodes.count()
    target = max(int(n_total * cfg.sampling_ratio), len(cfg.start_nodes))
    edges = graph.edges.select(SRC, DST).distinct().localCheckpoint(eager=True)

    visited = graph.nodes.filter(
        F.col("id").isin([int(s) for s in cfg.start_nodes])
    ).select("id").localCheckpoint(eager=True)
    frontier = visited
    for _ in range(cfg.max_rounds):
        if visited.count() >= target or frontier.count() == 0:
            break
        ranked = (
            edges.join(frontier.withColumnRenamed("id", SRC), SRC)
            .withColumn("_rk", F.xxhash64(SRC, DST, F.lit(cfg.seed)))
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy(SRC).orderBy("_rk")
        kept = (
            ranked.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cfg.fanout)
            .select(F.col(DST).alias("id"))
            .distinct()
        )
        frontier = kept.join(visited, "id", "left_anti").localCheckpoint(eager=True)
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)

    sub_nodes = visited
    sub_edges = (
        graph.edges.join(sub_nodes.withColumnRenamed("id", SRC), SRC, "left_semi")
        .join(sub_nodes.withColumnRenamed("id", DST), DST, "left_semi")
    )
    nodes_out = graph.nodes.join(sub_nodes, "id", "left_semi")
    return SparkGraph(nodes=nodes_out, edges=sub_edges, id_map=graph.id_map,
                      name=f"{graph.name}_rwr")


@dataclass
class CnarwSampleConfig:
    sampling_ratio: float = 0.15
    start_nodes: tuple[int, ...] = (0,)
    fanout: int = 3
    max_rounds: int = 50
    seed: int = 42


def cnarw_sample(graph: SparkGraph, config: CnarwSampleConfig | None = None) -> SparkGraph:
    """Common-neighbour-aware random-walk sampling (reference
    graph-sampling/.../samplers/rw/cnarw/CommonNeighbourAwareNextNodeStrategy.java:51:
    a uniform candidate neighbor v of u is accepted with probability
    1 - overlap(u, v), overlap = |CN(u,v)| / min(deg u, deg v)) -- walks
    prefer neighbors whose neighborhoods DIFFER, expanding coverage faster
    than plain RWR.

    Distributed deterministic formulation: per-edge overlap is precomputed
    once (a wedge join, the triangle-counting plan restricted to edges),
    and each frontier node keeps the `fanout` neighbors with the smallest
    exponential key  hash_u(v) / (1 - overlap + eps)  -- a weighted sample
    whose acceptance distribution matches the reference's rejection loop.
    """
    cfg = config or CnarwSampleConfig()
    n_total = graph.nodes.count()
    target = max(int(n_total * cfg.sampling_ratio), len(cfg.start_nodes))
    und = (
        graph.edges.select(F.least(SRC, DST).alias("a"),
                           F.greatest(SRC, DST).alias("b"))
        .filter(F.col("a") != F.col("b")).distinct()
    )
    both = und.select(F.col("a").alias(SRC), F.col("b").alias(DST)) \
        .unionByName(und.select(F.col("b").alias(SRC), F.col("a").alias(DST))) \
        .localCheckpoint(eager=True)
    deg = both.groupBy(F.col(SRC).alias("id")).agg(F.count(F.lit(1)).alias("d"))
    # common neighbors per undirected edge: wedges (a-w-b) with a<b edge
    wa = both.select(F.col(DST).alias("w"), F.col(SRC).alias("a"))
    wb = both.select(F.col(DST).alias("w"), F.col(SRC).alias("b"))
    cn = (
        wa.join(wb, "w").filter(F.col("a") < F.col("b"))
        .join(und, ["a", "b"], "left_semi")
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("cn"))
    )
    weighted = (
        und.join(cn, ["a", "b"], "left").fillna(0, ["cn"])
        .join(deg.select(F.col("id").alias("a"), F.col("d").alias("_da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("d").alias("_db")), "b")
        .withColumn("_ov", F.col("cn") / F.least("_da", "_db"))
        .withColumn("_w", F.lit(1.0) - F.col("_ov") + F.lit(1e-6))
    )
    edges_w = weighted.select(F.col("a").alias(SRC), F.col("b").alias(DST), "_w") \
        .unionByName(weighted.select(F.col("b").alias(SRC),
                                     F.col("a").alias(DST), "_w")) \
        .localCheckpoint(eager=True)

    visited = graph.nodes.filter(
        F.col("id").isin([int(s) for s in cfg.start_nodes])
    ).select("id").localCheckpoint(eager=True)
    frontier = visited
    from pyspark.sql.window import Window

    for _ in range(cfg.max_rounds):
        if visited.count() >= target or frontier.count() == 0:
            break
        u = (F.pmod(F.xxhash64(SRC, DST, F.lit(cfg.seed)), F.lit(1_000_000_007))
             .cast("double") + 0.5) / 1_000_000_007.0
        ranked = (
            edges_w.join(frontier.withColumnRenamed("id", SRC), SRC)
            .withColumn("_key", -F.log(u) / F.col("_w"))
        )
        # Efraimidis-Spirakis: keep the SMALLEST -ln(u)/w keys
        w = Window.partitionBy(SRC).orderBy(F.col("_key").asc())
        kept = (
            ranked.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cfg.fanout)
            .select(F.col(DST).alias("id"))
            .distinct()
        )
        frontier = kept.join(visited, "id", "left_anti").localCheckpoint(eager=True)
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)

    sub_nodes = visited
    sub_edges = (
        graph.edges.join(sub_nodes.withColumnRenamed("id", SRC), SRC, "left_semi")
        .join(sub_nodes.withColumnRenamed("id", DST), DST, "left_semi")
    )
    nodes_out = graph.nodes.join(sub_nodes, "id", "left_semi")
    return SparkGraph(nodes=nodes_out, edges=sub_edges, id_map=graph.id_map,
                      name=f"{graph.name}_cnarw")
