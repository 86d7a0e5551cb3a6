"""CELF influence maximization (independent cascade).

Reference: influenceMaximization/CELF.java:43 -- greedy seed selection
under the independent-cascade model, estimated by Monte-Carlo simulation;
CELF's lazy priority queue is an evaluation-order optimization whose
output equals plain greedy, which is what we compute.

Spark formulation: for UNDIRECTED cascades, the spread of a seed set in
one simulation is the size of the union of connected components (of the
edge subgraph kept by that simulation's coin flips) that contain a seed.
All R simulations run as ONE connected-components pass over R disjoint
composite-id copies of the sampled graph (id' = id * R + sim); greedy
rounds are then joins over the (sim, node, component) membership table --
no per-candidate re-simulation. Coin flips are hash-derived per
(undirected edge, simulation), so the whole run is deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import DST, SRC, SparkGraph
from ..plans.checkpoint import truncate
from .wcc import WccConfig, wcc


@dataclass
class CelfConfig:
    seed_set_size: int = 3
    propagation_probability: float = 0.1
    monte_carlo_simulations: int = 20
    seed: int = 42


def celf(graph: SparkGraph, config: CelfConfig | None = None) -> DataFrame:
    """(node_id, spread): the greedy seed set in pick order; `spread` is the
    cumulative expected influence after adding that seed (GDS result shape)."""
    cfg = config or CelfConfig()
    R = cfg.monte_carlo_simulations
    canon = (
        graph.edges.select(F.least(SRC, DST).alias("a"),
                           F.greatest(SRC, DST).alias("b"))
        .filter(F.col("a") != F.col("b")).distinct()
    )
    sims = canon.select(
        "a", "b", F.explode(F.sequence(F.lit(0), F.lit(R - 1))).alias("sim"))
    live = sims.filter(
        F.pmod(F.xxhash64("a", "b", "sim", F.lit(cfg.seed)), F.lit(1_000_000))
        < int(cfg.propagation_probability * 1_000_000)
    )
    # R disjoint copies via composite ids; WCC once over the union
    comp_edges = live.select(
        (F.col("a") * R + F.col("sim")).alias(SRC),
        (F.col("b") * R + F.col("sim")).alias(DST),
        F.lit("SIM").alias("rel_type"), F.lit(1.0).alias("weight"),
    )
    comp_nodes = (
        graph.nodes.select("id")
        .select("id", F.explode(F.sequence(F.lit(0), F.lit(R - 1))).alias("sim"))
        .select((F.col("id") * R + F.col("sim")).alias("id"))
    )
    membership = truncate(
        wcc(SparkGraph(nodes=comp_nodes, edges=comp_edges), WccConfig()).state
        .select((F.col("id") % R).alias("sim"),
                F.floor(F.col("id") / R).alias("node"),
                F.col("component").alias("comp")),
        "celf_members",
    )
    sizes = membership.groupBy("sim", "comp").agg(
        F.count(F.lit(1)).alias("size"))
    gains_base = truncate(
        membership.join(sizes, ["sim", "comp"]), "celf_gains")

    spark = graph.nodes.sparkSession
    covered = spark.createDataFrame([], "sim int, comp bigint")
    picks: list[tuple[int, float]] = []
    total = 0.0
    for _ in range(cfg.seed_set_size):
        gains = (
            gains_base.join(covered, ["sim", "comp"], "left_anti")
            .groupBy("node").agg((F.sum("size") / F.lit(R)).alias("gain"))
            .orderBy(F.col("gain").desc(), F.col("node").asc())
            .limit(1)
            .collect()
        )
        if not gains:
            break
        node, gain = int(gains[0]["node"]), float(gains[0]["gain"])
        total += gain
        picks.append((node, round(total, 6)))
        covered = covered.unionByName(
            membership.filter(F.col("node") == node).select("sim", "comp")
        ).distinct().localCheckpoint(eager=True)
    return spark.createDataFrame(picks, "node_id long, spread double")
