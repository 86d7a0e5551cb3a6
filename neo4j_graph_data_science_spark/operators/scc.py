"""Strongly connected components.

Reference: algo/src/main/java/org/neo4j/gds/scc/Scc.java:36 -- a SEQUENTIAL
iterative Tarjan variant whose component ids are traversal-order-dependent;
GDS's own tests therefore assert component *structure*, not ids
(SccTest.java:77-101). We normalize component id = MIN member id, which is a
stable canonical labeling of the same partition.

Distributed formulation (shared-memory Tarjan does not port): iterative
trim + forward/backward min-label peeling, the standard Pregel-style SCC
(cf. Hong et al. "On fast parallel detection of strongly connected
components"):

  1. TRIM: repeatedly peel vertices with zero in- or out-degree in the
     remaining subgraph -- each is a singleton SCC. (Kills all acyclic
     structure cheaply; chains/trees never reach the expensive phase.)
  2. For the remainder: f(v) = min id that can REACH v (forward min
     propagation to fixpoint); b(v) = min id v can reach (backward).
     Vertices with f(v) == b(v) == c are exactly SCC(c) for each root c
     that is the minimum of both reachability sets; assign component=f(v),
     remove them, repeat. Each round removes at least the SCC of the
     minimum remaining id.

All phases are edge joins + min-reduced shuffles on the Pregel kernel.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import DST, SRC, SparkGraph
from ..plans.local_kernel import local_scc, should_run_local
from ..plans.pregel import PregelConfig, prepare_edges, run_pregel


@dataclass
class SccConfig:
    max_outer_rounds: int = 50
    max_propagation_iters: int = 200
    partitions: int | None = None
    # subcritical fast path: one-task iterative Tarjan (the reference's own
    # execution shape) below 2M edges; 0 disables.
    small_graph_edges: int | None = None


def _min_propagate(edges: DataFrame, nodes: DataFrame, reverse: bool,
                   max_iters: int) -> DataFrame:
    """Fixpoint of label(v) = min(label(v), min over in-neighbors' labels).

    reverse=False propagates along src->dst (f = min id reaching v);
    reverse=True along dst->src (b = min id v reaches).
    """
    a, b = (DST, SRC) if reverse else (SRC, DST)
    state0 = nodes.select("id", F.col("id").alias("comp"),
                          F.lit(True).alias("changed"))

    def superstep(state: DataFrame, it: int) -> DataFrame:
        active = state.filter(F.col("changed"))
        msgs = (
            edges.join(active.select(F.col("id").alias(a), "comp"), a)
            .groupBy(F.col(b).alias("id"))
            .agg(F.min("comp").alias("msg"))
        )
        return state.join(msgs, "id", "left").select(
            "id",
            F.least(F.col("comp"), F.coalesce("msg", F.col("comp"))).alias("comp"),
            (F.coalesce("msg", F.col("comp")) < F.col("comp")).alias("changed"),
        )

    res = run_pregel(state0, superstep, lambda o, n, i: False,
                     PregelConfig(max_iterations=max_iters, track_metrics=False),
                     stats=[F.max(F.col("changed").cast("int"))],
                     converged_stats=lambda row, it: not row[1])
    return res.state.select("id", "comp")


def scc(graph: SparkGraph, config: SccConfig | None = None) -> DataFrame:
    """Returns (id, component) with component = min member id (exact)."""
    cfg = config or SccConfig()
    # localCheckpoint (not persist) everywhere: each round's plan references
    # the previous round's DFs multiple times, so only true lineage
    # truncation keeps Catalyst analysis O(1) per round.
    all_edges = graph.edges.select(SRC, DST).distinct().localCheckpoint(eager=True)
    n_edges = all_edges.count()
    if should_run_local(n_edges, cfg.small_graph_edges, None):
        return local_scc(all_edges, graph.nodes.select("id"))
    remaining = graph.nodes.select("id").localCheckpoint(eager=True)
    assigned_parts: list[DataFrame] = []

    for _ in range(cfg.max_outer_rounds):
        if remaining.limit(1).count() == 0:
            break
        e = (
            all_edges.join(remaining.withColumnRenamed("id", SRC), SRC, "left_semi")
            .join(remaining.withColumnRenamed("id", DST), DST, "left_semi")
            .filter(F.col(SRC) != F.col(DST))
            .localCheckpoint(eager=True)
        )
        # ---- TRIM: peel zero in/out degree vertices (singleton SCCs) ----
        while True:
            with_out = e.select(F.col(SRC).alias("id")).distinct()
            with_in = e.select(F.col(DST).alias("id")).distinct()
            on_cycle = with_out.join(with_in, "id", "inner") \
                .localCheckpoint(eager=True)
            trimmed = remaining.join(on_cycle, "id", "left_anti") \
                .localCheckpoint(eager=True)
            if trimmed.count() == 0:
                break
            assigned_parts.append(
                trimmed.select("id", F.col("id").alias("component"))
            )
            remaining = remaining.join(on_cycle, "id", "inner") \
                .localCheckpoint(eager=True)
            e = (
                e.join(remaining.withColumnRenamed("id", SRC), SRC, "left_semi")
                .join(remaining.withColumnRenamed("id", DST), DST, "left_semi")
                .localCheckpoint(eager=True)
            )
        if remaining.limit(1).count() == 0:
            break
        # ---- peel: forward/backward min labels over remaining subgraph ----
        ep = prepare_edges(e, cfg.partitions)
        fwd = _min_propagate(ep, remaining, False, cfg.max_propagation_iters)
        bwd = _min_propagate(ep, remaining, True, cfg.max_propagation_iters)
        both = fwd.withColumnRenamed("comp", "f").join(
            bwd.withColumnRenamed("comp", "b"), "id"
        )
        done = both.filter(F.col("f") == F.col("b")).select(
            "id", F.col("f").alias("component")
        ).localCheckpoint(eager=True)
        assigned_parts.append(done)
        remaining = remaining.join(done, "id", "left_anti") \
            .localCheckpoint(eager=True)
        ep.unpersist()

    out = assigned_parts[0] if assigned_parts else graph.nodes.select(
        "id", F.col("id").alias("component")
    ).limit(0)
    for p in assigned_parts[1:]:
        out = out.unionByName(p)
    return out
