"""Path / traversal algorithms: BFS, single-source shortest paths.

Reference semantics:
  * BFS: algo/src/main/java/org/neo4j/gds/paths/traverse/BFS.java --
    level-synchronous frontier expansion; result = hop distance.
  * SSSP: GDS ships Dijkstra (paths/dijkstra/Dijkstra.java:43) and
    Delta-stepping (paths/delta/DeltaStepping.java:51) and Bellman-Ford
    (paths/bellmanford/BellmanFord.java:49). A driver-side priority queue
    does not distribute; the DataFrame-native formulation is Bellman-Ford
    frontier relaxation -- exactly delta-stepping with a single unbounded
    bucket. For non-negative weights the fixpoint equals Dijkstra's output.

Spark plan per round: frontier (vertices whose dist improved) joins the
src-partitioned edges, candidate dists combine per dst with a min-reducer
(one map-side-combined shuffle -- the ReducingMessenger), then fold into
state with least(). Rounds = graph diameter for BFS / #relaxation waves for
SSSP. Scale: frontier is a filtered state DF, so message volume tracks the
active set, not V; hubs are handled by the min-combiner + AQE.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import DST, SRC, W, SparkGraph
from ..plans.pregel import PregelConfig, prepare_edges, run_pregel

INF = float("inf")


@dataclass
class PathConfig:
    max_iterations: int = 200
    weighted: bool = False
    partitions: int | None = None


def _relax_loop(edges: DataFrame, state0: DataFrame, cost, max_iters: int) -> DataFrame:
    """Generic relaxation: state (id, dist, changed); cost = Column over the
    joined (edge, src-state) row giving the candidate dist at dst."""

    def superstep(state: DataFrame, it: int) -> DataFrame:
        frontier = state.filter(F.col("changed") & (F.col("dist") != INF))
        cands = (
            edges.join(
                frontier.select(F.col("id").alias(SRC), F.col("dist").alias("_sd")), SRC
            )
            .select(F.col(DST).alias("id"), cost.alias("_cand"))
            .groupBy("id")
            .agg(F.min("_cand").alias("cand"))
        )
        return (
            state.join(cands, "id", "left")
            .select(
                "id",
                F.least(F.col("dist"), F.coalesce("cand", F.col("dist"))).alias("dist"),
                (F.coalesce("cand", F.lit(INF)) < F.col("dist")).alias("changed"),
            )
        )

    res = run_pregel(state0, superstep, lambda o, n, i: False,
                     PregelConfig(max_iterations=max_iters, track_metrics=False),
                     stats=[F.max(F.col("changed").cast("int"))],
                     converged_stats=lambda row, it: not row[1])
    return res.state.select("id", "dist")


def bfs(graph: SparkGraph, sources: Sequence[int],
        config: PathConfig | None = None) -> DataFrame:
    """(id, dist): minimum hop count from any source; unreachable omitted."""
    cfg = config or PathConfig()
    edges = prepare_edges(graph.edges.select(SRC, DST).distinct(), cfg.partitions)
    src_list = [int(s) for s in sources]
    state0 = graph.nodes.select(
        "id",
        F.when(F.col("id").isin(src_list), F.lit(0.0)).otherwise(F.lit(INF)).alias("dist"),
        F.col("id").isin(src_list).alias("changed"),
    )
    out = _relax_loop(edges, state0, F.col("_sd") + F.lit(1.0), cfg.max_iterations)
    edges.unpersist()
    return out.filter(F.col("dist") != INF).select(
        "id", F.col("dist").cast("long").alias("dist")
    )


def shortest_paths(graph: SparkGraph, sources: Sequence[int],
                   config: PathConfig | None = None) -> DataFrame:
    """(id, dist): single/multi-source shortest path cost over edge weights
    (Bellman-Ford relaxation; = Dijkstra's result for non-negative weights).
    Parallel edges collapse to their min weight first."""
    cfg = config or PathConfig()
    e = graph.aggregated_edges("MIN")
    edges = prepare_edges(e, cfg.partitions)
    src_list = [int(s) for s in sources]
    state0 = graph.nodes.select(
        "id",
        F.when(F.col("id").isin(src_list), F.lit(0.0)).otherwise(F.lit(INF)).alias("dist"),
        F.col("id").isin(src_list).alias("changed"),
    )
    out = _relax_loop(edges, state0, F.col("_sd") + F.col(W), cfg.max_iterations)
    edges.unpersist()
    return out.filter(F.col("dist") != INF)


def collapse_path(graph: SparkGraph, rel_types: Sequence[str],
                  new_type: str = "COLLAPSED") -> DataFrame:
    """gds.collapsePath (algo/.../walking/CollapsePath.java:46): compose a
    chain of relationship hops into one relationship. Output
    (src, dst, rel_type) distinct endpoint pairs of the multi-hop path."""
    hops = [
        graph.edges.filter(F.col("rel_type") == t).select(SRC, DST) for t in rel_types
    ]
    cur = hops[0]
    for i, nxt in enumerate(hops[1:]):
        step = nxt.select(
            F.col(SRC).alias(f"_mid{i}"), F.col(DST).alias(f"_nd{i}")
        )
        cur = (
            cur.join(step, cur[DST] == step[f"_mid{i}"])
            .select(F.col(SRC), F.col(f"_nd{i}").alias(DST))
        )
    return cur.distinct().select(SRC, DST, F.lit(new_type).alias("rel_type"))


def topological_sort(graph: SparkGraph, max_iterations: int = 10000) -> DataFrame:
    """(id, level): Kahn peeling by levels (dag/topologicalsort/
    TopologicalSort.java:54). level k = vertices whose in-edges all come from
    levels < k. Vertices on or downstream of a cycle are omitted, matching
    GDS (it streams only sortable nodes).

    Each round removes the zero-in-degree layer: one left_anti join to find
    the layer + one semi-join to shrink the edge set. Rounds = DAG depth.
    """
    # localCheckpoint (not persist): each round's plan references the
    # previous round's DataFrames multiple times, so without true lineage
    # truncation the logical plan tree doubles every round and Catalyst
    # analysis time grows exponentially (the classic iterative-DF pitfall).
    edges = graph.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST)) \
        .distinct().localCheckpoint(eager=True)
    remaining = graph.nodes.select("id").localCheckpoint(eager=True)
    levels: list[DataFrame] = []
    for level in range(max_iterations):
        has_in = edges.select(F.col(DST).alias("id")).distinct()
        layer = remaining.join(has_in, "id", "left_anti").localCheckpoint(eager=True)
        if layer.count() == 0:
            break
        levels.append(layer.select("id", F.lit(level).cast("long").alias("level")))
        remaining = remaining.join(layer, "id", "left_anti") \
            .localCheckpoint(eager=True)
        edges = edges.join(layer.withColumnRenamed("id", SRC), SRC, "left_anti") \
            .localCheckpoint(eager=True)
    if not levels:
        return graph.nodes.select("id", F.lit(0).cast("long").alias("level")).limit(0)
    out = levels[0]
    for df in levels[1:]:
        out = out.unionByName(df)
    return out
