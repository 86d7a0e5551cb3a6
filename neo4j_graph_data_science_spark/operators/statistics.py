"""Result post-processing parity: community statistics histograms,
minCommunitySize filtering, global topN -- and `estimate` mode.

References:
  * algo-common/src/main/java/org/neo4j/gds/result/HistogramUtils.java:39-48
    (communitySummary percentiles p1 p5 p10 p25 p50 p75 p90 p95 p99 p100)
    and :57-66 (similaritySummary adds p999 + mean/min/max/stdDev).
  * CommunityCompanion.java:44-110 (minCommunitySize filtering).
  * AlgorithmProcessingTemplate.java:38-115 (estimate mode: a memory range
    before running).

The reference builds HdrHistograms per community-size array; here the same
numbers come from one groupBy + one percentile_approx aggregate -- exact
enough at the default accuracy (10k) and one pass at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import SparkGraph, register_cache

COMMUNITY_PERCENTILES = [1, 5, 10, 25, 50, 75, 90, 95, 99, 100]
SIMILARITY_PERCENTILES = [1, 5, 10, 25, 50, 75, 90, 95, 99, 99.9, 100]


def community_sizes(labels: DataFrame, col: str = "community") -> DataFrame:
    return labels.groupBy(col).agg(F.count(F.lit(1)).alias("size"))


def community_summary(labels: DataFrame, col: str = "community") -> DataFrame:
    """1-row DF: communityCount, min, max, mean, p1..p100 of community sizes
    (HistogramUtils.communitySummary parity)."""
    sizes = community_sizes(labels, col)
    aggs = [
        F.count(F.lit(1)).alias("communityCount"),
        F.min("size").alias("min"),
        F.max("size").alias("max"),
        F.avg("size").alias("mean"),
    ]
    for p in COMMUNITY_PERCENTILES:
        name = f"p{p}".replace(".", "_")
        aggs.append(F.expr(f"percentile(size, {p / 100.0})").alias(name))
    return sizes.agg(*aggs)


def similarity_summary(scores: DataFrame, col: str = "similarity") -> DataFrame:
    """1-row DF: min/max/mean/stdDev + p1..p999 of a similarity column
    (HistogramUtils.similaritySummary parity)."""
    aggs = [
        F.min(col).alias("min"),
        F.max(col).alias("max"),
        F.avg(col).alias("mean"),
        F.stddev_pop(col).alias("stdDev"),
    ]
    for p in SIMILARITY_PERCENTILES:
        name = "p999" if p == 99.9 else f"p{p}"
        aggs.append(F.expr(f"percentile({col}, {p / 100.0})").alias(name))
    return scores.agg(*aggs)


def apply_min_community_size(labels: DataFrame, min_size: int,
                             col: str = "community") -> DataFrame:
    """Drop rows of communities smaller than min_size
    (CommunityCompanion.java:44-110: such nodes stream no result).

    ``labels`` is persisted: it feeds both the size filter and the
    semi-join, and is typically a full community-detection result whose
    re-evaluation would re-run the algorithm."""
    labels = register_cache(labels.persist())
    keep = community_sizes(labels, col).filter(F.col("size") >= min_size) \
        .select(col)
    return labels.join(keep, col, "left_semi")


def global_top_n(pairs: DataFrame, n: int,
                 score_col: str = "similarity") -> DataFrame:
    """Global topN rows by score (node-similarity's topN post-filter, as
    opposed to per-node topK). Deterministic tie-break on the remaining
    columns. TakeOrderedAndProject: no full sort, each partition keeps n."""
    others = [c for c in pairs.columns if c != score_col]
    return pairs.orderBy(F.col(score_col).desc(),
                         *[F.col(c).asc() for c in others]).limit(n)


# ---------------------------------------------------------------------------
# estimate mode
# ---------------------------------------------------------------------------

# bytes per vertex of persistent state, per algorithm family (DataFrame rows:
# id(8) + fields; Spark row overhead folded into the 2x upper bound)
_STATE_WIDTHS = {
    "pagerank": 24,       # id, rank, delta
    "wcc": 16,            # id, component
    "scc": 24,
    "labelprop": 16,
    "triangle": 16,
    "betweenness": 40,    # (s, node) pairs dominate -> see pair_factor
    "louvain": 24,
    "leiden": 32,
    "fastrp": 8,          # + dim * 8 (below)
    "hits": 24,
    "kcore": 16,
    "sllpa": 48,          # map-typed label memory
    "kmeans": 16,         # + dim * 8
    "node2vec": 8,        # + dim * 8 (walk rows are transient)
    "hashgnn": 8,         # + density * 8
    "maxkcut": 16,
    "celf": 24,           # x simulations via pair rows (see betweenness)
    "spanningtree": 24,
}


def estimate(graph: SparkGraph, algorithm: str, *,
             embedding_dim: int = 0, sampling_size: int | None = None) -> dict:
    """Memory-range estimate BEFORE running (estimate mode,
    AlgorithmProcessingTemplate.java:38-115): a row-count x row-width model
    over the node/edge DataFrames. Returns bytesMin/bytesMax plus the counts
    used, like GDS's MemoryEstimateResult.

    The node/edge counts are one cheap count() each (parquet footers make
    these metadata-only scans when possible).
    """
    algo = algorithm.lower()
    n = graph.node_count()
    m = graph.relationship_count()
    width = _STATE_WIDTHS.get(algo, 24) + embedding_dim * 8
    state = n * width
    # shuffled message volume upper bound: one combined row per edge
    messages = m * 24
    if algo == "betweenness":
        sources = sampling_size if sampling_size is not None else n
        state = state * max(sources, 1)
        messages = messages * max(sources, 1)
    lo = state + messages
    hi = 2 * lo  # Tungsten row overhead + shuffle spill headroom
    return {
        "algorithm": algo,
        "nodeCount": n,
        "relationshipCount": m,
        "bytesMin": int(lo),
        "bytesMax": int(hi),
        "requiredMemory": f"[{int(lo)} Bytes ... {int(hi)} Bytes]",
    }


class MemoryGuardError(RuntimeError):
    """Raised when an estimated run would exceed the session's memory."""


def _session_memory_bytes(spark) -> int:
    """Usable execution+storage memory of the session: executor memory x
    spark.memory.fraction x executor count (local mode = 1 JVM). Falls back
    to the JVM's actual max heap when no explicit setting exists."""
    conf = spark.sparkContext.getConf()
    mem = conf.get("spark.executor.memory", None) or conf.get(
        "spark.driver.memory", None)
    if mem:
        units = {"k": 2**10, "m": 2**20, "g": 2**30, "t": 2**40}
        m = str(mem).strip().lower()
        mult = units.get(m[-1], 1)
        size = int(float(m[:-1] if m[-1] in units else m)) * mult
    else:
        size = int(spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory())
    frac = float(conf.get("spark.memory.fraction", "0.6"))
    n_exec = max(int(conf.get("spark.executor.instances", "1")), 1)
    return int(size * frac * n_exec)


def memory_guard(graph: SparkGraph, algorithm: str, spark=None, *,
                 embedding_dim: int = 0, sampling_size: int | None = None,
                 use_max_estimate: bool = False) -> dict:
    """Enforce estimate mode BEFORE running, as the reference's MemoryGuard
    (applications/algorithms/machinery/
    DefaultAlgorithmProcessingTemplate.java:59 refuses runs whose estimate
    exceeds free memory; `sudo`/bypass there == use_max_estimate=False
    here checks bytesMin, True checks bytesMax). Raises MemoryGuardError
    with both numbers when the estimate does not fit; returns the estimate
    dict (with the budget attached) when it does."""
    est = estimate(graph, algorithm, embedding_dim=embedding_dim,
                   sampling_size=sampling_size)
    spark = spark or graph.nodes.sparkSession
    budget = _session_memory_bytes(spark)
    need = est["bytesMax"] if use_max_estimate else est["bytesMin"]
    est["memoryBudgetBytes"] = budget
    if need > budget:
        raise MemoryGuardError(
            f"{algorithm}: estimated {'max' if use_max_estimate else 'min'} "
            f"memory {need} B exceeds the session's usable memory "
            f"{budget} B (executor memory x spark.memory.fraction x "
            "executors); shrink the graph/config or raise executor memory"
        )
    return est
