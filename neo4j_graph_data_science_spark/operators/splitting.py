"""Relationship splitting for ML training (gds.alpha.ml.splitRelationships).

Reference semantics (ml/ml-algo/src/main/java/org/neo4j/gds/ml/splitting/
SplitRelationships.java, EdgeSplitter.java:28-110):

  * the valid candidate set is every relationship whose endpoints pass the
    source/target node filters (EdgeSplitter.splitPositiveExamples's
    isValidNodePair); invalid relationships are dropped from BOTH outputs;
  * ``floor(validCount * holdoutFraction)`` relationships are sampled into
    the SELECTED set and carry the property ``label = 1.0``
    (EdgeSplitter.POSITIVE / RELATIONSHIP_PROPERTY);
  * everything else valid lands in the REMAINING set with its original
    weight;
  * on an UNDIRECTED graph the split operates on the undirected pair
    (each pair considered once) and selected holdout relationships are
    emitted as a single directed row (UndirectedEdgeSplitter;
    Direction.DIRECTED on the selected builder).

The reference samples with a seeded sequential RNG (EdgeSplitter.sample);
a distributed engine cannot replay a serial RNG stream, so this
implementation makes the same-size sample DETERMINISTICALLY: candidates
are ranked by a keyed hash of (seed, src, dst) and the first
``floor(count * fraction)`` become the holdout.  Statistically this is the
same uniform-without-replacement draw; the exact membership differs from
the Java RNG (documented deviation, same class as the engine's
hash-deterministic random walks).

Execution shape: the hash rank is computed with the partition-parallel
bucketed ranking from catalog.bucketed_dense_ids (per-bucket window +
one-row-per-bucket offsets) -- NOT a global ``Window.orderBy`` single-
partition sort, which was exactly the round-1 dense-id scale bug.  The
cut count rides in a one-row broadcast crossJoin; no driver-side action.
hash_mode="md5" exists so the DuckDB oracle can replicate the draw
bit-for-bit (house convention, see operators/dedup.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import DST, SRC, W, bucketed_dense_ids


@dataclass
class RelationshipSplit:
    """selected: (src, dst, label=1.0); remaining: (src, dst[, weight])."""

    selected: DataFrame
    remaining: DataFrame


def split_relationships(
    edges: DataFrame,
    holdout_fraction: float = 0.3,
    seed: int = 42,
    hash_mode: str = "xxhash64",
    undirected: bool = False,
    source_filter: str | None = None,
    target_filter: str | None = None,
) -> RelationshipSplit:
    """Split edges into a positive holdout (label 1.0) and the remainder.

    ``source_filter`` / ``target_filter``: SQL predicates over the
    pseudo-column ``node`` applied to src/dst respectively (the
    sourceNodeLabels/targetNodeLabels analogue)."""
    from ..catalog import bind_node_filter

    if not 0.0 <= holdout_fraction <= 1.0:
        raise ValueError("holdout_fraction must be in [0, 1]")
    if hash_mode not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_mode {hash_mode!r}")

    e = bind_node_filter(edges, source_filter, SRC)
    e = bind_node_filter(e, target_filter, DST)

    has_w = W in e.columns
    keep = [SRC, DST] + ([W] if has_w else [])
    e = e.select(*keep)

    if undirected:
        # one candidate per undirected pair: canonicalize, keep first
        # weight deterministically (min) if present
        lo, hi = F.least(SRC, DST), F.greatest(SRC, DST)
        agg = [F.min(W).alias(W)] if has_w else []
        e = (e.select(lo.alias(SRC), hi.alias(DST), *([W] if has_w else []))
             .groupBy(SRC, DST).agg(*agg)
             if has_w else
             e.select(lo.alias(SRC), hi.alias(DST)).distinct())

    if hash_mode == "md5":
        draw = F.md5(F.concat_ws(":", F.lit(seed), F.col(SRC), F.col(DST)))
        bucket = F.substring(F.col("_h"), 1, 2)  # 256 hex-prefix buckets
    else:
        draw = F.xxhash64(F.lit(seed), F.col(SRC), F.col(DST))
        bucket = F.floor(F.col("_h") / F.lit(1 << 48))  # 65536 buckets
    e = e.withColumn("_h", draw)

    # partition-parallel global rank by (_h, src, dst); "id" = rank - 1
    ranked = bucketed_dense_ids(e, ["_h", SRC, DST], bucket)
    cut = (e.agg(F.floor(F.count(F.lit(1))
                         * F.lit(holdout_fraction)).alias("_cut")))
    ranked = ranked.crossJoin(F.broadcast(cut))

    selected = (ranked.filter(F.col("id") < F.col("_cut"))
                .select(SRC, DST, F.lit(1.0).alias("label")))
    remaining = (ranked.filter(F.col("id") >= F.col("_cut"))
                 .select(*keep))
    return RelationshipSplit(selected=selected, remaining=remaining)
