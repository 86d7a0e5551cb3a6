"""Structured Streaming surface: incremental transcript-graph maintenance.

GDS has NO streaming subsystem (its "stream" mode is a result cursor --
SURVEY.md section 2.6); the reference analogue of durable progress is batch
checkpointing, which plans/checkpoint.py provides. This module adds what a
*continuously ingested* transcript table needs on Spark:

  * ``streaming_edge_counts``: readStream over a transcript source ->
    watermarked sliding-window edge-rate aggregation (arrivals per
    conv_id window) -- the standard monitoring feed.
  * ``streaming_degree_update``: foreachBatch incremental maintenance of
    the (id, out_degree) table -- each micro-batch derives edges for the
    new turns ONLY (window functions need the full conv, so late turns are
    bounded by the watermark and conversations are re-derived per batch
    from the delta + tail state).

Both are thin, testable wiring: the heavy lifting stays in the batch
operators; foreachBatch reuses them unchanged -- the recommended Spark
pattern for incremental jobs that need full SQL expressiveness.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.transcripts import derive_edges, transcript_id_map


def streaming_edge_counts(
    transcripts_stream: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "15 minutes",
) -> DataFrame:
    """Windowed arrival counts per conversation over a streaming transcript
    source. Late rows beyond the watermark are dropped (documented,
    deterministic late-data policy)."""
    return (
        transcripts_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), F.col("conv_id"))
        .agg(F.count(F.lit(1)).alias("turns"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "conv_id",
            "turns",
        )
    )


def degree_update_batch_fn(
    state_path: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function maintaining a parquet (conv_id, turn_idx ...)
    accumulation and a derived out-degree table. Each micro-batch appends
    the new turns, re-derives edges for ONLY the touched conversations
    (conv-local window functions make this exact), and overwrites their
    degree rows."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch.write.mode("append").parquet(f"{state_path}/turns")
        touched = [r["conv_id"] for r in batch.select("conv_id").distinct().collect()]
        if not touched:
            return
        full = spark.read.parquet(f"{state_path}/turns").filter(
            F.col("conv_id").isin(touched)
        )
        idm = transcript_id_map(full)
        edges = derive_edges(full, idm)
        deg = (
            edges.join(idm.withColumnRenamed("id", "src"), "src")
            .groupBy("conv_id", "turn_idx")
            .agg(F.count(F.lit(1)).alias("out_degree"))
        )
        # dynamic partition overwrite keyed by conv_id: re-derived
        # conversations REPLACE their previous rows (a per-batch directory
        # would leave stale duplicates for conversations reprocessed later);
        # on an Iceberg catalog this would be replaceWhere on conv_id
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        deg.write.mode("overwrite").partitionBy("conv_id").parquet(
            f"{state_path}/degree"
        )

    return fn
