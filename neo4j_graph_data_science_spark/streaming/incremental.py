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
  * ``streaming_conversation_state``: a CUSTOM STATEFUL operator via
    ``applyInPandasWithState`` -- per-conversation session state (turn and
    tool-call tallies, last turn index) maintained across micro-batches,
    with inactivity-timeout finalization. This is the shape Spark offers
    for operators that windowed aggregation cannot express (arbitrary
    per-key state machines over the transcript feed).

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


def streaming_conversation_state(
    transcripts_stream: DataFrame,
    inactivity_timeout_ms: int = 60_000,
) -> DataFrame:
    """Per-conversation session tracking as an arbitrary-stateful streaming
    operator (``applyInPandasWithState``, keyed by conv_id).

    Each micro-batch folds the conversation's new turns into its state
    (turns seen, tool-call count, highest turn_idx); an update row is
    emitted per touched conversation per trigger (is_final=false). A
    conversation idle longer than ``inactivity_timeout_ms`` of processing
    time is FINALIZED: its state is removed and a last row with
    is_final=true emitted -- the sessionization pattern windowed aggs
    can't express (state lifetime depends on data, not wall-clock bins).

    Scale shape: state lives in the state store partitioned by key hash
    (RocksDB-backed on a real cluster); each micro-batch shuffles only the
    NEW turns by conv_id; Arrow-batched pandas per key group, never
    per-row Python."""
    import pandas as pd  # noqa: PLC0415 -- worker-side import kept local

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        BooleanType, IntegerType, LongType, StringType, StructField,
        StructType,
    )

    out_schema = StructType([
        StructField("conv_id", StringType()),
        StructField("turns", LongType()),
        StructField("tool_calls", LongType()),
        StructField("max_turn_idx", IntegerType()),
        StructField("is_final", BooleanType()),
    ])
    state_schema = StructType([
        StructField("turns", LongType()),
        StructField("tool_calls", LongType()),
        StructField("max_turn_idx", IntegerType()),
    ])

    def fn(key, pdfs, state: GroupState):
        conv_id = key[0]
        if state.hasTimedOut:
            turns, tools, mx = state.get
            state.remove()
            yield pd.DataFrame({
                "conv_id": [conv_id], "turns": [turns],
                "tool_calls": [tools], "max_turn_idx": [mx],
                "is_final": [True],
            })
            return
        turns, tools, mx = state.get if state.exists else (0, 0, -1)
        for pdf in pdfs:
            turns += len(pdf)
            tools += int(pdf["tool"].notna().sum())
            if len(pdf):
                mx = max(mx, int(pdf["turn_idx"].max()))
        state.update((turns, tools, mx))
        state.setTimeoutDuration(inactivity_timeout_ms)
        yield pd.DataFrame({
            "conv_id": [conv_id], "turns": [turns], "tool_calls": [tools],
            "max_turn_idx": [mx], "is_final": [False],
        })

    return transcripts_stream.groupBy("conv_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def await_stream_drained(sq, timeout_s: float = 300.0, until=None) -> bool:
    """Wait until an availableNow STATEFUL stream has consumed all its
    input -- a completed batch with numInputRows == 0 -- or ``until()``
    returns True, then stop it. Returns True if drained, False on timeout
    (the query is stopped either way).

    Needed because a query holding ``applyInPandasWithState`` state with
    ProcessingTimeTimeout keeps scheduling no-data micro-batches to
    evaluate pending timeouts, so Trigger.AvailableNow never
    self-terminates (observed on Spark 4.1: empty batches continue even
    after every key's state is removed). awaitTermination() would block
    for its full timeout; polling progress is the reliable completion
    signal."""
    import time

    deadline = time.time() + timeout_s
    drained = False
    while time.time() < deadline:
        if until is not None and until():
            drained = True
            break
        lp = sq.lastProgress
        if lp is not None and lp.get("numInputRows", 1) == 0 and until is None:
            drained = True
            break
        if not sq.isActive:
            drained = True
            break
        time.sleep(0.5)
    try:
        sq.stop()
    except Exception:
        pass
    return drained


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
