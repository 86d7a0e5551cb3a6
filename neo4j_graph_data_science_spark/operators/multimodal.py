"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Brief-mandated component: at 100 TB the engine treats media as
``binary`` payload columns with typed metadata, processed by Arrow-batched
``mapInPandas`` kernels (decode / resize / feature-extract / frame-sample).
The image/audio codec libraries are NOT available in this container, so the
decode step is STUBBED: ``decode=fake`` produces a deterministic fake
decode derived from the payload bytes (so the full Spark plumbing --
schema, partitioning, batch shape, UDF signature -- is real and tested),
and ``decode=real`` raises NotImplementedError at the exact integration
point where PIL/librosa/pyav would slot in.

Design notes for scale:
  * payloads stay packed in Arrow record batches end to end -- one python
    roundtrip per BATCH, never per row;
  * `spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch memory for
    multi-MB payloads (set it to ~64 for video);
  * metadata (width/height/duration/codec) lives in plain columns so
    Catalyst can prune/filter WITHOUT touching the binary payload --
    filters on metadata push down to the parquet scan and skip payload IO.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("payload", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("feature", ArrayType(DoubleType())),
    StructField("n_bytes", LongType()),
])


def synthesize_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = hash-stretched)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        F.encode(
            F.concat_ws(":", F.lit("payload"), F.col("id").cast("string"),
                        F.md5(F.col("id").cast("string"))), "utf-8"
        ).cast("binary").alias("payload"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(1080)) + 1).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 3)), F.lit(600000))).cast("long").alias("duration_ms"),
    )


def _fake_decode_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder+featurizer: md5-seeded
    pseudo-features in [-1, 1). Replace with PIL/librosa at `decode=real`."""
    out = []
    h = payload
    while len(out) < dim:
        h = hashlib.md5(h).digest()
        out.extend((b - 128) / 128.0 for b in h)
    return out[:dim]


@dataclass
class MediaFeatureConfig:
    feature_dim: int = 16
    decode: str = "fake"        # fake | real
    batch_size_hint: int = 256


def extract_features(media: DataFrame, config: MediaFeatureConfig | None = None) -> DataFrame:
    """(media_id, kind, feature, n_bytes) via Arrow-batched mapInPandas."""
    cfg = config or MediaFeatureConfig()
    if cfg.decode == "real":
        raise NotImplementedError(
            "real decode requires PIL/librosa/pyav (not in this container); "
            "wire them here -- the batch iterator below is the only place "
            "payload bytes are materialized in python"
        )
    dim = cfg.feature_dim

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _fake_decode_features(bytes(p), dim) for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
                "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
            })

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_ts_ms) rows -- the
    Catalyst-side explode that a real decoder would consume per frame.
    Metadata-only: never touches the payload column."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
