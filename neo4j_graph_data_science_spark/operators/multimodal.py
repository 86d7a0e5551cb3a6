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


def probe_decoders() -> dict[str, bool]:
    """Which real decoders are importable in this environment:
    PIL (image), soundfile (audio), av (video). The engine feature-gates
    ``decode=real`` on these instead of hard-failing at import."""
    import importlib.util as ilu

    return {"image": ilu.find_spec("PIL") is not None,
            "audio": ilu.find_spec("soundfile") is not None,
            "video": ilu.find_spec("av") is not None}


def _real_decode_features(payload: bytes, kind: str, dim: int) -> list[float]:
    """Real decode+featurize, imported lazily PER EXECUTOR BATCH (this
    function runs inside the mapInPandas iterator):
    image -> PIL grayscale resized to ~sqrt(dim)^2 grid, pixels scaled to
    [-1, 1); audio -> soundfile mono samples, per-chunk RMS; video -> av
    first-frame grayscale grid. Raises NotImplementedError naming the
    missing library when the kind's decoder is absent -- the honest stub
    behavior, now scoped per kind instead of blanket."""
    import math

    if kind == "image":
        try:
            from PIL import Image
        except ImportError as ex:
            raise NotImplementedError(
                "real image decode requires pillow (PIL) -- not installed "
                "in this environment") from ex
        import io

        img = Image.open(io.BytesIO(payload)).convert("L")
        k = max(1, math.isqrt(dim - 1) + 1)
        img = img.resize((k, k))
        px = list(img.getdata())
        feats = [p / 255.0 * 2.0 - 1.0 for p in px]
        return (feats + [0.0] * dim)[:dim]
    if kind == "audio":
        try:
            import soundfile as sf
        except ImportError as ex:
            raise NotImplementedError(
                "real audio decode requires soundfile -- not installed "
                "in this environment") from ex
        import io

        data, _sr = sf.read(io.BytesIO(payload), always_2d=True)
        mono = data.mean(axis=1)
        n = len(mono)
        if n == 0:
            return [0.0] * dim
        feats = []
        for i in range(dim):
            lo, hi = (i * n) // dim, max(((i + 1) * n) // dim, (i * n) // dim + 1)
            chunk = mono[lo:min(hi, n)]
            feats.append(float((chunk ** 2).mean() ** 0.5) if len(chunk) else 0.0)
        return feats
    if kind == "video":
        try:
            import av
        except ImportError as ex:
            raise NotImplementedError(
                "real video decode requires av (PyAV) -- not installed "
                "in this environment") from ex
        import io

        with av.open(io.BytesIO(payload)) as container:
            for frame in container.decode(video=0):
                arr = frame.to_ndarray(format="gray")
                import math as _m

                k = max(1, _m.isqrt(dim - 1) + 1)
                sy, sx = max(arr.shape[0] // k, 1), max(arr.shape[1] // k, 1)
                cells = [float(arr[y * sy:(y + 1) * sy, x * sx:(x + 1) * sx]
                               .mean()) / 255.0 * 2.0 - 1.0
                         for y in range(k) for x in range(k)]
                return (cells + [0.0] * dim)[:dim]
        return [0.0] * dim
    raise ValueError(f"unknown media kind {kind!r}")


def extract_features(media: DataFrame, config: MediaFeatureConfig | None = None) -> DataFrame:
    """(media_id, kind, feature, n_bytes) via Arrow-batched mapInPandas.

    ``decode=real`` is feature-gated on probe_decoders(): when the
    relevant library (pillow / soundfile / av) is importable the payload
    is actually decoded inside the batch iterator; a kind whose decoder
    is missing raises NotImplementedError naming it. ``decode=fake``
    keeps the deterministic hash featurizer for plumbing tests."""
    cfg = config or MediaFeatureConfig()
    if cfg.decode not in ("fake", "real"):
        raise ValueError(f"decode must be 'fake' or 'real', got {cfg.decode!r}")
    dim = cfg.feature_dim
    real = cfg.decode == "real"
    if real:
        # fail fast on the driver when NO decoder exists at all -- the
        # per-batch errors below still guard mixed environments
        if not any(probe_decoders().values()):
            raise NotImplementedError(
                "real decode requires pillow (image) / soundfile (audio) "
                "/ av (video); none are installed in this environment -- "
                "the mapInPandas batch iterator in extract_features is "
                "the integration point")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real:
                feats = [
                    _real_decode_features(bytes(p), k, dim)
                    for p, k in zip(pdf["payload"], pdf["kind"])
                ]
            else:
                feats = [
                    _fake_decode_features(bytes(p), dim)
                    for p in pdf["payload"]
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
