"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (codec libraries are not available in this
environment) behind `decode_stub` — a deterministic fake that preserves
the real Spark-side contract: schemas, Arrow batch shapes, mapInPandas
signatures, and partition sizing are exactly what a real decoder would
use; swap `_fake_decode` for PIL/ffmpeg calls to go live.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal schema: one row per asset.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),  # opaque encoded bytes
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_DIM = 16

_FEATURES_FIELD = StructField("features", ArrayType(FloatType()), True)


def real_decode(content: bytes, mime: str) -> np.ndarray:
    """Real decoder hook — requires PIL / torchaudio / ffmpeg, which are
    not available in this environment."""
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this "
        "container; use decode_stub(...) which exercises the identical "
        "Spark plumbing with a deterministic fake"
    )


def _fake_decode(content: bytes | None, media_id: int) -> np.ndarray:
    """Deterministic fake: features derived from content bytes (or id),
    so tests are stable and the Arrow path is exercised end-to-end."""
    seed = (len(content) if content is not None else 0) * 1_000_003 + media_id
    rng = np.random.RandomState(seed % (2**31 - 1))
    return rng.rand(FEATURE_DIM).astype("float32")


def extract_features(
    df: DataFrame,
    batch_size: int = 256,
    use_real_decoder: bool = False,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas: streams Arrow batches
    through Python once, never materializes a partition in memory.
    Output adds `features: array<float>`. Partitioning guidance: media
    rows are large — size partitions by bytes (maxPartitionBytes), not
    row count, before calling this."""
    out_schema = StructType(df.schema.fields + [_FEATURES_FIELD])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content, mid in zip(pdf["content"], pdf["media_id"]):
                if use_real_decoder:
                    arr = real_decode(content, "")
                else:
                    arr = _fake_decode(content, int(mid))
                feats.append(arr.tolist())
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize contract: metadata transform is real; pixel work is
    in the (stubbed) decode path. Keeps schema stable for pipelines."""
    return df.withColumn("width", F.lit(width)).withColumn("height", F.lit(height))


def sample_frames(
    df: DataFrame, every_ms: int = 1000, id_col: str = "media_id"
) -> DataFrame:
    """Video frame-sampling plumbing: explodes one row per sampled
    timestamp from duration metadata (decode of the actual frame is the
    stubbed step). Narrow transform — no shuffle."""
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a media table from the documents corpus: the UTF-8 text
    bytes stand in for opaque encoded content (the container has no
    codecs), every metadata field is a deterministic function of
    (doc_id, content) — so the full decode/extract/frame-sample
    pipeline is reproducible in ANSI SQL for oracle checking."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3).cast("int") + 1,
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").cast("binary").alias("content"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col("doc_id") % 3).cast("int") + 1,
        ).alias("mime"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(64)).cast("int").alias("width"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(48)).cast("int").alias("height"),
        F.when(
            F.col("doc_id") % 3 != 0, ((F.col("doc_id") % 5) + 1) * 1000
        ).cast("long").alias("duration_ms"),
    )


def fake_media_table(spark, n: int = 100) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        content = bytes([(i * 7 + j) % 256 for j in range(32 + (i % 5) * 16)])
        rows.append(
            (
                i,
                kind,
                content,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                3000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
