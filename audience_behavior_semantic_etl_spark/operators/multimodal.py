"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs
over ``mapInPandas``.

The actual media codecs (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decode kernels are STUBS — clearly marked, behind
import-tries — while everything Spark-side is real and tested: the
schema shape, the binary column transport through Arrow, the batch
iterator signature, and the partitioning story (media rows are large:
keep ``spark.sql.files.maxPartitionBytes`` small for these tables and
NEVER collect the binary column to the driver).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_image(content: bytes) -> "object":
    """STUB: real implementation uses PIL.Image.open(BytesIO(content)).
    The container has no imaging libs; tests use extract_features'
    deterministic fallback instead."""
    try:
        from PIL import Image  # type: ignore
        import io

        return Image.open(io.BytesIO(content))
    except ImportError as e:  # pragma: no cover - env without PIL
        raise NotImplementedError("image decode requires PIL (not in this env)") from e


def _fake_feature(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding model: bytes of
    sha256(content) scaled to [-1, 1]. Lets the full pipeline
    (schema, batching, downstream similarity joins) run without the
    real model."""
    h = hashlib.sha256(content).digest()
    return [(b - 128) / 128.0 for b in h[:dim]]


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary media rows. Real
    Arrow transport, stubbed kernel (sha-derived vector) — swap
    ``_fake_feature`` for a model call on a real cluster."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(len).astype("int64"),
                    "content_sha": content.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "feature": content.map(lambda b: _fake_feature(b, dim)),
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame timestamp
    (the decode itself is the stubbed kernel). Demonstrates the
    explode-based fan-out shape: a 2-hour video at 1 fps becomes 7200
    rows BEFORE the decode stage, so decode parallelizes across the
    cluster instead of per-file."""
    n_frames = (F.col("duration_ms") / F.lit(every_ms)).cast("int")
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_ts_ms", F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))))
        .withColumn("frame_ts_ms", F.col("frame_ts_ms") * every_ms)
        .select("media_id", "frame_ts_ms", "mime")
    )


def synth_media(spark, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a deterministic media table from a text table (bytes =
    utf-8 of text) — the test harness for the binary plumbing."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.col(id_col) % 10 * 1000).cast("long").alias("duration_ms"),
    )
