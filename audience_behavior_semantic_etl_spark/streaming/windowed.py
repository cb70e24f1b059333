"""Structured Streaming windowed aggregation — the idiomatic modern
expression of the reference's "autonomous daily pipeline" (SURVEY.md
§1.1: its only incrementality is daily S3 folder appends).

Event-time tumbling windows + watermark give the same daily/hourly
cube semantics incrementally: late events within the watermark still
land in their window; state for closed windows is dropped, so the
operator runs unbounded streams in bounded memory. At 100 TB the
source is Kafka and the sink a table; here the availableNow trigger
drains a bounded directory so results are deterministic and
oracle-checkable (the finished result equals the batch GROUP BY).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def tumbling_window_counts(
    spark: SparkSession,
    src_dir: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_len: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drain ``src_dir`` (parquet) as a stream, counting events per
    (tumbling event-time window, key). Returns the finished result as a
    static DataFrame (window start formatted as a string for stable
    comparison)."""
    import os
    import tempfile

    static = spark.read.parquet(src_dir)
    if os.path.isfile(src_dir):
        # the file stream source only accepts directories
        d = tempfile.mkdtemp(prefix="stream-src-")
        os.symlink(os.path.abspath(src_dir), os.path.join(d, os.path.basename(src_dir)))
        src_dir = d
    src = spark.readStream.schema(static.schema).parquet(src_dir)
    # Watermarks need an instant; testdata timestamps are NTZ (session
    # TZ is UTC, so the cast is a pure reinterpretation).
    src = src.withColumn("__evt", F.col(ts_col).cast("timestamp"))
    agg = (
        src.withWatermark("__evt", watermark)
        .groupBy(F.window("__evt", window_len).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    name = f"tumbling_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.col(key_col),
        F.col("n_events"),
    )
    # materialize before the memory sink table goes away with the query
    rows = out.collect()
    return spark.createDataFrame(rows, out.schema)
