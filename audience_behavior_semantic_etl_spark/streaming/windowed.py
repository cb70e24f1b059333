"""Structured Streaming windowed aggregation — the idiomatic modern
expression of the reference's "autonomous daily pipeline" (SURVEY.md
§1.1: its only incrementality is daily S3 folder appends).

Event-time tumbling windows + watermark give the same daily/hourly
cube semantics incrementally, in APPEND mode: a window is emitted
exactly once, when the watermark passes its end, and its state is then
EVICTED — so the operator runs unbounded streams in bounded memory
(state size ∝ open windows, never total history). Complete mode +
memory sink would be the anti-pattern at scale: the watermark never
evicts, state and sink grow with every (window, key) group forever.

At 100 TB the source is Kafka and the sink a table; here the
availableNow trigger drains a bounded directory so results are
deterministic and oracle-checkable (the finished result equals the
batch GROUP BY).

Bounded-drain flush: append mode only emits a window once a LATER
event pushes the watermark past its end. A drained directory has no
later event for its final windows, so the drain plants two sentinel
rows far past the real data (in separate, later-mtime files => later
micro-batches: the file source orders by mtime). Sentinel #1 advances
the watermark past every real window; the batch that reads sentinel #2
emits+evicts them all. The sentinels' own windows are never reached by
the watermark, so they never appear in the output (they are also
key-filtered, belt and braces). On a true unbounded stream no sentinel
is needed — arriving data advances the watermark continuously.
"""

from __future__ import annotations

import json
import os
import tempfile
from datetime import timedelta

from pyspark.sql import DataFrame, SparkSession, functions as F
from audience_behavior_semantic_etl_spark.scratch import scratch_dir
from audience_behavior_semantic_etl_spark.streaming.sentinels import write_sentinel


def tumbling_window_counts(
    spark: SparkSession,
    src_dir: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_len: str = "1 hour",
    watermark: str = "1 hour",
    progress: list | None = None,
) -> DataFrame:
    """Drain ``src_dir`` (parquet) as a stream, counting events per
    (tumbling event-time window, key): append mode, watermark-evicted
    state, file sink — no driver-side collect of results. Returns the
    finished result as a DataFrame over the sink (window start
    formatted as a string for stable comparison). ``progress``, if
    given, receives the query's progress dicts (state-store metrics)
    so tests can assert eviction actually happened.
    """
    static = spark.read.parquet(src_dir)
    max_ts = static.agg(F.max(F.col(ts_col).cast("timestamp"))).collect()[0][0]

    # stage the source: data file(s) first, then the two flush
    # sentinels with strictly later mtimes (the file source orders by
    # mtime, see module docstring)
    srcd = scratch_dir("stream-src-")
    data_files = (
        [os.path.abspath(src_dir)]
        if os.path.isfile(src_dir)
        else [
            os.path.join(os.path.abspath(src_dir), fn)
            for fn in sorted(os.listdir(src_dir))
            if fn.endswith(".parquet")
        ]
    )
    for i, f in enumerate(data_files):
        os.symlink(f, os.path.join(srcd, f"data-{i}.parquet"))
    base_mtime = max(os.path.getmtime(os.path.join(srcd, p)) for p in os.listdir(srcd))
    # sentinels written driver-side (streaming/sentinels.py) — the
    # former limit(1)+write Spark jobs were pure per-drain overhead
    for i, hours in enumerate((6, 7)):
        dst = os.path.join(srcd, f"zz-sentinel-{i}.parquet")
        write_sentinel(
            data_files,
            dst,
            {ts_col: max_ts + timedelta(hours=hours), key_col: "__flush__"},
        )
        t = base_mtime + 10 + i * 10
        os.utime(dst, (t, t))

    src = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", max(1, len(data_files)))
        .parquet(srcd)
    )
    # Watermarks need an instant; testdata timestamps are NTZ (session
    # TZ is UTC, so the cast is a pure reinterpretation).
    src = src.withColumn("__evt", F.col(ts_col).cast("timestamp"))
    agg = (
        src.withWatermark("__evt", watermark)
        .groupBy(F.window("__evt", window_len).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.col(key_col),
            F.col("n_events"),
        )
    )
    out_dir = scratch_dir("stream-sink-")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", scratch_dir("stream-ckpt-"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if progress is not None:
        progress.extend(json.loads(p.json) for p in q.recentProgress)
    return spark.read.schema(agg.schema).parquet(out_dir).filter(
        F.col(key_col) != "__flush__"
    )


def stream_static_enrich_counts(
    spark: SparkSession,
    src_dir: str,
    dim: DataFrame,
    key_col: str,
    dim_key_col: str,
    label_col: str,
    ts_col: str = "ts",
    window_len: str = "1 hour",
    watermark: str | None = None,
    progress: list | None = None,
) -> DataFrame:
    """STREAM-STATIC enrichment: the stream joins a small static
    dimension (read once, BROADCAST into every micro-batch — Structured
    Streaming's stream-static join, the streaming form of the
    reference's enrich-then-aggregate chain), then counts per (tumbling
    event-time window, dimension label) in append mode with
    watermark-evicted state and a file sink.

    The stream arrives over MULTIPLE micro-batches in arbitrary
    event-time order, so the default watermark covers the directory's
    full event-time span (no real row is ever late and the drained
    result equals the batch join+GROUP BY — production streams set the
    real disorder bound instead, shrinking state accordingly; same
    contract as streaming_sessionize). The join is LEFT OUTER with a
    final label-not-null filter (== inner-join semantics): an INNER
    join would let Catalyst push its join-key IS NOT NULL filter below
    the EventTimeWatermark node to the scan, killing the NULL-key flush
    sentinels BEFORE they can advance event time — the windows would
    then never close and the drain would emit nothing. With the outer
    join the sentinels survive to the watermark tracker (their label
    stays NULL and the final filter drops them from the output). The
    dim never enters the state store."""
    static = spark.read.parquet(src_dir)
    lo, hi = static.agg(
        F.min(F.col(ts_col).cast("timestamp")), F.max(F.col(ts_col).cast("timestamp"))
    ).collect()[0]
    max_ts = hi
    span_s = int((hi - lo).total_seconds()) + 1
    if watermark is None:
        watermark = f"{span_s} seconds"
    # sentinels must sit past watermark-delay + window_len so every
    # real window's end precedes the advanced watermark and flushes
    flush_hours = span_s // 3600 + 3

    srcd = scratch_dir("stream-enrich-src-")
    data_files = [
        os.path.join(os.path.abspath(src_dir), fn)
        for fn in sorted(os.listdir(src_dir))
        if fn.endswith(".parquet")
    ]
    for i, f in enumerate(data_files):
        os.symlink(f, os.path.join(srcd, f"data-{i}.parquet"))
    base_mtime = max(os.path.getmtime(os.path.join(srcd, p)) for p in os.listdir(srcd))
    # driver-side sentinels (streaming/sentinels.py): NULL join key —
    # survives to the watermark tracker, dropped by the label filter
    for i, hours in enumerate((flush_hours, flush_hours + 1)):
        dst = os.path.join(srcd, f"zz-sentinel-{i}.parquet")
        write_sentinel(
            data_files,
            dst,
            {ts_col: max_ts + timedelta(hours=int(hours)), key_col: None},
        )
        t = base_mtime + 10 + i * 10
        os.utime(dst, (t, t))

    src = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", max(1, len(data_files) // 2))
        .parquet(srcd)
        .withColumn("__evt", F.col(ts_col).cast("timestamp"))
        .withWatermark("__evt", watermark)
    )
    joined = src.join(
        F.broadcast(dim), src[key_col] == dim[dim_key_col], "left_outer"
    )
    agg = (
        joined.groupBy(F.window("__evt", window_len).alias("w"), F.col(label_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.col(label_col),
            F.col("n_events"),
        )
    )
    out_dir = scratch_dir("stream-enrich-sink-")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", scratch_dir("stream-enrich-ckpt-"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if progress is not None:
        progress.extend(json.loads(p.json) for p in q.recentProgress)
    # label NULL = sentinel rows (and any unmatched stream key) — the
    # filter restores inner-join semantics
    return (
        spark.read.schema(agg.schema).parquet(out_dir)
        .filter(F.col(label_col).isNotNull())
    )
