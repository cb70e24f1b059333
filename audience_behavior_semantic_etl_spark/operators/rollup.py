"""Hypertable-style continuous-aggregate rollup: the SAME fact stream
aggregated at several time granularities (hour/day/...) in ONE pass —
the batch analog of a time-series database's multi-resolution
continuous aggregates, and the multi-granularity generalization of the
reference's daily cube chain (SURVEY.md §1.1 computes each cube with
its own scan+shuffle).

Scale shape: all granularities share one scan and one shuffle via
GROUPING SETS — Spark's Expand emits one row per (input row,
granularity), partial aggregation combines map-side per set, and the
single exchange carries every granularity's partials together. For G
granularities that replaces G full scans with a G-way row expansion of
ONE scan — the right trade whenever the input is scan-dominated (it is
at 100 TB: the fact table dwarfs every aggregate).

Incremental maintenance of these rollups off a change stream is the
separate concern handled by cdc/incremental.py (O(changed buckets)
refresh); this operator is the batch/backfill path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

GRANULARITIES = {"hour": 3600, "day": 86400, "week": 7 * 86400}


def time_bucket(ts: Column, width_seconds: int) -> Column:
    """Timestamp floored to a ``width_seconds`` bucket (epoch-aligned,
    matching DuckDB's to_timestamp(epoch - epoch % width) oracle form)."""
    sec = ts.cast("timestamp").cast("long")
    return F.timestamp_seconds(sec - F.pmod(sec, F.lit(width_seconds)))


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    aggs: dict[str, Column],
    granularities: list[str] | None = None,
    keys: list[str] | None = None,
) -> DataFrame:
    """One-pass multi-granularity rollup via GROUPING SETS.

    Output: (granularity, bucket_ts, *keys, *<aggs keys>) — one row
    group per granularity per bucket (per key combination). ``aggs``
    maps output column name -> aggregate Column; ``keys`` are extra
    dimension columns present at EVERY granularity (the grouping sets
    differ only in the time column — the hypertable shape, not a full
    cube).
    """
    grans = granularities or ["hour", "day"]
    unknown = [g for g in grans if g not in GRANULARITIES]
    if unknown:
        raise ValueError(f"unknown granularities {unknown}; known: {sorted(GRANULARITIES)}")
    ks = keys or []
    staged = df
    bucket_cols = []
    for g in grans:
        c = f"__b_{g}"
        staged = staged.withColumn(c, time_bucket(F.col(ts_col), GRANULARITIES[g]))
        bucket_cols.append(c)
    sets = [[c, *ks] for c in bucket_cols]
    # grouping() is only legal inside the aggregate list, so the
    # set-membership flags ride along as extra agg columns
    out = staged.groupingSets(sets, *bucket_cols, *ks).agg(
        *[c.alias(n) for n, c in aggs.items()],
        *[F.grouping(c).alias(f"__g_{g}") for g, c in zip(grans, bucket_cols)],
    )
    # one grouping set per granularity: the active set is the one whose
    # bucket column is NOT the grouping-sets null
    gran = F.lit(None).cast("string")
    bucket = F.lit(None).cast("timestamp")
    for g, c in zip(grans, bucket_cols):
        active = F.col(f"__g_{g}") == 0
        gran = F.when(active, F.lit(g)).otherwise(gran)
        bucket = F.when(active, F.col(c)).otherwise(bucket)
    return out.select(
        gran.alias("granularity"),
        bucket.alias("bucket_ts"),
        *ks,
        *[F.col(n) for n in aggs],
    )
