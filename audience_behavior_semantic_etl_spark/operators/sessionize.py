"""Sessionization — the reference's one custom stateful operator,
re-expressed as pure window algebra (no per-row Python, no custom
generator).

Reference (SURVEY.md §2.7): ``Sessionize`` builds
RepartitionByExpression(user) -> SortPartitions(ts) -> Generate(stateful
row iterator) that threads ``currSessionId`` across rows
(etl/src/main/scala/org/sparkline/etl/operators/Sessionize.scala:45-115),
with the gap predicate over a ``lag`` column (operators/Lag.scala:31-70;
config AcmeDailyETL.scala:142-145).

We implement the *conventional* semantics (the reference's generator
inverts its predicate and compares milliseconds against a "30" intended
as a minutes threshold — see SURVEY.md §2.7 note 1; we deliberately do
NOT reproduce that bug): a new session starts when the gap since the
previous event of the same key exceeds ``gap`` OR there is no previous
event. The window algebra —

    is_new     = lag(ts) is null OR ts - lag(ts) > gap
    session_n  = sum(is_new) over (partition key order ts rows unbounded preceding..current)
    session_id = concat(key, ':', first ts of the session)

— needs exactly ONE shuffle (hash by key), the same physical shape as
the reference's explicit repartition+sort, but executed entirely inside
whole-stage codegen. At 100 TB the only concern is per-key ordering
skew; a single conversation/user fits one task trivially, and AQE
skew-split handles pathological keys because sum/lag windows only need
key-local order, not global.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def to_epoch_seconds(ts: Column, type_name: str) -> Column:
    """Epoch seconds (with fractional micros) for timestamp /
    timestamp_ntz / numeric columns. TIMESTAMP_NTZ has no direct double
    cast in Spark 4; route via TIMESTAMP (session TZ pinned to UTC, so
    the epoch matches a naive-UTC oracle)."""
    if type_name in ("timestamp", "timestamp_ntz"):
        return ts.cast("timestamp").cast("double")
    return ts.cast("double")


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    session_id_col: str = "sd_session_id",
    session_idx_col: str | None = None,
) -> DataFrame:
    """Append a session id per ``key_col`` using a ``gap_seconds``
    inactivity threshold over ``ts_col`` (timestamp or numeric seconds).

    Session id value mirrors the reference's ``concat(user_id, ':',
    utc_time-of-session-start)`` (AcmeDailyETL.scala:145) so ids are
    stable, meaningful, and reproducible.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    ts = F.col(ts_col)
    ts_sec = to_epoch_seconds(ts, df.schema[ts_col].dataType.typeName())
    prev = F.lag(ts_sec).over(w)
    is_new = F.when(prev.isNull() | ((ts_sec - prev) > F.lit(float(gap_seconds))), 1).otherwise(0)
    run = Window.partitionBy(key_col).orderBy(ts_col).rowsBetween(Window.unboundedPreceding, 0)
    out = df.withColumn("__session_n", F.sum(is_new).over(run))
    sess_w = Window.partitionBy(key_col, "__session_n").orderBy(ts_col)
    start_ts = F.first(ts).over(
        sess_w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    out = out.withColumn(
        session_id_col,
        F.concat_ws(":", F.col(key_col).cast("string"), start_ts.cast("string")),
    )
    if session_idx_col:
        out = out.withColumn(session_idx_col, F.col("__session_n"))
    return out.drop("__session_n")
