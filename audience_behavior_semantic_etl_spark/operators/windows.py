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


def session_flag_columns(
    df: DataFrame,
    flags: Mapping[str, Column],
    session_col: str = "sd_session_id",
    ts_col: str = "ts",
    key_col: str | None = None,
) -> DataFrame:
    """W8: session-level boolean flags — ``max(predicate) OVER
    (session, full frame)`` (the reference's converted/has-goal session
    flags, ETLExpressions.scala window family). ``flags`` maps output
    name -> per-event predicate Column; every flag shares one window
    partitioning (and, with ``key_col``, the sessionize partitioning —
    no extra shuffle, see session_metrics_columns)."""
    parts = ([key_col] if key_col else []) + [session_col]
    wf = full_frame(Window.partitionBy(*parts).orderBy(ts_col))
    return df.withColumns(
        {name: F.max(pred.cast("int")).over(wf) for name, pred in flags.items()}
    )


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


def ranked_ntile_2pass(
    df: DataFrame,
    order_col: str,
    n: int,
    out_col: str,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Scalable global ntile — EXACT ``ntile(n)`` semantics with NO
    single-partition window anywhere in the plan.

    Pass 1: range-repartition on the order key (+ tiebreaks) and count
    rows per partition — one small job whose output is #partitions
    rows. Pass 2: broadcast the cumulative offsets; each partition
    assigns ``global_rank = offset + local_position`` and the ntile
    arithmetic (first ``total % n`` tiles carry the extra row, same as
    SQL NTILE) inside one ``mapInPandas`` — the zipWithIndex pattern,
    Arrow-batched.

    The input is persisted because range partitioning SAMPLES the child
    plan: without the pin, the counts job and the final job could see
    different partition boundaries (and the sampling pass would
    re-execute the child anyway). Ties beyond ``tiebreak_cols`` leave
    rank assignment nondeterministic, exactly like SQL NTILE.
    """
    import numpy as np
    from pyspark import TaskContext
    from pyspark.sql import types as T

    spark = df.sparkSession
    sort_cols = [order_col, *tiebreak_cols]
    parts = max(2, spark.sparkContext.defaultParallelism)
    ranged = (
        df.repartitionByRange(parts, *sort_cols).sortWithinPartitions(*sort_cols).persist()
    )
    counts = {
        r["p"]: r["c"]
        for r in ranged.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    total = sum(counts.values())
    offsets: dict[int, int] = {}
    acc = 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    boff = spark.sparkContext.broadcast(offsets)
    q, r = divmod(total, n) if total else (0, 0)
    out_schema = T.StructType(ranged.schema.fields + [T.StructField(out_col, T.IntegerType())])

    def add_tile(it):
        pid = TaskContext.get().partitionId()
        base = boff.value.get(pid, 0)
        seen = 0
        for pdf in it:
            rk = base + seen + np.arange(1, len(pdf) + 1, dtype=np.int64)
            seen += len(pdf)
            if q == 0:  # more tiles than rows: tile == rank (SQL NTILE)
                tile = rk
            else:
                cut = r * (q + 1)
                tile = np.where(
                    rk <= cut, (rk - 1) // (q + 1) + 1, r + (rk - cut - 1) // q + 1
                )
            pdf = pdf.copy()
            pdf[out_col] = tile.astype("int32")
            yield pdf

    return ranged.mapInPandas(add_tile, schema=out_schema)


def multi_touch_share(value_col: str, w: WindowSpec) -> Column:
    """``value / count(value) over full-frame`` — the reference's
    multi-touch revenue share (AcmeDailyETL.scala:350,358,367-368)."""
    return F.col(value_col) / F.count(F.col(value_col)).over(full_frame(w))


def goal_metrics_columns(
    df: DataFrame,
    goal_group_col: str,
    impact_ts_col: str,
    impact_id_col: str,
    revenue_col: str,
    impact_duration_col: str | None = None,
) -> DataFrame:
    """The reference's goal-attribution metric family
    (AcmeDailyETL.scala:341-370), one Window partitioning — applied to
    the impact×goal join output, one row per (goal, impact event):

    - ``sd_sessions_to_goal``: count over CURRENT ROW → UNBOUNDED
      FOLLOWING minus 1 (W6, ``:356-358``) — impacts still ahead of
      this one before the goal fires.
    - ``sd_time_to_goal``: sum of impact-session duration over the same
      remaining frame minus own duration (W7, ``:359-361``).
    - ``sd_multi_touch_attr_revenue``: revenue split equally across the
      goal's impact touches (W10, ``:367-368``).
    - ``impact_event_group_rank``: ``rank()`` over the group (W2,
      ``:350,369-370``) — last-touch attribution picks rank 1 /
      max-rank rows downstream.

    All four share one partitioning (the goal group) and ordering
    (impact time, id tiebreak for deterministic frames), so Spark plans
    a single Window operator — one shuffle."""
    w = Window.partitionBy(goal_group_col).orderBy(impact_ts_col, impact_id_col)
    remaining = current_to_end(w)
    out = df.withColumn(
        "sd_sessions_to_goal", F.count(F.lit(1)).over(remaining) - F.lit(1)
    )
    if impact_duration_col is not None:
        out = out.withColumn(
            "sd_time_to_goal",
            F.sum(impact_duration_col).over(remaining) - F.col(impact_duration_col),
        )
    return out.withColumn(
        "sd_multi_touch_attr_revenue", multi_touch_share(revenue_col, w)
    ).withColumn("impact_event_group_rank", F.rank().over(w))
