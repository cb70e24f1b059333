"""The reference's flagship product, re-composed: the five-cube daily
analytics pipeline of ``AcmeDailyETL``
(etl/src/main/scala/org/sparkline/customers/acme/AcmeDailyETL.scala:375-711)
— events → sessionized stream → session cube → user cube → conversion
cube → goal/impact attribution cube — chained through ``ETLProcess``
with persisted, PARTITIONED parquet cubes (no ``coalesce(1)``; SURVEY.md
§4.2) and temp-view registration, over this engine's operators.

Cube map (reference step name → here):
- ``sd_sessions_data``   (:443-520): sessionize + per-session metric
  columns on the event stream (one shuffle; operators.sessionize +
  operators.windows.session_metrics_columns).
- ``sd_session_metrics`` (:520-560): one row per session.
- ``sd_user_metrics``    (:560-590): per-user rollup.
- ``sd_conversion``      (AcmeETLTest.scala:726-735): cohort conversion
  two-level aggregate.
- ``sd_goal_events``     (:595-617): goal-typed events, deduped
  (ts, user), revenue aggregated, ``g_`` aliases.
- ``sd_impact_events``   (:630-665): impact events (exclusion-set
  filter), deduped, ``i_`` aliases.
- ``sd_goals``           (:667-711): impact×goal equi+time-theta join +
  the goal-metric window family (rank / sessions-to-goal /
  time-to-goal / multi-touch share — operators.windows.
  goal_metrics_columns).

Scale notes: every cube is a partitioned parquet append; the goal join
shuffles on user (both sides pre-projected); the metric window
partitions by goal event — its cardinality is goals × impacts-per-goal,
bounded per user, so no global or skewed partitioning appears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from audience_behavior_semantic_etl_spark.operators import (
    drop_duplicate_rows_ordered,
    filter_rows,
    perform_join_ex,
    sessionize,
)
from audience_behavior_semantic_etl_spark.operators.windows import (
    filter_session_rows,
    goal_metrics_columns,
    session_metrics_columns,
)
from audience_behavior_semantic_etl_spark.plans.etl_process import ETLProcess, ETLStep

GOAL_EVENT_TYPES = ("purchase",)
EXCLUDE_FROM_IMPACT = ("purchase", "error")  # excludeFromImpactEvents analog


def build_daily_cubes(
    spark: SparkSession,
    events: DataFrame,
    out_dir: str,
    gap_seconds: float = 1800.0,
) -> ETLProcess:
    """Assemble the five-cube ETLProcess over an ``events`` frame with
    (event_id, user_id, event_type, ts, value). Persisted cubes land
    under ``out_dir/<cube>`` partitioned by event month (the reference
    partitions its daily cubes by the day folder it ingests)."""

    def sessions_data(_: dict) -> DataFrame:
        s = sessionize(events, "user_id", "ts", gap_seconds=gap_seconds)
        m = session_metrics_columns(
            s, session_col="sd_session_id", ts_col="ts", key_col="user_id"
        )
        return m.withColumn("sd_month", F.date_format("ts", "yyyy-MM"))

    def session_metrics(inp: dict) -> DataFrame:
        return filter_session_rows(inp["sd_sessions_data"]).select(
            "user_id",
            "sd_session_id",
            "sd_month",
            "sd_session_start_time",
            "sd_session_event_count",
            "sd_session_duration",
            "sd_is_bounce_session",
        )

    def user_metrics(inp: dict) -> DataFrame:
        return inp["sd_session_metrics"].groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("sd_session_event_count").alias("n_events"),
            F.sum(F.col("sd_session_duration").cast("decimal(20,6)"))
            .cast("double")
            .alias("total_duration"),
            F.sum("sd_is_bounce_session").alias("n_bounces"),
        )

    def conversion(inp: dict) -> DataFrame:
        per_user = events.groupBy("user_id").agg(
            F.sum(
                F.when(F.col("event_type").isin(*GOAL_EVENT_TYPES), F.col("value"))
                .otherwise(0.0)
                .cast("decimal(20,6)")
            )
            .cast("double")
            .alias("rev")
        )
        return per_user.select(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.when(F.col("rev") > 0, 1).otherwise(0)).alias("n_converted"),
        )

    def goal_events(inp: dict) -> DataFrame:
        goals = filter_rows(
            inp["sd_sessions_data"], F.col("event_type").isin(*GOAL_EVENT_TYPES)
        )
        # DropDuplicateRows on (ts, user) — reference :603-609 — made
        # deterministic (max event_id wins)
        goals = drop_duplicate_rows_ordered(
            goals, ["user_id", "ts"], [F.col("event_id").desc()]
        )
        return goals.select(
            F.col("user_id").alias("g_user_id"),
            F.col("event_id").alias("g_event_id"),
            F.col("ts").alias("g_ts"),
            F.col("sd_session_id").alias("g_session_id"),
            F.col("value").alias("g_revenue"),
            "sd_month",
        )

    def impact_events(inp: dict) -> DataFrame:
        impacts = filter_rows(
            inp["sd_sessions_data"], ~F.col("event_type").isin(*EXCLUDE_FROM_IMPACT)
        )
        impacts = drop_duplicate_rows_ordered(
            impacts, ["user_id", "ts"], [F.col("event_id").desc()]
        )
        return impacts.select(
            F.col("user_id").alias("i_user_id"),
            F.col("event_id").alias("i_event_id"),
            F.col("ts").alias("i_ts"),
            F.col("sd_session_id").alias("i_session_id"),
            F.col("sd_session_duration").alias("i_session_duration"),
        )

    def goals(inp: dict) -> DataFrame:
        joined = perform_join_ex(
            inp["sd_impact_events"],
            inp["sd_goal_events"],
            (F.col("i1.i_user_id") == F.col("i2.g_user_id"))
            & (F.col("i1.i_ts") < F.col("i2.g_ts")),
            how="inner",
        )
        return goal_metrics_columns(
            joined,
            goal_group_col="g_event_id",
            impact_ts_col="i_ts",
            impact_id_col="i_event_id",
            revenue_col="g_revenue",
            impact_duration_col="i_session_duration",
        )

    p = out_dir.rstrip("/")
    return ETLProcess(
        [
            ETLStep("sd_sessions_data", "sessionized event stream", sessions_data),
            ETLStep(
                "sd_session_metrics",
                "one row per session",
                session_metrics,
                inputs=("sd_sessions_data",),
                persist_path=f"{p}/sd_session_metrics",
                partition_by=("sd_month",),
                register_as="sd_session_metrics",
            ),
            ETLStep(
                "sd_user_metrics",
                "per-user rollup",
                user_metrics,
                inputs=("sd_session_metrics",),
                persist_path=f"{p}/sd_user_metrics",
                register_as="sd_user_metrics",
            ),
            ETLStep(
                "sd_conversion",
                "cohort conversion cube",
                conversion,
                persist_path=f"{p}/sd_conversion",
            ),
            ETLStep(
                "sd_goal_events",
                "deduped goal events with revenue",
                goal_events,
                inputs=("sd_sessions_data",),
            ),
            ETLStep(
                "sd_impact_events",
                "deduped impact events",
                impact_events,
                inputs=("sd_sessions_data",),
            ),
            ETLStep(
                "sd_goals",
                "impact-to-goal attribution with goal metrics",
                goals,
                inputs=("sd_impact_events", "sd_goal_events"),
                persist_path=f"{p}/sd_goals",
                partition_by=("sd_month",),
                register_as="sd_goals",
            ),
        ]
    )
