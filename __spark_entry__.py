"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship sessionize+metrics pipeline on
sf0.001. ``queries()`` maps operator names (SURVEY.md §2) to callables
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` provides DuckDB
equivalents over the same parquet views.

Conventions to keep the driver's value-hash comparison stable:
- every computed column is aliased identically in Spark and SQL;
- double aggregates are ``round(x, 2)`` on both sides;
- timestamps are emitted as strings (``yyyy-MM-dd HH:mm:ss[.SSSSSS]``)
  or epoch seconds, never raw timestamp columns;
- ties in window orderings are broken by a unique column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from audience_behavior_semantic_etl_spark.operators import (
    aggregate_columns,
    case_using_like,
    drop_duplicate_rows_ordered,
    filter_rows,
    parse_url_columns,
    perform_join_ex,
    select_columns,
    sessionize,
    sum_maps,
)
from audience_behavior_semantic_etl_spark.operators.windows import (
    filter_session_rows,
    session_metrics_columns,
)
from audience_behavior_semantic_etl_spark.functions.datetime_fns import date_parts
from audience_behavior_semantic_etl_spark.functions.math_fns import calc_percent

SF0001 = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sessionize the event stream per user (30-min gap),
    compute the reference's session-metric family, one row per session.

    Covers SURVEY.md §2.7 (sessionize) + §2.6 W1/W5/W6 + derived
    duration/bounce metrics (ETLExpressions.scala:130-209).
    """
    events = _t(spark, SF0001, "events")
    s = sessionize(events, "user_id", "ts", gap_seconds=1800.0)
    m = session_metrics_columns(s, session_col="sd_session_id", ts_col="ts")
    one = filter_session_rows(m)
    return one.select(
        "user_id",
        "sd_session_id",
        F.col("sd_session_event_count").alias("n_events"),
        F.col("sd_session_duration").alias("duration_sec"),
        F.col("sd_is_bounce_session").alias("is_bounce"),
    )


# ---------------------------------------------------------------- queries


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 aggregate vocabulary (TPC-H Q1 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    filtered = filter_rows(li, F.col("l_shipdate") <= F.lit("1998-09-02"))
    return aggregate_columns(
        filtered,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": F.round(F.sum("l_quantity"), 2),
            "sum_base_price": F.round(F.sum("l_extendedprice"), 2),
            "sum_disc_price": F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ),
            "avg_qty": F.round(F.avg("l_quantity"), 2),
            "avg_price": F.round(F.avg("l_extendedprice"), 2),
            "count_order": F.count(F.lit(1)),
            "n_parts": F.count_distinct(F.col("l_partkey")),
        },
    ).orderBy("l_returnflag", "l_linestatus")


def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/F1: projection + pushed-down filter."""
    orders = _t(spark, sf_dir, "orders")
    return select_columns(
        filter_rows(orders, (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000.0)),
        ["o_orderkey", "o_custkey", "o_totalprice"],
    )


def q_case_like_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 CASE WHEN ... LIKE ladder (CaseStatement.scala:42-61 analog)."""
    part = _t(spark, sf_dir, "part")
    tier = case_using_like(
        "p_type",
        [("%BRASS%", "brass"), ("%COPPER%", "copper"), ("%STEEL%", "steel")],
        default="other",
    )
    return (
        part.withColumn("type_tier", tier)
        .groupBy("type_tier")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("p_retailprice"), 2).alias("avg_price"))
        .orderBy("type_tier")
    )


def q_join_equi_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J3 equi join with broadcast dim (PerformJoin eq path)."""
    orders = _t(spark, sf_dir, "orders").alias("i1")
    cust = _t(spark, sf_dir, "customer").alias("i2")
    joined = orders.join(F.broadcast(cust), F.col("i1.o_custkey") == F.col("i2.c_custkey"), "inner")
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


def q_join_theta_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 equi + time-theta join — the reference's goal/impact
    attribution join (PerformJoin.dataFrameEx, AcmeDailyETL.scala:667-683):
    signup events joined to later purchase events of the same user.
    """
    ev = _t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("su_user"), F.col("ts").alias("su_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
    )
    joined = perform_join_ex(
        signups,
        purchases,
        (F.col("i1.su_user") == F.col("i2.p_user")) & (F.col("i1.su_ts") < F.col("i2.p_ts")),
        how="inner",
    )
    return (
        joined.groupBy(F.col("su_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum("p_value"), 2).alias("attributed_value"),
        )
        .orderBy("user_id")
    )


def q_dedup_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+W1: deterministic last-writer-wins dedup — the CDC primitive
    (DropDuplicateRows made deterministic per SURVEY.md §2.5)."""
    ev = _t(spark, sf_dir, "events")
    latest = drop_duplicate_rows_ordered(
        ev,
        ["user_id", "event_type"],
        [F.col("ts").desc(), F.col("event_id").desc()],
    )
    return latest.select("user_id", "event_type", "event_id", F.col("value").alias("last_value"))


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 sessionize + §2.6 session metrics, one row per session."""
    events = _t(spark, sf_dir, "events")
    s = sessionize(events, "user_id", "ts", gap_seconds=1800.0)
    m = session_metrics_columns(s, session_col="sd_session_id", ts_col="ts")
    one = filter_session_rows(m)
    return one.select(
        "user_id",
        F.col("sd_session_start_time").cast("string").alias("session_start"),
        F.col("sd_session_event_count").alias("n_events"),
        F.col("sd_session_duration").alias("duration_sec"),
        F.col("sd_is_bounce_session").alias("is_bounce"),
    )


def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6/U7 date-part projections as slice-dice dims."""
    orders = _t(spark, sf_dir, "orders")
    parts = date_parts("o_orderdate")
    return (
        orders.withColumns(parts)
        .groupBy("sd_year", "sd_month")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy("sd_year", "sd_month")
    )


def q_sum_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/U8 sum_maps UDAF analog: per-user action-profile map, exploded
    back to sorted rows for a stable comparison."""
    ev = _t(spark, sf_dir, "events")
    with_map = ev.select("user_id", F.create_map(F.col("event_type"), F.lit(1)).alias("m"))
    summed = sum_maps(with_map, ["user_id"], "m", out_col="profile")
    return (
        summed.select("user_id", F.explode(F.col("profile")).alias("event_type", "n_events"))
        .orderBy("user_id", "event_type")
    )


def q_parse_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 parse_url_tuple analog (scalar parse_url projections)."""
    docs = _t(spark, sf_dir, "documents")
    with_url = docs.withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"),
            F.lit("?utm_source="),
            F.col("lang"),
        ),
    )
    parsed = parse_url_columns(with_url, "url", prefix="u_", query_keys=("utm_source",))
    return parsed.select(
        "doc_id",
        F.col("u_host").alias("host"),
        F.col("u_path").alias("path"),
        F.col("u_utm_source").alias("utm_source"),
    )


def q_calc_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5 guarded percent (MathFunctions.scala:32-39 semantics)."""
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        calc_percent(F.col("c_acctbal"), F.lit(10000.0)).alias("bal_pct"),
    )


def q_conversion_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 two-level aggregate (users -> cohort conversion cube,
    AcmeETLTest.scala:726-735): per-user purchase revenue, then cohort
    rollup with a conditional distinct-user count."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)).alias(
            "rev"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )
    return per_user.select(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("rev") > 0, 1).otherwise(0)).alias("n_converted"),
        F.round(F.sum("rev"), 2).alias("total_rev"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_pricing_summary": q_pricing_summary,
        "q_filter_project": q_filter_project,
        "q_case_like_enrich": q_case_like_enrich,
        "q_join_equi_broadcast": q_join_equi_broadcast,
        "q_join_theta_attribution": q_join_theta_attribution,
        "q_dedup_lww": q_dedup_lww,
        "q_sessionize": q_sessionize,
        "q_date_parts": q_date_parts,
        "q_sum_maps": q_sum_maps,
        "q_parse_url": q_parse_url,
        "q_calc_percent": q_calc_percent,
        "q_conversion_two_level": q_conversion_two_level,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2)      AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 2)      AS avg_qty,
                   round(avg(l_extendedprice), 2) AS avg_price,
                   count(*)                       AS count_order,
                   count(DISTINCT l_partkey)      AS n_parts
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q_filter_project": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders
            WHERE o_orderstatus = 'O' AND o_totalprice > 100000.0
        """,
        "q_case_like_enrich": """
            SELECT CASE WHEN p_type LIKE '%BRASS%' THEN 'brass'
                        WHEN p_type LIKE '%COPPER%' THEN 'copper'
                        WHEN p_type LIKE '%STEEL%' THEN 'steel'
                        ELSE 'other' END AS type_tier,
                   count(*) AS n,
                   round(avg(p_retailprice), 2) AS avg_price
            FROM part GROUP BY 1 ORDER BY 1
        """,
        "q_join_equi_broadcast": """
            SELECT c_mktsegment, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "q_join_theta_attribution": """
            SELECT s.user_id AS user_id, count(*) AS n_pairs,
                   round(sum(p.value), 2) AS attributed_value
            FROM (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
            JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
              ON s.user_id = p.user_id AND s.ts < p.ts
            GROUP BY s.user_id ORDER BY s.user_id
        """,
        "q_dedup_lww": """
            SELECT user_id, event_type, event_id, value AS last_value
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY user_id, event_type
                      ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1
        """,
        "q_sessionize": """
            WITH g AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
                          THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT user_id, ts,
                     sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sn
              FROM g
            )
            SELECT user_id,
                   CAST(min(ts) AS VARCHAR) AS session_start,
                   count(*) AS n_events,
                   round(epoch(max(ts)) - epoch(min(ts)), 2) AS duration_sec,
                   CASE WHEN round(epoch(max(ts)) - epoch(min(ts)), 2) < 3.0
                        THEN 1 ELSE 0 END AS is_bounce
            FROM s GROUP BY user_id, sn
        """,
        "q_date_parts": """
            SELECT EXTRACT(year FROM o_orderdate) AS sd_year,
                   EXTRACT(month FROM o_orderdate) AS sd_month,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q_sum_maps": """
            SELECT user_id, event_type, count(*) AS n_events
            FROM events GROUP BY user_id, event_type
            ORDER BY user_id, event_type
        """,
        "q_parse_url": """
            SELECT doc_id,
                   source || '.example.com' AS host,
                   '/docs/' || CAST(doc_id AS VARCHAR) AS path,
                   lang AS utm_source
            FROM documents
        """,
        "q_calc_percent": """
            SELECT c_custkey,
                   CASE WHEN c_acctbal IS NULL OR c_acctbal <= 0 THEN 0
                        ELSE CAST(trunc(100 * c_acctbal / 10000.0) AS BIGINT) END AS bal_pct
            FROM customer
        """,
        "q_conversion_two_level": """
            SELECT count(*) AS n_users,
                   CAST(sum(CASE WHEN rev > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
                   round(sum(rev), 2) AS total_rev
            FROM (SELECT user_id,
                         sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS rev,
                         count(*) AS n_events
                  FROM events GROUP BY user_id)
        """,
    }
