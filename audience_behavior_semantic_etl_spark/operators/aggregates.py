"""Aggregation operators.

Reference (SURVEY.md §2.5):
- ``AggregateColumns`` — groupBy + named agg exprs
  (etl/src/main/scala/org/sparkline/etl/operators/AggregateColumns.scala:31-43)
- agg vocabulary: Sum/CountDistinct/Average/Max/Min + SUM(CASE WHEN ...)
  (ETLExpressions.scala:248-273; AcmeETLTest.scala:731)
- ``DropDuplicateRows`` — dedup on a key subset; nondeterministic
  first-row-wins in the reference (DropDuplicateRows.scala:31-40)
- ``sum_maps`` Hive UDAF — merge map<k,int> summing per key
  (functions/CollectionFunctions.scala:33-39; HiveUdafTest.scala:61-62)

Scale notes: groupBy gets map-side partial aggregation from Spark
automatically; ``drop_duplicate_rows_ordered`` is the deterministic
last-writer-wins dedup that the CDC engine builds on — a single window
per key, which AQE can skew-split. ``sum_maps`` avoids a UDAF entirely:
explode + two-level groupBy keeps it whole-stage-codegen'd.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def aggregate_columns(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: Mapping[str, Column],
) -> DataFrame:
    """groupBy(group_cols).agg(alias -> expr).

    Reference: AggregateColumns.scala:31-43 — output is group cols ++
    named agg exprs, same here.
    """
    return df.groupBy(*group_cols).agg(*[c.alias(n) for n, c in aggs.items()])


def drop_duplicate_rows(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Dedup on a key subset, arbitrary survivor — the reference's
    DropDuplicateRows (DropDuplicateRows.scala:31-40). Kept for parity;
    prefer the deterministic variant below.
    """
    return df.dropDuplicates(list(key_cols))


def drop_duplicate_rows_ordered(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[Column],
) -> DataFrame:
    """Deterministic dedup: keep the first row per key under an explicit
    total order — ``row_number() over (partition by keys order by ...)``.

    This fixes the reference's nondeterminism (DropDuplicateRows.scala:31-40
    keeps whichever row arrives first) and is the CDC last-writer-wins
    primitive when ordered by ``(lsn desc, ts desc)`` (SURVEY.md §2.5 A3).
    Pass order columns that form a total order or ties stay arbitrary.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def sum_maps(
    df: DataFrame,
    group_cols: Sequence[str],
    map_col: str,
    out_col: str = "summed_map",
) -> DataFrame:
    """Merge ``map<k, numeric>`` per group by summing values per key —
    the reference's custom Hive UDAF ``sum_maps``
    (CollectionFunctions.scala:33-39, used as ``sum_maps(map(event,1))``
    in HiveUdafTest.scala:61-62).

    Spark-native: explode map entries -> two-level groupBy -> re-assemble
    with ``map_from_entries(collect_list(...))``. No UDAF, fully
    codegen'd, partial-aggregated map-side.
    """
    gc = list(group_cols)
    exploded = df.select(*gc, F.explode(F.col(map_col)).alias("__k", "__v"))
    per_key = exploded.groupBy(*gc, "__k").agg(F.sum("__v").alias("__s"))
    return per_key.groupBy(*gc).agg(
        F.map_from_entries(F.collect_list(F.struct("__k", "__s"))).alias(out_col)
    )


def conditional_count(cond: Column) -> Column:
    """``SUM(CASE WHEN cond THEN 1 ELSE 0 END)`` — reference
    AcmeETLTest.scala:731."""
    return F.sum(F.when(cond, 1).otherwise(0))
