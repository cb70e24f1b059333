"""Join operators.

Reference (SURVEY.md §2.4):
- ``PerformJoin.dataFrame`` — single column pair, operator param
  ``eq|lt|lte|gt|gte`` → equi or theta join, any join type
  (etl/src/main/scala/org/sparkline/etl/operators/PerformJoin.scala:32-58).
- ``PerformJoin.dataFrameEx`` — arbitrary join expression, used for the
  equi + time-theta attribution join (PerformJoin.scala:60-73; usage
  AcmeDailyETL.scala:667-683).

Scale notes (the part the reference never had to solve):
- A *pure* theta join (no equi component) physically becomes a
  broadcast-nested-loop — fine only when one side is tiny, so
  ``perform_join`` broadcasts the right side for the theta operators when
  asked. The attribution-style join keeps its equi keys in ``on`` so
  Spark still plans a hash/sort-merge join and evaluates the range
  residual post-match.
- ``broadcast=True`` wraps the right side in a broadcast hint for small
  dimensions; AQE may also convert at runtime.
"""

from __future__ import annotations

import operator as _op

from pyspark.sql import Column, DataFrame, functions as F

_OPS = {
    "eq": _op.eq,
    "lt": _op.lt,
    "lte": _op.le,
    "gt": _op.gt,
    "gte": _op.ge,
}


def perform_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    op: str = "eq",
    how: str = "inner",
    broadcast: bool = False,
) -> DataFrame:
    """Two-input join on one column pair with an ``eq|lt|lte|gt|gte``
    comparison — the reference's PerformJoin.dataFrame with aliases
    ``i1``/``i2`` (PerformJoin.scala:32-58).

    Columns of the result can be disambiguated as ``i1.col`` / ``i2.col``.
    """
    l = left.alias("i1")
    r = right.alias("i2")
    if broadcast:
        r = F.broadcast(r)
    cond = _OPS[op](F.col(f"i1.{left_col}"), F.col(f"i2.{right_col}"))
    return l.join(r, cond, how)


def perform_join_ex(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    how: str = "inner",
    broadcast: bool = False,
) -> DataFrame:
    """Arbitrary join expression (aliases ``i1``/``i2``) — the reference's
    PerformJoin.dataFrameEx (PerformJoin.scala:60-73).

    For equi + range conditions (`i1.user == i2.user AND i1.t < i2.t`)
    Catalyst extracts the equi keys for the shuffle and applies the range
    part as a post-join residual — the scalable shape for attribution
    joins (AcmeDailyETL.scala:667-683).
    """
    l = left.alias("i1")
    r = right.alias("i2")
    if broadcast:
        r = F.broadcast(r)
    return l.join(r, condition, how)


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """AS-OF join: for every left row, the right row with the largest
    ``right_ts <= left_ts`` for the same key (null if none). Spark has
    no native ASOF; the naive theta-join + window is O(matches). This
    is the scalable union+window form — ONE shuffle on the key, state
    carried by ``last(..., ignorenulls)`` over the merged timeline:

        union(tagged left, tagged right)
          -> window per key ordered by (ts, right-before-left)
          -> carry the latest right values forward
          -> keep left rows

    Right rows must be unique per (key, right_ts) for a deterministic
    result (pre-aggregate if not). DuckDB's native ASOF JOIN reproduces
    the semantics as the oracle.
    """
    from pyspark.sql import Window

    lcols = [c for c in left.columns]
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
    )
    u = l.unionByName(r)
    # right rows sort BEFORE left rows at equal ts => right_ts <= left_ts
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *lcols, *[F.col(f"__asof_{c}").alias(f"asof_{c}") for c in value_cols]
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval RANGE join: every (point, interval) pair with
    ``start <= ts < end`` — the other classic temporal join Spark lacks
    natively (the naive form is a pure theta join, planned as a
    broadcast-nested-loop / cartesian: O(|points| x |intervals|)).

    Scale shape (the standard bin-bucketing trick): timestamps bin at
    ``bin_seconds``; each interval explodes into the bins it covers,
    each point keeps its single bin, and the pair space collapses to an
    EQUI-join on the bin key with the exact containment predicate
    evaluated as a cheap post-match residual. One shuffle on uniform
    bin keys; cost is O(points + interval_bins + true_matches), never
    the cross product. A plan test pins the no-nested-loop shape.

    Pick ``bin_seconds`` near the median interval length: too small
    explodes long intervals into many bins; too large degrades bin
    selectivity (more residual filtering). Intervals spanning B bins
    appear B times pre-filter, but each (point, interval) pair meets in
    EXACTLY one bin (the point's), so no post-join dedup is needed.

    ``how='inner'`` returns matches; ``how='left'`` keeps unmatched
    points with null interval columns (matching DuckDB's LEFT JOIN
    oracle shape).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner|left, got {how!r}")
    pt = F.col("__pts").cast("long")
    p = points.withColumn("__pts", F.col(point_ts).cast("timestamp")).withColumn(
        "__bin", F.floor(pt / bin_seconds)
    )
    s = F.col(start_col).cast("timestamp").cast("long")
    e = F.col(end_col).cast("timestamp").cast("long")
    # empty/inverted intervals match nothing — and must not reach
    # F.sequence, whose auto-negative step would fabricate bins
    iv = intervals.filter(e > s).withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(s / bin_seconds),
                # end is EXCLUSIVE: an interval ending exactly on a bin
                # boundary does not cover that bin
                F.floor((e - 1) / bin_seconds),
            )
        ),
    )
    cond = (
        (p["__bin"] == iv["__bin"])
        & (F.col("__pts") >= F.col(start_col).cast("timestamp"))
        & (F.col("__pts") < F.col(end_col).cast("timestamp"))
    )
    joined = p.join(iv, cond, how)
    return joined.drop("__pts").drop(p["__bin"]).drop(iv["__bin"])
