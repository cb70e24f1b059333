"""Filter operators.

Reference (SURVEY.md §2.3): ``FilterRows`` wraps any Catalyst predicate
(etl/src/main/scala/org/sparkline/etl/operators/FilterRows.scala:30-38);
the predicate vocabulary used across the pipeline is EqualTo / LessThan /
GreaterThan (+OrEq), And/Or/Not/IsNull, LIKE, Not(InSet), time-interval
containment, and window-rank filters. All of that is plain Column algebra
here — expressed declaratively so Catalyst pushes it into the parquet
scan (verify via ``PushedFilters`` in ``df.explain("formatted")``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def filter_rows(df: DataFrame, predicate: Column | str) -> DataFrame:
    """Filter(child, predicate). Reference: FilterRows.scala:30-38."""
    return df.filter(predicate)


def not_in_set(col: Column | str, values: Sequence[object]) -> Column:
    """``Not(InSet(attr, set))`` exclusion-list predicate.

    Reference usage: AcmeDailyETL.scala:631-636 (excluded event names).
    """
    c = F.col(col) if isinstance(col, str) else col
    return ~c.isin(list(values))


def interval_contains(col: Column | str, start, end) -> Column:
    """Half-open time-interval containment ``start <= t < end`` — the
    reference's nscala ``Interval containsE expr`` lookback filter
    (AcmeDailyETL.scala:576-583).
    """
    c = F.col(col) if isinstance(col, str) else col
    return (c >= F.lit(start)) & (c < F.lit(end))
