"""Datetime function surface.

Reference (SURVEY.md §2.9 U3/U4/U6/U7): Scala/joda UDFs ``spklDateTme``
(ISO string -> epoch millis, functions/DateTimeFunctions.scala:32,41-44),
``spklFormatDate`` (:34-39), and the spark-datetime DSL date parts
(ETLExpressions.scala:92-108). All are built-in Column expressions in
modern Spark — zero UDFs, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def spkl_date_time(col: Column | str) -> Column:
    """ISO-8601 string (or timestamp) -> epoch milliseconds.

    Reference UDF spklDateTme (DateTimeFunctions.scala:32) as a native
    expression: ``unix_millis(to_timestamp(c))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(F.to_timestamp(c))


def spkl_format_date(col: Column | str) -> Column:
    """Format to 'yyyy-MM-dd' (reference DateTimeFunctions.scala:34-39)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.to_timestamp(c), "yyyy-MM-dd")


def date_parts(col: Column | str, prefix: str = "sd_") -> dict[str, Column]:
    """The reference's named date-part projections sd_year/sd_month/
    sd_day/sd_day_name/sd_hour_of_day (ETLExpressions.scala:104-108),
    used both as slice-dice dims and partition columns.
    """
    t = F.to_timestamp(F.col(col) if isinstance(col, str) else col)
    return {
        f"{prefix}year": F.year(t),
        f"{prefix}month": F.month(t),
        f"{prefix}day": F.dayofmonth(t),
        f"{prefix}day_name": F.date_format(t, "EEEE"),
        f"{prefix}hour_of_day": F.hour(t),
        f"{prefix}day_of_year": F.dayofyear(t),
        f"{prefix}day_of_week": F.dayofweek(t),
    }
