"""Math function surface.

Reference (SURVEY.md §2.9 U5/U10/U11): guarded percent UDF
``sd_calcpercent`` (functions/MathFunctions.scala:32-39), round, and
plain arithmetic — all native expressions here.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def calc_percent(a: Column | str, b: Column | str) -> Column:
    """``100*a/b``, 0 if either operand is null or <= 0 — exact semantics
    of the reference UDF sd_calcpercent (MathFunctions.scala:32-39), as a
    codegen'd CASE expression instead of a UDF.
    """
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return (
        F.when(ca.isNull() | cb.isNull() | (ca <= 0) | (cb <= 0), F.lit(0).cast("long"))
        .otherwise((F.lit(100) * ca / cb).cast("long"))
    )


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Spherical distance (reference geoip/Point.scala:43-80, unused in
    its pipeline but part of the library surface) as native trig."""
    r = 6371.0
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2 * r) * F.asin(F.sqrt(a))
