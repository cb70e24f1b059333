"""Generators / flatten operators (SURVEY.md §2.8).

Reference:
- ``FlattenArrayField`` — explode array<struct> at a dotted path into
  prefixed top-level columns, outer (keep rows with empty arrays)
  (etl/src/main/scala/org/sparkline/etl/operators/FlattenArrayField.scala:33-63;
  config AcmeDailyETL.scala:54-55).
- Hive UDTF ``parse_url_tuple`` LATERAL VIEW — HOST/PATH/QUERY/QUERY:k
  extraction (AcmeDailyETL.scala:414-421). Spark's scalar ``parse_url``
  covers it with no UDTF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def flatten_array_field(
    df: DataFrame,
    array_path: str,
    prefix: str = "sd_",
    drop_source: bool = True,
) -> DataFrame:
    """Explode an ``array<struct>`` column (dotted path OK) into
    prefixed top-level columns; rows with null/empty arrays are kept with
    null fields (``explode_outer``), matching the reference's
    ``outer=true`` + null-element filter (FlattenArrayField.scala:47-58).
    """
    elem = "__flat_elem"
    out = df.select("*", F.explode_outer(F.col(array_path)).alias(elem))
    # Resolve the struct element fields from the schema.
    arr_type = out.schema[elem].dataType
    assert isinstance(arr_type, T.StructType), f"{array_path} must be array<struct>"
    field_cols = [F.col(f"{elem}.{f.name}").alias(f"{prefix}{f.name.lower()}") for f in arr_type.fields]
    keep = [c for c in df.columns]
    if drop_source and "." not in array_path:
        keep = [c for c in keep if c != array_path]
    return out.select(*keep, *field_cols)


def parse_url_columns(
    df: DataFrame,
    url_col: str,
    prefix: str = "sd_referrer_",
    query_keys: Sequence[str] = ("utm_source", "utm_medium", "utm_campaign", "utm_content", "utm_term"),
) -> DataFrame:
    """HOST / PATH / QUERY / QUERY:key extraction — the reference's one
    Hive-UDTF stage (parse_url_tuple LATERAL VIEW, AcmeDailyETL.scala:414-421)
    as scalar ``F.parse_url`` projections: no generator, no extra rows,
    whole-stage codegen'd.
    """
    u = F.col(url_col)
    cols = {
        f"{prefix}host": F.parse_url(u, F.lit("HOST")),
        f"{prefix}path": F.parse_url(u, F.lit("PATH")),
        f"{prefix}query": F.parse_url(u, F.lit("QUERY")),
    }
    for k in query_keys:
        cols[f"{prefix}{k}"] = F.parse_url(u, F.lit("QUERY"), F.lit(k))
    return df.withColumns(cols)
