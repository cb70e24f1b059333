"""Projection / column operators.

Covers the reference's (SURVEY.md §2.2):
- ``AddColumns``     (reference etl/src/main/scala/org/sparkline/etl/operators/AddColumns.scala:34-44)
- ``SelectColumns``  (SelectColumns.scala:38-48)
- ``DropColumns``    (DropColumns.scala:28-36)
- ``RenameColumns``  (RenameColumns.scala:34-71) — sources may be dotted
  nested paths, so it doubles as struct flattening
- ``CaseStatement`` builders (CaseStatement.scala:32-100)
- ``SQLAddColumns``  (SQLAddColumns.scala:30-39)

All pure DataFrame API: every operator returns a new lazy DataFrame;
Catalyst collapses adjacent Projects, so chaining these is free.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def add_columns(df: DataFrame, cols: Mapping[str, Column]) -> DataFrame:
    """Append computed columns (Project of existing ++ new).

    Reference: AddColumns.scala:34-44 builds Project(child.output ++ exprs).
    ``withColumns`` emits a single Project for the whole map.
    """
    return df.withColumns(dict(cols))


def select_columns(df: DataFrame, names: Sequence[str]) -> DataFrame:
    """Keep a named subset, in the given order.

    Reference: SelectColumns.scala:38-48 (order = schema order there; we
    honor caller order, which is strictly more expressive).
    """
    return df.select(*names)


def drop_columns(df: DataFrame, names: Sequence[str]) -> DataFrame:
    """Drop by name. Reference: DropColumns.scala:28-36."""
    return df.drop(*names)


def rename_columns(
    df: DataFrame,
    renames: Mapping[str, str],
    remove_old_cols: bool = False,
) -> DataFrame:
    """Bulk rename; keys may be dotted nested paths (``context.page.path``),
    which extracts + flattens the nested field under the new top-level name.

    Reference: RenameColumns.scala:34-71 resolves dotted paths into
    ExtractValue chains; ``removeOldCols`` adds a pruning Project dropping
    the source struct columns. Here: one ``select`` with aliases — Catalyst
    prunes unread struct fields down to the parquet reader (check
    ``ReadSchema`` in explain output).
    """
    if remove_old_cols:
        # Project only the renamed extractions plus untouched top-level cols.
        touched_roots = {src.split(".")[0] for src in renames}
        keep = [F.col(c) for c in df.columns if c not in touched_roots]
        new = [F.col(src).alias(dst) for src, dst in renames.items()]
        return df.select(*keep, *new)
    out = df
    exprs: dict[str, Column] = {}
    top_level = {src: dst for src, dst in renames.items() if "." not in src}
    nested = {src: dst for src, dst in renames.items() if "." in src}
    for src, dst in top_level.items():
        out = out.withColumnRenamed(src, dst)
    for src, dst in nested.items():
        exprs[dst] = F.col(src)
    return out.withColumns(exprs) if exprs else out


def case_using_like(
    source: Column | str,
    branches: Sequence[tuple[str, str | Column]],
    default: str | Column | None = None,
) -> Column:
    """CASE WHEN src LIKE pat THEN val ... ELSE default.

    Reference: CaseStatement.caseUsingLike (CaseStatement.scala:42-61);
    also the hardcoded campaign-attribution ladders (:102-224) which are
    just instances of this builder with an outer null-check.
    """
    src = F.col(source) if isinstance(source, str) else source
    expr: Column | None = None
    for pat, val in branches:
        cond = src.like(pat)
        v = F.lit(val) if isinstance(val, str) else val
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    assert expr is not None, "need at least one branch"
    if default is not None:
        expr = expr.otherwise(F.lit(default) if isinstance(default, str) else default)
    return expr


def case_using_equals(
    source: Column | str,
    branches: Sequence[tuple[object, str | Column]],
    default: str | Column | None = None,
) -> Column:
    """CASE WHEN src = v THEN val ... Reference: CaseStatement.scala:63-80."""
    src = F.col(source) if isinstance(source, str) else source
    expr: Column | None = None
    for match, val in branches:
        v = F.lit(val) if isinstance(val, str) else val
        expr = F.when(src == F.lit(match), v) if expr is None else expr.when(src == F.lit(match), v)
    assert expr is not None, "need at least one branch"
    if default is not None:
        expr = expr.otherwise(F.lit(default) if isinstance(default, str) else default)
    return expr


def case_nested(
    source: Column | str,
    branches: Sequence[tuple[object, str | Column]],
    else_column: Column | str,
) -> Column:
    """CASE ... ELSE <other column> — the reference's ``caseNested``
    (CaseStatement.scala:82-100) where the default is another column.
    """
    els = F.col(else_column) if isinstance(else_column, str) else else_column
    return case_using_equals(source, branches, default=els)


def sql_add_columns(df: DataFrame, sql: str, temp_name: str) -> DataFrame:
    """Escape hatch: register temp view, run arbitrary SQL over it.

    Reference: SQLAddColumns.scala:30-39 (registerTempTable + hive sql).
    """
    df.createOrReplaceTempView(temp_name)
    return df.sparkSession.sql(sql)
