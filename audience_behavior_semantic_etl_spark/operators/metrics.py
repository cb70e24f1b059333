"""Layered metric resolution — the MetricResolver / AnalysisLayer
analog (SURVEY.md §2.11 M5).

The reference resolves "semantic metrics" itself: a fixed-point loop
resolves each metric expression against input schema ++ already
resolved metrics, stratifying dependent metrics into layers and
raising MetricAnalysisException on failure
(MetricResolver.scala:32-62,182-211;
MetricAnalysisException.scala:25-42).

Spark-first, Catalyst already resolves chained column references — so
the operator is just ordered ``withColumn`` application. What we keep
from the reference is the USER contract: metrics are given as an
unordered name->SQL mapping that may reference other metrics; we
stratify them into layers by fixed point and fail with the offending
names if the set cannot be fully resolved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.utils import AnalysisException


class MetricAnalysisError(Exception):
    """Raised when metric expressions cannot be resolved against the
    input schema plus previously resolved metrics (reference:
    MetricAnalysisException)."""


def resolve_metric_layers(df: DataFrame, metrics: dict[str, str]) -> list[dict[str, str]]:
    """Stratify ``metrics`` (name -> SQL expression, unordered, may
    reference other metric names) into dependency layers.

    Ambiguity detection (reference: MetricResolver.scala:162-165 raises
    MetricAnalysisException on ambiguous references): a metric name
    that collides with an input column — or with another metric under
    Spark's case-insensitive resolution — would make every reference to
    that name ambiguous (withColumn would silently REPLACE the input
    column, changing the meaning of expressions that meant the
    original). Rejected up front with the offending names."""
    lower_seen: dict[str, str] = {}
    dupes: list[str] = []
    for name in metrics:
        low = name.lower()
        if low in lower_seen:
            dupes.append(f"{name!r} vs metric {lower_seen[low]!r}")
        lower_seen[low] = name
    input_lower = {c.lower(): c for c in df.columns}
    for name in metrics:
        if name.lower() in input_lower:
            dupes.append(f"{name!r} vs input column {input_lower[name.lower()]!r}")
    if dupes:
        raise MetricAnalysisError(f"ambiguous metric references: {sorted(dupes)}")
    remaining = dict(metrics)
    layers: list[dict[str, str]] = []
    cur = df
    while remaining:
        layer: dict[str, str] = {}
        for name, expr in list(remaining.items()):
            try:
                cur.select(F.expr(expr)).schema  # force analysis
            except AnalysisException:
                continue
            layer[name] = expr
        if not layer:
            raise MetricAnalysisError(
                f"unresolvable metric expressions: {sorted(remaining)}"
            )
        for name, expr in layer.items():
            cur = cur.withColumn(name, F.expr(expr))
            del remaining[name]
        layers.append(layer)
    return layers


def add_metric_layers(df: DataFrame, metrics: dict[str, str]) -> DataFrame:
    """Apply an unordered, inter-referencing metric set in resolved
    layer order (the AnalysisLayer execution)."""
    for layer in resolve_metric_layers(df, metrics):
        df = df.withColumns({n: F.expr(e) for n, e in layer.items()})
    return df
