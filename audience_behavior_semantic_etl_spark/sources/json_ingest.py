"""Raw JSON ingestion — the reference's actual entry point (S1,
SURVEY.md §2.1): it points ``read.json`` at daily folders of gzip JSON
logs with full schema inference (AcmeDailyETL.scala:382-383).

This engine's position, made explicit here instead of leaving raw-JSON
users without an entry point:

- ``read_json_events(..., schema=...)`` is the production path. At
  100 TB, inference means an extra full pass over the data before the
  real one AND a schema that silently drifts with whatever the worst
  log line contained — explicit schemas are the contract. Gzip JSON is
  handled natively by the Spark JSON source (codec by extension), but
  note .gz is NOT splittable: one file = one task, so ingest
  parallelism equals file count — keep raw folders chunked (the
  reference's hourly folders do this by accident).
- ``infer_json_schema`` samples a BOUNDED slice to propose a schema for
  a human to pin down — inference as a dev-time tool, never a
  per-run step.
- Malformed lines follow the same poison-message policy as the CDC
  normalizer: FAILFAST by default, or PERMISSIVE with a corrupt-record
  column the caller can count and quarantine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_json_events(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    on_malformed: str = "fail",
    timestamp_ntz: bool = True,
) -> DataFrame:
    """Batch-read a folder of (optionally gzip) JSON-lines event logs.

    With ``schema`` (the production path) the scan is single-pass and
    the output shape is pinned. Without it, Spark infers — accepted
    only for small/dev inputs (a WARN-worthy extra pass at scale).
    ``on_malformed='quarantine'`` keeps bad lines in ``CORRUPT_COL``
    (use ``split_corrupt`` to separate them); 'fail' aborts the job on
    the first bad line.
    """
    reader = spark.read
    if timestamp_ntz:
        # the transcripts data model is wall-clock (input_hint: naive
        # timestamps); inference maps timestamp-looking strings to NTZ
        reader = reader.option("preferTimestampNtz", "true")
    if on_malformed == "fail":
        reader = reader.option("mode", "FAILFAST")
    else:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", CORRUPT_COL
        )
        if schema is not None and CORRUPT_COL not in schema.fieldNames():
            schema = T.StructType(
                schema.fields + [T.StructField(CORRUPT_COL, T.StringType())]
            )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, corrupt_rows) for a PERMISSIVE
    read — the quarantine counterpart of the CDC apply policy.

    The frame is cached first: Spark refuses queries that reference
    ONLY the internal corrupt-record column of a JSON scan (SPARK-21610
    guard), and the cache barrier is the documented workaround — also
    what a quarantine pass wants anyway (one scan, two consumers)."""
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    df = df.cache()
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull())
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return clean, corrupt


def infer_json_schema(
    spark: SparkSession, path: str, sample_files: int = 1
) -> T.StructType:
    """Dev-time helper: infer a schema from a bounded sample of the
    folder (first ``sample_files`` files lexicographically), to be
    reviewed and pinned in code — never called per-run at scale."""
    import glob
    import os

    candidates = sorted(glob.glob(os.path.join(path, "*"))) or [path]
    sample = candidates[: max(1, sample_files)]
    return spark.read.option("preferTimestampNtz", "true").json(sample).schema
