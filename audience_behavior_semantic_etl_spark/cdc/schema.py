"""Schemas for the CDC engine (FIXTURES.md §A1/A2).

Explicit StructTypes everywhere — no inference at 10^10 scale (the
reference's read.json schema inference, AcmeDailyETL.scala:383, is the
one thing we deliberately do NOT carry over; SURVEY.md §2.1 S1).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Change-event envelope as it arrives off the WAL. The row payload is a
# JSON string ("after image" of the row, full-row CDC), so schema
# evolution is data-level, not envelope-level — exactly why the
# normalizer is a pandas UDF and not a fixed from_json.
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("op", T.StringType(), False),  # insert|update|delete|schema_change
        T.StructField("conv_id", T.StringType(), True),  # null for schema_change
        T.StructField("turn_idx", T.IntegerType(), True),  # null for schema_change
        T.StructField("payload", T.StringType(), True),  # JSON after-image / DDL
        T.StructField("schema_ver", T.IntegerType(), False),
        T.StructField("source_part", T.IntegerType(), False),
    ]
)

# Target transcripts table, v1 (input_hint shape).
TRANSCRIPTS_V1_FIELDS: list[tuple[str, T.DataType]] = [
    ("conv_id", T.StringType()),
    ("turn_idx", T.IntegerType()),
    ("role", T.StringType()),
    ("text", T.StringType()),
    ("tool", T.StringType()),
    ("ts", T.TimestampNTZType()),
]

# Columns added by the schema_change event (v2): tool metadata.
TRANSCRIPTS_V2_ADDED: list[tuple[str, T.DataType]] = [
    ("tool_name", T.StringType()),
    ("tool_latency_ms", T.LongType()),
]

# Internal metadata column: the LSN that produced the current row
# version. Required so a stale event re-delivered in a LATER batch
# cannot overwrite a newer applied row (cross-batch LWW).
LSN_META_COL = "_lsn"

# Internal metadata column: which payload columns a PARTIAL update
# (op = 'update_partial', sparse after-image) actually set. NULL for
# full-row versions (insert/update/delete) — those are "bases" that
# reset every column. Column-level resolution folds patches onto the
# latest base (table._fold_resolve); distinguishing "patch sets col to
# NULL" from "patch omits col" is exactly why a mask is stored instead
# of inferring from null-ness (the DuckDB arg_max NULL-skip gotcha, in
# storage form).
SETMASK_META_COL = "_set"

# Internal metadata column: tombstone flag. Deletes are RETAINED as
# tombstone rows (filtered from read_final) so that a stale event
# re-delivered in a later batch cannot resurrect a deleted key — the
# tombstone's _lsn wins the merge window. Tombstones are purged by
# table maintenance once the source's re-delivery horizon has passed
# (SnapshotTable.purge_tombstones).
DELETED_META_COL = "_deleted"

_SQL_TYPE = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "timestamp_ntz": T.TimestampNTZType(),
    "boolean": T.BooleanType(),
}


def type_from_name(name: str) -> T.DataType:
    return _SQL_TYPE[name]


def type_to_name(dt: T.DataType) -> str:
    for k, v in _SQL_TYPE.items():
        if v == dt:
            return k
    raise ValueError(f"unsupported type {dt}")


def transcripts_schema(
    columns: list[tuple[str, T.DataType]],
    with_lsn: bool = False,
    with_deleted: bool = False,
    with_setmask: bool = False,
) -> T.StructType:
    fields = [T.StructField(n, dt, True) for n, dt in columns]
    if with_lsn:
        fields.append(T.StructField(LSN_META_COL, T.LongType(), True))
    if with_deleted:
        fields.append(T.StructField(DELETED_META_COL, T.BooleanType(), True))
    if with_setmask:
        fields.append(
            T.StructField(SETMASK_META_COL, T.ArrayType(T.StringType()), True)
        )
    return T.StructType(fields)
