"""File-backed WAL source — the engine's S1/S2 analog (SURVEY.md §2.1).

The reference reads hourly gzip JSON folders with schema inference
(AcmeDailyETL.scala:382-383); at 10^10 events inference is off the
table, so the WAL source always reads with the explicit envelope
StructType. One parquet chunk file ≈ one offset range; stream order is
pinned by strictly increasing file mtimes (the file stream source
orders candidates by modification time — see gen_spark.py).

On a real cluster this module swaps to Kafka/binlog readers returning
the same envelope columns; everything downstream only sees envelope
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from audience_behavior_semantic_etl_spark.cdc.schema import ENVELOPE_SCHEMA


def read_wal(spark: SparkSession, wal_dir: str) -> DataFrame:
    """Batch scan of a WAL directory (explicit envelope schema)."""
    return spark.read.schema(ENVELOPE_SCHEMA).parquet(wal_dir)


def read_wal_stream(
    spark: SparkSession, wal_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming tail of a WAL directory; ``maxFilesPerTrigger`` bounds
    the micro-batch size (offset-range chunking)."""
    reader = spark.readStream.schema(ENVELOPE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(wal_dir)
