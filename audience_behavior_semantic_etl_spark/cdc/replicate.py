"""Table-to-table streaming REPLICATION: source SnapshotTable → CDF
stream (cdf_source.py) → envelope re-translation → the real apply path
into a target SnapshotTable.

The composition closes the engine's loop: the same WAL-shaped envelope
contract that feeds a table is REGENERATED from its change feed, so a
replica is just another apply consumer — it inherits exactly-once (the
target's per-app ledger + the stream checkpoint), LWW/fold conflict
semantics, quarantine, and maintenance independence (either side can
compact/rebucket without disturbing the pipe, because the CDF source
skips rewriting commits). This is the Iceberg/Delta "replicate via CDF"
pattern with the apply stage doing the merge.

Translation (``cdf_to_envelope``):

- full-row versions (``_set`` null): ``op = delete`` for tombstones
  (payload ``{}``), else ``op = update`` with a JVM ``to_json``
  after-image — null fields dropped by to_json read back as explicit
  nulls, which is exactly full-row semantics (a base sets every
  column). Zero Python on this path.
- patches (``_set`` non-null): the payload must contain EXACTLY the
  masked keys, including EXPLICIT nulls — which ``to_json`` cannot
  emit — so patches go through an Arrow-batched ``mapInPandas`` that
  builds the sparse JSON per row. Patch traffic is the minority by
  construction; the common path stays JVM-side.

Ordering needs no special care: every row version carries its source
LSN, and the apply path's cross-batch LWW guard + read-side fold make
replay order-insensitive within the at-least-once window.

Schema evolution: before each micro-batch the target's column set is
synced to the source manifest (``add_columns`` is metadata-only), so a
mid-stream DDL on the source replicates forward; the STREAM's own
column set is pinned at start (standard source contract), so values
for newly added columns flow after a stream restart — the documented
CDF limitation, inherited.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from audience_behavior_semantic_etl_spark.cdc import schema as S
from audience_behavior_semantic_etl_spark.cdc.apply import ApplyConfig, apply_batch
from audience_behavior_semantic_etl_spark.cdc.cdf_source import TranscriptsCDF
from audience_behavior_semantic_etl_spark.cdc.table import SnapshotTable

_META = (S.LSN_META_COL, S.DELETED_META_COL, S.SETMASK_META_COL, "_commit_version")


def _json_val(v):
    if v is None or (not isinstance(v, (str, list, dict)) and pd.isna(v)):
        return None
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return v.item()
    return v


def cdf_to_envelope(changes: DataFrame) -> DataFrame:
    """Re-translate CDF row versions into WAL envelope rows (the
    inverse of normalize_envelope, module docstring for the split)."""
    data_cols = [c for c in changes.columns if c not in _META and c not in ("conv_id", "turn_idx")]
    is_del = F.coalesce(F.col(S.DELETED_META_COL), F.lit(False))
    is_patch = F.col(S.SETMASK_META_COL).isNotNull()

    def env_cols(op_col, payload_col):
        return [
            F.col(S.LSN_META_COL).alias("lsn"),
            (F.col("ts") if "ts" in data_cols else F.lit(None)).cast(
                "timestamp_ntz"
            ).alias("ts"),
            op_col.alias("op"),
            F.col("conv_id"),
            F.col("turn_idx").cast("int").alias("turn_idx"),
            payload_col.alias("payload"),
            F.lit(1).alias("schema_ver"),
            F.lit(0).alias("source_part"),
        ]

    bases = changes.filter(~is_patch).select(
        *env_cols(
            F.when(is_del, F.lit("delete")).otherwise(F.lit("update")),
            F.when(is_del, F.lit("{}")).otherwise(
                F.to_json(F.struct(*[F.col(c) for c in data_cols]))
            ),
        )
    )

    patch_src = changes.filter(is_patch)
    out_schema = bases.schema

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for _, row in pdf.iterrows():
                mask = list(row[S.SETMASK_META_COL])
                payloads.append(
                    json.dumps({c: _json_val(row[c]) for c in mask})
                )
            yield pd.DataFrame(
                {
                    "lsn": pdf[S.LSN_META_COL],
                    "ts": pdf["ts"] if "ts" in pdf.columns else pd.NaT,
                    "op": "update_partial",
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"],
                    "payload": payloads,
                    "schema_ver": 1,
                    "source_part": 0,
                }
            )

    patches = patch_src.mapInPandas(_build, schema=out_schema)
    return bases.unionByName(patches)


def replicate_stream(
    source: SnapshotTable,
    target: SnapshotTable,
    checkpoint: str,
    app_id: str = "replica",
    starting_version: int = 0,
    available_now: bool = True,
    apply_cfg: ApplyConfig | None = None,
):
    """Start the replication stream; returns the StreamingQuery.
    ``available_now=True`` drains-and-stops (catch-up / batch-shaped
    deployment); ``False`` runs continuously."""
    spark = source.spark
    spark.dataSource.register(TranscriptsCDF)
    base_cfg = apply_cfg or ApplyConfig()

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        src_cols = source.manifest().columns
        have = {n for n, _ in target.manifest().columns}
        missing = {n: t for n, t in src_cols if n not in have}
        if missing:
            target.add_columns(missing)
        import dataclasses

        cfg = dataclasses.replace(base_cfg, app_id=app_id)
        apply_batch(cdf_to_envelope(batch_df), target, batch_id, cfg)

    writer = (
        spark.readStream.format("transcripts_cdf")
        .option("path", source.root)
        .option("startingVersion", starting_version)
        .load()
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
