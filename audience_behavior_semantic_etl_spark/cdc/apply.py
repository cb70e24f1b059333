"""Per-batch apply: normalize -> fused LWW merge -> salted bucket
rewrite -> snapshot commit.

This is the engine's core, the modern re-expression of the reference's
operator chain (SURVEY.md §7.1):

- normalize        ≈ reference flatten/rename/case/enrich (§2.2/2.8/2.9)
  as ONE Arrow-vectorized ``mapInPandas`` stage: JSON after-image ->
  typed columns of the (possibly just-evolved) target schema, with
  text canonicalization. No per-row Python UDFs.
- LWW merge        ≈ DropDuplicateRows (§2.5 A3) made deterministic with
  row_number over lsn desc (§2.6 W1), FUSED with the merge: one window
  over union(normalized batch, existing rows of affected buckets)
  resolves in-batch duplicates, cross-batch staleness, and tombstones
  in a single shuffle.
- salted repartition ≈ the reference's explicit RepartitionByExpression
  before its stateful op (Sessionize.scala:103), plus the hot-key
  splitting the north_rule demands (SURVEY.md §4.2).
- exactly-once     : batch id + per-source-part LSN watermarks ride the
  snapshot commit; re-delivered batches no-op.

Per-batch Spark-job budget (scale discipline — each job is a full
batch scan at 10^10 events):
  1. per-source-part stats agg  (counts, lsn range, watermarks,
     schema_change detection)                              [1 scan]
  2. (rare) schema_change payload collect                  [tiny]
  3. hot-key census + affected-bucket census               [2 small aggs]
  4. the merge write itself, with all row metrics attached via
     the Observation API — no post-hoc count() jobs        [1 scan + merge]
"""

from __future__ import annotations

import json
import tempfile
import time
import uuid
from dataclasses import dataclass
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Observation, Window, functions as F
from pyspark.sql import types as T

from audience_behavior_semantic_etl_spark.cdc import schema as S
from audience_behavior_semantic_etl_spark.cdc.normalize import canonical_text
from audience_behavior_semantic_etl_spark.cdc.table import SnapshotTable, bucket_expr

# Columns every normalized event carries in addition to payload fields.
_ENVELOPE_KEEP = ["lsn", "op", "conv_id", "turn_idx", "source_part"]


@dataclass
class ApplyConfig:
    app_id: str = "cdc-apply"
    hot_key_threshold: int = 1000  # events per conv_id per batch
    n_salts: int = 8
    shuffle_partitions: int | None = None  # default: session setting


def normalized_schema(table: SnapshotTable) -> T.StructType:
    fields = [
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("source_part", T.IntegerType()),
    ]
    for name, dt in [(n, S.type_from_name(t)) for n, t in table.manifest().columns]:
        if name in ("conv_id", "turn_idx"):
            continue  # key columns come from the envelope
        fields.append(T.StructField(name, dt, True))
    return T.StructType(fields)


def make_normalizer(out_schema: T.StructType):
    """Arrow-batched payload normalizer. The JSON after-image is parsed
    and flattened (``tool_meta.name -> tool_name`` — the dotted-path
    rename of the reference, RenameColumns.scala:54), text is
    canonicalized, and every output column is cast to the target type.
    Unknown payload fields are dropped; missing ones become null — this
    is what makes v1 and v2 payloads land in one evolving schema.
    """
    payload_cols = [f.name for f in out_schema.fields if f.name not in _ENVELOPE_KEEP]

    def normalize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            out: dict[str, Any] = {c: pdf[c].to_numpy() for c in _ENVELOPE_KEEP}
            cols: dict[str, list] = {c: [None] * n for c in payload_cols}
            payloads = pdf["payload"].to_numpy()
            ops = pdf["op"].to_numpy()
            for i in range(n):
                if ops[i] == "delete" or payloads[i] is None:
                    continue
                p = json.loads(payloads[i])
                # flatten one level of nested structs: a.b -> a_b
                flat = {}
                for k, v in p.items():
                    if isinstance(v, dict) and k != "meta":
                        for k2, v2 in v.items():
                            flat[f"{k}_{k2}"] = v2
                    else:
                        flat[k] = v
                # tool_meta_* -> tool_* (target column names)
                for k in list(flat):
                    if k.startswith("tool_meta_"):
                        flat["tool_" + k[len("tool_meta_"):]] = flat.pop(k)
                for c in payload_cols:
                    if c in flat:
                        cols[c][i] = flat[c]
            res = pd.DataFrame({**out, **{c: cols[c] for c in payload_cols}})
            if "text" in res:
                res["text"] = res["text"].map(canonical_text, na_action="ignore")
            for f_ in out_schema.fields:
                if f_.name in ("ts",) and f_.name in res:
                    res[f_.name] = pd.to_datetime(res[f_.name], format="ISO8601")
                elif isinstance(f_.dataType, T.LongType) and f_.name in payload_cols:
                    res[f_.name] = pd.to_numeric(res[f_.name]).astype("Int64")
            yield res[[f.name for f in out_schema.fields]]

    return normalize


def lww_dedup(events: DataFrame) -> DataFrame:
    """Deterministic last-writer-wins within a DataFrame: one survivor
    per (conv_id, turn_idx) by (lsn desc). Exposed for direct use; the
    batch apply fuses this window with the merge."""
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(F.col("lsn").desc())
    return events.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


@dataclass
class BatchMetrics:
    batch_id: int
    events: int
    upserts: int
    deletes: int
    dedup_dropped: int
    hot_keys: int
    seconds: float
    lsn_min: int
    lsn_max: int
    snapshot_id: str | None = None
    skipped: bool = False


def apply_batch(
    events_raw: DataFrame,
    table: SnapshotTable,
    batch_id: int,
    cfg: ApplyConfig | None = None,
) -> BatchMetrics:
    """Apply one micro-batch of envelope rows to the table, exactly once."""
    cfg = cfg or ApplyConfig()
    t0 = time.perf_counter()
    spark = table.spark

    if table.is_batch_committed(cfg.app_id, batch_id):
        return BatchMetrics(batch_id, 0, 0, 0, 0, 0, 0.0, -1, -1, skipped=True)

    # -- job 1: per-source-part stats (counts, lsn range, watermarks,
    #    schema_change presence) in ONE batch scan ------------------------
    part_stats = (
        events_raw.groupBy("source_part")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lsn").alias("lsn_min"),
            F.max("lsn").alias("lsn_max"),
            F.sum(F.when(F.col("op") == "schema_change", 1).otherwise(0)).alias("n_sc"),
        )
        .collect()
    )
    n_events = sum(r["n"] for r in part_stats)
    n_sc = sum(r["n_sc"] for r in part_stats)
    if n_events - n_sc == 0 and n_sc == 0:
        snapshot = table.commit_merged_buckets(
            staged_dir=tempfile.mkdtemp(prefix="empty"),
            affected_buckets=[],
            app_id=cfg.app_id,
            batch_id=batch_id,
            watermarks={},
            lineage_row={"batch_id": batch_id, "rows": 0},
        )
        return BatchMetrics(batch_id, 0, 0, 0, 0, 0, time.perf_counter() - t0, -1, -1, snapshot)
    watermarks = {str(r["source_part"]): int(r["lsn_max"]) for r in part_stats}
    lsn_min = min(r["lsn_min"] for r in part_stats)
    lsn_max = max(r["lsn_max"] for r in part_stats)

    # -- job 2 (rare): schema_change DDL ----------------------------------
    if n_sc > 0:
        for r in events_raw.filter(F.col("op") == "schema_change").select("payload").collect():
            add = json.loads(r["payload"]).get("add_columns", {})
            if add:
                table.add_columns(add)

    m = table.manifest()
    data = events_raw.filter(F.col("op") != "schema_change").withColumn(
        "__bucket", bucket_expr(F.col("conv_id"), m.n_buckets)
    )
    n_data = n_events - n_sc

    # -- job 3: hot-key census + affected buckets (two SMALL aggregates;
    #    outputs are bounded by #hot keys and n_buckets, never batch size)
    hot = [
        r["conv_id"]
        for r in data.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > cfg.hot_key_threshold)
        .collect()
    ]
    affected = [int(r["__bucket"]) for r in data.select("__bucket").distinct().collect()]

    # -- normalize (Arrow) ------------------------------------------------
    out_schema = normalized_schema(table)
    normalized = data.drop("__bucket").mapInPandas(make_normalizer(out_schema), schema=out_schema)

    # -- fused LWW merge: ONE window over union(batch, existing) ----------
    table_cols = [n for n, _ in m.columns]
    batch_proj = normalized.select(
        *table_cols,
        F.col("lsn").alias(S.LSN_META_COL),
        "op",
    )
    existing_proj = table.read(buckets=affected).select(
        *table_cols, S.LSN_META_COL, F.lit("existing").alias("op")
    )
    combined = batch_proj.unionByName(existing_proj)
    # prefer existing on _lsn ties (re-delivered event == applied row)
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col(S.LSN_META_COL).desc(), F.when(F.col("op") == "existing", 0).otherwise(1)
    )
    winners = combined.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)

    metric_exprs = [
        F.coalesce(
            F.sum(F.when(F.col("op").isin("insert", "update"), 1).otherwise(0)), F.lit(0)
        ).alias("upserts"),
        F.coalesce(F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)), F.lit(0)).alias(
            "deletes"
        ),
        F.count(F.lit(1)).alias("survivors"),
    ]
    obs = Observation(f"merge-{batch_id}-{uuid.uuid4().hex[:8]}")
    winners = winners.observe(obs, *metric_exprs)
    final_rows = winners.filter(F.col("op") != "delete").drop("__rn", "op")

    # -- salted repartition + staged bucket write -------------------------
    final_rows = final_rows.withColumn("__bucket", bucket_expr(F.col("conv_id"), m.n_buckets))
    if hot:
        salt = F.when(
            F.col("conv_id").isin(hot), F.pmod(F.col("turn_idx"), F.lit(cfg.n_salts))
        ).otherwise(F.lit(0))
    else:
        salt = F.lit(0)
    final_rows = final_rows.withColumn("__salt", salt)

    staged = tempfile.mkdtemp(prefix=f"stage-{uuid.uuid4().hex}-")
    shuffle_n = cfg.shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    (
        final_rows.repartition(shuffle_n, "__bucket", "__salt")
        .drop("__salt")
        .write.mode("overwrite")
        .partitionBy("__bucket")
        .parquet(staged)
    )
    # Metrics ride the write action via CollectMetrics — no extra job in
    # the common case. When AQE's empty-relation propagation eliminates
    # the whole merge subtree (a batch whose only survivors are
    # tombstones writes zero rows), the metrics row is lost and .get
    # raises — recompute with one tiny job (the plan is deterministic,
    # and this path only fires on near-empty outputs).
    try:
        row_metrics = obs.get
    except Exception:
        row_metrics = winners.agg(*metric_exprs).collect()[0].asDict()

    snapshot = table.commit_merged_buckets(
        staged_dir=staged,
        affected_buckets=affected,
        app_id=cfg.app_id,
        batch_id=batch_id,
        watermarks=watermarks,
        lineage_row={
            "batch_id": batch_id,
            "rows": int(n_data),
            "upserts": int(row_metrics["upserts"] or 0),
            "deletes": int(row_metrics["deletes"] or 0),
            "lsn_min": int(lsn_min),
            "lsn_max": int(lsn_max),
            "hot_keys": len(hot),
        },
    )
    secs = time.perf_counter() - t0
    batch_winners = int(row_metrics["upserts"] or 0) + int(row_metrics["deletes"] or 0)
    return BatchMetrics(
        batch_id=batch_id,
        events=int(n_data),
        upserts=int(row_metrics["upserts"] or 0),
        deletes=int(row_metrics["deletes"] or 0),
        dedup_dropped=int(n_data - batch_winners),
        hot_keys=len(hot),
        seconds=secs,
        lsn_min=int(lsn_min),
        lsn_max=int(lsn_max),
        snapshot_id=snapshot,
    )
