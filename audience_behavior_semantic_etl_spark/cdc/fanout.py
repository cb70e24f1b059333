"""Multi-table fan-out apply — one WAL tail syncing SEVERAL target
tables, the standard whole-database CDC shape (a binlog carries every
table's changes interleaved; Debezium-style pipelines route by table
and upsert each target independently).

Design for scale and crash-safety:

- The batch is spooled to columnar parquet ONCE (when the source hands
  us the streaming row-based RDD) and every route's filtered apply
  reads the same spool — N routes cost one write + N pruned scans, not
  N recomputations of the batch (see apply._needs_spool for why the
  spool exists at all).
- Each route commits under its OWN table's exactly-once ledger with
  the SAME (app_id, batch_id). A crash between route commits is the
  interesting window: on resume the batch is re-delivered, tables that
  already committed it skip (ledger dedup), the rest apply — the
  whole fan-out converges without a cross-table transaction, because
  per-table idempotence makes "apply my slice of batch k" safe to
  retry unilaterally. (Pinned by tests/test_cdc.py
  test_fanout_crash_between_tables.)
- Routes are plain Column predicates, so Catalyst pushes them into the
  spool scan (partition-pruned, column-pruned) — routing costs no
  extra shuffle; the per-route apply pipeline is unchanged.

Rows matching no route are NOT applied anywhere; callers syncing a
closed table set should make the last route a complement predicate if
they need drop-proofing.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import Column, DataFrame

from audience_behavior_semantic_etl_spark.cdc import schema as S
from audience_behavior_semantic_etl_spark.cdc.apply import (
    ApplyConfig,
    BatchMetrics,
    _needs_spool,
    apply_batch,
)
from audience_behavior_semantic_etl_spark.cdc.table import SnapshotTable
from audience_behavior_semantic_etl_spark.scratch import scratch_dir


def apply_batch_fanout(
    events: DataFrame,
    routes: dict[str, tuple[SnapshotTable, Column, ApplyConfig]],
    batch_id: int,
) -> dict[str, BatchMetrics]:
    """Apply one micro-batch to every routed table, exactly once per
    table. ``routes`` maps a route name to (target table, row
    predicate, apply config); predicates should be disjoint (a row
    matching two routes is applied to both — legal, occasionally
    useful for audit mirrors, usually unintended)."""
    spark = events.sparkSession
    spool = None
    try:
        if _needs_spool(events):
            spool = scratch_dir("cdc-fanout-spool-")
            events.write.mode("overwrite").parquet(spool)
            events = spark.read.schema(S.ENVELOPE_SCHEMA).parquet(spool)
        return {
            name: apply_batch(events.filter(pred), table, batch_id, cfg)
            for name, (table, pred, cfg) in routes.items()
        }
    finally:
        if spool is not None:
            shutil.rmtree(spool, ignore_errors=True)
