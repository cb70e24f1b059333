"""Incremental view maintenance (IVM) over the snapshot table's
changelog: a materialized downstream aggregate kept in sync at
O(changes-touched work), never O(table).

This is the consumer side of the CDC contract — the reason a CDC
engine exists at all is that downstream cubes (the reference's daily
session/user/conversion cubes, AcmeDailyETL.scala:375-711) should NOT
rescan 10^10 rows per refresh. ``SnapshotTable.read_changes`` already
exposes the per-commit changelog (Iceberg incremental reads); this
module closes the loop by maintaining a grouped aggregate from it.

Design: RECOMPUTE-BASED IVM (partition-scoped), not delta algebra.

- The changelog yields the set of CHANGED GROUP KEYS since the last
  sync (a ``distinct`` over new row versions — bounded by changed
  conversations, not events).
- Affected groups are recomputed EXACTLY from the table, reading only
  the BUCKETS those keys live in (the same bucket transform that
  prunes point lookups prunes here; the scan never touches unaffected
  buckets) and semi-joining the changed keys before aggregating.
- The materialized view is itself parquet partitioned by the same
  bucket transform, so the refresh rewrites ONLY affected bucket
  partitions: unchanged-bucket files are untouched bytes.

Why recompute instead of +delta/-retraction algebra: the changelog
carries new row VERSIONS only (no pre-images), so true delta
maintenance would need an old-value lookup join per change — a second
table scan in disguise. Group recompute is exact for ANY aggregate
(max / count-distinct / argmax included, which delta algebra cannot
self-maintain), and it makes ``refresh`` IDEMPOTENT: a crash between
the partition swap and the meta write is healed by re-running the same
refresh, because group values are derived from the table, not from
applying deltas to possibly-half-updated view state.

Scale shape at 10^10 rows / 1000 executors: refresh cost is
O(rows in affected buckets) scan + O(changed keys) aggregate + a
partition-pruned rewrite of the (already aggregated, small) view.
With n_buckets sized so a bucket fits a task (the table's own sizing
rule), a batch touching k conversations costs ~k/(table keys) of a
full refresh. Single-refresher assumption (same as the table's
single-writer commit rule); crossing a compaction in the incremental
window falls back to a full refresh, per read_changes' contract.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Callable

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from audience_behavior_semantic_etl_spark.cdc import schema as S
from audience_behavior_semantic_etl_spark.cdc.table import SnapshotTable, bucket_expr


class IncrementalView:
    """A materialized grouped aggregate over ``table.read_final()``,
    refreshed incrementally from the table's changelog.

    ``agg`` maps the live-table DataFrame to one row per ``key`` (the
    key column must survive in the output). The view stores its rows as
    parquet partitioned by the table's bucket transform of ``key``.
    """

    META = "_view.json"

    def __init__(
        self,
        table: SnapshotTable,
        root: str,
        agg: Callable[[DataFrame], DataFrame],
        key: str = "conv_id",
    ):
        self.table = table
        self.root = root
        self.agg = agg
        self.key = key
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ meta
    def _meta_path(self) -> str:
        return os.path.join(self.root, self.META)

    def _meta(self) -> dict | None:
        try:
            with open(self._meta_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _write_meta(self, synced_version: int, schema: T.StructType) -> None:
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"synced_version": int(synced_version), "schema": schema.json()}, f)
        os.replace(tmp, self._meta_path())

    # ------------------------------------------------------------ read
    def read(self) -> DataFrame:
        """The materialized view (bucket partition column dropped)."""
        meta = self._meta()
        if meta is None:
            raise FileNotFoundError(f"view at {self.root} never refreshed")
        schema = T.StructType.fromJson(json.loads(meta["schema"]))
        data = os.path.join(self.root, "data")
        part_dirs = (
            [d for d in os.listdir(data) if d.startswith("__bucket=")]
            if os.path.isdir(data)
            else []
        )
        if not part_dirs:
            return self.table.spark.createDataFrame([], schema)
        # explicit schema: no inference job, and an all-null column in a
        # partition keeps its declared type
        return (
            self.table.spark.read.schema(
                T.StructType(list(schema.fields) + [T.StructField("__bucket", T.IntegerType())])
            )
            .option("basePath", data)
            .parquet(*[os.path.join(data, d) for d in part_dirs])
            .drop("__bucket")
        )

    def synced_version(self) -> int | None:
        m = self._meta()
        return None if m is None else int(m["synced_version"])

    # --------------------------------------------------------- refresh
    def refresh(self) -> dict:
        """Bring the view up to the table's current snapshot. Returns
        ``{"mode": "full"|"incremental"|"noop", "synced_version": v,
        "affected_buckets": n}``."""
        cur = self.table.manifest().version
        meta = self._meta()
        if meta is None:
            return self._full(cur)
        synced = int(meta["synced_version"])
        if cur == synced:
            return {"mode": "noop", "synced_version": cur, "affected_buckets": 0}
        try:
            changes = self.table.read_changes(synced, cur)
        except ValueError:
            # incremental window crosses a compaction/purge — re-sync
            return self._full(cur)
        return self._incremental(cur, changes)

    def _final_rows(self, buckets: list[int] | None, version: int) -> DataFrame:
        raw = self.table.read(buckets=buckets, with_deleted=True, version=version)
        return raw.filter(~F.coalesce(F.col(S.DELETED_META_COL), F.lit(False))).drop(
            S.LSN_META_COL, S.DELETED_META_COL
        )

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        n = self.table.manifest().n_buckets
        return df.withColumn("__bucket", bucket_expr(F.col(self.key), n))

    def _full(self, cur: int) -> dict:
        out = self._with_bucket(self.agg(self._final_rows(None, cur)))
        staged = os.path.join(self.root, f"_staging-{uuid.uuid4().hex[:8]}")
        out.write.mode("overwrite").partitionBy("__bucket").parquet(staged)
        data = os.path.join(self.root, "data")
        if os.path.isdir(data):
            shutil.rmtree(data)
        os.makedirs(data, exist_ok=True)
        for d in os.listdir(staged):
            if d.startswith("__bucket="):
                os.rename(os.path.join(staged, d), os.path.join(data, d))
        shutil.rmtree(staged, ignore_errors=True)
        self._write_meta(cur, T.StructType([f for f in out.schema.fields if f.name != "__bucket"]))
        return {"mode": "full", "synced_version": cur, "affected_buckets": -1}

    def _incremental(self, cur: int, changes: DataFrame) -> dict:
        # changed group keys: bounded by conversations touched since the
        # last sync — the only driver-side list is their BUCKET ids
        # (≤ n_buckets), never the keys themselves
        return self._apply_changed_keys(changes.select(self.key).distinct(), cur)

    def _apply_changed_keys(self, changed: DataFrame, cur: int) -> dict:
        """Recompute exactly the groups in ``changed`` from the table
        at version ``cur`` and swap their bucket partitions — the
        shared tail of version-window refresh and streaming refresh."""
        n_buckets = self.table.manifest().n_buckets
        affected = sorted(
            r["__b"]
            for r in changed.select(bucket_expr(F.col(self.key), n_buckets).alias("__b"))
            .distinct()
            .collect()
        )
        if not affected:
            self._write_meta(cur, self._view_schema())
            return {"mode": "incremental", "synced_version": cur, "affected_buckets": 0}
        # recompute ONLY the changed groups, scanning ONLY their buckets
        live = self._final_rows(affected, cur).join(
            F.broadcast(changed), on=self.key, how="semi"
        )
        new_rows = self._with_bucket(self.agg(live))
        # table schema evolution can change the agg's output shape
        # (e.g. a new tool_latency_ms column feeding a new measure); the
        # stored rows then can't be unioned with recomputed ones —
        # re-materialize instead of guessing at nulls
        stored = self._view_schema()
        if [f.name for f in new_rows.schema.fields if f.name != "__bucket"] != [
            f.name for f in stored.fields
        ]:
            return self._full(cur)
        # untouched groups in the affected buckets are carried over;
        # groups whose keys vanished from the table (fully deleted) are
        # in `changed` and produce no recompute row -> dropped
        keep = (
            self._read_buckets(affected)
            .join(F.broadcast(changed), on=self.key, how="anti")
        )
        out = keep.unionByName(new_rows)
        staged = os.path.join(self.root, f"_staging-{uuid.uuid4().hex[:8]}")
        out.write.mode("overwrite").partitionBy("__bucket").parquet(staged)
        data = os.path.join(self.root, "data")
        for b in affected:
            dst = os.path.join(data, f"__bucket={b}")
            src = os.path.join(staged, f"__bucket={b}")
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            if os.path.isdir(src):
                os.rename(src, dst)
        shutil.rmtree(staged, ignore_errors=True)
        self._write_meta(cur, self._view_schema())
        return {
            "mode": "incremental",
            "synced_version": cur,
            "affected_buckets": len(affected),
        }

    # ------------------------------------------------- streaming refresh
    def stream_refresh(self, checkpoint: str, available_now: bool = True):
        """CONTINUOUS view maintenance off the table's streaming change
        feed (cdc/cdf_source.py) instead of version-window polling.

        Why this beats ``refresh()`` at scale: the CDF source excludes
        maintenance commits structurally, so the incremental window
        NEVER crosses a compaction from the view's perspective — the
        full-rescan fallback (the one O(table) cost in this module)
        disappears from steady-state operation. Progress is the stream
        checkpoint (exactly-once microbatches); correctness does not
        depend on it, because each microbatch RECOMPUTES its changed
        groups from the current table — re-delivery after a crash
        re-runs an idempotent recompute, same as ``refresh``'s
        crash-healing contract.

        Bootstraps with one full materialization if the view never
        refreshed, then streams from that synced version. Returns the
        StreamingQuery; ``available_now=True`` drains-and-stops (the
        batch-job-shaped deployment), ``False`` runs continuously with
        the default trigger."""
        from audience_behavior_semantic_etl_spark.cdc.cdf_source import TranscriptsCDF

        spark = self.table.spark
        spark.dataSource.register(TranscriptsCDF)
        if self._meta() is None:
            self._full(self.table.manifest().version)

        def _sync(batch_df: DataFrame, batch_id: int) -> None:
            # foreachBatch hands a ROW-BASED recomputed plan; spool the
            # (key-only, pre-distinct) projection to columnar scratch
            # so the two downstream joins don't re-run the Python
            # source, then recompute those groups from the live table
            scratch = os.path.join(self.root, f"_chg-{uuid.uuid4().hex[:8]}")
            try:
                batch_df.select(self.key).where(
                    F.col(self.key).isNotNull()
                ).distinct().write.mode("overwrite").parquet(scratch)
                changed = spark.read.parquet(scratch)
                if changed.isEmpty():
                    return
                self._apply_changed_keys(changed, self.table.manifest().version)
            finally:
                shutil.rmtree(scratch, ignore_errors=True)

        writer = (
            spark.readStream.format("transcripts_cdf")
            .option("path", self.table.root)
            .option("startingVersion", self.synced_version())
            .load()
            .writeStream.foreachBatch(_sync)
            .option("checkpointLocation", checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def _view_schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self._meta()["schema"]))

    def _read_buckets(self, buckets: list[int]) -> DataFrame:
        schema = self._view_schema()
        data = os.path.join(self.root, "data")
        dirs = [
            os.path.join(data, f"__bucket={b}")
            for b in buckets
            if os.path.isdir(os.path.join(data, f"__bucket={b}"))
        ]
        if not dirs:
            return self.table.spark.createDataFrame(
                [], T.StructType(list(schema.fields) + [T.StructField("__bucket", T.IntegerType())])
            )
        return (
            self.table.spark.read.schema(
                T.StructType(list(schema.fields) + [T.StructField("__bucket", T.IntegerType())])
            )
            .option("basePath", data)
            .parquet(*dirs)
        )
