"""Snapshot-committed, bucket-partitioned table — the Iceberg-shaped
sink for the CDC engine.

No Iceberg runtime jar ships in this sandbox, so this implements the
same *semantics* on plain parquet + a JSON manifest with an atomic
pointer swap:

- data files:   ``root/data/f-<snapshot>-<n>.parquet`` (immutable)
- manifests:    ``root/_manifests/v{N}.json`` — schema, bucket -> file
  list, properties (committed batch ids, per-source-part LSN
  watermarks), lineage log, parent version
- pointer:      ``root/_current`` — the committed version number,
  swapped with ``os.replace`` (atomic on POSIX), written AFTER the
  manifest: a crash between the two leaves an orphan manifest and a
  readable previous snapshot (write-manifest-last protocol,
  SURVEY.md §7.4)

Readers resolve ``_current`` -> manifest -> exact file list, so
uncommitted data files are invisible. Bucket partitioning is
``pmod(xxhash64(conv_id), n_buckets)`` — the Iceberg
``bucket(N, conv_id)`` transform analog — so a MERGE touches only the
buckets its keys hash into, and replay-scale writes parallelize across
buckets. On a real cluster this module is replaced by Iceberg
``MERGE INTO`` + snapshot summary properties; the engine API is
identical (this is a sink swap, not an engine change).

Reference parity: the reference persists each cube step as
Hive-partitioned parquet + temp table (ETLProcess.scala:111-128) with
``coalesce(1)`` — we keep "persisted, partitioned, queryable-by-name"
and drop the single-file write (SURVEY.md §4.2).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from audience_behavior_semantic_etl_spark.cdc import schema as S


def bucket_expr(conv_col, n_buckets: int):
    """Iceberg-style bucket transform: pmod(xxhash64(key), N)."""
    return F.pmod(F.xxhash64(conv_col), F.lit(n_buckets)).cast("int")


@dataclass
class Manifest:
    version: int
    snapshot_id: str
    parent: int | None
    columns: list[tuple[str, str]]  # (name, type_name)
    n_buckets: int
    buckets: dict[str, list[str]]  # bucket id (str) -> relative file paths
    properties: dict[str, Any] = field(default_factory=dict)
    lineage: list[dict[str, Any]] = field(default_factory=list)

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "snapshot_id": self.snapshot_id,
                "parent": self.parent,
                "columns": self.columns,
                "n_buckets": self.n_buckets,
                "buckets": self.buckets,
                "properties": self.properties,
                "lineage": self.lineage,
            }
        )

    @staticmethod
    def from_json(s: str) -> "Manifest":
        d = json.loads(s)
        return Manifest(
            version=d["version"],
            snapshot_id=d["snapshot_id"],
            parent=d["parent"],
            columns=[tuple(c) for c in d["columns"]],
            n_buckets=d["n_buckets"],
            buckets=d["buckets"],
            properties=d["properties"],
            lineage=d["lineage"],
        )


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ------------------------------------------------------------ lifecycle

    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        columns: list[tuple[str, Any]] | None = None,
        n_buckets: int = 16,
    ) -> "SnapshotTable":
        cols = columns or S.TRANSCRIPTS_V1_FIELDS
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)
        m = Manifest(
            version=0,
            snapshot_id=uuid.uuid4().hex,
            parent=None,
            columns=[(n, S.type_to_name(dt)) for n, dt in cols],
            n_buckets=n_buckets,
            buckets={},
            properties={"watermarks": {}, "committed_batches": {}},
        )
        t = SnapshotTable(spark, root)
        t._write_manifest(m)
        return t

    @staticmethod
    def exists(root: str) -> bool:
        return os.path.exists(os.path.join(root, "_current"))

    def manifest(self) -> Manifest:
        with open(os.path.join(self.root, "_current")) as f:
            v = int(f.read().strip())
        with open(os.path.join(self.root, "_manifests", f"v{v}.json")) as f:
            return Manifest.from_json(f.read())

    def _write_manifest(self, m: Manifest) -> None:
        """Write-manifest-last atomic commit."""
        mpath = os.path.join(self.root, "_manifests", f"v{m.version}.json")
        with open(mpath, "w") as f:
            f.write(m.to_json())
            f.flush()
            os.fsync(f.fileno())
        tmp = os.path.join(self.root, f"_current.tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(m.version))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.root, "_current"))

    # ------------------------------------------------------------ schema

    def spark_schema(self, with_lsn: bool = True):
        m = self.manifest()
        cols = [(n, S.type_from_name(t)) for n, t in m.columns]
        return S.transcripts_schema(cols, with_lsn=with_lsn)

    def add_columns(self, new_cols: dict[str, str]) -> None:
        """ADD COLUMN(s): metadata-only commit; existing files are read
        with the widened schema (missing columns -> null), same as
        Iceberg schema evolution."""
        m = self.manifest()
        existing = {n for n, _ in m.columns}
        added = [(n, t) for n, t in new_cols.items() if n not in existing]
        if not added:
            return
        m.columns = m.columns + added
        m.parent = m.version
        m.version += 1
        m.snapshot_id = uuid.uuid4().hex
        self._write_manifest(m)

    # ------------------------------------------------------------ read

    def read(self, buckets: list[int] | None = None) -> DataFrame:
        m = self.manifest()
        sel = (
            m.buckets
            if buckets is None
            else {str(b): m.buckets.get(str(b), []) for b in buckets}
        )
        files = [os.path.join(self.root, p) for ps in sel.values() for p in ps]
        schema = self.spark_schema(with_lsn=True)
        if not files:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*files)

    def read_final(self) -> DataFrame:
        """User-facing view: metadata column dropped."""
        return self.read().drop(S.LSN_META_COL)

    # ------------------------------------------------------------ write

    def is_batch_committed(self, app_id: str, batch_id: int) -> bool:
        committed = self.manifest().properties.get("committed_batches", {})
        return batch_id <= committed.get(app_id, -1)

    def commit_merged_buckets(
        self,
        staged_dir: str,
        affected_buckets: list[int],
        app_id: str,
        batch_id: int,
        watermarks: dict[str, int],
        lineage_row: dict[str, Any],
    ) -> str:
        """Swap the file lists of ``affected_buckets`` for the files
        Spark staged under ``staged_dir/__bucket=N/``, then commit one
        new snapshot carrying the batch id + offset watermarks.
        Returns the new snapshot id.
        """
        m = self.manifest()
        snapshot = uuid.uuid4().hex
        new_buckets = dict(m.buckets)
        for b in affected_buckets:
            bdir = os.path.join(staged_dir, f"__bucket={b}")
            rels: list[str] = []
            if os.path.isdir(bdir):
                for i, fn in enumerate(sorted(os.listdir(bdir))):
                    if not fn.endswith(".parquet"):
                        continue
                    rel = f"data/f-{snapshot}-{b}-{i}.parquet"
                    shutil.move(os.path.join(bdir, fn), os.path.join(self.root, rel))
                    rels.append(rel)
            new_buckets[str(b)] = rels  # empty list = bucket emptied
        m.buckets = new_buckets
        m.parent = m.version
        m.version += 1
        old_snapshot = m.snapshot_id
        m.snapshot_id = snapshot
        wm = m.properties.setdefault("watermarks", {})
        for part, lsn in watermarks.items():
            wm[str(part)] = max(int(lsn), int(wm.get(str(part), -1)))
        m.properties.setdefault("committed_batches", {})[app_id] = batch_id
        m.lineage.append({**lineage_row, "snapshot_id": snapshot, "parent_snapshot": old_snapshot})
        self._write_manifest(m)
        return snapshot

    # ------------------------------------------------------------ metrics

    def lineage(self) -> list[dict[str, Any]]:
        return self.manifest().lineage

    def lineage_df(self) -> DataFrame:
        rows = self.lineage()
        if not rows:
            raise ValueError("no lineage yet")
        return self.spark.createDataFrame(rows)
