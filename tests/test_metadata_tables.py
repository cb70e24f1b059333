"""Metadata tables (cdc/table.py snapshots_df / files_df /
history_df) — the Iceberg SELECT-FROM-t.snapshots analog: commit
history with structural operation classification, live-file inventory
with key-range stats, ancestry + tag refs."""

from __future__ import annotations

import json

import pandas as pd

from audience_behavior_semantic_etl_spark.cdc.apply import apply_batch
from audience_behavior_semantic_etl_spark.cdc.schema import ENVELOPE_SCHEMA
from audience_behavior_semantic_etl_spark.cdc.table import SnapshotTable


def _env(spark, rows, conv="conv-m"):
    pdf = pd.DataFrame(
        [
            {
                "lsn": lsn,
                "ts": pd.Timestamp("2025-01-01") + pd.Timedelta(seconds=lsn),
                "op": op,
                "conv_id": conv,
                "turn_idx": turn,
                "payload": json.dumps({"role": "user", "text": text}),
                "schema_ver": 1,
                "source_part": 0,
            }
            for lsn, op, turn, text in rows
        ]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return spark.createDataFrame(pdf, schema=ENVELOPE_SCHEMA)


def test_snapshots_files_history(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    apply_batch(_env(spark, [(1, "insert", 0, "a"), (2, "insert", 1, "b")]), t, 0)
    apply_batch(_env(spark, [(3, "update", 0, "c")]), t, 1)
    t.create_tag("audit-1")
    t.compact_buckets([0, 1])

    snaps = {r["version"]: r.asDict() for r in t.snapshots_df().collect()}
    head = t.manifest().version
    assert snaps[0]["operation"] == "create" and snaps[0]["parent"] is None
    # the two applies are pure appends; compaction is a rewrite
    appends = [v for v, r in snaps.items() if r["operation"] == "append"]
    assert len(appends) == 2
    assert snaps[head]["operation"] == "rewrite"
    assert snaps[head]["is_current"] and not snaps[0]["is_current"]
    assert snaps[head]["files_removed"] > 0

    files = t.files_df().collect()
    live = {f for fs in t.manifest().buckets.values() for f in fs}
    assert {r["path"] for r in files} == live
    assert all(r["size_bytes"] > 0 for r in files)
    # commit-time footer stats cover every live file of this table
    assert all(r["key_min"] == "conv-m" == r["key_max"] for r in files)
    # time travel: the v1 inventory is the era's own file set
    old_files = {r["path"] for r in t.files_df(version=1).collect()}
    assert old_files == {f for fs in t.manifest(1).buckets.values() for f in fs}
    assert old_files != live

    hist = {r["version"]: r.asDict() for r in t.history_df().collect()}
    assert all(r["is_current_ancestor"] for r in hist.values()), "linear history"
    tagged = [v for v, r in hist.items() if r["tags"]]
    assert tagged and hist[tagged[0]]["tags"] == ["audit-1"]


def test_snapshots_after_gc_marks_unknown_diff(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    for b in range(4):
        apply_batch(_env(spark, [(b + 1, "insert", b, f"t{b}")]), t, b)
    t.gc_orphans(keep_versions=2, staging_grace_seconds=0)
    snaps = {r["version"]: r.asDict() for r in t.snapshots_df().collect()}
    vs = sorted(snaps)
    assert len(vs) == 2, "expired manifests drop out of the listing"
    # delta manifests store the commit's OWN add/remove summary, so the
    # diff survives parent expiry (pre-delta formats had to report
    # "unknown" here — the stored summary is strictly better)
    assert snaps[vs[0]]["operation"] == "append"
    assert snaps[vs[0]]["files_added"] >= 1
    assert snaps[vs[0]]["files_removed"] == 0
    assert snaps[vs[1]]["operation"] == "append"
