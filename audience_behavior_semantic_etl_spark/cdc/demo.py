"""End-to-end CDC replay demo + self-check (the verify-skill surface).

Generates a deterministic WAL, streams it into a fresh snapshot table
via foreachBatch, and asserts per-turn text equality against the
independent pandas oracle. Run:

    python -m audience_behavior_semantic_etl_spark.cdc.demo
"""

from __future__ import annotations

import shutil
import sys
import tempfile

import pandas as pd

from audience_behavior_semantic_etl_spark.cdc.apply import ApplyConfig
from audience_behavior_semantic_etl_spark.cdc.gen import (
    GenConfig,
    expected_final_state,
    generate_change_log,
    write_wal_chunks,
)
from audience_behavior_semantic_etl_spark.cdc.stream import run_wal_stream
from audience_behavior_semantic_etl_spark.cdc.table import SnapshotTable
from audience_behavior_semantic_etl_spark.session import get_spark
from audience_behavior_semantic_etl_spark.scratch import scratch_dir

FINAL_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "tool_name", "tool_latency_ms"]


def table_to_pandas(table: SnapshotTable, ref: str = "main") -> pd.DataFrame:
    pdf = table.read_final(ref=ref).toPandas()
    for c in FINAL_COLS:
        if c not in pdf.columns:
            pdf[c] = None
    pdf = pdf[FINAL_COLS]
    pdf["tool_latency_ms"] = pdf["tool_latency_ms"].astype("Int64")
    return pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def check_equal(got: pd.DataFrame, want: pd.DataFrame) -> None:
    assert len(got) == len(want), f"row count: engine={len(got)} oracle={len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def main() -> int:
    spark = get_spark(app_name="cdc-demo", cpus=8, shuffle_partitions=8)
    work = scratch_dir("cdc-demo-")
    try:
        cfg = GenConfig(seed=42, n_convs=200)
        log = generate_change_log(cfg)
        oracle = expected_final_state(log)
        wal = f"{work}/wal"
        write_wal_chunks(log, wal, n_chunks=8)

        table = SnapshotTable.create(spark, f"{work}/table", n_buckets=8)
        run = run_wal_stream(
            spark, wal, table, f"{work}/ckpt", ApplyConfig(), max_files_per_trigger=2
        )
        if run.error:
            raise run.error
        got = table_to_pandas(table)
        check_equal(got, oracle)
        print(
            f"RESULT OK: {len(log)} events -> {len(got)} final rows across "
            f"{len([m for m in run.metrics if not m.skipped])} batches; "
            f"per-turn text equality vs oracle holds"
        )
        for m in run.metrics:
            print(
                f"RESULT batch={m.batch_id} events={m.events} upserts={m.upserts} "
                f"deletes={m.deletes} dropped={m.dedup_dropped} secs={m.seconds:.2f}"
            )
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
