"""Point-lookup (read_key) bench: bucket pruning × per-file key-range
stats (the Iceberg DataFile lower/upper-bounds analog, table.py
``file_stats``).

Workload shape is the transcripts reality: conversations are CREATED
OVER TIME, so each apply batch carries a contiguous slice of new
conv_ids and every bucket accumulates one tight-key-range delta file
per batch. A point lookup of any key therefore needs exactly ONE delta
generation of one bucket; without file stats it must scan ALL of that
bucket's generations (merge-on-read read amplification in its purest
form). This script builds such a table, then times ``read_key`` and
counts parquet files actually scanned, with the stats map present vs
wiped (``set_property("file_stats", {})`` — the pre-stats reader).

At bench scale the wall-clock delta is modest (driver/plan overhead
dominates sub-second lookups); the FILES-SCANNED ratio is the number
that scales — at 100 TB a bucket holds thousands of generations and
files_scanned IS the lookup cost.

Usage:
    python BENCH/point_lookup_bench.py [--batches 24] [--convs-per-batch 4000]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_table(spark, root: str, n_batches: int, convs_per_batch: int, turns: int):
    from pyspark.sql import functions as F

    from audience_behavior_semantic_etl_spark.cdc.apply import ApplyConfig, apply_batch
    from audience_behavior_semantic_etl_spark.cdc.schema import ENVELOPE_SCHEMA
    from audience_behavior_semantic_etl_spark.cdc.table import SnapshotTable

    table = SnapshotTable.create(spark, root, n_buckets=16)
    cfg = ApplyConfig(app_id="plb", auto_compact=False, shuffle_partitions=16)
    for b in range(n_batches):
        lo = b * convs_per_batch
        env = (
            spark.range(lo * turns, (lo + convs_per_batch) * turns)
            .select(
                F.col("id").alias("lsn"),
                F.timestamp_seconds(F.lit(1735689600) + F.col("id"))
                .cast("timestamp_ntz")
                .alias("ts"),
                F.lit("insert").alias("op"),
                F.format_string("c%010d", (F.col("id") / turns).cast("long")).alias(
                    "conv_id"
                ),
                F.pmod(F.col("id"), F.lit(turns)).cast("int").alias("turn_idx"),
                F.to_json(
                    F.struct(
                        F.lit("user").alias("role"),
                        F.format_string("t%d", F.col("id")).alias("text"),
                        F.lit(None).cast("string").alias("tool"),
                        F.lit("2025-01-01T00:00:00").alias("ts"),
                    )
                ).alias("payload"),
                F.lit(1).alias("schema_ver"),
                F.lit(0).alias("source_part"),
            )
        )
        assert [f.name for f in ENVELOPE_SCHEMA.fields] == env.columns
        apply_batch(env, table, b, cfg)
    return table


def measure(table, keys: list[str]) -> dict:
    lat = []
    files = []
    rows = 0
    for k in keys:
        t0 = time.perf_counter()
        df = table.read_key(k)
        rows += df.count()
        lat.append(time.perf_counter() - t0)
        files.append(len(df.inputFiles()))
    lat.sort()
    return {
        "lookups": len(keys),
        "rows": rows,
        "files_scanned_avg": round(sum(files) / len(files), 2),
        "p50_sec": round(lat[len(lat) // 2], 4),
        "total_sec": round(sum(lat), 3),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--convs-per-batch", type=int, default=4000)
    ap.add_argument("--turns", type=int, default=3)
    ap.add_argument("--lookups", type=int, default=24)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from audience_behavior_semantic_etl_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="plb-", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    try:
        table = build_table(
            spark, os.path.join(work, "t"), args.batches, args.convs_per_batch, args.turns
        )
        total_convs = args.batches * args.convs_per_batch
        # deterministic key spread across the whole id range (no RNG:
        # reproducible across runs/levels)
        keys = [
            "c%010d" % ((i * 7919) % total_convs) for i in range(args.lookups)
        ]
        # warm-up lookup so JVM/codegen warmup isn't charged to either arm
        table.read_key(keys[0]).count()
        with_stats = measure(table, keys)
        table.set_property("file_stats", {})  # the pre-stats reader
        without = measure(table, keys)
        out = {
            "metric": "point_lookup_files_scanned",
            "batches": args.batches,
            "events": total_convs * args.turns,
            "live_files": sum(len(fs) for fs in table.manifest().buckets.values()),
            "with_stats": with_stats,
            "without_stats": without,
            "files_scanned_ratio": round(
                without["files_scanned_avg"] / max(with_stats["files_scanned_avg"], 1e-9), 2
            ),
        }
        print(json.dumps(out))
        return 0
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
