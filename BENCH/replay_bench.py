"""CDC replay throughput bench — ONE parallelism level per process.

Replays a deterministic WAL (generated once, cached on disk, shared
byte-identical across parallelism levels) into a fresh snapshot table
via the real streaming surface (readStream -> foreachBatch ->
apply_batch) and reports events/sec.

The driver-sanctioned proxy for the north_rule's "N vs 4N executors"
criterion is the same job at local[8] vs local[32] on the same input
(see BASELINE.md); BENCH/scaling.py orchestrates the two levels as
separate processes so each gets a fresh JVM.

Usage:
    python BENCH/replay_bench.py --cpus 8 --convs 12000
Prints one JSON line:
    {"cpus": 8, "events": N, "secs": S, "events_per_sec": R, ...}
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAL_CHUNKS = 256
FILES_PER_TRIGGER = 64  # -> 4 micro-batches over the full log


def wal_cache_dir(seed: int, convs: int, hot_mult: int, partial_frac: float = 0.0) -> str:
    key = hashlib.md5(
        f"v2|{seed}|{convs}|{WAL_CHUNKS}|{hot_mult}|{partial_frac}".encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"cdc-bench-wal-{key}")


def ensure_wal(
    spark, seed: int, convs: int, hot_mult: int = 40, partial_frac: float = 0.0
) -> tuple[str, int]:
    """Generate the WAL once (distributed spark generator — see
    cdc/gen_spark.py; its replay contract is pinned to the pandas
    oracle by test_spark_generator_replay_matches_oracle); reuse the
    cached files across runs and parallelism levels so both levels see
    byte-identical input. Returns (wal_dir, n_events)."""
    d = wal_cache_dir(seed, convs, hot_mult, partial_frac)
    meta = d + ".meta.json"  # sibling: the WAL dir must stay pure parquet
    if os.path.exists(meta) and os.path.isdir(d):
        with open(meta) as f:
            return d, json.load(f)["n_events"]
    from audience_behavior_semantic_etl_spark.cdc.gen_spark import (
        generate_change_log_spark,
        write_wal_chunks_spark,
    )

    tmp = d + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    log = generate_change_log_spark(
        spark, seed=seed, n_convs=convs, hot_update_mult=hot_mult, partial_frac=partial_frac
    )
    write_wal_chunks_spark(log, tmp, n_chunks=WAL_CHUNKS)
    n = spark.read.parquet(tmp).count()
    shutil.rmtree(d, ignore_errors=True)
    os.rename(tmp, d)
    with open(meta, "w") as f:
        json.dump({"n_events": n, "seed": seed, "convs": convs}, f)
    return d, n


def duckdb_expected_keys(wal_dir: str) -> int:
    """Independent (non-Spark) count of expected live keys after full
    replay: global LWW by lsn over FULL-ROW ops, deletes drop the key.
    update_partial events are excluded — a patch never creates or
    deletes a key (column-fold semantics, cdc/table.py _fold_resolve),
    so key liveness is decided by the lsn-max full-row op alone."""
    import duckdb

    return duckdb.sql(
        f"""
        SELECT count(*) FROM (
            SELECT conv_id, turn_idx, arg_max(op, lsn) AS last_op
            FROM read_parquet('{wal_dir}/*.parquet')
            WHERE op NOT IN ('schema_change', 'update_partial')
            GROUP BY conv_id, turn_idx
        ) WHERE last_op != 'delete'
        """
    ).fetchone()[0]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--convs", type=int, default=120_000)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--check", action="store_true", help="duckdb key-set sanity check")
    ap.add_argument(
        "--partial-frac", type=float, default=0.0,
        help="fraction of update churn emitted as sparse after-images "
             "(op=update_partial; flips the table into column-fold reads)",
    )
    ap.add_argument(
        "--hot-mult", type=int, default=40,
        help="update-churn multiplier for hot conversations (skew stress; "
             "a large value concentrates a big share of the batch on a few keys)",
    )
    ap.add_argument(
        "--files-per-trigger", type=int, default=FILES_PER_TRIGGER,
        help="WAL chunk files per micro-batch (256 total chunks); larger "
             "batches amortize the per-batch fixed driver cost",
    )
    ap.add_argument(
        "--branch", action="store_true",
        help="apply onto a BRANCH ref instead of main (A/B: branch refs "
             "ride the hot apply path as pure metadata — expect ~1.0x)",
    )
    ap.add_argument(
        "--codec", default=None,
        help="parquet compression codec override for spool+table writes "
             "(snappy default; lz4/zstd/uncompressed trade CPU vs bytes)",
    )
    args = ap.parse_args()

    from audience_behavior_semantic_etl_spark.cdc.apply import ApplyConfig
    from audience_behavior_semantic_etl_spark.cdc.stream import run_wal_stream
    from audience_behavior_semantic_etl_spark.cdc.table import SnapshotTable
    from audience_behavior_semantic_etl_spark.session import get_spark

    # RAM-backed working storage when available: this sandbox's single
    # ext4 disk throttles 32 concurrent writers via dirty-page writeback
    # (measured: identical parquet write 6s vs 66s depending on page
    # cache state), which would measure the DISK, not the engine. On a
    # real cluster the table lives on HDFS/S3 and shuffle on per-node
    # NVMe, so RAM-backing local mode is the honest analog. The WAL
    # stays on disk (reads are page-cached, as a warm source would be).
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    extra = {"spark.local.dir": os.path.join(shm, "spark-local")}
    if args.codec:
        extra["spark.sql.parquet.compression.codec"] = args.codec
    # Heap scaled PER EXECUTOR THREAD (0.75g each, like fixed-size
    # executors on a real cluster, where 4N executors bring 4x total
    # heap). A single giant shared heap is actively harmful: G1 at 32
    # threads on a 48g heap spent >25% of task time in GC (measured
    # 252s GC in one stage), and batches slowed down run-over-run.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{max(6, (args.cpus * 3) // 4)}g")
    # The Python-side normalize stage runs AFTER the bucket shuffle, so
    # its parallelism is shuffle_partitions — input file layout does not
    # gate the hot stage and no file-split tuning is needed here.
    spark = get_spark(
        app_name=f"cdc-replay-bench-{args.cpus}",
        cpus=args.cpus,
        shuffle_partitions=args.cpus,
        extra_conf=extra,
    )
    work = tempfile.mkdtemp(prefix=f"cdc-bench-{args.cpus}-", dir=shm)
    try:
        wal, n_events = ensure_wal(
            spark, args.seed, args.convs, args.hot_mult, args.partial_frac
        )

        # Warm the JVM + python workers OUTSIDE the timed window by
        # applying one small representative batch to a scratch table
        # (exercises the full codegen set: pruned stats scan, from_json
        # normalize, pandas-UDF worker pool, window, range shuffle,
        # parquet write, commit). The protocol measures warmed
        # steady-state throughput — on a real cluster executors are
        # long-lived and JIT warmup is not part of per-batch cost; in a
        # 40 s local run an unwarmed first batch would be ~40% of wall.
        warm_tbl = SnapshotTable.create(spark, f"{work}/warm", n_buckets=args.n_buckets)
        from audience_behavior_semantic_etl_spark.cdc.apply import apply_batch as _apply

        # materialize through the driver so the warm batch is a
        # row-backed LogicalRDD — the SAME plan shape foreachBatch hands
        # apply_batch (spool path included), not the file-backed variant
        head = spark.read.parquet(wal).limit(50_000).collect()
        _apply(
            spark.createDataFrame(head, schema=spark.read.parquet(wal).schema),
            warm_tbl, 0, ApplyConfig(),
        )
        # Second, LARGER warm at full thread width (file-backed, ~1/8 of
        # the WAL): the small row-backed batch above exercises every
        # code path but not enough ITERATIONS to carry the parquet
        # encode / normalize loops through tiered JIT when N threads
        # compile concurrently — on a degraded shared host the first
        # timed 6.5M-event batch still ran 5-10x slow at local[32]
        # (write 114 s vs 11 s for the very next identical batch) while
        # local[8] showed no such cliff. Still warm-up, still excluded:
        # long-lived executors on a real cluster run compiled code.
        wal_files = sorted(
            os.path.join(wal, f) for f in os.listdir(wal) if f.endswith(".parquet")
        )
        k = max(1, len(wal_files) // 8)
        _apply(spark.read.parquet(*wal_files[:k]), warm_tbl, 1, ApplyConfig())
        shutil.rmtree(f"{work}/warm", ignore_errors=True)

        table = SnapshotTable.create(spark, f"{work}/table", n_buckets=args.n_buckets)
        cfg = ApplyConfig()
        if args.branch:
            table.create_branch("bench")
            cfg = ApplyConfig(branch="bench")
        os.system("sync")  # drain pending writeback from generation/warmup
        t0 = time.perf_counter()
        run = run_wal_stream(
            spark,
            wal,
            table,
            f"{work}/ckpt",
            cfg,
            max_files_per_trigger=args.files_per_trigger,
        )
        secs = time.perf_counter() - t0
        if run.error:
            raise run.error
        applied = sum(m.events for m in run.metrics if not m.skipped)
        final_rows = table.read_final(ref="bench" if args.branch else "main").count()
        out = {
            "cpus": args.cpus,
            "events": int(applied),
            "wal_events": int(n_events),
            "final_rows": int(final_rows),
            "batches": len([m for m in run.metrics if not m.skipped]),
            "secs": round(secs, 3),
            "events_per_sec": round(applied / secs, 1),
            "files_per_trigger": args.files_per_trigger,
            "batch_secs": [round(m.seconds, 3) for m in run.metrics],
            "phases": [m.phases for m in run.metrics if not m.skipped],
            "hot_keys_seen": int(sum(m.hot_keys for m in run.metrics)),
            "hot_mult": args.hot_mult,
            "partial_frac": args.partial_frac,
            "branch": bool(args.branch),
        }
        if args.check:
            expected = duckdb_expected_keys(wal)
            out["expected_final_rows"] = int(expected)
            out["check_ok"] = bool(expected == final_rows)
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
