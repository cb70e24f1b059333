"""Read-side cost of column-fold resolution (partial-update tables)
vs the row-LWW window path, pre- and post-compaction.

Two tables are built from the SAME generator recipe and event volume —
one all-full-row (row-LWW read: window row_number over the key), one
with a partial_frac slice of sparse after-images (column-fold read:
one sort-aggregate of per-column (lsn, value) struct maxima). Both are
applied in the same number of batches so the delta chains have the
same generation depth, then read end-to-end through a full-width
checksum (xxhash64 over every payload column — defeats column pruning
so the fold's per-column winners are all computed), pre-compaction and
again post-compaction.

One JSON line:
  {"row": {"pre": [...], "post": [...]}, "fold": {...},
   "events": N, "final_rows": {...}, ...}

Run at local[8] on this sandbox (sustained local[32] is burst-quota
throttled — BENCH/BASELINE.md); table + spark.local.dir on /dev/shm.
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


def build_table(spark, wal: str, root: str, n_buckets: int, n_batches: int):
    from pyspark.sql import functions as F

    from audience_behavior_semantic_etl_spark.cdc.apply import ApplyConfig, apply_batch
    from audience_behavior_semantic_etl_spark.cdc.table import SnapshotTable

    table = SnapshotTable.create(spark, root, n_buckets=n_buckets)
    cfg = ApplyConfig(auto_compact=False)
    env = spark.read.parquet(wal)
    # deterministic lsn-range slices -> n_batches generations of deltas
    bounds = (
        env.select(
            F.percentile_approx("lsn", [i / n_batches for i in range(1, n_batches)], 10_000)
        ).collect()[0][0]
        or []
    )
    lo = None
    for i, hi in enumerate(list(bounds) + [None]):
        sl = env
        if lo is not None:
            sl = sl.filter(F.col("lsn") > lo)
        if hi is not None:
            sl = sl.filter(F.col("lsn") <= hi)
        apply_batch(sl, table, i, cfg)
        lo = hi
    return table


def checksum_secs(table, passes: int) -> tuple[list[float], int]:
    """Full-width read: xxhash64 over every data column of the resolved
    final state, summed. Defeats column pruning AND any lazy winner
    elimination; returns per-pass wall seconds + the row count."""
    from pyspark.sql import functions as F

    out = []
    n = -1
    for _ in range(passes):
        t0 = time.perf_counter()
        df = table.read_final()
        cols = [F.col(c) for c in df.columns]
        row = df.select(
            # bit_xor, not sum: summing 1.6M xxhash64 values overflows
            # long under ANSI mode
            F.bit_xor(F.xxhash64(*cols)).alias("c"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        out.append(round(time.perf_counter() - t0, 3))
        n = row["n"]
    return out, int(n)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--convs", type=int, default=60_000)
    ap.add_argument("--partial-frac", type=float, default=0.3)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--n-batches", type=int, default=8)
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    from BENCH.replay_bench import ensure_wal
    from audience_behavior_semantic_etl_spark.session import get_spark

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{max(6, (args.cpus * 3) // 4)}g")
    spark = get_spark(
        app_name=f"fold-read-bench-{args.cpus}",
        cpus=args.cpus,
        shuffle_partitions=args.cpus,
        extra_conf={"spark.local.dir": os.path.join(shm, "spark-local")},
    )
    work = tempfile.mkdtemp(prefix="fold-read-", dir=shm)
    out = {
        "cpus": args.cpus,
        "convs": args.convs,
        "partial_frac": args.partial_frac,
        "n_batches": args.n_batches,
        "passes": args.passes,
    }
    try:
        for name, pf in (("row", 0.0), ("fold", args.partial_frac)):
            wal, n_events = ensure_wal(spark, 7, args.convs, 40, pf)
            out[f"events_{name}"] = int(n_events)
            t = build_table(spark, wal, f"{work}/{name}", args.n_buckets, args.n_batches)
            assert bool(t.manifest().properties.get("has_partial")) == (pf > 0)
            os.system("sync")
            pre, n_pre = checksum_secs(t, args.passes)
            t.compact_buckets(list(range(args.n_buckets)))
            post, n_post = checksum_secs(t, args.passes)
            assert n_pre == n_post, "compaction changed the final state"
            out[name] = {"pre": pre, "post": post, "final_rows": n_pre}
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
