"""SparkSession factory.

Defaults are chosen for the dual target: correctness tests on
``local[N]`` and honest behavior at cluster scale. Everything that
matters at 100 TB — AQE (skew-join splitting, partition coalescing),
Arrow transfer for pandas UDFs, UTC session time — is on by default so
test plans and cluster plans share a shape.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from audience_behavior_semantic_etl_spark.scratch import scratch_root

# Shuffle partitions ~= cores in local mode. On a real cluster this is
# overridden by AQE's coalescing from a higher initial value.
_DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "audience_behavior_semantic_etl_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` sets ``local[N]`` parallelism; shuffle partitions default to
    the same N so a local run has no idle/empty shuffle tasks. On a real
    cluster, pass ``extra_conf`` / spark-submit conf instead — nothing
    here hard-codes local mode semantics.
    """
    n = cpus or _DEFAULT_CPUS
    sp = shuffle_partitions or n
    b = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # NOT bigger-is-better: a 48g shared heap at local[32] spent
        # >25% of task run time in G1 GC on payload-heavy batches
        # (BENCH/BASELINE.md); 24g behaves well at every level tested.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Parquet codec for everything the engine writes (spool, delta
        # files, compaction, cubes). zstd over the snappy default:
        # same-session A/B on the apply write stage (13M-event batch,
        # local[32], best-of-4 warm passes) measured zstd at or below
        # snappy's write time with ~31% smaller files (519 vs 756 MB)
        # — and smaller deltas are compounding for merge-on-read: the
        # read-side LWW re-scans live deltas on every query, compaction
        # re-reads them once more, and on a real cluster they cross the
        # network. Overridable via extra_conf / spark-submit --conf.
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    # Shuffle/spill scratch on the fastest writable medium (guide §6;
    # same policy the BENCH scripts already apply): tmpfs locally, or
    # $SPARK_GRAFT_LOCAL_DIR — a cluster points this at instance-local
    # NVMe exactly as it would set spark.local.dir. The single ext4
    # disk here throttles concurrent shuffle writers via dirty-page
    # writeback (BENCH/BASELINE.md), so this is measured I/O placement,
    # not a local-only trick.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR") or scratch_root()
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
