"""Phase-level A/B of apply_batch on the batch (non-streaming) path:
does force-spooling the envelope beat re-executing the envelope plan in
the stats job + the repartitionByRange sampling pass + the write?

Round-6 question (guide §1/§2): on the direct batch API the envelope is
a parquet scan + projection chain (incl. to_json), which is executed
THREE times per apply (stats collect, range-partitioner sampling, the
delta write). The streaming path already spools; this probe measures
whether the batch path should too.

Usage: SPARK_GRAFT_SF_DIR=/dev/shm/sf1x python BENCH/apply_phase_probe.py
"""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import functions as F


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from audience_behavior_semantic_etl_spark.session import get_spark
    from audience_behavior_semantic_etl_spark.cdc import apply as A
    from audience_behavior_semantic_etl_spark.cdc.apply import ApplyConfig, apply_batch
    from audience_behavior_semantic_etl_spark.cdc.table import SnapshotTable
    from audience_behavior_semantic_etl_spark.scratch import scratch_dir

    spark = get_spark(app_name="apply_phase_probe", cpus=cpus, shuffle_partitions=cpus)
    import __spark_entry__ as em

    env = em._cdc_envelope_v1(spark, sf_dir)
    results = {}
    real_needs_spool = A._needs_spool
    for mode in ["as_is", "forced_spool", "as_is2", "forced_spool2"]:
        A._needs_spool = (
            (lambda df: True) if mode.startswith("forced") else real_needs_spool
        )
        tmp = scratch_dir(f"phase-probe-{mode}-")
        cfg = ApplyConfig(app_id=f"probe-{mode}", auto_compact=False, shuffle_partitions=8)
        table = SnapshotTable.create(spark, f"{tmp}/t", n_buckets=8)
        m0 = apply_batch(env.filter(F.pmod(F.col("lsn"), F.lit(5)) != 0), table, 0, cfg)
        m1 = apply_batch(env.filter(F.pmod(F.col("lsn"), F.lit(5)) == 0), table, 1, cfg)
        results[mode] = {
            "b0": {"secs": round(m0.seconds, 3), "phases": m0.phases},
            "b1": {"secs": round(m1.seconds, 3), "phases": m1.phases},
        }
    A._needs_spool = real_needs_spool
    print(json.dumps(results, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
