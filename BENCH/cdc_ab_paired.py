"""Paired in-session A/B of the apply_batch spool policy: each query
runs ABBA/BAAB-alternated asis/spool passes in ONE session (host drift
hits both arms AND neither arm always runs first — fixed-order pairs
measured a ~1 s bias toward the second arm on this host), min-of-N per
arm reported.

Usage: SPARK_GRAFT_SF_DIR=... python BENCH/cdc_ab_paired.py N q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pairs = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from audience_behavior_semantic_etl_spark.session import get_spark
    from audience_behavior_semantic_etl_spark.cdc import apply as A
    import __spark_entry__ as em

    real = A._needs_spool
    spark = get_spark(app_name="cdc_ab_paired", cpus=cpus, shuffle_partitions=cpus)
    qs = em.queries()
    qs["q_cdc_lww_apply"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out = {}
    for n in names:
        t = {"asis": [], "spool": []}
        for p in range(pairs):
            order = ("asis", "spool") if p % 2 == 0 else ("spool", "asis")
            for mode in order:
                A._needs_spool = real if mode == "asis" else (lambda df: True)
                t0 = time.perf_counter()
                qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
                t[mode].append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
        out[n] = {m: {"min": min(v), "all": v} for m, v in t.items()}
        print(json.dumps({n: out[n]}), flush=True)
    A._needs_spool = real
    with open("/tmp/cdc_ab_paired.json", "w") as f:
        json.dump({"sf_dir": sf_dir, "out": out}, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
