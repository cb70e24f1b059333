"""A/B the CDC/stream contract queries under an apply_batch policy
tweak (default: force-spool the batch-API path), bench.py-style timing
(noop sink, cleared cache), one mode per session.

Usage: SPARK_GRAFT_SF_DIR=... python BENCH/cdc_ab.py {asis|spool} [queries...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    mode = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from audience_behavior_semantic_etl_spark.session import get_spark
    from audience_behavior_semantic_etl_spark.cdc import apply as A
    import __spark_entry__ as em

    if mode == "spool":
        A._needs_spool = lambda df: True

    spark = get_spark(app_name=f"cdc_ab_{mode}", cpus=cpus, shuffle_partitions=cpus)
    qs = em.queries()
    names = sys.argv[2:] or [n for n in qs if n.startswith(("q_cdc_", "q_stream_"))]
    # one warm query to pay JVM/codegen start (mirrors bench.py's warmup
    # of the shared machinery), itself untimed
    em.queries()["q_cdc_lww_apply"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out = {}
    for n in names:
        t0 = time.perf_counter()
        qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[n] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        print(json.dumps({n: out[n]}), flush=True)
    out["__total"] = round(sum(out.values()), 3)
    with open(f"/tmp/cdc_ab_{mode}.json", "w") as f:
        json.dump({"sf_dir": sf_dir, "mode": mode, "t": out}, f, indent=1)
    print(json.dumps({"mode": mode, "total": out["__total"]}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
