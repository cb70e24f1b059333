"""Benchmark harness (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is forced end-to-end with the no-op sink (full computation,
no driver collect). Value = total wall seconds across queries.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from audience_behavior_semantic_etl_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench", cpus=cpus, shuffle_partitions=cpus)
    qs = entrymod.queries()

    # Warmup pass (untimed): JIT-compile the interpreted HOF paths and
    # codegen classes, spawn Python workers, read parquet footers.
    # Cold-vs-warm for HOF-heavy queries is >10x (measured 114s -> 4s);
    # steady-state is the number that predicts cluster throughput.
    warmup = os.environ.get("SPARK_GRAFT_WARMUP", "1") == "1"
    if warmup:
        for name, fn in qs.items():
            # CDC and streaming queries build real tables / drain real
            # streams — their cost is dominated by that work, not by
            # codegen/JIT, and the rest of the warmup pass already warms
            # the JVM, Python workers, and parquet readers they share.
            # Running them twice would double ~half the bench wall time
            # for no steadier number.
            if name.startswith(("q_cdc_", "q_stream_")):
                continue
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    timings: dict[str, float] = {}
    stream_split: dict[str, dict] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()  # drop per-query persists (e.g. jaccard)
        # Streaming queries: split per-batch ENGINE time (recentProgress
        # durationMs) from harness overhead (availableNow trigger floors,
        # source staging, sink re-read) so wall-time noise on a shared
        # host can't mask a real engine regression.
        prog = getattr(entrymod, "STREAM_PROGRESS", {}).get(name)
        if prog:
            trig_ms = sum(p.get("durationMs", {}).get("triggerExecution", 0) for p in prog)
            add_ms = sum(p.get("durationMs", {}).get("addBatch", 0) for p in prog)
            stream_split[name] = {
                "engine_sec": round(trig_ms / 1000.0, 3),
                "add_batch_sec": round(add_ms / 1000.0, 3),
                "harness_sec": round(max(timings[name] - trig_ms / 1000.0, 0.0), 3),
                "n_batches": len(prog),
            }

    sf = sf_dir.rstrip("/").split("sf")[-1]
    out = {
        "metric": "total_query_wall_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "stream_split": stream_split,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
    }
    print(json.dumps(out))
    # The 90-query detail line can outgrow the driver's tail capture
    # (BENCH_r04 arrived with parsed:null). Persist the detail to a file
    # and ALWAYS end stdout with a compact one-line summary the driver
    # can parse regardless of how much tail it keeps.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH", "last_bench_detail.json"), "w") as f:
            json.dump(out, f)
    except OSError:
        pass
    compact = {
        "metric": "total_query_wall_time",
        "value": out["value"],
        "unit": "sec",
        "sf": out["sf"],
        "cpus": cpus,
        "n_queries": len(timings),
        "detail": "BENCH/last_bench_detail.json",
    }
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
