"""Extra benchmarks for the optimization round (bench.py is FROZEN).

Isolates individual declared queries with the noop sink (guide §1.4),
optionally repeats them, and dumps .explain("formatted") plans to
plans/r06/. Never used by the driver — evidence generator only.

Usage:
  python bench_extra.py q_corpus_curation q_quality_gates          # time
  python bench_extra.py --explain before q_corpus_curation         # plan dump
  SPARK_GRAFT_SF_DIR=/dev/shm/sf1x python bench_extra.py ...       # other SF
  python bench_extra.py --repeat 3 q_span_dedup                    # best-of-N
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: all)")
    ap.add_argument("--explain", metavar="TAG", default=None,
                    help="dump explain('formatted') to plans/r06/<q>_<TAG>.txt")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from audience_behavior_semantic_etl_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench_extra", cpus=cpus, shuffle_partitions=cpus)
    qs = entrymod.queries()
    names = args.queries or list(qs)
    for n in names:
        if n not in qs:
            print(f"unknown query: {n}", file=sys.stderr)
            return 2

    if args.explain:
        os.makedirs("plans/r06", exist_ok=True)
        for n in names:
            df = qs[n](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = f"plans/r06/{n}_{args.explain}.txt"
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({len(plan)} bytes)")
            spark.catalog.clearCache()
        spark.stop()
        return 0

    # warmup: same policy as bench.py (skip cdc/stream side-effect queries)
    if not args.no_warmup:
        for n in names:
            if n.startswith(("q_cdc_", "q_stream_")):
                continue
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()

    out = {}
    for n in names:
        samples = []
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(f"bench_extra:{n}")
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[n] = {"min": min(samples), "samples": samples}
        print(json.dumps({n: out[n]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "results": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
