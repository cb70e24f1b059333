"""Per-Spark-job attribution for the CDC/stream contract queries
(guide §1.5: label + measure before touching anything).

Runs each named query exactly as bench.py does (noop sink, cleared
cache), with the Spark UI enabled, then dumps every job's callsite
name + wall duration from the /api/v1 jobs endpoint — so the floor of
a 5 s CDC query is attributed line-by-line (stats collect vs delta
write vs read_final count vs streaming drain) instead of guessed.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
       python BENCH/cdc_job_probe.py q_cdc_branch q_cdc_maintenance
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ui_port = int(os.environ.get("PROBE_UI_PORT", "4055"))

    from audience_behavior_semantic_etl_spark.session import get_spark
    import __spark_entry__ as em

    spark = get_spark(
        app_name="cdc_job_probe",
        cpus=cpus,
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(ui_port),
            "spark.ui.retainedJobs": "5000",
        },
    )
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:{ui_port}/api/v1/applications/{app_id}"

    def jobs() -> list[dict]:
        with urllib.request.urlopen(f"{base}/jobs?status=succeeded") as r:
            return json.loads(r.read())

    qs = em.queries()
    names = sys.argv[1:] or [n for n in qs if n.startswith(("q_cdc_", "q_stream_"))]
    out = {}
    for n in names:
        before_ids = {j["jobId"] for j in jobs()} if out or True else set()
        t0 = time.perf_counter()
        qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        time.sleep(0.3)
        new = [j for j in jobs() if j["jobId"] not in before_ids]
        rows = []
        tot = 0.0
        for j in sorted(new, key=lambda j: j["jobId"]):
            try:
                st = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                et = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                frac = (float(j["submissionTime"][20:23]) / 1000.0,
                        float(j["completionTime"][20:23]) / 1000.0)
                dur = (time.mktime(et) + frac[1]) - (time.mktime(st) + frac[0])
            except Exception:
                dur = -1
            tot += max(dur, 0)
            rows.append({"id": j["jobId"], "name": j["name"][:90],
                         "sec": round(dur, 3), "tasks": j["numTasks"]})
        out[n] = {"wall": wall, "job_total": round(tot, 3), "n_jobs": len(rows),
                  "jobs": rows}
        print(json.dumps({n: {"wall": wall, "job_total": out[n]["job_total"],
                              "n_jobs": len(rows)}}), flush=True)
    with open("BENCH/cdc_job_probe_out.json", "w") as f:
        json.dump({"sf_dir": sf_dir, "cpus": cpus, "results": out}, f, indent=1)
    print("detail -> BENCH/cdc_job_probe_out.json")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
