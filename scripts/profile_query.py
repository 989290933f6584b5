"""Per-job wall-clock breakdown of one registry query.

Usage: python scripts/profile_query.py <query> [sf_dir] [--draws N]

Runs the query once untimed (codegen/worker warm-up, the bench protocol),
then N timed draws; after the last draw prints every Spark job the draw
submitted with its duration, description and stage count, via the UI REST
API. This is the measurement harness for the optimization rounds: the
per-job table shows where a query's serial scheduling floor comes from
(eager materializations, sizing aggregates, iteration rounds), which the
single headline number hides.
"""
import json
import os
import sys
import time
import urllib.request

from data_warehouse_migrate_spark.queries import QUERIES
from data_warehouse_migrate_spark.session import get_spark


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") \
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    draws = int(sys.argv[sys.argv.index("--draws") + 1]) if "--draws" in sys.argv else 2
    spark = get_spark("dwms-profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    # generic warm-up mirroring bench.py
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    (spark.range(64).repartition(sc.defaultParallelism)
     .mapInPandas(lambda it: it, "id long").count())

    spark.catalog.clearCache()
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).count()
    print(f"warm-up draw: {time.perf_counter() - t0:.3f}s")

    times = []
    for i in range(draws):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        times.append(time.perf_counter() - t0)
    print(f"timed draws: {[round(t, 3) for t in times]}  best={min(times):.3f}")

    base = sc.uiWebUrl + "/api/v1/applications/" + sc.applicationId
    jobs = rest(base, "/jobs?status=succeeded")
    jobs = sorted(jobs, key=lambda j: j["jobId"])
    # jobs of the LAST timed draw: take jobs submitted after its t0 by
    # timestamp — simpler: take the trailing block whose summed time ~ last
    # draw. We report the last K jobs where K is found by matching
    # submissionTime >= wall-clock t0 of the last draw.
    import datetime as dt
    cut = dt.datetime.now(dt.timezone.utc) - dt.timedelta(seconds=times[-1] + 0.5)
    last = []
    for j in jobs:
        st = j.get("submissionTime")
        if not st:
            continue
        ts = dt.datetime.strptime(st.replace("GMT", "+0000"),
                                  "%Y-%m-%dT%H:%M:%S.%f%z")
        if ts >= cut:
            last.append(j)
    total = 0.0
    print(f"\n-- jobs of final draw ({len(last)}) --")
    for j in last:
        st = dt.datetime.strptime(j["submissionTime"].replace("GMT", "+0000"),
                                  "%Y-%m-%dT%H:%M:%S.%f%z")
        ct = dt.datetime.strptime(j["completionTime"].replace("GMT", "+0000"),
                                  "%Y-%m-%dT%H:%M:%S.%f%z")
        dur = (ct - st).total_seconds()
        total += dur
        desc = (j.get("description") or j.get("name") or "")[:90]
        print(f"  job {j['jobId']:>4}  {dur:7.3f}s  stages={len(j['stageIds']):>2}  "
              f"tasks={j['numTasks']:>4}  {desc}")
    print(f"  sum of job durations: {total:.3f}s (gaps = driver time)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
