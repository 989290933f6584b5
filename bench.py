"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion via a count() action (forces the full
plan without driver-side materialization of result sets).
"""

from __future__ import annotations

import json
import os
import sys
import time

from data_warehouse_migrate_spark.queries import QUERIES
from data_warehouse_migrate_spark.session import get_spark

HEADLINE = [
    "migrate_pipeline",
    "cast_source_schema",
    "pricing_summary",
    "top_customers",
    "events_hourly",
    "sessionize",
    "asof_order_price",
    "range_join_clicks",
    "shipping_priority",
    "value_percentiles",
    "revenue_rollup",
    "event_type_pivot",
    "props_json_extract",
    "event_zscore",
    "text_stats",
    "lang_id",
    "doc_fingerprints",
    "simhash",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "dedup_simhash",
    "embedding_topk",
    "embedding_lsh_ann",
    "embedding_centroids",
    "multimodal_decode",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("dwms-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + file index + Python/Arrow workers so per-query times
    # measure the queries, not process spin-up
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    import pandas as pd  # noqa: F401
    (spark.range(64).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
     .mapInPandas(lambda it: it, "id long").count())

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        # best of 2: this host shows rare multi-second stalls (CPU steal)
        # that would otherwise poison a single-shot measurement
        best = None
        for _ in range(2):
            spark.catalog.clearCache()  # no cross-query cache pollution
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
        times[name] = round(best, 3)
        print(f"  {name}: {times[name]}s", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
