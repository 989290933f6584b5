"""Per-query A/B of the r17 global join/coalesce configs on the two
flagged headline joins (r17 verdict item 2 / r18 item 2).

range_join_clicks (raw 0.32x) and shipping_priority (raw 0.54x) both
appeared in BENCH_DETAIL.counters_changed after r17 turned on
``spark.sql.join.preferSortMergeJoin=false`` and
``spark.sql.adaptive.coalescePartitions.parallelismFirst=false``
session-wide — i.e. those two globals DID change their physical plans,
and the r17 regression table cannot distinguish host noise from a real
plan loss (the DuckDB control covers range_join_clicks 4.3x but
shipping_priority only 1.3x). This script times exactly those queries
under all four config combinations, INTERLEAVED round-robin so every
variant shares every host window, and prints per-variant best/median
plus the physical join operators from the executed plan.

Each variant runs in its OWN SparkSession (config is session-wide;
stop+rebuild between variants would serialize windows) — instead the
script launches one subprocess per (variant, round) cell so draws
interleave across variants. Output: one JSON line per cell on stdout of
the child; the parent aggregates.

Usage: python scripts/ab_join_configs.py [--rounds 4]
       child mode: python scripts/ab_join_configs.py --child VARIANT QUERY
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES_UNDER_TEST = ["range_join_clicks", "shipping_priority"]

# variant -> (preferSortMergeJoin, parallelismFirst)
VARIANTS = {
    "r17_both": ("false", "false"),   # current session defaults
    "smj_only": ("true", "false"),    # revert the join flip only
    "par_only": ("false", "true"),    # revert the coalesce flip only
    "r16_none": ("true", "true"),     # pre-r17 defaults
}


def child(variant: str, draws: int) -> None:
    from data_warehouse_migrate_spark.queries import QUERIES
    from data_warehouse_migrate_spark.session import get_spark

    smj, pf = VARIANTS[variant]
    spark = get_spark(f"ab-join-{variant}", extra_conf={
        "spark.sql.join.preferSortMergeJoin": smj,
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": pf,
    })
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # generic warm-up (bench protocol: JVM + arrow workers + file index)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    out = []
    for query in QUERIES_UNDER_TEST:
        QUERIES[query](spark, sf_dir).count()  # codegen warm-up, untimed
        times = []
        for _ in range(draws):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            QUERIES[query](spark, sf_dir).count()
            times.append(round(time.perf_counter() - t0, 3))
        # physical join strategy actually executed (AQE final plan)
        df = QUERIES[query](spark, sf_dir)
        df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        joins = sorted({op for op in (
            "BroadcastHashJoin", "ShuffledHashJoin", "SortMergeJoin",
            "BroadcastNestedLoopJoin") if op in plan})
        out.append({"variant": variant, "query": query, "draws": times,
                    "joins": joins})
    print(json.dumps(out))
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--draws", type=int, default=2)
    ap.add_argument("--child", metavar="VARIANT")
    args = ap.parse_args()
    if args.child:
        child(args.child, args.draws)
        return 0

    results: dict[str, dict[str, list[float]]] = {
        q: {v: [] for v in VARIANTS} for q in QUERIES_UNDER_TEST}
    joins: dict[str, dict[str, list[str]]] = {
        q: {} for q in QUERIES_UNDER_TEST}
    t0 = time.time()
    for rnd in range(args.rounds):
        # round-robin over variants so every variant sees every window
        for variant in VARIANTS:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--child", variant, "--draws", str(args.draws)],
                capture_output=True, text=True, check=True)
            line = out.stdout.strip().splitlines()[-1]
            for rec in json.loads(line):
                query = rec["query"]
                results[query][variant].extend(rec["draws"])
                joins[query][variant] = rec["joins"]
                print(f"  round {rnd} {variant:9s} {query:20s} "
                      f"{rec['draws']} {rec['joins']}", file=sys.stderr)
    summary = {}
    for query in QUERIES_UNDER_TEST:
        summary[query] = {
            v: {"best": min(ts), "median": round(statistics.median(ts), 3),
                "draws": ts, "joins": joins[query].get(v, [])}
            for v, ts in results[query].items()}
    print(json.dumps({"elapsed_sec": round(time.time() - t0, 1),
                      "rounds": args.rounds, "summary": summary}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
