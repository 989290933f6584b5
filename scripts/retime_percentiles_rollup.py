"""Interleaved re-time of value_percentiles + revenue_rollup (r9 verdict
item 1): the only two r8->r9 headline movers beyond the uniform drift
band, both on code untouched since r8 — so there is no old-vs-new plan
to A/B; the question is host drift vs silent regression. Protocol per
the repo bench convention (single-shot timings flip sign on this host;
only interleaved best-of-N decides): interleave the two suspects with
two UNTOUCHED anchor queries from the same artifact whose r8->r9
movement was inside the drift band (event_type_pivot, pricing_summary),
5 rounds each, report min/median per query plus each query's ratio to
its r8 and r9 sealed numbers. If the suspects' ratios track the
anchors' ratios, the r9 movement was host drift; if the suspects moved
and the anchors did not, something real regressed.

Run: PYTHONPATH=/root/repo python scripts/retime_percentiles_rollup.py
"""
import json
import statistics
import time

from data_warehouse_migrate_spark.queries import QUERIES
from data_warehouse_migrate_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"

# sealed artifact numbers (BENCH_r08.json / BENCH_r09.json)
SEALED = {
    "value_percentiles": {"r8": 0.138, "r9": 0.491},
    "revenue_rollup": {"r8": 0.281, "r9": 0.610},
    "event_type_pivot": {"r8": 0.251, "r9": 0.290},
    "pricing_summary": {"r8": 0.339, "r9": 0.383},
}


def main():
    spark = get_spark("retime-vp-rr")
    spark.sparkContext.setLogLevel("ERROR")
    names = list(SEALED)
    # warm-up: one untimed run each (codegen compile out of the draws)
    for n in names:
        QUERIES[n](spark, SF_DIR).count()
    runs = {n: [] for n in names}
    for _ in range(5):
        for n in names:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            QUERIES[n](spark, SF_DIR).count()
            runs[n].append(round(time.perf_counter() - t0, 3))
    out = {}
    for n in names:
        mn, md = min(runs[n]), round(statistics.median(runs[n]), 3)
        out[n] = {
            "runs": runs[n], "min": mn, "median": md,
            "r8_sealed": SEALED[n]["r8"], "r9_sealed": SEALED[n]["r9"],
            "min_over_r8": round(mn / SEALED[n]["r8"], 2),
            "min_over_r9": round(mn / SEALED[n]["r9"], 2),
        }
        print(n, json.dumps(out[n]))
    print("SUMMARY", json.dumps(out))


if __name__ == "__main__":
    main()
