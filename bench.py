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

from data_warehouse_migrate_spark.queries import DIAGNOSTICS, ORACLES, QUERIES
from data_warehouse_migrate_spark.session import get_spark

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# Brute-force all-pairs oracles exist to pin correctness, not to be a
# performance baseline — quadratic by construction, excluded from the
# DuckDB baseline measurement below (exclusion is disclosed in the output).
BASELINE_EXCLUDE = {"dedup_ngram_jaccard", "dedup_simhash"}


def reference_loop_migrate_sec(sf_dir: str) -> float:
    """Single-node throughput of the REFERENCE's architecture on its own
    workload: a strictly sequential 10,000-rows/batch loop (reference
    ``migrator.py:297``, default batch size ``migrator.py:126``) running
    the flagship pipeline's transforms in pandas — the binding baseline
    for BASELINE.md's "matches-or-beats its single-node throughput at the
    same data scale" (the reference publishes no numbers of its own).
    Read + transform only, matching what the Spark side's count() times.
    """
    import pyarrow.parquet as pq

    t0 = time.perf_counter()
    pf = pq.ParquetFile(f"{sf_dir}/orders.parquet")
    n = 0
    for batch in pf.iter_batches(batch_size=10_000):
        pdf = batch.to_pandas()
        # the flagship migrate_pipeline's mapping, reference-style:
        # exclude -> rename -> computed (concat + printf format) -> order
        pdf = pdf.drop(columns=["o_orderpriority"])
        pdf = pdf.rename(columns={"o_totalprice": "total_price"})
        pdf["status_tag"] = "S-" + pdf["o_orderstatus"].astype(str)
        pdf["key_fmt"] = pdf["o_orderkey"].map(lambda k: f"{k:08d}")
        front = ["o_orderkey", "total_price", "status_tag"]
        pdf = pdf[front + [c for c in pdf.columns if c not in front]]
        n += len(pdf)
    assert n > 0
    return time.perf_counter() - t0

def build_scaled_orders(sf_dir: str, factor: int) -> str:
    """Union-scale orders.parquet ``factor``× (shifted keys) into /tmp —
    the input for the scale-crossover measurement. Single parquet file so
    the reference loop reads it exactly like the originals; cached across
    bench runs. sf0.1 × 10 ≈ 1.5M orders — TPC-H sf1 size."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    out_dir = f"/tmp/dwms_scale_{tag}_x{factor}"
    path = f"{out_dir}/orders.parquet"
    if not os.path.exists(path):
        os.makedirs(out_dir, exist_ok=True)
        t = pq.read_table(f"{sf_dir}/orders.parquet")
        ki = t.schema.get_field_index("o_orderkey")
        copies = [
            t.set_column(ki, "o_orderkey",
                         pc.add(t.column("o_orderkey"), 100_000_000 * i))
            for i in range(factor)
        ]
        pq.write_table(pa.concat_tables(copies), path)
    return out_dir


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

    # Volume counters for the dedup/LSH family (AFTER all timing — the
    # eager counts inside the diag path persist intermediates and would
    # otherwise pollute the measurements). A future timing drift is then
    # attributable from artifacts alone: counters moved → data/plan
    # regression; counters identical, time moved → host noise.
    diagnostics: dict[str, dict] = {}
    for name, fn in DIAGNOSTICS.items():
        spark.catalog.clearCache()
        diagnostics[name] = fn(spark, sf_dir)
        print(f"  diag {name}: {diagnostics[name]}", file=sys.stderr)

    # Scale crossover: Spark's fixed per-query scheduling floor dominates
    # the flagship at sub-second scale (ratio > 1 vs the sequential pandas
    # loop); the loop scales linearly with rows and Spark doesn't. Measure
    # BOTH engines on a factor-x union of orders to demonstrate the flip.
    factor = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
    scale_dir = build_scaled_orders(sf_dir, factor)
    spark_scaled = None
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES["migrate_pipeline"](spark, scale_dir).count()
        el = time.perf_counter() - t0
        spark_scaled = el if spark_scaled is None else min(spark_scaled, el)
    ref_scaled = min(reference_loop_migrate_sec(scale_dir),
                     reference_loop_migrate_sec(scale_dir))
    print(f"  scale x{factor}: spark {spark_scaled:.3f}s vs reference loop "
          f"{ref_scaled:.3f}s", file=sys.stderr)

    # Single-node baseline: DuckDB running the SAME queries' oracle SQL on
    # the same parquet at the same scale factor (the reference publishes no
    # numbers — BASELINE.md — so this reference-equivalent engine is the
    # mechanically-checkable side of the "within 2x of baseline" bound).
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    base: dict[str, float] = {}
    for name in HEADLINE:
        if name in BASELINE_EXCLUDE or name not in ORACLES:
            continue
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(ORACLES[name]).fetchall()
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
        base[name] = round(best, 3)
    baseline_total = round(sum(base.values()), 3)
    comparable_spark = round(sum(times[n] for n in base), 3)

    # the binding baseline: the reference's own single-threaded batch-loop
    # architecture running the flagship pipeline at this scale factor
    ref_loop = round(min(reference_loop_migrate_sec(sf_dir),
                         reference_loop_migrate_sec(sf_dir)), 3)

    import pyspark

    print(json.dumps({
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "pyspark_version": pyspark.__version__,
        "diagnostics": diagnostics,
        "scale_crossover": {
            "workload": "flagship migrate_pipeline vs the reference's "
                        "sequential 10k-rows/batch pandas loop, both on "
                        f"orders scaled {factor}x (single parquet file)",
            "factor": factor,
            "spark_sec": round(spark_scaled, 3),
            "reference_loop_sec": round(ref_scaled, 3),
            "ratio_spark_vs_reference": (round(spark_scaled / ref_scaled, 3)
                                         if ref_scaled else None),
        },
        "baseline": {
            "reference_single_node": {
                "workload": "flagship migrate_pipeline, sequential "
                            "10k-rows/batch pandas loop (reference "
                            "migrator.py:297 architecture)",
                "value": ref_loop,
                "spark_sec": times.get("migrate_pipeline"),
                "ratio_spark_vs_reference": (
                    round(times["migrate_pipeline"] / ref_loop, 3)
                    if ref_loop and "migrate_pipeline" in times else None),
            },
            "duckdb_single_node": {
                "engine": "duckdb (oracle SQL, same parquet, same sf); "
                          "informational — Spark's fixed per-query "
                          "scheduling floor (~0.2-0.3s) dominates at "
                          "sub-GB scale and amortizes away at the "
                          "100 TB design point",
                "value": baseline_total,
                "queries": base,
                "excluded_bruteforce_oracles": sorted(BASELINE_EXCLUDE),
                "no_oracle": sorted(n for n in HEADLINE if n not in ORACLES),
                "comparable_spark_sec": comparable_spark,
                "ratio_spark_vs_duckdb": (
                    round(comparable_spark / baseline_total, 3)
                    if baseline_total else None),
            },
        },
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
