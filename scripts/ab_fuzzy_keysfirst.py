"""Interleaved A/B: r9 keys-first fuzzy_join vs the r8 full-row-distinct
shape, at sf0.1, d=1 and d=2, with shuffle-write byte deltas per run.

Protocol per the repo bench convention: single-shot timings on this host
flip sign — only interleaved best-of-N decides a plan change. The old
shape is reconstructed inline (it no longer exists in the package).
Run: PYTHONPATH=/root/repo python scripts/ab_fuzzy_keysfirst.py
"""
import json
import time
import urllib.request

from pyspark.sql import functions as F

from data_warehouse_migrate_spark.session import get_spark
from data_warehouse_migrate_spark.operators.entity import (
    _deletion_variants,
    _deletion_variants2,
    fuzzy_join,
)

SF_DIR = "/root/testdata/sf0.1"


def old_fuzzy_join(left, right, left_key, right_key, max_distance=1):
    """The r8 shape: full payload rows through explode + variant join +
    full-row distinct (with the _spread repartition it used)."""
    variants = (_deletion_variants if max_distance == 1
                else _deletion_variants2)

    def spread(df):
        target = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            return df.repartition(target)
        return df

    lv = spread(left).withColumn("__vh", F.explode(variants(F.col(left_key))))
    rv = spread(right).withColumn("__vh", F.explode(variants(F.col(right_key))))
    cand = lv.join(rv, "__vh").drop("__vh").distinct()
    return (cand.withColumn("edit_distance",
                            F.levenshtein(F.col(left_key), F.col(right_key)))
            .filter(F.col("edit_distance") <= max_distance))


def shuffle_write_bytes(spark):
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:4040/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def dirty_clean(spark, mod):
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    k = F.col("c_custkey")
    p1 = (k % 5 + 10).cast("int")
    n1 = F.concat(F.col("c_name").substr(F.lit(1), p1 - 1),
                  F.col("c_name").substr(p1 + 1, F.length("c_name")))
    if mod == 3:   # d=1 workload (fuzzy_match_customers shape)
        name = n1
    else:          # d=2 workload (fuzzy_match_d2 shape)
        p2 = (k % 3 + 11).cast("int")
        name = F.concat(n1.substr(F.lit(1), p2 - 1),
                        n1.substr(p2 + 1, F.length(n1)))
    dirty = (c.filter(k % mod == 0)
             .select((k + 5000000).alias("dirty_id"), name.alias("dirty_name")))
    clean = c.select("c_custkey", "c_name")
    return dirty, clean


def main():
    spark = get_spark("ab-fuzzy", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/customer.parquet").count()  # warm

    results = {}
    for label, mod, d in (("d1", 3, 1), ("d2", 7, 2)):
        dirty, clean = dirty_clean(spark, mod)
        # warm-up both shapes once (codegen compile out of the draws)
        for fn in (fuzzy_join, old_fuzzy_join):
            fn(dirty, clean, "dirty_name", "c_name", d).count()
        runs = {"new": [], "old": []}
        bytes_ = {"new": [], "old": []}   # per-run deltas, all 3 kept
        rows = {}
        for i in range(3):
            for tag, fn in (("new", fuzzy_join), ("old", old_fuzzy_join)):
                spark.catalog.clearCache()
                b0 = shuffle_write_bytes(spark)
                t0 = time.perf_counter()
                n = fn(dirty, clean, "dirty_name", "c_name", d).count()
                runs[tag].append(round(time.perf_counter() - t0, 3))
                bytes_[tag].append(shuffle_write_bytes(spark) - b0)
                rows[tag] = n
        # multiplicity contract guard: these inputs are duplicate-free,
        # so keys-first and full-row-distinct MUST agree exactly (the
        # shapes differ only on duplicate rows — a count mismatch here
        # is a correctness regression, not a perf delta)
        assert rows["new"] == rows["old"], (
            f"{label}: shape row counts diverged "
            f"new={rows['new']} old={rows['old']}")
        results[label] = {
            "rows": rows["new"],
            "new_runs": runs["new"], "old_runs": runs["old"],
            "new_best": min(runs["new"]), "old_best": min(runs["old"]),
            "new_shuffle_bytes_runs": bytes_["new"],
            "old_shuffle_bytes_runs": bytes_["old"],
            "new_shuffle_bytes_min": min(bytes_["new"]),
            "old_shuffle_bytes_min": min(bytes_["old"]),
        }
        print(label, json.dumps(results[label]))
    print("SUMMARY", json.dumps(results))


if __name__ == "__main__":
    main()
