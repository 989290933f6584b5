"""Dimension reconciliation during a warehouse cutover: two systems'
customer tables land side by side with drifted business keys — case,
punctuation, zero-padding, and genuine typos. Resolve them with the
entity toolkit, then fold the reconciled snapshot into an SCD2 history.

Pipeline (each step a separate engine operator):
  1. ``normalize_keys``  — kill case/punct/zero-pad drift for free.
  2. ``fuzzy_join`` d=1  — match residual one-edit typos (the cheap,
     default path; d=2 is an explicit opt-in whose |s|^2/2 variant cost
     is documented on the parameter).
  3. ``entity_clusters`` — transitive master-record assignment when
     MORE than two systems collide.
  4. ``scd2_apply``      — version the reconciled attributes.

Run: python examples/entity_resolution_example.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_warehouse_migrate_spark.operators.delta import scd2_apply
from data_warehouse_migrate_spark.operators.entity import (
    entity_clusters,
    fuzzy_join,
    normalize_keys,
)
from data_warehouse_migrate_spark.session import get_spark


def main() -> None:
    spark = get_spark("entity-resolution-example", master="local[4]")

    # system A: canonical dimension; system B: the same customers after
    # years of drift in another warehouse
    a = spark.createDataFrame(
        [(1, "Cust-0042", "gold"), (2, "Cust-0007", "silver"),
         (3, "Cust-0913", "bronze")],
        "a_id int, a_key string, tier string")
    b = spark.createDataFrame(
        [(101, "cust 42", 812.5),      # case + punctuation + pad drift
         (102, "CUST#7!", 99.0),       # same, uglier
         (103, "cusst 913", 410.0)],   # drift PLUS a genuine typo
        "b_id int, b_key string, balance double")

    # 1) normalize both sides, 2) fuzzy-match the residual typos
    an = normalize_keys(a, "a_key", "a_norm")
    bn = normalize_keys(b, "b_key", "b_norm")
    matched = fuzzy_join(an, bn, "a_norm", "b_norm")  # d=1 default
    print("--- reconciled pairs (normalize + d=1 fuzzy) ---")
    matched.select("a_id", "a_key", "b_id", "b_key",
                   "edit_distance").show()

    # 3) master-record clustering across ALL records of both systems
    union = (an.select(F.col("a_id").alias("rec_id"),
                       F.col("a_norm").alias("key"))
             .unionByName(bn.select(F.col("b_id").alias("rec_id"),
                                    F.col("b_norm").alias("key"))))
    print("--- transitive entity clusters ---")
    entity_clusters(union, "rec_id", "key").orderBy("cluster_id",
                                                    "rec_id").show()

    # 4) fold the reconciled snapshot into SCD2 history: tier is the
    # tracked attribute, balance rides along untracked (carried onto new
    # versions, never compared)
    history = (a.select(F.col("a_id").alias("cust_id"), "tier")
               .withColumn("balance", F.lit(0.0))
               .withColumn("valid_from", F.lit("2025-01-01").cast("date"))
               .withColumn("valid_to", F.lit(None).cast("date"))
               .withColumn("is_current", F.lit(True)))
    updates = (matched.select(F.col("a_id").alias("cust_id"),
                              F.when(F.col("balance") >= 400, "platinum")
                              .otherwise(F.col("tier")).alias("tier"),
                              "balance"))
    print("--- SCD2 history after the reconciliation batch ---")
    scd2_apply(history, updates, ["cust_id"], ["tier"],
               "2026-08-15").orderBy("cust_id", "valid_from").show()
    spark.stop()


if __name__ == "__main__":
    main()
