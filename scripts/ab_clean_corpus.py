"""Interleaved A/B: r16 clean_corpus shape (lang_id.isin filter +
groupBy/leftsemi drop_exact_dups) vs the r17 shape (bound-count
lang_keep + single-pass min_by dedup), one session, best-of-N.

The r17 hypothesis: at sf0.1 the query is dominated by DRIVER time
(analysis/optimization/codegen of the macro-expanded gate expression,
measured ~0.15s of executor jobs inside ~2s of wall), so halving the
gate-subtree count (min_by: one lineage pass instead of two) and
shrinking the lang predicate (~8 bound splits -> 1) should cut both the
driver cost and, at scale, one full corpus pass.

Usage: python scripts/ab_clean_corpus.py [sf_dir] [rounds]
"""
import sys
import time

from pyspark.sql import functions as F

from data_warehouse_migrate_spark.functions.text import (
    gopher_keep,
    lang_id,
    lang_keep,
    normalized_text,
)
from data_warehouse_migrate_spark.session import get_spark

GOPHER_KW = dict(min_words=5, min_avg_word_len=2.0, max_avg_word_len=12.0,
                 max_symbol_ratio=0.3, min_alpha_word_ratio=0.5,
                 min_stopword_hits=1)


def old_shape(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = d.filter(F.col("text").isNotNull())
    out = out.filter(lang_id(F.col("text")).isin("en"))
    out = out.filter(gopher_keep(F.col("text"), **GOPHER_KW))
    h = F.coalesce(F.md5(normalized_text(F.col("text"))),
                   F.lit("__null_text__"))
    w = out.withColumn("__h", h)
    keep = w.groupBy("__h").agg(F.min("doc_id").alias("doc_id"))
    out = w.join(keep, ["doc_id", "__h"], "leftsemi").drop("__h")
    return out.select("doc_id", "source", "lang")


def new_shape(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = d.filter(F.col("text").isNotNull())
    out = out.filter(lang_keep(F.col("text"), ("en",)))
    out = out.filter(gopher_keep(F.col("text"), **GOPHER_KW))
    h = F.coalesce(F.md5(normalized_text(F.col("text"))),
                   F.lit("__null_text__"))
    out = (out.groupBy(h.alias("__h"))
           .agg(F.min_by(F.struct(*out.columns), F.col("doc_id"))
                .alias("__r"))
           .select("__r.*"))
    return out.select("doc_id", "source", "lang")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab-clean-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    # result equality first — an A/B on different answers is meaningless
    a = sorted(map(tuple, old_shape(spark, sf_dir).collect()))
    b = sorted(map(tuple, new_shape(spark, sf_dir).collect()))
    assert a == b, f"shapes disagree: {len(a)} vs {len(b)} rows"
    print(f"results identical: {len(a)} rows")

    times = {"old": [], "new": []}
    for _ in range(rounds):
        for name, fn in (("old", old_shape), ("new", new_shape)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(f"{name}: best={min(ts):.3f} all={[round(t, 3) for t in ts]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
