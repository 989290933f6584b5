"""Train/eval contamination detection (beyond-reference; SURVEY.md §7.3).

Benchmark/test-set contamination is the standard pre-training hygiene
check: an eval document is "contaminated" to the degree its word n-grams
also appear anywhere in the training corpus (the n-gram-overlap criterion
used by public LLM reports, e.g. GPT-3 appendix C / PaLM appendix).

Plan shape (the 100 TB-safe one): both sides reduce to DISTINCT
(doc, shingle-hash) pairs — explode → hash → distinct, all JVM
expressions — then ONE equi-join on the 64-bit shingle hash and ONE
aggregation per eval doc. No all-pairs document comparison ever happens;
the join key space is the shingle vocabulary, which AQE re-splits if a
stop-phrase shingle skews a partition. Joining 60-bit md5-prefix hashes
instead of shingle strings keeps shuffle rows fixed-width; a hash
collision can only inflate overlap (flag-safe, never misses true
contamination) at ~2^-60 per pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_warehouse_migrate_spark.functions.text import (
    md5_prefix_int,
    word_shingles,
)
from data_warehouse_migrate_spark.operators.skew import spread_input


def _doc_shingle_hashes(df: DataFrame, text_col: str, id_col: str,
                        n: int, out_id: str) -> DataFrame:
    sh = F.array_distinct(
        F.transform(word_shingles(F.col(text_col), n),
                    lambda s: md5_prefix_int(s)))
    return spread_input(df).select(
        F.col(id_col).alias(out_id), F.explode(sh).alias("sh"))


def ngram_contamination(eval_df: DataFrame, train_df: DataFrame,
                        text_col: str, id_col: str, n: int = 3,
                        flag_threshold: float = 0.8) -> DataFrame:
    """Per eval document: how many of its distinct word ``n``-grams occur
    in ANY training document. Returns (eval_id, n_shingles,
    n_contaminated, contamination_rate, is_contaminated) — rate rounded to
    6dp, flag = rate ≥ ``flag_threshold``.

    Texts shorter than ``n`` words contribute their whole text as one
    shingle (same convention as the dedup operators), so every eval row
    appears in the output.
    """
    ev = _doc_shingle_hashes(eval_df, text_col, id_col, n, "eval_id")
    tr = (_doc_shingle_hashes(train_df, text_col, id_col, n, "__tid")
          .select("sh").distinct().withColumn("__hit", F.lit(1)))
    rate = F.round(F.col("n_contaminated") / F.col("n_shingles"), 6)
    return (ev.join(tr, "sh", "left")
            .groupBy("eval_id")
            .agg(F.count(F.lit(1)).alias("n_shingles"),
                 F.coalesce(F.sum("__hit"), F.lit(0)).cast("bigint")
                 .alias("n_contaminated"))
            .withColumn("contamination_rate", rate)
            .withColumn("is_contaminated",
                        F.col("contamination_rate") >= flag_threshold))


def decontaminate(train_df: DataFrame, benchmark_df: DataFrame,
                  text_col: str, id_col: str, n: int = 3,
                  drop_threshold: float = 0.8) -> DataFrame:
    """The removal counterpart of :func:`ngram_contamination`: DROP from
    the training corpus every document whose distinct word ``n``-gram
    overlap with the benchmark set reaches ``drop_threshold``. Returns
    the cleaned training DataFrame (original columns, original rows minus
    the dropped ones) — the artifact a pre-training pipeline actually
    ships after the contamination report is reviewed.

    Same plan spine as the check, with the sides swapped (the TRAIN docs
    are now the scored side, the benchmark reduces to a distinct shingle
    set) plus one final join: scored ids above threshold become a drop
    list, applied with a LEFT ANTI join on ``id_col`` — at 100 TB the
    drop list is a tiny fraction of the corpus, so AQE turns the anti
    join into a broadcast and the cleaned corpus never reshuffles.
    Documents shorter than ``n`` words score on their whole text as a
    single shingle, matching the check's convention.
    """
    tr = _doc_shingle_hashes(train_df, text_col, id_col, n, "train_id")
    bench = (_doc_shingle_hashes(benchmark_df, text_col, id_col, n, "__bid")
             .select("sh").distinct().withColumn("__hit", F.lit(1)))
    rate = (F.coalesce(F.sum("__hit"), F.lit(0)).cast("double")
            / F.count(F.lit(1)))
    drops = (tr.join(bench, "sh", "left")
             .groupBy("train_id")
             .agg(F.round(rate, 6).alias("__rate"))
             .filter(F.col("__rate") >= drop_threshold)
             .select(F.col("train_id").alias(id_col)))
    return train_df.join(drops, id_col, "left_anti")
