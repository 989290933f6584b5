"""Contamination check/removal, near-dup removal, and privacy transforms."""

import pytest
from pyspark.sql import functions as F

from data_warehouse_migrate_spark.functions.privacy import (
    generalize_numeric,
    pseudonym,
    pseudonymize,
)
from data_warehouse_migrate_spark.operators.contamination import (
    decontaminate,
    ngram_contamination,
)
from data_warehouse_migrate_spark.operators.dedup import near_dup_removal


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame([
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),   # exact copy of 1
        (3, "alpha beta gamma delta different tail"),  # partial overlap
        (4, "totally unrelated words nothing shared"),
    ], "doc_id long, text string")


def test_ngram_contamination_rates(spark, corpus):
    ev = corpus.filter(F.col("doc_id").isin(2, 3, 4))
    tr = corpus.filter(F.col("doc_id") == 1)
    out = {r.eval_id: (r.contamination_rate, r.is_contaminated)
           for r in ngram_contamination(ev, tr, "text", "doc_id",
                                        n=3).collect()}
    assert out[2] == (1.0, True)          # exact copy: fully contaminated
    assert 0.0 < out[3][0] < 1.0          # shares a prefix of 3-grams
    assert out[4] == (0.0, False)


def test_decontaminate_drops_only_overlapping(spark, corpus):
    train = corpus.filter(F.col("doc_id").isin(2, 3, 4))
    bench = corpus.filter(F.col("doc_id") == 1)
    kept = sorted(r.doc_id for r in
                  decontaminate(train, bench, "text", "doc_id",
                                n=3, drop_threshold=0.8).collect())
    assert kept == [3, 4]                 # 2 dropped; 3 below threshold
    # removal preserves the input schema
    assert decontaminate(train, bench, "text", "doc_id").columns == \
        train.columns


def test_near_dup_removal_keeps_canonical_and_unpaired(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 7)], "doc_id long, text string")
    # clusters: {1,2,3} (chain), {4,5}; 6 unpaired
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long")
    kept = sorted(r.doc_id for r in
                  near_dup_removal(docs, pairs, "doc_id").collect())
    assert kept == [1, 4, 6]


def test_near_dup_removal_no_pairs_is_identity(spark):
    docs = spark.createDataFrame([(1, "a"), (2, "b")],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert near_dup_removal(docs, pairs, "doc_id").count() == 2


def test_pseudonym_consistent_and_null_safe(spark):
    df = spark.createDataFrame(
        [(1, "alice"), (2, "bob"), (3, None), (4, "alice")],
        "id long, name string")
    out = pseudonymize(df, ["name"], salt="s3cret")
    rows = {r.id: r.name for r in out.collect()}
    assert rows[1] == rows[4]                      # same value, same surrogate
    assert rows[1] != rows[2]
    assert rows[3] is None                         # NULL stays NULL
    assert len(rows[1]) == 32 and rows[1] == rows[1].lower()
    # keyed: a different salt unlinks every surrogate
    rows_b = {r.id: r.name for r in
              pseudonymize(df, ["name"], salt="other").collect()}
    assert rows_b[1] != rows[1]
    # column order and untouched columns preserved
    assert out.columns == df.columns


def test_pseudonym_cross_column_referential_integrity(spark):
    """The same identifier value pseudonymized from two different tables
    (or columns) yields the same surrogate — joins survive."""
    a = spark.createDataFrame([(7, "k1")], "x long, key string")
    b = spark.createDataFrame([("k1", 99)], "key string, y long")
    pa = pseudonymize(a, ["key"], "s")
    pb = pseudonymize(b, ["key"], "s")
    assert pa.join(pb, "key").count() == 1


def test_pseudonymize_validates(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    with pytest.raises(ValueError, match="salt"):
        pseudonymize(df, ["name"], salt="")
    with pytest.raises(ValueError, match="not in DataFrame"):
        pseudonymize(df, ["nope"], salt="s")


def test_pseudonym_integer_matches_string_render(spark):
    """Integer keys pseudonymize via CAST TO STRING — the oracle contract:
    md5('s:37') regardless of the column's integer width."""
    df = spark.createDataFrame([(37,)], "k int")
    got = df.select(pseudonym("k", "s").alias("p")).first().p
    import hashlib
    assert got == hashlib.md5(b"s:37").hexdigest()


def test_generalize_numeric_bands(spark):
    df = spark.createDataFrame(
        [(1, 37.0), (2, 0.0), (3, -0.5), (4, 999.99), (5, None)],
        "id long, v double")
    out = {r.id: r.band for r in df.select(
        "id", generalize_numeric("v", 1000).alias("band")).collect()}
    assert out[1] == "0-999"
    assert out[2] == "0-999"
    assert out[3] == "-1000--1"        # floor semantics for negatives
    assert out[4] == "0-999"
    assert out[5] is None
    with pytest.raises(ValueError, match="positive"):
        generalize_numeric("v", 0)
