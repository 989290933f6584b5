import pyspark.sql.functions as F

from data_warehouse_migrate_spark.operators.skew import salted_agg, spread_input


def test_spread_input_widens_narrow_scan(spark, sf_dir):
    # single parquet file plans as one input partition; spread_input must
    # widen it to the session's parallelism without changing the rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    out = spread_input(docs)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == docs.count()
    a = {r.doc_id for r in docs.select("doc_id").collect()}
    b = {r.doc_id for r in out.select("doc_id").collect()}
    assert a == b


def test_spread_input_noop_when_already_wide(spark):
    wide = spark.range(1000).repartition(
        spark.sparkContext.defaultParallelism + 2)
    # already at/above parallelism: the SAME plan comes back (no shuffle)
    assert spread_input(wide) is wide


def test_salted_agg_matches_plain_groupby(spark, sf_dir):
    import pytest

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    salted = {
        (r.event_type): (r.count_all, r.sum_value)
        for r in salted_agg(ev, ["event_type"],
                            {"*": "count", "value": "sum"},
                            salt_buckets=8).collect()
    }
    plain = {
        (r.event_type): (r.c, r.s)
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("c"), F.sum("value").alias("s")).collect()
    }
    assert salted.keys() == plain.keys()
    for k in plain:
        assert salted[k][0] == plain[k][0]
        # double sums: two-phase addition order differs in the last ulp
        assert salted[k][1] == pytest.approx(plain[k][1], rel=1e-12)


def test_sampler_salt_decorrelates_stages(spark):
    """Unsalted chained samplers keep min(p1,p2) (subset property);
    distinct salts restore approximate independence (p1·p2)."""
    from data_warehouse_migrate_spark.operators.sampling import hash_sample

    df = spark.range(20_000).withColumnRenamed("id", "k")
    unsalted = hash_sample(hash_sample(df, "k", 0.8), "k", 0.5).count()
    assert abs(unsalted - 10_000) < 400        # min(0.8, 0.5) = 0.5
    salted = hash_sample(hash_sample(df, "k", 0.8, salt="s1"),
                         "k", 0.5, salt="s2").count()
    assert abs(salted - 8_000) < 500           # 0.8 * 0.5 = 0.4


def test_shuffle_corpus_reproducible_permutation(spark):
    from data_warehouse_migrate_spark.operators.sampling import shuffle_corpus

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = [r.doc_id for r in shuffle_corpus(df, "doc_id").collect()]
    b = [r.doc_id for r in
         shuffle_corpus(df.repartition(7), "doc_id").collect()]
    assert a == b                      # same salt -> identical order
    assert sorted(a) == list(range(2000))   # a true permutation
    assert a != sorted(a)              # and actually shuffled
    c = [r.doc_id for r in shuffle_corpus(df, "doc_id", salt="v2").collect()]
    assert c != a                      # new salt -> fresh permutation
    # keys are globally range-ordered across the output partitions
    keys = [r.shuffle_key for r in shuffle_corpus(df, "doc_id").collect()]
    assert keys == sorted(keys)


def test_estimated_scan_partitions(spark, sf_dir, tmp_path):
    import gzip

    from data_warehouse_migrate_spark.operators.skew import (
        _estimated_scan_partitions,
    )

    # parquet scan: estimate must be within ±1 partition of Spark's own
    # packing at the session's parallelism
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    est = _estimated_scan_partitions(df)
    actual = df.rdd.getNumPartitions()
    assert est is not None and abs(est - actual) <= 1, (est, actual)

    # non-splittable whole-file compression: size model doesn't apply —
    # must decline (None) so the caller falls back to the exact probe
    gz = tmp_path / "rows.json.gz"
    with gzip.open(gz, "wt") as f:
        f.write('{"a": 1}\n' * 1000)
    gz_df = spark.read.json(str(gz))
    assert _estimated_scan_partitions(gz_df) is None

    # non-file plan (in-memory relation): unknown — decline
    mem = spark.createDataFrame([(1,)], "a long")
    assert _estimated_scan_partitions(mem) is None
