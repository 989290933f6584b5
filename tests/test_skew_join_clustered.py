"""salted_join equivalence/mechanics and the clustered (zone-map) writer."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_warehouse_migrate_spark.operators.skew import salted_join
from data_warehouse_migrate_spark.sources.sinks import write_clustered


@pytest.fixture()
def skewed_facts(spark):
    # hot key 1 carries 90% of rows
    return spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(1)).otherwise(F.col("id"))
        .alias("k"), F.col("id").alias("v"))


@pytest.fixture()
def dims(spark):
    return spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (950, "tail"), (999, "tail")],
        "k long, label string")


def test_salted_join_matches_plain_inner(skewed_facts, dims):
    plain = skewed_facts.join(dims, ["k"], "inner")
    salted = salted_join(skewed_facts, dims, ["k"], salt_buckets=8)
    assert sorted(map(tuple, salted.collect())) == \
        sorted(map(tuple, plain.collect()))
    assert salted.columns == plain.columns


def test_salted_join_preserves_small_side_duplicates(spark, skewed_facts):
    dup_dims = spark.createDataFrame(
        [(1, "a"), (1, "b")], "k long, label string")
    plain = skewed_facts.join(dup_dims, ["k"], "inner")
    salted = salted_join(skewed_facts, dup_dims, ["k"], salt_buckets=4)
    assert salted.count() == plain.count() == 2 * 900


def test_salted_join_left_and_anti(skewed_facts, dims):
    for how in ("left", "left_anti"):
        plain = skewed_facts.join(dims, ["k"], how)
        salted = salted_join(skewed_facts, dims, ["k"],
                             salt_buckets=8, how=how)
        assert sorted(map(tuple, salted.collect())) == \
            sorted(map(tuple, plain.collect())), how


def test_salted_join_rejects_right_full(skewed_facts, dims):
    with pytest.raises(ValueError, match="right/full"):
        salted_join(skewed_facts, dims, ["k"], how="full")
    with pytest.raises(ValueError, match="salt_buckets"):
        salted_join(skewed_facts, dims, ["k"], salt_buckets=0)


def test_write_clustered_disjoint_zone_maps(spark, tmp_path):
    """Range clustering must yield DISJOINT per-file min/max ranges on the
    cluster column — the property that lets a range predicate skip files."""
    df = spark.range(10_000).select(
        F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("ts"),
        F.col("id").alias("payload"))
    out = str(tmp_path / "clustered")
    n = write_clustered(df, out, ["ts"], n_files=8)
    parts = sorted(glob.glob(f"{out}/part-*"))
    assert len(parts) == n == 8
    ranges = []
    for p in parts:
        md = pq.ParquetFile(p).metadata
        col_idx = [md.schema.column(i).name
                   for i in range(md.num_columns)].index("ts")
        mins = [md.row_group(g).column(col_idx).statistics.min
                for g in range(md.num_row_groups)]
        maxs = [md.row_group(g).column(col_idx).statistics.max
                for g in range(md.num_row_groups)]
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping zone maps: {ranges}"
    # roundtrip intact
    assert spark.read.parquet(out).count() == 10_000
