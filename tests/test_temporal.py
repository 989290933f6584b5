"""As-of join and binned range join (operators/temporal.py)."""

import pytest
from pyspark.sql import functions as F

from data_warehouse_migrate_spark.operators.temporal import (
    asof_join,
    range_join_binned,
)


@pytest.fixture()
def quotes(spark):
    rows = [
        ("A", "2024-01-01 10:00:00", 100.0),
        ("A", "2024-01-01 10:05:00", 101.0),
        ("A", "2024-01-01 10:10:00", 102.0),
        ("B", "2024-01-01 10:02:00", 50.0),
    ]
    return (spark.createDataFrame(rows, "sym string, ts string, px double")
            .withColumn("ts", F.to_timestamp("ts")))


@pytest.fixture()
def trades(spark):
    rows = [
        (1, "A", "2024-01-01 10:03:00"),   # → quote 10:00 px=100
        (2, "A", "2024-01-01 10:05:00"),   # equal ts → px=101 (<= semantics)
        (3, "A", "2024-01-01 10:59:00"),   # → 10:10 px=102
        (4, "B", "2024-01-01 10:01:00"),   # before any B quote → NULL
        (5, "C", "2024-01-01 10:03:00"),   # no C quotes → NULL
    ]
    return (spark.createDataFrame(rows, "trade_id int, sym string, ts string")
            .withColumn("ts", F.to_timestamp("ts")))


def test_asof_backward(trades, quotes):
    out = asof_join(trades, quotes, on="ts", by="sym", value_cols=["px"])
    got = {r.trade_id: r.px for r in out.collect()}
    assert got == {1: 100.0, 2: 101.0, 3: 102.0, 4: None, 5: None}
    assert out.count() == trades.count()  # left rows preserved


def test_asof_forward(trades, quotes):
    out = asof_join(trades, quotes, on="ts", by="sym", value_cols=["px"],
                    direction="forward")
    got = {r.trade_id: r.px for r in out.collect()}
    # smallest quote ts >= trade ts
    assert got == {1: 101.0, 2: 101.0, 3: None, 4: 50.0, 5: None}


def test_asof_tolerance(trades, quotes):
    out = asof_join(trades, quotes, on="ts", by="sym", value_cols=["px"],
                    tolerance_seconds=240)
    got = {r.trade_id: r.px for r in out.collect()}
    # trade 1 is 180s after its quote (keep); trade 3 is 2940s after (drop)
    assert got[1] == 100.0
    assert got[3] is None


def test_asof_matches_duckdb(spark, sf_dir):
    import duckdb

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    from data_warehouse_migrate_spark.sources.readers import normalize_nano_timestamps
    e = normalize_nano_timestamps(e, ["ts"]).select("event_id", "user_id", "ts")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    r = o.groupBy("o_custkey", "o_orderdate").agg(F.max("o_totalprice").alias("px"))
    out = asof_join(e, r, on="ts", by="user_id",
                    right_on="o_orderdate", right_by="o_custkey",
                    value_cols=["px"])
    got = {r_.event_id: r_.px for r_ in out.collect()}
    con = duckdb.connect()
    oracle = dict(con.execute(f"""
        WITH r AS (SELECT o_custkey, o_orderdate, max(o_totalprice) AS px
                   FROM '{sf_dir}/orders.parquet' GROUP BY 1, 2)
        SELECT e.event_id, r.px
        FROM '{sf_dir}/events.parquet' e ASOF LEFT JOIN r
          ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    """).fetchall())
    assert got == oracle


def test_range_join_binned(spark):
    rows_l = [(1, "2024-01-01 10:00:00")]
    rows_r = [("2024-01-01 09:00:01",), ("2024-01-01 09:30:00",),
              ("2024-01-01 10:00:00",), ("2024-01-01 10:00:01",),
              ("2024-01-01 08:59:59",)]
    left = (spark.createDataFrame(rows_l, "id int, ts string")
            .withColumn("ts", F.to_timestamp("ts")))
    right = (spark.createDataFrame(rows_r, "c_ts string")
             .withColumn("c_ts", F.to_timestamp("c_ts")))
    out = range_join_binned(left, right, "ts", "c_ts",
                            lower_seconds=-3600, upper_seconds=0)
    got = sorted(str(r.c_ts) for r in out.collect())
    # within [ts-1h, ts]: 09:00:01, 09:30:00, 10:00:00 (boundary in),
    # 10:00:01 after (out), 08:59:59 too old (out)
    assert got == ["2024-01-01 09:00:01", "2024-01-01 09:30:00",
                   "2024-01-01 10:00:00"]


def test_range_join_no_nested_loop(spark, sf_dir):
    from data_warehouse_migrate_spark.plans.dryrun import explain_plan
    from data_warehouse_migrate_spark.sources.readers import normalize_nano_timestamps

    e = normalize_nano_timestamps(
        spark.read.parquet(f"{sf_dir}/events.parquet"), ["ts"])
    errors = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
    out = range_join_binned(errors, clicks, "ts", "c_ts", -3600, 0,
                            by=("user_id", "c_user"))
    plan = explain_plan(out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_null_values_in_matched_row_stay_null(spark):
    """The matched right row's NULLs must NOT be backfilled from an older
    right row (the per-column ignorenulls bug): payload travels as one
    struct."""
    from data_warehouse_migrate_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("A", "2024-01-01 10:06:00")], "k string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("A", "2024-01-01 10:00:00", 100.0),
         ("A", "2024-01-01 10:05:00", None),
         ("A", None, 777.0)],        # NULL right_on: never a match
        "k string, rts string, px double"
    ).withColumn("rts", F.to_timestamp("rts"))
    row = asof_join(left, right, on="ts", by="k", right_on="rts",
                    right_by="k", value_cols=["px"]).first()
    assert row.matched_ts.strftime("%H:%M") == "10:05"
    assert row.px is None            # the 10:05 row's own NULL, not 100.0


def test_asof_join_rejects_column_collision(spark):
    import pytest

    from data_warehouse_migrate_spark.operators.temporal import asof_join

    left = spark.createDataFrame([("A", "2024-01-01 10:00:00", 1.0)],
                                 "k string, ts string, px double"
                                 ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame([("A", "2024-01-01 09:00:00", 2.0)],
                                  "k string, rts string, px double"
                                  ).withColumn("rts", F.to_timestamp("rts"))
    with pytest.raises(ValueError, match="collision"):
        asof_join(left, right, on="ts", by="k", right_on="rts",
                  right_by="k", value_cols=["px"])
