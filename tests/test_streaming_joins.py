"""Streaming joins: stream-static enrichment, watermarked stream-stream
interval join — batch twins pin the values, file-source e2e drives the
real streaming plans."""

import pytest
from pyspark.sql import functions as F

from data_warehouse_migrate_spark.streaming.joins import (
    enrich_stream,
    interval_join_streams,
)


@pytest.fixture()
def clicks(spark):
    rows = [
        (1, "2024-01-01 10:00:00", "c1"),
        (1, "2024-01-01 10:20:00", "c2"),
        (2, "2024-01-01 11:00:00", "c3"),
        (3, "2024-01-01 12:00:00", "c4"),
    ]
    return (spark.createDataFrame(rows, "user_id int, ts string, click string")
            .withColumn("ts", F.to_timestamp("ts")))


@pytest.fixture()
def buys(spark):
    rows = [
        (1, "2024-01-01 10:30:00", "b1"),   # within 1h of c1 and c2
        (2, "2024-01-01 13:00:00", "b2"),   # 2h after c3 -> outside
        (3, "2024-01-01 11:30:00", "b3"),   # BEFORE c4 -> outside
    ]
    return (spark.createDataFrame(rows, "user_id int, bts string, buy string")
            .withColumn("bts", F.to_timestamp("bts")))


def test_interval_join_batch_semantics(clicks, buys):
    out = {(r.click, r.buy) for r in
           interval_join_streams(clicks, buys, "user_id", "ts", "bts",
                                 max_delay="1 hour").collect()}
    assert out == {("c1", "b1"), ("c2", "b1")}


def test_enrich_stream_batch_semantics(spark, clicks):
    dim = spark.createDataFrame([(1, "gold"), (2, "basic")],
                                "user_id int, tier string")
    out = {r.click: r.tier for r in
           enrich_stream(clicks, dim, ["user_id"]).collect()}
    assert out == {"c1": "gold", "c2": "gold", "c3": "basic", "c4": None}
    with pytest.raises(ValueError, match="inner/left"):
        enrich_stream(clicks, dim, ["user_id"], how="full")


def test_interval_join_streaming_e2e(spark, clicks, buys, tmp_path):
    """Two file-source streams through the watermarked interval join:
    emitted rows must equal the batch twin's result."""
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt = str(tmp_path / "ckpt")
    clicks.write.mode("overwrite").parquet(lsrc)
    buys.write.mode("overwrite").parquet(rsrc)
    ls = spark.readStream.schema(clicks.schema).parquet(lsrc)
    rs = spark.readStream.schema(buys.schema).parquet(rsrc)
    out = interval_join_streams(ls, rs, "user_id", "ts", "bts",
                                max_delay="1 hour", watermark="4 hours")
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("ij_sink")
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.click, r.buy) for r in spark.table("ij_sink").collect()}
    assert got == {("c1", "b1"), ("c2", "b1")}


def test_enrich_stream_e2e(spark, clicks, tmp_path):
    src = str(tmp_path / "es_src")
    ckpt = str(tmp_path / "es_ckpt")
    clicks.write.mode("overwrite").parquet(src)
    dim = spark.createDataFrame([(1, "gold"), (2, "basic")],
                                "user_id int, tier string")
    stream = spark.readStream.schema(clicks.schema).parquet(src)
    out = enrich_stream(stream, dim, ["user_id"])
    q = (out.writeStream.format("memory").queryName("es_sink")
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.click: r.tier for r in spark.table("es_sink").collect()}
    assert got == {"c1": "gold", "c2": "gold", "c3": "basic", "c4": None}
