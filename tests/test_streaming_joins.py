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


# ---------------------------------------------------------------------------
# merge_session_batch: the vectorized segmentation core vs a naive loop
# ---------------------------------------------------------------------------

def _reference_merge(micros, state, gap_us):
    """The original per-event loop, kept as the executable spec."""
    closed = []
    micros = sorted(int(t) for t in micros)
    if state is not None:
        start, end, n = state
        orig_start = start
        pre = [t for t in micros if t < start]
        cur = None
        for t in pre:
            if cur is None:
                cur = [t, t, 1]
            elif t - cur[1] > gap_us:
                closed.append(tuple(cur))
                cur = [t, t, 1]
            else:
                cur[1], cur[2] = t, cur[2] + 1
        if cur is not None:
            if start - cur[1] <= gap_us:
                start, n = cur[0], n + cur[2]
            else:
                closed.append(tuple(cur))
        rest = [t for t in micros if t >= orig_start] if pre else micros
    else:
        start, end, n = micros[0], micros[0], 0
        rest = micros
    for t in rest:
        if t - end > gap_us:
            closed.append((start, end, n))
            start, n = t, 0
        end = max(end, t)
        n += 1
    return closed, (start, end, n)


def test_merge_session_batch_matches_reference_loop():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_warehouse_migrate_spark.streaming.windows import (
        merge_session_batch,
    )

    GAP = 1000

    @settings(max_examples=300, deadline=None)
    @given(
        times=st.lists(st.integers(min_value=0, max_value=20_000),
                       min_size=1, max_size=60),
        state=st.one_of(
            st.none(),
            st.tuples(st.integers(5_000, 12_000),   # start
                      st.integers(0, 6_000),        # end offset from start
                      st.integers(1, 50))           # n
            .map(lambda t: (t[0], t[0] + t[1], t[2]))),
    )
    def check(times, state):
        micros = np.sort(np.array(times, dtype="int64"))
        got_closed, got_state = merge_session_batch(micros, state, GAP)
        want_closed, want_state = _reference_merge(times, state, GAP)
        assert got_closed == want_closed
        assert got_state == want_state

    check()


def test_merge_session_batch_late_burst_does_not_inflate():
    """The documented late-data contract on a concrete case: a very late
    burst emits as its own closed session and the open session's start
    only extends back within one gap."""
    import numpy as np

    from data_warehouse_migrate_spark.streaming.windows import (
        merge_session_batch,
    )

    state = (10_000, 10_500, 3)
    micros = np.array([1_000, 1_100, 9_600, 10_900], dtype="int64")
    closed, new_state = merge_session_batch(micros, state, 1000)
    # the 1_000/1_100 burst is its own closed session; 9_600 is within
    # one gap of start=10_000 so it extends the open session backwards
    assert closed == [(1_000, 1_100, 2)]
    assert new_state == (9_600, 10_900, 5)
