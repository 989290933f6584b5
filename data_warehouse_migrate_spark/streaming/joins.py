"""Streaming joins (beyond-reference; the reference has no streaming):
the two canonical Structured Streaming join patterns with the state
bounds that make them safe to leave running.

``enrich_stream`` — stream-static: each micro-batch of the stream joins
a (small) dimension DataFrame. The static side is broadcast per batch;
NO streaming state accumulates — the pattern is stateless by
construction, which is why it is the default for dimension enrichment
at any scale. The static side is re-read per micro-batch by the engine,
so a dimension table updated in place is picked up without restarting
the query. This is also exactly the regime where AQE's skew-join split
cannot help (no runtime re-plan inside a micro-batch) — for a hot-keyed
stream, compose with ``operators.skew.salted_join`` instead of a plain
join.

``interval_join_streams`` — stream-stream: two event streams join on an
equi-key AND a bounded event-time interval (right.ts in
[left.ts, left.ts + max_delay]). BOTH sides are watermarked; together
with the time-range condition this lets the engine evict buffered rows
once they can no longer match — state is bounded by
rate × (watermark + max_delay), not by stream length. An unbounded
stream-stream equi-join without the interval condition buffers forever;
this helper makes the bound part of the signature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(stream: DataFrame, dim: DataFrame, on: list[str],
                  how: str = "left") -> DataFrame:
    """Stream-static dimension enrichment. ``stream`` may be a streaming
    DataFrame (``isStreaming``) or a batch frame (same plan either way —
    the batch form is how tests pin result values). Broadcasts the
    static side explicitly: in a micro-batch there is no AQE fallback,
    so the hint, not a size estimate, decides."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"enrich_stream supports inner/left joins (got {how!r}); "
            "right/full joins against a static side are not meaningful "
            "for an unbounded stream")
    return stream.join(F.broadcast(dim), on, how)


def interval_join_streams(left: DataFrame, right: DataFrame,
                          key: str, left_ts: str, right_ts: str,
                          max_delay: str = "1 hour",
                          watermark: str = "1 hour") -> DataFrame:
    """Watermarked stream-stream interval join:

      left ⋈ right ON left.key = right.key
                   AND right.ts ∈ [left.ts, left.ts + max_delay]

    Both inputs get ``withWatermark(ts, watermark)`` — required for state
    eviction on BOTH buffers (inner joins need at least one, but bounding
    only one side leaves the other's buffer unbounded). Works identically
    on batch frames (no watermark applied there) so the result values are
    oracle-checkable; the streaming e2e test drives the real thing with
    file sources.

    Column names must be disjoint apart from ``key`` (standard Spark
    join rules); output carries both timestamp columns so downstream
    windows can pick either time axis.
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    l, r = left.alias("l"), right.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}")
           <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}"))
    )
    out_cols = [F.col(f"l.{key}").alias(key)]
    out_cols += [F.col(f"l.{c}").alias(c) for c in left.columns if c != key]
    out_cols += [F.col(f"r.{c}").alias(c) for c in right.columns if c != key]
    return l.join(r, cond, "inner").select(*out_cols)


def run_enrich_stream(spark, source_path: str, dim: DataFrame,
                      on: list[str], select_cols: list[str] | None = None,
                      how: str = "left",
                      ts_cols: list[str] | None = None) -> DataFrame:
    """Execute ``enrich_stream`` end-to-end over a parquet file source
    (availableNow trigger, memory sink — the real streaming engine) and
    return the enriched rows as a batch DataFrame.

    Stateless stream-static join: no watermark, no timers — the query
    terminates on its own when the source drains, and the result equals
    the batch join, which is what the SQL oracle checks.

    ``ts_cols`` names the event-time column(s) to normalize from
    nanos-as-long parquet (default ``["ts"]`` — previously hardcoded,
    r15 review: a source whose event time is named anything else flowed
    through as raw nanos longs while every sibling runner returned
    timestamps)."""
    import uuid

    from data_warehouse_migrate_spark.sources.readers import (
        normalize_nano_timestamps,
        open_file_stream,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = normalize_nano_timestamps(open_file_stream(spark, source_path),
                                       ts_cols if ts_cols is not None
                                       else ["ts"])
    out = enrich_stream(stream, dim, on, how)
    if select_cols:
        out = out.select(*select_cols)
    sink = f"dwms_stream_enrich_{uuid.uuid4().hex[:12]}"
    q = (out.writeStream.format("memory").queryName(sink)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    # snapshot + drop the sink view: returning spark.table(sink) leaked
    # one full result copy in driver memory per invocation (r15 review)
    from data_warehouse_migrate_spark.streaming.windows import (
        snapshot_memory_sink,
    )

    return snapshot_memory_sink(spark, sink)
