"""Temporal join operators Spark lacks natively (beyond-reference;
custom operators per the project brief): as-of join and range join.

Both are compositions of built-in DataFrame ops — no UDFs, no cartesian
products — chosen for the shapes that survive a 100 TB scale-up:

  * ``asof_join`` — union + window, the sort-based formulation: ONE shuffle
    on the by-key, then a linear window pass. Never builds candidate pairs,
    so it is immune to the key-skew blowup of the naive
    "join all earlier rows then argmax" formulation.
  * ``range_join_binned`` — equi-join on coarse time bins + residual
    predicate. Turns an inequality join (which Spark plans as a broadcast
    nested loop) into a shuffle hash/merge join on bin keys; each right row
    is replicated into ceil(range/bin)+1 bins, a bounded constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_L, _R = "__asof_left", "__asof_is_left"


def asof_join(left: DataFrame, right: DataFrame,
              on: str, by: str | None = None,
              right_on: str | None = None, right_by: str | None = None,
              value_cols: list[str] | None = None,
              tolerance_seconds: int | None = None,
              direction: str = "backward") -> DataFrame:
    """For each left row, attach the single right row with the greatest
    ``right_on`` ≤ ``on`` (direction='backward'; 'forward' takes the
    smallest ≥), matching on the ``by`` key. Left rows without a match keep
    NULLs — standard as-of semantics (pandas merge_asof / DuckDB ASOF JOIN).

    Implementation: tag and union both inputs, sort within each by-key by
    (ts, left-last) and carry the last right payload forward with a
    running ``last(ignorenulls)`` window over ONE struct — the whole
    matched right row travels together, so a NULL value in the matched
    row stays NULL instead of being backfilled from an older right row
    (per-column ignorenulls would mix payloads across rows, deviating
    from pandas merge_asof / DuckDB ASOF). Then keep only left rows.
    Cost: one shuffle on the by-key, one window pass; no pair explosion.
    ``tolerance_seconds`` drops matches further than the tolerance.
    Right rows with a NULL ``right_on`` are dropped (they cannot be the
    as-of match — pandas rejects NaT keys outright); value-column names
    must not collide with left columns (raised, not silently duplicated).
    """
    from pyspark.sql import types as T

    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    right_on = right_on or on
    right_by = right_by or by
    value_cols = value_cols or [c for c in right.columns
                                if c not in (right_on, right_by)]

    lcols = left.columns
    dup = [c for c in value_cols if c in lcols]
    if dup or "matched_ts" in lcols:
        raise ValueError(
            f"output column collision with left columns: "
            f"{dup + (['matched_ts'] if 'matched_ts' in lcols else [])}; "
            "rename or pass explicit value_cols")
    key = F.col(by) if by else F.lit(0)
    rkey = F.col(right_by) if right_by else F.lit(0)

    payload_type = T.StructType(
        [T.StructField("__rts", right.schema[right_on].dataType)]
        + [T.StructField(f"__v_{c}", right.schema[c].dataType)
           for c in value_cols])
    lt = left.select(
        key.alias("__key"), F.col(on).alias("__ts"), F.lit(True).alias(_R),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(payload_type).alias("__p"))
    rt = (right.filter(F.col(right_on).isNotNull())
          .select(
              rkey.alias("__key"), F.col(right_on).alias("__ts"),
              F.lit(False).alias(_R),
              *[F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in lcols],
              F.struct(F.col(right_on).alias("__rts"),
                       *[F.col(c).alias(f"__v_{c}") for c in value_cols])
              .alias("__p")))
    unioned = lt.unionByName(rt)

    if direction == "backward":
        # right rows sort BEFORE left rows at equal ts (<= semantics)
        w = (Window.partitionBy("__key")
             .orderBy(F.col("__ts").asc(), F.col(_R).cast("int").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    else:
        w = (Window.partitionBy("__key")
             .orderBy(F.col("__ts").desc(), F.col(_R).cast("int").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    matched = F.last("__p", ignorenulls=True).over(w)
    filled = unioned.select(
        *lcols, _R,
        matched["__rts"].alias("__match_ts"),
        *[matched[f"__v_{c}"].alias(c) for c in value_cols])
    out = filled.filter(F.col(_R)).drop(_R)
    if tolerance_seconds is not None:
        # timestamp→double keeps sub-second precision (unix_timestamp
        # truncates to whole seconds, off-by-one at tolerance boundaries).
        # The cast('timestamp') hop makes this NTZ-safe (no direct
        # NTZ→numeric cast exists); with the session pinned to UTC the
        # offset is constant, so the DIFFERENCE is exact either way
        delta = F.abs(F.col(on).cast("timestamp").cast("double")
                      - F.col("__match_ts").cast("timestamp").cast("double"))
        out = out.select(
            *lcols,
            *[F.when(delta <= tolerance_seconds, F.col(c)).otherwise(None).alias(c)
              for c in value_cols],
            F.when(delta <= tolerance_seconds, F.col("__match_ts"))
             .otherwise(None).alias("__match_ts"))
    return out.withColumnRenamed("__match_ts", "matched_ts")


def range_join_binned(left: DataFrame, right: DataFrame,
                      left_ts: str, right_ts: str,
                      lower_seconds: int, upper_seconds: int,
                      by: tuple[str, str] | None = None,
                      bin_seconds: int | None = None) -> DataFrame:
    """Join pairs with ``right_ts - left_ts`` in [lower, upper] seconds
    (optionally also matching ``by`` keys) WITHOUT a nested-loop join:
    bin both sides to ``bin_seconds`` buckets, replicate each left row into
    every bucket its window overlaps, equi-join on the bucket (plus by-key),
    then apply the exact residual predicate.

    Bin default = window span, so each left row lands in ≤ 2 buckets.
    """
    span = upper_seconds - lower_seconds
    if span < 0:
        raise ValueError("upper_seconds must be >= lower_seconds")
    bin_seconds = bin_seconds or max(span, 1)
    n_bins = span // bin_seconds + 2

    lsec = F.unix_timestamp(F.col(left_ts))
    rsec = F.unix_timestamp(F.col(right_ts))
    lo_bin = F.floor((lsec + lower_seconds) / bin_seconds)
    l = left.withColumn("__bin", F.explode(F.sequence(
        lo_bin, F.least(lo_bin + n_bins - 1,
                        F.floor((lsec + upper_seconds) / bin_seconds)))))
    r = right.withColumn("__bin", F.floor(rsec / bin_seconds))

    cond = l["__bin"] == r["__bin"]
    if by is not None:
        cond = cond & (l[by[0]] == r[by[1]])
    # residual uses FULL-precision timestamp arithmetic — unix_timestamp
    # truncates to seconds, which would flip sub-second boundary cases.
    # Binning on truncated seconds stays exact: floor(x+n) = floor(x)+n for
    # integer n, so every true match lands in a replicated bin.
    lo = l[left_ts] + F.make_interval(secs=F.lit(lower_seconds))
    hi = l[left_ts] + F.make_interval(secs=F.lit(upper_seconds))
    return (l.join(r, cond)
            .filter((r[right_ts] >= lo) & (r[right_ts] <= hi))
            .drop("__bin"))
