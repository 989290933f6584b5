"""Skew-mitigation operators (beyond-reference; 100 TB posture).

AQE's skew-join splitting handles most skew at runtime; these helpers cover
the cases AQE does not:

``salted_agg`` — two-phase aggregation for heavy-hitter GROUP BY keys: a
low-cardinality key set concentrates each key's rows in one reducer
regardless of partition count. Salting fans each key out over S sub-keys
for the partial phase, then merges the partials — the final shuffle moves
only |keys|·S pre-aggregated rows. (Skewed JOIN keys are left to AQE's
skew-join splitting, enabled in session.py.)

``spread_input`` — the inverse shape problem: a SMALL scan (one parquet
file under ``spark.sql.files.maxPartitionBytes``) plans as 1-2 input
partitions, serializing every expensive per-row expression downstream on
one core no matter how many the session has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def spread_input(df: DataFrame) -> DataFrame:
    """Round-robin repartition a narrow-partitioned input up to the
    session's default parallelism before an expensive per-row stage
    (shingling, hashing, vector math). Gated: a no-op when the scan
    already has ≥ parallelism partitions — at the 100 TB design point
    inputs arrive in thousands of splits and this never fires; it exists
    for the small-file case, where the one-time shuffle of the raw rows
    is orders of magnitude cheaper than computing the heavy expression on
    one core (measured 5-19× on the sf0.1 dedup operators, whose single
    594 KB documents file plans as ONE partition).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    est = _estimated_scan_partitions(df)
    if est is None:
        # not file-backed / remote store / unreadable sizes — fall back to
        # the exact (but ~50-130 ms of plan-to-RDD conversion) probe
        est = df.rdd.getNumPartitions()
    if est < target:
        return df.repartition(target)
    return df


def _estimated_scan_partitions(df: DataFrame) -> int | None:
    """Estimate the scan partition count from the leaf files' sizes
    WITHOUT converting the plan to an RDD (``df.rdd`` costs 50-130 ms of
    driver time per DataFrame — pure overhead when spread_input runs in
    every per-row-heavy operator). Mirrors Spark's FilePartition packing
    rule INCLUDING the bytes-per-core term:

      maxSplit = min(maxPartitionBytes,
                     max(openCostInBytes, totalBytes / parallelism))
      partitions ≈ ceil(totalBytes / maxSplit)

    (omitting bytes-per-core would call a single 64 MB file "1
    partition" when Spark actually splits it ~8 ways at parallelism 8 —
    and trigger a pointless full round-robin of anything under
    parallelism × 128 MB). Returns None (caller falls back to
    ``df.rdd``) for non-file plans, remote schemes, unstattable paths,
    or whole-file-compressed text inputs (.gz/.bz2/… are non-splittable:
    their real partition count is the FILE count regardless of size, and
    those are exactly the inputs where a missed spread hurts most)."""
    import math
    import os
    from urllib.parse import unquote, urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    # whole-file compression (non-splittable text codecs): one partition
    # per file no matter the size — the size model below doesn't apply
    if any(f.lower().endswith(suf) for f in files
           for suf in (".gz", ".bz2", ".lz4", ".zst", ".xz", ".deflate",
                       ".snappy")):
        return None
    conf = df.sparkSession.conf

    def _bytes(v: str, default: int) -> int:
        v = (v or "").strip().lower()
        try:
            for suf, mult in (("kb", 1 << 10), ("mb", 1 << 20),
                              ("gb", 1 << 30), ("k", 1 << 10),
                              ("m", 1 << 20), ("g", 1 << 30), ("b", 1)):
                if v.endswith(suf):
                    return int(float(v[:-len(suf)]) * mult)
            return int(v)
        except ValueError:
            return default

    max_part = _bytes(conf.get("spark.sql.files.maxPartitionBytes",
                               "134217728"), 128 << 20)
    open_cost = _bytes(conf.get("spark.sql.files.openCostInBytes",
                                "4194304"), 4 << 20)
    total = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("", "file"):
            return None  # s3/hdfs/... — can't stat locally
        path = unquote(u.path) or f
        try:
            total += os.stat(path).st_size + open_cost
        except OSError:
            return None
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    max_split = min(max_part, max(open_cost, total // max(parallelism, 1)))
    return max(1, math.ceil(total / max(max_split, 1)))


_MERGEABLE = {
    "count": (F.count, F.sum),          # partial count → sum of counts
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(df: DataFrame, keys: list[str], aggs: dict[str, str],
               salt_buckets: int = 32,
               salt_col: str | None = None) -> DataFrame:
    """Two-phase (salted) aggregation: partial-aggregate on
    (keys + salt), then merge per key. Results are identical to a plain
    ``groupBy(keys).agg(...)`` for the mergeable aggregates supported
    (count/sum/min/max); the win is that a heavy-hitter key's rows spread
    over ``salt_buckets`` reducers in phase one.

    ``aggs`` maps column → op; ``{"*": "count"}`` counts rows. Output
    column names are ``{op}_{col}`` (``count_all`` for ``*``), matching
    ``streaming.tumbling_window_agg``.

    ``salt_col`` defaults to a deterministic hash-derived salt (stable
    across retries — never use rand() in a fault-tolerant plan).
    """
    for col, op in aggs.items():
        if op not in _MERGEABLE:
            raise ValueError(f"aggregate {op!r} is not salt-mergeable")
    salt = (F.col(salt_col) if salt_col
            else F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()),
                        F.lit(salt_buckets)))
    partial_exprs, merge_exprs = [], []
    for col, op in aggs.items():
        name = f"{op}_{col}".replace("*", "all")
        part_fn, merge_fn = _MERGEABLE[op]
        partial_exprs.append(
            (F.count("*") if col == "*" else part_fn(col)).alias(f"__p_{name}"))
        merge_exprs.append(merge_fn(f"__p_{name}").alias(name))
    return (df.withColumn("__salt", salt)
            .groupBy(*keys, "__salt")
            .agg(*partial_exprs)
            .groupBy(*keys)
            .agg(*merge_exprs))


def salted_join(big: DataFrame, small: DataFrame, on: list[str],
                salt_buckets: int = 16, how: str = "inner") -> DataFrame:
    """Hot-key join salting for the cases AQE's skew-join split does NOT
    cover: AQE rewrites skewed SORT-MERGE joins in batch plans only —
    stream-static joins, stream-stream joins, and plans pinned to a
    specific strategy see no runtime splitting, and a single hot key
    (the null-ish user, the default tenant) still lands every matching
    row on one reducer.

    Mechanics: the big side gets a deterministic per-row salt in
    [0, salt_buckets); the small side is replicated ``salt_buckets``×
    (explode of a literal range — replication factor is a visible cost,
    salt_buckets·|small| rows through the shuffle); the equi-join runs on
    key+salt, so a hot key's rows spread over ``salt_buckets`` reducers.
    Result is row-identical to ``big.join(small, on, how)``: each big row
    carries exactly ONE salt value and matches exactly the replica set
    with that salt, so multiplicities are preserved (including duplicate
    keys on the small side).

    ``how`` must be ``inner`` or a left-flavored join (``left``/
    ``left_outer``/``left_semi``/``left_anti``) — right/full joins would
    surface unmatched SMALL-side replicas ``salt_buckets`` times; use the
    plain join (or swap the sides) for those.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} (got {how!r}); "
            "right/full joins would duplicate unmatched small-side rows")
    if salt_buckets < 1:
        raise ValueError(f"salt_buckets must be >= 1 (got {salt_buckets})")
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in on],
                             F.monotonically_increasing_id()),
                  F.lit(salt_buckets)).cast("int")
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])))
    out = big_s.join(small_s, on + ["__salt"], how)
    return out.drop("__salt") if "__salt" in out.columns else out
