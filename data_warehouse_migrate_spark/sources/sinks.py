"""Sinks: mode-aware writers (S9-S14).

Mode semantics (reference ``migrator.py:23-27,181-275``):
  * ``append``    — plain append
  * ``overwrite`` — truncate-then-append for JDBC targets that support it
                    (reference MySQL TRUNCATE, ``mysql_writer.py:63-67``),
                    drop-and-recreate otherwise (reference BigQuery path).

Spark's ``SaveMode`` covers both; for JDBC we surface the reference's
truncate distinction via ``option('truncate','true')`` so the destination
table's DDL (and grants) survive an overwrite.
"""

from __future__ import annotations

import enum
import logging

from pyspark.sql import DataFrame

from data_warehouse_migrate_spark.exceptions import ConfigurationError

logger = logging.getLogger(__name__)


class MigrationMode(str, enum.Enum):
    APPEND = "append"
    OVERWRITE = "overwrite"

    @classmethod
    def parse(cls, s: str) -> "MigrationMode":
        try:
            return cls(s.lower())
        except ValueError:
            raise ConfigurationError(
                f"unknown mode {s!r}; expected one of {[m.value for m in cls]}") from None


def write_table(df: DataFrame, path_or_table: str,
                fmt: str = "parquet",
                mode: str | MigrationMode = MigrationMode.APPEND,
                jdbc_options: dict[str, str] | None = None,
                create_table_column_types: str | None = None,
                partition_by: list[str] | None = None,
                **options) -> None:
    """Unified writer (S9/S10/S13/S14).

    ``create_table_column_types`` carries per-column DDL type overrides into
    JDBC table creation (C6, reference ``schema_mapper.py:122-128``).
    ``partition_by`` enables hive-style layout on file sinks — the scale
    path for downstream partition pruning.
    """
    mode = MigrationMode.parse(mode) if isinstance(mode, str) else mode
    if fmt == "jdbc":
        writer = df.write.format("jdbc").mode(mode.value)
        for k, v in (jdbc_options or {}).items():
            writer = writer.option(k, v)
        writer = writer.option("dbtable", path_or_table)
        if mode is MigrationMode.OVERWRITE:
            # truncate keeps DDL — the reference's MySQL overwrite semantics
            writer = writer.option("truncate", "true")
        if create_table_column_types:
            writer = writer.option("createTableColumnTypes", create_table_column_types)
        writer.save()
        return
    if fmt == "table":
        df.write.mode(mode.value).saveAsTable(path_or_table)
        return
    writer = df.write.mode(mode.value).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        options.setdefault("header", "true")
    writer.options(**options).save(path_or_table)


def write_sized(df: DataFrame, path: str,
                fmt: str = "parquet",
                mode: str | MigrationMode = MigrationMode.OVERWRITE,
                target_file_bytes: int = 128 * 1024 * 1024,
                compression_ratio: float = 0.35,
                partition_by: list[str] | None = None,
                **options) -> int:
    """Write with a TARGET OUTPUT FILE SIZE — the anti-small-files
    operator. A 100 TB pipeline that writes one file per task from a
    4,000-partition shuffle produces 4,000 tiny files per run; readers
    then pay per-file open/footer costs and the namenode holds millions
    of entries. This writer measures the data (one count+avg-bytes
    aggregate via ``functions.sizing``), converts the in-memory estimate
    to on-disk bytes with ``compression_ratio`` (parquet+snappy on mixed
    columns lands around 0.2-0.5; the assumption is a visible knob, not
    a hidden constant), and repartitions to
    ceil(total_disk_bytes / target_file_bytes) before writing.

    Returns the partition (≈ file) count it chose. ``maxRecordsPerFile``
    is set as a belt-and-braces cap so a skewed partition still splits.
    With ``partition_by``, sizing applies per write overall — hive
    partition fan-out multiplies file counts and the caller should size
    against the largest partition instead.

    The repartition is one round-robin shuffle of the output data — the
    price of sized files. Callers that just finished a shuffle on some
    key can instead pass that layout straight through ``write_table``;
    this helper is for compaction and for narrow pipelines whose input
    split count (not data volume) would otherwise dictate file count.
    """
    import math

    from data_warehouse_migrate_spark.functions.sizing import (
        count_and_row_bytes,
    )

    if target_file_bytes <= 0 or not 0.0 < compression_ratio <= 1.0:
        raise ValueError("target_file_bytes must be > 0 and "
                         "compression_ratio in (0, 1]")
    n_rows, row_bytes = count_and_row_bytes(df)
    disk_bytes = n_rows * row_bytes * compression_ratio
    n_files = max(1, math.ceil(disk_bytes / target_file_bytes))
    rows_per_file = max(1, math.ceil(n_rows / n_files)) if n_rows else 1
    options.setdefault("maxRecordsPerFile", str(rows_per_file))
    write_table(df.repartition(n_files), path, fmt=fmt, mode=mode,
                partition_by=partition_by, **options)
    logger.info("write_sized: %d rows ≈ %.1f MB on disk → %d file(s)",
                n_rows, disk_bytes / 1e6, n_files)
    return n_files


def write_clustered(df: DataFrame, path: str, cluster_cols: list[str],
                    n_files: int | None = None,
                    fmt: str = "parquet",
                    mode: str | MigrationMode = MigrationMode.OVERWRITE,
                    **options) -> int:
    """Range-partition + sort-within-partitions on ``cluster_cols`` before
    writing — the zone-map layout. Parquet/ORC footers carry per-row-group
    min/max statistics; when the data is range-clustered those ranges are
    DISJOINT across files, so a predicate on the cluster column skips
    whole files/row-groups at scan time instead of reading and filtering.
    For a 100 TB event table queried by time range, this is the difference
    between scanning one day and scanning the year.

    ``n_files`` defaults to the current partition count. Returns the file
    count written. Range partitioning samples the column to build balanced
    bounds (one extra pass over a sample — the write-time cost of read-time
    skipping); ties/skew fall back to Spark's range exchange semantics.
    """
    n = n_files or df.rdd.getNumPartitions()
    cols = [df[c] for c in cluster_cols]
    clustered = (df.repartitionByRange(n, *cols)
                 .sortWithinPartitions(*cols))
    write_table(clustered, path, fmt=fmt, mode=mode, **options)
    return n


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int = 32,
                   sort_cols: list[str] | None = None,
                   fmt: str = "parquet",
                   mode: str | MigrationMode = MigrationMode.OVERWRITE) -> None:
    """Write a bucketed (and optionally sorted) managed table — the
    co-located-join scale path: two tables bucketed by the same key with
    the same bucket count join WITHOUT a shuffle (and without the sort,
    when sorted within buckets). For a 100 TB fact table joined repeatedly
    on the same key, bucketing pays the shuffle cost once at write time.

    Requires ``saveAsTable`` (bucketing metadata lives in the catalog).
    """
    mode = MigrationMode.parse(mode) if isinstance(mode, str) else mode
    writer = (df.write.mode(mode.value).format(fmt)
              .bucketBy(n_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
