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

logger = logging.getLogger(__name__)


class MigrationMode(str, enum.Enum):
    APPEND = "append"
    OVERWRITE = "overwrite"

    @classmethod
    def parse(cls, s: str) -> "MigrationMode":
        try:
            return cls(s.lower())
        except ValueError:
            raise ValueError(
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
