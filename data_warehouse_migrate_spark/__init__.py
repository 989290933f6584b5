"""data_warehouse_migrate_spark — a PySpark-native batch ETL / analytics engine.

A from-scratch reimplementation of the capabilities of
``wadekun/data-warehouse-migrate`` (a single-pipeline MaxCompute→BigQuery/MySQL
migrator) on top of the Spark DataFrame API, extended with the operators a
large-scale LLM training-data pipeline needs (dedup, similarity search,
multimodal columns, text analysis).

Design principles (see SURVEY.md §7):
  * Declarative plans — ``spark.read`` → narrow transforms → ``df.write``;
    Catalyst does pruning/pushdown, no hand-scheduled batching.
  * The reference's per-batch pandas loop (reference ``migrator.py:277-343``)
    collapses into one lazy DataFrame chain; one write action replaces the loop.
  * Semantics (null tokens, boolean parsing, string preservation, 0-based
    substr, format null rules) are reproduced exactly — they are the
    reference's real contract.
"""

from data_warehouse_migrate_spark.session import get_spark, stop_spark
from data_warehouse_migrate_spark.schema import (
    ColumnSpec,
    parse_source_type,
    to_struct_type,
    dedup_columns,
)
from data_warehouse_migrate_spark.exceptions import (
    MigrationError,
    ConfigurationError,
    SchemaError,
    ConnectionFailedError,
    TableNotFoundError,
    DataMigrationError,
)

__all__ = [
    "get_spark",
    "stop_spark",
    "ColumnSpec",
    "parse_source_type",
    "to_struct_type",
    "dedup_columns",
    "MigrationError",
    "ConfigurationError",
    "SchemaError",
    "ConnectionFailedError",
    "TableNotFoundError",
    "DataMigrationError",
]

__version__ = "0.1.0"
