"""Sources and sinks: readers, partition pruning, probes, writers, DDL."""

from data_warehouse_migrate_spark.sources.readers import (
    latest_partition_filter,
    latest_partition_values,
    read_table,
    validate_table_access,
)
from data_warehouse_migrate_spark.sources.sinks import write_table

__all__ = [
    "latest_partition_filter",
    "latest_partition_values",
    "read_table",
    "validate_table_access",
    "write_table",
]
