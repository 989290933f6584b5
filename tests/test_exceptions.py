"""Typed exception hierarchy (reference exceptions.py:1-38 parity):
every deliberate engine error is catchable as MigrationError AND keeps
the builtin base (ValueError/RuntimeError) it had before the hierarchy
existed, so pre-hierarchy callers keep working."""

import pytest

from data_warehouse_migrate_spark import (
    ConfigurationError,
    ConnectionFailedError,
    DataMigrationError,
    MigrationError,
    SchemaError,
    TableNotFoundError,
)


def test_category_bases():
    assert issubclass(ConfigurationError, MigrationError)
    assert issubclass(ConfigurationError, ValueError)
    assert issubclass(SchemaError, MigrationError)
    assert issubclass(SchemaError, ValueError)
    assert issubclass(ConnectionFailedError, MigrationError)
    assert issubclass(ConnectionFailedError, RuntimeError)
    assert issubclass(TableNotFoundError, MigrationError)
    assert issubclass(TableNotFoundError, RuntimeError)
    assert issubclass(DataMigrationError, MigrationError)
    assert issubclass(DataMigrationError, RuntimeError)


def test_module_errors_join_the_family():
    from data_warehouse_migrate_spark.functions.computed import (
        ComputedExpressionError,
    )
    from data_warehouse_migrate_spark.operators.constraints import (
        NullPolicyViolation,
    )
    from data_warehouse_migrate_spark.operators.mapping import MappingError
    from data_warehouse_migrate_spark.sources import maxcompute

    assert issubclass(MappingError, SchemaError)
    assert issubclass(MappingError, ValueError)  # pre-hierarchy base
    assert issubclass(ComputedExpressionError, SchemaError)
    assert issubclass(ComputedExpressionError, ValueError)
    assert issubclass(NullPolicyViolation, DataMigrationError)
    assert issubclass(NullPolicyViolation, RuntimeError)
    assert issubclass(maxcompute.MaxComputeConnectionError,
                      ConnectionFailedError)
    assert maxcompute.TableNotFoundError is TableNotFoundError


def test_raised_at_existing_sites():
    from data_warehouse_migrate_spark.operators.mapping import (
        Mapping,
        MappingError,
        validate_mapping,
    )
    from data_warehouse_migrate_spark.sources.sinks import MigrationMode

    with pytest.raises(MigrationError):
        MigrationMode.parse("upsert")
    with pytest.raises(ValueError):  # and still the old base
        MigrationMode.parse("upsert")
    with pytest.raises(MappingError):
        validate_mapping(Mapping(rename={"a": "x", "b": "x"}), ["a", "b"])


def test_null_policy_violation_is_data_migration_error(spark):
    from data_warehouse_migrate_spark.operators.constraints import (
        NullPolicyViolation,
        apply_null_policy,
    )

    df = spark.createDataFrame([(1, None), (2, "x")], "id int, v string")
    with pytest.raises(DataMigrationError) as ei:
        apply_null_policy(df, ["v"], policy="fail")
    assert isinstance(ei.value, NullPolicyViolation)
    assert ei.value.null_counts == {"v": 1}
