"""Typed exception hierarchy (reference ``exceptions.py:1-38`` parity).

The reference exposes a small catchable family rooted at one base class
(base → connection / table-not-found / schema / migration / config).
This module mirrors that CONTRACT — API users can catch categorically —
without copying its shape-for-shape class list: each class here also
keeps the builtin base (``ValueError``/``RuntimeError``) the engine
raised before the hierarchy existed, so ``except ValueError`` code and
the existing test suite keep working.

Concrete per-module subclasses (``MappingError``,
``ComputedExpressionError``, ``NullPolicyViolation``,
``MaxComputeConnectionError``, ``TableNotFoundError``) live with their
operators and subclass these categories — importing an operator module
never pulls in connector code, and ``except MigrationError`` still
catches everything the engine raises on purpose.
"""

from __future__ import annotations

__all__ = [
    "MigrationError",
    "ConfigurationError",
    "SchemaError",
    "ConnectionFailedError",
    "TableNotFoundError",
    "DataMigrationError",
]


class MigrationError(Exception):
    """Base for every error the engine raises deliberately (reference
    ``DataWarehouseMigrateError``, exceptions.py:6)."""


class ConfigurationError(MigrationError, ValueError):
    """Invalid job/config input — bad mode strings, option combinations
    the engine refuses (reference ``ConfigurationError``,
    exceptions.py:36). Subclasses ValueError: these sites raised
    ValueError before the hierarchy existed."""


class SchemaError(MigrationError, ValueError):
    """Schema/mapping validation or conversion failure (reference
    ``SchemaConversionError``, exceptions.py:26)."""


class ConnectionFailedError(MigrationError, RuntimeError):
    """Source/destination connection or connector-availability failure
    (reference ``MaxComputeConnectionError``/``BigQueryConnectionError``,
    exceptions.py:11-18)."""


class TableNotFoundError(MigrationError, RuntimeError):
    """A referenced table does not exist (reference
    ``TableNotFoundError``, exceptions.py:21)."""


class DataMigrationError(MigrationError, RuntimeError):
    """A migration run failed at execution time — constraint violations,
    partial-apply failures (reference ``DataMigrationError``,
    exceptions.py:31)."""
