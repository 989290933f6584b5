"""Constraint operators: null policies fail/fill/skip + typed defaults
(reference migrator.py:509-679)."""

import datetime

import pytest

from data_warehouse_migrate_spark.operators.constraints import (
    NullPolicyViolation,
    apply_defaults_backfill,
    apply_null_policy,
    null_counts,
    parse_default_value,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, "a", 1.0), (2, None, None), (3, "c", 3.0), (4, None, 4.0)],
        "id int, name string, val double")


def test_null_counts_single_pass(df):
    assert null_counts(df, ["name", "val", "id"]) == {"name": 2, "val": 1, "id": 0}


def test_policy_fail(df):
    with pytest.raises(NullPolicyViolation) as e:
        apply_null_policy(df, ["name"], policy="fail")
    assert e.value.null_counts == {"name": 2}
    # no violation → passthrough
    assert apply_null_policy(df, ["id"], policy="fail").count() == 4


def test_policy_skip(df):
    out = apply_null_policy(df, ["name", "val"], policy="skip")
    assert sorted(r.id for r in out.collect()) == [1, 3]


def test_policy_fill_string_only(df):
    # string gets sentinel; numeric intentionally unfilled (migrator.py:655-657)
    out = apply_null_policy(df, ["name", "val"], policy="fill",
                            dest_types={"name": "VARCHAR(255)", "val": "DOUBLE"})
    rows = out.orderBy("id").collect()
    assert [r.name for r in rows] == ["a", "", "c", ""]
    assert rows[1].val is None


def test_parse_default_values():
    assert parse_default_value("0", "bigint") == 0
    assert parse_default_value("1.5", "double") == 1.5
    assert parse_default_value("b'0'", "tinyint(1)") is False
    assert parse_default_value("b'1'", "tinyint(1)") is True
    assert parse_default_value("b'101'", "int") == 5
    assert parse_default_value("0x1F", "bigint") == 31
    assert parse_default_value("true", "boolean") is True
    assert parse_default_value("2024-01-02", "date") == datetime.date(2024, 1, 2)
    assert parse_default_value("2024-01-02 03:04:05", "datetime") == \
        datetime.datetime(2024, 1, 2, 3, 4, 5)
    assert isinstance(parse_default_value("CURRENT_TIMESTAMP", "datetime"),
                      datetime.datetime)
    assert parse_default_value("'x'", "varchar(10)") == "x"
    assert parse_default_value("abc", "bigint") is None


def test_defaults_backfill(df):
    dest_schema = [
        {"name": "name", "type": "varchar(255)", "is_nullable": False, "default": "'?'"},
        {"name": "val", "type": "double", "is_nullable": False, "default": "0"},
        {"name": "id", "type": "bigint", "is_nullable": False, "default": None},
    ]
    out = apply_defaults_backfill(df, dest_schema)
    rows = out.orderBy("id").collect()
    assert [r.name for r in rows] == ["a", "?", "c", "?"]
    assert [r.val for r in rows] == [1.0, 0.0, 3.0, 4.0]


def test_defaults_backfill_nullable_skipped(df):
    dest_schema = [{"name": "name", "type": "varchar", "is_nullable": True, "default": "'?'"}]
    out = apply_defaults_backfill(df, dest_schema)
    assert [r.name for r in out.orderBy("id").collect()] == ["a", None, "c", None]
