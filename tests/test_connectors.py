"""Adapter tests for the public-connector modules (MaxCompute source /
BigQuery sink), fully mocked — pyodps and the spark-bigquery-connector jar
are intentionally absent from this environment, so the tests pin the
adapter LOGIC (SQL construction, pruning semantics, mode mapping, option
assembly, soft-import errors) against fakes, exactly the way the
reference's own suite mocks its clients.
"""

from __future__ import annotations

import pytest

from data_warehouse_migrate_spark.sources.bigquery import write_bigquery
from data_warehouse_migrate_spark.sources.maxcompute import (
    FULL_SCAN_GUARD_LIMIT,
    MaxComputeConnectionError,
    MaxComputeSource,
    TableNotFoundError,
)

# ---------------------------------------------------------------------------
# fakes for the pyodps surface the adapter touches
# ---------------------------------------------------------------------------


class _Col:
    def __init__(self, name, typ, comment=""):
        self.name, self.type, self.comment = name, typ, comment


class _Schema:
    def __init__(self, columns, partitions=()):
        self.columns = columns
        self.partitions = list(partitions)


class _Partition:
    def __init__(self, spec):
        self.partition_spec = spec


class _Table:
    def __init__(self, schema, partitions=()):
        self.table_schema = schema
        self.partitions = [_Partition(s) for s in partitions]


class _Reader:
    def __init__(self, pdf):
        self._pdf = pdf

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def to_pandas(self):
        return self._pdf


class _Result:
    def __init__(self, pdf):
        self._pdf = pdf

    def open_reader(self):
        return _Reader(self._pdf)


class _FakeODPS:
    def __init__(self, tables, data=None):
        self._tables = tables
        self._data = data
        self.executed_sql = []

    def get_table(self, name):
        return self._tables.get(name)

    def execute_sql(self, sql):
        self.executed_sql.append(sql)
        return _Result(self._data)


def _plain_table():
    return _Table(_Schema([_Col("id", "bigint"), _Col("name", "string")]))


def _pt_table(specs):
    return _Table(
        _Schema([_Col("id", "bigint")], partitions=[_Col("pt", "string")]),
        partitions=specs)


# ---------------------------------------------------------------------------
# MaxCompute adapter
# ---------------------------------------------------------------------------


def test_mc_schema_reference_shape():
    t = _Table(_Schema([_Col("id", "bigint", "pk"), _Col("v", "double")],
                       partitions=[_Col("pt", "string"),
                                   _Col("hour", "string")]))
    src = MaxComputeSource(odps=_FakeODPS({"t": t}))
    cols = src.get_table_schema("t")
    assert cols == [
        {"name": "id", "type": "bigint", "comment": "pk",
         "is_partition": False},
        {"name": "v", "type": "double", "comment": "", "is_partition": False},
        {"name": "pt", "type": "string", "comment": "", "is_partition": True},
        {"name": "hour", "type": "string", "comment": "",
         "is_partition": True},
    ]


def test_mc_missing_table_raises():
    src = MaxComputeSource(odps=_FakeODPS({}))
    with pytest.raises(TableNotFoundError):
        src.get_table_schema("nope")
    with pytest.raises(TableNotFoundError):
        src.build_select_sql("nope")


def test_mc_incomplete_params():
    with pytest.raises(MaxComputeConnectionError):
        MaxComputeSource(access_id="a")  # no secret / endpoint


def test_mc_soft_import_error_names_pyodps():
    src = MaxComputeSource(access_id="a", secret_access_key="s",
                           endpoint="http://example.invalid/api")
    with pytest.raises(ImportError, match="pyodps"):
        _ = src.odps


def test_mc_select_plain_table():
    src = MaxComputeSource(odps=_FakeODPS({"t": _plain_table()}))
    assert src.build_select_sql("t") == "SELECT * FROM t"
    assert src.build_select_sql("t", limit=10) == "SELECT * FROM t LIMIT 10"


def test_mc_select_pt_latest_partition():
    t = _pt_table(["pt=2024-01-01", "pt=2024-01-03", "pt=2024-01-02"])
    src = MaxComputeSource(odps=_FakeODPS({"t": t}))
    assert (src.build_select_sql("t")
            == "SELECT * FROM t WHERE pt = '2024-01-03'")


def test_mc_select_pt_empty_applies_guard():
    t = _pt_table([])  # partitioned by pt but no partition has data
    src = MaxComputeSource(odps=_FakeODPS({"t": t}))
    assert (src.build_select_sql("t")
            == f"SELECT * FROM t LIMIT {FULL_SCAN_GUARD_LIMIT}")
    # an explicit limit suppresses the guard (reference behaviour)
    assert src.build_select_sql("t", limit=5) == "SELECT * FROM t LIMIT 5"


def test_mc_select_multi_partition_independent_max():
    t = _Table(
        _Schema([_Col("id", "bigint")],
                partitions=[_Col("dt", "string"), _Col("hour", "string")]),
        partitions=["dt=2024-01-01,hour=23", "dt=2024-01-02,hour=03"])
    src = MaxComputeSource(odps=_FakeODPS({"t": t}))
    # each column pruned to its INDEPENDENT max — the documented reference
    # quirk (dt=01-02 with hour=23 may name a partition with no rows)
    assert (src.build_select_sql("t")
            == "SELECT * FROM t WHERE dt = '2024-01-02' AND hour = '23'")


def test_mc_partition_value_quote_escaped():
    t = _pt_table(["pt=o'brien"])
    src = MaxComputeSource(odps=_FakeODPS({"t": t}))
    assert "pt = 'o''brien'" in src.build_select_sql("t")


def test_mc_read_table_roundtrip(spark):
    import pandas as pd

    pdf = pd.DataFrame({"id": [1, 2, 3], "name": ["a", "b", "c"]})
    fake = _FakeODPS({"t": _plain_table()}, data=pdf)
    src = MaxComputeSource(odps=fake)
    df = src.read_table(spark, "t", limit=3)
    assert fake.executed_sql == ["SELECT * FROM t LIMIT 3"]
    assert sorted((r.id, r.name) for r in df.collect()) == [
        (1, "a"), (2, "b"), (3, "c")]


# ---------------------------------------------------------------------------
# BigQuery adapter
# ---------------------------------------------------------------------------


class _WriterRecorder:
    def __init__(self, store):
        self._s = store

    def format(self, f):
        self._s["format"] = f
        return self

    def mode(self, m):
        self._s["mode"] = m
        return self

    def option(self, k, v):
        self._s.setdefault("options", {})[k] = v
        return self

    def save(self):
        self._s["saved"] = True


class _FakeDF:
    def __init__(self, store):
        self.sparkSession = None
        self._s = store

    @property
    def write(self):
        return _WriterRecorder(self._s)


def test_bq_mode_mapping_and_options(monkeypatch):
    from data_warehouse_migrate_spark.sources import bigquery as bq

    monkeypatch.setattr(bq, "bigquery_connector_available", lambda s: True)
    store: dict = {}
    write_bigquery(_FakeDF(store), "ds", "tbl", mode="overwrite",
                   project="proj", write_method="indirect",
                   temporary_gcs_bucket="bkt", validate_schema=False,
                   partitionField="dt")
    assert store["format"] == "bigquery"
    assert store["mode"] == "overwrite"          # ↔ WRITE_TRUNCATE
    assert store["options"]["table"] == "proj:ds.tbl"
    assert store["options"]["writeMethod"] == "indirect"
    assert store["options"]["temporaryGcsBucket"] == "bkt"
    assert store["options"]["partitionField"] == "dt"
    assert store["saved"]


def test_bq_default_direct_no_project(monkeypatch):
    from data_warehouse_migrate_spark.sources import bigquery as bq

    monkeypatch.setattr(bq, "bigquery_connector_available", lambda s: True)
    store: dict = {}
    write_bigquery(_FakeDF(store), "ds", "tbl", validate_schema=False)
    assert store["mode"] == "append"             # ↔ WRITE_APPEND
    assert store["options"]["table"] == "ds.tbl"
    assert store["options"]["writeMethod"] == "direct"


def test_bq_invalid_mode():
    with pytest.raises(ValueError, match="append|overwrite"):
        write_bigquery(_FakeDF({}), "ds", "tbl", mode="replace",
                       validate_schema=False)


def test_bq_missing_connector_names_public_artifact(spark):
    df = spark.createDataFrame([(1,)], "id long")
    if __import__("data_warehouse_migrate_spark.sources.bigquery",
                  fromlist=["bigquery_connector_available"]
                  ).bigquery_connector_available(spark):
        pytest.skip("connector unexpectedly present")
    with pytest.raises(RuntimeError, match="spark-bigquery"):
        write_bigquery(df, "ds", "tbl")


def test_bq_schema_validation_runs(spark):
    # validate_schema=True must translate the frame via the engine's T1
    # path before touching the connector — with the connector absent the
    # error comes AFTER validation, proving the translation accepted it
    df = spark.createDataFrame([(1, "x", 2.5)], "id long, s string, v double")
    with pytest.raises(RuntimeError, match="classpath"):
        write_bigquery(df, "ds", "tbl", validate_schema=True)


@pytest.mark.parametrize("table_fn,limit,expected", [
    # shape 1 — single-pt partitioned, latest value
    # (reference maxcompute_client.py:183-186)
    (lambda: _pt_table(["pt=2024-01-01", "pt=2024-01-03", "pt=2024-01-02"]),
     None, "SELECT * FROM t WHERE pt = '2024-01-03'"),
    (lambda: _pt_table(["pt=2024-01-01", "pt=2024-01-03"]),
     500, "SELECT * FROM t WHERE pt = '2024-01-03' LIMIT 500"),
    # shape 2 — multi-column partitions, each at its independent MAX
    # (reference maxcompute_client.py:196-203)
    (lambda: _Table(
        _Schema([_Col("id", "bigint")],
                partitions=[_Col("dt", "string"), _Col("hour", "string")]),
        partitions=["dt=2024-01-01,hour=23", "dt=2024-01-02,hour=03"]),
     None, "SELECT * FROM t WHERE dt = '2024-01-02' AND hour = '23'"),
    (lambda: _Table(
        _Schema([_Col("id", "bigint")],
                partitions=[_Col("dt", "string"), _Col("hour", "string")]),
        partitions=["dt=2024-01-05,hour=01"]),
     7, "SELECT * FROM t WHERE dt = '2024-01-05' AND hour = '01' LIMIT 7"),
    # shape 3 — partitioned but NO partition values: full-scan guard,
    # suppressed by an explicit limit (reference
    # maxcompute_client.py:187-195, 204-211)
    (lambda: _pt_table([]), None, "SELECT * FROM t LIMIT 100000"),
    (lambda: _pt_table([]), 5, "SELECT * FROM t LIMIT 5"),
    (lambda: _Table(
        _Schema([_Col("id", "bigint")],
                partitions=[_Col("dt", "string")]), partitions=[]),
     None, "SELECT * FROM t LIMIT 100000"),
    # shape 4 — non-partitioned table, explicit limit appended last
    # (reference maxcompute_client.py:177, 213-215)
    (lambda: _plain_table(), None, "SELECT * FROM t"),
    (lambda: _plain_table(), 10, "SELECT * FROM t LIMIT 10"),
])
def test_mc_select_sql_contract_byte_for_byte(table_fn, limit, expected):
    """The adapter's emitted SQL, byte-for-byte, for every shape of the
    reference's _build_select_sql (maxcompute_client.py:165-217):
    single-pt latest, multi-column independent-MAX, no-partition guard
    (and its explicit-limit suppression), and explicit-limit ordering."""
    src = MaxComputeSource(odps=_FakeODPS({"t": table_fn()}))
    assert src.build_select_sql("t", limit=limit) == expected
