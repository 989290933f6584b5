"""Schema layer tests — mirrors reference tests/test_schema_mapper.py semantics
(FIXTURES.md F5)."""

from pyspark.sql import types as T

from data_warehouse_migrate_spark.schema import (
    ColumnSpec,
    bigquery_column_type,
    bigquery_schema,
    dedup_columns,
    mysql_column_type,
    mysql_create_table_ddl,
    parse_source_type,
    to_struct_type,
)


def test_simple_types():
    assert parse_source_type("bigint") == T.LongType()
    assert parse_source_type("int") == T.IntegerType()
    assert parse_source_type("double") == T.DoubleType()
    assert parse_source_type("float") == T.DoubleType()
    assert parse_source_type("string") == T.StringType()
    assert parse_source_type("varchar(64)") == T.StringType()
    assert parse_source_type("boolean") == T.BooleanType()
    assert parse_source_type("datetime") == T.TimestampNTZType()
    assert parse_source_type("timestamp") == T.TimestampType()
    assert parse_source_type("date") == T.DateType()
    assert parse_source_type("binary") == T.BinaryType()


def test_decimal():
    assert parse_source_type("decimal(10,2)") == T.DecimalType(10, 2)
    # bare DECIMAL = MaxCompute's (38,18) on the READ/CAST path — (18,4)
    # there silently nulled values over 14 integer digits; the MySQL DDL
    # mapping keeps the reference's fixed DECIMAL(18,4) independently
    assert parse_source_type("decimal") == T.DecimalType(38, 18)
    assert parse_source_type("decimal(12)") == T.DecimalType(12, 0)


def test_nested_types():
    assert parse_source_type("array<string>") == T.ArrayType(T.StringType())
    assert parse_source_type("array<double>") == T.ArrayType(T.DoubleType())
    assert parse_source_type("map<string,string>") == T.MapType(T.StringType(), T.StringType())
    st = parse_source_type("struct<a:bigint,b:array<string>>")
    assert isinstance(st, T.StructType)
    assert st["a"].dataType == T.LongType()
    assert st["b"].dataType == T.ArrayType(T.StringType())


def test_unknown_type_falls_back_to_string():
    assert parse_source_type("unknown_type") == T.StringType()


def test_partition_columns_excluded():
    schema = [ColumnSpec("id", "bigint"), ColumnSpec("pt", "string", is_partition=True)]
    st = to_struct_type(schema)
    assert [f.name for f in st.fields] == ["id"]


def test_dedup_case_insensitive_first_wins():
    schema = [ColumnSpec("Id", "bigint"), ColumnSpec("id", "string"), ColumnSpec("x", "double")]
    out = dedup_columns(schema)
    assert [c.name for c in out] == ["Id", "x"]
    assert out[0].type == "bigint"


def test_mysql_types():
    assert mysql_column_type("bigint") == "BIGINT"
    assert mysql_column_type("string") == "VARCHAR(255)"
    assert mysql_column_type("decimal(10,2)") == "DECIMAL(18,4)"  # fixed — schema_mapper.py:101-102
    assert mysql_column_type("array<string>") == "TEXT"
    assert mysql_column_type("boolean") == "TINYINT(1)"
    assert mysql_column_type("unknown_t") == "TEXT"
    assert mysql_column_type("string", {"SKU": "VARCHAR(64)"}, "sku") == "VARCHAR(64)"


def test_bigquery_types():
    assert bigquery_column_type("bigint") == {"type": "INT64", "mode": "NULLABLE"}
    assert bigquery_column_type("decimal(10,2)") == {"type": "NUMERIC", "mode": "NULLABLE"}
    arr = bigquery_column_type("array<string>")
    assert arr["type"] == "STRING" and arr["mode"] == "REPEATED"
    mp = bigquery_column_type("map<string,bigint>")
    assert mp["type"] == "RECORD"
    assert [f["name"] for f in mp["fields"]] == ["key", "value"]
    assert bigquery_column_type("unknown_t")["type"] == "STRING"


def test_bq_schema_comment_and_partition():
    schema = [ColumnSpec("id", "bigint", comment="主键"),
              ColumnSpec("pt", "string", is_partition=True)]
    out = bigquery_schema(schema)
    assert len(out) == 1
    assert out[0]["name"] == "id" and out[0]["description"] == "主键"


def test_mysql_ddl():
    ddl = mysql_create_table_ddl("t", [ColumnSpec("id", "bigint"), ColumnSpec("name", "string")])
    assert "`id` BIGINT" in ddl and "`name` VARCHAR(255)" in ddl
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS `t`")
