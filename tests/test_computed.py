"""Computed-column whitelist semantics (reference migrator.py:875-977,
FIXTURES.md F6): concat col/literal resolution, 0-based substr, format
null rules (None week → '00')."""

import pytest
from pyspark.sql import functions as F

from data_warehouse_migrate_spark.functions.computed import (
    ComputedExpressionError,
    computed_expr,
    translate_format_template,
    with_computed_columns,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, "SPU1", "M", 2024, 3, None),
         (2, "SPU2", "L", 2024, None, "x")],
        "id int, spu_code string, size string, year int, week int, note string")


def rows(df):
    return df.orderBy("id").collect()


def test_concat_cols_and_literals(df):
    out = df.withColumn("skc", computed_expr("concat(spu_code, '-', size)", df.columns))
    assert [r.skc for r in rows(out)] == ["SPU1-M", "SPU2-L"]


def test_concat_null_pandas_compat(df):
    # pandas astype(str) renders NaN as 'nan' (reference migrator.py:879-893)
    out = df.withColumn("c", computed_expr("concat(note, '!')", df.columns))
    assert [r.c for r in rows(out)] == ["nan!", "x!"]
    out2 = df.withColumn("c", computed_expr("concat(note, '!')", df.columns, pandas_compat=False))
    assert [r.c for r in rows(out2)] == ["!", "x!"]


def test_upper_lower(df):
    out = df.withColumn("u", computed_expr("upper(size)", df.columns)) \
            .withColumn("l", computed_expr("lower(spu_code)", df.columns))
    r = rows(out)
    assert [x.u for x in r] == ["M", "L"]
    assert [x.l for x in r] == ["spu1", "spu2"]


def test_substr_zero_based(df):
    # reference substr is 0-based (migrator.py:900-905)
    out = df.withColumn("s", computed_expr("substr(spu_code, 1, 2)", df.columns))
    assert [r.s for r in rows(out)] == ["PU", "PU"]
    out2 = df.withColumn("s", computed_expr("substr(spu_code, 1)", df.columns))
    assert [r.s for r in rows(out2)] == ["PU1", "PU2"]


def test_format_named_with_zero_pad_and_null(df):
    # FIXTURES F6: week=NULL → '00' (reference migrator.py:923-936)
    out = df.withColumn("yw", computed_expr('format("{year}-{week:02d}")', df.columns))
    assert [r.yw for r in rows(out)] == ["2024-03", "2024-00"]


def test_format_positional(df):
    out = df.withColumn("yw", computed_expr('format("{}-{:02d}", year, week)', df.columns))
    assert [r.yw for r in rows(out)] == ["2024-03", "2024-00"]


def test_format_string_spec_null_to_empty(df):
    out = df.withColumn("n", computed_expr('format("[{note}]")', df.columns))
    assert [r.n for r in rows(out)] == ["[]", "[x]"]


def test_now_is_constant(df):
    out = df.withColumn("t", computed_expr("now()", df.columns))
    vals = {r.t for r in out.collect()}
    assert len(vals) == 1


def test_whitelist_enforced(df):
    with pytest.raises(ComputedExpressionError):
        computed_expr("sqrt(year)", df.columns)
    with pytest.raises(ComputedExpressionError):
        computed_expr("year + 1", df.columns)


def test_computed_order_and_chaining(df):
    out = with_computed_columns(df, {
        "skc": "concat(spu_code, '-', size)",
        "skc_l": "lower(skc)",          # references previously computed column
        "size": "lower(size)",           # overwrites existing column
    })
    r = rows(out)
    assert [x.skc_l for x in r] == ["spu1-m", "spu2-l"]
    assert [x.size for x in r] == ["m", "l"]


def test_translate_template():
    fmt, fields = translate_format_template("{year}-{week:02d} {:.2f}%")
    assert fmt == "%s-%02d %.2f%%"
    assert fields == [("year", "str"), ("week", "int"), (None, "float")]


def test_substr_negative_python_slice_semantics(spark):
    """substr follows the reference's pandas str.slice (Python slicing),
    including negative indices."""
    df = spark.createDataFrame([("abcde",)], "code string")

    def sub(expr):
        return df.withColumn("s", computed_expr(expr, df.columns)).first().s

    assert sub("substr(code, -1)") == "e"
    assert sub("substr(code, -3)") == "cde"
    assert sub("substr(code, -3, 2)") == "cd"     # s[-3:-1]
    assert sub("substr(code, -3, 3)") == ""       # s[-3:0] — python quirk
    assert sub("substr(code, -10)") == "abcde"    # clamped
    assert sub("substr(code, 10)") == ""
    assert sub("substr(code, 1, 2)") == "bc"      # positive path unchanged


def test_format_float_nan_coercion(spark):
    """Reference rule: numeric f-spec treats NaN as 0; string spec on a
    FLOAT column empties NaN; a string column's literal 'NaN' text passes
    through verbatim."""
    df = spark.createDataFrame(
        [(float("nan"), "NaN"), (1.5, "x")], "v double, s string")
    out = df.select(
        computed_expr('format("{v:.2f}")', df.columns,
                      dtypes=dict(df.dtypes)).alias("f"),
        computed_expr('format("{v}|{s}")', df.columns,
                      dtypes=dict(df.dtypes)).alias("sv")).collect()
    assert out[0].f == "0.00"
    assert out[0].sv == "|NaN"        # float NaN -> ''; string text kept
    assert out[1].f == "1.50"
    assert out[1].sv == "1.5|x"
