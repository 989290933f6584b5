"""Source-schema-driven cast expressions.

The reference's central design commitment: values are coerced to the
*declared* source type, never inferred (reference ``migrator.py:345-507``,
``README.md:400-408``). Numeric-looking string status codes must stay
strings. Every cast is a ``try_cast`` — a per-column cast failure must
never fail the job (reference ``migrator.py:385-386``).

All expressions are built-in Column functions (JVM-side, codegen-friendly);
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from data_warehouse_migrate_spark.schema import _base_type, parse_source_type

# reference migrator.py:431-446 (strip + lower first)
TRUTHY_TOKENS = ("true", "1", "yes", "y")
FALSY_TOKENS = ("false", "0", "no", "n", "")

# reference migrator.py:95-96, config.py:50-52 — literal string null tokens
STRING_NULL_TOKENS = ("nan", "none", "null", "<na>")


# Python str.strip()'s whitespace set (str.isspace): regex \s plus the
# C0 separators \x1c-\x1f, NEL \x85, and the unicode space category
_PY_WS = r"[\s\x1c-\x1f\x85\u00a0\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]"


def _pystrip(col: Column) -> Column:
    """Python ``str.strip()`` semantics: ALL leading/trailing whitespace.
    Spark's ``trim`` removes only spaces — '\\r'/'\\t'/'\\x1f' would
    survive and flip token classification (found by hypothesis)."""
    return F.regexp_replace(col, f"^{_PY_WS}+|{_PY_WS}+$", "")


def boolean_token_expr(col: Column, unknown_to_null: bool = True) -> Column:
    """Parse boolean tokens: 'true','1','yes','y' → True;
    'false','0','no','n','' → False; unknown → NULL (reference
    ``migrator.py:431-446``) or False (legacy client variant,
    ``maxcompute_client.py:438-451``) when ``unknown_to_null=False``.
    Non-string inputs are stringified first, mirroring the pandas path;
    stripping matches Python ``str.strip()``, not SQL ``trim``.
    """
    s = F.lower(_pystrip(col.cast("string")))
    expr = (
        F.when(col.isNull(), F.lit(None).cast("boolean"))
        .when(s.isin(*TRUTHY_TOKENS), F.lit(True))
        .when(s.isin(*FALSY_TOKENS), F.lit(False))
    )
    return expr.otherwise(F.lit(None).cast("boolean") if unknown_to_null else F.lit(False))


def string_preserve_expr(col: Column,
                         preserve_null_tokens: bool = True,
                         treat_empty_as_null: bool = False) -> Column:
    """Force-preserve a column as string (reference ``migrator.py:449-473``).

    With ``preserve_null_tokens`` (the default —
    ``preserve_string_null_tokens=true``), literal tokens like 'nan'/'None'/
    'null'/'<NA>' stay as strings; disabled, they convert to NULL
    case-insensitively. Empty string → NULL only if ``treat_empty_as_null``
    (reference ``maxcompute_client.py:366-378``, default false).
    """
    s = col.cast("string")
    if not preserve_null_tokens:
        s = F.when(F.lower(s).isin(*STRING_NULL_TOKENS), F.lit(None)).otherwise(s)
    if treat_empty_as_null:
        # reference uses Python .strip() (maxcompute_client.py:369)
        s = F.when(_pystrip(s) == "", F.lit(None)).otherwise(s)
    return s


def inf_nan_to_null(col: Column) -> Column:
    """±inf → NULL in float columns (reference ``migrator.py:503-505``,
    ``bigquery_client.py:273-278``); NaN → NULL likewise (the Arrow path
    treats NaN as missing)."""
    c = col.cast("double")
    return F.when(F.isnan(c) | c.isin(float("inf"), float("-inf")), F.lit(None).cast("double")).otherwise(c)


def _int_cast(col: Column, target: str) -> Column:
    """Integer cast with the reference's '1.0' → 1 semantics
    (``pd.to_numeric`` then int64 — reference ``migrator.py:411-422``,
    ``maxcompute_client.py:406-411``): parse as double first, then truncate.
    Spark nullable longs make the reference's NaN→float64 widening hack
    unnecessary (SURVEY.md §1.3).
    """
    return col.cast("string").try_cast("double").try_cast(target)


def cast_expr_for_source_type(col: Column, type_str: str,
                              preserve_null_tokens: bool = True,
                              treat_empty_as_null: bool = False) -> Column:
    """The T3 operator (reference ``migrator.py:345-394``): one cast
    expression per declared source type. Unknown types pass through as
    strings.
    """
    base = _base_type(type_str)
    if base in ("bigint", "int", "integer", "smallint", "tinyint",
                "long", "short", "byte"):
        spark_t = {"bigint": "bigint", "int": "int", "integer": "int",
                   "smallint": "smallint", "tinyint": "tinyint",
                   "long": "bigint", "short": "smallint", "byte": "tinyint"}[base]
        return _int_cast(col, spark_t)
    if base in ("double", "float"):
        return inf_nan_to_null(col.cast("string").try_cast("double"))
    if base == "decimal":
        dt = parse_source_type(type_str)
        return col.cast("string").try_cast(dt.simpleString())
    if base in ("string", "varchar", "char"):
        return string_preserve_expr(col, preserve_null_tokens, treat_empty_as_null)
    if base == "boolean":
        return boolean_token_expr(col)
    if base in ("datetime", "timestamp_ntz"):
        return col.cast("string").try_cast("timestamp_ntz")
    if base == "timestamp":
        return col.cast("string").try_cast("timestamp")
    if base == "date":
        return col.cast("string").try_cast("date")
    if base == "binary":
        return col.cast("binary")
    if base in ("array", "map", "struct"):
        # already-typed nested values pass through; no coercion path in the
        # reference for complex types (they only exist in schema translation)
        return col
    return col.cast("string")


def apply_source_schema(df, schema, preserve_null_tokens: bool = True,
                        treat_empty_as_null: bool = False):
    """Apply declared source types to a whole DataFrame in one select —
    the reference's per-batch ``_apply_source_schema_types`` collapses into
    a single narrow projection (no shuffle).

    ``schema`` is a list of ``ColumnSpec``; columns absent from the
    DataFrame are ignored, extra DataFrame columns pass through unchanged
    (matching the reference's per-column, never-fail-the-batch behavior).
    """
    from pyspark.sql import types as T

    by_name = {c.name.lower(): c for c in schema}
    exprs = []
    for f in df.schema.fields:
        spec = by_name.get(f.name.lower())
        if spec is None:
            exprs.append(F.col(f.name))
            continue
        target = parse_source_type(spec.type)
        # Fast path: column already has the declared type → no string
        # round-trip. Keeps parquet predicate pushdown intact and saves a
        # cast chain per column per row at scale. Semantics preserved:
        # string identity holds under default flags, doubles still get the
        # inf/NaN cleanup the reference applies unconditionally.
        if f.dataType == target:
            if isinstance(target, T.DoubleType):
                exprs.append(inf_nan_to_null(F.col(f.name)).alias(f.name))
            elif isinstance(target, T.StringType) and (
                    not preserve_null_tokens or treat_empty_as_null):
                exprs.append(string_preserve_expr(
                    F.col(f.name), preserve_null_tokens, treat_empty_as_null
                ).alias(f.name))
            else:
                exprs.append(F.col(f.name))
            continue
        exprs.append(
            cast_expr_for_source_type(
                F.col(f.name), spec.type,
                preserve_null_tokens=preserve_null_tokens,
                treat_empty_as_null=treat_empty_as_null,
            ).alias(f.name)
        )
    return df.select(*exprs)


# ---------------------------------------------------------------------------
# schema-drift reconciliation (beyond-reference: the reference moves a
# table once, so drift never bites it; an INCREMENTAL sync meets the same
# table again after the source added/widened/dropped columns)
# ---------------------------------------------------------------------------

# widenings that cannot lose information (order within each chain
# matters). Cross-family moves are NOT free and are handled explicitly
# in _is_lossless_widening: bigint→double loses integers above 2^53,
# int→decimal(p,s) overflows (→NULL, non-ANSI) when p−s has too few
# integer digits — both are narrowing in disguise.
_WIDEN_CHAINS = (
    ["byte", "short", "int", "bigint"],
    ["float", "double"],
    ["date", "timestamp"],
)

# max decimal digits of each integer type (for int→decimal admission)
_INT_DIGITS = {"byte": 3, "short": 5, "int": 10, "bigint": 19}

# integer types double represents exactly (|x| < 2^53); float is exact
# in double by construction
_DOUBLE_EXACT = {"byte", "short", "int", "float"}


def _is_lossless_widening(src: str, tgt: str) -> bool:
    """True iff CAST(src AS tgt) cannot lose information for ANY value."""
    s, t = src.split("(")[0], tgt.split("(")[0]
    if s == t and src == tgt:
        return True
    for chain in _WIDEN_CHAINS:
        if s in chain and t in chain:
            return chain.index(s) <= chain.index(t)
    if t == "double":
        return s in _DOUBLE_EXACT
    if t == "decimal":
        try:
            p2, s2 = (tgt.split("(")[1].rstrip(")").split(",") + ["0"])[:2]
            p2, s2 = int(p2), int(s2)
        except (IndexError, ValueError):
            return False
        if s in _INT_DIGITS:
            # p−s integer digits must hold the whole int range
            return p2 - s2 >= _INT_DIGITS[s]
        if s == "decimal":
            # wider precision AND no scale reduction
            try:
                p1, s1 = (src.split("(")[1].rstrip(")").split(",")
                          + ["0"])[:2]
                p1, s1 = int(p1), int(s1)
            except (IndexError, ValueError):
                return False
            return s2 >= s1 and p2 - s2 >= p1 - s1
    return False


def reconcile_to_schema(df, target_schema,
                        on_narrowing: str = "error"):
    """Project ``df`` onto ``target_schema`` for schema-drift tolerance:

      * columns MISSING from ``df`` appear as typed NULLs (the source
        dropped them, or the destination is ahead);
      * columns whose type sits BELOW the target on a lossless widening
        chain (int→bigint, float→double, date→timestamp, int→double) are
        cast up;
      * EXTRA source columns are dropped (disclosed via the return — the
        destination's schema is the contract);
      * a NARROWING mismatch (bigint source → int target, string →
        anything) is an error by default — silent truncation corrupts;
        ``on_narrowing='try_cast'`` opts into the engine's
        cast-failure→NULL convention instead.

    Column matching is case-insensitive (the engine's mapping convention);
    output order and names follow ``target_schema``. Pure projection —
    no shuffle, no data pass. Returns the reconciled DataFrame.
    """
    if on_narrowing not in ("error", "try_cast"):
        raise ValueError(f"on_narrowing must be 'error' or 'try_cast' "
                         f"(got {on_narrowing!r})")
    by_lower = {c.lower(): c for c in df.columns}
    src_types = {f.name.lower(): f.dataType.simpleString()
                 for f in df.schema.fields}
    out = []
    for fld in target_schema.fields:
        key = fld.name.lower()
        tgt_t = fld.dataType.simpleString()
        if key not in by_lower:
            out.append(F.lit(None).cast(fld.dataType).alias(fld.name))
            continue
        src_c = by_lower[key]
        src_t = src_types[key]
        if src_t == tgt_t:
            out.append(F.col(src_c).alias(fld.name))
            continue
        if _is_lossless_widening(src_t, tgt_t):
            out.append(F.col(src_c).cast(fld.dataType).alias(fld.name))
            continue
        if on_narrowing == "error":
            raise ValueError(
                f"narrowing/incompatible drift on {fld.name!r}: source "
                f"{src_t} -> target {tgt_t}; pass on_narrowing='try_cast' "
                "to accept cast-failure->NULL semantics")
        out.append(F.col(src_c).try_cast(fld.dataType).alias(fld.name))
    return df.select(*out)
