"""The computed-column expression language: the reference's whitelist
``{concat, upper, lower, substr, now, format}`` (reference
``migrator.py:783-788``, dispatch ``:854-860``, impl ``:875-977``).

Deliberately NOT an arbitrary-expression surface — the whitelist is the
contract (reference ``README.md:221``). Everything compiles to built-in
Column expressions; ``format`` templates are translated to
``format_string`` printf with the reference's exact null-coercion rules
(``migrator.py:923-936``): numeric ``d``/``f`` specs treat None/NaN/'' as 0,
everything else treats None/NaN as ''.
"""

from __future__ import annotations

import re
import string as _string
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_warehouse_migrate_spark.exceptions import SchemaError

COMPUTED_WHITELIST = frozenset({"concat", "upper", "lower", "substr", "now", "format"})

_CALL_RE = re.compile(r"^\s*([a-zA-Z_][a-zA-Z0-9_]*)\s*\((.*)\)\s*$", re.DOTALL)


class ComputedExpressionError(SchemaError):
    """Invalid computed-column expression — a
    :class:`~data_warehouse_migrate_spark.exceptions.SchemaError`
    (and still a ValueError, as before the typed hierarchy)."""


def _split_args(s: str) -> list[str]:
    """Split a call's argument list on top-level commas (quote-aware)."""
    parts, cur, depth, quote = [], [], 0, None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def _strip_quotes(s: str) -> tuple[str, bool]:
    s = s.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "'\"":
        return s[1:-1], True
    return s, False


def _col_or_lit(arg: str, columns: Sequence[str], pandas_compat: bool) -> Column:
    """An argument is a column if its (unquoted) name matches a DataFrame
    column case-insensitively, else a literal (reference
    ``migrator.py:879-893``). Columns are stringified; with
    ``pandas_compat`` NULL stringifies to 'nan' like pandas ``astype(str)``.
    """
    text, quoted = _strip_quotes(arg)
    low = {c.lower(): c for c in columns}
    if not quoted and text.lower() in low:
        c = F.col(low[text.lower()]).cast("string")
        return F.coalesce(c, F.lit("nan")) if pandas_compat else F.coalesce(c, F.lit(""))
    return F.lit(text)


# ---------------------------------------------------------------------------
# format(template, cols...) — Python str.format → printf translation
# ---------------------------------------------------------------------------

_NUMERIC_SPEC = re.compile(r"^(0?\d*)d$")
_FLOAT_SPEC = re.compile(r"^(0?\d*)(?:\.(\d+))?f$")


def translate_format_template(template: str) -> tuple[str, list[tuple[str | None, str]]]:
    """Translate a Python format template into a printf format string plus
    an ordered list of ``(field_name_or_None, kind)`` where kind is
    ``'int' | 'float' | 'str'``. Positional fields get ``field_name=None``
    and consume the call's column arguments in order
    (reference ``README.md:224-263``).

    Raises ComputedExpressionError on specs we cannot translate (the
    supported surface is the reference's documented one: s/d/f with
    optional zero-pad width; there is NO udf fallback — unsupported specs
    fail fast, and validate_mapping runs this translation pre-flight so
    they fail before the pipeline starts).
    """
    fmt_parts: list[str] = []
    fields: list[tuple[str | None, str]] = []
    for literal, field_name, format_spec, conversion in _string.Formatter().parse(template):
        fmt_parts.append(literal.replace("%", "%%"))
        if field_name is None:
            continue
        if conversion:
            raise ComputedExpressionError(f"unsupported conversion !{conversion}")
        spec = format_spec or ""
        name = field_name if field_name != "" else None
        if spec in ("", "s"):
            fmt_parts.append("%s")
            fields.append((name, "str"))
        elif _NUMERIC_SPEC.match(spec):
            width = _NUMERIC_SPEC.match(spec).group(1)
            fmt_parts.append(f"%{width}d" if width else "%d")
            fields.append((name, "int"))
        elif _FLOAT_SPEC.match(spec):
            m = _FLOAT_SPEC.match(spec)
            w = m.group(1) or ""
            p = f".{m.group(2)}" if m.group(2) else ""
            fmt_parts.append(f"%{w}{p}f")
            fields.append((name, "float"))
        else:
            raise ComputedExpressionError(f"unsupported format spec {spec!r}")
    return "".join(fmt_parts), fields


def _format_arg_expr(col: Column, kind: str,
                     is_float_col: bool = False) -> Column:
    """Per-arg null coercion (reference ``migrator.py:923-936``):
    numeric specs: None/NaN/'' → 0; string specs: None/NaN → ''.

    NaN is NOT NULL, so a bare coalesce leaves it through — the float
    path nanvl's it to 0 and the string path empties it, but only when
    the SOURCE column is float-typed (``is_float_col``): a string column
    whose text happens to be "NaN" must pass through verbatim, exactly
    as the reference's isinstance(val, float) check behaves."""
    if kind == "int":
        d = col.cast("string").try_cast("double")
        return F.coalesce(d.try_cast("bigint"), F.lit(0))
    if kind == "float":
        return F.coalesce(F.nanvl(col.cast("string").try_cast("double"),
                                  F.lit(0.0)), F.lit(0.0))
    s = col.cast("string")
    if is_float_col:
        s = F.when(F.isnan(col), F.lit("")).otherwise(s)
    return F.coalesce(s, F.lit(""))


def format_expr(template: str, col_args: Sequence[str], columns: Sequence[str],
                dtypes: dict[str, str] | None = None) -> Column:
    """Compile format(template, cols...) into a JVM-side format_string call.
    ``dtypes`` (column → simple type string) enables the reference's
    float-NaN→'' coercion on string specs; without it a float NaN renders
    'NaN' (only distinguishable from the STRING value "NaN" by type)."""
    printf_fmt, fields = translate_format_template(template)
    low = {c.lower(): c for c in columns}
    dt_low = {c.lower(): t for c, t in (dtypes or {}).items()}
    args: list[Column] = []
    pos = 0
    for name, kind in fields:
        if name is None:
            if pos >= len(col_args):
                raise ComputedExpressionError(
                    f"format template needs {pos + 1} positional args, got {len(col_args)}")
            ref = col_args[pos]
            pos += 1
        else:
            ref = name
        if ref.lower() not in low:
            raise ComputedExpressionError(f"format references unknown column {ref!r}")
        is_float = dt_low.get(ref.lower()) in ("float", "double")
        args.append(_format_arg_expr(F.col(low[ref.lower()]), kind,
                                     is_float_col=is_float))
    return F.format_string(printf_fmt, *args)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def computed_expr(expression: str, columns: Sequence[str],
                  pandas_compat: bool = True,
                  dtypes: dict[str, str] | None = None) -> Column:
    """Compile one computed-column expression string (e.g.
    ``concat(spu_code, '-', size)`` or ``format("{year}-{week:02d}")``)
    into a Column. Whitelist enforced (reference ``migrator.py:783-788``).
    """
    m = _CALL_RE.match(expression)
    if not m:
        raise ComputedExpressionError(f"not a function call: {expression!r}")
    func, argstr = m.group(1).lower(), m.group(2)
    if func not in COMPUTED_WHITELIST:
        raise ComputedExpressionError(
            f"function {func!r} not in whitelist {sorted(COMPUTED_WHITELIST)}")
    args = _split_args(argstr)

    if func == "now":
        # one scalar per run, broadcast (reference migrator.py:877-878)
        return F.current_timestamp()
    if func == "concat":
        if not args:
            raise ComputedExpressionError("concat() needs at least one argument")
        return F.concat(*[_col_or_lit(a, columns, pandas_compat) for a in args])
    if func in ("upper", "lower"):
        if len(args) != 1:
            raise ComputedExpressionError(f"{func}() takes exactly one column")
        col = _col_or_lit(args[0], columns, pandas_compat)
        return F.upper(col) if func == "upper" else F.lower(col)
    if func == "substr":
        # Python slice semantics s[start:start+length] (reference
        # migrator.py:900-905 uses pandas str.slice), INCLUDING negative
        # indices — the old start+1 shift silently returned the wrong
        # characters for start<0 (substr(col,-1) gave the whole string).
        # Both bounds resolve to clamped 0-based offsets against the
        # string's own length, then one 1-based Spark substr.
        if len(args) not in (2, 3):
            raise ComputedExpressionError("substr(col, start[, length])")
        col = _col_or_lit(args[0], columns, pandas_compat)
        start = int(_strip_quotes(args[1])[0])
        ln = F.length(col)
        frm = (F.lit(start) if start >= 0
               else F.greatest(ln + start, F.lit(0)))
        if len(args) == 3:
            end = start + int(_strip_quotes(args[2])[0])
            to = (F.least(F.lit(end), ln) if end >= 0
                  else F.greatest(ln + end, F.lit(0)))
        else:
            to = ln
        return col.substr(frm + 1, F.greatest(to - frm, F.lit(0)))
    if func == "format":
        if not args:
            raise ComputedExpressionError("format(template[, cols...])")
        template, quoted = _strip_quotes(args[0])
        if not quoted:
            raise ComputedExpressionError("format template must be a quoted string")
        col_args = [_strip_quotes(a)[0] for a in args[1:]]
        return format_expr(template, col_args, columns, dtypes=dtypes)
    raise AssertionError("unreachable")


def with_computed_columns(df: DataFrame, computed: dict[str, str],
                          pandas_compat: bool = True) -> DataFrame:
    """Apply computed columns **in config order**; later expressions may
    reference earlier targets; the key overwrites any existing column
    (reference ``README.md:316-317``)."""
    for target, expression in computed.items():
        df = df.withColumn(
            target, computed_expr(expression, df.columns, pandas_compat,
                                  dtypes=dict(df.dtypes)))
    return df
