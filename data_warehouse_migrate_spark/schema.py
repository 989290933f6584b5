"""Schema layer: source type-string parsing, StructType building, DDL generation.

The reference's schema unit is a ``List[Dict]`` of
``{name, type, comment, is_partition}`` fetched from the MaxCompute catalog
(reference ``maxcompute_client.py:61-103``). We keep the same neutral
descriptor (``ColumnSpec``) and derive Spark ``StructType`` / MySQL DDL /
BigQuery-style schemas from it, mirroring the translation tables in
reference ``schema_mapper.py:20-208``.

Unlike the reference we parse ``array<>`` / ``map<>`` / ``struct<>`` fully
and keep them as native Spark types (the reference degrades struct subfields
to an empty RECORD and MySQL complex types to TEXT — ``schema_mapper.py:115-117,
171-179``); DDL generation preserves the reference's lossy behavior because
that is the destination contract.
"""

from __future__ import annotations

import logging
import re
from dataclasses import dataclass

from pyspark.sql import types as T

logger = logging.getLogger(__name__)


@dataclass
class ColumnSpec:
    """Neutral column descriptor — mirrors the reference's schema dict."""

    name: str
    type: str  # source-vocabulary type string, e.g. "bigint", "decimal(10,2)", "array<string>"
    comment: str = ""
    is_partition: bool = False

    @property
    def spark_type(self) -> T.DataType:
        return parse_source_type(self.type)

    def to_struct_field(self) -> T.StructField:
        metadata = {"comment": self.comment} if self.comment else {}
        return T.StructField(self.name, self.spark_type, nullable=True, metadata=metadata)


# ---------------------------------------------------------------------------
# Source type-string parser (MaxCompute vocabulary → Spark types)
# ---------------------------------------------------------------------------

_SIMPLE_TYPES: dict[str, T.DataType] = {
    "bigint": T.LongType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "smallint": T.ShortType(),
    "tinyint": T.ByteType(),
    # reference folds float into FLOAT64 (schema_mapper.py:25-26); keep double
    "double": T.DoubleType(),
    "float": T.DoubleType(),
    "string": T.StringType(),
    "varchar": T.StringType(),
    "char": T.StringType(),
    "boolean": T.BooleanType(),
    # MaxCompute datetime is wall-clock (no zone) → TimestampNTZ
    "datetime": T.TimestampNTZType(),
    "timestamp_ntz": T.TimestampNTZType(),  # Spark simpleString round-trip
    "timestamp": T.TimestampType(),
    "long": T.LongType(),  # Spark simpleString aliases
    "short": T.ShortType(),
    "byte": T.ByteType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
}

_DECIMAL_RE = re.compile(r"^decimal\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?$")
_PAREN_RE = re.compile(r"^(varchar|char)\s*\(\s*\d+\s*\)$")


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside <> or ()."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def parse_source_type(type_str: str) -> T.DataType:
    """Parse a source-vocabulary type string into a Spark DataType.

    Handles the full matrix in SURVEY.md §1.3 including nested
    ``array<...>`` / ``map<...>`` / ``struct<name:type,...>``.
    Unknown types fall back to StringType with a warning, mirroring
    reference ``schema_mapper.py:204-208``.
    """
    s = type_str.strip().lower()
    if s in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[s]
    m = _DECIMAL_RE.match(s)
    if m:
        # bare DECIMAL defaults to MaxCompute's (38,18) — the READ/CAST
        # contract. An (18,4) default here silently nulled any value over
        # 14 integer digits via try_cast; (18,4) is the MySQL DDL
        # mapping's concern (mysql_column_type), not the parse path's.
        p = int(m.group(1)) if m.group(1) else 38
        sc = int(m.group(2)) if m.group(2) else (18 if m.group(1) is None else 0)
        return T.DecimalType(p, sc)
    if _PAREN_RE.match(s):
        return T.StringType()
    if s.startswith("array<") and s.endswith(">"):
        return T.ArrayType(parse_source_type(s[6:-1]))
    if s.startswith("map<") and s.endswith(">"):
        kv = _split_top_level(s[4:-1])
        if len(kv) == 2:
            return T.MapType(parse_source_type(kv[0]), parse_source_type(kv[1]))
    if s.startswith("struct<") and s.endswith(">"):
        fields = []
        for part in _split_top_level(s[7:-1]):
            name, _, ftype = part.partition(":")
            if ftype:
                fields.append(T.StructField(name.strip(), parse_source_type(ftype), True))
        if fields:
            return T.StructType(fields)
    logger.warning("unknown source type %r → falling back to string", type_str)
    return T.StringType()


def to_struct_type(schema: list[ColumnSpec], include_partitions: bool = False) -> T.StructType:
    """Build a Spark StructType; partition columns are excluded by default
    (the reference excludes them from destination schemas —
    ``schema_mapper.py:55-58,83-86``)."""
    return T.StructType([
        c.to_struct_field() for c in schema if include_partitions or not c.is_partition
    ])


def dedup_columns(schema: list[ColumnSpec]) -> list[ColumnSpec]:
    """Case-insensitive first-wins column dedup with warning
    (reference ``migrator.py:595-614``)."""
    seen: set[str] = set()
    out: list[ColumnSpec] = []
    for col in schema:
        key = col.name.lower()
        if key in seen:
            logger.warning("duplicate column %r (case-insensitive) dropped", col.name)
            continue
        seen.add(key)
        out.append(col)
    return out


# ---------------------------------------------------------------------------
# Destination DDL generation
# ---------------------------------------------------------------------------

# reference schema_mapper.py:94-118 (MaxCompute → MySQL)
_MYSQL_TYPE_MAP: dict[str, str] = {
    "bigint": "BIGINT", "int": "BIGINT", "smallint": "BIGINT", "tinyint": "BIGINT",
    "long": "BIGINT", "integer": "BIGINT", "short": "BIGINT", "byte": "BIGINT",
    "double": "DOUBLE", "float": "DOUBLE",
    "string": "VARCHAR(255)", "varchar": "VARCHAR(255)", "char": "VARCHAR(255)",
    "boolean": "TINYINT(1)",
    "datetime": "DATETIME", "timestamp": "TIMESTAMP", "timestamp_ntz": "DATETIME",
    "date": "DATE",
    "binary": "BLOB",
}

# reference schema_mapper.py:20-38 (MaxCompute → BigQuery)
_BQ_TYPE_MAP: dict[str, str] = {
    "bigint": "INT64", "int": "INT64", "smallint": "INT64", "tinyint": "INT64",
    "long": "INT64", "integer": "INT64", "short": "INT64", "byte": "INT64",
    "double": "FLOAT64", "float": "FLOAT64",
    "string": "STRING", "varchar": "STRING", "char": "STRING",
    "boolean": "BOOL",
    "datetime": "DATETIME", "timestamp": "TIMESTAMP", "timestamp_ntz": "DATETIME",
    "date": "DATE",
    "binary": "BYTES",
}


def _base_type(type_str: str) -> str:
    """Strip parameters: 'decimal(10,2)' → 'decimal', 'varchar(64)' → 'varchar'
    (reference ``schema_mapper.py:190-208``)."""
    return re.split(r"[(<]", type_str.strip().lower())[0].strip()


def mysql_column_type(type_str: str, overrides: dict[str, str] | None = None,
                      column: str | None = None) -> str:
    """MaxCompute type → MySQL DDL type (reference ``schema_mapper.py:68-130``).

    ``overrides`` is a per-target-column literal override map, matched
    case-insensitively (reference ``schema_mapper.py:122-128``).
    """
    if overrides and column is not None:
        low = {k.lower(): v for k, v in overrides.items()}
        if column.lower() in low:
            return low[column.lower()]
    base = _base_type(type_str)
    if base == "decimal":
        return "DECIMAL(18,4)"  # fixed regardless of (p,s) — schema_mapper.py:101-102
    if base in ("array", "map", "struct"):
        return "TEXT"  # complex types degrade to TEXT — schema_mapper.py:115-117
    return _MYSQL_TYPE_MAP.get(base, "TEXT")


def bigquery_column_type(type_str: str) -> dict:
    """MaxCompute type → BigQuery-style field descriptor
    (reference ``schema_mapper.py:132-208``). Returns
    ``{'type': str, 'mode': 'NULLABLE'|'REPEATED', 'fields': [...]}``.
    """
    s = type_str.strip().lower()
    base = _base_type(s)
    if base == "array":
        inner = bigquery_column_type(s[6:-1])
        return {"type": inner["type"], "mode": "REPEATED", "fields": inner.get("fields", [])}
    if base == "map":
        # map → RECORD{key STRING, value STRING} (schema_mapper.py:158-170)
        return {"type": "RECORD", "mode": "NULLABLE",
                "fields": [{"name": "key", "type": "STRING"}, {"name": "value", "type": "STRING"}]}
    if base == "struct":
        # reference declares a lossy RECORD with no subfields (schema_mapper.py:171-179)
        return {"type": "RECORD", "mode": "NULLABLE", "fields": []}
    if base == "decimal":
        return {"type": "NUMERIC", "mode": "NULLABLE"}
    if base not in _BQ_TYPE_MAP:
        logger.warning("unknown type %r → STRING (BigQuery)", type_str)
    return {"type": _BQ_TYPE_MAP.get(base, "STRING"), "mode": "NULLABLE"}


def mysql_create_table_ddl(table: str, schema: list[ColumnSpec],
                           overrides: dict[str, str] | None = None) -> str:
    """CREATE TABLE DDL with backtick quoting + case-insensitive dedup
    (reference ``mysql_writer.py:22-44``)."""
    def _bt(name: str) -> str:
        # double embedded backticks — a name from an untrusted catalog
        # must not break out of the quoted identifier
        return name.replace("`", "``")

    cols = dedup_columns([c for c in schema if not c.is_partition])
    defs = ",\n  ".join(
        f"`{_bt(c.name)}` {mysql_column_type(c.type, overrides, c.name)}"
        for c in cols
    )
    return f"CREATE TABLE IF NOT EXISTS `{_bt(table)}` (\n  {defs}\n)"


def bigquery_schema(schema: list[ColumnSpec]) -> list[dict]:
    """Full BigQuery-style schema from source descriptors, partition columns
    excluded (reference ``schema_mapper.py:40-66``)."""
    out = []
    for c in dedup_columns([c for c in schema if not c.is_partition]):
        fld = bigquery_column_type(c.type)
        fld["name"] = c.name
        if c.comment:
            fld["description"] = c.comment
        out.append(fld)
    return out


def specs_from_dataframe(df) -> list[ColumnSpec]:
    """Introspect a DataFrame into ColumnSpecs (the 'source catalog' for
    file-based sources; equivalent of reference ``maxcompute_client.py:61-103``)."""
    out = []
    for f in df.schema.fields:
        out.append(ColumnSpec(name=f.name, type=f.dataType.simpleString(),
                              comment=str(f.metadata.get("comment", "")) if f.metadata else ""))
    return out
