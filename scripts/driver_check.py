"""One-off driver-shaped correctness check at an arbitrary SF.

Stricter than tests/test_oracle_parity.py on types: after sorting columns
by name (like the driver), compares pandas dtype KINDS per column between
the Spark result and the DuckDB oracle result, plus exact values. A kind
mismatch (int vs float vs object/Decimal) is what breaks the driver's
type-sensitive value hash even when values are equal.

Usage: python scripts/driver_check.py [sf_dir] [only_query ...]
"""
import sys

import duckdb
import numpy as np
import pandas as pd

from data_warehouse_migrate_spark.queries import ORACLES, QUERIES
from data_warehouse_migrate_spark.session import get_spark

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def kind(s: pd.Series) -> str:
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    sample = s.dropna()
    if len(sample) and hasattr(sample.iloc[0], "as_tuple"):
        return "decimal"
    if len(sample) and isinstance(sample.iloc[0], (list, np.ndarray)):
        return "array"
    return "object"


def sort_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def key(c: pd.Series):
        if c.dtype != object:
            return c
        # normalize None vs NaN before stringifying, else the two frames
        # sort differently ("None" vs "nan") and rows misalign
        return c.map(lambda v: "" if v is None or
                     (isinstance(v, float) and np.isnan(v)) else str(v))

    return df.sort_values(
        by=list(df.columns), na_position="last", key=key,
    ).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("driver-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    names = sorted(n for n in QUERIES if not only or n in only)
    bad = []
    for name in names:
        try:
            sdf = QUERIES[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error {e}")
            continue
        if name not in ORACLES:
            print(f"rows-only {name}: {len(sdf)} rows")
            continue
        ddf = con.execute(ORACLES[name]).fetchdf()
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rows {len(sdf)} vs {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        else:
            a, b = sort_frame(sdf), sort_frame(ddf)
            for c in a.columns:
                ka, kb = kind(a[c]), kind(b[c])
                if ka != kb:
                    problems.append(f"dtype kind {c}: spark={ka} oracle={kb}")
                    continue
                if len(a) != len(b):
                    continue
                av, bv = a[c], b[c]
                if ka == "float":
                    ok = np.array_equal(av.to_numpy(dtype="float64"),
                                        bv.to_numpy(dtype="float64"),
                                        equal_nan=True)
                elif ka == "array":
                    ok = (av.map(lambda v: tuple(np.asarray(v, dtype="float64")))
                          .tolist() ==
                          bv.map(lambda v: tuple(np.asarray(v, dtype="float64")))
                          .tolist())
                else:
                    ok = (av.where(av.notna(), None).tolist() ==
                          bv.where(bv.notna(), None).tolist())
                if not ok:
                    problems.append(f"values differ in {c}")
        if problems:
            bad.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name}: {len(sdf)} rows")
    print(f"\n{len(bad)} failures of {len(names)} queries")
    for name, why in bad:
        print(f"  {name}: {why}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
