"""One-off audit: raw pandas dtype parity between every Spark query and its
DuckDB oracle. The driver's value hash is type-sensitive (HUGEINT vs BIGINT
broke metadata_probes in r01 despite equal values); the pytest parity gate
normalizes types, so this stricter check catches that class before the driver.

Run: python tools/dtype_audit.py [sf_dir]
"""
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_warehouse_migrate_spark.queries import ORACLES, QUERIES  # noqa: E402
from data_warehouse_migrate_spark.session import get_spark  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main(sf_dir):
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = []
    for name in sorted(set(QUERIES) & set(ORACLES)):
        try:
            spdf = QUERIES[name](spark, sf_dir).toPandas()
            dpdf = con.execute(ORACLES[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"ERROR {e}"))
            continue
        s_t = {c: str(t) for c, t in spdf.dtypes.items()}
        d_t = {c: str(t) for c, t in dpdf.dtypes.items()}
        if set(s_t) != set(d_t):
            bad.append((name, f"columns differ: {sorted(s_t)} vs {sorted(d_t)}"))
            continue
        diffs = {c: (s_t[c], d_t[c]) for c in s_t if s_t[c] != d_t[c]}
        if diffs:
            bad.append((name, f"dtype diffs: {diffs}"))
        print(f"ok   {name}" if not diffs else f"DIFF {name}: {diffs}")
    print("\n=== SUMMARY ===")
    if not bad:
        print("all dtype-identical")
    for name, msg in bad:
        print(f"{name}: {msg}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
