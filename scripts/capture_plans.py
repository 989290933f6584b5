"""Capture .explain("formatted") for registry queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [suffix] [only_query ...]
Writes plans/<tag>/<query>_<suffix>.txt (suffix default "before").

Streaming queries (run eagerly on call) and queries that fail to build are
recorded with the error text instead of a plan, so the sweep never aborts.
"""
import io
import os
import sys

from contextlib import redirect_stdout

from data_warehouse_migrate_spark.queries import QUERIES
from data_warehouse_migrate_spark.session import get_spark


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r17"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dwms-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    # skip the streaming queries: building them RUNS the stream (eager
    # micro-batch execution) and the batch plan of the sink result is not
    # the stream's plan; their plan story lives in the streaming modules
    skip = {n for n in QUERIES if n.endswith("_stream")}
    for name, fn in sorted(QUERIES.items()):
        if only and name not in only:
            continue
        if name in skip:
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            text = f"ERROR building/explaining: {type(exc).__name__}: {exc}\n"
        with open(path, "w") as f:
            f.write(text)
        print(f"  {name}: {len(text)} bytes", file=sys.stderr)
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
