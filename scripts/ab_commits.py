"""Interleaved A/B of registry queries between two git commits.

Creates (or reuses) detached worktrees for the two refs under
/tmp/dwms_ab_<ref>, then alternates subprocess children — each child
builds a fresh session from ITS worktree's code and times the query
best-of-N — so both code states share every host window (the only
honest protocol on a noisy host; same rationale as ab_join_configs).

Usage: python scripts/ab_commits.py REF_A REF_B query [query ...]
       [--rounds 3] [--draws 2]
child: python scripts/ab_commits.py --child WORKTREE query --draws N
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time


def child(worktree: str, queries: list[str], draws: int) -> None:
    sys.path.insert(0, worktree)
    os.chdir(worktree)
    from data_warehouse_migrate_spark.queries import QUERIES
    from data_warehouse_migrate_spark.session import get_spark

    spark = get_spark("ab-commits")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    out = []
    for q in queries:
        QUERIES[q](spark, sf_dir).count()  # warm-up, untimed
        times = []
        for _ in range(draws):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            QUERIES[q](spark, sf_dir).count()
            times.append(round(time.perf_counter() - t0, 3))
        out.append({"query": q, "draws": times})
    print(json.dumps(out))
    spark.stop()


def ensure_worktree(ref: str) -> str:
    sha = subprocess.run(["git", "rev-parse", "--short", ref],
                         capture_output=True, text=True,
                         check=True).stdout.strip()
    path = f"/tmp/dwms_ab_{sha}"
    if not os.path.isdir(path):
        subprocess.run(["git", "worktree", "add", "--detach", path, sha],
                       check=True)
    return path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("refs_or_queries", nargs="*")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--draws", type=int, default=2)
    ap.add_argument("--child", metavar="WORKTREE")
    args = ap.parse_args()
    if args.child:
        child(args.child, args.refs_or_queries, args.draws)
        return 0
    ref_a, ref_b, *queries = args.refs_or_queries
    wts = {ref_a: ensure_worktree(ref_a), ref_b: ensure_worktree(ref_b)}
    results: dict[str, dict[str, list[float]]] = {
        q: {r: [] for r in wts} for q in queries}
    for rnd in range(args.rounds):
        for ref, wt in wts.items():
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--child", wt] + queries + ["--draws", str(args.draws)]
            env = dict(os.environ, PYTHONPATH=wt)
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 check=True, env=env)
            for rec in json.loads(out.stdout.strip().splitlines()[-1]):
                results[rec["query"]][ref].extend(rec["draws"])
                print(f"  round {rnd} {ref:12s} {rec['query']:22s} "
                      f"{rec['draws']}", file=sys.stderr)
    summary = {q: {r: {"best": min(ts),
                       "median": round(statistics.median(ts), 3),
                       "draws": ts}
                   for r, ts in rs.items()} for q, rs in results.items()}
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
