"""Scaling evidence for the touched dedup/embedding family at 10x data
(r17 verdict item 9): run each operator on the duplicate-heavy stress
corpus (bench.build_stress_tables, same parameters as bench.run_stress)
under local[32] AND local[8], interleaved child sessions, and report
the 8-core/32-core wall ratio per operator. At sf0.1 the family is
floor-bound (22/26 headline queries ran as fast on 8 cores in r17); at
10x the compute should dominate and 32 cores should win (ratio > 1).

Usage: python scripts/stress_scaling.py [--factor 10] [--rounds 2]
child: python scripts/stress_scaling.py --child CPUS --factor N
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPS = ["minhash_lsh_pairs", "ngram_jaccard_pairs", "simhash_near_pairs",
       "embedding_near_dups_auto", "near_dup_keep_pipeline",
       "semantic_dedup"]


def child(cpus: int, factor: int) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from bench import build_stress_tables
    from data_warehouse_migrate_spark.operators.dedup import (
        embedding_near_dups,
        minhash_lsh_pairs,
        near_dup_removal,
        ngram_jaccard_pairs,
        semantic_dedup,
        simhash_near_pairs,
    )
    from data_warehouse_migrate_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(f"stress-scaling-{cpus}", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    sdir = build_stress_tables(sf_dir, factor)
    docs = spark.read.parquet(f"{sdir}/documents.parquet")
    emb = spark.read.parquet(f"{sdir}/embeddings.parquet")
    docs.count()  # warm file index + JVM

    fns = {
        "minhash_lsh_pairs": lambda: minhash_lsh_pairs(
            docs, "text", "doc_id", n=3, k=16, bands=8, threshold=0.6),
        "ngram_jaccard_pairs": lambda: ngram_jaccard_pairs(
            docs, "text", "doc_id", n=3, threshold=0.6),
        "simhash_near_pairs": lambda: simhash_near_pairs(
            docs, "text", "doc_id", max_hamming=3, bands=4),
        "embedding_near_dups_auto": lambda: embedding_near_dups(
            emb, "embedding", "vec_id"),
        "near_dup_keep_pipeline": lambda: near_dup_removal(
            docs, simhash_near_pairs(docs, "text", "doc_id",
                                     max_hamming=3, bands=4), "doc_id"),
        "semantic_dedup": lambda: semantic_dedup(
            emb, "embedding", "vec_id", n_cells=8, threshold=0.95),
    }
    out = {}
    for name in OPS:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = fns[name]().count()
        out[name] = {"sec": round(time.perf_counter() - t0, 3), "rows": n}
    print(json.dumps({"cpus": cpus, "ops": out}))
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--child", type=int)
    args = ap.parse_args()
    if args.child:
        child(args.child, args.factor)
        return 0
    results: dict[str, dict[int, list[float]]] = {
        n: {32: [], 8: []} for n in OPS}
    rows: dict[str, int] = {}
    for rnd in range(args.rounds):
        for cpus in (32, 8):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--child", str(cpus), "--factor", str(args.factor)],
                capture_output=True, text=True, check=True,
                env=dict(os.environ, PYTHONPATH=os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__)))))
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            for name, v in rec["ops"].items():
                results[name][cpus].append(v["sec"])
                rows[name] = v["rows"]
                print(f"  round {rnd} c{cpus:2d} {name:26s} "
                      f"{v['sec']:8.3f}s rows={v['rows']}",
                      file=sys.stderr)
    summary = {}
    for name in OPS:
        b32 = min(results[name][32])
        b8 = min(results[name][8])
        summary[name] = {
            "best_32c": b32, "best_8c": b8,
            "ratio_8c_over_32c": round(b8 / b32, 2),
            "rows": rows.get(name),
            "draws_32c": results[name][32], "draws_8c": results[name][8]}
    print(json.dumps({"factor": args.factor, "summary": summary}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
