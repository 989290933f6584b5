"""Localize the LSH index-contract crossover between sf scale and 10x.

The sealed BENCH_DETAIL.json carries three crossover-curve points
(r12 verdict item 6): probe_speedup 0.74 at sf scale (below the
crossover, disclosed), 3.37 at the 10x design point, 6.51 at 20x.
That brackets the crossover — the corpus size past which the persisted
bucketed index (`build_lsh_index` + `lsh_topk_indexed`) beats inline
`lsh_topk` — somewhere in (1x, 10x), but does not locate it. This
standalone reading runs the SAME `_one_index_contract` protocol from
bench.py (auto-sized planes, 100-query batch, top-5, min-of-2 timings,
recall vs the brute-force exact twin) at intermediate stress factors
to pin the crossover to a factor interval.

Protocol notes:
  - Factors are the same union-scaled duplicate-heavy stress corpora
    as the sealed points (`build_stress_tables`) so the curve is
    one protocol end to end, not a mix.
  - n_buckets is sized to each corpus like the sealed points (8 at
    sf ~8k rows, 16 at 10x ~80k, 24 at 20x) — near-empty bucket files
    would measure task-scheduling floor, not the index.
  - This is an evidence script, NOT part of the seal: it prints one
    JSON document to stdout for PLANS.md; BENCH_DETAIL.json is not
    touched.

Usage (both flag forms accepted — ADVICE r13: the old hand-rolled
parser crashed on the space-separated form its own docstring showed):
  python scripts/locate_index_crossover.py [--factors 2,3,5]
  python scripts/locate_index_crossover.py [--factors=2,3,5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _one_index_contract, build_stress_tables  # noqa: E402
from data_warehouse_migrate_spark.session import get_spark  # noqa: E402


def bucket_count(factor: int) -> int:
    """Match the sealed points' corpus-proportional bucket sizing:
    8 buckets at sf scale (~8k rows), 16 at 10x, 24 at 20x — i.e.
    roughly 8 + 0.8*factor, snapped to multiples of 4 with a floor of
    8 so small intermediate corpora don't scatter into near-empty
    bucket files."""
    return max(8, 4 * round((8 + 0.8 * factor) / 4))


def parse_factors(argv: list[str] | None = None) -> list[int]:
    """argparse accepts both ``--factors 2,3,5`` and ``--factors=2,3,5``
    (ADVICE r13). Split out so tests cover both forms without Spark."""
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--factors", default="2,3,5",
                    help="comma-separated stress factors (default 2,3,5)")
    args = ap.parse_args(argv)
    return [int(x) for x in args.factors.split(",")]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factors = parse_factors(sys.argv[1:])

    spark = get_spark("dwms-crossover")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"sf_dir": sf_dir, "protocol": (
        "bench.py _one_index_contract at intermediate stress factors; "
        "auto-sized planes, 100-query batch, top-5, min-of-2 timings, "
        "recall@5 vs brute-force exact; n_buckets corpus-proportional "
        "like the sealed sf/10x/20x points")}
    for f in factors:
        sdir = build_stress_tables(sf_dir, f)
        emb = spark.read.parquet(f"{sdir}/embeddings.parquet")
        nb = bucket_count(f)
        out[f"stress_x{f}"] = _one_index_contract(
            spark, emb, f"dwms_crossover_idx_x{f}", n_buckets=nb,
            n_planes=None,
            workload=f"top-5 ANN, 100-query batch, auto-sized planes, "
                     f"{f}x stress corpus, {nb} buckets: crossover "
                     f"localization point between the sealed sf (0.74) "
                     f"and 10x (3.37) readings")
        r = out[f"stress_x{f}"]
        print(f"  x{f}: rows={r['index_rows']} "
              f"probe_speedup={r['probe_speedup']} "
              f"recall_indexed={r['recall_at_k']['lsh_topk_indexed']} "
              "tie_aware="
              f"{r['recall_at_k']['lsh_topk_indexed_tie_aware']}",
              file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
