"""A/B: does PAIRING actually immunize the flagship 2x contract against
a transient host-contention window? (r12 validation experiment)

The r11 driver run read a nominal 2.038x breach because the Spark
numerator was measured inside a contention window and the single-thread
reference-loop denominator minutes after it had passed. r12's fix times
the two sides in alternating paired draws. This experiment reproduces
the failure mode ON DEMAND and measures both protocols through it:

  1. quiet_paired     — N paired draws, no induced load (control)
  2. contended_paired — N paired draws while SPINNERS CPU-spinner
                        processes run (both sides share the window)
  3. split_asymmetric — the r11 shape: N spark draws under the SAME
                        induced load, spinners killed, then N reference
                        draws on the quiet host (numerator contended,
                        denominator quiet)

Expectation: contended_paired's min-of-pairs stays in the same regime
as quiet_paired (both engines slow together, the RATIO is load-
invariant to first order), while split_asymmetric's ratio inflates the
way r11's did. Results are printed as one JSON line and the measured
numbers recorded in PLANS.md (protocol history), not in BENCH_DETAIL
(this is a one-off validation, not a per-round artifact).

Usage: python scripts/ab_paired_contention.py [--pairs 3] [--spinners 24]
       (env SPARK_GRAFT_SF_DIR as in bench.py, default /root/testdata/sf0.1)
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import read_loadavg, reference_loop_migrate_sec  # noqa: E402
from data_warehouse_migrate_spark.queries import QUERIES  # noqa: E402
from data_warehouse_migrate_spark.session import get_spark  # noqa: E402


def start_spinners(n: int) -> list[subprocess.Popen]:
    """n detached pure-CPU spinner processes (the contention source)."""
    return [subprocess.Popen(
        [sys.executable, "-c", "while True: pass"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        for _ in range(n)]


def stop_spinners(procs: list[subprocess.Popen]) -> None:
    for p in procs:
        p.send_signal(signal.SIGKILL)
    for p in procs:
        p.wait()


def spark_draw(spark, sf_dir: str) -> float:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    QUERIES["migrate_pipeline"](spark, sf_dir).count()
    return time.perf_counter() - t0


def paired_block(spark, sf_dir: str, pairs: int) -> dict:
    draws = []
    for _ in range(pairs):
        s = spark_draw(spark, sf_dir)
        r = reference_loop_migrate_sec(sf_dir)
        draws.append({"spark_sec": round(s, 3), "ref_sec": round(r, 3),
                      "ratio": round(s / r, 3)})
    return {"draws": draws,
            "ratio_min_of_pairs": min(d["ratio"] for d in draws),
            "loadavg": read_loadavg()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--spinners", type=int, default=24)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("dwms-ab-paired")
    spark.sparkContext.setLogLevel("ERROR")
    # warm both engines once, untimed (bench.py's standing protocol)
    spark_draw(spark, sf_dir)
    reference_loop_migrate_sec(sf_dir)

    out: dict = {"sf_dir": sf_dir, "pairs": args.pairs,
                 "spinners": args.spinners}

    out["quiet_paired"] = paired_block(spark, sf_dir, args.pairs)

    spinners = start_spinners(args.spinners)
    try:
        time.sleep(3)  # let loadavg's 1-min average start moving
        out["contended_paired"] = paired_block(spark, sf_dir, args.pairs)
        # split_asymmetric: spark draws inside the SAME window ...
        split_spark = [round(spark_draw(spark, sf_dir), 3)
                       for _ in range(args.pairs)]
        load_during = read_loadavg()
    finally:
        stop_spinners(spinners)
    time.sleep(3)  # window over — denominator measured on the quiet host
    split_ref = [round(reference_loop_migrate_sec(sf_dir), 3)
                 for _ in range(args.pairs)]
    out["split_asymmetric"] = {
        "spark_draws_contended": split_spark,
        "ref_draws_quiet": split_ref,
        "ratio_min_over_min": round(min(split_spark) / min(split_ref), 3),
        "loadavg_during_spark": load_during,
        "loadavg_during_ref": read_loadavg(),
    }
    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
