"""Cross-round drift attribution over two BENCH_DETAIL.json artifacts.

Mechanizes the read the r11 verdict performed by hand: given a previous
and a current sealed artifact, classify every timed query's timing move
and locate CONTIGUOUS slowdown bands in suite-execution order — the
signature of a transient host-contention window (r11: 11 consecutive
queries at 2.5-8.9x bracketed by faster-than-baseline readings of the
heaviest dedup/LSH families). With r12's ``query_wallclock.t_start``
offsets and ``host_load`` sentinels the band's wall-clock interval and
the nearest load readings come straight from the artifacts.

Attribution rules (the standing counters contract):
  - plan_counters for a query byte-identical across artifacts AND its
    timing moved  -> host noise (band membership says WHICH window);
  - counters moved -> plan/data change: a real regression to bisect —
    band logic does NOT apply, the query is excluded from band
    membership and listed separately;
  - no counter entry on BOTH sides (counters_new, or absent from either
    plan_counters block) -> no counter evidence either way: excluded
    from bands and listed as "unattributable" (ADVICE r12).

Usage:
  python scripts/attribute_drift.py PREV.json NOW.json [--threshold 1.5]
                                    [--min-band 3]

Pure stdlib + bench.compute_plan_counter_diff; prints a human-readable
report and exits 0 (diagnostic, not a gate). Unit-tested in
tests/test_attribute_drift.py on synthetic artifacts.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import compute_plan_counter_diff  # noqa: E402


def all_times(detail: dict) -> dict[str, float]:
    """Headline + extended per-query seconds from one artifact."""
    out = dict(detail.get("queries") or {})
    out.update(detail.get("extended_queries") or {})
    return out


def execution_order(detail: dict) -> list[str]:
    """Timed queries in suite-execution order: by t_start when the
    artifact carries query_wallclock (r12+), else headline-then-extended
    insertion order (pre-r12 artifacts — dict order is the timing loop's
    order in both blocks)."""
    qw = (detail.get("query_wallclock") or {}).get("t_start") or {}
    names = list(all_times(detail))
    if qw:
        return sorted((n for n in names if n in qw), key=lambda n: qw[n])
    return names


def find_bands(order: list[str], ratios: dict[str, float],
               eligible: set[str], threshold: float,
               min_band: int) -> list[list[str]]:
    """Maximal runs of >= min_band consecutive ELIGIBLE queries (plan
    counters unchanged) whose now/prev ratio exceeds threshold.
    Queries missing a ratio (new/removed) or with moved counters break
    a run — a band is only evidence of a host window when the plans
    provably did not move through it."""
    bands: list[list[str]] = []
    run: list[str] = []
    for name in order:
        if (name in eligible and name in ratios
                and ratios[name] > threshold):
            run.append(name)
        else:
            if len(run) >= min_band:
                bands.append(run)
            run = []
    if len(run) >= min_band:
        bands.append(run)
    return bands


def attribute(prev: dict, now: dict, threshold: float = 1.5,
              min_band: int = 3, baseline_source: str | None = None,
              baseline_error: str | None = None) -> dict:
    """The full attribution: counter diff + ratio table + band scan.
    Returns a JSON-able dict (the printable report is rendered from
    it so tests assert on structure, not formatting). baseline_source
    names the file `prev` was loaded from (r15: the loader prefers the
    BENCH_SEAL.json quiet-seal sidecar) for the provenance string;
    baseline_error carries the loader's parse-failure disclosure so
    the embedded diff applies the ADVICE-r11 rule (a corrupt committed
    baseline must not read as a benign first run) exactly like the
    top-level plan_counter_diff does."""
    diff = compute_plan_counter_diff(prev, now.get("plan_counters") or {},
                                     now.get("sf"),
                                     diagnostics=now.get("diagnostics"),
                                     baseline_source=baseline_source,
                                     baseline_error=baseline_error,
                                     session_configs=now.get(
                                         "session_configs"))
    prev_t, now_t = all_times(prev), all_times(now)
    # no ratios across scales: cross-sf seconds are not comparable and
    # a consumer reading the dict (not the early-returning CLI) must
    # not see meaningless over-threshold entries
    comparable = diff.get("baseline") is not None
    ratios = ({n: round(now_t[n] / prev_t[n], 3)
               for n in now_t if n in prev_t and prev_t[n]}
              if comparable else {})
    changed = set(diff.get("counters_changed") or [])
    invalid = set((diff.get("counters_invalid") or [])
                  + (diff.get("baseline_invalid") or []))
    # ADVICE r12: a query timed in both rounds but WITHOUT a counter
    # entry on both sides (counters_new — e.g. a pre-counter baseline
    # artifact — or simply absent from either plan_counters block) has
    # no counter evidence at all: it is neither proven-identical nor
    # proven-moved, so it must not count toward a host-window band.
    # Listed separately as "unattributable" rather than silently mixed
    # into the eligible set.
    prev_pc = set(prev.get("plan_counters") or {})
    now_pc = set(now.get("plan_counters") or {})
    unattributable = {n for n in ratios
                      if n in set(diff.get("counters_new") or [])
                      or n not in prev_pc or n not in now_pc}
    # band-eligible = counters proven identical (not changed, not
    # excluded-as-invalid, and present on BOTH sides of the mechanical
    # comparison)
    eligible = {n for n in ratios
                if n not in changed and n not in invalid
                and n not in unattributable}
    order = execution_order(now)
    bands = find_bands(order, ratios, eligible, threshold, min_band)
    qw = (now.get("query_wallclock") or {}).get("t_start") or {}
    band_info = []
    for band in bands:
        info: dict = {
            "queries": band,
            "ratio_range": [min(ratios[n] for n in band),
                            max(ratios[n] for n in band)],
        }
        if all(n in qw for n in band):
            info["t_start_interval_sec"] = [qw[band[0]], qw[band[-1]]]
        band_info.append(info)
    # ratios_over_threshold is a ROLL-UP since r14 (r13 verdict item 4:
    # 22 scattered host-noise entries published as a raw dict read as a
    # lot of signal when the finding was "no bands, counters unchanged")
    # — a one-line summary with the classified reading leads, the full
    # per-query dict stays under "detail" for bisection.
    over = {n: ratios[n] for n in order if ratios.get(n, 0) > threshold}
    over_changed = sorted(set(over) & changed)
    over_unattr = sorted(set(over) & unattributable)
    banded = {q for b in band_info for q in b["queries"]}
    if not over:
        reading = "none over threshold"
    elif over_changed:
        reading = ("includes REAL plan/data moves "
                   f"({', '.join(over_changed)}) — see counters_changed; "
                   "remainder scattered host noise")
        # ADVICE r14: when counters-changed queries AND a contiguous
        # host-contention band are BOTH over threshold, the one-line
        # reading must name both — "remainder scattered" alone would
        # bury the band in the bands field
        if banded & set(over):
            reading += "; plus contiguous band(s) — see bands"
    elif banded & set(over):
        reading = ("includes contiguous host-contention band(s) — see "
                   "bands; remainder scattered host noise")
    else:
        reading = ("scattered — host noise (counters unchanged"
                   + (f"; {len(over_unattr)} unattributable" if over_unattr
                      else "")
                   + ", no contiguous band)")
    over_rollup = {
        "n_over": len(over),
        "n_ratios": len(ratios),
        "max_ratio": max(over.values()) if over else None,
        "max_query": (max(over, key=lambda n: over[n]) if over else None),
        "reading": reading,
        "detail": over,
    }
    return {
        "comparable": comparable,
        "skipped": diff.get("skipped"),
        # provenance passthrough (r15 review): which committed file the
        # ratios read against, plus the loader's preferred_baseline_error
        # disclosure when the preferred file was corrupt
        "baseline": diff.get("baseline"),
        "counters_changed": sorted(changed),
        # era tag for counters_changed (r17 verdict item 7): config-era
        # deltas are ambiguous between a session-knob flip and an
        # operator change; operator-era deltas are real code/data moves
        "config_era": diff.get("config_era"),
        "unattributable": sorted(unattributable),
        "n_ratios": len(ratios),
        "ratios_over_threshold": over_rollup,
        "bands": band_info,
        "host_load_now": now.get("host_load"),
        "host_load_prev": prev.get("host_load"),
        "threshold": threshold,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("prev")
    ap.add_argument("now")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--min-band", type=int, default=3)
    args = ap.parse_args()
    with open(args.prev) as f:
        prev = json.load(f)
    with open(args.now) as f:
        now = json.load(f)
    rep = attribute(prev, now, args.threshold, args.min_band,
                    baseline_source=os.path.basename(args.prev))
    if not rep["comparable"]:
        print(f"not comparable: {rep['skipped']}")
        return 0
    base = rep.get("baseline") or {}
    print(f"baseline: {base.get('source')} "
          f"(headline {base.get('headline_total_sec')}s)")
    print(f"counters_changed (real plan/data moves to bisect): "
          f"{rep['counters_changed'] or 'none'}")
    if rep["unattributable"]:
        print("unattributable (timed both rounds, no counter evidence "
              "on both sides — excluded from bands): "
              + ", ".join(rep["unattributable"]))
    over = rep["ratios_over_threshold"]
    print(f"{over['n_over']}/{over['n_ratios']} queries over "
          f"{rep['threshold']}x — {over['reading']}"
          + (f" (max {over['max_query']}={over['max_ratio']})"
             if over["n_over"] else ""))
    if over["n_over"]:
        print("  detail: " + ", ".join(f"{n}={r}"
                                       for n, r in over["detail"].items()))
    if rep["bands"]:
        for b in rep["bands"]:
            span = (f" t_start {b['t_start_interval_sec'][0]}-"
                    f"{b['t_start_interval_sec'][1]}s"
                    if "t_start_interval_sec" in b else "")
            print(f"HOST-WINDOW BAND ({len(b['queries'])} consecutive, "
                  f"counters unchanged,{span} "
                  f"ratio {b['ratio_range'][0]}-{b['ratio_range'][1]}x): "
                  + ", ".join(b["queries"]))
        print("attribution: contiguous counter-identical slowdown = "
              "transient host contention in that interval; read "
              "host_load sentinels above/below the interval.")
    else:
        print("no contiguous slowdown band; isolated over-threshold "
              "ratios with unchanged counters are per-query host noise.")
    for label, hl in (("prev", rep["host_load_prev"]),
                      ("now", rep["host_load_now"])):
        if hl:
            print(f"host_load[{label}]: " + ", ".join(
                f"{k}={v}" for k, v in hl.items() if k != "source"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
