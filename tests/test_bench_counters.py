"""Unit contract for bench.py's mechanized plan-counter diff (r10
verdict item 2): the committed BENCH_DETAIL.json field the judge reads
for host-vs-plan attribution must classify changed / unchanged / new /
invalid entries correctly and refuse cross-scale comparisons.

No Spark session needed — pure-dict logic."""

from bench import compute_plan_counter_diff

C1 = {"shuffle_write_bytes": 100, "input_bytes": 50, "input_records": 5}
C2 = {"shuffle_write_bytes": 999, "input_bytes": 50, "input_records": 5}
BAD = {"invalid_eviction_rollover": True, "shuffle_write_bytes": -3,
       "input_bytes": 50, "input_records": 5}


def _prev(counters, sf="0.1", total=15.5):
    return {"plan_counters": counters, "sf": sf,
            "headline_total_sec": total}


def test_changed_unchanged_new_partition():
    prev = _prev({"a": C1, "b": C1, "gone": C1})
    now = {"a": C1, "b": C2, "fresh": C1}
    d = compute_plan_counter_diff(prev, now, "0.1")
    assert d["counters_changed"] == ["b"]
    assert d["counters_changed_detail"]["b"] == {"prev": C1, "now": C2}
    assert d["counters_unchanged"] == 1          # a
    assert d["counters_new"] == ["fresh"]
    assert d["counters_removed"] == ["gone"]     # timed set shrank
    assert d["counters_invalid"] == []
    assert d["baseline"]["headline_total_sec"] == 15.5
    assert d["baseline"]["n_queries"] == 3


def test_invalid_rollover_excluded_both_sides():
    """A flagged delta (negative component — status-store eviction
    between snapshots) must not surface as a phantom plan change,
    whichever side carries the flag."""
    prev = _prev({"a": BAD, "b": C1})
    now = {"a": C1, "b": BAD}
    d = compute_plan_counter_diff(prev, now, "0.1")
    assert d["counters_changed"] == []
    assert d["counters_unchanged"] == 0
    assert d["counters_invalid"] == ["b"]        # flagged THIS run only
    assert d["baseline_invalid"] == ["a"]        # flagged in the baseline


def test_unflagged_negative_baseline_is_invalid():
    """Artifacts sealed before the flag existed carry raw negative
    components (the r10 seal's span_decontaminate entry:
    input_records -2540064) — they must be excluded like flagged ones,
    not reported as a plan change."""
    neg = {"shuffle_write_bytes": 1230599, "input_bytes": -61125,
           "input_records": -2540064}
    d = compute_plan_counter_diff(_prev({"a": neg, "b": C1}),
                                  {"a": C1, "b": C1}, "0.1")
    assert d["counters_changed"] == []
    assert d["counters_unchanged"] == 1          # b
    assert d["baseline_invalid"] == ["a"]
    assert d["counters_invalid"] == []


def test_sf_mismatch_skips():
    d = compute_plan_counter_diff(_prev({"a": C1}, sf="0.1"),
                                  {"a": C2}, "0.01")
    assert d["baseline"] is None
    assert "0.01" in d["skipped"] and "0.1" in d["skipped"]
    assert "counters_changed" not in d


def test_no_previous_artifact_skips():
    d = compute_plan_counter_diff({}, {"a": C1}, "0.1")
    assert d["baseline"] is None
    assert d["skipped"] == "no previous artifact"


def test_unreadable_baseline_is_not_a_first_run():
    """ADVICE r11: a committed baseline artifact that EXISTS but fails
    to parse is a baseline-integrity failure — the skipped reason must
    disclose it, not degrade to the benign 'no previous artifact'."""
    d = compute_plan_counter_diff({}, {"a": C1}, "0.1",
                                  baseline_error="JSONDecodeError: "
                                                 "Expecting value")
    assert d["baseline"] is None
    assert "unreadable" in d["skipped"]
    assert "JSONDecodeError" in d["skipped"]
    # a genuinely missing file (no error) keeps the benign reason
    d2 = compute_plan_counter_diff({}, {"a": C1}, "0.1")
    assert d2["skipped"] == "no previous artifact"
    # a parse error must never be reported when a baseline DID load
    # (defensive: error only matters when prev is empty)
    d3 = compute_plan_counter_diff(_prev({"a": C1}), {"a": C1}, "0.1",
                                   baseline_error=None)
    assert d3["counters_unchanged"] == 1


def test_diagnostics_diff_rides_along():
    """The dedup/LSH family's bespoke volume counters get the same
    mechanical changed/unchanged/new classification when passed (pure
    counts — no rollover class, plain equality)."""
    D1 = {"band_rows": 40000, "candidate_pairs": 986}
    D2 = {"band_rows": 40000, "candidate_pairs": 999}
    prev = _prev({"a": C1})
    prev["diagnostics"] = {"minhash": D1, "simhash": D1}
    d = compute_plan_counter_diff(
        prev, {"a": C1}, "0.1",
        diagnostics={"minhash": D1, "simhash": D2, "fresh": D1})
    assert d["diagnostics_changed"] == ["simhash"]
    assert d["diagnostics_unchanged"] == 1
    assert d["diagnostics_new"] == ["fresh"]
    assert d["diagnostics_removed"] == []
    # omitted => no diagnostics keys at all (backward-compatible shape)
    d2 = compute_plan_counter_diff(prev, {"a": C1}, "0.1")
    assert "diagnostics_changed" not in d2


def test_diagnostics_removed_mirrors_counters_removed():
    """ADVICE r11: a diagnostics family present in the baseline but
    absent from this run (a dropped dedup/LSH evidence set) must be
    listed, symmetric with counters_removed — a shrinking evidence set
    must not read as host noise."""
    D1 = {"band_rows": 40000}
    prev = _prev({"a": C1})
    prev["diagnostics"] = {"minhash": D1, "dropped_family": D1}
    d = compute_plan_counter_diff(prev, {"a": C1}, "0.1",
                                  diagnostics={"minhash": D1})
    assert d["diagnostics_removed"] == ["dropped_family"]
    assert d["diagnostics_changed"] == []
    assert d["diagnostics_unchanged"] == 1


def test_committed_artifact_carries_r12_evidence_fields():
    """Artifact-integrity / seal check (not a code unit test): the
    committed BENCH_DETAIL.json must keep the r12 evidence surface —
    per-query suite timeline (query_wallclock), host-load sentinels,
    and the paired interleaved flagship contract — because a reseal
    that silently dropped any of them would strip the next round's
    drift attribution. Shape-only (values are run-specific). ADVICE
    r12: SKIPS (not fails) when the artifact predates the r12 fields —
    a smoke/partial reseal mid-session must not fail unrelated CI; the
    full-bench seal before commit restores the fields and the check."""
    import json
    import os

    import pytest

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DETAIL.json")
    d = json.load(open(path))
    if not {"query_wallclock", "host_load"} <= set(d):
        pytest.skip("BENCH_DETAIL.json predates the r12 evidence fields "
                    "(smoke/partial artifact) — reseal with a full bench "
                    "run before committing")

    qw = d["query_wallclock"]
    assert set(qw) >= {"unit", "t_start", "draws"}
    # every timed query (headline + extended) has a start offset and
    # at least the min_draws timed draws
    timed = set(d["queries"]) | set(d["extended_queries"])
    assert set(qw["t_start"]) == timed
    assert all(isinstance(v, float) and v >= 0
               for v in qw["t_start"].values())
    assert all(len(qw["draws"][n]) >= 2 for n in timed)
    # t_start offsets are strictly increasing in execution order
    # (ADVICE r12: non-decreasing let two queries share a rounded-3dp
    # offset; each query's slot includes a warm-up run, so a genuine
    # tie is impossible and strictness is the honest assert)
    order = [qw["t_start"][n] for n in list(d["queries"])
             + list(d["extended_queries"])]
    assert all(a < b for a, b in zip(order, order[1:]))

    hl = d["host_load"]
    assert set(hl) >= {"source", "start", "mid", "flagship_pairing",
                       "end"}
    for k in ("start", "mid", "flagship_pairing", "end"):
        assert hl[k] is None or (len(hl[k]) == 3
                                 and all(v >= 0 for v in hl[k]))

    pi = d["baseline"]["reference_single_node"]["paired_interleaved"]
    assert len(pi["draws"]) == 5
    for p in pi["draws"]:
        assert set(p) == {"spark_sec", "ref_sec", "ratio"}
        # relative tolerance: the fields are independently rounded to
        # 3dp, and a smoke artifact's small ref_sec amplifies the
        # recomputation error of an absolute bound
        assert (abs(p["ratio"] - p["spark_sec"] / p["ref_sec"])
                < 0.05 * max(1.0, p["ratio"]))
    assert pi["ratio_min_of_pairs"] == min(p["ratio"]
                                           for p in pi["draws"])
    # median-of-pairs is the binding headline since r13 (r12 verdict
    # item 3 — min-of-pairs biases low when a burst hits one side of a
    # pair); draws' ratios are already 3dp so the median is exact
    assert pi["ratio_median_of_pairs"] == sorted(
        p["ratio"] for p in pi["draws"])[2]

    # plan_counters stay timestamp-free (byte-identity contract)
    for c in d["plan_counters"].values():
        assert "t_start" not in c

    # r13: the sealed drift attribution must ship with the artifact —
    # band list (or explicitly none), per-query over-threshold ratios,
    # and the unattributable set (ADVICE r12). Tolerate a pre-r13
    # artifact the same way as above.
    if "drift_attribution" in d:
        da = d["drift_attribution"]
        assert "error" not in da, da
        assert {"comparable", "bands", "unattributable",
                "ratios_over_threshold"} <= set(da)


def test_crossover_localization_block_is_consistent():
    """Unit contract for the sealed crossover-localization evidence
    (r13 verdict item 3): the static block bench.py ships into
    index_contract.crossover must stay internally consistent — the
    located interval matches the points, the DRAW-STABLE ordering holds
    (below 1.0 at 2x in both draws, >= 1.0 at the located 3x point in
    both, above 1.0 at 5x in both — per-point monotonicity is a draw-1
    reading only, ADVICE r13), and the caveats that must travel with
    any citation (draw-1 monotonicity, stress-protocol recall
    tie-ambiguity) are present. Pure-dict, no Spark."""
    from bench import CROSSOVER_LOCALIZATION as X

    pts = {p["factor"]: p for p in X["points"]}
    assert sorted(pts) == [1, 2, 3, 5, 10, 20]
    rows = {p["factor"]: p["rows"] for p in X["points"]}
    assert X["located_interval_rows"] == [rows[2], rows[5]]
    assert rows[2] < X["located_rows"] <= rows[5]
    assert X["located_rows"] == rows[3]
    # draw-stable ordering (the binding evidence):
    for d in ("speedup_draw1", "speedup_draw2"):
        assert pts[2][d] < 1.0                    # below crossover
        assert pts[3][d] >= 1.0                   # straddles/at crossover
        assert pts[5][d] > 1.0                    # above crossover
    # sealed curve margins past the crossover (draw 1 = sealed readings)
    assert pts[10]["speedup_draw1"] > 3 and pts[20]["speedup_draw1"] > 3
    assert pts[20]["speedup_draw1"] > pts[10]["speedup_draw1"]
    # the two disclosed caveats must travel with the block; since r15
    # caveat (2) carries the MEASURED refutation of the old
    # tie-ambiguity attribution (r14 verdict item 5) — tie-aware recall
    # equals set recall at every localization point, so the dips are
    # genuine near-neighbor misses, not tie artifacts
    assert "draw-1" in X["caveats"] or "DRAW-1" in X["caveats"]
    assert "REFUTES" in X["caveats"]
    assert "tie-aware" in X["caveats"]
    for p in X["points"]:
        ta = p.get("recall_at_5_tie_aware")
        if p["source"] == "localization run":
            # measured r15: equal to set recall (the refutation)
            assert ta == p["recall_at_5_indexed"]
        else:
            # sealed-curve factors: live re-run carries tie-aware
            assert ta is None
    assert "locate_index_crossover" in X["provenance"]
    assert X["measured_round"] == "r13"
    assert X["tie_aware_recall_measured_round"] == "r15"


def test_committed_artifact_carries_r14_evidence_fields():
    """Artifact-integrity / seal check: the committed BENCH_DETAIL.json
    must carry the r14 evidence surface — the sealed crossover
    localization under index_contract.crossover (byte-equal to the
    bench.py constant, so a drive-by edit of either side fails), the
    early-suite cold paired draw plus the warm pairing's suite_position
    field (r13 verdict item 5), and the ratios_over_threshold roll-up
    (item 4). SKIPS (not fails) when the artifact predates the r14
    fields — same ADVICE-r12 rationale as the r12 check above."""
    import json
    import os

    import pytest

    from bench import CROSSOVER_LOCALIZATION

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DETAIL.json")
    d = json.load(open(path))
    ic = d.get("index_contract") or {}
    if "crossover" not in ic:
        pytest.skip("BENCH_DETAIL.json predates the r14 evidence fields "
                    "(pre-r14 or smoke/partial artifact) — reseal with a "
                    "full bench run before committing")

    assert ic["crossover"] == CROSSOVER_LOCALIZATION

    # ADVICE r14: tie the LIVE index-contract points to the static
    # block's claimed ordering — the static evidence says sf scale is
    # below the crossover and the 10x/20x design points above it; if a
    # live SEAL ever contradicts that (live sf_scale crossing 1.0, or
    # live stress dropping below it), the seal must fail so the static
    # block is re-derived rather than silently contradicted. Gated to
    # seal artifacts only (r15 review): BENCH_DETAIL.json may be a
    # driver rerun from a loaded host whose sub-second probe timings
    # straddle 1.0 — that is host noise on a non-seal artifact, not a
    # contradiction of the sealed claim (the same rationale that moved
    # the quiet-host requirement to the sidecar); the sidecar test
    # applies these same asserts unconditionally. Artifacts that
    # predate the sidecar field are builder seals by protocol.
    if d.get("seal_sidecar", {"written": True})["written"]:
        live_sf = ic.get("sf_scale") or {}
        if live_sf.get("probe_speedup") is not None:
            assert live_sf["probe_speedup"] < 1.0, (
                "live sf_scale probe_speedup crossed 1.0 — re-derive "
                "the CROSSOVER_LOCALIZATION block (scripts/"
                "locate_index_crossover.py)")
        for key in ("stress_x10", "stress_x20"):
            live = ic.get(key) or {}
            if live.get("probe_speedup") is not None:
                assert live["probe_speedup"] > 1.0, (
                    f"live {key} probe_speedup fell below 1.0 — the "
                    "sealed crossover claim no longer holds; re-derive "
                    "the block")

    rsn = d["baseline"]["reference_single_node"]
    esp = rsn["early_suite_pair"]
    # the pair is a guarded diagnostic (ADVICE r14): an exception
    # records {'error': ...} and a zero ref timing records ratio=None —
    # both are disclosed shapes, not integrity failures (r15 review:
    # the old asserts crashed with TypeError/ZeroDivisionError on
    # exactly the shapes the guard deliberately produces)
    if "error" not in esp:
        assert {"suite_position", "spark_sec", "ref_sec",
                "ratio"} <= set(esp)
        if esp["ratio"] is not None and esp["ref_sec"]:
            assert (abs(esp["ratio"] - esp["spark_sec"] / esp["ref_sec"])
                    < 0.05 * max(1.0, esp["ratio"]))
        else:
            assert esp["ratio"] is None and not esp["ref_sec"]
    assert "suite_position" in rsn["paired_interleaved"]

    da = d.get("drift_attribution") or {}
    over = da.get("ratios_over_threshold")
    if isinstance(over, dict) and "reading" in over:
        assert {"n_over", "n_ratios", "max_ratio", "max_query",
                "reading", "detail"} <= set(over)
        assert over["n_over"] == len(over["detail"])
        if over["n_over"]:
            assert over["max_ratio"] == max(over["detail"].values())


def test_committed_artifact_carries_r15_evidence_fields():
    """Artifact-integrity / seal check: the committed BENCH_DETAIL.json
    must carry the r15 evidence surface — the host_quiet_at_start
    sentinel (r14 verdict item 3: the seal-timing lesson as a machine
    flag, not PLANS.md prose), the early_suite_pair_history series
    (item 4, byte-equal to the bench.py constant like the crossover
    block), and the tie-aware recall columns in the live index-contract
    points (item 5). SKIPS when the artifact predates the r15 fields —
    same ADVICE-r12 rationale as the checks above."""
    import json
    import os

    import pytest

    from bench import EARLY_SUITE_PAIR_HISTORY, QUIET_LOAD_1MIN_THRESHOLD

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DETAIL.json")
    d = json.load(open(path))
    if "host_quiet_at_start" not in d:
        pytest.skip("BENCH_DETAIL.json predates the r15 evidence fields "
                    "(pre-r15 or smoke/partial artifact) — reseal with a "
                    "full bench run before committing")

    hq = d["host_quiet_at_start"]
    assert {"loadavg_1min", "threshold", "status", "note"} <= set(hq)
    assert hq["threshold"] == QUIET_LOAD_1MIN_THRESHOLD
    # the sentinel is AMBIENT load at process start (pre-JVM) — the
    # first r15 seal draw proved the post-warm-up placement always
    # warns on the bench's own spin-up, so it must NOT equal the
    # post-warm-up host_load.start reading's role; status must be
    # consistent with the recorded value
    assert "AMBIENT" in hq["note"]
    if hq["loadavg_1min"] is None:
        assert hq["status"] == "unknown"
    else:
        expect = ("pass" if hq["loadavg_1min"] < hq["threshold"]
                  else "warn")
        assert hq["status"] == expect
    # NOTE (r15, sidecar change): the quiet-host REQUIREMENT lives on
    # BENCH_SEAL.json now (test_committed_seal_sidecar_is_quiet below)
    # — BENCH_DETAIL.json may legitimately carry status 'warn' after
    # the driver's round-end rerun overwrites it on a loaded host;
    # requiring pass here would make the suite start red every round
    # whose driver window was noisy, through no code's fault.

    rsn = d["baseline"]["reference_single_node"]
    hist = rsn["early_suite_pair_history"]
    # subset-compatibility, not byte-equality (r15 review): the
    # constant grows by one entry per sealed round, and the committed
    # artifact necessarily predates any append made after its seal
    for k, v in hist["series"].items():
        assert EARLY_SUITE_PAIR_HISTORY["series"].get(k) == v, k
    assert {"r14_seal", "r14_driver_rerun",
            "r14_discarded_draw"} <= set(hist["series"])
    assert all(isinstance(v, float) and v > 0
               for v in hist["series"].values())

    # tie-aware recall rides beside set recall in every live
    # index-contract point's recall block (r14 verdict item 5): under
    # the duplicate-heavy stress protocol tie-aware >= set recall by
    # construction
    ic = d.get("index_contract") or {}
    for key, block in ic.items():
        rec = (block or {}).get("recall_at_k") if isinstance(block, dict) \
            else None
        if not isinstance(rec, dict):
            continue
        for m in ("lsh_topk", "lsh_topk_indexed", "ivf_topk"):
            if m in rec:
                assert f"{m}_tie_aware" in rec, (key, m)
                assert rec[f"{m}_tie_aware"] >= rec[m], (key, m)


def _write_json(path, obj):
    import json
    path.write_text(json.dumps(obj))


def test_load_drift_baseline_prefers_seal_sidecar(tmp_path):
    """r15 mechanization: with both files present the quiet-seal
    sidecar wins — the driver's round-end rerun overwrites
    BENCH_DETAIL.json with a potentially noisy window, and the r15
    session measured exactly that (drift baseline at HEAD was the r14
    driver's 18.38s run, not the 13.12s committed seal)."""
    from bench import load_drift_baseline

    _write_json(tmp_path / "BENCH_SEAL.json",
                {"sf": "0.1", "headline_total_sec": 13.1})
    _write_json(tmp_path / "BENCH_DETAIL.json",
                {"sf": "0.1", "headline_total_sec": 18.4})
    d, src, err = load_drift_baseline(str(tmp_path))
    assert src == "BENCH_SEAL.json"
    assert d["headline_total_sec"] == 13.1
    assert err is None


def test_load_drift_baseline_falls_back_to_detail(tmp_path):
    from bench import load_drift_baseline

    _write_json(tmp_path / "BENCH_DETAIL.json",
                {"sf": "0.1", "headline_total_sec": 18.4})
    d, src, err = load_drift_baseline(str(tmp_path))
    assert src == "BENCH_DETAIL.json"
    assert d["headline_total_sec"] == 18.4
    assert err is None


def test_load_drift_baseline_corrupt_seal_discloses_and_falls_back(tmp_path):
    """ADVICE-r11 rule applied to the fallback chain: a seal sidecar
    that EXISTS but does not parse is disclosed in the error string
    even when the detail artifact supplies a usable baseline."""
    from bench import compute_plan_counter_diff, load_drift_baseline

    (tmp_path / "BENCH_SEAL.json").write_text("{truncated")
    _write_json(tmp_path / "BENCH_DETAIL.json",
                {"sf": "0.1", "headline_total_sec": 18.4,
                 "plan_counters": {"a": dict(C1)}})
    d, src, err = load_drift_baseline(str(tmp_path))
    assert src == "BENCH_DETAIL.json"
    assert d["headline_total_sec"] == 18.4
    assert err and "BENCH_SEAL.json" in err and "JSONDecodeError" in err
    # ...and the diff's baseline block carries the disclosure
    diff = compute_plan_counter_diff(d, {"a": dict(C1)}, "0.1",
                                     baseline_error=err,
                                     baseline_source=src)
    assert diff["baseline"]["preferred_baseline_error"] == err
    assert "BENCH_DETAIL.json" in diff["baseline"]["source"]


def test_load_drift_baseline_sf_aware_fallback(tmp_path):
    """r15 review: a committed sf0.1 seal must not eclipse a
    matching-sf BENCH_DETAIL.json for runs at other scales — the
    loader passes over a parseable sf-mismatched candidate when a
    later candidate matches, else returns the first parseable one so
    the diff reports the mismatch explicitly."""
    from bench import load_drift_baseline

    _write_json(tmp_path / "BENCH_SEAL.json",
                {"sf": "0.1", "headline_total_sec": 13.5})
    _write_json(tmp_path / "BENCH_DETAIL.json",
                {"sf": "0.05", "headline_total_sec": 6.2})
    # run at sf0.05: the detail artifact matches, the seal does not
    d, src, err = load_drift_baseline(str(tmp_path), sf="0.05")
    assert src == "BENCH_DETAIL.json" and d["sf"] == "0.05"
    # run at sf0.1: the seal matches and wins
    d, src, _ = load_drift_baseline(str(tmp_path), sf="0.1")
    assert src == "BENCH_SEAL.json" and d["sf"] == "0.1"
    # run at a scale NEITHER matches: first parseable returned so the
    # diff's sf-mismatch skip names the right baseline
    d, src, _ = load_drift_baseline(str(tmp_path), sf="0.01")
    assert src == "BENCH_SEAL.json" and d["sf"] == "0.1"
    # no sf requested: preference order unchanged
    d, src, _ = load_drift_baseline(str(tmp_path))
    assert src == "BENCH_SEAL.json"


def test_attribute_discloses_corrupt_baseline(tmp_path):
    """r15 review: the embedded drift block must apply the ADVICE-r11
    rule like the top-level diff — a corrupt committed baseline is not
    a benign first run."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "attribute_drift",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "attribute_drift.py"))
    ad = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ad)

    now = {"sf": "0.1", "queries": {"a": 1.0},
           "plan_counters": {"a": dict(C1)}}
    rep = ad.attribute({}, now,
                       baseline_error="BENCH_SEAL.json: JSONDecodeError: x")
    assert not rep["comparable"]
    assert "unreadable" in rep["skipped"]
    assert "BENCH_SEAL.json" in rep["skipped"]
    # without the error the same shape is a benign first run
    rep2 = ad.attribute({}, now)
    assert rep2["skipped"] == "no previous artifact"


def test_skipped_message_blames_the_corrupt_file_not_the_fallback():
    """r15 review: seal corrupt + detail parsed-but-counterless must
    not claim the DETAIL file 'did not parse' — both facts disclosed,
    each attributed to the right file."""
    d = compute_plan_counter_diff(
        {"sf": "0.1", "headline_total_sec": 18.4}, {"a": dict(C1)}, "0.1",
        baseline_error="BENCH_SEAL.json: JSONDecodeError: x",
        baseline_source="BENCH_DETAIL.json")
    s = d["skipped"]
    assert "no previous artifact with plan counters" in s
    assert "BENCH_DETAIL.json parsed" in s
    assert "BENCH_SEAL.json: JSONDecodeError" in s
    assert "did not parse" not in s.split("(")[0]


def test_seal_sidecar_block_regimes():
    """The sidecar eligibility gate across its five axes: quiet start,
    sf, full run, the run's own band evidence (r15 review: a
    quiet-START run with mid-suite contention bands must not become
    the preferred baseline), and diffuse slowness vs the committed
    seal-series median (r15 verdict item 3)."""
    from functools import partial

    from bench import seal_sidecar_block

    b = partial(seal_sidecar_block, headline_total_sec=12.0)
    assert b("pass", "0.1", True, [])["written"] is True
    assert b("pass", "0.1", True, None)["written"] is True  # no evidence
    assert b("pass", "0.1", True,
             [{"queries": ["x", "y", "z"]}])["written"] is False
    assert b("warn", "0.1", True, [])["written"] is False
    assert b("pass", "0.01", True, [])["written"] is False
    assert b("pass", "0.1", False, [])["written"] is False
    assert b("unknown", "0.1", True, [])["written"] is False


def test_seal_sidecar_diffuse_slowness_axis():
    """r15 verdict item 3: the draw-5 shape — quiet start, band-free,
    full run, headline 19.9s — must be mechanically rejected, while
    every committed seal headline on record stays eligible, and the
    decision evidence rides in the block."""
    from bench import (
        DIFFUSE_SLOWNESS_K,
        SEAL_VS_PUBLISHED_HISTORY,
        _seal_series_median,
        seal_sidecar_block as b,
    )

    med = _seal_series_median()
    assert med is not None and 11.0 < med < 14.0
    # the r15 draw-5 discard, reproduced mechanically
    d5 = b("pass", "0.1", True, [], headline_total_sec=19.9)
    assert d5["written"] is False
    assert d5["diffuse_slowness"]["passed"] is False
    assert d5["diffuse_slowness"]["seal_series_median"] == med
    assert d5["diffuse_slowness"]["k"] == DIFFUSE_SLOWNESS_K
    # every committed seal on record clears the gate
    for sec in [e["seal"] for e in
                SEAL_VS_PUBLISHED_HISTORY["series"].values()] + [13.625]:
        assert b("pass", "0.1", True, [],
                 headline_total_sec=sec)["written"] is True, sec
    # boundary: exactly K x median is eligible, just above is not
    assert b("pass", "0.1", True, [],
             headline_total_sec=DIFFUSE_SLOWNESS_K * med)["written"] is True
    assert b("pass", "0.1", True, [],
             headline_total_sec=DIFFUSE_SLOWNESS_K * med + 0.001
             )["written"] is False
    # a full run with no headline fails closed; a smoke run's missing
    # headline doesn't flip the (already ineligible) decision's axis
    assert b("pass", "0.1", True, [])["diffuse_slowness"]["passed"] is False
    assert b("pass", "0.1", True, [])["written"] is False
    assert b("pass", "0.1", False, [])["diffuse_slowness"]["passed"] is True


def test_load_drift_baseline_no_files_is_benign_first_run(tmp_path):
    from bench import load_drift_baseline

    d, src, err = load_drift_baseline(str(tmp_path))
    assert d == {} and src is None and err is None


def test_seal_vs_published_history_is_internally_consistent():
    """The committed seal-vs-published series (r14 verdict blemish 1):
    every entry carries both readings as positive floats, and the
    r12-r14 rounds the verdict quoted are present."""
    from bench import SEAL_VS_PUBLISHED_HISTORY as H

    assert {"r12", "r13", "r14"} <= set(H["series"])
    for rnd, e in H["series"].items():
        assert {"seal", "published"} <= set(e), rnd
        for v in e.values():
            assert v is None or (isinstance(v, float) and v > 0), (rnd, e)


def test_committed_seal_sidecar_is_quiet():
    """The quiet-host REQUIREMENT, moved here from the BENCH_DETAIL
    check: BENCH_SEAL.json is only ever written by a quiet-start full
    sf0.1 run, so a committed sidecar that is noisy/partial means the
    eligibility gate broke. SKIPS until the first post-sidecar seal
    exists."""
    import json
    import os

    import pytest

    from bench import SEAL_VS_PUBLISHED_HISTORY

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SEAL.json")
    if not os.path.exists(path):
        pytest.skip("no BENCH_SEAL.json yet — first post-r15 seal "
                    "writes it")
    d = json.load(open(path))
    assert d["sf"] == "0.1"
    assert d["host_quiet_at_start"]["status"] == "pass"
    assert d["seal_sidecar"]["written"] is True
    assert d.get("plan_counters"), "sidecar must be a full run"
    assert d.get("index_contract"), "sidecar must include the contract"
    # compatibility-subset, NOT byte-equality (r15 review): the
    # constant's own comment instructs appending an entry when a
    # round's driver number lands, but only a quiet-start full run can
    # refresh the sidecar — byte-equality would brick the suite until
    # the host happens to be quiet. Every round the sidecar DOES carry
    # must match the constant exactly; the constant may have grown.
    sealed_series = d["headline_series"]["series"]
    for rnd, entry in sealed_series.items():
        assert entry == SEAL_VS_PUBLISHED_HISTORY["series"].get(rnd), rnd
    # the live-vs-static crossover ordering (ADVICE r14) applies to the
    # SEAL unconditionally — this artifact is by definition a quiet
    # full run, so a contradiction here is real, not driver noise
    ic = d["index_contract"]
    assert ic["sf_scale"]["probe_speedup"] < 1.0
    assert ic["stress_x10"]["probe_speedup"] > 1.0
    assert ic["stress_x20"]["probe_speedup"] > 1.0
    # hot-bucket contract (r15 verdict item 6): once a post-r16 seal
    # carries the block, the guard must have ENGAGED live on the
    # degenerate corpus and both pair paths must have agreed exactly
    hb = d.get("hot_bucket_contract")
    if hb is not None:
        assert hb["operator_guard_on"]["guard_engaged"] is True
        assert hb["operator_guard_on"]["hot_buckets"] >= 1
        assert hb["operator_guard_on"]["max_bucket"] >= hb["m_hot"]
        assert hb["paths_agree"] is True
        assert (hb["bucket_unit_ab"]["guard_on"]["pairs"]
                == hb["intra_clone_pairs"])


def test_committed_artifact_carries_seal_baseline_fields():
    """BENCH_DETAIL.json (post-sidecar seals) must name which file
    served as its drift baseline and carry the headline series +
    sidecar decision. SKIPS when the artifact predates the r15 sidecar
    fields."""
    import json
    import os

    import pytest

    from bench import SEAL_VS_PUBLISHED_HISTORY

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DETAIL.json")
    d = json.load(open(path))
    if "seal_sidecar" not in d:
        pytest.skip("BENCH_DETAIL.json predates the seal-sidecar "
                    "fields — reseal with a full bench run")
    assert isinstance(d["seal_sidecar"]["written"], bool)
    assert "criteria" in d["seal_sidecar"]
    # subset-compatibility, same rationale as the sidecar test: the
    # constant may gain rounds after this artifact was written
    for rnd, entry in d["headline_series"]["series"].items():
        assert entry == SEAL_VS_PUBLISHED_HISTORY["series"].get(rnd), rnd
    db = d["drift_baseline"]
    assert db["file"] in (None, "BENCH_SEAL.json", "BENCH_DETAIL.json")
    # when a baseline existed its headline rides along for the reader
    if db["file"] is not None:
        assert "headline_total_sec" in db


def test_identical_runs_report_all_unchanged():
    """The steady-state expectation: same code + same data => empty
    changed list, so any timing drift that round is host by contract."""
    prev = _prev({"a": C1, "b": C2})
    d = compute_plan_counter_diff(prev, {"a": dict(C1), "b": dict(C2)},
                                  "0.1")
    assert d["counters_changed"] == []
    assert d["counters_unchanged"] == 2


def test_config_era_tagging():
    """r18 (r17 verdict item 7): counters_changed must carry a
    mechanical era tag — operator-era when the session-config
    fingerprints match, config-era when any key moved, unknown-era when
    the baseline predates the fingerprint — so round docs can no longer
    over-claim 'byte-identical untouched plans' across a config flip."""
    from bench import compute_plan_counter_diff

    counters = {"q1": {"a": 1}, "q2": {"a": 2}}
    prev = {"sf": "0.1", "plan_counters": {"q1": {"a": 1}, "q2": {"a": 9}},
            "session_configs": {"spark.sql.join.preferSortMergeJoin":
                                "true"}}
    now_cfg_same = {"spark.sql.join.preferSortMergeJoin": "true"}
    now_cfg_flip = {"spark.sql.join.preferSortMergeJoin": "false"}

    d = compute_plan_counter_diff(prev, counters, "0.1",
                                  session_configs=now_cfg_same)
    assert d["config_era"]["tag"] == "operator-era"
    assert d["config_era"]["config_keys_changed"] == []
    assert d["counters_changed"] == ["q2"]

    d = compute_plan_counter_diff(prev, counters, "0.1",
                                  session_configs=now_cfg_flip)
    assert d["config_era"]["tag"] == "config-era"
    assert d["config_era"]["config_keys_changed"] == [
        "spark.sql.join.preferSortMergeJoin"]

    old_prev = {"sf": "0.1", "plan_counters": {"q1": {"a": 1}}}
    d = compute_plan_counter_diff(old_prev, counters, "0.1",
                                  session_configs=now_cfg_same)
    assert d["config_era"]["tag"] == "unknown-era"
