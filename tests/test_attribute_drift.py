"""Contract for scripts/attribute_drift.py: the cross-round drift
attribution that mechanizes the r11 verdict's hand-read — contiguous
counter-identical slowdown runs are host windows; counter-moved queries
are real regressions excluded from band membership.

Pure-dict logic, no Spark session."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "attribute_drift",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "attribute_drift.py"))
ad = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ad)

C = {"shuffle_write_bytes": 10, "input_bytes": 5, "input_records": 1}
C_MOVED = {"shuffle_write_bytes": 99, "input_bytes": 5, "input_records": 1}


def _artifact(times, counters, t_start=None, sf="0.1"):
    a = {"sf": sf, "queries": times, "plan_counters": counters}
    if t_start is not None:
        a["query_wallclock"] = {"t_start": t_start}
    return a


def test_contiguous_band_detected_with_interval():
    """Five queries; q2-q4 slow 3x with unchanged counters and are
    consecutive in t_start order -> one band carrying its t_start
    interval; q1/q5 in-band-free."""
    names = ["q1", "q2", "q3", "q4", "q5"]
    prev = _artifact({n: 1.0 for n in names}, {n: C for n in names})
    now_t = {"q1": 1.0, "q2": 3.0, "q3": 2.8, "q4": 3.2, "q5": 0.9}
    ts = {n: float(i * 10) for i, n in enumerate(names)}
    now = _artifact(now_t, {n: dict(C) for n in names}, t_start=ts)
    rep = ad.attribute(prev, now, threshold=1.5, min_band=3)
    assert rep["comparable"]
    assert rep["counters_changed"] == []
    assert len(rep["bands"]) == 1
    band = rep["bands"][0]
    assert band["queries"] == ["q2", "q3", "q4"]
    assert band["t_start_interval_sec"] == [10.0, 30.0]
    assert band["ratio_range"] == [2.8, 3.2]


def test_counter_moved_query_breaks_band_and_is_listed():
    """A counters-moved query in the middle of a slow run is a REAL
    regression: it must appear in counters_changed, not in a band, and
    its presence splits the run (each side now too short for min_band=3
    -> no band at all)."""
    names = ["q1", "q2", "q3", "q4", "q5"]
    prev = _artifact({n: 1.0 for n in names}, {n: C for n in names})
    now_c = {n: dict(C) for n in names}
    now_c["q3"] = C_MOVED
    now_t = {n: 3.0 for n in names[1:]} | {"q1": 1.0}
    ts = {n: float(i) for i, n in enumerate(names)}
    now = _artifact(now_t, now_c, t_start=ts)
    rep = ad.attribute(prev, now, threshold=1.5, min_band=3)
    assert rep["counters_changed"] == ["q3"]
    assert all("q3" not in b["queries"] for b in rep["bands"])
    assert rep["bands"] == []  # 2-query runs on each side of the break


def test_pre_r12_artifact_falls_back_to_insertion_order():
    """Artifacts sealed before r12 carry no query_wallclock: execution
    order falls back to dict insertion order and bands carry no
    t_start interval."""
    names = ["a", "b", "c", "d"]
    prev = _artifact({n: 1.0 for n in names}, {n: C for n in names})
    now = _artifact({"a": 2.0, "b": 2.0, "c": 2.0, "d": 1.0},
                    {n: dict(C) for n in names})
    rep = ad.attribute(prev, now, threshold=1.5, min_band=3)
    assert len(rep["bands"]) == 1
    assert rep["bands"][0]["queries"] == ["a", "b", "c"]
    assert "t_start_interval_sec" not in rep["bands"][0]


def test_property_bands_never_contain_plan_moves():
    """Property over random artifact pairs: every reported band is
    contiguous in execution order, at least min_band long, made only of
    over-threshold queries — and NEVER contains a query whose counters
    moved (a plan/data regression must not hide inside a host-window
    claim, the tool's core contract)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    names = [f"q{i}" for i in range(12)]

    @settings(max_examples=60, deadline=None)
    @given(
        slow=st.sets(st.sampled_from(names)),       # now 3x slower
        moved=st.sets(st.sampled_from(names)),      # counters changed
        threshold=st.sampled_from([1.2, 1.5, 2.0]),
        min_band=st.integers(min_value=1, max_value=4),
    )
    def prop(slow, moved, threshold, min_band):
        prev = _artifact({n: 1.0 for n in names}, {n: C for n in names})
        now_c = {n: (C_MOVED if n in moved else dict(C)) for n in names}
        now_t = {n: (3.0 if n in slow else 1.0) for n in names}
        ts = {n: float(i) for i, n in enumerate(names)}
        now = _artifact(now_t, now_c, t_start=ts)
        rep = ad.attribute(prev, now, threshold=threshold,
                           min_band=min_band)
        assert set(rep["counters_changed"]) == moved
        flat = [q for b in rep["bands"] for q in b["queries"]]
        assert not (set(flat) & moved)
        for b in rep["bands"]:
            qs = b["queries"]
            assert len(qs) >= min_band
            # contiguity in execution order (names are t_start-ordered)
            idx = [names.index(q) for q in qs]
            assert idx == list(range(idx[0], idx[0] + len(idx)))
            assert all(q in slow and q not in moved for q in qs)
        # completeness: every maximal eligible slow run >= min_band is
        # reported (scan the truth directly)
        run, truth = [], []
        for n in names:
            if n in slow and n not in moved:
                run.append(n)
            else:
                if len(run) >= min_band:
                    truth.append(run)
                run = []
        if len(run) >= min_band:
            truth.append(run)
        assert [b["queries"] for b in rep["bands"]] == truth

    prop()


def test_no_counter_evidence_is_unattributable_and_breaks_band():
    """ADVICE r12: a query timed in both rounds whose counters are
    absent from the BASELINE artifact (counters_new — e.g. a
    pre-counter baseline) has no counter evidence either way: it must
    be listed as unattributable and must NOT count toward a host-window
    band — 'counters proven identical' is the band's eligibility
    contract, and absence is not proof."""
    names = ["q1", "q2", "q3", "q4", "q5"]
    prev_c = {n: C for n in names if n != "q3"}  # q3: no baseline entry
    prev = _artifact({n: 1.0 for n in names}, prev_c)
    now_t = {n: 3.0 for n in names}              # all slow 3x
    ts = {n: float(i) for i, n in enumerate(names)}
    now = _artifact(now_t, {n: dict(C) for n in names}, t_start=ts)
    rep = ad.attribute(prev, now, threshold=1.5, min_band=3)
    assert rep["unattributable"] == ["q3"]
    assert rep["counters_changed"] == []
    assert all("q3" not in b["queries"] for b in rep["bands"])
    assert rep["bands"] == []  # 2-query runs on each side of the break

    # symmetric: absent from THIS run's plan_counters (timed but not
    # instrumented) is equally evidence-free
    now2 = _artifact(now_t, {n: dict(C) for n in names if n != "q2"},
                     t_start=ts)
    prev2 = _artifact({n: 1.0 for n in names}, {n: C for n in names})
    rep2 = ad.attribute(prev2, now2, threshold=1.5, min_band=3)
    assert rep2["unattributable"] == ["q2"]
    assert rep2["bands"] == [{"queries": ["q3", "q4", "q5"],
                              "ratio_range": [3.0, 3.0],
                              "t_start_interval_sec": [2.0, 4.0]}]


def test_over_threshold_rollup_shapes():
    """r13 verdict item 4: ratios_over_threshold is a roll-up — summary
    fields lead (count, max, classified reading), the raw per-query dict
    lives under 'detail'. The reading must classify correctly: scattered
    counter-identical noise vs real plan moves vs band membership."""
    names = ["q1", "q2", "q3", "q4", "q5"]
    ts = {n: float(i) for i, n in enumerate(names)}
    prev = _artifact({n: 1.0 for n in names}, {n: C for n in names})

    # scattered counter-identical slowdowns, no band (min_band=3, only
    # q1/q3 slow) -> "scattered — host noise"
    now = _artifact({"q1": 2.0, "q2": 1.0, "q3": 3.0, "q4": 1.0,
                     "q5": 1.0}, {n: dict(C) for n in names}, t_start=ts)
    rep = ad.attribute(prev, now, threshold=1.5, min_band=3)
    over = rep["ratios_over_threshold"]
    assert over["n_over"] == 2 and over["n_ratios"] == 5
    assert over["detail"] == {"q1": 2.0, "q3": 3.0}
    assert over["max_ratio"] == 3.0 and over["max_query"] == "q3"
    assert rep["bands"] == []
    assert "scattered" in over["reading"]
    assert "host noise" in over["reading"]

    # a counters-moved slow query -> reading flags the real move
    now_c = {n: dict(C) for n in names}
    now_c["q3"] = dict(C_MOVED)
    now2 = _artifact({"q1": 1.0, "q2": 1.0, "q3": 3.0, "q4": 1.0,
                      "q5": 1.0}, now_c, t_start=ts)
    rep2 = ad.attribute(prev, now2, threshold=1.5, min_band=3)
    over2 = rep2["ratios_over_threshold"]
    assert "plan/data" in over2["reading"] and "q3" in over2["reading"]

    # a contiguous band -> reading points at bands
    now3 = _artifact({"q1": 1.0, "q2": 3.0, "q3": 3.0, "q4": 3.0,
                      "q5": 1.0}, {n: dict(C) for n in names},
                     t_start=ts)
    rep3 = ad.attribute(prev, now3, threshold=1.5, min_band=3)
    assert len(rep3["bands"]) == 1
    assert "band" in rep3["ratios_over_threshold"]["reading"]

    # ADVICE r14: counters-moved slow query AND a contiguous band both
    # over threshold -> the reading names BOTH; "remainder scattered
    # host noise" alone would bury the band
    names6 = ["q1", "q2", "q3", "q4", "q5", "q6"]
    ts6 = {n: float(i) for i, n in enumerate(names6)}
    prev6 = _artifact({n: 1.0 for n in names6}, {n: C for n in names6})
    now_c6 = {n: dict(C) for n in names6}
    now_c6["q6"] = dict(C_MOVED)  # real move, over threshold
    now6 = _artifact({"q1": 3.0, "q2": 3.0, "q3": 3.0, "q4": 1.0,
                      "q5": 1.0, "q6": 4.0}, now_c6, t_start=ts6)
    rep6 = ad.attribute(prev6, now6, threshold=1.5, min_band=3)
    assert len(rep6["bands"]) == 1  # q1-q3 counter-identical band
    over6 = rep6["ratios_over_threshold"]
    assert "plan/data" in over6["reading"] and "q6" in over6["reading"]
    assert "band" in over6["reading"]
    # ...and without a band, the moved-counters reading stays band-free
    assert "band" not in over2["reading"]

    # nothing over threshold -> explicit none, empty detail
    now4 = _artifact({n: 1.0 for n in names},
                     {n: dict(C) for n in names}, t_start=ts)
    rep4 = ad.attribute(prev, now4, threshold=1.5, min_band=3)
    over4 = rep4["ratios_over_threshold"]
    assert over4["n_over"] == 0 and over4["detail"] == {}
    assert over4["max_ratio"] is None and over4["max_query"] is None
    assert over4["reading"] == "none over threshold"


def test_cross_sf_not_comparable():
    prev = _artifact({"a": 1.0}, {"a": C}, sf="0.1")
    now = _artifact({"a": 2.0}, {"a": C}, sf="0.01")
    rep = ad.attribute(prev, now)
    assert not rep["comparable"]
    assert "0.01" in rep["skipped"]
    assert rep["bands"] == []
