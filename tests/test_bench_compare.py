"""Unit tests for the rep-aware bench comparator (examples/bench_compare.py).

The comparator is the round-over-round perf gate; its noisy/regressed
split is the difference between chasing phantoms and missing real
slowdowns, so the classification rules are pinned here:

* per-query spread calibration (ADVICE r6): a query whose baseline reps
  already spread 2x is inherently jittery — new jitter at that level must
  NOT excuse a slow best-of-N; only spread materially above the query's
  own history does.
* --baseline creep guard (VERDICT r6 item 2): per-query best across all
  rounds, including recovery from a truncated BENCH stdout tail
  (BENCH_r04's parsed=None shape).
"""

import importlib.util
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "bench_compare", os.path.join(_REPO, "examples", "bench_compare.py")
)
bc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bc)


def test_ok_within_threshold_and_under_floor():
    assert bc.classify(1.0, 1.4, [1.4, 1.5], 1.5, 1.5, 0.75) == "ok"
    # sub-floor timings are overhead, never evidence
    assert bc.classify(0.1, 0.7, [0.7, 0.7], 1.5, 1.5, 0.75) == "ok"


def test_flat_spread_fallback_without_baseline_reps():
    # no baseline reps: the pre-r7 flat threshold applies
    assert bc.classify(1.0, 2.0, [2.0, 3.5], 1.5, 1.5, 0.75) == "noisy"
    assert bc.classify(1.0, 2.0, [2.0, 2.2], 1.5, 1.5, 0.75) == "regressed"


def test_calibrated_jittery_query_can_still_regress():
    # baseline spread 2.0 -> excuse line is 2.0*1.25=2.5; a new run with
    # spread 2.2 (noisy by the flat rule!) is NORMAL for this query, so a
    # slow best-of-N is a real regression. This is the ADVICE blind spot.
    assert (
        bc.classify(1.0, 2.0, [2.0, 4.4], 1.5, 1.5, 0.75, base_spread=2.0)
        == "regressed"
    )
    # spread 3.0 exceeds even this query's history -> session noise
    assert (
        bc.classify(1.0, 2.0, [2.0, 6.0], 1.5, 1.5, 0.75, base_spread=2.0)
        == "noisy"
    )


def test_calibrated_tight_query_keeps_flat_floor():
    # baseline spread 1.0 (tight): the flat --spread still bounds below,
    # so ordinary 1.5x jitter isn't reclassified as regression evidence
    assert (
        bc.classify(1.0, 2.0, [2.0, 3.5], 1.5, 1.5, 0.75, base_spread=1.0)
        == "noisy"
    )
    assert (
        bc.classify(1.0, 2.0, [2.0, 2.8], 1.5, 1.5, 0.75, base_spread=1.0)
        == "regressed"
    )


def test_tail_recovery_parses_truncated_queries():
    tail = (
        '{"metric": "headline", "value": 93.2, "unit": "sec", '
        '"queries": {"q_alpha": 1.25, "q_beta": 0.5, "q_gam'
    )
    got = bc._recover_from_tail(tail)
    assert got == {"q_alpha": 1.25, "q_beta": 0.5}


def test_load_baseline_takes_per_query_min(tmp_path, monkeypatch):
    import json

    monkeypatch.setattr(bc, "_REPO", str(tmp_path))
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"parsed": {"queries": {"a": 2.0, "b": 1.0}}})
    )
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps(
            {"parsed": {"queries": {"a": 1.5, "b": 3.0},
                        "reps": {"a": [1.5, 4.5]}}}
        )
    )
    # truncated round: recovered from tail. "c"'s value has no pair
    # terminator — the clip may have cut it mid-number ("c": 2.05 -> "c": 2.0
    # would poison the all-rounds best with a fake low), so it is DROPPED;
    # only terminator-confirmed pairs like "a": 0.9, survive
    (tmp_path / "BENCH_r03.json").write_text(
        json.dumps({"parsed": None, "tail": '"queries": {"a": 0.9, "c": 2.0'})
    )
    best, spreads = bc.load_baseline()
    assert best == {"a": 0.9, "b": 1.0}
    assert spreads["a"] == 3.0


def test_real_artifacts_load():
    """The committed BENCH files must stay loadable — including r4's
    truncated shape — so --baseline never silently drops a round."""
    best, _ = bc.load_baseline()
    assert len(best) >= 60
    q4, _ = bc.load_old(os.path.join(_REPO, "BENCH_r04.json"))
    assert len(q4) >= 20  # recovered from the clipped stdout tail


def test_adjudication_reclassifies_within_accepted_level(tmp_path, monkeypatch, capsys):
    """An adjudicated query (round-7 VERDICT item 4) exits clean while its
    best stays within threshold of the recorded accepted_best — and flips
    back to regressed when it does not: adjudication re-baselines, it does
    not grant immunity."""
    import json

    import pytest

    monkeypatch.setattr(bc, "_REPO", str(tmp_path))
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"parsed": {"queries": {"a": 1.0, "big": 1.0}}})
    )
    (tmp_path / "BENCH_ADJUDICATIONS.json").write_text(
        json.dumps({"a": {"round": 8, "accepted_best": 2.0,
                          "note": "persist tax accepted", "verdict": "accepted",
                          "control": {"big": {"min": 1.0,
                                              "ratio_vs_best": 1.0}}}})
    )
    new = tmp_path / "bench_last.json"

    def run(a_time):
        new.write_text(json.dumps(
            {"queries": {"a": a_time, "big": 1.0},
             "reps": {"a": [a_time, a_time], "big": [1.0, 1.0]}}
        ))
        monkeypatch.setattr(
            bc.sys, "argv",
            ["bench_compare.py", "--baseline", "--new", str(new)],
        )
        try:
            bc.main()
            return 0
        except SystemExit as e:
            return e.code

    # 2.0s vs all-rounds best 1.0 = regressed by ratio, but adjudicated
    assert run(2.0) == 0
    assert "ADJUDICATED" in capsys.readouterr().out
    # 3.5s exceeds accepted_best * threshold (2.0 * 1.5) -> regressed again
    assert run(3.5) == 1


def test_regime_map_covers_headline():
    """REGIME must stay in lockstep with bench.py's HEADLINE list — an
    unmapped query silently falls back to the conservative factor, which
    is safe but defeats the attribution; a stale entry is a typo."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(_REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    assert set(bc.REGIME) == set(bench.HEADLINE)
    assert set(bc.REGIME.values()) == {"agg", "alloc"}


def test_calibration_excludes_compared_round(tmp_path, monkeypatch):
    """ADVICE r11 + r12: the round being compared must not enter the
    historical min (factor would pin to 1.0, comparing the session against
    itself) — identified by FILENAME or by verbatim-copy run identity
    (identical queries dict), never by cal-value equality: rounded cals can
    collide across genuinely distinct sessions on a stable box."""
    import json

    monkeypatch.setattr(bc, "_REPO", str(tmp_path))
    own_q = {"a": 1.234, "b": 5.678}
    own_cal = {"agg": 0.4, "alloc": 0.4}  # faster than history: would become min
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"parsed": {"queries": {}, "cal": {"agg": 1.0, "alloc": 1.0}}})
    )
    # r2: a DISTINCT session whose rounded cal happens to equal the session's
    # — the old equality heuristic dropped it; it must stay in history
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"parsed": {"queries": {"a": 9.0}, "cal": dict(own_cal)}})
    )
    # r3: the driver's verbatim copy of the session being compared
    (tmp_path / "BENCH_r03.json").write_text(
        json.dumps({"parsed": {"queries": own_q, "cal": dict(own_cal)}})
    )
    own_run = {"queries": own_q, "cal": dict(own_cal)}
    cals = bc.load_calibrations(
        exclude_path=str(tmp_path / "bench_last.json"), exclude_run=own_run
    )
    assert sorted(cals) == ["BENCH_r01.json", "BENCH_r02.json"]
    # comparing a BENCH_r{N}.json directly: excluded by its own filename
    cals = bc.load_calibrations(
        exclude_path=str(tmp_path / "BENCH_r03.json"), exclude_run=own_run
    )
    assert sorted(cals) == ["BENCH_r01.json", "BENCH_r02.json"]
    factors, attribution = bc.regime_factors(own_cal, cals)
    # r2's colliding cal 0.4 is now legitimately the historical best: the
    # session's 0.4 is a same-speed box, factor 1.0; attribution names r2
    assert factors == {"agg": 1.0, "alloc": 1.0}
    assert any("vs r2" in a for a in attribution)


def test_latest_round_attribution_is_numeric_past_r99(tmp_path, monkeypatch):
    """ADVICE r12: lexicographic max(hist) mislabels the 'vs latest round'
    line once round numbers gain a digit (BENCH_r100 < BENCH_r99 as
    strings) — the attribution must parse the round number."""
    cals = {
        "BENCH_r99.json": {"agg": 1.0},
        "BENCH_r100.json": {"agg": 2.0},
    }
    factors, attribution = bc.regime_factors({"agg": 2.0}, cals)
    assert factors == {"agg": 2.0}  # vs all-rounds best (r99's 1.0)
    assert any("x1.00 vs r100" in a for a in attribution)


def test_session_cal_gates_on_worse_phase(tmp_path, monkeypatch, capsys):
    """VERDICT r12 finding 1: a load spike that hits the early queries and
    passes before the end-of-run probe must still widen the gate — the
    session figure is the WORSE of the start/end phase minima, taken from
    cal_reps when present (a flat min-over-all 'cal' would report the quiet
    end phase and classify the spike-hit query as regressed)."""
    import json

    # unit level: worse-of-phases, per regime
    assert bc.session_cal({
        "cal": {"agg": 0.5},  # legacy min-over-all — must be overridden
        "cal_reps": {"start": {"agg": [1.0, 1.1], "alloc": [0.6]},
                     "end": {"agg": [0.5, 0.5], "alloc": [0.8]}},
    }) == {"agg": 1.0, "alloc": 0.8}
    # records without phase detail (driver strips cal_reps) fall back flat
    assert bc.session_cal({"cal": {"agg": 0.7}}) == {"agg": 0.7}
    assert bc.session_cal({"cal": 0.7}) == {"agg": 0.7}

    # phase attribution: which phase produced each regime's gating value
    # (printed in the calibration line so the gate's provenance is visible)
    rec = {"cal_reps": {"start": {"agg": [1.0, 1.1], "alloc": [0.6]},
                        "end": {"agg": [0.5, 0.5], "alloc": [0.8]}}}
    assert bc.session_cal_phases(rec) == {"agg": "start", "alloc": "end"}
    assert bc.session_cal_phases({"cal": {"agg": 0.7}}) == {}
    _, attr = bc.regime_factors(
        {"agg": 2.0}, {"BENCH_r01.json": {"agg": 1.0}},
        phases={"agg": "start"})
    assert any("gated by start phase" in a for a in attr)

    # end-to-end: query 2x its best + start-phase cal 2x history = box
    monkeypatch.setattr(bc, "_REPO", str(tmp_path))
    monkeypatch.setattr(bc, "REGIME", {"a": "agg"}, raising=True)
    (tmp_path / "BENCH_r01.json").write_text(json.dumps({"parsed": {
        "queries": {"a": 2.0}, "cal": {"agg": 0.5},
    }}))
    new = tmp_path / "bench_last.json"
    new.write_text(json.dumps({
        "queries": {"a": 4.0}, "reps": {"a": [4.0, 4.0]},
        "cal": {"agg": 0.5},  # min-over-all: quiet end phase
        "cal_reps": {"start": {"agg": [1.0, 1.0, 1.0]},
                     "end": {"agg": [0.5, 0.5, 0.5]}},
    }))
    monkeypatch.setattr(
        bc.sys, "argv", ["bench_compare.py", "--baseline", "--new", str(new)]
    )
    bc.main()  # clean exit: class box, not regressed
    out = capsys.readouterr().out
    assert "BOX" in out and "REGRESSED" not in out


def test_regime_factor_clamped_to_cap():
    factors, _ = bc.regime_factors(
        {"alloc": 10.0}, {"BENCH_r01.json": {"alloc": 1.0}}
    )
    assert factors == {"alloc": bc.CAL_FACTOR_CAP}


def test_box_class_within_regime_drift(tmp_path, monkeypatch, capsys):
    """A query 2x its all-rounds best, in a session whose alloc cal also ran
    2x its historical best, is class 'box' (clean exit) — while an agg
    query with the same ratio stays regressed (its regime didn't drift),
    and an UNMAPPED query gets the conservative (smaller) factor."""
    import json

    monkeypatch.setattr(bc, "_REPO", str(tmp_path))
    monkeypatch.setattr(
        bc, "REGIME", {"a_alloc": "alloc", "a_agg": "agg"}, raising=True
    )
    (tmp_path / "BENCH_r01.json").write_text(json.dumps({"parsed": {
        "queries": {"a_alloc": 2.0, "a_agg": 2.0, "unmapped": 2.0},
        "cal": {"agg": 0.5, "alloc": 0.5},
    }}))
    new = tmp_path / "bench_last.json"
    new.write_text(json.dumps({
        "queries": {"a_alloc": 4.0, "a_agg": 4.0, "unmapped": 4.0},
        "reps": {"a_alloc": [4.0, 4.0], "a_agg": [4.0, 4.0],
                 "unmapped": [4.0, 4.0]},
        "cal": {"agg": 0.5, "alloc": 1.0},
    }))
    monkeypatch.setattr(
        bc.sys, "argv", ["bench_compare.py", "--baseline", "--new", str(new)]
    )
    try:
        bc.main()
        code = 0
    except SystemExit as e:
        code = e.code
    assert code == 1  # a_agg (and unmapped) still regressed
    out = capsys.readouterr().out
    assert "BOX" in out and "a_alloc" in out.split("BOX")[1].splitlines()[0]
    assert "REGRESSED" in out
    assert "alloc regime x2.00" in out


def test_missing_own_regime_factor_never_borrows_the_other(tmp_path, monkeypatch):
    """A session whose cal carries only the agg probe (legacy scalar shape)
    must NOT let alloc-mapped queries gate on the agg factor — a mapped
    query with no factor for its OWN regime gates at 1.0 and a genuine
    regression stays regressed."""
    import json

    monkeypatch.setattr(bc, "_REPO", str(tmp_path))
    monkeypatch.setattr(bc, "REGIME", {"a_alloc": "alloc"}, raising=True)
    (tmp_path / "BENCH_r01.json").write_text(json.dumps({"parsed": {
        "queries": {"a_alloc": 1.0}, "cal": 0.5,  # legacy scalar -> agg only
    }}))
    new = tmp_path / "bench_last.json"
    new.write_text(json.dumps({
        "queries": {"a_alloc": 2.0}, "reps": {"a_alloc": [2.0, 2.0]},
        "cal": 1.0,  # agg factor 2.0; no alloc factor exists
    }))
    monkeypatch.setattr(
        bc.sys, "argv", ["bench_compare.py", "--baseline", "--new", str(new)]
    )
    try:
        bc.main()
        code = 0
    except SystemExit as e:
        code = e.code
    assert code == 1  # regressed — the agg drift is not an alloc excuse


def test_attribution_prints_in_single_round_mode(tmp_path, monkeypatch, capsys):
    """The calibration attribution describes the BOX and prints in both
    modes; only the gate is baseline-only (review finding r12)."""
    import json

    monkeypatch.setattr(bc, "_REPO", str(tmp_path))
    old = tmp_path / "BENCH_r01.json"
    old.write_text(json.dumps({"parsed": {
        "queries": {"a": 1.0}, "cal": {"agg": 0.5, "alloc": 0.5}}}))
    new = tmp_path / "bench_last.json"
    new.write_text(json.dumps({
        "queries": {"a": 1.0}, "cal": {"agg": 1.0, "alloc": 0.5}}))
    monkeypatch.setattr(
        bc.sys, "argv", ["bench_compare.py", str(old), "--new", str(new)]
    )
    bc.main()
    out = capsys.readouterr().out
    assert "agg regime x2.00" in out
    assert "informational in single-round mode" in out
    assert "no prior round shares" not in out


def test_adjudicated_accepted_best_is_regime_scaled(tmp_path, monkeypatch):
    """VERDICT r11 item 1c: an accepted_best recorded in a faster regime is
    compared in today's regime units — accepted 2.0 with alloc factor 1.6
    admits a 4.5s best under threshold 1.5 (2.0*1.6*1.5=4.8)."""
    import json

    monkeypatch.setattr(bc, "_REPO", str(tmp_path))
    monkeypatch.setattr(bc, "REGIME", {"a": "alloc", "big": "agg"}, raising=True)
    (tmp_path / "BENCH_r01.json").write_text(json.dumps({"parsed": {
        "queries": {"a": 1.0, "big": 1.0}, "cal": {"agg": 0.5, "alloc": 0.5},
    }}))
    (tmp_path / "BENCH_ADJUDICATIONS.json").write_text(
        json.dumps({"a": {"round": 8, "accepted_best": 2.0,
                          "note": "t", "verdict": "accepted",
                          "control": {"big": {"min": 1.0,
                                              "ratio_vs_best": 1.0}}}})
    )
    new = tmp_path / "bench_last.json"
    new.write_text(json.dumps({
        "queries": {"a": 4.5, "big": 1.0},
        "reps": {"a": [4.5, 4.5], "big": [1.0, 1.0]},
        "cal": {"agg": 0.5, "alloc": 0.8},
    }))
    monkeypatch.setattr(
        bc.sys, "argv", ["bench_compare.py", "--baseline", "--new", str(new)]
    )
    try:
        bc.main()
        code = 0
    except SystemExit as e:
        code = e.code
    assert code == 0  # 4.5 <= 2.0 * 1.6 * 1.5


def test_adjudication_ignored_outside_baseline_mode(tmp_path, monkeypatch):
    import json

    monkeypatch.setattr(bc, "_REPO", str(tmp_path))
    old = tmp_path / "BENCH_r01.json"
    old.write_text(json.dumps({"parsed": {"queries": {"a": 1.0}}}))
    (tmp_path / "BENCH_ADJUDICATIONS.json").write_text(
        json.dumps({"a": {"accepted_best": 2.0}})
    )
    new = tmp_path / "bench_last.json"
    new.write_text(json.dumps({"queries": {"a": 2.0}, "reps": {"a": [2.0, 2.0]}}))
    monkeypatch.setattr(
        bc.sys, "argv", ["bench_compare.py", str(old), "--new", str(new)]
    )
    try:
        bc.main()
        code = 0
    except SystemExit as e:
        code = e.code
    assert code == 1  # single-round diff stays strict


def test_adjudication_without_control_evidence_is_ignored(tmp_path, monkeypatch, capsys):
    """ADVICE r8: an adjudication entry that skipped the control ritual
    (no control query reproducing near its best in the same interleave, or
    a verdict other than 'accepted') must NOT weaken the creep guard — the
    comparator drops it with a warning and the row regresses normally."""
    import json

    monkeypatch.setattr(bc, "_REPO", str(tmp_path))
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"parsed": {"queries": {"a": 1.0, "b": 1.0}}})
    )
    (tmp_path / "BENCH_ADJUDICATIONS.json").write_text(json.dumps({
        # missing control entirely
        "a": {"round": 8, "accepted_best": 2.0, "verdict": "accepted"},
        # control present but wrong verdict
        "b": {"round": 8, "accepted_best": 2.0, "verdict": "noise",
              "control": {"x": {"min": 1.0, "ratio_vs_best": 1.0}}},
    }))
    new = tmp_path / "bench_last.json"
    new.write_text(json.dumps(
        {"queries": {"a": 2.0, "b": 2.0},
         "reps": {"a": [2.0, 2.0], "b": [2.0, 2.0]}}
    ))
    monkeypatch.setattr(
        bc.sys, "argv",
        ["bench_compare.py", "--baseline", "--new", str(new)],
    )
    try:
        bc.main()
        code = 0
    except SystemExit as e:
        code = e.code
    assert code == 1  # both rows regressed — neither adjudication honored
    err = capsys.readouterr().err
    assert "ignoring adjudication for 'a'" in err
    assert "ignoring adjudication for 'b'" in err
