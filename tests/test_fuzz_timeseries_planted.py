"""Per-session slice of the planted-ground-truth time-series fuzzer
(examples/fuzz_timeseries_planted.py, round 12): seeded corpora planting
the boundary cases the fixed-events oracles never hit — simultaneous
timestamps, the inclusive tolerance edge, points exactly on interval
start/end, zero-length and overlapping intervals, in-bucket duplicates,
multi-bucket gaps, NULL rows, a NULL-key series — checked against
from-first-principles Python replays, plus bucket-width invariance of
the interval join. The full 20-seed sweep records
fuzz_timeseries_last.json; this runs a 3-seed slice inside the suite."""

import importlib.util
import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "fuzz_timeseries_planted",
        os.path.join(_REPO, "examples", "fuzz_timeseries_planted.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_generator_is_deterministic_and_planted():
    fz = _mod()
    a, b = fz.gen_corpus(7), fz.gen_corpus(7)
    assert a == b, "corpus generation must be seed-pure"
    # every boundary regime is planted once per user
    assert all(v == 10 for v in a["expected_tags"].values()), a["expected_tags"]
    # per-user click timestamps unique (the operator's tie contract)
    seen = {}
    for u, _, ts, _ in a["clicks"]:
        assert ts not in seen.setdefault(u, set()), (u, ts)
        seen[u].add(ts)
    # interval plants include a zero-length interval per interval user
    zero = [i for i in a["intervals"] if i[2] == i[3]]
    assert len(zero) == 6


def test_replays_on_hand_built_rows():
    """The Python replays themselves are pinned on tiny hand cases so a
    replay bug can't co-vary with an operator bug."""
    import datetime as dt

    fz = _mod()
    T = lambda s: dt.datetime(2024, 3, 1) + dt.timedelta(seconds=s)
    clicks = [("u", 1, T(100), 0.5), ("u", 2, T(200), 0.7)]
    purchases = [("u", 10, T(200)), ("u", 11, T(150)), ("u", 12, T(50)),
                 ("u", 13, T(200 + fz.TOL)), ("u", 14, T(200 + fz.TOL + 1))]
    got = fz.asof_replay(purchases, clicks, tolerance=fz.TOL)
    assert got[10] == (T(200), 2, 0.7)      # simultaneous matches
    assert got[11] == (T(100), 1, 0.5)      # latest preceding
    assert got[12] == (None, None, None)    # nothing precedes
    assert got[13] == (T(200), 2, 0.7)      # tolerance edge inclusive
    assert got[14] == (None, None, None)    # one second past: nulled
    pts = [("u", 1, T(0)), ("u", 2, T(10)), ("u", 3, T(5))]
    ivs = [("u", 9, T(0), T(10))]
    assert fz.interval_replay(pts, ivs) == {("u", 1, 9), ("u", 3, 9)}


def test_planted_invariants_live(spark):
    fz = _mod()
    for seed in (0, 1, 2):
        rec = fz.check_corpus(spark, seed)
        assert not rec["violations"], rec["violations"]
        assert rec["n_interval_pairs"] > 0


def test_sweep_artifact_is_clean():
    with open(os.path.join(_REPO, "fuzz_timeseries_last.json")) as f:
        d = json.load(f)
    s = d["summary"]
    assert s["seeds"] >= 20
    assert s["violations_total"] == 0 and s["failing_seeds"] == []
    assert s["interval_pairs_total"] > 0
    for r in d["records"]:
        assert all(v > 0 for v in r["planted_regimes"].values())
