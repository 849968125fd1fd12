"""Per-session slice of the planted contamination fuzzer
(examples/fuzz_contamination_planted.py, round 13): exact n-gram overlap
windows with closed-form containment, the n-1 near-miss that must NOT
flag, distinct-shingle and case-fold semantics, the stop-shingle cap
dropping exactly the boilerplate pairs, and embedding pairs planted at
exact cosines straddling the round(6)-then-threshold convention. The
full 20-seed sweep records fuzz_contamination_last.json; this runs a
2-seed slice inside the suite."""

import importlib.util
import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "fuzz_contamination_planted",
        os.path.join(_REPO, "examples", "fuzz_contamination_planted.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_expected_containment_is_half_up():
    fz = _mod()
    # matches F.round's HALF_UP on the planted rationals
    assert fz._expected_containment(1, 3) == 0.333333
    assert fz._expected_containment(2, 3) == 0.666667
    assert fz._expected_containment(1, 5) == 0.2
    assert fz._expected_containment(4, 4) == 1.0


def test_planted_invariants_live(spark):
    fz = _mod()
    for seed in (0, 1):
        rec = fz.check_corpus(spark, seed)
        assert not rec["violations"], rec["violations"]
        # the planted structure actually occurred: boilerplate past the
        # cap, both threshold-edge embedding plants, near-miss docs present
        assert rec["boiler_docs"] > rec["cap"]
        assert rec["emb_plants"] == 8
        assert rec["emb_flagged"] == 4  # tau+0.4, tau+0.01, tau, tau-4e-7
        assert rec["planted_pairs"] >= rec["boiler_docs"] + 4


def test_sweep_artifact_is_clean():
    with open(os.path.join(_REPO, "fuzz_contamination_last.json")) as f:
        d = json.load(f)
    s = d["summary"]
    assert s["seeds"] >= 20
    assert s["violations_total"] == 0 and s["failing_seeds"] == []
    # every seed planted the full embedding edge set
    assert s["emb_plants_total"] == 8 * s["seeds"]
