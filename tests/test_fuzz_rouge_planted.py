"""Per-session slice of the planted closed-form ROUGE fuzzer
(examples/fuzz_rouge_planted.py, round 12): constructed pairs whose
ROUGE-1/2/L values follow from the construction parameters alone (prefix
overlap, reversed scatter, multiset run clipping, identity/empty/
disjoint), pushed through all three implementations — the pandas-UDF DP,
the Catalyst unigram expression, and the explode+count-join batch path.
The full 20-seed sweep records fuzz_rouge_last.json; this runs a 3-seed
slice inside the suite."""

import importlib.util
import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "fuzz_rouge_planted",
        os.path.join(_REPO, "examples", "fuzz_rouge_planted.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_generator_is_deterministic_and_closed_form():
    fz = _mod()
    a, b = fz.gen_corpus(7), fz.gen_corpus(7)
    assert a == b, "corpus generation must be seed-pure"
    kinds = {p["kind"] for p in a}
    assert kinds == {"prefix", "reversed", "multiset", "identity", "empty",
                     "disjoint"}
    for p in a:
        # closed forms are valid F1 values, and the hard zero/one anchors
        # really are planted
        for v in p["want"].values():
            assert 0.0 <= v <= 1.0
        if p["kind"] == "identity":
            assert p["want"]["rouge1"] == p["want"]["rougeL"] == 1.0
        if p["kind"] in ("empty", "disjoint"):
            assert set(p["want"].values()) == {0.0}
        if p["kind"] == "reversed":
            assert p["want"]["rouge2"] == 0.0 and p["want"]["rougeL"] > 0.0


def test_planted_invariants_live(spark):
    fz = _mod()
    for seed in (0, 1, 2):
        rec = fz.check_corpus(spark, seed)
        assert not rec["violations"], rec["violations"]
        assert rec["n_pairs"] >= 20


def test_sweep_artifact_is_clean():
    with open(os.path.join(_REPO, "fuzz_rouge_last.json")) as f:
        d = json.load(f)
    s = d["summary"]
    assert s["seeds"] >= 20
    assert s["violations_total"] == 0 and s["failing_seeds"] == []
    assert s["pairs_total"] >= 20 * 20
