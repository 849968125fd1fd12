"""Per-session slice of the planted sampling/mixing fuzzer
(examples/fuzz_sampling_planted.py, round 12): the mixture solver's
closed form with a planted binding source and the loud absent-source
zeroing, quota caps with under/at/over sources and partitioning-
invariant keep sets, split/stratified/epoch concentration within 4-sigma
binomial bounds, and exactly-once/(id, epoch)-unique replication. The
full 20-seed sweep records fuzz_sampling_last.json; this runs a 2-seed
slice inside the suite."""

import importlib.util
import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "fuzz_sampling_planted",
        os.path.join(_REPO, "examples", "fuzz_sampling_planted.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_concentration_bound_helper():
    fz = _mod()
    # exact mean passes; a 5-sigma deviation fails
    assert fz._within(800, 1000, 0.8)
    import math
    sigma = math.sqrt(1000 * 0.8 * 0.2)
    assert not fz._within(int(800 + 6 * sigma), 1000, 0.8)


def test_planted_invariants_live(spark):
    fz = _mod()
    for seed in (0, 1):
        rec = fz.check_corpus(spark, seed)
        assert not rec["violations"], rec["violations"]
        # the planted structure actually occurred
        assert rec["src_sizes"]["over"] > rec["cap"]
        assert rec["src_sizes"]["under"] < rec["cap"]


def test_sweep_artifact_is_clean():
    with open(os.path.join(_REPO, "fuzz_sampling_last.json")) as f:
        d = json.load(f)
    s = d["summary"]
    assert s["seeds"] >= 20
    assert s["violations_total"] == 0 and s["failing_seeds"] == []
