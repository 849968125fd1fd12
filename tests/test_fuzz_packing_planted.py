"""Per-session slice of the planted sequence-packing fuzzer
(examples/fuzz_packing_planted.py, round 12): seeded corpora with planted
token-length structure (boundary-exact and oversized docs) checked for
exactly-once packing, greedy bin-capacity soundness with oversized
isolation, exact partition replays for both modes, partitioning
invariance, and the string-id hash-shard path. The full 20-seed sweep
records fuzz_packing_last.json; this runs a 2-seed slice inside the
suite."""

import importlib.util
import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "fuzz_packing_planted",
        os.path.join(_REPO, "examples", "fuzz_packing_planted.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_generator_and_replays_are_pinned():
    fz = _mod()
    a, b = fz.gen_corpus(7), fz.gen_corpus(7)
    assert a == b, "corpus generation must be seed-pure"
    assert a["n_over"] > 0 and a["n_exact"] > 0  # boundary classes planted
    # greedy replay on hand rows: 60+50 fit 128; 30 would overflow -> new
    # bin; 200 oversized isolated; trailing 10 starts after it
    bins = fz.greedy_partition(
        [(0, 60), (1, 50), (2, 30), (3, 200), (4, 10)], 128)
    assert bins == [(0, 1), (2,), (3,), (4,)]
    # exact-fit doc fills a bin alone
    assert fz.greedy_partition([(0, 128), (1, 1)], 128) == [(0,), (1,)]
    # offset replay: bins are floor(start/max) runs — a straddling doc
    # belongs to the bin its START falls in
    assert fz.offset_partition([(0, 100), (1, 50), (2, 20)], 128) == [
        (0, 1), (2,)]


def test_planted_invariants_live(spark):
    fz = _mod()
    for seed in (0, 1):
        rec = fz.check_corpus(spark, seed)
        assert not rec["violations"], rec["violations"]
        assert rec["n_oversized"] > 0


def test_sweep_artifact_is_clean():
    with open(os.path.join(_REPO, "fuzz_packing_last.json")) as f:
        d = json.load(f)
    s = d["summary"]
    assert s["seeds"] >= 20
    assert s["violations_total"] == 0 and s["failing_seeds"] == []
    # the capacity/isolation invariants only bite if the hard classes
    # actually occurred
    assert s["oversized_total"] > 0 and s["exact_fit_total"] > 0
