"""Per-session slice of the planted pipeline-topology fuzzer
(examples/fuzz_pipeline_planted.py, round 13): chunk-count closed form
m = 1 + ceil((N-C)/(C-V)) for space-only docs, the collapse recurrence
(rounds + rows) against a pure-Python replay, all five pipelines equal to
their reference-semantics replays (fold order, [PHẦN i] tagging, critique
stop-phrase branches, bottom-up tree collapse), and partitioning
invariance. This fuzzer caught the pre-r13 splitter divergence (overlap
dropped inside recursion) — the closed form below is the reference-true
anchor. The full 20-seed sweep records fuzz_pipeline_last.json; this runs
a 2-seed slice inside the suite."""

import importlib.util
import json
import math
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "fuzz_pipeline_planted",
        os.path.join(_REPO, "examples", "fuzz_pipeline_planted.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_closed_form_chunks():
    fz = _mod()
    toks = [f"t{i}" for i in range(25)]
    # N=25, C=10, V=3 -> stride 7: m = 1 + ceil(15/7) = 4
    got = fz.closed_form_chunks(toks, 10, 3)
    assert len(got) == 4
    assert got[0] == toks[0:10] and got[1] == toks[7:17]
    assert got[3] == toks[21:25]  # short tail
    assert fz.closed_form_chunks(toks, 25, 3) == [toks]  # N == C boundary
    assert fz.closed_form_chunks([], 10, 3) == []
    # the generic replay agrees with the closed form on this input class
    assert fz.py_recursive_split(" ".join(toks), 10, 3) == [
        " ".join(w) for w in got
    ]


def test_greedy_replay_reference_semantics():
    fz = _mod()
    # oversize chunk alone keeps its own group; non-empty group overflows
    assert fz.py_greedy([5, 5, 5], 10) == [0, 0, 1]
    assert fz.py_greedy([30, 5, 5], 10) == [0, 1, 1]
    assert fz.py_greedy([0, 0, 30], 10) == [0, 0, 0]  # zero-token absorb


def test_planted_invariants_live(spark):
    fz = _mod()
    for seed in (0, 1):
        rec = fz.check_corpus(spark, seed)
        assert not rec["violations"], rec["violations"]
        cfg = rec["config"]
        assert cfg["X"] >= 2 * cfg["K"]  # convergence plant held
        # the iteration cap actually fired across the corpus (both slice
        # seeds plant cap-hitting configs: 26 and 13 capped docs)
        assert rec["critique_branches"]["capped"] > 0
        assert sum(rec["critique_branches"].values()) > 0
        assert rec["collapse_rounds"] >= 1  # a multi-round doc was planted


def test_sweep_artifact_is_clean():
    with open(os.path.join(_REPO, "fuzz_pipeline_last.json")) as f:
        d = json.load(f)
    s = d["summary"]
    assert s["seeds"] >= 20
    assert s["violations_total"] == 0 and s["failing_seeds"] == []
    assert s["max_collapse_rounds"] >= 2
    # all three critic branches occurred somewhere in the sweep
    assert s["critique_refined_total"] > 0
    assert s["critique_accepted_total"] > 0
    assert s["critique_capped_total"] > 0
