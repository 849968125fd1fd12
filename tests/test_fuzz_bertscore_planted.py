"""Per-session slice of the planted BERTScore fuzzer
(examples/fuzz_bertscore_planted.py, round 13): share-structured token
pairs whose greedy-match P/R/F1 follow from the pool construction alone
(shared subset on both sides, candidate-only and reference-only pads in
collision-free buckets), plus identical/disjoint/multiplicity/empty/NULL
anchors — through BOTH the Catalyst hard-match path (whose oracle
replays the same arithmetic, hence the plants) and the pandas-UDF greedy
path under two partitionings. The full 20-seed sweep records
fuzz_bertscore_last.json."""

import importlib.util
import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "fuzz_bertscore_planted",
        os.path.join(_REPO, "examples", "fuzz_bertscore_planted.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pools_are_collision_free():
    import random

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.metrics.bertscore import (
        _N_BUCKETS,
        _py_token_bucket,
    )

    fz = _mod()
    a, b, c = fz._draw_pools(random.Random(5), _py_token_bucket, _N_BUCKETS)
    words = a + b + c
    assert len(set(words)) == 12
    assert len({_py_token_bucket(w, _N_BUCKETS) for w in words}) == 12


def test_planted_invariants_live(spark):
    fz = _mod()
    for seed in (0, 1):
        rec = fz.check_corpus(spark, seed)
        assert not rec["violations"], rec["violations"]
        assert rec["pairs"] >= 12


def test_sweep_artifact_is_clean():
    with open(os.path.join(_REPO, "fuzz_bertscore_last.json")) as f:
        d = json.load(f)
    s = d["summary"]
    assert s["seeds"] >= 20
    assert s["violations_total"] == 0 and s["failing_seeds"] == []
    assert s["pairs_total"] >= 20 * 12
