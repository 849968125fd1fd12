"""Per-session slice of the planted text-quality fuzzer
(examples/fuzz_textquality_planted.py, round 13): language-ID hit counts
against a SPEC copy of the stopword lists (ties, cross-language tokens,
case folding, und), quality-score components pinned at their boundary
values, repetition ratios from known token multisets with the batch twin
partitioning-invariant, script ratios with exact letter counts and the
NULL contract, dyadic-rational entropy plants, and compression
monotonicity. The full 20-seed sweep records fuzz_textquality_last.json;
this runs a 2-seed slice inside the suite."""

import importlib.util
import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "fuzz_textquality_planted",
        os.path.join(_REPO, "examples", "fuzz_textquality_planted.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_spec_stopwords_match_engine():
    """The fuzzer's expectations come from ITS copy of the lists; if the
    engine's lists drift, this names the divergence directly instead of
    leaving a seed-dependent fuzz failure."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.textstats import (
        _LANG_STOPWORDS,
    )

    fz = _mod()
    assert fz.SPEC_STOPWORDS == _LANG_STOPWORDS


def test_expected_helpers_closed_forms():
    fz = _mod()
    assert fz.expected_lang(["the", "the", "und"]) == "en"  # 2 en vs 1 de
    assert fz.expected_lang(["la"]) == "fr"  # fr|es cross-hit, fr earlier
    assert fz.expected_lang(["xyz"]) == "und"
    assert fz.expected_entropy([2, 1, 1]) == 1.5
    assert fz.expected_entropy([4, 2, 1, 1]) == 1.75
    assert fz.expected_entropy([]) == 0.0
    # n=4 tokens, 3 distinct -> dup ratio 1 - 3/4; top token 'dup' at 2/4
    assert fz.expected_repetition("dup dup a b") == (0.25, 0.0, 0.5)
    q = fz.expected_quality("abc " * 13)  # >= 50 chars, mean 3, no punct
    assert abs(q - 1.0) < 1e-9


def test_planted_invariants_live(spark):
    fz = _mod()
    for seed in (0, 1):
        rec = fz.check_corpus(spark, seed)
        assert not rec["violations"], rec["violations"]


def test_sweep_artifact_is_clean():
    with open(os.path.join(_REPO, "fuzz_textquality_last.json")) as f:
        d = json.load(f)
    s = d["summary"]
    assert s["seeds"] >= 20
    assert s["violations_total"] == 0 and s["failing_seeds"] == []
