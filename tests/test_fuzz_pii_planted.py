"""Per-session slice of the planted PII fuzzer
(examples/fuzz_pii_planted.py, round 13): segment-constructed documents
whose per-kind counts and fully-redacted strings are assembled from the
construction alone (the doc_pii_redact oracle replays the engine's
patterns verbatim, so it cannot catch pattern drift — these plants can).
Covers sequential no-double-count semantics (IP/phone-shaped email local
parts), boundary and adjacency matches, seven near-misses, NULL/empty
contracts, the kinds=() identity, and batch-vs-Column twin equality under
two partitionings. The full 20-seed sweep records fuzz_pii_last.json."""

import importlib.util
import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Spec copies: expectations in the fuzzer are built from segment
# construction + these tags; pinning the engine tables here makes a
# pattern or tag drift fail BY NAME instead of as a seed-dependent fuzz
# violation. Any deliberate pattern change must update this test AND
# re-derive the fuzzer's planted edge cases (they encode match semantics
# like the leftmost '1.2.3.4' in a five-octet run).
SPEC_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+\d{1,3}-\d{3}-\d{3,4}(-\d{3,4})?",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}
SPEC_TAGS = {"email": "[EMAIL]", "phone": "[PHONE]", "ipv4": "[IP]"}


def _mod():
    spec = importlib.util.spec_from_file_location(
        "fuzz_pii_planted",
        os.path.join(_REPO, "examples", "fuzz_pii_planted.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_spec_tables_match_engine():
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.pii import (
        PII_PATTERNS,
        PII_TAGS,
    )

    assert PII_PATTERNS == SPEC_PATTERNS
    assert PII_TAGS == SPEC_TAGS
    fz = _mod()
    assert fz.SPEC_TAGS == SPEC_TAGS


def test_generators_shape():
    """The generators' outputs stay inside the planted grammar the
    expectations assume: noise is lowercase-letters-and-spaces only (no
    digit/@/+/dot can seed a match), emails/phones/ipv4s carry their
    defining characters."""
    import random

    fz = _mod()
    rng = random.Random(7)
    for _ in range(50):
        nz = fz.gen_noise(rng, 3)
        assert all(c.islower() or c == " " for c in nz), nz
        em = fz.gen_email(rng)
        assert em.count("@") == 1 and "." in em.split("@")[1]
        ph = fz.gen_phone(rng)
        assert ph.startswith("+") and ph.count("-") in (2, 3)
        ip = fz.gen_ipv4(rng)
        assert ip.count(".") == 3 and ip.replace(".", "").isdigit()


def test_planted_invariants_live(spark):
    fz = _mod()
    for seed in (0, 1):
        rec = fz.check_corpus(spark, seed)
        assert not rec["violations"], rec["violations"]
        assert rec["planted_matches"] >= 8


def test_sweep_artifact_is_clean():
    with open(os.path.join(_REPO, "fuzz_pii_last.json")) as f:
        d = json.load(f)
    s = d["summary"]
    assert s["seeds"] >= 20
    assert s["violations_total"] == 0 and s["failing_seeds"] == []
    assert s["planted_matches_total"] >= 20 * 8
