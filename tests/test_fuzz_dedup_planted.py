"""Per-session slice of the planted-ground-truth dedup fuzzer
(examples/fuzz_dedup_planted.py, VERDICT r10 item 5): seeded corpora with
KNOWN exact groups and near-dup families; exact_dedup must recover the
groups exactly, MinHash-LSH recall must meet its banding-theory bound,
the est_jaccard filter must be sound vs TRUE Jaccard, connected
components must reassemble every tight planted cluster without ever
merging two distinct ones, and SimHash must pair every planted clone at
hamming 0 (identical signatures — deterministic, no banding luck). The
full 20-seed sweep records fuzz_dedup_last.json; this runs a 3-seed
slice inside the suite."""

import importlib.util
import os


def _mod():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "fuzz_dedup_planted",
        os.path.join(repo, "examples", "fuzz_dedup_planted.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_generator_is_deterministic_and_planted():
    fz = _mod()
    a, b = fz.gen_corpus(7), fz.gen_corpus(7)
    assert a["docs"] == b["docs"], "corpus generation must be seed-pure"
    assert a["exact_groups"] == b["exact_groups"]
    # planted structure present and disjoint
    assert len(a["exact_groups"]) == 6 and len(a["families"]) == 8
    all_exact = set().union(*a["exact_groups"])
    all_fam = set().union(*(f["ids"] for f in a["families"]))
    assert not (all_exact & all_fam)
    # controlled similarity: every planted pair's true Jaccard reflects its
    # substitution rate (an eps=0.02 variant is far closer than eps=0.25)
    for fam in a["families"]:
        for _, _, eps, s in fam["pairs"]:
            assert s > 0.5 if eps <= 0.05 else s > 0.05


def test_banding_theory_curve():
    fz = _mod()
    assert fz.detect_prob(1.0) == 1.0
    assert fz.detect_prob(0.0) == 0.0
    assert fz.detect_prob(0.9) > 0.999  # sure-thing region
    assert fz.detect_prob(0.2) < 0.05   # unrelated docs stay out


def test_planted_invariants_live(spark):
    fz = _mod()
    for seed in (0, 1, 2):
        rec = fz.check_corpus(spark, seed)
        assert not rec["violations"], rec["violations"]
        assert rec["lsh_hits"] >= rec["lsh_theory_floor"]


def test_sweep_artifact_is_clean():
    """fuzz_dedup_last.json is the recorded 20-seed sweep: present, >= 20
    corpora, zero invariant violations."""
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "fuzz_dedup_last.json")) as f:
        d = json.load(f)
    assert len(d["seeds"]) >= 20
    assert d["n_violations"] == 0
    assert all(not c["violations"] for c in d["corpora"])
